"""raysketch — a Ray-Data-native distributed sketch / approximate-aggregation
engine with the query capabilities of trink/streaming_algorithms, rebuilt
from scratch on ray.data.Dataset pipelines (SURVEY.md is the blueprint).

Layers:

- ``raysketch.sketches`` — pure numpy/Python mergeable sketch kernels
  (zero Ray dependencies; unit-testable standalone).
- ``raysketch.engine`` — Dataset pipelines: zero-copy Arrow map_batches,
  stateful actor pools, salted groupby merges, checkpoint/resume.
- ``raysketch.ops`` — large-scale data-pipeline operators (dedup,
  similarity search, text analysis, windowing, multimodal plumbing).
- ``raysketch.queries`` — the query registry exposed via __ray_entry__.
"""

from raysketch.sketches.bloom import BloomFilter
from raysketch.sketches.cms import CMSketch
from raysketch.sketches.hll import HyperLogLog
from raysketch.sketches.kll import KLL
from raysketch.sketches.p2 import P2Histogram, P2Quantile
from raysketch.sketches.running_stats import RunningStats
from raysketch.sketches.tdigest import TDigest

__all__ = [
    "BloomFilter",
    "CMSketch",
    "HyperLogLog",
    "KLL",
    "P2Histogram",
    "P2Quantile",
    "RunningStats",
    "TDigest",
]
