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

import os as _os

# Size the polars rayon pool BEFORE anyone imports polars: Ray owns the
# cores, and polars pins its thread-pool width at first import. Setting
# this at package import (raysketch is imported in every Ray worker
# before any of its polars-using code runs) closes the window where
# engine.hashing's setdefault lost the race to an earlier polars import
# elsewhere in the process. If user code imported polars before
# raysketch, the pool is already pinned — hashing RESULTS are unaffected
# (thread count never changes hash values); only thread over-subscription
# is at stake. The width is PER-ROLE: Ray WORKER processes (ray already
# imported and in WORKER_MODE when they deserialize our tasks) get 1
# thread — dozens of workers each spawning a core-wide rayon pool is the
# over-subscription the cap exists for — while the DRIVER (script mode /
# bare library use) keeps a moderate pool for driver-side polars folds,
# which run while the workers are idle (similar_customers' driver fold:
# 15.5 s at 1 thread vs 2.3 s unrestricted on the same input).


def _in_ray_worker() -> bool:
    import sys

    if "ray" not in sys.modules:  # never force the heavy import ourselves
        return False
    try:
        import ray

        return (ray._private.worker.global_worker.mode
                == ray._private.worker.WORKER_MODE)
    except Exception:
        return True  # unknown ray state: be conservative


if _in_ray_worker():
    # FORCE-assign, never setdefault: the driver's width-8 value rides
    # os.environ into every raylet/worker child, so a setdefault here
    # would silently keep 8 per worker — dozens of workers × a wide
    # rayon pool is exactly the over-subscription this cap prevents.
    # Hash values are pool-width-independent (pinned in test_graph.py),
    # so the forced narrow pool is always safe. No-op for hashing
    # results if polars was somehow imported first; only thread count
    # is at stake, and polars reads the env at first import.
    _os.environ["POLARS_MAX_THREADS"] = "1"
else:
    _os.environ.setdefault(
        "POLARS_MAX_THREADS", str(min(8, _os.cpu_count() or 1)))

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
