"""Pure sketch kernels (no Ray dependencies). See base.SketchUDAF."""

from .base import CodecError, SketchUDAF
from .bloom import BloomFilter
from .cms import CMSketch
from .countingbloom import CountingBloomFilter
from .countsketch import CountSketch
from .fd import FrequentDirections
from .hll import HyperLogLog
from .kll import KLL
from .matrix import MatrixFlt, MatrixInt
from .p2 import P2Histogram, P2Quantile
from .req import REQ
from .running_stats import RunningStats
from .spacesaving import SpaceSaving
from .theta import ThetaSketch
from .time_series import TimeSeriesInt
from .tdigest import TDigest

#: registry used by the engine's serialized-partial envelopes
SKETCH_KINDS = {
    "bloom": BloomFilter,
    "cms": CMSketch,
    "countingbloom": CountingBloomFilter,
    "countsketch": CountSketch,
    "fd": FrequentDirections,
    "hll": HyperLogLog,
    "kll": KLL,
    "matrix_int": MatrixInt,
    "matrix_flt": MatrixFlt,
    "req": REQ,
    "running_stats": RunningStats,
    "spacesaving": SpaceSaving,
    "theta": ThetaSketch,
    "time_series_int": TimeSeriesInt,
    "tdigest": TDigest,
}

__all__ = [
    "BloomFilter", "CMSketch", "CodecError", "HyperLogLog", "KLL",
    "MatrixFlt", "MatrixInt", "P2Histogram", "P2Quantile", "REQ", "RunningStats",
    "CountSketch", "CountingBloomFilter", "FrequentDirections", "SKETCH_KINDS", "SketchUDAF", "SpaceSaving", "TDigest", "ThetaSketch",
    "TimeSeriesInt",
]
