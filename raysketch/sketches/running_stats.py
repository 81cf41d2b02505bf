"""Welford running statistics — the canonical mergeable UDAF.

Semantics match the reference (library/src/running_stats.c:23-57):
non-finite observations are skipped; ``variance = M2/(count-1)``,
``sd = sqrt(variance)``, ``usd = sqrt(M2/count)``, all 0.0 when count < 2
(usd 0.0 when count < 1). Serialization is 3 little-endian doubles
(count, mean, M2) exactly like the reference (running_stats.c:60-91).

Batch updates are one-pass numpy over the chunk; partials combine with the
Chan et al. (1979) pairwise merge formula, which is associative and exact
to float tolerance.
"""

from __future__ import annotations

import math
import struct
from typing import Any

import numpy as np

from .base import CodecError

_FMT = "<3d"


class RunningStats:
    kind = "running_stats"

    def __init__(self) -> None:
        self.count = 0.0
        self.mean = 0.0
        self.m2 = 0.0  # the reference stores this in the field named "sum"

    # -- scalar path (reference parity) ------------------------------------
    def add(self, value: float) -> None:
        d = float(value)
        if not math.isfinite(d):
            return
        self.count += 1.0
        delta = d - self.mean
        self.mean += delta / self.count
        self.m2 += delta * (d - self.mean)

    # -- batch path --------------------------------------------------------
    def update_batch(self, values: Any) -> None:
        arr = np.asarray(values, dtype=np.float64)
        arr = arr[np.isfinite(arr)]
        n = arr.size
        if n == 0:
            return
        b_mean = float(arr.mean())
        b_m2 = float(((arr - b_mean) ** 2).sum())
        self._combine(float(n), b_mean, b_m2)

    def _combine(self, n_b: float, mean_b: float, m2_b: float) -> None:
        n_a = self.count
        n = n_a + n_b
        if n == 0:
            return
        delta = mean_b - self.mean
        self.mean = self.mean + delta * (n_b / n)
        self.m2 = self.m2 + m2_b + delta * delta * (n_a * n_b / n)
        self.count = n

    def merge(self, other: "RunningStats") -> "RunningStats":
        self._combine(other.count, other.mean, other.m2)
        return self

    # -- queries (reference: running_stats.c:39-57) ------------------------
    def variance(self) -> float:
        if self.count < 2:
            return 0.0
        return self.m2 / (self.count - 1.0)

    def sd(self) -> float:
        return math.sqrt(self.variance())

    def usd(self) -> float:
        if self.count < 1:
            return 0.0
        return math.sqrt(self.m2 / self.count)

    def avg(self) -> float:
        return self.mean

    def result(self) -> dict[str, Any]:
        return {
            "count": self.count,
            "mean": self.mean,
            "variance": self.variance(),
            "sd": self.sd(),
            "usd": self.usd(),
        }

    # -- codec (3 LE doubles, reference running_stats.c:60-91) -------------
    def to_bytes(self) -> bytes:
        return struct.pack(_FMT, self.count, self.mean, self.m2)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "RunningStats":
        if len(buf) != struct.calcsize(_FMT):
            raise CodecError(f"running_stats: bad length {len(buf)}")
        count, mean, m2 = struct.unpack(_FMT, buf)
        if count < 0:
            raise CodecError("running_stats: negative count")
        rs = cls()
        rs.count, rs.mean, rs.m2 = count, mean, m2
        return rs
