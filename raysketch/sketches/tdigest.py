"""t-digest quantile sketch (merging variant) — mergeable UDAF.

Implements Dunning & Ertl's *merging* t-digest (``Computing extremely
accurate quantiles using t-digests``, arXiv:1902.04023) with the k1 scale
function ``k(q) = (δ/2π)·asin(2q−1)``: new values buffer, buffers+centroid
lists merge by sorting on mean and greedily coalescing while the cumulative
weight stays within one unit of k-size. Fully deterministic (no RNG, single
left-to-right merge direction) so retried Ray tasks produce bit-identical
partials; merge order of partials can change centroid layout but stays
within the rank-error bound (tests assert bound-equivalence, SURVEY.md §7.3).

Accuracy: rank error near the tails ~O(1/δ²), mid-range ~O(1/δ); tests gate
at ``1.5/δ`` absolute rank error mid-range and exact min/max endpoints.
"""

from __future__ import annotations

import math
import struct
from typing import Any

import numpy as np

from .base import CodecError

_MAGIC = b"TDG1"


class TDigest:
    kind = "tdigest"

    def __init__(self, compression: float = 200.0) -> None:
        if compression < 20:
            raise ValueError("compression must be >= 20")
        self.compression = float(compression)
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.total = 0.0
        self.min = math.inf
        self.max = -math.inf
        self._buf: list[np.ndarray] = []
        self._buf_n = 0
        self._buf_limit = int(10 * compression)
        self._dirty = False  # centroids possibly unsorted (post-merge)

    # -- update ------------------------------------------------------------
    def update_batch(self, values: Any) -> None:
        arr = np.asarray(values, dtype=np.float64)
        arr = arr[np.isfinite(arr)]
        if arr.size == 0:
            return
        self._buf.append(arr)
        self._buf_n += arr.size
        if self._buf_n >= self._buf_limit:
            self._compress()

    def add(self, value: float) -> None:
        self.update_batch([value])

    # -- compression -------------------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.compression / (2 * math.pi)) * np.arcsin(2 * q - 1)

    def _k_inv(self, k: np.ndarray) -> np.ndarray:
        return (np.sin(k * (2 * math.pi) / self.compression) + 1) / 2

    def _compress(self) -> None:
        if self._buf_n == 0 and not self._dirty and self.means.size <= self.compression * 2:
            return
        self._dirty = False
        if self._buf_n == 0 and self.means.size == 0:
            return
        if self._buf:
            new = np.concatenate(self._buf)
            self.min = min(self.min, float(new.min()))
            self.max = max(self.max, float(new.max()))
            means = np.concatenate([self.means, new])
            weights = np.concatenate([self.weights, np.ones(new.size)])
            self._buf, self._buf_n = [], 0
        else:
            means, weights = self.means, self.weights
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = float(weights.sum())

        # Vectorized greedy pass: precompute k(q) at every right edge once;
        # each output centroid spans [i, j) where j is the largest index with
        # k(q_j) <= k(q_left_of_i) + 1 (one searchsorted per OUTPUT centroid,
        # no per-input-point Python work).
        cum = np.cumsum(weights)
        kq = self._k(np.minimum(cum / total, 1.0))
        wm = np.cumsum(weights * means)
        out_means: list[float] = []
        out_weights: list[float] = []
        i = 0
        n = means.size
        while i < n:
            q_left = cum[i - 1] / total if i else 0.0
            j = int(np.searchsorted(kq, self._k(np.asarray(q_left)) + 1.0,
                                    side="right"))
            j = max(j, i + 1)
            w = cum[j - 1] - (cum[i - 1] if i else 0.0)
            m = (wm[j - 1] - (wm[i - 1] if i else 0.0)) / w
            out_means.append(float(m))
            out_weights.append(float(w))
            i = j
        self.means = np.asarray(out_means)
        self.weights = np.asarray(out_weights)
        self.total = total

    # -- query -------------------------------------------------------------
    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return math.nan
        if self.means.size == 1:
            return float(self.means[0])
        q = min(max(q, 0.0), 1.0)
        target = q * self.total
        cum = np.cumsum(self.weights) - self.weights / 2
        if target <= cum[0]:
            # interpolate between min and first centroid
            frac = target / cum[0] if cum[0] > 0 else 0.0
            return self.min + frac * (float(self.means[0]) - self.min)
        if target >= cum[-1]:
            denom = self.total - cum[-1]
            frac = (target - cum[-1]) / denom if denom > 0 else 1.0
            return float(self.means[-1]) + frac * (self.max - float(self.means[-1]))
        j = int(np.searchsorted(cum, target))
        lo, hi = cum[j - 1], cum[j]
        frac = (target - lo) / (hi - lo)
        return float(self.means[j - 1] + frac * (self.means[j] - self.means[j - 1]))

    def cdf(self, x: float) -> float:
        self._compress()
        if self.total == 0:
            return math.nan
        if x <= self.min:
            return 0.0
        if x >= self.max:
            return 1.0
        cum = np.cumsum(self.weights) - self.weights / 2
        j = int(np.searchsorted(self.means, x))
        if j == 0:
            frac = (x - self.min) / (self.means[0] - self.min)
            return float(frac * cum[0] / self.total)
        if j == self.means.size:
            frac = (x - self.means[-1]) / (self.max - self.means[-1])
            return float((cum[-1] + frac * (self.total - cum[-1])) / self.total)
        frac = (x - self.means[j - 1]) / (self.means[j] - self.means[j - 1])
        return float((cum[j - 1] + frac * (cum[j] - cum[j - 1])) / self.total)

    # -- merge -------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if other.compression != self.compression:
            raise ValueError("tdigest merge: mismatched compression")
        other._compress()
        self._compress()
        if other.means.size:
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
            self.min = min(self.min, other.min)
            self.max = max(self.max, other.max)
            self._dirty = True
            self._compress()
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "TDigest":
        """Bulk merge: concatenate every partial's centroids, compress ONCE
        (vs per-merge recompression); same rank-error bound, ~Nx faster."""
        parts = [cls.from_bytes(b) for b in payloads]
        first = parts[0]
        for p in parts[1:]:
            if p.compression != first.compression:
                raise ValueError("tdigest merge: mismatched compression")
        out = cls(first.compression)
        nonempty = [p for p in parts if p.means.size]
        if nonempty:
            out.means = np.concatenate([p.means for p in nonempty])
            out.weights = np.concatenate([p.weights for p in nonempty])
            out.min = min(p.min for p in nonempty)
            out.max = max(p.max for p in nonempty)
            out._dirty = True
            out._compress()
        return out

    def result(self) -> dict[str, Any]:
        self._compress()
        return {
            "count": self.total,
            "min": self.min if self.total else math.nan,
            "max": self.max if self.total else math.nan,
            "p50": self.quantile(0.5),
            "p95": self.quantile(0.95),
            "p99": self.quantile(0.99),
            "centroids": int(self.means.size),
        }

    # -- codec -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        self._compress()
        head = _MAGIC + struct.pack(
            "<dQddd", self.compression, self.means.size, self.total, self.min, self.max
        )
        return head + self.means.astype("<f8").tobytes() + self.weights.astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        hdr = 4 + struct.calcsize("<dQddd")
        if len(buf) < hdr or buf[:4] != _MAGIC:
            raise CodecError("tdigest: bad header")
        compression, n, total, mn, mx = struct.unpack_from("<dQddd", buf, 4)
        body = buf[hdr:]
        if len(body) != 16 * n:
            raise CodecError("tdigest: bad length")
        obj = cls(compression)
        obj.means = np.frombuffer(body[: 8 * n], dtype="<f8").copy()
        obj.weights = np.frombuffer(body[8 * n :], dtype="<f8").copy()
        obj.total, obj.min, obj.max = total, mn, mx
        return obj
