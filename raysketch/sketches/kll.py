"""KLL quantile sketch — mergeable rank-error-bounded UDAF.

Implements the KLL compactor hierarchy (Karnin, Lang, Liberty, FOCS 2016;
see also "KLL±: Approximate Quantile Sketches over Dynamic Datasets",
VLDB 2021, and "Relative Error Streaming Quantiles", PODS 2021, in
PAPERS.md). Level h holds items of weight 2^h; when a level overflows its
capacity ``max(2, ceil(k·c^(H-h)))`` (c = 2/3), it is sorted and every other
item is promoted to level h+1.

Derandomized for retry safety: instead of a random even/odd offset per
compaction, each level keeps a flip bit that alternates deterministically —
a re-executed Ray block reproduces the identical sketch, and the alternating
offset keeps the compaction error zero-mean across compactions (the
derandomization discussed in the KLL± paper, §2). Merging concatenates
levels then re-compacts; merged results are bound-equivalent, not
bit-identical, under permuted merge orders (tests assert the rank bound).

Rank-error guarantee: O(1/k) uniform rank error; tests gate at ``2/k``
normalized rank error against exact ranks.
"""

from __future__ import annotations

import math
import struct
from typing import Any

import numpy as np

from .base import CodecError

_MAGIC = b"KLL1"
_C = 2.0 / 3.0


class KLL:
    kind = "kll"

    def __init__(self, k: int = 200) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.zeros(0, dtype=np.float64)]
        self.flip: list[bool] = [False]
        self.n = 0
        self.min = math.inf
        self.max = -math.inf

    def _capacity(self, h: int) -> int:
        height = len(self.levels)
        return max(2, int(math.ceil(self.k * (_C ** (height - 1 - h)))))

    # -- update ------------------------------------------------------------
    def update_batch(self, values: Any) -> None:
        arr = np.asarray(values, dtype=np.float64)
        arr = arr[np.isfinite(arr)]
        if arr.size == 0:
            return
        self.min = min(self.min, float(arr.min()))
        self.max = max(self.max, float(arr.max()))
        self.n += int(arr.size)
        self.levels[0] = np.concatenate([self.levels[0], arr])
        self._compact()

    def add(self, value: float) -> None:
        self.update_batch([value])

    def _compact(self) -> None:
        h = 0
        while h < len(self.levels):
            if self.levels[h].size <= self._capacity(h):
                h += 1
                continue
            lv = np.sort(self.levels[h], kind="stable")
            off = 1 if self.flip[h] else 0
            self.flip[h] = not self.flip[h]
            promoted = lv[off::2]
            self.levels[h] = np.zeros(0, dtype=np.float64)
            if h + 1 == len(self.levels):
                self.levels.append(np.zeros(0, dtype=np.float64))
                self.flip.append(False)
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            # growing the hierarchy shrinks lower capacities; restart scan
            h = 0 if promoted.size and len(self.levels) else h + 1

    # -- query -------------------------------------------------------------
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, lv in enumerate(self.levels):
            if lv.size:
                vals.append(lv)
                wts.append(np.full(lv.size, float(1 << h)))
        if not vals:
            return np.zeros(0), np.zeros(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return math.nan
        v, w = self._weighted()
        cum = np.cumsum(w)
        target = min(max(q, 0.0), 1.0) * cum[-1]
        j = int(np.searchsorted(cum, target, side="left"))
        j = min(j, v.size - 1)
        return float(v[j])

    def rank(self, x: float) -> float:
        """Approximate normalized rank of x (fraction of items <= x)."""
        if self.n == 0:
            return math.nan
        v, w = self._weighted()
        j = int(np.searchsorted(v, x, side="right"))
        return float(w[:j].sum() / w.sum())

    # -- merge -------------------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("kll merge: mismatched k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
            self.flip.append(False)
        for h, lv in enumerate(other.levels):
            if lv.size:
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compact()
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "KLL":
        """Bulk merge: concatenate every partial's levels level-wise, then
        compact ONCE (vs per-merge recompaction across N partials)."""
        parts = [cls.from_bytes(b) for b in payloads]
        first = parts[0]
        for p in parts[1:]:
            if p.k != first.k:
                raise ValueError("kll merge: mismatched k")
        out = cls(first.k)
        height = max(len(p.levels) for p in parts)
        out.levels = [
            np.concatenate([p.levels[h] for p in parts if h < len(p.levels)])
            for h in range(height)
        ]
        out.flip = [False] * height
        out.n = sum(p.n for p in parts)
        out.min = min(p.min for p in parts)
        out.max = max(p.max for p in parts)
        out._compact()
        return out

    def result(self) -> dict[str, Any]:
        return {
            "count": self.n,
            "min": self.min if self.n else math.nan,
            "max": self.max if self.n else math.nan,
            "p50": self.quantile(0.5),
            "p95": self.quantile(0.95),
            "p99": self.quantile(0.99),
            "retained": int(sum(lv.size for lv in self.levels)),
        }

    # -- codec -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        parts = [_MAGIC, struct.pack("<IQddI", self.k, self.n, self.min, self.max,
                                     len(self.levels))]
        for h, lv in enumerate(self.levels):
            parts.append(struct.pack("<QB", lv.size, int(self.flip[h])))
            parts.append(lv.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLL":
        hdr = 4 + struct.calcsize("<IQddI")
        if len(buf) < hdr or buf[:4] != _MAGIC:
            raise CodecError("kll: bad header")
        k, n, mn, mx, n_levels = struct.unpack_from("<IQddI", buf, 4)
        obj = cls(k)
        obj.n, obj.min, obj.max = n, mn, mx
        obj.levels, obj.flip = [], []
        off = hdr
        for _ in range(n_levels):
            if off + 9 > len(buf):
                raise CodecError("kll: truncated")
            sz, fl = struct.unpack_from("<QB", buf, off)
            off += 9
            end = off + 8 * sz
            if end > len(buf):
                raise CodecError("kll: truncated level")
            obj.levels.append(np.frombuffer(buf[off:end], dtype="<f8").copy())
            obj.flip.append(bool(fl))
            off = end
        if not obj.levels:
            obj.levels = [np.zeros(0, dtype=np.float64)]
            obj.flip = [False]
        return obj
