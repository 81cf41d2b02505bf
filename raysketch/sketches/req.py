"""REQ — relative-error streaming quantile sketch (mergeable UDAF).

After Cormode, Karnin, Liberty, Thaler, Veselý, "Relative Error Streaming
Quantiles" (PODS 2021; listed in PAPERS.md): a KLL-style compactor
hierarchy where each compactor PROTECTS its top section(s) from
compaction, so items near the maximum survive with low weight and rank
error stays RELATIVE — ``|est_rank - rank| = O(eps * rank)`` for high
ranks (``hra``, the default; tail quantiles p99, p999, ... of heavy
metrics like content_length), instead of the additive ``eps * n`` of
KLL/t-digest mid-range guarantees.

Implementation notes (follows the paper's structure, simplified sizing):

- compactor at level h holds items of weight 2^h; capacity
  ``2 * k * num_sections``; ``num_sections`` starts at 3 and doubles every
  ``2^num_compactions``-ish growth step (we double when the level has
  compacted ``num_sections`` times), mirroring the paper's growing
  protected region.
- compaction (hra): sort ascending, keep the TOP ``k * num_sections``
  items untouched (the protected suffix), compact the lowest even-sized
  prefix by promoting every other item to level h+1 — with a
  deterministic alternating offset per level (derandomized like our KLL,
  retry-safe).
- merge: level-wise concatenation then compact-down (associative up to
  the bound; permutation tests assert bound-equivalence).

Tests gate on measured relative rank error at p90..p9999 over uniform,
lognormal, sorted and reversed streams.
"""

from __future__ import annotations

import math
import struct
from typing import Any

import numpy as np

from .base import CodecError

_MAGIC = b"REQ1"


class REQ:
    kind = "req"

    def __init__(self, k: int = 32, hra: bool = True) -> None:
        if k < 4 or k % 2:
            raise ValueError("k must be an even integer >= 4")
        self.k = int(k)
        self.hra = bool(hra)
        self.levels: list[np.ndarray] = [np.zeros(0, dtype=np.float64)]
        self.sections: list[int] = [3]
        self.compactions: list[int] = [0]
        self.flip: list[bool] = [False]
        self.n = 0
        self.min = math.inf
        self.max = -math.inf

    # -- update ------------------------------------------------------------
    def _capacity(self, h: int) -> int:
        return 2 * self.k * self.sections[h]

    def update_batch(self, values: Any) -> None:
        arr = np.asarray(values, dtype=np.float64)
        arr = arr[np.isfinite(arr)]
        if arr.size == 0:
            return
        self.min = min(self.min, float(arr.min()))
        self.max = max(self.max, float(arr.max()))
        self.n += int(arr.size)
        self.levels[0] = np.concatenate([self.levels[0], arr])
        self._compress()

    def add(self, value: float) -> None:
        self.update_batch([value])

    def _grow_to(self, h: int) -> None:
        while len(self.levels) <= h:
            self.levels.append(np.zeros(0, dtype=np.float64))
            self.sections.append(3)
            self.compactions.append(0)
            self.flip.append(False)

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if self.levels[h].size <= self._capacity(h):
                h += 1
                continue
            buf = np.sort(self.levels[h], kind="stable")
            protected = min(self.k * self.sections[h], buf.size // 2)
            if self.hra:
                region, keep = buf[: buf.size - protected], buf[buf.size - protected:]
            else:
                keep, region = buf[:protected], buf[protected:]
            if region.size % 2:  # compact an even count; spare one item
                if self.hra:
                    keep = np.concatenate([region[-1:], keep])
                    region = region[:-1]
                else:
                    keep = np.concatenate([keep, region[:1]])
                    region = region[1:]
            off = 1 if self.flip[h] else 0
            self.flip[h] = not self.flip[h]
            promoted = region[off::2]
            self.levels[h] = keep.copy()
            self.compactions[h] += 1
            if self.compactions[h] >= self.sections[h]:
                self.sections[h] *= 2  # grow the protected region (paper §4)
                self.compactions[h] = 0
            self._grow_to(h + 1)
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            h += 1

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
        return float(v[min(j, v.size - 1)])

    def rank(self, x: float) -> float:
        """Approximate normalized rank (fraction of items <= x)."""
        if self.n == 0:
            return math.nan
        v, w = self._weighted()
        j = int(np.searchsorted(v, x, side="right"))
        return float(w[:j].sum() / w.sum())

    # -- merge -------------------------------------------------------------
    def merge(self, other: "REQ") -> "REQ":
        if other.k != self.k or other.hra != self.hra:
            raise ValueError("req merge: mismatched parameters")
        self._grow_to(len(other.levels) - 1)
        for h, lv in enumerate(other.levels):
            if lv.size:
                self.levels[h] = np.concatenate([self.levels[h], lv])
            self.sections[h] = max(self.sections[h], other.sections[h])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress()
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "REQ":
        parts = [cls.from_bytes(b) for b in payloads]
        first = parts[0]
        for p in parts[1:]:
            if p.k != first.k or p.hra != first.hra:
                raise ValueError("req merge: mismatched parameters")
        out = cls(first.k, first.hra)
        height = max(len(p.levels) for p in parts)
        out._grow_to(height - 1)
        for h in range(height):
            chunks = [p.levels[h] for p in parts if h < len(p.levels) and p.levels[h].size]
            if chunks:
                out.levels[h] = np.concatenate(chunks)
            out.sections[h] = max(
                [p.sections[h] for p in parts if h < len(p.sections)] + [3]
            )
        out.n = sum(p.n for p in parts)
        out.min = min(p.min for p in parts)
        out.max = max(p.max for p in parts)
        out._compress()
        return out

    def result(self) -> dict[str, Any]:
        return {
            "count": self.n,
            "min": self.min if self.n else math.nan,
            "max": self.max if self.n else math.nan,
            "p50": self.quantile(0.5),
            "p99": self.quantile(0.99),
            "p999": self.quantile(0.999),
            "retained": int(sum(lv.size for lv in self.levels)),
        }

    # -- codec -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        parts = [_MAGIC, struct.pack("<IBQddI", self.k, int(self.hra), self.n,
                                     self.min, self.max, len(self.levels))]
        for h, lv in enumerate(self.levels):
            parts.append(struct.pack("<QIIB", lv.size, self.sections[h],
                                     self.compactions[h], int(self.flip[h])))
            parts.append(lv.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "REQ":
        hdr = 4 + struct.calcsize("<IBQddI")
        if len(buf) < hdr or buf[:4] != _MAGIC:
            raise CodecError("req: bad header")
        k, hra, n, mn, mx, n_levels = struct.unpack_from("<IBQddI", buf, 4)
        obj = cls(k, bool(hra))
        obj.n, obj.min, obj.max = n, mn, mx
        obj.levels, obj.sections, obj.compactions, obj.flip = [], [], [], []
        off = hdr
        lvl_hdr = struct.calcsize("<QIIB")
        for _ in range(n_levels):
            if off + lvl_hdr > len(buf):
                raise CodecError("req: truncated")
            sz, sec, comp, fl = struct.unpack_from("<QIIB", buf, off)
            off += lvl_hdr
            end = off + 8 * sz
            if end > len(buf):
                raise CodecError("req: truncated level")
            obj.levels.append(np.frombuffer(buf[off:end], dtype="<f8").copy())
            obj.sections.append(sec)
            obj.compactions.append(comp)
            obj.flip.append(bool(fl))
            off = end
        if not obj.levels:
            obj.levels = [np.zeros(0, dtype=np.float64)]
            obj.sections, obj.compactions, obj.flip = [3], [0], [False]
        return obj
