"""Misra–Gries / SpaceSaving heavy-hitter summary — mergeable UDAF.

Built from the published algorithms (Misra & Gries 1982; Metwally et al.
2005 "Efficient Computation of Frequent and Top-k Elements"; merge rule
from Agarwal, Cormode, Huang, Phillips, Wei, Yi 2012 "Mergeable
Summaries" §3). Complements the reference's count-min sketch
(library/src/cm_sketch.c): CMS answers point queries for ANY item with
additive overestimate ε·n; a Misra–Gries summary carries the candidate
item set itself with deterministic UNDERestimate ≤ n/(k+1) — together
they are the standard two-sided heavy-hitter toolkit.

State: at most ``k`` (item → count) counters plus ``err``, the cumulative
decrement applied so far. Invariants:

- stored count ≤ true count ≤ stored count + err  (per retained item)
- an absent item's true count ≤ err
- err ≤ n/(k+1) where n = total items absorbed  (MG guarantee)

Exactness gate (sparse-exact principle): while the distinct-item count
never exceeds ``k``, no decrement happens, ``err == 0`` and every stored
count is EXACT — small-scale oracle queries compare bit-for-bit against
SQL ``GROUP BY`` counts.

``update_batch`` is vectorized: one pandas ``value_counts`` over the
block, then ONE combine+truncate — never a per-row loop. ``merge`` sums
counters pointwise then truncates to the k largest, adding the (k+1)-th
largest count to ``err`` (the Mergeable Summaries rule: errors add, the
bound err_a + err_b + decrement holds). Merge is associative and
order-independent in exact mode (plain count sums); in truncating mode
results are bound-equivalent under permutation (property-tested).

Codec: deterministic little-endian layout, items sorted lexicographically
(bit-identical re-serialization for checkpoint/retry safety).
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np
import pandas as pd

from .base import CodecError

_MAGIC = b"SSK1"


class SpaceSaving:
    kind = "spacesaving"

    def __init__(self, k: int = 1024) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.err: int = 0  # cumulative decrement (undercount upper bound)
        self.n: int = 0  # total items absorbed (for the n/(k+1) bound)
        self.counts: pd.Series = pd.Series(dtype="int64")  # item(str) -> count

    # -- update --------------------------------------------------------
    def update_batch(self, values: Any) -> None:
        """Absorb a whole column chunk: one value_counts, one combine.

        Nulls are dropped at the ARROW level before the pandas hop: a
        null-bearing int64 column otherwise widens to float64 in pandas
        and stringifies as "1.0" while null-free blocks produce "1" —
        the same item would count under two keys (the repo's documented
        nullable-int float-widening bug class)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = pc.drop_null(values)
            s = pd.Series(values.to_pandas())
        else:
            s = pd.Series(values.to_pandas() if hasattr(values, "to_pandas")
                          else values)
        s = s.dropna()
        if s.empty:
            return
        vc = s.astype(str).value_counts()
        self.n += int(vc.sum())
        self._combine(vc)

    def _combine(self, other: pd.Series) -> None:
        if self.counts.empty:
            merged = other.astype("int64")
        else:
            merged = self.counts.add(other.astype("int64"), fill_value=0).astype("int64")
        self._truncate(merged)

    def _truncate(self, merged: pd.Series) -> None:
        if len(merged) > self.k:
            # TRUE Misra–Gries decrement: subtract the (k+1)-th largest
            # count from EVERY counter, keep strictly-positive survivors
            # (≤ k remain, since at least len-k counters hit zero). The
            # subtraction is what makes the n/(k+1) bound hold: each
            # truncation removes cut·m mass with m ≥ k+1 live counters,
            # so Σcut ≤ n/(k+1). (Evicting without subtracting keeps
            # brackets sound but lets err grow ~k× past the bound under
            # long-tail streams — regression-pinned in tests.)
            vals = merged.to_numpy()
            cut = int(np.partition(vals, len(vals) - self.k - 1)[len(vals) - self.k - 1])
            self.err += cut
            merged = merged[merged > cut] - cut
        self.counts = merged

    # -- query ---------------------------------------------------------
    def point_query(self, item: Any) -> tuple[int, int]:
        """(lower_bound, upper_bound) on the item's true count."""
        lo = int(self.counts.get(str(item), 0))
        return lo, lo + self.err

    @property
    def is_exact(self) -> bool:
        return self.err == 0

    def top(self, n: int) -> list[tuple[str, int]]:
        """Top-n retained items by stored count, ties broken by item asc
        (deterministic — the same canonical order the SQL oracles use)."""
        df = self.counts.rename_axis("item").reset_index(name="n")
        df = df.sort_values(["n", "item"], ascending=[False, True]).head(n)
        return list(zip(df["item"].tolist(), df["n"].astype(int).tolist()))

    # -- merge ---------------------------------------------------------
    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        if other.k != self.k:
            raise ValueError("spacesaving merge: mismatched k")
        self.err += other.err
        self.n += other.n
        self._combine(other.counts)
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "SpaceSaving":
        """Bulk merge: one concat + groupby-sum over all partials, ONE
        truncation — cheaper and tighter-error than pairwise folds."""
        parts = [cls.from_bytes(p) for p in payloads]
        ks = {p.k for p in parts}
        if len(ks) > 1:
            raise ValueError("spacesaving merge: mismatched k")
        out = cls(k=parts[0].k)
        out.err = sum(p.err for p in parts)
        out.n = sum(p.n for p in parts)
        nonempty = [p.counts for p in parts if not p.counts.empty]
        if nonempty:
            merged = pd.concat(nonempty).groupby(level=0).sum().astype("int64")
            out._truncate(merged)
        return out

    def result(self) -> dict[str, Any]:
        return {"top": self.top(16), "err": self.err, "n": self.n,
                "k": self.k, "exact": self.is_exact}

    # -- codec -----------------------------------------------------------
    def to_bytes(self) -> bytes:
        items = self.counts.sort_index()  # canonical order: bit-stable
        blobs = [s.encode("utf-8") for s in items.index.astype(str)]
        head = _MAGIC + struct.pack("<IQQI", self.k, self.err, self.n, len(blobs))
        body = b"".join(
            struct.pack("<Iq", len(b), int(c)) + b
            for b, c in zip(blobs, items.to_numpy())
        )
        return head + body

    @classmethod
    def from_bytes(cls, buf: bytes) -> "SpaceSaving":
        if len(buf) < 28 or buf[:4] != _MAGIC:
            raise CodecError("spacesaving: bad header")
        k, err, n, cnt = struct.unpack_from("<IQQI", buf, 4)
        obj = cls(k=k)
        obj.err = int(err)
        obj.n = int(n)
        off = 28
        items: list[str] = []
        counts: list[int] = []
        for _ in range(cnt):
            if off + 12 > len(buf):
                raise CodecError("spacesaving: truncated entry")
            ln, c = struct.unpack_from("<Iq", buf, off)
            off += 12
            if off + ln > len(buf):
                raise CodecError("spacesaving: truncated item")
            items.append(buf[off:off + ln].decode("utf-8"))
            counts.append(int(c))
            off += ln
        if off != len(buf):
            raise CodecError("spacesaving: trailing bytes")
        obj.counts = pd.Series(counts, index=items, dtype="int64")
        return obj
