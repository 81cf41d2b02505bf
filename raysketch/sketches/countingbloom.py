"""Counting Bloom filter — DELETABLE membership, linear-merge UDAF.

Built from the published construction (Fan, Cao, Almeida, Broder 2000,
"Summary Cache: a scalable wide-area Web cache sharing protocol"): the
plain Bloom filter's bits become small counters, so items can be
REMOVED — the membership tool a CDC/tombstone pipeline needs (a plain
Bloom can only grow; a deleted key stays "present" forever).

Same geometry as :class:`raysketch.sketches.bloom.BloomFilter`
(``m = ceil(-n·ln(fpr)/ln 2²)`` slots, ``k`` Kirsch–Mitzenmacher double
hashes of the two 32-bit halves of one deterministic 64-bit hash), so
membership answers and false-positive behavior match the sibling filter
on the same stream. Counters are int32.

LINEAR sketch: an add is +1 at k slots, a remove is −1, and merge is
element-wise counter SUM — associative, commutative, bit-identical
under any merge order, and removes may happen before OR after merging
(the countsketch `negated()` property, here for membership). Contract
(the published one): only remove items that were added; `remove_hashes`
validates membership first and refuses loudly on an absent item — a
decrement through zero would corrupt neighbors' counts silently.

Codec: dense int32 counter array, or a sparse (slot, count) pair list —
per-block partials of a corpus-sized filter touch only
O(unique_keys × k) slots and stay KB-sized on the exchange.
"""

from __future__ import annotations

import math
import struct
from typing import Any

import numpy as np

from .base import CodecError

_MAGIC = b"CBF1"


class CountingBloomFilter:
    kind = "countingbloom"

    def __init__(self, capacity: int, fpr: float = 0.01) -> None:
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        if not (0.0 < fpr < 1.0):
            raise ValueError("fpr must be in (0,1)")
        self.capacity = int(capacity)
        self.fpr = float(fpr)
        m = int(math.ceil(-capacity * math.log(fpr) / (math.log(2) ** 2)))
        self.m = max(64, m)
        self.k = max(1, round((self.m / capacity) * math.log(2)))
        self.counts = np.zeros(self.m, dtype=np.int32)
        self.n_added = 0
        self.n_removed = 0

    # -- hashing (identical scheme to BloomFilter) ----------------------
    def _positions(self, h64: np.ndarray) -> np.ndarray:
        h1 = (h64 & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        h2 = (h64 >> np.uint64(32)).astype(np.uint64) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :])
                    % np.uint64(self.m)).astype(np.int64)

    # -- update ----------------------------------------------------------
    def update_hashes(self, h64: np.ndarray) -> None:
        h64 = np.asarray(h64, dtype=np.uint64)
        if h64.size == 0:
            return
        np.add.at(self.counts, self._positions(h64).ravel(), 1)
        self.n_added += int(h64.size)

    def update_batch(self, values: Any) -> None:
        from ..engine.hashing import hash64_batch

        self.update_hashes(hash64_batch(values))

    def remove_hashes(self, h64: np.ndarray) -> None:
        """Remove previously-added items. Refuses if any item is not
        currently present (a decrement through zero silently corrupts
        other keys' counts — the published contract is remove-only-
        what-you-added, enforced loudly here)."""
        h64 = np.asarray(h64, dtype=np.uint64)
        if h64.size == 0:
            return
        pos = self._positions(h64)
        # per-slot decrement totals for the WHOLE batch: duplicates of
        # one hash must count multiple times, or removing [h, h] after
        # a single add would drive counters negative (a silent false
        # negative later) while a per-item check sees 1 > 0 twice
        need = np.bincount(pos.ravel(), minlength=self.m)
        if (need > self.counts).any():
            raise ValueError(
                "countingbloom remove: item not present (only items "
                "previously added may be removed, at most as many "
                "times as they were added)")
        self.counts -= need.astype(np.int32)
        self.n_removed += int(h64.size)

    def remove_batch(self, values: Any) -> None:
        from ..engine.hashing import hash64_batch

        self.remove_hashes(hash64_batch(values))

    # -- query -----------------------------------------------------------
    def contains_hashes(self, h64: np.ndarray) -> np.ndarray:
        h64 = np.asarray(h64, dtype=np.uint64)
        if h64.size == 0:
            return np.zeros(0, dtype=bool)
        return (self.counts[self._positions(h64)] > 0).all(axis=0)

    def contains_batch(self, values: Any) -> np.ndarray:
        from ..engine.hashing import hash64_batch

        return self.contains_hashes(hash64_batch(values))

    def fill_ratio(self) -> float:
        return float((self.counts > 0).sum()) / self.m

    def result(self) -> dict[str, Any]:
        return {"m": self.m, "k": self.k, "n_added": self.n_added,
                "n_removed": self.n_removed,
                "fill_ratio": self.fill_ratio()}

    def negated(self) -> "CountingBloomFilter":
        """A filter of the NEGATED stream (every add becomes a remove)
        — the linearity primitive: ``all.merge(deletes.negated())``
        answers membership over the add-stream MINUS the delete-stream
        with no driver-side key gather (the delete side is itself a
        distributed sketch build). The delete stream must be a subset
        of the add stream, as with :meth:`remove_hashes`."""
        out = CountingBloomFilter.__new__(CountingBloomFilter)
        out.capacity, out.fpr, out.m, out.k = \
            self.capacity, self.fpr, self.m, self.k
        out.counts = -self.counts
        out.n_added = self.n_removed
        out.n_removed = self.n_added
        return out

    # -- merge (element-wise sum; linear) ---------------------------------
    def _check(self, m: int, k: int) -> None:
        if (m, k) != (self.m, self.k):
            raise ValueError("countingbloom merge: mismatched (m,k)")

    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        self._check(other.m, other.k)
        self.counts += other.counts
        self.n_added += other.n_added
        self.n_removed += other.n_removed
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "CountingBloomFilter":
        acc = cls.from_bytes(payloads[0])
        for buf in payloads[1:]:
            m, k, na, nr, cap, fpr = cls._header(buf)
            acc._check(m, k)
            acc.n_added += na
            acc.n_removed += nr
            cls._apply_body(buf, acc.counts)
        return acc

    # -- codec -------------------------------------------------------------
    _HDR = "<QIQQQd"

    def to_bytes(self) -> bytes:
        head = _MAGIC + struct.pack(self._HDR, self.m, self.k,
                                    self.n_added, self.n_removed,
                                    self.capacity, self.fpr)
        nz = np.flatnonzero(self.counts)
        if nz.size * 12 < self.m * 4:
            return (head + struct.pack("<BQ", 1, nz.size)
                    + nz.astype(np.uint64).tobytes()
                    + self.counts[nz].astype(np.int32).tobytes())
        return head + struct.pack("<BQ", 0, 0) \
            + self.counts.astype(np.int32).tobytes()

    @classmethod
    def _header(cls, buf: bytes):
        if len(buf) < 4 + struct.calcsize(cls._HDR) + 9 \
                or buf[:4] != _MAGIC:
            raise CodecError("bad countingbloom payload")
        return struct.unpack_from(cls._HDR, buf, 4)

    @classmethod
    def _apply_body(cls, buf: bytes, counts: np.ndarray) -> None:
        off = 4 + struct.calcsize(cls._HDR)
        mode, nnz = struct.unpack_from("<BQ", buf, off)
        off += 9
        m = counts.size
        if mode == 1:
            if len(buf) != off + nnz * 12:
                raise CodecError("truncated sparse countingbloom payload")
            idx = np.frombuffer(buf, "<u8", nnz, off).astype(np.int64)
            vals = np.frombuffer(buf, "<i4", nnz, off + nnz * 8)
            if nnz and int(idx.max()) >= m:
                raise CodecError("corrupt countingbloom slot index")
            np.add.at(counts, idx, vals)
        elif mode == 0:
            if len(buf) != off + m * 4:
                raise CodecError("truncated dense countingbloom payload")
            counts += np.frombuffer(buf, "<i4", m, off)
        else:
            raise CodecError("unknown countingbloom codec mode")

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountingBloomFilter":
        m, k, na, nr, cap, fpr = cls._header(buf)
        out = cls.__new__(cls)
        out.capacity = int(cap)
        out.fpr = float(fpr)
        out.m = int(m)
        out.k = int(k)
        out.counts = np.zeros(int(m), dtype=np.int32)
        out.n_added = int(na)
        out.n_removed = int(nr)
        cls._apply_body(buf, out.counts)
        return out
