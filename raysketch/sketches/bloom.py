"""Bloom filter — mergeable membership UDAF (bit-wise OR merge).

Standard construction (Bloom 1970; Mitzenmacher & Upfal formulas):
``m = ceil(-n·ln(fpr)/ln(2)²)`` bits, ``k = max(1, round((m/n)·ln 2))``
hash functions, realized with Kirsch–Mitzenmacher double hashing
``g_i = h1 + i·h2 (mod m)`` over the two 32-bit halves of a deterministic
64-bit hash (same trick the reference uses for CMS rows,
library/src/cm_sketch.c:71-78).

Role in the engine: membership filters ("path seen", semi/anti-join
pushdown — broadcast the filter, test inside map_batches). Merge of two
filters with identical (m, k) is the bit-wise OR; merged filters answer
membership over the union stream with no false negatives.
"""

from __future__ import annotations

import math
import struct
from typing import Any

import numpy as np

from .base import CodecError

_MAGIC = b"BLM1"


class BloomFilter:
    kind = "bloom"

    def __init__(self, capacity: int, fpr: float = 0.01) -> None:
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        if not (0.0 < fpr < 1.0):
            raise ValueError("fpr must be in (0,1)")
        self.capacity = int(capacity)
        self.fpr = float(fpr)
        m = int(math.ceil(-capacity * math.log(fpr) / (math.log(2) ** 2)))
        self.m = max(64, (m + 63) // 64 * 64)  # round up to whole words
        self.k = max(1, round((self.m / capacity) * math.log(2)))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)
        self.n_added = 0
        # lazy mode: keep raw 64-bit hashes until their 8 B/key outweighs
        # the m/8-byte bitmap — per-block partials of a corpus-sized filter
        # then serialize as a small hash list instead of a huge bitmap
        self._pending: list[np.ndarray] | None = []
        self._pending_n = 0
        self._lazy_limit = self.m // 64  # hashes; == bitmap bytes / 8

    # -- hashing -----------------------------------------------------------
    def _positions(self, h64: np.ndarray) -> np.ndarray:
        """(k, N) bit positions via double hashing of the 64-bit hash halves."""
        h1 = (h64 & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        h2 = (h64 >> np.uint64(32)).astype(np.uint64) | np.uint64(1)  # odd → full cycle
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    # -- update ------------------------------------------------------------
    def _set_bits(self, h64: np.ndarray) -> None:
        pos = self._positions(h64).ravel()
        words = pos >> 6
        masks = np.uint64(1) << (pos & 63).astype(np.uint64)
        np.bitwise_or.at(self.bits, words, masks)

    def _flush_pending(self) -> None:
        if self._pending is None:
            return
        for h in self._pending:
            self._set_bits(h)
        self._pending = None
        self._pending_n = 0

    def update_hashes(self, h64: np.ndarray) -> None:
        h64 = np.asarray(h64, dtype=np.uint64)
        if h64.size == 0:
            return
        self.n_added += int(h64.size)
        if self._pending is not None:
            self._pending.append(h64)
            self._pending_n += int(h64.size)
            if self._pending_n > self._lazy_limit:
                self._flush_pending()
            return
        self._set_bits(h64)

    def update_batch(self, values: Any) -> None:
        from ..engine.hashing import hash64_batch

        self.update_hashes(hash64_batch(values))

    # -- query -------------------------------------------------------------
    def contains_hashes(self, h64: np.ndarray) -> np.ndarray:
        self._flush_pending()
        h64 = np.asarray(h64, dtype=np.uint64)
        if h64.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h64)  # (k, N)
        words = pos >> 6
        masks = np.uint64(1) << (pos & 63).astype(np.uint64)
        hit = (self.bits[words] & masks) != 0
        return hit.all(axis=0)

    def contains_batch(self, values: Any) -> np.ndarray:
        from ..engine.hashing import hash64_batch

        return self.contains_hashes(hash64_batch(values))

    def fill_ratio(self) -> float:
        self._flush_pending()
        set_bits = int(np.unpackbits(self.bits.view(np.uint8)).sum())
        return set_bits / self.m

    def expected_fpr(self) -> float:
        """Observed-fill false-positive estimate (1-e^{-kn/m})^k analogue."""
        return self.fill_ratio() ** self.k

    # -- merge -------------------------------------------------------------
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m, other.k) != (self.m, self.k):
            raise ValueError("bloom merge: mismatched (m,k)")
        if self._pending is not None and other._pending is not None:
            self._pending.extend(other._pending)
            self._pending_n += other._pending_n
            if self._pending_n > self._lazy_limit:
                self._flush_pending()
        else:
            self._flush_pending()
            if other._pending is not None:
                for h in other._pending:
                    self._set_bits(h)
            else:
                np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "BloomFilter":
        """Bulk OR of serialized partials; sparse-word payloads scatter-OR
        their nonzero words, hash-list payloads replay their hashes in one
        concatenated vectorized pass."""
        first = cls.from_bytes(payloads[0])
        hdr = struct.calcsize("<QIQd") + 4
        hash_parts: list[np.ndarray] = first._pending or []
        first._pending, first._pending_n = None, 0
        for buf in payloads[1:]:
            m, k, n_added, _ = struct.unpack_from("<QIQd", buf, 4)
            if (m, k) != (first.m, first.k):
                raise ValueError("bloom merge: mismatched (m,k)")
            first.n_added += n_added
            mode, body = buf[hdr], buf[hdr + 1:]
            if mode == 1:
                (nw,) = struct.unpack_from("<Q", body)
                idx = np.frombuffer(body, dtype="<u8", count=nw, offset=8).astype(np.int64)
                words = np.frombuffer(body, dtype="<u8", count=nw, offset=8 + nw * 8)
                np.bitwise_or.at(first.bits, idx, words)
            elif mode == 2:
                (nh,) = struct.unpack_from("<Q", body)
                hash_parts.append(np.frombuffer(body, dtype="<u8", count=nh, offset=8))
            else:
                np.bitwise_or(first.bits, np.frombuffer(body, dtype="<u8"),
                              out=first.bits)
        if hash_parts:
            first._set_bits(np.unique(np.concatenate(hash_parts)))
        return first

    def result(self) -> dict[str, Any]:
        return {"m": self.m, "k": self.k, "n_added": self.n_added,
                "fill_ratio": self.fill_ratio()}

    # -- codec -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        """Dense bitmap or sparse word list, whichever is smaller.

        A per-block partial sets only O(unique_keys × k) bits of an m-bit
        filter sized for the whole corpus; serializing just the nonzero
        words keeps partial payloads KB-sized (mode 1: nw:u64 +
        word_idx:u64[nw] + words:u64[nw])."""
        head = _MAGIC + struct.pack("<QIQd", self.m, self.k, self.n_added,
                                    self.fpr)
        if self._pending is not None:
            h = (np.unique(np.concatenate(self._pending)) if self._pending
                 else np.zeros(0, dtype=np.uint64))
            return (head + b"\x02" + struct.pack("<Q", h.size)
                    + h.astype("<u8").tobytes())
        nz = np.flatnonzero(self.bits)
        if 8 + nz.size * 16 < self.bits.size * 8:
            return (head + b"\x01" + struct.pack("<Q", nz.size)
                    + nz.astype("<u8").tobytes()
                    + self.bits[nz].astype("<u8").tobytes())
        return head + b"\x00" + self.bits.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        hdr = struct.calcsize("<QIQd") + 4
        if len(buf) < hdr + 1 or buf[:4] != _MAGIC:
            raise CodecError("bloom: bad header")
        m, k, n_added, fpr = struct.unpack_from("<QIQd", buf, 4)
        mode = buf[hdr]
        body = buf[hdr + 1:]
        obj = cls.__new__(cls)
        obj.capacity = 0
        obj.fpr = fpr
        obj.m, obj.k, obj.n_added = m, k, n_added
        obj._pending, obj._pending_n = None, 0
        obj._lazy_limit = m // 64
        if mode == 0:
            if len(body) != m // 8:
                raise CodecError("bloom: bad length")
            obj.bits = np.frombuffer(body, dtype="<u8").copy()
        elif mode == 2:
            if len(body) < 8:
                raise CodecError("bloom: bad hash header")
            (nh,) = struct.unpack_from("<Q", body)
            if len(body) != 8 + nh * 8:
                raise CodecError("bloom: bad hash length")
            obj.bits = np.zeros(m // 64, dtype=np.uint64)
            obj._pending = [np.frombuffer(body, dtype="<u8", count=nh, offset=8).copy()]
            obj._pending_n = int(nh)
        elif mode == 1:
            if len(body) < 8:
                raise CodecError("bloom: bad sparse header")
            (nw,) = struct.unpack_from("<Q", body)
            if len(body) != 8 + nw * 16:
                raise CodecError("bloom: bad sparse length")
            idx = np.frombuffer(body, dtype="<u8", count=nw, offset=8).astype(np.int64)
            words = np.frombuffer(body, dtype="<u8", count=nw, offset=8 + nw * 8)
            obj.bits = np.zeros(m // 64, dtype=np.uint64)
            obj.bits[idx] = words
        else:
            raise CodecError(f"bloom: unknown mode {mode}")
        return obj
