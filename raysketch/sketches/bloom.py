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

    # -- hashing -----------------------------------------------------------
    def _positions(self, h64: np.ndarray) -> np.ndarray:
        """(k, N) bit positions via double hashing of the 64-bit hash halves."""
        h1 = (h64 & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        h2 = (h64 >> np.uint64(32)).astype(np.uint64) | np.uint64(1)  # odd → full cycle
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    # -- update ------------------------------------------------------------
    def update_hashes(self, h64: np.ndarray) -> None:
        h64 = np.asarray(h64, dtype=np.uint64)
        if h64.size == 0:
            return
        pos = self._positions(h64).ravel()
        words = pos >> 6
        masks = np.uint64(1) << (pos & 63).astype(np.uint64)
        np.bitwise_or.at(self.bits, words, masks)
        self.n_added += int(h64.size)

    def update_batch(self, values: Any) -> None:
        from ..engine.hashing import hash64_batch

        self.update_hashes(hash64_batch(values))

    # -- query -------------------------------------------------------------
    def contains_hashes(self, h64: np.ndarray) -> np.ndarray:
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
        set_bits = int(np.unpackbits(self.bits.view(np.uint8)).sum())
        return set_bits / self.m

    def expected_fpr(self) -> float:
        """Observed-fill false-positive estimate (1-e^{-kn/m})^k analogue."""
        return self.fill_ratio() ** self.k

    # -- merge -------------------------------------------------------------
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m, other.k) != (self.m, self.k):
            raise ValueError("bloom merge: mismatched (m,k)")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "BloomFilter":
        """Bulk OR of serialized partials; sparse payloads scatter-OR their
        nonzero words directly (O(total set words), not O(partials × m))."""
        first = cls.from_bytes(payloads[0])
        hdr = struct.calcsize("<QIQd") + 4
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
            else:
                np.bitwise_or(first.bits, np.frombuffer(body, dtype="<u8"),
                              out=first.bits)
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
        if mode == 0:
            if len(body) != m // 8:
                raise CodecError("bloom: bad length")
            obj.bits = np.frombuffer(body, dtype="<u8").copy()
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
