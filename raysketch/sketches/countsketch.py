"""Count Sketch (AMS) — the SIGNED frequency sketch, mergeable UDAF.

Built from the published algorithm (Charikar, Chen, Farach-Colton 2002
"Finding frequent items in data streams"; Alon, Matias, Szegedy 1996 for
the F2 estimator): d hash rows of width w, each update adds ±weight at
one cell per row, a point query is the MEDIAN over rows of the signed
cell reads. Unlike count-min (always-overestimate, one-sided), count
sketch is UNBIASED with two-sided error ≤ √(F2/w) per row — the right
tool when under- and over-counts are equally bad — and the row
self-inner-product gives the AMS second-moment estimate F2 = Σ f(k)².

Complements this library's CMS (reference parity, conservative update)
rather than replacing it; the reference has no signed sketch.

Hash-fed (like HLL/Bloom/Theta): consumes ONE vectorized 64-bit hash
per value from ``engine.hashing.hash64_batch``; per-row cell index and
sign derive from the hash via fixed odd-multiplier remixing
(multiply-shift, Dietzfelbinger et al.) — deterministic across
processes, so merges are bit-identical under any permutation.

Serialization: dense int64 table, or a sparse (row, idx, value) triple
codec when the table is mostly zeros — per-block partials over bounded
key sets stay KB-sized on the exchange.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import CodecError

_MAGIC = b"CSK1"

# fixed odd multipliers per row (splitmix64 outputs, forced odd):
# published multiply-shift hashing needs any fixed odd constants
_ROW_MULT = np.array([
    0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
    0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5 | 1, 0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9, 0x27D4EB2F165667C5], dtype=np.uint64)

# INDEPENDENT odd multipliers for the per-row SIGN hash: Charikar et
# al.'s two-sided √(F2/w) analysis needs the sign independent of the
# bucket; deriving both from one product correlates them, so the sign
# comes from its own multiply-shift remix (top bit of a second product).
_SIGN_MULT = np.array([
    0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D,
    0x9E6C63D0876A9F77, 0xCA5A826395121157, 0x8CB92BA72F3D8DD7,
    0xDA942042E4DD58B5, 0x93D765DD3E9B3C4F], dtype=np.uint64)


class CountSketch:
    kind = "countsketch"

    def __init__(self, depth: int = 5, width: int = 1 << 16) -> None:
        if not (1 <= depth <= 8):
            raise ValueError("depth must be in [1, 8]")
        if width < 2 or (width & (width - 1)) != 0:
            raise ValueError("width must be a power of two >= 2")
        if depth % 2 == 0:
            raise ValueError("depth must be odd (median of rows)")
        if depth * width > (1 << 32):
            # the sparse codec stores flat cell indices as uint32; a
            # larger table would silently wrap them into corrupt payloads
            raise ValueError("depth*width must be <= 2^32 (sparse codec "
                             "stores uint32 cell indices)")
        self.depth = depth
        self.width = width
        self._shift = np.uint64(64 - int(np.log2(width)))
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.n = 0  # total |weight| mass (bound bookkeeping)

    # -- hashing ---------------------------------------------------------

    def _cells(self, h: np.ndarray):
        """(idx[d, n] int64, sign[d, n] int64) from 64-bit hashes."""
        h = np.asarray(h, dtype=np.uint64)
        idx = np.empty((self.depth, h.size), np.int64)
        sgn = np.empty((self.depth, h.size), np.int64)
        for r in range(self.depth):
            with np.errstate(over="ignore"):
                mix = h * _ROW_MULT[r]
                smix = h * _SIGN_MULT[r]
            idx[r] = (mix >> self._shift).astype(np.int64)
            # sign from an INDEPENDENT multiply-shift remix (top bit):
            # sign ⟂ bucket, as the published analysis assumes
            sgn[r] = 1 - 2 * (smix >> np.uint64(63)).astype(np.int64)
        return idx, sgn

    # -- updates ----------------------------------------------------------

    def update_hashes(self, h: np.ndarray, weights=None) -> None:
        h = np.asarray(h, dtype=np.uint64)
        if h.size == 0:
            return
        if weights is None:
            w = np.ones(h.size, dtype=np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64)
            if w.shape != h.shape:
                raise ValueError("weights shape mismatch")
        idx, sgn = self._cells(h)
        for r in range(self.depth):
            np.add.at(self.table[r], idx[r], sgn[r] * w)
        self.n += int(np.abs(w).sum())

    # -- queries ----------------------------------------------------------

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        """Median-of-rows point estimates for the given value hashes."""
        h = np.asarray(h, dtype=np.uint64)
        idx, sgn = self._cells(h)
        reads = np.empty((self.depth, h.size), np.int64)
        for r in range(self.depth):
            reads[r] = sgn[r] * self.table[r, idx[r]]
        return np.median(reads, axis=0).astype(np.int64)

    def f2(self) -> int:
        """AMS second frequency moment Σ f(k)²: median over rows of the
        row self-inner-product (each row is an unbiased estimator)."""
        per_row = (self.table.astype(object) ** 2).sum(axis=1)
        return int(sorted(per_row)[self.depth // 2])

    def negated(self) -> "CountSketch":
        """A sketch of the NEGATED stream (every weight × −1) — the
        signed-linearity primitive CMS lacks: ``a.merge(b.negated())``
        sketches the DIFFERENCE stream, so point queries estimate
        f_a(k) − f_b(k) directly (heavy-changer detection)."""
        out = CountSketch(self.depth, self.width)
        out.table = -self.table
        out.n = self.n
        return out

    # -- merge -------------------------------------------------------------

    def _check(self, other: "CountSketch") -> None:
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("countsketch param mismatch")

    def merge(self, other: "CountSketch") -> "CountSketch":
        self._check(other)
        self.table += other.table
        self.n += other.n
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "CountSketch":
        acc = cls.from_bytes(payloads[0])
        for p in payloads[1:]:
            d, w, n, table = cls._decode(p)
            if (d, w) != (acc.depth, acc.width):
                raise ValueError("countsketch param mismatch")
            acc.table += table
            acc.n += n
        return acc

    # -- codec --------------------------------------------------------------

    def to_bytes(self) -> bytes:
        nz = np.flatnonzero(self.table.ravel())
        head = struct.pack("<4sBIQ", _MAGIC, self.depth, self.width,
                           self.n)
        if nz.size * 12 < self.table.size * 8:
            vals = self.table.ravel()[nz]
            return (head + struct.pack("<BQ", 1, nz.size)
                    + nz.astype(np.uint32).tobytes()
                    + vals.astype(np.int64).tobytes())
        return head + struct.pack("<BQ", 0, 0) + self.table.tobytes()

    @classmethod
    def _decode(cls, buf: bytes):
        if len(buf) < 26 or buf[:4] != _MAGIC:
            raise CodecError("bad countsketch payload")
        _, d, w, n = struct.unpack_from("<4sBIQ", buf, 0)
        mode, nnz = struct.unpack_from("<BQ", buf, 17)
        off = 26
        table = np.zeros(d * w, dtype=np.int64)
        if mode == 1:
            need = off + nnz * 4 + nnz * 8
            if len(buf) != need:
                raise CodecError("truncated sparse countsketch payload")
            idx = np.frombuffer(buf, np.uint32, nnz, off)
            vals = np.frombuffer(buf, np.int64, nnz, off + nnz * 4)
            if nnz and int(idx.max()) >= d * w:
                raise CodecError("corrupt countsketch index")
            table[idx.astype(np.int64)] = vals
        elif mode == 0:
            if len(buf) != off + d * w * 8:
                raise CodecError("truncated dense countsketch payload")
            table = np.frombuffer(buf, np.int64, d * w, off).copy()
        else:
            raise CodecError("unknown countsketch codec mode")
        try:
            return d, w, n, table.reshape(d, w)
        except ValueError as ex:  # pragma: no cover
            raise CodecError(str(ex))

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountSketch":
        d, w, n, table = cls._decode(buf)
        sk = cls(depth=d, width=w)
        sk.table = table
        sk.n = n
        return sk
