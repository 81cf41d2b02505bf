"""HyperLogLog distinct-count sketch (sparse + dense) — mergeable UDAF.

Built from the published algorithm (Flajolet, Fusy, Gandouet, Meunier 2007)
with the HLL++ refinements that matter for a 64-bit hash (Heule, Nunkesser,
Hall 2013): a sparse exact mode below a promotion threshold, linear-counting
small-range correction in dense mode, and no 32-bit large-range correction
(unnecessary with 64-bit hashes).

The reference ecosystem delegates distinct counting to an external
``hyperloglog`` Lua module (lua_binding/luasandbox/sandboxes/heka/analysis/
heka_message_monitor.lua:62,510) and the reference's own CMS ``unique_count``
is explicitly non-mergeable (library/src/cm_sketch.c:84,109) — HLL is the
distributed distinct-count tool here (SURVEY.md §2.7).

Hashing: 64-bit values from :func:`raysketch.engine.hashing.hash64_batch`
(deterministic, vectorized). Sparse mode stores the raw 64-bit hashes, so
below the promotion threshold the estimate is the *exact* number of distinct
hashes (= distinct values up to a ~n²/2⁶⁴ collision probability) — this is
what lets small-scale correctness gates compare against COUNT(DISTINCT).

Merge: sparse∪sparse (promote on overflow), sparse folded into dense,
dense∨dense = register-wise max. All merges are associative and
order-independent (bit-identical under permutation).

Error: 1.04/sqrt(2^p) relative standard error in dense mode.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

from .base import CodecError

_MAGIC = b"HLL1"


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


class HyperLogLog:
    kind = "hll"

    def __init__(self, p: int = 14, sparse_limit: int | None = None) -> None:
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4,18]")
        self.p = p
        self.m = 1 << p
        # sparse set cap: promote to dense once the 8-byte-per-hash sparse
        # set would out-weigh the m-byte dense register file (serialized
        # partials shuffle; keeping them <= dense size bounds merge volume)
        self.sparse_limit = sparse_limit if sparse_limit is not None else max(1024, self.m // 8)
        self.sparse: np.ndarray | None = np.zeros(0, dtype=np.uint64)
        self.registers: np.ndarray | None = None

    # -- update ------------------------------------------------------------
    def update_hashes(self, h: np.ndarray) -> None:
        """Absorb a chunk of precomputed 64-bit hashes."""
        h = np.asarray(h, dtype=np.uint64)
        if h.size == 0:
            return
        if self.sparse is not None:
            self.sparse = np.union1d(self.sparse, h)
            if self.sparse.size > self.sparse_limit:
                self._promote()
        else:
            self._dense_update(h)

    def update_batch(self, values: Any) -> None:
        from ..engine.hashing import hash64_batch

        self.update_hashes(hash64_batch(values))

    def _promote(self) -> None:
        assert self.sparse is not None
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self._dense_update(self.sparse)
        self.sparse = None

    def _dense_update(self, h: np.ndarray) -> None:
        assert self.registers is not None
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h & np.uint64((1 << (64 - self.p)) - 1)
        # rho = leading-zero count of the (64-p)-bit remainder + 1
        bl = np.zeros(rest.shape, dtype=np.int64)
        nz = rest != 0
        # bit_length via log2 is unsafe at 2^53; use a masked shift loop (6 iters)
        r = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r >= (np.uint64(1) << np.uint64(shift))
            bl = np.where(mask, bl + shift, bl)
            r = np.where(mask, r >> np.uint64(shift), r)
        bl = np.where(nz, bl + 1, 0)  # bit_length
        rho = np.where(nz, (64 - self.p) - bl + 1, (64 - self.p) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    # -- estimate ----------------------------------------------------------
    def estimate(self) -> float:
        if self.sparse is not None:
            return float(self.sparse.size)
        M = self.registers.astype(np.float64)
        raw = _alpha(self.m) * self.m * self.m / np.sum(np.exp2(-M))
        if raw <= 2.5 * self.m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return float(self.m * np.log(self.m / zeros))
        return float(raw)

    @property
    def is_sparse(self) -> bool:
        return self.sparse is not None

    # -- merge -------------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("HLL merge: mismatched precision")
        if self.sparse is not None and other.sparse is not None:
            self.sparse = np.union1d(self.sparse, other.sparse)
            if self.sparse.size > self.sparse_limit:
                self._promote()
        elif self.sparse is not None:  # other dense
            sp = self.sparse
            self.registers = other.registers.copy()
            self.sparse = None
            self._dense_update(sp)
        elif other.sparse is not None:
            self._dense_update(other.sparse)
        else:
            np.maximum(self.registers, other.registers, out=self.registers)
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "HyperLogLog":
        """Bulk merge: one unique() over all sparse hash sets + one
        register-max reduction over the dense ones."""
        sparse_parts: list[np.ndarray] = []
        dense: np.ndarray | None = None
        first = cls.from_bytes(payloads[0])
        for i, buf in enumerate(payloads):
            obj = first if i == 0 else cls.from_bytes(buf)
            if obj.p != first.p:
                raise ValueError("HLL merge: mismatched precision")
            if obj.sparse is not None:
                sparse_parts.append(obj.sparse)
            elif dense is None:
                dense = obj.registers
            else:
                np.maximum(dense, obj.registers, out=dense)
        sp = np.unique(np.concatenate(sparse_parts)) if sparse_parts else None
        out = cls(p=first.p, sparse_limit=first.sparse_limit)
        if dense is None:
            out.sparse = sp if sp is not None else np.zeros(0, dtype=np.uint64)
            if out.sparse.size > out.sparse_limit:
                out._promote()
        else:
            out.sparse = None
            out.registers = dense
            if sp is not None and sp.size:
                out._dense_update(sp)
        return out

    def result(self) -> dict[str, Any]:
        return {"estimate": self.estimate(), "p": self.p, "sparse": self.is_sparse}

    # -- codec -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        mode = 0 if self.sparse is not None else 1
        head = _MAGIC + struct.pack("<BBQ", self.p, mode,
                                    self.sparse.size if mode == 0 else self.m)
        if mode == 0:
            return head + self.sparse.astype("<u8").tobytes()
        return head + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HyperLogLog":
        if len(buf) < 14 or buf[:4] != _MAGIC:
            raise CodecError("hll: bad header")
        p, mode, n = struct.unpack_from("<BBQ", buf, 4)
        body = buf[14:]
        obj = cls(p=p)
        if mode == 0:
            if len(body) != 8 * n:
                raise CodecError("hll: bad sparse length")
            obj.sparse = np.frombuffer(body, dtype="<u8").copy()
        else:
            if len(body) != obj.m:
                raise CodecError("hll: bad dense length")
            obj.sparse = None
            obj.registers = np.frombuffer(body, dtype=np.uint8).copy()
        return obj
