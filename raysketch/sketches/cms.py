"""Count-min sketch with conservative update — mergeable frequency UDAF.

Semantics follow the reference (library/src/cm_sketch.c):

- construction: ``width = ceil(e/epsilon)``, ``depth = ceil(ln(1/delta))``;
  rejects epsilon, delta outside (0, 1) (cm_sketch.c:24-42). This encodes the
  published Cormode–Muthukrishnan bound P[est <= true + eps*N] >= 1-delta.
- hashing: XXH32 seeds 1 and 2, enhanced double hashing
  ``w_i = (h1 + i*h2 + i*i) % width`` (Kirsch–Mitzenmacher)
  (cm_sketch.c:73-78) — bit-identical here via raysketch.sketches.xxh32.
- scalar ``update``: conservative update ``cell = max(cell, est+n)``,
  saturating at UINT32_MAX; negative n removes, floored at the current
  estimate; ``unique_count`` tracks items whose estimate was 0 at insert
  (cm_sketch.c:66-121). This path exists for reference parity
  (tests vs library/tests/test_cm_sketch.c goldens).
- batch ``update_batch``: vectorized over an Arrow/numpy chunk of keys —
  duplicate keys in the chunk are pre-aggregated, then cells take
  ``max(cell, prior_est + n_key)`` via ``np.maximum.at``. Every cell stays
  an upper bound on every key's true count, so the eps*N/delta guarantee
  survives; estimates won't bit-match a sequential conservative sketch
  (documented in SURVEY.md §7.3).
- ``merge``: element-wise saturating sum of counters — the sum of
  conservative partials is >= each stream's true counts and <= the
  standard-update cells, so the merged sketch keeps the standard CMS bound.
  ``unique_count`` is NOT mergeable (use HLL); after a merge it reports the
  saturating sum, an upper bound only.

Serialization: our envelope is ``depth:u32 width:u32 item_count:u64
unique_count:u64 counts:u32[depth*width]`` little-endian; the payload after
the 8-byte header is byte-identical to the reference layout
(cm_sketch.c:144-163), which lets tests cross-check serialized state.
"""

from __future__ import annotations

import math
import struct
from typing import Any, Iterable, Sequence

import numpy as np

from .base import CodecError
from .xxh32 import xxh32, xxh32_batch

_U32_MAX = 0xFFFFFFFF
_U64_MAX = 0xFFFFFFFFFFFFFFFF
_E = 2.718281828459045  # cm_sketch.c:22 uses this literal, not math.e


def _as_bytes(key: Any) -> bytes:
    """Key coercion mirroring the Lua binding (lua_binding/cm_sketch.c:146-158):
    strings as raw bytes; numbers as their 8-byte little-endian double."""
    if isinstance(key, bytes):
        return key
    if isinstance(key, str):
        return key.encode("utf-8")
    if isinstance(key, (int, float)):
        return struct.pack("<d", float(key))
    raise TypeError(f"unsupported CMS key type {type(key)!r}")


class CMSketch:
    kind = "cms"

    def __init__(self, epsilon: float, delta: float, fast_hash: bool = False,
                 conservative: bool = True) -> None:
        if not (0.0 < epsilon < 1.0):
            raise ValueError("epsilon must be in (0,1)")
        if not (0.0 < delta < 1.0):
            raise ValueError("delta must be in (0,1)")
        self.epsilon = float(epsilon)
        self.delta = float(delta)
        self.width = int(math.ceil(_E / epsilon))
        self.depth = int(math.ceil(math.log(1.0 / delta)))
        self.counts = np.zeros((self.depth, self.width), dtype=np.uint32)
        self.item_count = 0
        self.unique_count = 0
        # fast_hash: row hashes from the engine's vectorized 64-bit family
        # (hash64_batch halves) instead of the reference's per-key XXH32 —
        # same Kirsch–Mitzenmacher row indexing and the same eps*N/delta
        # guarantee (any pairwise-independent family qualifies), ~5x faster
        # on high-cardinality string columns. Reference parity tests use
        # the default XXH32 mode; the two modes never merge (codec flag).
        self.fast_hash = bool(fast_hash)
        # conservative=True is the reference's update rule (cm_sketch.c:
        # max(cell, est+n) — tighter point queries). conservative=False is
        # the PLAIN Cormode–Muthukrishnan scatter-add: required by
        # inner_product (conservative cells are sub-linear, breaking the
        # a·b ≤ est guarantee — observed UNDERestimates). Modes never
        # merge (codec flag bit 1).
        self.conservative = bool(conservative)

    # -- hashing -----------------------------------------------------------
    def _indices(self, data: bytes) -> np.ndarray:
        # uint32 wraparound before the modulo, as in C (cm_sketch.c:78)
        h1 = np.uint32(xxh32(data, 1))
        h2 = np.uint32(xxh32(data, 2))
        i = np.arange(self.depth, dtype=np.uint32)
        with np.errstate(over="ignore"):
            return ((h1 + i * h2 + i * i) % np.uint32(self.width)).astype(np.int64)

    def _indices_batch(self, keys: Sequence[bytes]) -> np.ndarray:
        """(depth, K) index matrix for K keys, vectorized (uint32 wraparound)."""
        h1 = xxh32_batch(keys, 1)
        h2 = xxh32_batch(keys, 2)
        return self._km_indices(h1, h2)

    def _km_indices(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Kirsch–Mitzenmacher w_i = (h1 + i*h2 + i*i) % width (cm_sketch.c:78)."""
        i = np.arange(self.depth, dtype=np.uint32)[:, None]
        h1 = h1.astype(np.uint32)
        h2 = h2.astype(np.uint32)
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :] + i * i) % np.uint32(self.width)).astype(np.int64)

    def _indices_batch_fast(self, values: Any) -> tuple[np.ndarray, np.ndarray]:
        """Fast mode: (depth, K) indices + per-key counts straight from an
        Arrow chunk — value_counts in Arrow, one vectorized hash64 pass,
        no per-key Python bytes."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..engine.hashing import hash64_batch

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            vc = pc.value_counts(values)
            uniq, cnts = vc.field("values"), vc.field("counts")
            valid = pc.is_valid(uniq)
            if not pc.all(valid).as_py():
                uniq = uniq.filter(valid)
                cnts = cnts.filter(valid)
            n_per_key = cnts.to_numpy(zero_copy_only=False).astype(np.int64)
            h64 = hash64_batch(uniq)
        else:
            keys, n_per_key = _group_keys(values, None)
            h64 = hash64_batch(pa.array([k.decode("utf-8", "surrogateescape") for k in keys]))
        h1 = (h64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        h2 = (h64 >> np.uint64(32)).astype(np.uint32)
        return self._km_indices(h1, h2), n_per_key

    def _indices_scalar(self, key: Any) -> np.ndarray:
        """Row indices for ONE key, honoring the sketch's hash mode: a
        fast_hash sketch must index scalar updates/queries with the same
        hash64 family as its batch path (a scalar XXH32 update into a
        fast_hash sketch would land in different cells and read back 0)."""
        if self.fast_hash:
            import pyarrow as pa

            from ..engine.hashing import hash64_batch

            h64 = hash64_batch(pa.array([key]))
            h1 = (h64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            h2 = (h64 >> np.uint64(32)).astype(np.uint32)
            return self._km_indices(h1, h2)[:, 0]
        return self._indices(_as_bytes(key))

    # -- scalar path (reference parity, cm_sketch.c:66-121) ----------------
    def update(self, key: Any, n: int = 1) -> int:
        idx = self._indices_scalar(key)
        rows = np.arange(self.depth)
        cells = self.counts[rows, idx]
        est = int(cells.min()) if self.depth else 0

        if n > 0:
            if est == 0:
                self.unique_count += 1
            if not self.conservative:
                # plain add on every row (saturating)
                acc = cells.astype(np.uint64) + np.uint64(n)
                self.counts[rows, idx] = np.minimum(acc, _U32_MAX).astype(np.uint32)
                self.item_count = min(self.item_count + n, _U64_MAX)
                return est + n
            added = 0
            for i in range(self.depth):
                cnt = int(self.counts[i, idx[i]])
                if _U32_MAX - cnt < n:
                    tmp = _U32_MAX - cnt
                    self.counts[i, idx[i]] = max(cnt, est + tmp)
                    added = max(added, tmp)
                else:
                    self.counts[i, idx[i]] = max(cnt, est + n)
                    added = max(added, n)
            self.item_count = min(self.item_count + added, _U64_MAX)
            return est + added
        elif n < 0 and est != 0:
            n = abs(n)
            if n >= est:
                n = est
                self.unique_count -= 1
            self.counts[rows, idx] -= np.uint32(n)
            self.item_count -= n
            return est - n
        return est

    def point_query(self, key: Any) -> int:
        idx = self._indices_scalar(key)
        return int(self.counts[np.arange(self.depth), idx].min())

    # -- batch path --------------------------------------------------------
    def update_batch(self, values: Any, weights: Any | None = None) -> None:
        """Vectorized add of a chunk of string/bytes keys (weights >= 0)."""
        if self.fast_hash and weights is None:
            idx, n_per_key = self._indices_batch_fast(values)
            if n_per_key.size == 0:
                return
            return self._apply_batch(idx, n_per_key)
        keys, n_per_key = _group_keys(values, weights)
        if len(keys) == 0:
            return
        idx = self._indices_batch(keys)  # (depth, K)
        return self._apply_batch(idx, n_per_key)

    def _apply_batch(self, idx: np.ndarray, n_per_key: np.ndarray) -> None:
        rows = np.arange(self.depth)[:, None]
        cells = self.counts[rows, idx]  # (depth, K)
        est = cells.min(axis=0).astype(np.uint64)  # prior estimate per key
        self.unique_count += int((est == 0).sum())
        if self.conservative:
            new = np.minimum(est + n_per_key.astype(np.uint64), _U32_MAX).astype(np.uint32)
            np.maximum.at(self.counts, (rows.repeat(idx.shape[1], 1), idx), new[None, :])
        else:
            # plain scatter-add (saturating): dedupe shared cells first so
            # the add happens once per cell in uint64, then clamp
            flat = self.counts.ravel()
            lin = (rows * self.width + idx).ravel()
            vals = np.broadcast_to(n_per_key, (self.depth, n_per_key.size)).ravel()
            ulin, inv = np.unique(lin, return_inverse=True)
            sums = np.bincount(inv, weights=vals.astype(np.float64))
            acc = flat[ulin].astype(np.uint64) + sums.astype(np.uint64)
            flat[ulin] = np.minimum(acc, _U32_MAX).astype(np.uint32)
        self.item_count = min(self.item_count + int(n_per_key.sum()), _U64_MAX)

    def point_query_batch(self, values: Any) -> np.ndarray:
        if self.fast_hash:
            import pyarrow as pa

            from ..engine.hashing import hash64_batch

            if not isinstance(values, (pa.Array, pa.ChunkedArray)):
                values = pa.array(list(values))
            h64 = hash64_batch(values)
            h1 = (h64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            h2 = (h64 >> np.uint64(32)).astype(np.uint32)
            idx = self._km_indices(h1, h2)
        else:
            keys = [_as_bytes(k) for k in _iter_keys(values)]
            if not keys:
                return np.zeros(0, dtype=np.uint64)
            idx = self._indices_batch(keys)
        rows = np.arange(self.depth)[:, None]
        return self.counts[rows, idx].min(axis=0).astype(np.uint64)

    def inner_product(self, other: "CMSketch") -> int:
        """Join-size / inner-product estimate Σ_k f_a(k)·f_b(k) from the two
        sketches alone (Cormode & Muthukrishnan 2005 §4.2: est_d =
        dot(row_d_a, row_d_b), answer = min_d est_d). Guarantee:
        true ≤ est ≤ true + ε·‖a‖₁·‖b‖₁ with probability 1−δ. In the
        collision-free regime (key domain ≪ width, the repo's sparse-exact
        principle) the estimate IS the exact join cardinality.

        Both sketches must share (width, depth, hash mode) — same-seed rows
        are what aligns the per-row dot products."""
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("CMS inner_product: mismatched dimensions")
        if other.fast_hash != self.fast_hash:
            raise ValueError("CMS inner_product: mismatched hash modes")
        if self.conservative or other.conservative:
            raise ValueError(
                "CMS inner_product requires plain-update sketches "
                "(conservative=False): conservative cells are sub-linear "
                "and void the overestimate guarantee"
            )
        # float64 accumulation: exact for dots < 2^53 (every oracle-gated
        # regime); beyond that the ~1e-16 relative rounding is noise next
        # to the ε·‖a‖₁·‖b‖₁ estimation slack. uint64 would WRAP instead
        # (a single saturated-cell product already touches 2^64).
        dots = np.einsum(
            "dw,dw->d",
            self.counts.astype(np.float64),
            other.counts.astype(np.float64),
        )
        return int(dots.min())

    # -- merge (element-wise saturating sum) -------------------------------
    def merge(self, other: "CMSketch") -> "CMSketch":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("CMS merge: mismatched dimensions")
        if other.fast_hash != self.fast_hash:
            raise ValueError("CMS merge: mismatched hash modes")
        if other.conservative != self.conservative:
            raise ValueError("CMS merge: mismatched update modes")
        s = self.counts.astype(np.uint64) + other.counts.astype(np.uint64)
        self.counts = np.minimum(s, _U32_MAX).astype(np.uint32)
        self.item_count = min(self.item_count + other.item_count, _U64_MAX)
        self.unique_count = min(self.unique_count + other.unique_count, _U64_MAX)
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "CMSketch":
        """Bulk merge of serialized partials without densifying each one:
        sparse payloads scatter-add straight into one u64 accumulator, so
        the reduce side is O(total nnz), not O(partials × width × depth)."""
        first = cls.from_bytes(payloads[0])
        acc = first.counts.astype(np.uint64).ravel()
        item_count, unique_count = first.item_count, first.unique_count
        for buf in payloads[1:]:
            depth, width, ic, uc = struct.unpack_from("<2I2Q", buf)
            if (depth, width) != (first.depth, first.width):
                raise ValueError("CMS merge: mismatched dimensions")
            if bool(buf[25] & 1) != first.fast_hash:
                raise ValueError("CMS merge: mismatched hash modes")
            if (not (buf[25] & 2)) != first.conservative:
                raise ValueError("CMS merge: mismatched update modes")
            item_count = min(item_count + ic, _U64_MAX)
            unique_count = min(unique_count + uc, _U64_MAX)
            mode, body = buf[24], buf[26:]
            if mode == 1:
                (nnz,) = struct.unpack_from("<Q", body)
                idx = np.frombuffer(body, dtype="<u8", count=nnz, offset=8).astype(np.int64)
                vals = np.frombuffer(body, dtype="<u4", count=nnz, offset=8 + nnz * 8)
                np.add.at(acc, idx, vals.astype(np.uint64))
            else:
                acc += np.frombuffer(body, dtype="<u4").astype(np.uint64)
        first.counts = np.minimum(acc, _U32_MAX).astype(np.uint32).reshape(
            first.depth, first.width
        )
        first.item_count, first.unique_count = item_count, unique_count
        return first

    def clear(self) -> None:
        self.counts[:] = 0
        self.item_count = 0
        self.unique_count = 0

    def result(self) -> dict[str, Any]:
        return {"item_count": self.item_count, "unique_count": self.unique_count,
                "width": self.width, "depth": self.depth}

    # -- codec -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        """Dense or sparse envelope, whichever is smaller.

        Partials built from one block touch only O(unique_keys × depth)
        cells of the depth×width array, so the shuffle/checkpoint payload
        of a per-block partial is KBs even when the dense sketch is MBs —
        this is what keeps the partial-merge exchange trivial at corpus
        scale (SURVEY.md §7.3). Format: header + mode:u8; mode 0 = dense
        u32 grid, mode 1 = nnz:u64 + flat_idx:u64[nnz] + counts:u32[nnz].
        """
        head = struct.pack("<2I2Q", self.depth, self.width,
                           self.item_count, self.unique_count)
        # flags byte: bit0 = fast_hash, bit1 = plain (non-conservative)
        # update mode; old payloads (bit1 absent) decode as conservative
        hm = bytes([(1 if self.fast_hash else 0)
                    | (0 if self.conservative else 2)])
        flat = self.counts.ravel()
        nnz_idx = np.flatnonzero(flat)
        sparse_size = 8 + nnz_idx.size * 12
        if sparse_size < flat.size * 4:
            return (head + b"\x01" + hm + struct.pack("<Q", nnz_idx.size)
                    + nnz_idx.astype("<u8").tobytes()
                    + flat[nnz_idx].astype("<u4").tobytes())
        return head + b"\x00" + hm + self.counts.astype("<u4").tobytes()

    def to_reference_bytes(self) -> bytes:
        """Byte-identical to sa_serialize_cms (cm_sketch.c:144-163)."""
        return (struct.pack("<2Q", self.item_count, self.unique_count)
                + self.counts.astype("<u4").tobytes())

    @classmethod
    def from_bytes(cls, buf: bytes, epsilon: float | None = None,
                   delta: float | None = None) -> "CMSketch":
        if len(buf) < 26:
            raise CodecError("cms: buffer too short")
        depth, width, item_count, unique_count = struct.unpack_from("<2I2Q", buf)
        mode = buf[24]
        body = buf[26:]
        cms = cls.__new__(cls)
        cms.epsilon = epsilon if epsilon is not None else _E / width
        cms.delta = delta if delta is not None else math.exp(-depth)
        cms.width, cms.depth = width, depth
        cms.item_count, cms.unique_count = item_count, unique_count
        cms.fast_hash = bool(buf[25] & 1)
        cms.conservative = not (buf[25] & 2)
        if mode == 0:
            if len(body) != 4 * depth * width:
                raise CodecError(f"cms: bad length {len(buf)}")
            cms.counts = np.frombuffer(body, dtype="<u4").reshape(depth, width).copy()
        elif mode == 1:
            if len(body) < 8:
                raise CodecError("cms: bad sparse header")
            (nnz,) = struct.unpack_from("<Q", body)
            if len(body) != 8 + nnz * 12:
                raise CodecError(f"cms: bad sparse length {len(buf)}")
            idx = np.frombuffer(body, dtype="<u8", count=nnz, offset=8).astype(np.int64)
            vals = np.frombuffer(body, dtype="<u4", count=nnz, offset=8 + nnz * 8)
            flat = np.zeros(depth * width, dtype=np.uint32)
            flat[idx] = vals
            cms.counts = flat.reshape(depth, width)
        else:
            raise CodecError(f"cms: unknown mode {mode}")
        return cms


def _iter_keys(values: Any) -> Iterable[Any]:
    try:
        import pyarrow as pa
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            return (v.as_py() for v in values)
    except ImportError:  # pragma: no cover
        pass
    return iter(values)


def _group_keys(values: Any, weights: Any | None) -> tuple[list[bytes], np.ndarray]:
    """Collapse duplicate keys in a chunk into (unique_keys, total_weights).

    Pre-aggregating duplicates keeps the conservative batch update an upper
    bound per key (see module docstring) and shrinks the hash work.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if weights is None and isinstance(values, (pa.Array, pa.ChunkedArray)):
        vc = pc.value_counts(values)
        uniq = vc.field("values")
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        keys = [_as_bytes(k) for k in uniq.to_pylist() if k is not None]
        mask = np.fromiter((k is not None for k in uniq.to_pylist()),
                           dtype=bool, count=len(cnts))
        return keys, cnts[mask].astype(np.int64)
    vals = list(_iter_keys(values))
    if weights is None:
        w = np.ones(len(vals), dtype=np.int64)
    else:
        w = np.asarray(weights, dtype=np.int64)
    agg: dict[bytes, int] = {}
    for v, n in zip(vals, w):
        if v is None:
            continue
        b = _as_bytes(v)
        agg[b] = agg.get(b, 0) + int(n)
    if not agg:
        return [], np.zeros(0, dtype=np.int64)
    keys = list(agg.keys())
    return keys, np.fromiter(agg.values(), dtype=np.int64, count=len(keys))
