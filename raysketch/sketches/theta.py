"""Theta sketch — mergeable distinct-count sketch with SET ALGEBRA.

Built from the published Theta-Sketch Framework (Dasgupta, Lang, Rhodes,
Thaler 2016, "A Framework for Estimating Stream Expression Cardinalities";
the KMV lineage is Bar-Yossef et al. 2002 / Beyer et al. 2007). HLL answers
|A| only; theta sketches additionally answer |A ∪ B|, |A ∩ B| and |A \\ B|
from the sketches alone — the set-expression tool the reference ecosystem
lacks entirely (its CMS ``unique_count`` is explicitly non-mergeable,
library/src/cm_sketch.c:84,109).

State: a sampling threshold ``theta`` ∈ (0, 2^64] and the set of retained
64-bit hashes strictly below it, capped at ``k`` entries (QuickSelect
discipline: on overflow keep the k smallest and set theta to the (k+1)-th
smallest hash). Hashes come from :func:`raysketch.engine.hashing.
hash64_batch` (deterministic, vectorized) — the sketch is hash-fed like
HLL/Bloom, so the engine hashes each block ONCE for all hash-fed specs.

Exactness gate (the repo's sparse-exact principle): while ``theta == 2^64``
no sampling has happened and ``estimate() == |retained|`` is the EXACT
distinct-hash count — small-scale oracle queries compare bit-for-bit
against SQL ``COUNT(DISTINCT)`` / ``INTERSECT`` / ``EXCEPT``.

Estimation mode: estimate = |retained| / (theta / 2^64), relative standard
error ≈ 1/sqrt(k-2) for unions (Beyer et al. 2007); intersections inherit
the union's theta, so their error grows as the true intersection shrinks
relative to 1/theta — the published caveat, restated in :func:`intersect`.

Merge (union) is associative and ORDER-INDEPENDENT in exact mode
(bit-identical under permutation: the retained set is a plain set union).
In estimation mode the final (theta, retained) pair can differ by merge
order — bound-equivalent, the same contract the DataSketches library
documents — covered by property tests.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

from .base import CodecError

_MAGIC = b"THS1"
_FULL = 1 << 64  # theta value meaning "no sampling yet" (exact mode)


class ThetaSketch:
    kind = "theta"

    def __init__(self, k: int = 4096) -> None:
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = k
        self.theta: int = _FULL
        self.retained: np.ndarray = np.zeros(0, dtype=np.uint64)

    # -- update --------------------------------------------------------
    def update_hashes(self, h: np.ndarray) -> None:
        """Absorb a chunk of precomputed 64-bit hashes (engine fast path)."""
        h = np.asarray(h, dtype=np.uint64)
        if h.size == 0:
            return
        if self.theta < _FULL:
            h = h[h < np.uint64(self.theta)]
        self.retained = np.union1d(self.retained, h)
        self._trim()

    def update_batch(self, values: Any) -> None:
        from ..engine.hashing import hash64_batch

        self.update_hashes(hash64_batch(values))

    def _trim(self) -> None:
        if self.retained.size > self.k:
            # union1d returned sorted distinct hashes: keep the k smallest,
            # theta becomes the smallest EXCLUDED hash (strict < filter)
            self.theta = int(self.retained[self.k])
            self.retained = self.retained[: self.k].copy()

    # -- estimate ------------------------------------------------------
    @property
    def is_exact(self) -> bool:
        return self.theta == _FULL

    def estimate(self) -> float:
        if self.is_exact:
            return float(self.retained.size)
        return float(self.retained.size) * (float(_FULL) / float(self.theta))

    # -- merge (union) ---------------------------------------------------
    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if other.k != self.k:
            raise ValueError("theta merge: mismatched k")
        self.theta = min(self.theta, other.theta)
        th = np.uint64(self.theta) if self.theta < _FULL else None
        a, b = self.retained, other.retained
        if th is not None:
            a, b = a[a < th], b[b < th]
        self.retained = np.union1d(a, b)
        self._trim()
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "ThetaSketch":
        """Bulk union: one unique() over all retained sets under the global
        min-theta — one pass instead of pairwise merges."""
        sketches = [cls.from_bytes(p) for p in payloads]
        ks = {s.k for s in sketches}
        if len(ks) > 1:
            raise ValueError("theta merge: mismatched k")
        out = cls(k=sketches[0].k)
        out.theta = min(s.theta for s in sketches)
        parts = []
        th = np.uint64(out.theta) if out.theta < _FULL else None
        for s in sketches:
            r = s.retained
            parts.append(r if th is None else r[r < th])
        out.retained = np.unique(np.concatenate(parts)) if parts else \
            np.zeros(0, dtype=np.uint64)
        out._trim()
        return out

    def result(self) -> dict[str, Any]:
        return {"estimate": self.estimate(), "k": self.k, "exact": self.is_exact}

    # -- codec -----------------------------------------------------------
    def to_bytes(self) -> bytes:
        mode = 0 if self.is_exact else 1
        theta_u64 = 0 if self.is_exact else self.theta
        head = _MAGIC + struct.pack("<BIQQ", mode, self.k, theta_u64,
                                    self.retained.size)
        return head + np.ascontiguousarray(self.retained, "<u8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "ThetaSketch":
        if len(buf) < 25 or buf[:4] != _MAGIC:
            raise CodecError("theta: bad header")
        mode, k, theta_u64, n = struct.unpack_from("<BIQQ", buf, 4)
        body = buf[25:]
        if len(body) != 8 * n:
            raise CodecError("theta: bad retained length")
        obj = cls(k=k)
        obj.theta = _FULL if mode == 0 else int(theta_u64)
        obj.retained = np.frombuffer(body, dtype="<u8").copy()
        return obj


class ThetaSetResult:
    """Result of a theta set expression: (theta, retained) WITHOUT the
    k-cap (set-op results are not re-sampled — DataSketches semantics).
    Exposes ``estimate()`` and chains into further set ops."""

    def __init__(self, theta: int, retained: np.ndarray) -> None:
        self.theta = theta
        self.retained = np.asarray(retained, dtype=np.uint64)

    @property
    def is_exact(self) -> bool:
        return self.theta == _FULL

    def estimate(self) -> float:
        if self.is_exact:
            return float(self.retained.size)
        return float(self.retained.size) * (float(_FULL) / float(self.theta))


def _filtered(s: "ThetaSketch | ThetaSetResult", theta: int) -> np.ndarray:
    r = s.retained
    return r if theta == _FULL else r[r < np.uint64(theta)]


def union(sketches: list) -> ThetaSetResult:
    """|A ∪ B ∪ ...| (uncapped result set; inputs already bounded by k)."""
    theta = min(s.theta for s in sketches)
    parts = [_filtered(s, theta) for s in sketches]
    return ThetaSetResult(theta, np.unique(np.concatenate(parts)))


def intersect(a, b) -> ThetaSetResult:
    """|A ∩ B| from the sketches alone. Error caveat (Dasgupta et al. §5):
    relative error scales with |A∪B|/|A∩B| — tiny intersections of huge
    sets are the hard case; exact mode (theta==2^64) is exact."""
    theta = min(a.theta, b.theta)
    return ThetaSetResult(
        theta, np.intersect1d(_filtered(a, theta), _filtered(b, theta))
    )


def a_not_b(a, b) -> ThetaSetResult:
    """|A \\ B| from the sketches alone (same error model as intersect)."""
    theta = min(a.theta, b.theta)
    return ThetaSetResult(
        theta, np.setdiff1d(_filtered(a, theta), _filtered(b, theta))
    )
