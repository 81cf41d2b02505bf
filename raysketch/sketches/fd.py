"""Frequent Directions — mergeable MATRIX sketch (Liberty, KDD 2013;
Ghashami et al., SIAM J. Comput. 2016).

Maintains an ℓ×d row sketch B of a tall n×d matrix A such that

    0 ⪯ AᵀA − BᵀB   and   ‖AᵀA − BᵀB‖₂ ≤ ‖A‖_F² / ℓ

— the covariance/PCA scale path when d is too wide for the exact d×d
Gram pass (this library's ``ops/similarity.covariance`` is exact and
preferred at d≈64; FD is what survives d≈10⁵ feature spaces). The
shrink step is the published one: on buffer overflow, SVD, subtract
σ_ℓ² from every squared singular value, keep the top ℓ−1 directions.

MERGEABLE (the 2016 result): concatenating two sketches' rows and
re-shrinking preserves the same bound — merges are bound-equivalent
under permutation (like t-digest/KLL), not bit-identical; the
invariant tests gate the bound, not byte equality. Tracks ‖A‖_F²
exactly (float64 sum of squares) and the total shrink mass, whose sum
certifies the bound at query time.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import CodecError

_MAGIC = b"FDS1"


class FrequentDirections:
    kind = "fd"

    def __init__(self, ell: int = 16, dim: int | None = None) -> None:
        if ell < 2:
            raise ValueError("ell must be >= 2")
        self.ell = ell
        self.dim = dim
        self._buf: np.ndarray | None = (
            np.zeros((2 * ell, dim), np.float64) if dim else None)
        self._fill = 0
        self.frob2 = 0.0   # exact ||A||_F^2 seen
        self.shrink2 = 0.0  # total subtracted mass (bound certificate)
        self.n = 0

    # -- updates -----------------------------------------------------------

    def _ensure(self, d: int) -> None:
        if self.dim is None:
            self.dim = d
            self._buf = np.zeros((2 * self.ell, d), np.float64)
        elif d != self.dim:
            raise ValueError(f"fd dim mismatch: {d} != {self.dim}")

    def _shrink(self) -> None:
        B = self._buf[:self._fill]
        # economy SVD of the buffer; deterministic per BLAS
        _, s, vt = np.linalg.svd(B, full_matrices=False)
        k = min(self.ell - 1, s.size)
        delta = float(s[k] ** 2) if s.size > k else 0.0
        s2 = np.maximum(s[:k] ** 2 - delta, 0.0)
        rows = np.sqrt(s2)[:, None] * vt[:k]
        self._buf[:k] = rows
        self._buf[k:] = 0.0
        self._fill = k
        self.shrink2 += delta

    def update_batch(self, values) -> None:
        """Append rows; accepts a 2-D numpy array or an Arrow
        list<float> column (the sketch-UDAF calling convention)."""
        if hasattr(values, "to_pylist"):  # Arrow Array / ChunkedArray
            rows = [np.asarray(v, np.float64) for v in values.to_pylist()
                    if v is not None]
            if not rows:
                return
            X = np.stack(rows)
        else:
            X = np.asarray(values, np.float64)
            if X.ndim == 1:
                X = X[None, :]
        if X.size == 0:
            return
        self._ensure(X.shape[1])
        self.frob2 += float((X * X).sum())
        self.n += len(X)
        i = 0
        while i < len(X):
            take = min(len(X) - i, 2 * self.ell - self._fill)
            self._buf[self._fill:self._fill + take] = X[i:i + take]
            self._fill += take
            i += take
            if self._fill >= 2 * self.ell:
                self._shrink()

    # -- queries -------------------------------------------------------------

    def sketch_matrix(self) -> np.ndarray:
        """The current ℓ-ish × d row sketch B (compressed first)."""
        if self._buf is None:
            raise ValueError("fd: empty sketch")
        if self._fill > self.ell:
            self._shrink()
        return self._buf[:self._fill].copy()

    def gram(self) -> np.ndarray:
        B = self.sketch_matrix()
        return B.T @ B

    def bound(self) -> float:
        """Certified ‖AᵀA − BᵀB‖₂ upper bound = total shrink mass
        (tighter than the worst-case ‖A‖_F²/ℓ; both hold)."""
        return self.shrink2

    # -- merge -----------------------------------------------------------------

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if other.ell != self.ell:
            raise ValueError("fd param mismatch")
        if other.dim is None:
            return self
        if self.dim is None:
            self._ensure(other.dim)
        elif self.dim != other.dim:
            raise ValueError("fd dim mismatch")
        rows = other._buf[:other._fill]
        self.frob2 += other.frob2
        self.shrink2 += other.shrink2
        self.n += other.n
        i = 0
        while i < len(rows):
            take = min(len(rows) - i, 2 * self.ell - self._fill)
            self._buf[self._fill:self._fill + take] = rows[i:i + take]
            self._fill += take
            i += take
            if self._fill >= 2 * self.ell:
                self._shrink()
        return self

    @classmethod
    def merge_many(cls, payloads: list[bytes]) -> "FrequentDirections":
        acc = cls.from_bytes(payloads[0])
        for p in payloads[1:]:
            acc.merge(cls.from_bytes(p))
        return acc

    # -- codec --------------------------------------------------------------------

    def to_bytes(self) -> bytes:
        if self._fill > self.ell and self._buf is not None:
            self._shrink()  # ship at most ell rows
        d = self.dim or 0
        fill = self._fill if self._buf is not None else 0
        head = struct.pack("<4sIIIQdd", _MAGIC, self.ell, d, fill,
                           self.n, self.frob2, self.shrink2)
        if fill:
            return head + self._buf[:fill].astype(np.float64).tobytes()
        return head

    @classmethod
    def from_bytes(cls, buf: bytes) -> "FrequentDirections":
        if len(buf) < 40 or buf[:4] != _MAGIC:
            raise CodecError("bad fd payload")
        _, ell, d, fill, n, frob2, shrink2 = struct.unpack_from(
            "<4sIIIQdd", buf, 0)
        if len(buf) != 40 + fill * d * 8:
            raise CodecError("truncated fd payload")
        sk = cls(ell=ell, dim=d if d else None)
        if fill:
            rows = np.frombuffer(buf, np.float64, fill * d, 40) \
                .reshape(fill, d)
            sk._buf[:fill] = rows
            sk._fill = fill
        sk.n = n
        sk.frob2 = frob2
        sk.shrink2 = shrink2
        return sk
