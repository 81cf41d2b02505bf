"""Frequent Directions (Liberty 2013): PSD + spectral bound invariants,
merge bound-equivalence, codec round-trip, PCA usefulness."""

import numpy as np
import pytest

from raysketch.sketches import FrequentDirections
from raysketch.sketches.base import CodecError


def _rand(n, d, seed):
    rng = np.random.default_rng(seed)
    # low-rank + noise: the regime FD is built for
    U = rng.normal(size=(n, 3))
    V = rng.normal(size=(3, d))
    return U @ V * 3 + rng.normal(size=(n, d)) * 0.3


def _check_bound(A, fd):
    G = A.T @ A
    B = fd.gram()
    diff = G - B
    eig = np.linalg.eigvalsh(diff)
    scale = float(np.linalg.norm(A, "fro") ** 2)
    assert eig.min() >= -1e-7 * scale  # AᵀA − BᵀB ⪰ 0
    assert eig.max() <= fd.bound() + 1e-7 * scale  # certified bound
    assert fd.bound() <= 2 * scale / fd.ell  # published worst case
    assert fd.frob2 == pytest.approx(scale, rel=1e-12)


def test_fd_bound_invariants():
    A = _rand(5000, 24, 1)
    fd = FrequentDirections(ell=16)
    for i in range(0, len(A), 333):  # uneven batches
        fd.update_batch(A[i:i + 333])
    assert fd.n == 5000
    _check_bound(A, fd)


def test_fd_merge_is_bound_equivalent():
    A = _rand(6000, 16, 2)
    parts = []
    for i in range(6):
        f = FrequentDirections(ell=12)
        f.update_batch(A[i * 1000:(i + 1) * 1000])
        parts.append(f.to_bytes())
    merged = FrequentDirections.merge_many(parts)
    assert merged.n == 6000
    _check_bound(A, merged)
    # permuted merge satisfies the same invariants (not bit-identical)
    permuted = FrequentDirections.merge_many(
        [parts[i] for i in (3, 0, 5, 1, 4, 2)])
    _check_bound(A, permuted)


def test_fd_recovers_principal_subspace():
    A = _rand(8000, 32, 3)
    fd = FrequentDirections(ell=16)
    fd.update_batch(A)
    exact_v = np.linalg.eigh(A.T @ A)[1][:, -1]
    fd_v = np.linalg.eigh(fd.gram())[1][:, -1]
    assert abs(float(exact_v @ fd_v)) > 0.99


def test_fd_codec_and_validation():
    A = _rand(500, 8, 4)
    fd = FrequentDirections(ell=8)
    fd.update_batch(A)
    back = FrequentDirections.from_bytes(fd.to_bytes())
    assert np.allclose(back.gram(), fd.gram())
    assert back.n == fd.n and back.frob2 == fd.frob2
    with pytest.raises(CodecError):
        FrequentDirections.from_bytes(b"FDS1" + b"\x00" * 10)
    with pytest.raises(CodecError):
        FrequentDirections.from_bytes(fd.to_bytes()[:-5])
    with pytest.raises(ValueError, match="dim mismatch"):
        fd.update_batch(np.ones((2, 5)))
    with pytest.raises(ValueError, match="param mismatch"):
        fd.merge(FrequentDirections(ell=4))
    with pytest.raises(ValueError, match="ell"):
        FrequentDirections(ell=1)


def test_fd_arrow_input(ray_session):
    import pyarrow as pa

    rows = [np.arange(6, dtype=np.float32) + i for i in range(50)]
    col = pa.array([r.tolist() for r in rows],
                   pa.list_(pa.float32()))
    fd = FrequentDirections(ell=8)
    fd.update_batch(col)
    A = np.stack([np.asarray(r, np.float64) for r in rows])
    _check_bound(A, fd)
