"""Count Sketch (Charikar et al. 2002 / AMS F2): exactness gate, the
published two-sided error bound, merge permutation bit-identity, codec
round-trip + corruption refusal, weighted updates, validation."""

import numpy as np
import pytest

from raysketch.sketches import CountSketch
from raysketch.sketches.base import CodecError


def _hashes(keys):
    import pyarrow as pa

    from raysketch.engine.hashing import hash64_batch_aligned

    h, _ = hash64_batch_aligned(pa.array(np.asarray(keys, np.int64)))
    return h


def test_exact_on_small_domain():
    cs = CountSketch(5, 1 << 16)
    keys = np.arange(200)
    counts = np.arange(1, 201)
    cs.update_hashes(np.repeat(_hashes(keys), counts))
    est = cs.estimate_hashes(_hashes(keys))
    assert (est == counts).all()
    assert cs.n == counts.sum()


def test_two_sided_error_bound_zipf():
    # narrow width forces collisions; |err| <= 3*sqrt(F2/w) per key is
    # the published per-row bound at >=85% confidence — the median of 5
    # rows makes violations essentially impossible at 3x
    rng = np.random.default_rng(7)
    keys = rng.zipf(1.3, 200_000) % 5000
    cs = CountSketch(5, 1 << 10)
    cs.update_hashes(_hashes(keys))
    true = np.bincount(keys, minlength=5000)
    f2 = int((true.astype(object) ** 2).sum())
    probe = np.arange(5000)
    est = cs.estimate_hashes(_hashes(probe))
    bound = 3 * np.sqrt(f2 / (1 << 10))
    viol = np.abs(est - true) > bound
    assert viol.mean() < 0.01, f"{viol.sum()} of 5000 exceed 3-sigma"
    # unbiased two-sided: both under- and over-estimates occur
    err = est - true
    assert (err > 0).any() and (err < 0).any()
    # AMS F2 within 3/sqrt(w) relative
    assert abs(cs.f2() - f2) <= 3 * f2 / np.sqrt(1 << 10)


def test_merge_permutations_bit_identical():
    rng = np.random.default_rng(3)
    parts = []
    for i in range(6):
        cs = CountSketch(5, 1 << 12)
        cs.update_hashes(_hashes(rng.integers(0, 1000, 5000)))
        parts.append(cs.to_bytes())
    ref = CountSketch.merge_many(parts)
    for perm in ([5, 4, 3, 2, 1, 0], [2, 0, 5, 1, 4, 3]):
        other = CountSketch.merge_many([parts[i] for i in perm])
        assert (other.table == ref.table).all()
        assert other.n == ref.n
    # pairwise merge() agrees with merge_many
    acc = CountSketch.from_bytes(parts[0])
    for p in parts[1:]:
        acc.merge(CountSketch.from_bytes(p))
    assert (acc.table == ref.table).all()


def test_codec_roundtrip_sparse_and_dense():
    cs = CountSketch(3, 1 << 8)
    cs.update_hashes(_hashes([1, 2, 3]))
    b1 = cs.to_bytes()  # sparse
    assert (CountSketch.from_bytes(b1).table == cs.table).all()
    cs.update_hashes(_hashes(np.arange(10_000) % 3000))
    b2 = cs.to_bytes()  # dense
    back = CountSketch.from_bytes(b2)
    assert (back.table == cs.table).all() and back.n == cs.n
    with pytest.raises(CodecError):
        CountSketch.from_bytes(b"CSK1" + b"\x00" * 5)
    with pytest.raises(CodecError):
        CountSketch.from_bytes(b2[:-3])
    with pytest.raises(CodecError):
        CountSketch.from_bytes(b"XXXX" + b1[4:])


def test_weighted_updates_and_validation():
    cs = CountSketch(5, 1 << 10)
    cs.update_hashes(_hashes([7, 8]), weights=np.array([10, -4]))
    est = cs.estimate_hashes(_hashes([7, 8]))
    assert est[0] == 10 and est[1] == -4  # signed weights survive
    assert cs.n == 14
    with pytest.raises(ValueError, match="odd"):
        CountSketch(4, 1 << 10)
    with pytest.raises(ValueError, match="power of two"):
        CountSketch(5, 1000)
    with pytest.raises(ValueError, match="mismatch"):
        CountSketch(5, 1 << 10).merge(CountSketch(5, 1 << 11))
    with pytest.raises(ValueError, match="shape"):
        cs.update_hashes(_hashes([1, 2]), weights=np.array([1]))


def test_negated_difference_stream():
    # the signed-linearity property: a + (-b) sketches the difference
    a = CountSketch(5, 1 << 12)
    b = CountSketch(5, 1 << 12)
    keys = np.arange(50)
    a.update_hashes(np.repeat(_hashes(keys), np.arange(50) + 3))
    b.update_hashes(np.repeat(_hashes(keys), 4))
    diff = CountSketch.from_bytes(a.to_bytes()).merge(b.negated())
    est = diff.estimate_hashes(_hashes(keys))
    assert (est == np.arange(50) - 1).all()
    # double negation is the identity; original b is untouched
    assert (b.negated().negated().table == b.table).all()
    assert b.estimate_hashes(_hashes([0]))[0] == 4
