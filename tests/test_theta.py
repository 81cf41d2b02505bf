"""Theta sketch kernel: exactness gate, k-cap estimation, set algebra,
codec, merge order-independence (bit-identical exact / bound-equivalent
estimating)."""

import numpy as np
import pytest

from raysketch.engine.hashing import hash64_batch
from raysketch.sketches.theta import (
    ThetaSketch, a_not_b, intersect, union, _FULL,
)


def _hashes(values) -> np.ndarray:
    return hash64_batch(list(values))


def test_exact_mode_counts_distinct():
    sk = ThetaSketch(k=1024)
    sk.update_hashes(_hashes([f"item-{i % 300}" for i in range(5000)]))
    assert sk.is_exact
    assert sk.estimate() == 300.0


def test_codec_roundtrip_bit_identical():
    for n in (0, 10, 5000):
        sk = ThetaSketch(k=256)
        sk.update_hashes(_hashes([f"v{i}" for i in range(n)]))
        b = sk.to_bytes()
        back = ThetaSketch.from_bytes(b)
        assert back.to_bytes() == b
        assert back.theta == sk.theta
        assert np.array_equal(back.retained, sk.retained)


def test_trim_caps_retained_and_estimates_within_bound():
    k, n = 512, 200_000
    sk = ThetaSketch(k=k)
    sk.update_hashes(_hashes([f"u{i}" for i in range(n)]))
    assert not sk.is_exact
    assert sk.retained.size == k
    # RSE ~ 1/sqrt(k-2); assert 5 sigma
    assert abs(sk.estimate() - n) / n < 5 / np.sqrt(k - 2)


def test_exact_merge_is_bit_identical_under_permutation():
    chunks = [[f"c{j}-{i}" for i in range(50)] for j in range(6)]
    # overlap across chunks
    chunks[3] = chunks[0]
    def build(order):
        sks = []
        for j in order:
            s = ThetaSketch(k=4096)
            s.update_hashes(_hashes(chunks[j]))
            sks.append(s)
        acc = sks[0]
        for s in sks[1:]:
            acc.merge(s)
        return acc
    a = build(range(6))
    b = build([5, 3, 1, 0, 4, 2])
    assert a.is_exact and a.to_bytes() == b.to_bytes()
    assert a.estimate() == 250.0  # 6*50 minus the duplicated chunk


def test_merge_many_matches_pairwise_exact():
    payloads = []
    for j in range(5):
        s = ThetaSketch(k=2048)
        s.update_hashes(_hashes([f"x{j}-{i}" for i in range(100)]))
        payloads.append(s.to_bytes())
    bulk = ThetaSketch.merge_many(payloads)
    acc = ThetaSketch.from_bytes(payloads[0])
    for p in payloads[1:]:
        acc.merge(ThetaSketch.from_bytes(p))
    assert bulk.to_bytes() == acc.to_bytes()


def test_estimating_merge_is_bound_equivalent_under_permutation():
    rng = np.random.default_rng(7)
    k = 256
    chunks = [[f"s{j}-{i}" for i in range(20_000)] for j in range(4)]
    sks = []
    for ch in chunks:
        s = ThetaSketch(k=k)
        s.update_hashes(_hashes(ch))
        sks.append(s)
    payloads = [s.to_bytes() for s in sks]
    ests = []
    for order in ([0, 1, 2, 3], [3, 1, 0, 2], [2, 3, 1, 0]):
        acc = ThetaSketch.from_bytes(payloads[order[0]])
        for j in order[1:]:
            acc.merge(ThetaSketch.from_bytes(payloads[j]))
        ests.append(acc.estimate())
    true = 80_000
    for e in ests:
        assert abs(e - true) / true < 5 / np.sqrt(k - 2)


def test_set_algebra_exact_mode():
    A = [f"a{i}" for i in range(200)] + [f"both{i}" for i in range(50)]
    B = [f"b{i}" for i in range(120)] + [f"both{i}" for i in range(50)]
    sa, sb = ThetaSketch(k=4096), ThetaSketch(k=4096)
    sa.update_hashes(_hashes(A))
    sb.update_hashes(_hashes(B))
    assert union([sa, sb]).estimate() == 370.0
    assert intersect(sa, sb).estimate() == 50.0
    assert a_not_b(sa, sb).estimate() == 200.0
    assert a_not_b(sb, sa).estimate() == 120.0


def test_set_algebra_estimating_within_bound():
    k = 512
    A = [f"a{i}" for i in range(60_000)] + [f"both{i}" for i in range(40_000)]
    B = [f"b{i}" for i in range(30_000)] + [f"both{i}" for i in range(40_000)]
    sa, sb = ThetaSketch(k=k), ThetaSketch(k=k)
    sa.update_hashes(_hashes(A))
    sb.update_hashes(_hashes(B))
    u = union([sa, sb]).estimate()
    i = intersect(sa, sb).estimate()
    d = a_not_b(sa, sb).estimate()
    assert abs(u - 130_000) / 130_000 < 5 / np.sqrt(k - 2)
    # intersection error scales with |A∪B|/|A∩B| = 3.25 here
    assert abs(i - 40_000) / 40_000 < 5 * 3.25 / np.sqrt(k - 2)
    assert abs(d - 60_000) / 60_000 < 5 * (130_000 / 60_000) / np.sqrt(k - 2)


def test_bad_codec_and_param_validation():
    with pytest.raises(ValueError):
        ThetaSketch(k=4)
    from raysketch.sketches.base import CodecError
    with pytest.raises(CodecError):
        ThetaSketch.from_bytes(b"XXXX" + b"\x00" * 30)
    sk = ThetaSketch(k=64)
    with pytest.raises(CodecError):
        ThetaSketch.from_bytes(sk.to_bytes() + b"\x01")
    other = ThetaSketch(k=128)
    with pytest.raises(ValueError):
        sk.merge(other)


def test_theta_strictness_boundary():
    # an element whose hash equals theta is EXCLUDED (strict <): the trim
    # sets theta to the smallest excluded hash, so re-inserting that exact
    # hash must not re-enter the retained set
    sk = ThetaSketch(k=16)
    sk.update_hashes(_hashes([f"q{i}" for i in range(100)]))
    assert sk.theta < _FULL
    boundary = np.array([sk.theta], dtype=np.uint64)
    before = sk.to_bytes()
    sk.update_hashes(boundary)
    assert sk.to_bytes() == before
