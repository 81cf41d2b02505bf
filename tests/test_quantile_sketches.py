"""t-digest and KLL: rank-error bounds vs exact quantiles, merge
bound-equivalence under permutation, and validation against the
reference's P² canonical goldens (FIXTURES.md F2)."""

import functools
import random

import numpy as np

from raysketch.sketches.kll import KLL
from raysketch.sketches.p2 import P2Quantile
from raysketch.sketches.tdigest import TDigest

OBS = [0.02, 0.15, 0.74, 3.39, 0.83, 22.37, 10.15, 15.43, 38.62, 15.92,
       34.60, 10.28, 1.47, 0.40, 0.05, 11.39, 0.27, 0.42, 0.09, 11.37]


def _rank_err(data, est, q):
    """Distance from q to the normalized-rank interval of est.

    With duplicated values, every rank in [(data < est), (data <= est)] is a
    correct rank for est — error is the distance to that interval."""
    lo = (data < est).mean()
    hi = (data <= est).mean()
    if lo <= q <= hi:
        return 0.0
    return min(abs(q - lo), abs(q - hi))


def _datasets():
    rng = np.random.RandomState(7)
    return {
        "lognormal": rng.lognormal(3, 1, 100_000),
        "uniform": rng.uniform(-1000, 1000, 100_000),
        "heavy_dupes": rng.choice([1.0, 2.0, 5.0, 100.0], 100_000, p=[0.7, 0.2, 0.09, 0.01]),
    }


def test_tdigest_rank_bound():
    for name, data in _datasets().items():
        td = TDigest(200)
        for chunk in np.array_split(data, 20):
            td.update_batch(chunk)
        assert td.quantile(0.0) == data.min()
        assert td.quantile(1.0) == data.max()
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            assert _rank_err(data, td.quantile(q), q) < 1.5 / 200, (name, q)


def test_kll_rank_bound():
    for name, data in _datasets().items():
        kl = KLL(200)
        for chunk in np.array_split(data, 20):
            kl.update_batch(chunk)
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            assert _rank_err(data, kl.quantile(q), q) < 2.0 / 200 + 1e-5, (name, q)


def test_merge_bound_equivalence_permuted():
    data = np.random.RandomState(9).lognormal(0, 2, 80_000)
    rng = random.Random(5)
    for cls, kw in ((TDigest, dict(compression=200)), (KLL, dict(k=200))):
        parts = []
        for j in range(10):
            p = cls(**kw)
            p.update_batch(data[j::10])
            parts.append(p)
        for _ in range(3):
            order = list(range(10))
            rng.shuffle(order)
            m = functools.reduce(
                lambda a, b: a.merge(b),
                [cls.from_bytes(parts[i].to_bytes()) for i in order],
            )
            for q in (0.05, 0.5, 0.95):
                assert _rank_err(data, m.quantile(q), q) < 3.0 / 200, (cls.__name__, q)


def test_vs_p2_canonical_goldens():
    """On the reference's 20-obs set, small sketches are exact: they retain
    all points, so quantiles must land inside the sample's rank tolerance."""
    arr = np.asarray(OBS)
    td = TDigest(200)
    td.update_batch(arr)
    kl = KLL(200)
    kl.update_batch(arr)
    p2 = P2Quantile(0.5)
    for x in OBS:
        p2.add(x)
    # P² golden median is 4.44063; with n=20 one rank step is 5% — all three
    # estimators must agree within one rank position of the exact median.
    exact_sorted = np.sort(arr)
    for est in (td.quantile(0.5), kl.quantile(0.5), p2.estimate(2)):
        lo, hi = exact_sorted[8], exact_sorted[11]
        assert lo <= est <= hi


def test_determinism_retry_safety():
    """Same input chunks → bit-identical sketch bytes (Ray retry contract)."""
    data = np.random.RandomState(3).normal(0, 1, 50_000)
    for cls, kw in ((TDigest, dict(compression=100)), (KLL, dict(k=128))):
        a, b = cls(**kw), cls(**kw)
        for chunk in np.array_split(data, 7):
            a.update_batch(chunk)
        for chunk in np.array_split(data, 7):
            b.update_batch(chunk)
        assert a.to_bytes() == b.to_bytes()


def test_tdigest_small_merge_keeps_sorted_quantiles():
    """Regression: merging two small digests (under the compression
    threshold) must still sort centroids — p50 <= p95 <= p99."""
    rng = np.random.RandomState(11)
    a, b = TDigest(200), TDigest(200)
    a.update_batch(rng.uniform(300, 400, 40))
    b.update_batch(rng.uniform(0, 100, 30))
    a.merge(b)
    q = [a.quantile(x) for x in (0.5, 0.95, 0.99)]
    assert q[0] <= q[1] <= q[2]
    data = np.concatenate([rng.uniform(300, 400, 40), rng.uniform(0, 100, 30)])
    assert abs(a.quantile(1.0) - a.max) < 1e-9
    assert a.total == 70


# -- REQ (Relative Error Streaming Quantiles, PODS 2021) --------------------

def test_req_relative_tail_error():
    import numpy as np

    from raysketch.sketches.req import REQ

    rng = np.random.default_rng(7)
    for vals in (rng.lognormal(5, 2, 300_000), np.arange(300_000, dtype=float)):
        r = REQ(32)
        for lo in range(0, vals.size, 30_000):
            r.update_batch(vals[lo:lo + 30_000])
        sv = np.sort(vals)
        for q in (0.9, 0.99, 0.999, 0.9999):
            est = r.quantile(q)
            rank = np.searchsorted(sv, est, side="right") / sv.size
            # relative rank error tightens toward the max (the REQ property)
            assert abs(rank - q) <= 0.02 * (1 - q) + 5e-4, (q, rank)
        # far fewer retained items than n
        assert sum(l.size for l in r.levels) < vals.size // 20


def test_req_merge_and_codec():
    import numpy as np
    import pytest

    from raysketch.sketches.base import CodecError
    from raysketch.sketches.req import REQ

    rng = np.random.default_rng(3)
    vals = rng.lognormal(5, 1, 120_000)
    parts = []
    for i in range(5):
        p = REQ(32)
        p.update_batch(vals[i::5])
        parts.append(p.to_bytes())
    m1 = REQ.merge_many(parts)
    order = [3, 1, 4, 0, 2]
    m2 = REQ.merge_many([parts[i] for i in order])
    sv = np.sort(vals)
    for q in (0.5, 0.99, 0.999):
        for m in (m1, m2):
            rank = np.searchsorted(sv, m.quantile(q), side="right") / sv.size
            assert abs(rank - q) <= 0.03 * max(1 - q, 0.01) + 1e-3
    rt = REQ.from_bytes(m1.to_bytes())
    assert rt.n == m1.n and rt.quantile(0.999) == m1.quantile(0.999)
    with pytest.raises(CodecError):
        REQ.from_bytes(m1.to_bytes()[:-3])
    with pytest.raises(ValueError):
        REQ(32).merge(REQ(64))
    with pytest.raises(ValueError):
        REQ(5)
