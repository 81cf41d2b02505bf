"""Property-based tests: codec round-trips and merge associativity.

SURVEY.md §5.2(2): random splits of a stream into k parts under permuted
merge orders must be bit-identical (CMS/HLL/Bloom/RunningStats/
TimeSeries/Matrix) or bound-equivalent (t-digest/KLL).
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raysketch.engine.udaf import merge_payloads_obj
from raysketch.sketches import (
    KLL,
    BloomFilter,
    CMSketch,
    HyperLogLog,
    MatrixInt,
    RunningStats,
    TDigest,
)

_words = st.text(alphabet="abcdefgh/._", min_size=1, max_size=12)


def _split(xs, k, rng):
    parts = [[] for _ in range(k)]
    for x in xs:
        parts[rng.integers(0, k)].append(x)
    return parts


@settings(max_examples=25, deadline=None)
@given(st.lists(_words, min_size=1, max_size=300), st.integers(2, 5),
       st.randoms(use_true_random=False))
def test_hll_merge_permutation_bit_identical(keys, k, pyrng):
    rng = np.random.default_rng(pyrng.randint(0, 10**9))
    parts = _split(keys, k, rng)
    payloads = []
    for p in parts:
        h = HyperLogLog(p=10, sparse_limit=16)  # force dense promotion often
        if p:
            h.update_batch(pa.array(p))
        payloads.append(h.to_bytes())
    a = merge_payloads_obj("hll", payloads)
    order = list(range(k))
    pyrng.shuffle(order)
    b = merge_payloads_obj("hll", [payloads[i] for i in order])
    assert a.to_bytes() == b.to_bytes()


@settings(max_examples=25, deadline=None)
@given(st.lists(_words, min_size=1, max_size=300), st.integers(2, 5),
       st.randoms(use_true_random=False))
def test_cms_bloom_merge_permutation(keys, k, pyrng):
    rng = np.random.default_rng(pyrng.randint(0, 10**9))
    parts = _split(keys, k, rng)
    cms_p, blm_p = [], []
    for p in parts:
        c = CMSketch(0.01, 0.1)
        b = BloomFilter(1000, 0.01)
        if p:
            c.update_batch(pa.array(p))
            b.update_batch(pa.array(p))
        cms_p.append(c.to_bytes())
        blm_p.append(b.to_bytes())
    order = list(range(k))
    pyrng.shuffle(order)
    m1 = merge_payloads_obj("cms", cms_p)
    m2 = merge_payloads_obj("cms", [cms_p[i] for i in order])
    assert (m1.counts == m2.counts).all()
    f1 = merge_payloads_obj("bloom", blm_p)
    f2 = merge_payloads_obj("bloom", [blm_p[i] for i in order])
    f1._flush_pending()
    f2._flush_pending()
    assert (f1.bits == f2.bits).all()
    # no false negatives ever
    assert bool(f1.contains_batch(pa.array(keys)).all())


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6), min_size=5, max_size=500),
       st.integers(2, 5), st.randoms(use_true_random=False))
def test_running_stats_merge_matches_numpy(vals, k, pyrng):
    rng = np.random.default_rng(pyrng.randint(0, 10**9))
    parts = _split(vals, k, rng)
    payloads = []
    for p in parts:
        r = RunningStats()
        r.update_batch(np.asarray(p, dtype=np.float64))
        payloads.append(r.to_bytes())
    m = merge_payloads_obj("running_stats", payloads)
    arr = np.asarray(vals, dtype=np.float64)
    assert m.count == arr.size
    assert abs(m.mean - arr.mean()) < 1e-6 * max(1.0, abs(arr.mean()))
    if arr.size > 1:
        assert abs(m.variance() - arr.var(ddof=1)) < 1e-4 * max(1.0, arr.var(ddof=1))


@settings(max_examples=15, deadline=None)
@given(st.lists(st.floats(0, 1e6), min_size=20, max_size=2000),
       st.integers(2, 6), st.randoms(use_true_random=False))
def test_quantile_sketches_merge_rank_bound(vals, k, pyrng):
    rng = np.random.default_rng(pyrng.randint(0, 10**9))
    parts = _split(vals, k, rng)
    td_p, kll_p = [], []
    for p in parts:
        t, q = TDigest(100.0), KLL(128)
        if p:
            t.update_batch(np.asarray(p))
            q.update_batch(np.asarray(p))
        td_p.append(t.to_bytes())
        kll_p.append(q.to_bytes())
    td = merge_payloads_obj("tdigest", td_p)
    kl = merge_payloads_obj("kll", kll_p)
    sv = np.sort(np.asarray(vals, dtype=np.float64))
    for q_ in (0.1, 0.5, 0.9):
        for est in (td.quantile(q_), kl.quantile(q_)):
            # t-digest INTERPOLATES between data points, so an estimate
            # not present in the data legitimately represents any rank
            # between its predecessor's left edge and its successor's
            # right edge (searchsorted alone collapses that interval to
            # a point and falsely fails on large value gaps)
            nb = int(np.searchsorted(sv, est, side="left"))
            lo_v = sv[nb - 1] if nb > 0 else sv[0]
            hi_v = sv[nb] if nb < sv.size else sv[-1]
            lo = np.searchsorted(sv, min(lo_v, est), side="left") / sv.size
            hi = np.searchsorted(sv, max(hi_v, est), side="right") / sv.size
            # rank of the estimate within generous merged-sketch bounds
            assert lo - 0.12 <= q_ <= hi + 0.12, (q_, est, lo, hi)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5),
                          st.integers(-100, 100)), min_size=1, max_size=200),
       st.integers(2, 4), st.randoms(use_true_random=False))
def test_matrix_merge_permutation(triples, k, pyrng):
    rng = np.random.default_rng(pyrng.randint(0, 10**9))
    parts = _split(triples, k, rng)
    payloads = []
    for p in parts:
        m = MatrixInt(4, 6)
        if p:
            m.update_batch(pa.table({"row": [t[0] for t in p],
                                     "col": [t[1] for t in p],
                                     "value": [t[2] for t in p]}))
        payloads.append(m.to_bytes())
    order = list(range(k))
    pyrng.shuffle(order)
    m1 = merge_payloads_obj("matrix_int", payloads)
    m2 = merge_payloads_obj("matrix_int", [payloads[i] for i in order])
    assert (m1.v == m2.v).all()
    # and equals the direct single build
    direct = MatrixInt(4, 6)
    direct.update_batch(pa.table({"row": [t[0] for t in triples],
                                  "col": [t[1] for t in triples],
                                  "value": [t[2] for t in triples]}))
    assert (m1.v == direct.v).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(_words, min_size=0, max_size=100))
def test_codec_roundtrips(keys):
    c = CMSketch(0.05, 0.1)
    h = HyperLogLog(p=8)
    b = BloomFilter(500, 0.01)
    if keys:
        arr = pa.array(keys)
        c.update_batch(arr)
        h.update_batch(arr)
        b.update_batch(arr)
    for obj, cls in ((c, CMSketch), (h, HyperLogLog), (b, BloomFilter)):
        rt = cls.from_bytes(obj.to_bytes())
        assert rt.to_bytes() == obj.to_bytes()


@settings(max_examples=25, deadline=None)
@given(st.lists(_words, min_size=1, max_size=300),
       st.lists(_words, min_size=1, max_size=300),
       st.integers(2, 5), st.integers(0, 2**32 - 1))
def test_cms_inner_product_bound_and_merge_invariance(a, b, k, seed):
    """Inner product: true <= est <= true + eps*|a|1*|b|1, symmetric,
    and invariant under splitting either stream into merged partials."""
    from collections import Counter

    rng = np.random.default_rng(seed)
    eps = 1e-3
    ca = CMSketch(eps, 1e-2, conservative=False)
    cb = CMSketch(eps, 1e-2, conservative=False)
    ca.update_batch(pa.array(a, pa.string()))
    cb.update_batch(pa.array(b, pa.string()))
    fa, fb = Counter(a), Counter(b)
    true = sum(fa[x] * fb.get(x, 0) for x in fa)
    est = ca.inner_product(cb)
    assert true <= est <= true + eps * len(a) * len(b) + 1
    assert cb.inner_product(ca) == est  # symmetric
    # split stream a into k merged partials: bit-identical sketch -> same est
    parts = _split(a, k, rng)
    payloads = []
    for p in parts:
        c = CMSketch(eps, 1e-2, conservative=False)
        c.update_batch(pa.array(p, pa.string()))
        payloads.append(c.to_bytes())
    merged = CMSketch.merge_many(payloads)
    assert merged.inner_product(cb) == est
