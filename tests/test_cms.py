"""Count-min sketch parity and distributed-merge soundness.

Goldens come from the reference's own tests (library/tests/
test_cm_sketch.c:36-120, lua_binding/tests/test.lua:171-192) and from a
600-op fuzz trace replayed through the compiled reference
(tests/golden_cms_trace.json)."""

import collections
import json
import math
import os
import random

import numpy as np
import pyarrow as pa
import pytest

from raysketch.sketches.base import CodecError
from raysketch.sketches.cms import CMSketch

_HERE = os.path.dirname(__file__)


def test_create_params():
    cms = CMSketch(0.1, 0.1)
    assert cms.width == 28 and cms.depth == 3  # ceil(e/0.1), ceil(ln 10)
    for eps, delta in [(0, 0.1), (1, 0.1), (0.1, 0), (0.1, 1), (-1, 0.5)]:
        with pytest.raises(ValueError):
            CMSketch(eps, delta)


def test_reference_trace_goldens():
    """library/tests/test_cm_sketch.c:36-85 expectations."""
    cms = CMSketch(0.1, 0.1)
    assert cms.update("a", -10) == 0          # removal of absent item no-op
    cms.update("c", 6)
    cms.update("a", 1)
    cms.update("b", 2)
    cms.update("c", -3)
    cms.update(5.0, 1)                        # number key → 8-byte double
    assert cms.item_count == 7
    assert cms.unique_count == 4
    assert cms.point_query("a") == 1
    assert cms.point_query("b") == 2
    assert cms.point_query("c") == 3
    assert cms.update("c", -4) == 0           # floored at estimate
    assert cms.item_count == 4
    assert cms.unique_count == 3


def test_fuzz_trace_vs_compiled_reference():
    with open(os.path.join(_HERE, "golden_cms_trace.json")) as f:
        g = json.load(f)
    cms = CMSketch(g["epsilon"], g["delta"])
    for (key, n), want in zip(g["ops"], g["returns"]):
        assert cms.update(key, n) == want
    assert cms.item_count == g["item_count"]
    assert cms.unique_count == g["unique_count"]


def test_serialization_roundtrip_and_errors():
    cms = CMSketch(0.1, 0.1)
    for k, n in [("c", 3), ("a", 1), ("b", 2)]:
        cms.update(k, n)
    blob = cms.to_bytes()
    rt = CMSketch.from_bytes(blob)
    assert rt.item_count == 6 and rt.unique_count == 3  # test_cm_sketch.c:88-120
    assert rt.point_query("c") == 3
    assert (rt.counts == cms.counts).all()
    # reference layout (cm_sketch.c:144-163): counts after the two u64s
    ref = cms.to_reference_bytes()
    assert ref[:16] == blob[8:24]  # item_count, unique_count LE
    assert ref[16:] == cms.counts.astype("<u4").tobytes()
    # sparse envelope (mode 1) chosen for a 3-key sketch, and lossless
    assert blob[24] == 1
    assert CMSketch.from_bytes(blob).to_reference_bytes() == ref
    with pytest.raises(CodecError):
        CMSketch.from_bytes(blob[:-4])
    with pytest.raises(CodecError):
        CMSketch.from_bytes(b"xx")


def test_batch_update_upper_bound():
    rng = random.Random(17)
    keys = [f"key{i}" for i in range(100)]
    data = [rng.choice(keys).encode() for _ in range(20000)]
    true = collections.Counter(data)
    cms = CMSketch(0.001, 0.01)
    for i in range(0, len(data), 3000):
        cms.update_batch(data[i : i + 3000])
    assert cms.item_count == len(data)
    for k, t in true.items():
        est = cms.point_query(k)
        assert t <= est <= t + math.ceil(cms.epsilon * len(data)) + 1


def test_merge_keeps_cms_bound_and_is_commutative():
    rng = random.Random(23)
    keys = [f"t{i}" for i in range(200)]
    data = [rng.choice(keys).encode() for _ in range(30000)]
    true = collections.Counter(data)
    parts = [CMSketch(0.001, 0.01) for _ in range(6)]
    for j, p in enumerate(parts):
        p.update_batch(data[j::6])
    order = list(range(6))
    rng.shuffle(order)
    m1 = CMSketch.from_bytes(parts[0].to_bytes())
    for j in range(1, 6):
        m1.merge(parts[j])
    m2 = CMSketch.from_bytes(parts[order[0]].to_bytes())
    for j in order[1:]:
        m2.merge(parts[j])
    assert (m1.counts == m2.counts).all()  # sum-merge is order-independent
    n = len(data)
    for k, t in true.items():
        est = m1.point_query(k)
        assert t <= est <= t + math.ceil(m1.epsilon * n) + 1


def test_point_query_batch_matches_scalar():
    cms = CMSketch(0.01, 0.05)
    data = [f"w{i % 37}".encode() for i in range(5000)]
    cms.update_batch(data)
    keys = [f"w{i}" for i in range(40)]
    batch = cms.point_query_batch(keys)
    for k, b in zip(keys, batch):
        assert cms.point_query(k) == b


def test_fast_hash_mode():
    import pyarrow as pa
    rng = random.Random(5)
    keys = [f"path/{i}" for i in range(500)]
    data = [rng.choice(keys) for _ in range(30000)]
    exact = {}
    for d in data:
        exact[d] = exact.get(d, 0) + 1
    parts = []
    for lo in range(0, len(data), 10000):
        c = CMSketch(1e-3, 0.01, fast_hash=True)
        c.update_batch(pa.array(data[lo:lo+10000]))
        parts.append(c.to_bytes())
    m = CMSketch.merge_many(parts)
    assert m.fast_hash
    ests = m.point_query_batch(pa.array(keys))
    for k_, e in zip(keys, ests):
        assert e >= exact[k_]                      # upper bound
        assert e <= exact[k_] + m.epsilon * 30000  # CMS bound
    # round-trip preserves the mode; modes never merge
    rt = CMSketch.from_bytes(m.to_bytes())
    assert rt.fast_hash and rt.point_query(keys[0]) == m.point_query(keys[0])
    with pytest.raises(ValueError):
        CMSketch(1e-3, 0.01).merge(m)


def test_inner_product_exact_small_domain():
    # collision-free regime: 25 keys vs width ~27k → the dot product IS
    # the exact join size Σ_k f_a(k)·f_b(k)
    rng = np.random.default_rng(11)
    a_stream = [f"nk{i}" for i in rng.integers(0, 25, 4000)]
    b_stream = [f"nk{i}" for i in rng.integers(0, 25, 900)]
    ca = CMSketch(1e-4, 1e-3, conservative=False)
    cb = CMSketch(1e-4, 1e-3, conservative=False)
    ca.update_batch(pa.array(a_stream))
    cb.update_batch(pa.array(b_stream))
    fa, fb = {}, {}
    for k in a_stream:
        fa[k] = fa.get(k, 0) + 1
    for k in b_stream:
        fb[k] = fb.get(k, 0) + 1
    true = sum(fa[k] * fb.get(k, 0) for k in fa)
    assert ca.inner_product(cb) == true
    assert cb.inner_product(ca) == true  # symmetric
    # conservative sketches are rejected (sub-linear cells)
    with pytest.raises(ValueError):
        CMSketch(1e-4, 1e-3).inner_product(CMSketch(1e-4, 1e-3))


def test_inner_product_bound_and_validation():
    # estimating regime: overestimate bounded by eps*|a|1*|b|1 (w.h.p.;
    # deterministic here — fixed seeds, fixed data)
    rng = np.random.default_rng(5)
    a_stream = [f"k{i}" for i in rng.integers(0, 3000, 20000)]
    b_stream = [f"k{i}" for i in rng.integers(0, 3000, 20000)]
    eps = 1e-3
    ca = CMSketch(eps, 1e-3, conservative=False)
    cb = CMSketch(eps, 1e-3, conservative=False)
    ca.update_batch(pa.array(a_stream))
    cb.update_batch(pa.array(b_stream))
    fa, fb = {}, {}
    for k in a_stream:
        fa[k] = fa.get(k, 0) + 1
    for k in b_stream:
        fb[k] = fb.get(k, 0) + 1
    true = sum(fa[k] * fb.get(k, 0) for k in fa)
    est = ca.inner_product(cb)
    assert true <= est <= true + eps * len(a_stream) * len(b_stream)
    with pytest.raises(ValueError):
        ca.inner_product(CMSketch(1e-2, 1e-3, conservative=False))
    fast = CMSketch(eps, 1e-3, fast_hash=True, conservative=False)
    fast.update_batch(pa.array(b_stream))
    with pytest.raises(ValueError):
        ca.inner_product(fast)


def test_inner_product_of_merged_partials_matches_single_build():
    # distributed shape: per-block partials merged then inner-product ==
    # single-pass build (merge is exact cell-wise addition)
    rng = np.random.default_rng(2)
    stream = [f"nk{i}" for i in rng.integers(0, 25, 6000)]
    whole = CMSketch(1e-4, 1e-3, conservative=False)
    whole.update_batch(pa.array(stream))
    parts = []
    for lo in range(0, len(stream), 1500):
        c = CMSketch(1e-4, 1e-3, conservative=False)
        c.update_batch(pa.array(stream[lo:lo+1500]))
        parts.append(c.to_bytes())
    merged = CMSketch.merge_many(parts)
    other = CMSketch(1e-4, 1e-3, conservative=False)
    other.update_batch(pa.array([f"nk{i}" for i in range(25)] * 3))
    assert merged.inner_product(other) == whole.inner_product(other)
    # plain-vs-conservative payloads refuse to merge (codec flag bit 1)
    cons = CMSketch(1e-4, 1e-3)
    cons.update_batch(pa.array(stream[:100]))
    with pytest.raises(ValueError):
        CMSketch.merge_many([whole.to_bytes(), cons.to_bytes()])
    # round-trip preserves the update mode
    assert CMSketch.from_bytes(whole.to_bytes()).conservative is False
    assert CMSketch.from_bytes(cons.to_bytes()).conservative is True
