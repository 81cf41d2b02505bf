"""Counting Bloom filter — deletable membership, linear merges."""
import numpy as np
import pyarrow as pa
import pytest

from raysketch.engine.hashing import hash64_batch
from raysketch.sketches import CountingBloomFilter
from raysketch.sketches.base import CodecError


def _hashes(prefix, n):
    return np.asarray(hash64_batch(
        pa.array([f"{prefix}{i}" for i in range(n)])), np.uint64)


def test_membership_add_remove_roundtrip():
    f = CountingBloomFilter(10_000, 1e-4)
    h = _hashes("k", 4000)
    f.update_hashes(h)
    assert f.contains_hashes(h).all()
    f.remove_hashes(h[:2000])
    assert f.contains_hashes(h[2000:]).all()  # no false negatives ever
    assert not f.contains_hashes(h[:2000]).any()  # all counters zeroed
    assert f.n_added == 4000 and f.n_removed == 2000
    # absent keys stay absent at this fpr/fill
    assert not f.contains_hashes(_hashes("absent", 2000)).any()


def test_remove_absent_item_refused():
    f = CountingBloomFilter(1000, 0.01)
    f.update_hashes(_hashes("k", 100))
    with pytest.raises(ValueError, match="not present"):
        f.remove_hashes(_hashes("zzz", 1))


def test_merge_order_bit_identical_and_linear():
    h = _hashes("k", 5000)
    parts = np.array_split(np.arange(5000), 7)
    payloads = []
    for ix in parts:
        s = CountingBloomFilter(10_000, 1e-4)
        s.update_hashes(h[ix])
        payloads.append(s.to_bytes())
    a = CountingBloomFilter.merge_many(payloads)
    b = CountingBloomFilter.merge_many(payloads[::-1])
    assert a.to_bytes() == b.to_bytes()
    # linearity: merging the negated delete-side == removing directly
    dels = CountingBloomFilter(10_000, 1e-4)
    dels.update_hashes(h[:2500])
    via_neg = CountingBloomFilter.from_bytes(a.to_bytes()) \
        .merge(dels.negated())
    direct = CountingBloomFilter.from_bytes(a.to_bytes())
    direct.remove_hashes(h[:2500])
    assert np.array_equal(via_neg.counts, direct.counts)
    assert not via_neg.contains_hashes(h[:2500]).any()
    assert via_neg.contains_hashes(h[2500:]).all()


def test_codec_sparse_dense_and_refusals():
    f = CountingBloomFilter(50_000, 1e-4)
    f.update_hashes(_hashes("k", 200))  # sparse regime
    buf = f.to_bytes()
    assert len(buf) < f.m  # sparse payload far below dense 4*m
    rt = CountingBloomFilter.from_bytes(buf)
    assert np.array_equal(rt.counts, f.counts)
    assert (rt.capacity, rt.fpr, rt.m, rt.k) == (f.capacity, f.fpr,
                                                 f.m, f.k)
    # dense regime
    g = CountingBloomFilter(64, 0.5)
    g.update_hashes(_hashes("k", 500))
    assert np.array_equal(
        CountingBloomFilter.from_bytes(g.to_bytes()).counts, g.counts)
    with pytest.raises(CodecError):
        CountingBloomFilter.from_bytes(b"XXXX" + buf[4:])
    with pytest.raises(CodecError):
        CountingBloomFilter.from_bytes(buf[:30])
    with pytest.raises(ValueError, match="mismatched"):
        f.merge(CountingBloomFilter(49_999, 1e-4))
    with pytest.raises(ValueError):
        CountingBloomFilter(0, 0.01)
    with pytest.raises(ValueError):
        CountingBloomFilter(10, 1.5)


def test_matches_plain_bloom_geometry():
    # same construction formulas as the sibling filter -> identical
    # membership behavior on the same add-only stream
    from raysketch.sketches import BloomFilter

    cb = CountingBloomFilter(5000, 0.01)
    bl = BloomFilter(5000, 0.01)
    assert cb.k == bl.k and bl.m >= cb.m  # bloom rounds m up to words
    h = _hashes("k", 3000)
    cb.update_hashes(h)
    assert cb.contains_hashes(h).all()
    assert 0 < cb.fill_ratio() < 1


def test_sketch_aggregate_udaf_integration(ray_session):
    import functools

    import pandas as pd
    import ray.data as rd

    from raysketch.engine.aggregate import sketch_aggregate
    from raysketch.engine.udaf import SketchSpec

    df = pd.DataFrame({"key": [f"u{i % 500}" for i in range(4000)]})
    ds = rd.from_pandas(df).repartition(6)
    merged = sketch_aggregate(
        ds, [SketchSpec("cbf", "key",
                        functools.partial(CountingBloomFilter, 2000,
                                          1e-4))],
        group_key=None, merge="driver")[""]["cbf"]
    assert merged.n_added == 4000
    assert merged.contains_batch(
        pa.array([f"u{i}" for i in range(500)])).all()
    assert not merged.contains_batch(
        pa.array([f"w{i}" for i in range(200)])).any()


def test_remove_duplicates_in_one_batch_refused():
    # removing [h, h] after a single add must refuse, not drive the
    # counters negative (a later re-add would then read absent)
    f = CountingBloomFilter(1000, 0.01)
    h = _hashes("dup", 1)
    f.update_hashes(h)
    with pytest.raises(ValueError, match="at most as many"):
        f.remove_hashes(np.concatenate([h, h]))
    assert f.contains_hashes(h).all()  # untouched by the refused call
    # added twice -> removable twice in one batch
    f.update_hashes(h)
    f.remove_hashes(np.concatenate([h, h]))
    assert not f.contains_hashes(h).any()
