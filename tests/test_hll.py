"""HyperLogLog: sparse exactness, dense error bound, merge determinism."""

import functools
import random

import numpy as np
import pytest

from raysketch.sketches.base import CodecError
from raysketch.sketches.hll import HyperLogLog


def test_sparse_is_exact():
    h = HyperLogLog(p=14)  # default sparse_limit = m//8 = 2048
    h.update_batch([f"item{i}" for i in range(1500)])
    h.update_batch([f"item{i}" for i in range(800)])  # duplicates
    assert h.is_sparse
    assert h.estimate() == 1500.0
    # crossing the limit promotes to dense
    h.update_batch([f"x{i}" for i in range(2000)])
    assert not h.is_sparse


def test_dense_within_published_bound():
    n = 200_000
    h = HyperLogLog(p=14, sparse_limit=1024)
    for lo in range(0, n, 50_000):
        h.update_batch([f"v{i}" for i in range(lo, lo + 50_000)])
    assert not h.is_sparse
    rel_err = abs(h.estimate() - n) / n
    assert rel_err < 3 * 1.04 / np.sqrt(2 ** 14)  # 3 sigma


def test_merge_permutations_bit_identical():
    vals = [f"k{i}" for i in range(40_000)]
    parts = [HyperLogLog(p=12, sparse_limit=256) for _ in range(8)]
    for j, p in enumerate(parts):
        p.update_batch(vals[j::8])
    rng = random.Random(2)

    def merged(order):
        ps = [HyperLogLog.from_bytes(parts[i].to_bytes()) for i in order]
        return functools.reduce(lambda a, b: a.merge(b), ps)

    base = merged(range(8)).to_bytes()
    for _ in range(4):
        order = list(range(8))
        rng.shuffle(order)
        assert merged(order).to_bytes() == base


def test_sparse_dense_mixed_merge():
    dense = HyperLogLog(p=12, sparse_limit=64)
    dense.update_batch([f"d{i}" for i in range(10_000)])
    sparse = HyperLogLog(p=12)
    sparse.update_batch([f"s{i}" for i in range(100)])
    m1 = HyperLogLog.from_bytes(sparse.to_bytes()).merge(dense)
    m2 = HyperLogLog.from_bytes(dense.to_bytes()).merge(sparse)
    assert m1.to_bytes() == m2.to_bytes()
    est = m1.estimate()
    assert abs(est - 10_100) / 10_100 < 3 * 1.04 / np.sqrt(2 ** 12)


def test_codec_and_errors():
    h = HyperLogLog(p=10)
    h.update_batch(["a", "b", "c"])
    rt = HyperLogLog.from_bytes(h.to_bytes())
    assert rt.to_bytes() == h.to_bytes()
    with pytest.raises(CodecError):
        HyperLogLog.from_bytes(b"garbage")
    with pytest.raises(ValueError):
        HyperLogLog(p=3)
