"""Bloom filter: no false negatives, FPR near formula, OR-merge."""

import numpy as np
import pytest

from raysketch.sketches.base import CodecError
from raysketch.sketches.bloom import BloomFilter


def test_no_false_negatives_and_fpr():
    b = BloomFilter(capacity=20_000, fpr=0.01)
    present = [f"k{i}" for i in range(20_000)]
    b.update_batch(present)
    assert b.contains_batch(present).all()
    absent = [f"absent{i}" for i in range(20_000)]
    fpr = float(b.contains_batch(absent).mean())
    assert fpr < 0.03  # target 0.01, generous fuzz margin


def test_merge_is_or_and_commutative():
    a = BloomFilter(1000, 0.01)
    b = BloomFilter(1000, 0.01)
    a.update_batch([f"a{i}" for i in range(500)])
    b.update_batch([f"b{i}" for i in range(500)])
    m1 = BloomFilter.from_bytes(a.to_bytes()).merge(b)
    m2 = BloomFilter.from_bytes(b.to_bytes()).merge(a)
    assert m1.to_bytes() == m2.to_bytes()
    assert m1.contains_batch([f"a{i}" for i in range(500)]).all()
    assert m1.contains_batch([f"b{i}" for i in range(500)]).all()
    assert m1.n_added == 1000


def test_mismatched_merge_rejected():
    a = BloomFilter(1000, 0.01)
    b = BloomFilter(5000, 0.01)
    with pytest.raises(ValueError):
        a.merge(b)


def test_codec():
    b = BloomFilter(100, 0.05)
    b.update_batch(["x", "y"])
    rt = BloomFilter.from_bytes(b.to_bytes())
    assert rt.to_bytes() == b.to_bytes()
    assert rt.contains_batch(["x", "y"]).all()
    with pytest.raises(CodecError):
        BloomFilter.from_bytes(b.to_bytes()[:-8])


def test_param_validation():
    with pytest.raises(ValueError):
        BloomFilter(0, 0.01)
    with pytest.raises(ValueError):
        BloomFilter(10, 1.5)
