"""Running-stats parity (library/tests/test_running_stats.c:39-101,
lua_binding/tests/test.lua:28-51) + Chan-merge associativity."""

import math
import random

import numpy as np
import pytest

from raysketch.sketches.base import CodecError
from raysketch.sketches.running_stats import RunningStats


def test_one_two_three():
    rs = RunningStats()
    for x in (1, 2, 3):
        rs.add(x)
    assert rs.count == 3
    assert rs.mean == 2
    assert rs.variance() == 1
    assert rs.sd() == 1
    assert abs(rs.usd() - 0.816497) < 1e-6


def test_nonfinite_ignored():
    rs = RunningStats()
    for x in (math.inf, math.nan, -math.inf):
        rs.add(x)
    assert rs.count == 0
    assert rs.sd() == 0.0
    assert rs.variance() == 0.0
    rs.update_batch([math.inf, 1.0, math.nan, 3.0])
    assert rs.count == 2 and rs.mean == 2.0


def test_one_to_ten():
    rs = RunningStats()
    rs.update_batch(np.arange(1, 11, dtype=float))
    assert rs.count == 10
    assert rs.avg() == 5.5
    assert abs(rs.sd() - 3.02765) < 1e-5
    assert abs(rs.usd() - 2.87228) < 1e-5
    assert abs(rs.variance() - 9.16667) < 1e-5


def test_codec():
    rs = RunningStats()
    rs.update_batch([1.0, 2.0, 3.0])
    rt = RunningStats.from_bytes(rs.to_bytes())
    assert rt.to_bytes() == rs.to_bytes()
    with pytest.raises(CodecError):
        RunningStats.from_bytes(b"short")
    import struct
    with pytest.raises(CodecError):
        RunningStats.from_bytes(struct.pack("<3d", -1.0, 0.0, 0.0))


def test_merge_matches_sequential_and_is_associative():
    rng = random.Random(4)
    data = [rng.gauss(100, 15) for _ in range(5000)]
    whole = RunningStats()
    whole.update_batch(data)
    for n_parts in (2, 5, 9):
        parts = []
        for j in range(n_parts):
            p = RunningStats()
            p.update_batch(data[j::n_parts])
            parts.append(p)
        order = list(range(n_parts))
        rng.shuffle(order)
        m = RunningStats.from_bytes(parts[order[0]].to_bytes())
        for j in order[1:]:
            m.merge(parts[j])
        assert m.count == whole.count
        assert abs(m.mean - whole.mean) < 1e-9
        assert abs(m.variance() - whole.variance()) < 1e-7
