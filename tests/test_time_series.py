"""TimeSeriesInt reference parity.

Goldens from library/tests/test_time_series.c:654-780 and
lua_binding/tests/test.lua:346-419.
"""

import math

import numpy as np
import pytest

from raysketch.sketches.base import CodecError
from raysketch.sketches.time_series import TimeSeriesInt

I32_MAX = (1 << 31) - 1
I32_MIN = -(1 << 31)


def test_create_and_initial_time():
    ts = TimeSeriesInt(86400, 1_000_000_000)
    assert ts.timestamp() == 86399 * 1_000_000_000  # test_time_series.c:658-660
    with pytest.raises(ValueError):
        TimeSeriesInt(1, 1)
    with pytest.raises(ValueError):
        TimeSeriesInt(2, 0)


def test_advance_zeroing_past_and_saturation():
    ts = TimeSeriesInt(2, 1)
    assert ts.get(0) == 0 and ts.get(1) == 0
    assert ts.add(0, 10) == 10
    assert ts.add(0, -3) == 7
    assert ts.set(0, 99) == 99
    assert ts.add(1, -1) == -1
    assert ts.get(10) is None            # future read
    assert ts.add(2, 11) == 11           # advance by 1: slot 0 zeroed
    assert ts.get(0) is None             # now out of window
    assert ts.get(1) == -1
    assert ts.get(2) == 11
    assert ts.add(0, 5) is None          # late data dropped
    # saturation
    ts2 = TimeSeriesInt(2, 1)
    ts2.set(1, I32_MAX)
    assert ts2.add(1, 1) == I32_MAX
    ts2.set(1, I32_MIN)
    assert ts2.add(1, -1) == I32_MIN
    # advance far beyond the window clears everything
    ts2.add(100, 7)
    assert ts2.get(99) == 0 and ts2.get(100) == 7


def test_merge_set_add_goldens():
    # test.lua:346-367
    cb = TimeSeriesInt(6, 1)
    for i in range(6):
        cb.add(i, i)
    cb1 = TimeSeriesInt(10, 1)
    cb1.merge(cb, "set")
    assert cb1.get_range(1, 2) == [1, 2]
    cb1.merge(cb1, "add")
    assert cb1.get_range(1, 2) == [2, 4]
    cb1.merge(cb1)  # default add
    assert cb1.get_range(1, 2) == [4, 8]
    # resolution rule (lua_binding/time_series.c:130-132)
    fine = TimeSeriesInt(4, 1)
    coarse = TimeSeriesInt(4, 10)
    with pytest.raises(ValueError):
        coarse.merge(fine)


def test_stats_goldens():
    # test.lua:368-414: values {1,2,3,0,5,6} at ns 1..6
    cb = TimeSeriesInt(6, 1)
    for i, v in enumerate([1, 2, 3, 0, 5, 6]):
        cb.add(i + 1, v)
    assert cb.stats(None, 6, "sum") == (17, 5)
    assert cb.stats(None, 6, "sum", True) == (17, 6)
    assert cb.stats(None, 6, "min") == (1, 5)
    assert cb.stats(None, 6, "min", True) == (0, 6)
    assert cb.stats(None, 6, "max") == (6, 5)
    assert cb.stats(None, 6, "max", True) == (6, 6)
    s, n = cb.stats(None, 6, "avg")
    assert abs(s - 3.4) < 1e-9 and n == 5
    s, n = cb.stats(None, 6, "avg", True)
    assert abs(s - 2.83333) < 1e-5 and n == 6
    s, n = cb.stats(None, 6, "sd")
    assert abs(s - 2.07364) < 1e-5 and n == 5
    s, n = cb.stats(None, 6, "sd", True)
    assert abs(s - 2.31660) < 1e-5 and n == 6
    s, n = cb.stats(None, 6, "usd")
    assert abs(s - 1.85472) < 1e-5 and n == 5
    s, n = cb.stats(None, 6, "usd", True)
    assert abs(s - 2.11476) < 1e-5 and n == 6


def test_matrix_profile_through_ts():
    # test.lua:297-310 anomaly triple over the 17-point series
    data = [132, 161, 144, 145, 31, 44, 47, 26, 232, 236, 254,
            262, 339, 360, 313, 340, 1]
    cb = TimeSeriesInt(17, 1)
    for i, v in enumerate(data):
        cb.add(i, v)
    ts_ns, pct, dist = cb.matrix_profile(None, 16, 4, 100)
    assert ts_ns == 3
    assert abs(pct - 68.356354) < 1e-5
    assert abs(dist - 1.078937) < 1e-5
    res = cb.matrix_profile(None, 16, 4, 100, result="anomaly_current")
    assert res[0] == 12 and math.isnan(res[1]) and math.isnan(res[2])
    assert len(cb.matrix_profile(None, 16, 4, 100, result="mp")) == 13
    assert len(cb.matrix_profile(None, 16, 4, 100, result="mpi")) == 13


def test_update_batch_matches_sequential():
    rng = np.random.default_rng(11)
    ns = rng.integers(0, 400, 3000)
    vs = rng.integers(-50, 50, 3000)
    seq = TimeSeriesInt(24, 10)
    for t, v in sorted(zip(ns.tolist(), vs.tolist())):
        seq.add(t, v)
    bat = TimeSeriesInt(24, 10)
    bat.update_batch({"ns": ns, "v": vs})
    assert bat.current_time == seq.current_time
    assert (bat.v == seq.v).all()


def test_codec_roundtrip_and_errors():
    ts = TimeSeriesInt(6, 1)
    for i in range(6):
        ts.add(i, i * 3)
    blob = ts.to_bytes()
    rt = TimeSeriesInt.from_bytes(blob)
    assert rt.current_time == ts.current_time
    assert (rt.v == ts.v).all()
    # reference layout check (time_series.c:308-340)
    ref = ts.to_reference_bytes()
    assert blob[4:] == ref
    with pytest.raises(CodecError):
        TimeSeriesInt.from_bytes(blob[:-2])
    with pytest.raises(CodecError):
        TimeSeriesInt.from_bytes(b"zzzz" + blob[4:])
