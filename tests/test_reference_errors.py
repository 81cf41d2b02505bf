"""Argument-validation parity with the reference Lua suite.

Mirrors the reference's error tables (lua_binding/tests/test.lua:7-17,
59-65, 76-85, 198-246, 425-470, 569-614): every validation the reference
enforces must raise here too. Where the reference asserts an EXACT
constraint message (the p2 tables), our message carries the same
constraint text; the Lua-C argument-plumbing messages ("bad argument #1
to 'add'") are an artifact of the binding layer and map to Python's
native TypeError/ValueError culture.
"""

import math

import pytest

from raysketch.sketches.base import CodecError
from raysketch.sketches.cms import CMSketch
from raysketch.sketches.matrix import MatrixFlt, MatrixInt
from raysketch.sketches.p2 import P2Histogram, P2Quantile
from raysketch.sketches.running_stats import RunningStats
from raysketch.sketches.time_series import TimeSeriesInt


class TestP2MessageExact:
    """test.lua:59-65 — constraint text matches the reference verbatim."""

    @pytest.mark.parametrize("p", [-1, 0.0, 1.0, 1.1])
    def test_quantile_bounds(self, p):
        with pytest.raises(ValueError, match="0 < quantile < 1"):
            P2Quantile(p)

    @pytest.mark.parametrize("b", [3, 0, 65535, 70000])
    def test_histogram_bounds(self, b):
        with pytest.raises(ValueError, match="4 <= buckets < 65535"):
            P2Histogram(b)

    def test_invalid_serialization(self):
        # test.lua:17,85 — garbage restore must raise, not corrupt
        with pytest.raises(CodecError):
            RunningStats.from_bytes(b"foo")
        with pytest.raises(CodecError):
            P2Quantile.from_bytes(b"foo", 0.5)
        with pytest.raises(CodecError):
            P2Histogram.from_bytes(b"foo", 4)


class TestP2MarkerRange:
    """test.lua:79-82 — out-of-range markers.

    The C API returns NAN/0 for marker > bound (p2.c:149-159,337-347);
    the Lua layer raises. We follow the C semantics (NaN/0 sentinel) —
    asserted here so the contract is pinned either way."""

    def test_quantile_marker_out_of_range(self):
        q = P2Quantile(0.5)
        for v in (0.02, 0.15, 0.74, 3.39, 0.83):
            q.add(v)
        assert math.isnan(q.estimate(5))
        assert q.count(5) == 0

    def test_histogram_marker_out_of_range(self):
        h = P2Histogram(4)
        for v in range(6):
            h.add(float(v))
        assert math.isnan(h.estimate(5))
        assert h.count(5) == 0


class TestTimeSeriesValidation:
    """test.lua:198-246 — constructor/ops conditions."""

    def test_one_row_rejected(self):
        with pytest.raises(ValueError):
            TimeSeriesInt(1, 1)

    def test_zero_ns_per_row_rejected(self):
        with pytest.raises(ValueError):
            TimeSeriesInt(2, 0)

    def test_merge_bad_op(self):
        a, b = TimeSeriesInt(2, 1), TimeSeriesInt(2, 1)
        with pytest.raises(ValueError):
            a.merge(b, "foo")

    def test_stats_bad_type(self):
        from raysketch.ops.window import window_stats

        import numpy as np

        with pytest.raises(ValueError):
            window_stats(np.array([1.0, 2.0]), "bogus")


class TestMatrixValidation:
    """test.lua:425-470 (int) and :569-614 (float)."""

    @pytest.mark.parametrize("cls", [MatrixInt, MatrixFlt])
    def test_zero_rows_cols_rejected(self, cls):
        with pytest.raises(ValueError):
            cls(0, 1)
        with pytest.raises(ValueError):
            cls(2, 0)
        with pytest.raises(ValueError):
            cls(2, -1)

    @pytest.mark.parametrize("cls", [MatrixInt, MatrixFlt])
    def test_out_of_bounds_get_set(self, cls):
        m = cls(2, 1)
        with pytest.raises(IndexError):
            m.get(2, 0)
        with pytest.raises(IndexError):
            m.get(0, 1)
        with pytest.raises(IndexError):
            m.set(2, 0, 1)
        with pytest.raises(IndexError):
            m.sum(-1)
        with pytest.raises(IndexError):
            m.pcc(2)

    def test_mismatched_matrix_types_merge(self):
        # test.lua:459-463 / :602-606 — int×float merge must fail
        with pytest.raises((TypeError, ValueError)):
            MatrixInt(2, 1).merge(MatrixFlt(2, 1))

    @pytest.mark.parametrize("cls", [MatrixInt, MatrixFlt])
    def test_merge_bad_op(self, cls):
        with pytest.raises(ValueError):
            cls(2, 1).merge(cls(2, 1), "bogus")


class TestCMSValidation:
    """cm_sketch.c:24-42 / test_cm_sketch.c constructor gates."""

    @pytest.mark.parametrize("eps,delta", [(0, 0.1), (1, 0.1), (-1, 0.1),
                                           (0.1, 0), (0.1, 1), (0.1, -1)])
    def test_epsilon_delta_bounds(self, eps, delta):
        with pytest.raises(ValueError):
            CMSketch(eps, delta)

    def test_bad_key_type(self):
        cms = CMSketch(0.1, 0.1)
        with pytest.raises(TypeError):
            cms.update(object())

    def test_invalid_serialization(self):
        with pytest.raises(CodecError):
            CMSketch.from_bytes(b"foo")
