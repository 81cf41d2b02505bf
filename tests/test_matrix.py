"""Matrix int/flt + matrix profile reference parity.

Goldens from lua_binding/tests/test.lua:479-736 and
library/tests/test_time_series.c:778-808.
"""

import math

import numpy as np
import pytest

from raysketch.ops.matrixprofile import matrix_profile, mp_anomaly
from raysketch.sketches.base import CodecError
from raysketch.sketches.matrix import MatrixFlt, MatrixInt

_I32_MAX = (1 << 31) - 1


def _fill(m, data):
    for r, row in enumerate(data):
        for c, v in enumerate(row):
            m.add(r, c, v)
    return m


def test_int_basics_and_bounds():
    m = MatrixInt(2, 1)
    assert m.get(0, 0) == 0  # int inits to zero (test.lua:481-483)
    m.set(1, 0, 1)
    assert m.get(1, 0) == 1
    assert m.get_configuration() == (2, 1)
    with pytest.raises(ValueError):
        MatrixInt(0, 1)  # matrix.c:37
    with pytest.raises(IndexError):
        m.get(2, 0)
    # saturation (matrix.c:115-120)
    m.set(0, 0, _I32_MAX)
    assert m.add(0, 0, 5) == _I32_MAX


def test_get_row_and_sum():
    cb = MatrixInt(6, 1)
    for i in range(6):
        cb.add(i, 0, i + 1)
    assert list(cb.get_row(0)) == [1]  # test.lua:496-503
    m = _fill(MatrixInt(1, 5), [[1, 2, 3, 4]])
    assert m.sum(0) == 10  # test.lua:549-560


_PCC_DATA = [
    [1, 2, 5, 10],
    [0, 1, 2, 3],
    [-1, 0, 7, 26],
    [1, 2, 3, 4],
]


def test_pcc_goldens_int():
    m = _fill(MatrixInt(4, 4), _PCC_DATA)
    pcc, idx = m.pcc(3)
    assert abs(1 - pcc) < 1e-9 and idx == 1  # test.lua:517-519
    pcc, idx = m.pcc(3, "min")
    assert abs(0.90765069670774 - pcc) < 1e-9 and idx == 2  # test.lua:520-522
    m.clear_row(1)
    pcc, idx = m.pcc(3)
    assert abs(0.95831484749991 - pcc) < 1e-9 and idx == 0  # test.lua:523-526
    m1 = MatrixInt(4, 4).merge(m)
    pcc, _ = m1.pcc(3)
    assert abs(0.95831484749991 - pcc) < 1e-9  # test.lua:527-530
    # degenerate: constant rows -> None (sd == 0 -> -inf everywhere)
    z = MatrixInt(2, 5)
    z.add(1, 0, 8_000_000)  # row 0 all zero => sd 0
    assert z.pcc(1) is None


def test_pcc_scaled_rows():
    m = _fill(MatrixInt(2, 5), [[4_000_000, 0, 0, 0, 0], [8_000_000, 0, 0, 0, 0]])
    pcc, idx = m.pcc(1)
    assert abs(1 - pcc) < 1e-9 and idx == 0  # test.lua:532-547


def test_flt_nan_semantics():
    m = MatrixFlt(2, 3)
    assert math.isnan(m.get(0, 0))  # float inits to NaN (matrix.c:105-108)
    assert m.add(0, 0, 2.5) == 2.5  # NaN cell: add == assign (matrix.c:128-133)
    assert m.add(0, 0, 1.0) == 3.5
    m.set(0, 1, 4.0)
    assert m.sum(0) == 7.5  # NaN skipped (lua_binding/matrix.c:643-657)
    m.clear_row(0)
    assert math.isnan(m.get(0, 0))


def test_flt_merge_nan_rules():
    a = MatrixFlt(2, 2)
    a.add(0, 0, 1.0)
    b = MatrixFlt(2, 2)
    b.add(0, 0, 2.0)
    b.add(1, 1, 5.0)
    a.merge(b, "add")  # NaN source skipped; NaN dest assigned
    assert a.get(0, 0) == 3.0
    assert a.get(1, 1) == 5.0
    assert math.isnan(a.get(0, 1))
    c = MatrixFlt(2, 2)
    c.add(0, 0, 9.0)
    c.merge(b, "set")  # set copies NaN too (lua_binding/matrix.c:612-617)
    assert c.get(0, 0) == 2.0
    assert math.isnan(c.get(0, 1))


def test_flt_pcc_goldens_with_nan_cells():
    """Float-matrix pcc suite with NaN cells (test.lua:675-701): NaN
    products are skipped, so the goldens match the all-finite variant;
    a merge whose NaN source cell meets a real dest cell keeps the dest."""
    import math

    from raysketch.sketches.matrix import MatrixFlt

    data = [[1, 2, 5, 10],
            [math.nan, 1, 2, 3],
            [-1, math.nan, 7, 26],
            [1, 2, 3, 4]]
    m = MatrixFlt(4, 4)
    for r, row in enumerate(data):
        for c, v in enumerate(row):
            m.add(r, c, v)
    pcc, idx = m.pcc(3)
    assert abs(1 - pcc) < 1e-9 and idx == 1  # test.lua:686-688
    pcc, idx = m.pcc(3, "min")
    assert abs(0.90765069670774 - pcc) < 1e-9 and idx == 2  # :689-691
    m.clear_row(1)
    pcc, idx = m.pcc(3)
    assert abs(0.95831484749991 - pcc) < 1e-9 and idx == 0  # :692-695
    m1 = MatrixFlt(4, 4)
    m1.set(0, 0, 1.0)
    m.set(0, 0, math.nan)
    m1.merge(m)  # NaN source cell keeps dest's 1.0 (add-mode skip)
    pcc, idx = m1.pcc(3)
    assert abs(0.95831484749991 - pcc) < 1e-9  # :696-701


def test_flt_pcc_constant_tail_rows():
    """{4e6,0,0,0,0} vs {8e6,0,0,0,0} correlate exactly 1 (test.lua:705-716)."""
    from raysketch.sketches.matrix import MatrixFlt

    m = MatrixFlt(2, 5)
    for c, v in enumerate([4000000, 0, 0, 0, 0]):
        m.add(0, c, v)
    for c, v in enumerate([8000000, 0, 0, 0, 0]):
        m.add(1, c, v)
    pcc, closest = m.pcc(1)
    assert abs(1 - pcc) < 1e-9 and closest == 0


def test_flt_pcc_empty_matrix_none():
    """All-NaN float matrix: pcc returns None (test.lua:718-721)."""
    from raysketch.sketches.matrix import MatrixFlt

    assert MatrixFlt(2, 5).pcc(1) is None


def test_flt_single_row_sum():
    """1-row partial fill: sum skips untouched NaN cells (test.lua:723-736)."""
    from raysketch.sketches.matrix import MatrixFlt

    m = MatrixFlt(1, 5)
    for c, v in enumerate([1, 2, 3, 4]):
        m.add(0, c, v)
    assert m.sum(0) == 10


def test_serialize_roundtrip_and_errors():
    m = _fill(MatrixInt(4, 4), _PCC_DATA)
    rt = MatrixInt.from_bytes(m.to_bytes())
    assert (rt.v == m.v).all()
    f = MatrixFlt(2, 2)
    f.add(0, 1, 1.5)
    rf = MatrixFlt.from_bytes(f.to_bytes())
    assert rf.get(0, 1) == 1.5 and math.isnan(rf.get(1, 0))
    with pytest.raises(CodecError):
        MatrixInt.from_bytes(m.to_bytes()[:-2])
    with pytest.raises(CodecError):
        MatrixFlt.from_bytes(m.to_bytes())  # magic mismatch


def test_update_batch_triples():
    m = MatrixInt(3, 24)
    import pyarrow as pa

    t = pa.table({"row": [0, 0, 2], "col": [1, 1, 23], "value": [5, 7, 1]})
    m.update_batch(t)
    assert m.get(0, 1) == 12 and m.get(2, 23) == 1
    f = MatrixFlt(2, 2)
    f.update_batch(pa.table({"row": [0], "col": [0], "value": [2.0]}))
    f.update_batch(pa.table({"row": [0], "col": [0], "value": [3.0]}))
    assert f.get(0, 0) == 5.0 and math.isnan(f.get(1, 1))


# -- matrix profile goldens (test_time_series.c:778-808) --------------------

_MP_DATA = [132, 161, 144, 145, 31, 44, 47, 26, 232, 236, 254,
            262, 339, 360, 313, 340, 1]
_MP_EV = [1.5010956572519172, 1.7133271671869412, 1.4465117438199946,
          2.2386180615118265, 1.4207401525040495, 0.62038241908389491,
          0.39903111714324457, 1.0783010406460811, 0.17635816443144478,
          0.62038241908389491, 0.17635816443144478, 1.0783010406460811,
          1.446511743819994]
_MPI_EV = [7, 4, 12, 1, 11, 9, 10, 11, 10, 5, 8, 7, 2]


def test_matrix_profile_goldens():
    mp, mpi = matrix_profile(np.array(_MP_DATA[:16], dtype=float), m=4)
    assert mp.size == 13
    np.testing.assert_allclose(mp, _MP_EV, atol=1e-5)
    assert list(mpi) == _MPI_EV


def test_matrix_profile_validation():
    with pytest.raises(ValueError):
        matrix_profile(np.arange(16.0), m=3)  # m > 3 required
    with pytest.raises(ValueError):
        matrix_profile(np.arange(16.0), m=5)  # n/4 >= m
    with pytest.raises(ValueError):
        matrix_profile(np.arange(16.0), m=4, percent=0)


def test_anomaly_goldens():
    mp, _ = matrix_profile(np.array(_MP_DATA[:16], dtype=float), m=4)
    idx, pct, dist = mp_anomaly(mp, 4)
    # test.lua:302-305: ts==3 (ns_per_row=1, start 0), rp 68.356354, d 1.078937
    assert idx == 3
    assert abs(pct - 68.356354) < 1e-5
    assert abs(dist - 1.078937) < 1e-5
    # anomaly_current over the last m=4 points: P2 warm-up -> NaN floats
    res = mp_anomaly(mp, 4, current_only=True)
    assert res is not None
    idx_c, pct_c, dist_c = res
    assert idx_c == 12  # test.lua:307-310 (ts 12)
    assert math.isnan(pct_c) and math.isnan(dist_c)


def test_matrix_profile_percent_seeded_subset():
    v = np.array(_MP_DATA[:16], dtype=float)
    mp50a, _ = matrix_profile(v, m=4, percent=50, seed=7)
    mp50b, _ = matrix_profile(v, m=4, percent=50, seed=7)
    np.testing.assert_array_equal(mp50a, mp50b)  # seeded => deterministic
    mp100, _ = matrix_profile(v, m=4)
    assert (mp50a >= mp100 - 1e-12).all()  # subset of diagonals => upper bound
