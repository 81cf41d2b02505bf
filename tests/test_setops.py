"""distinct_set_op (ops/setops.py): parity vs Python sets on int and
string keys, duplicate collapsing, empty/disjoint sides, op subsets."""

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.setops import distinct_set_op


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


def _run(ds_a, ds_b, col_a, col_b=None, ops=("intersect", "except", "union")):
    out = distinct_set_op(ds_a, ds_b, col_a, col_b, ops=ops).to_pandas()
    return {
        op: set(out.loc[out["op"] == op, col_a].tolist()) for op in ops
    }


@pytest.mark.usefixtures("ray_session")
def test_int_keys_with_duplicates():
    rng = np.random.default_rng(5)
    a = pd.DataFrame({"x": rng.integers(0, 50, 300).astype(np.int64)})
    b = pd.DataFrame({"y": rng.integers(30, 80, 300).astype(np.int64)})
    got = _run(_mk(a), _mk(b), "x", "y")
    sa, sb = set(a["x"]), set(b["y"])
    assert got["intersect"] == sa & sb
    assert got["except"] == sa - sb
    assert got["union"] == sa | sb


@pytest.mark.usefixtures("ray_session")
def test_string_keys_and_op_subset():
    a = pd.DataFrame({"s": ["a", "b", "c", "c", "d"]})
    b = pd.DataFrame({"s": ["c", "d", "e"]})
    got = _run(_mk(a, 2), _mk(b, 2), "s", ops=("intersect", "except"))
    assert got["intersect"] == {"c", "d"}
    assert got["except"] == {"a", "b"}


@pytest.mark.usefixtures("ray_session")
def test_disjoint_and_empty_side():
    a = pd.DataFrame({"x": np.array([1, 2, 3], dtype=np.int64)})
    b = pd.DataFrame({"x": np.array([7, 8], dtype=np.int64)})
    got = _run(_mk(a, 2), _mk(b, 2), "x")
    assert got["intersect"] == set()
    assert got["except"] == {1, 2, 3}
    assert got["union"] == {1, 2, 3, 7, 8}

    empty = pd.DataFrame({"x": pd.Series([], dtype="int64")})
    got = _run(_mk(a, 2), _mk(empty, 1), "x")
    assert got["intersect"] == set()
    assert got["except"] == {1, 2, 3}
    assert got["union"] == {1, 2, 3}


def test_unknown_op_raises():
    with pytest.raises(ValueError):
        distinct_set_op(None, None, "x", ops=("minus",))


@pytest.mark.usefixtures("ray_session")
def test_table_diff_statuses_and_unchanged_dropped():
    import ray.data as rd

    from raysketch.ops.setops import table_diff

    old = pd.DataFrame({
        "id": np.arange(8, dtype=np.int64),
        "text": [f"row {i}" for i in range(8)]})
    new = pd.DataFrame({
        "id": np.array([0, 1, 2, 3, 5, 6, 7, 9], dtype=np.int64),
        "text": ["row 0", "row 1 EDITED", "row 2", "row 3",
                 "row 5", "row 6 EDITED", "row 7", "brand new"]})
    got = table_diff(rd.from_pandas(old).repartition(3),
                     rd.from_pandas(new).repartition(2),
                     "id", ["text"]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert list(got.itertuples(index=False, name=None)) == [
        (1, "changed"), (4, "removed"), (6, "changed"), (9, "added")]
