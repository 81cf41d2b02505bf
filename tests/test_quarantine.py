"""ops/quarantine.py — dead-letter channel: split correctness, retry
idempotence (content-derived filenames), all-valid fast path, empty
read-back."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raysketch.ops.quarantine import quarantine_invalid, read_quarantine


def _mk(df: pd.DataFrame, parallelism: int = 3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


@pytest.fixture()
def frame():
    rng = np.random.default_rng(31)
    return pd.DataFrame({
        "rid": np.arange(300, dtype=np.int64),
        "x": rng.integers(-50, 150, 300).astype(np.int64),
    })


def _make_validator():
    # defined as a closure so cloudpickle ships it BY VALUE — a
    # module-level test function is pickled by reference and the test
    # module is not importable on Ray workers
    def validator(batch: pa.Table) -> np.ndarray:
        x = batch["x"].to_numpy(zero_copy_only=False)
        return (x >= 0) & (x < 100)

    return validator


_validator = _make_validator()


@pytest.mark.usefixtures("ray_session")
def test_split_and_readback(frame, tmp_path):
    qdir = str(tmp_path / "q")
    good = quarantine_invalid(_mk(frame), _validator, qdir, "rid").to_pandas()
    bad = read_quarantine(qdir).to_pandas()
    expect_good = frame[(frame.x >= 0) & (frame.x < 100)]
    assert sorted(good["rid"]) == sorted(expect_good["rid"])
    assert sorted(bad["rid"]) == sorted(frame.loc[~frame.rid.isin(expect_good.rid), "rid"])
    assert (bad["_reason"] == "validation_failed").all()


@pytest.mark.usefixtures("ray_session")
def test_rerun_is_idempotent(frame, tmp_path):
    """A retried/re-executed pipeline overwrites the same part files —
    the side channel never duplicates rows."""
    qdir = str(tmp_path / "q")
    for _ in range(3):
        quarantine_invalid(_mk(frame), _validator, qdir, "rid").materialize()
    bad = read_quarantine(qdir).to_pandas()
    n_expected = int((~((frame.x >= 0) & (frame.x < 100))).sum())
    assert len(bad) == n_expected
    assert bad["rid"].is_unique


@pytest.mark.usefixtures("ray_session")
def test_all_valid_writes_nothing(tmp_path):
    df = pd.DataFrame({"rid": np.arange(5, dtype=np.int64),
                       "x": np.arange(5, dtype=np.int64)})
    qdir = str(tmp_path / "q")
    good = quarantine_invalid(_mk(df, 1), _validator, qdir, "rid").to_pandas()
    assert len(good) == 5
    assert [f for f in os.listdir(qdir) if f.endswith(".parquet")] == []
    assert read_quarantine(qdir).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_read_missing_dir_is_empty(tmp_path):
    assert read_quarantine(str(tmp_path / "nope")).count() == 0
