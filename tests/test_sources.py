"""engine/sources.py — text-source round-trip fidelity pins: CSV is
bit-exact for int64/double/string/timestamp[us]; JSON round-trips
numerics/strings but NOT timestamps (the documented limitation)."""

import os

import numpy as np
import pandas as pd
import pytest

from raysketch.engine.sources import cleanup, stage_and_read


@pytest.fixture()
def events_ds(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"))


def _sorted(df):
    return df.sort_values("event_id").reset_index(drop=True)


def test_csv_roundtrip_bit_exact(events_ds):
    orig = _sorted(events_ds.to_pandas())
    back_ds, path = stage_and_read(events_ds, "csv")
    back = _sorted(back_ds.to_pandas())
    try:
        assert (back["value"].to_numpy() == orig["value"].to_numpy()).all()
        assert (back["event_id"].to_numpy() == orig["event_id"].to_numpy()).all()
        assert (back["event_type"] == orig["event_type"]).all()
        # timestamps survive (read back as ns; equal at us precision)
        assert (
            pd.to_datetime(back["ts"]).astype("datetime64[us]").to_numpy()
            == orig["ts"].astype("datetime64[us]").to_numpy()
        ).all()
    finally:
        cleanup(path)
    assert not os.path.exists(path)


def test_jsonl_roundtrip_numeric_exact_ts_lossy(events_ds):
    orig = _sorted(events_ds.to_pandas())
    back_ds, path = stage_and_read(events_ds, "jsonl")
    back = _sorted(back_ds.to_pandas())
    try:
        assert (back["value"].to_numpy() == orig["value"].to_numpy()).all()
        assert (back["user_id"].to_numpy() == orig["user_id"].to_numpy()).all()
        # the documented loss: ts comes back as an int column, not a
        # timestamp — pipelines must carry integer epochs through JSON
        assert not str(back["ts"].dtype).startswith("datetime64")
    finally:
        cleanup(path)


def test_unknown_format_raises(events_ds):
    with pytest.raises(ValueError):
        stage_and_read(events_ds, "tsv")
