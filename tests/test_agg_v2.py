import functools
import pytest
import pyarrow as pa

from raysketch.engine.agg_v2 import SketchAgg
from raysketch.sketches import HyperLogLog, RunningStats


def test_global_aggregate(ray_session, sf_dir):
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text", "n_chars"])
    out = ds.aggregate(
        SketchAgg(functools.partial(HyperLogLog, 14), on="text", alias_name="hll_text"),
        SketchAgg(RunningStats, on="n_chars", alias_name="stats_chars"),
    )
    exact = ds.to_pandas()
    assert round(out["hll_text"]["estimate"]) == exact["text"].nunique()
    assert out["stats_chars"]["count"] == len(exact)
    assert abs(out["stats_chars"]["mean"] - exact["n_chars"].mean()) < 1e-9


def test_grouped_aggregate(ray_session, sf_dir):
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    res = ds.groupby("lang").aggregate(
        SketchAgg(functools.partial(HyperLogLog, 14), on="text", alias_name="d")
    ).to_pandas().sort_values("lang").reset_index(drop=True)
    exact = ds.to_pandas().groupby("lang")["text"].nunique().sort_index()
    got = {row["lang"]: round(row["d"]["estimate"]) for _, row in res.iterrows()}
    assert got == exact.to_dict()
