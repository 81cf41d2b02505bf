"""Sixth-session round-4 ops: truncated EWMA scan, seasonal robust
anomalies, CUSUM change-point, regex redaction audit, CDC upsert merge,
Bloom-manifest file skipping, bounded BFS. Kernel-level brute-force
parities + edge cases; end-to-end SQL parity runs in
test_oracle_parity."""

import os
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raysketch.engine.sinks import (read_bloom_pruned, write_bloom_manifest,
                                    write_dataset)
from raysketch.ops.graph import bfs_hops
from raysketch.ops.rules import redact_patterns
from raysketch.ops.scan import ewma_scan
from raysketch.ops.setops import upsert_merge
from raysketch.ops.stats import changepoint, seasonal_anomalies


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


# ---------------------------------------------------------------------------
# ewma_scan
# ---------------------------------------------------------------------------

def _brute_ewma(df: pd.DataFrame, lags: int) -> dict[int, float]:
    out = {}
    for k, sub in df.sort_values(["k", "o"]).groupby("k"):
        v = sub["v"].to_numpy(np.int64)
        tail = v[-lags:][::-1]  # latest first
        out[k] = float(sum(int(x) * 2.0 ** -(i + 1)
                           for i, x in enumerate(tail)))
    return out


@pytest.mark.usefixtures("ray_session")
def test_ewma_matches_brute_force():
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.integers(-500, 500, n)})
    got = ewma_scan(_mk(df, 6), "k", ["o"], "v", lags=16).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = _brute_ewma(df, 16)
    assert got["k"].tolist() == sorted(want)
    assert got["ewma"].tolist() == [want[k] for k in got["k"]]
    sizes = df.groupby("k").size()
    assert got["n_rows"].tolist() == [int(sizes[k]) for k in got["k"]]


@pytest.mark.usefixtures("ray_session")
def test_ewma_short_keys_and_validation():
    # keys with fewer rows than lags use all their rows
    df = pd.DataFrame({"k": [1, 1, 2], "o": [1, 2, 1], "v": [8, 4, 6]})
    got = ewma_scan(_mk(df, 2), "k", ["o"], "v", lags=16).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got["ewma"].tolist() == [4 * 0.5 + 8 * 0.25, 6 * 0.5]
    with pytest.raises(ValueError, match="lags"):
        ewma_scan(_mk(df, 1), "k", ["o"], "v", lags=0)


# ---------------------------------------------------------------------------
# seasonal_anomalies
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_seasonal_anomalies_matches_brute_force():
    rng = np.random.default_rng(11)
    n = 2000
    hours = rng.integers(0, 4, n)
    df = pd.DataFrame({
        "g": np.where(rng.integers(0, 2, n) == 0, "a", "b"),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(hours, unit="h"),
        "v": rng.integers(0, 50, n) / 100.0})
    got = seasonal_anomalies(_mk(df, 5), "g", "ts", "v").to_pandas() \
        .sort_values(["g", "hour"]).reset_index(drop=True)
    cents = np.floor(df["v"].to_numpy() * 100 + 0.5).astype(np.int64)
    ref = pd.DataFrame({"g": df["g"], "h": hours, "c": cents})
    for _, row in got.iterrows():
        sub = ref[(ref["g"] == row["g"]) & (ref["h"] == row["hour"])]
        med = float(np.median(sub["c"]))
        mad = float(np.median(np.abs(sub["c"] - med)))
        assert row["n"] == len(sub)
        assert row["median"] == med
        assert row["mad"] == mad
        assert row["n_outliers"] == int(
            (np.abs(sub["c"] - med) > 3.0 * mad).sum())


# ---------------------------------------------------------------------------
# changepoint
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_changepoint_matches_brute_force_with_negatives():
    rng = np.random.default_rng(13)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n),
        "o": rng.integers(0, 60, n),
        "v": rng.integers(-300, 300, n)})
    got = changepoint(_mk(df, 6), "k", "o", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["k"] == row["k"]].groupby("o", as_index=False)[
            "v"].sum().sort_values("o")
        s = sub["v"].to_numpy(np.int64).cumsum()
        nn = len(sub)
        stat = np.abs(nn * s - np.arange(1, nn + 1) * s[-1])
        best = int(stat.max())
        first = int(sub["o"].to_numpy()[int(np.argmax(stat))])
        assert row["stat"] == best
        assert row["cp_order"] == first  # argmax takes FIRST max = min o
        assert row["n_steps"] == nn


@pytest.mark.usefixtures("ray_session")
def test_changepoint_single_step_key():
    df = pd.DataFrame({"k": [5], "o": [3], "v": [7]})
    got = changepoint(_mk(df, 1), "k", "o", "v").to_pandas()
    # n=1: stat = |1*7 - 1*7| = 0
    assert got.iloc[0].tolist() == [5, 3, 0, 1]


# ---------------------------------------------------------------------------
# redact_patterns
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_redact_counts_and_chars():
    df = pd.DataFrame({
        "source": ["s1", "s1", "s2"],
        "text": ["call 555-1234 or 555-9876", "no digits here",
                 "x 12-3456 y"]})
    got = redact_patterns(_mk(df, 2), r"\d{2,3}-\d{4}",
                          "source", "text").to_pandas()
    s1 = got[got["source"] == "s1"].iloc[0]
    s2 = got[got["source"] == "s2"].iloc[0]
    assert (s1["n_docs"], s1["docs_matched"], s1["n_matches"]) == (2, 1, 2)
    assert s1["chars_redacted"] == len("555-1234") + len("555-9876")
    assert (s2["docs_matched"], s2["n_matches"]) == (1, 1)
    assert s2["chars_redacted"] == len("12-3456")


# ---------------------------------------------------------------------------
# upsert_merge
# ---------------------------------------------------------------------------

def _cdc_frames():
    base = pd.DataFrame({
        "id": [1, 2, 3, 4], "val": [10, 20, 30, 40],
        "ver": [0, 0, 0, 0], "op": ["U"] * 4})
    delta = pd.DataFrame({
        "id": [2, 3, 5], "val": [99, 0, 50],
        "ver": [1, 1, 1], "op": ["U", "D", "U"]})
    return base, delta


@pytest.mark.usefixtures("ray_session")
def test_upsert_merge_latest_wins_and_tombstones():
    base, delta = _cdc_frames()
    got = upsert_merge(_mk(base, 2), _mk(delta, 2), "id", "ver") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert got["id"].tolist() == [1, 2, 4, 5]  # 3 tombstoned, 5 inserted
    assert got["val"].tolist() == [10, 99, 40, 50]


@pytest.mark.usefixtures("ray_session")
def test_upsert_merge_refuses_duplicate_versions():
    base, _ = _cdc_frames()
    dup = pd.DataFrame({
        "id": [2, 2], "val": [7, 8], "ver": [0, 0], "op": ["U", "U"]})
    merged = upsert_merge(_mk(base, 1), _mk(dup, 1), "id", "ver")
    with pytest.raises(Exception, match="plan-dependent"):
        merged.materialize()


# ---------------------------------------------------------------------------
# bloom manifest skipping
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_bloom_manifest_prunes_and_never_drops():
    import ray.data as rd

    root = f"/tmp/raysketch_test_bloom_{uuid.uuid4().hex[:8]}"
    try:
        # 8 blocks with DISJOINT key ranges -> written as separate files
        frames = [pd.DataFrame({"key": np.arange(i * 100, i * 100 + 100),
                                "x": np.full(100, i)})
                  for i in range(8)]
        ds = rd.from_pandas(frames)
        write_dataset(ds, root)
        write_bloom_manifest(root, "key")
        probe = [5, 305]  # lives in files 0 and 3
        pruned, scanned, total = read_bloom_pruned(root, "key", probe)
        assert total >= 8 and scanned < total
        got = pruned.to_pandas()
        assert set(probe) <= set(got["key"])  # no qualifying row dropped
        # all-miss probe prunes everything
        none_ds, s0, _ = read_bloom_pruned(root, "key", [999_999])
        assert none_ds is None and s0 == 0
        with pytest.raises(FileNotFoundError):
            read_bloom_pruned(root + "_missing", "key", probe)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# bfs_hops
# ---------------------------------------------------------------------------

def _bfs_brute(edges: pd.DataFrame, seeds: list[int],
               max_hops: int) -> dict[int, int]:
    adj: dict[int, set] = {}
    for a, b in edges.itertuples(index=False):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.add(v)
        frontier = nxt
    return dist


@pytest.mark.usefixtures("ray_session")
def test_bfs_matches_brute_and_routes_agree():
    rng = np.random.default_rng(17)
    edges = pd.DataFrame({
        "src": rng.integers(0, 60, 150),
        "dst": rng.integers(60, 120, 150)}).drop_duplicates()
    seeds = [0, 1, 2]
    want = _bfs_brute(edges, seeds, 3)
    seeds_df = pd.DataFrame({"node": seeds})
    # three physical routes, one answer: driver fold, shuffle fold with
    # broadcast frontier semi-join, shuffle fold with partitioned semi
    for dlimit, blimit in ((2_000_000, 2_000_000), (0, 2_000_000),
                           (0, 0)):
        got = bfs_hops(_mk(edges, 4), _mk(seeds_df, 1), max_hops=3,
                       frontier_broadcast_limit=blimit,
                       driver_fold_limit=dlimit).to_pandas()
        gmap = dict(zip(got["node"], got["dist"]))
        assert gmap == want, f"route d={dlimit} b={blimit}"


@pytest.mark.usefixtures("ray_session")
def test_bfs_stops_at_max_hops_and_handles_empty_frontier():
    # chain 1-2-3-4: from 1 with max_hops=2 node 4 is unreached
    edges = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 4]})
    got = bfs_hops(_mk(edges, 1), _mk(pd.DataFrame({"node": [1]}), 1),
                   max_hops=2).to_pandas()
    assert dict(zip(got["node"], got["dist"])) == {1: 0, 2: 1, 3: 2}
    # isolated seed: frontier drains immediately, loop exits early
    lone = bfs_hops(_mk(edges, 1), _mk(pd.DataFrame({"node": [99]}), 1),
                    max_hops=3).to_pandas()
    assert dict(zip(lone["node"], lone["dist"])) == {99: 0}
