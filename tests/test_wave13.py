"""Round-4 seventh-session wave 5: calendar_densify, neighbor_features,
new_vs_returning (canonical_dedup is a composition of existing kernels,
oracle-gated in test_oracle_parity)."""

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.graph import neighbor_features
from raysketch.ops.window import calendar_densify

DAY = 86_400_000_000


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


def test_calendar_densify_fills_gaps(ray_session):
    # key "a" active on days 0 and 3, key "b" on day 1 only
    ts = pd.to_datetime(np.array([0, 3, 1], np.int64) * DAY, unit="us")
    df = pd.DataFrame({"k": ["a", "a", "b"], "ts": ts})
    got = calendar_densify(_mk(df, 2), "k", "ts").to_pandas()
    assert len(got) == 8  # 2 keys x days 0..3
    a = got[got["k"] == "a"].set_index("day_idx")
    assert list(a["n_events"]) == [1, 0, 0, 1]
    assert list(a["is_gap"]) == [0, 1, 1, 0]
    b = got[got["k"] == "b"].set_index("day_idx")
    assert list(b["n_events"]) == [0, 1, 0, 0]


def test_calendar_densify_counts_and_block_invariance(ray_session):
    rng = np.random.default_rng(7)
    n = 1000
    days = rng.integers(10, 25, n)
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], n),
        "ts": pd.to_datetime(days * DAY + rng.integers(0, DAY, n),
                             unit="us")})
    a = calendar_densify(_mk(df, 1), "k", "ts").to_pandas()
    b = calendar_densify(_mk(df, 9), "k", "ts").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    brute = df.assign(d=days).groupby(["k", "d"]).size()
    for (k, d), n_ in brute.items():
        row = a[(a["k"] == k) & (a["day_idx"] == d)]
        assert int(row["n_events"].iloc[0]) == n_
    assert int(a["n_events"].sum()) == n


def test_neighbor_features_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    edges = pd.DataFrame({
        "u": rng.integers(1, 20, 150).astype(np.int64),
        "v": rng.integers(1, 20, 150).astype(np.int64)})
    feats = pd.DataFrame({
        "node": np.arange(1, 20, dtype=np.int64),
        "bal": rng.normal(0, 50, 19).round(2)})
    got = neighbor_features(_mk(edges, 5), _mk(feats, 2),
                            "node", "bal").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    adj = {}
    for u, v in zip(edges["u"], edges["v"]):
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    fv = {n: int(np.sign(b) * np.floor(abs(b) * 100 + 0.5))
          for n, b in zip(feats["node"], feats["bal"])}
    for _, r in got.iterrows():
        nb = adj[r["node"]]
        s = sum(fv[x] for x in nb)
        assert int(r["n_nbrs"]) == len(nb)
        assert int(r["nbr_sum"]) == s
        den = len(nb) * 100
        micro = np.sign(s) * ((abs(s) * 2_000_000 + den) // (2 * den))
        assert r["nbr_mean"] == micro / 1e6
    assert set(got["node"]) == set(adj)
