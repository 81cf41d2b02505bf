"""Round-4 seventh-session wave 2: target_encoding, welch_ttest,
read_union_by_name, deterministic_walks."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raysketch.engine.sources import read_union_by_name
from raysketch.ops.graph import deterministic_walks
from raysketch.ops.stats import target_encoding, welch_ttest


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


# ---------------------------------------------------------------------------
# target_encoding
# ---------------------------------------------------------------------------

def test_target_encoding_matches_brute(ray_session):
    rng = np.random.default_rng(2)
    n = 3000
    cats = rng.choice(["a", "b", "c", "d"], n)
    y = rng.integers(0, 100000, n) / 100.0
    df = pd.DataFrame({"cat": cats, "y": y})
    got = target_encoding(_mk(df), "cat", "y", m=20).to_pandas()
    yc = np.floor(y * 100 + 0.5).astype(np.int64)
    N, G = n, int(yc.sum())
    for cv in "abcd":
        m = cats == cv
        nc, s = int(m.sum()), int(yc[m].sum())
        row = got[got["cat"] == cv].iloc[0]
        assert int(row["n"]) == nc

        def r6(num, den):
            return ((num * 2_000_000 + den) // (2 * den)) / 1e6

        assert row["enc"] == r6(s * N + 20 * G, (nc + 20) * N * 100)
        # brute LOO mean: average the per-row LOO encodings exactly
        loos = [(s - int(v)) * N + 20 * G for v in yc[m]]
        den = (nc - 1 + 20) * N * 100
        from fractions import Fraction
        mean = sum(Fraction(x, den) for x in loos) / nc
        assert row["loo_mean"] == pytest.approx(float(mean), abs=5.1e-7)
        assert row["loo_min"] == r6((s - int(yc[m].max())) * N + 20 * G, den)
        assert row["loo_max"] == r6((s - int(yc[m].min())) * N + 20 * G, den)


def test_target_encoding_singleton_category_is_prior(ray_session):
    # a category with one row: its LOO encoding is exactly the prior
    df = pd.DataFrame({"cat": ["solo"] + ["bulk"] * 99,
                       "y": [42.0] + [10.0] * 99})
    got = target_encoding(_mk(df), "cat", "y", m=20).to_pandas()
    yc = np.array([4200] + [1000] * 99, np.int64)
    prior = ((int(yc.sum()) * 2_000_000 + 100 * 100)
             // (2 * 100 * 100)) / 1e6
    solo = got[got["cat"] == "solo"].iloc[0]
    assert solo["loo_mean"] == pytest.approx(prior, abs=1e-6)
    assert solo["loo_min"] == solo["loo_max"] == solo["loo_mean"]


def test_target_encoding_block_invariant(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"cat": rng.choice(["x", "y"], 500),
                       "y": rng.random(500) * 10})
    a = target_encoding(_mk(df, 1), "cat", "y").to_pandas()
    b = target_encoding(_mk(df, 9), "cat", "y").to_pandas()
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# welch_ttest
# ---------------------------------------------------------------------------

def test_welch_ttest_matches_naive(ray_session):
    rng = np.random.default_rng(4)
    na, nb = 800, 1200
    ya = rng.integers(0, 10000, na) / 100.0
    yb = (rng.integers(0, 10000, nb) + 500) / 100.0
    df = pd.DataFrame({"g": ["A"] * na + ["B"] * nb,
                       "y": np.concatenate([ya, yb])})
    got = welch_ttest(_mk(df), "g", "y", "A", "B").to_pandas().iloc[0]
    a = np.floor(ya * 100 + 0.5)
    b = np.floor(yb * 100 + 0.5)
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se = v1 / na + v2 / nb
    t = (a.mean() - b.mean()) / np.sqrt(se)
    dfree = se * se / ((v1 / na) ** 2 / (na - 1) + (v2 / nb) ** 2 / (nb - 1))
    assert got["t_stat"] == pytest.approx(t, abs=1e-5)
    assert got["welch_df"] == pytest.approx(dfree, rel=1e-6)
    assert got["mean_a"] == pytest.approx(a.mean() / 100, abs=1e-6)
    assert int(got["n_a"]) == na and int(got["n_b"]) == nb


def test_welch_ttest_block_invariant_and_validates(ray_session):
    df = pd.DataFrame({"g": ["A", "A", "B", "B", "B"] * 20,
                       "y": np.arange(100) / 7.0})
    a = welch_ttest(_mk(df, 1), "g", "y", "A", "B").to_pandas()
    b = welch_ttest(_mk(df, 8), "g", "y", "A", "B").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    tiny = pd.DataFrame({"g": ["A", "B", "B"], "y": [1.0, 2.0, 3.0]})
    with pytest.raises(ValueError, match=">= 2"):
        welch_ttest(_mk(tiny, 1), "g", "y", "A", "B")


# ---------------------------------------------------------------------------
# read_union_by_name
# ---------------------------------------------------------------------------

def test_read_union_by_name_fills_and_refuses(ray_session, tmp_path):
    p1 = str(tmp_path / "v1")
    p2 = str(tmp_path / "v2")
    os.makedirs(p1), os.makedirs(p2)
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64()),
                             "s": pa.array(["a", "b"])}),
                   os.path.join(p1, "part.parquet"))
    pq.write_table(pa.table({"id": pa.array([3], pa.int64()),
                             "s": pa.array(["c"]),
                             "extra": pa.array([7.5], pa.float64())}),
                   os.path.join(p2, "part.parquet"))
    ds = read_union_by_name([p1, p2])
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df["id"]) == [1, 2, 3]
    assert df["extra"].isna().tolist() == [True, True, False]
    assert df.loc[2, "extra"] == 7.5
    # conflicting evolution refuses
    p3 = str(tmp_path / "v3")
    os.makedirs(p3)
    pq.write_table(pa.table({"id": pa.array(["oops"])}),
                   os.path.join(p3, "part.parquet"))
    with pytest.raises(ValueError, match="evolved incompatibly"):
        read_union_by_name([p1, p3])


# ---------------------------------------------------------------------------
# deterministic_walks
# ---------------------------------------------------------------------------

def _brute_walks(edges: pd.DataFrame, n_walks=2, length=3):
    from raysketch.ops.cluster import seed_key32
    adj = {}
    for u, v in zip(edges["u"], edges["v"]):
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    adj = {k: sorted(vs) for k, vs in adj.items()}
    rows = []
    for start in sorted(adj):
        for w in range(n_walks):
            cur = start
            rows.append((start, w, 0, cur))
            for s in range(1, length + 1):
                key = np.array([cur * 16 + s * n_walks + w], np.int64)
                rk = int(seed_key32(key)[0]) % len(adj[cur])
                cur = adj[cur][rk]
                rows.append((start, w, s, cur))
    return pd.DataFrame(rows, columns=["start", "walk_id", "step", "node"])


def test_deterministic_walks_matches_brute(ray_session):
    rng = np.random.default_rng(6)
    edges = pd.DataFrame({
        "u": rng.integers(0, 25, 200).astype(np.int64),
        "v": rng.integers(0, 25, 200).astype(np.int64)})
    got = deterministic_walks(_mk(edges)).to_pandas()
    want = _brute_walks(edges)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"),
        want.astype("int64"))


def test_deterministic_walks_route_identity(ray_session):
    rng = np.random.default_rng(8)
    base = pd.DataFrame({
        "u": rng.integers(0, 15, 40).astype(np.int64),
        "v": rng.integers(0, 15, 40).astype(np.int64)})
    rep = pd.concat([base] * 15, ignore_index=True)
    driver = deterministic_walks(_mk(rep, 8)).to_pandas()
    dist = deterministic_walks(_mk(rep, 8), driver_limit=50).to_pandas()
    pd.testing.assert_frame_equal(driver, dist)


def test_deterministic_walks_validates(ray_session):
    edges = pd.DataFrame({"u": np.array([1], np.int64),
                          "v": np.array([2], np.int64)})
    with pytest.raises(ValueError, match="16"):
        deterministic_walks(_mk(edges, 1), n_walks=4, length=4)
