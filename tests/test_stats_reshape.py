"""ops/stats.grouped_moments, ops/reshape.pivot_wide,
ops/funnel.transition_matrix — brute-force parity on random frames,
block invariance, contract validation."""

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.funnel import transition_matrix
from raysketch.ops.reshape import pivot_wide
from raysketch.ops.stats import grouped_moments


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


def _moments_brute(x: np.ndarray):
    n = len(x)
    m = x.mean()
    m2 = ((x - m) ** 2).sum() / n
    m3 = ((x - m) ** 3).sum() / n
    m4 = ((x - m) ** 4).sum() / n
    g1 = m3 / m2**1.5
    sk = g1 * np.sqrt(n * (n - 1)) / (n - 2)
    g2 = m4 / m2**2 - 3
    ku = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    return m, np.sqrt(m2 * n / (n - 1)), sk, ku


def test_grouped_moments_matches_brute(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 3000),
        "v": rng.integers(-40, 200, 3000).astype(np.float64),
    })
    out = grouped_moments(_mk(df, 7), "g", "v").to_pandas()
    assert list(out["g"]) == ["a", "b", "c"]
    for _, row in out.iterrows():
        x = df.loc[df["g"] == row["g"], "v"].to_numpy()
        m, sd, sk, ku = _moments_brute(x)
        assert row["n"] == len(x)
        for got, want in [(row["mean"], m), (row["stddev"], sd),
                          (row["skewness"], sk), (row["kurtosis"], ku)]:
            assert abs(got - round(want, 6)) < 2e-6


def test_grouped_moments_block_invariance(ray_session):
    rng = np.random.default_rng(8)
    df = pd.DataFrame({"g": rng.choice(["x", "y"], 500),
                       "v": rng.integers(0, 50, 500).astype(np.float64)})
    a = grouped_moments(_mk(df, 1), "g", "v").to_pandas()
    b = grouped_moments(_mk(df, 9), "g", "v").to_pandas()
    pd.testing.assert_frame_equal(a, b)  # int sums → bit-identical


def test_grouped_moments_rejects_fractional(ray_session):
    df = pd.DataFrame({"g": ["a"] * 4, "v": [1.0, 2.5, 3.0, 4.0]})
    with pytest.raises(Exception, match="integer-valued"):
        grouped_moments(_mk(df, 1), "g", "v").to_pandas()


def test_pivot_wide_matches_brute(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": rng.integers(0, 40, 2000),
        "t": rng.choice(["p", "q", "r"], 2000),
        "v": np.floor(rng.uniform(-50, 50, 2000) * 100 + 0.5) / 100,
    })
    out = (pivot_wide(_mk(df, 6), "k", "t", "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = df.groupby(["k", "t"]).agg(n=("v", "size"), s=("v", "sum"))
    for _, row in out.iterrows():
        for t in ["p", "q", "r"]:
            if (row["k"], t) in want.index:
                w = want.loc[(row["k"], t)]
                assert row[f"n_{t}"] == w["n"]
                assert abs(row[f"sum_{t}"] - w["s"]) < 1e-6
            else:
                assert row[f"n_{t}"] == 0 and row[f"sum_{t}"] == 0.0
    # every key present exactly once
    assert sorted(out["k"]) == sorted(df["k"].unique())


def test_pivot_wide_rejects_excess_decimals(ray_session):
    df = pd.DataFrame({"k": [1, 2], "t": ["a", "a"], "v": [1.234, 2.0]})
    with pytest.raises(Exception, match="more decimals"):
        pivot_wide(_mk(df, 1), "k", "t", "v").to_pandas()


def test_transition_matrix_matches_brute(ray_session):
    rng = np.random.default_rng(10)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 60, n),
        "ts": rng.integers(0, 10_000, n).astype("datetime64[us]"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c", "d"], n),
    })
    out = transition_matrix(_mk(df, 8)).to_pandas()
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    same = s["user_id"].to_numpy() == s["user_id"].shift(1).to_numpy()
    pairs = pd.DataFrame({"p": s["event_type"].shift(1).to_numpy(object),
                          "nx": s["event_type"].to_numpy(object)})[same]
    want = pairs.groupby(["p", "nx"]).size()
    n_from = pairs.groupby("p").size()
    assert len(out) == len(want)
    for _, row in out.iterrows():
        assert row["n"] == want.loc[(row["prev_type"], row["next_type"])]
        p = want.loc[(row["prev_type"], row["next_type"])] / n_from.loc[
            row["prev_type"]]
        assert abs(row["p"] - round(p, 6)) < 2e-6


def test_transition_matrix_tie_breaks_on_order_col(ray_session):
    # two same-ts events: order_col decides prev→next direction
    df = pd.DataFrame({
        "user_id": [1, 1],
        "ts": pd.to_datetime([100, 100], unit="us"),
        "event_id": [5, 4],
        "event_type": ["late", "early"],
    })
    out = transition_matrix(_mk(df, 1)).to_pandas()
    assert len(out) == 1
    assert (out.loc[0, "prev_type"], out.loc[0, "next_type"]) == (
        "early", "late")


def test_transition_matrix_empty(ray_session):
    df = pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
        "event_id": pd.Series([], dtype="int64"),
        "event_type": pd.Series([], dtype="object")})
    out = transition_matrix(_mk(df, 1)).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["prev_type", "next_type", "n", "p"]


def test_robust_profile_matches_brute(ray_session):
    from raysketch.ops.stats import robust_profile

    rng = np.random.default_rng(12)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 4001),
        "v": rng.integers(0, 30, 4001).astype(np.float64)})
    # plant far outliers
    df.loc[:4, "v"] = 500.0
    out = robust_profile(_mk(df, 6), "g", "v").to_pandas()
    for _, row in out.iterrows():
        x = np.sort(df.loc[df["g"] == row["g"], "v"].to_numpy())
        n = len(x)
        med = x[n // 2] if n % 2 else (x[n // 2 - 1] + x[n // 2]) / 2
        dev = np.sort(np.abs(x - med))
        mad = dev[n // 2] if n % 2 else (dev[n // 2 - 1] + dev[n // 2]) / 2
        assert row["n"] == n
        assert row["median"] == med and row["mad"] == mad
        assert row["n_outliers"] == int((np.abs(x - med) > 3 * mad).sum())


def test_robust_profile_rejects_fractional(ray_session):
    from raysketch.ops.stats import robust_profile

    df = pd.DataFrame({"g": ["a"] * 3, "v": [1.0, 2.5, 3.0]})
    with pytest.raises(Exception, match="integer-valued"):
        robust_profile(_mk(df, 1), "g", "v").to_pandas()


def test_grouped_mode_tie_break_and_split_blocks(ray_session):
    from raysketch.ops.stats import grouped_mode

    # user 1: tie between 'a' and 'c' -> smallest value 'a' wins;
    # user 2 spans blocks: counts must fold across partials
    df = pd.DataFrame({
        "k": [1, 1, 1, 1] + [2] * 10,
        "t": ["c", "c", "a", "a"] + ["x"] * 4 + ["y"] * 6})
    out = (grouped_mode(_mk(df.rename(columns={"k": "u"}), 5), "u", "t")
           .to_pandas().sort_values("u").reset_index(drop=True))
    assert list(out["mode_value"]) == ["a", "y"]
    assert list(out["n_mode"]) == [2, 6]


def test_fk_orphan_counts_matches_brute(ray_session):
    from raysketch.ops.setops import fk_orphan_counts

    rng = np.random.default_rng(13)
    child = pd.DataFrame({"fk": rng.integers(0, 120, 3000)})
    parent = pd.DataFrame({"pk": np.arange(0, 100, dtype=np.int64)})
    rows, keys = fk_orphan_counts(_mk(child, 6), _mk(parent, 3),
                                  "fk", "pk")
    orphan = child[child["fk"] >= 100]
    assert rows == len(orphan)
    assert keys == orphan["fk"].nunique()


def test_fk_orphan_counts_clean_edge(ray_session):
    from raysketch.ops.setops import fk_orphan_counts

    child = pd.DataFrame({"fk": np.array([1, 2, 3, 3], dtype=np.int64)})
    parent = pd.DataFrame({"pk": np.array([1, 2, 3, 9], dtype=np.int64)})
    assert fk_orphan_counts(_mk(child, 2), _mk(parent, 2),
                            "fk", "pk") == (0, 0)


def test_table_profile_matches_brute(ray_session):
    from raysketch.ops.stats import table_profile

    rng = np.random.default_rng(14)
    df = pd.DataFrame({
        "a": rng.integers(-50, 50, 2500).astype(np.float64),
        "b": rng.choice([0.25, 1.5, np.nan, 7.0, -3.25], 2500)})
    out = (table_profile(_mk(df, 7), ["a", "b"]).to_pandas()
           .set_index("col_name"))
    for c in ["a", "b"]:
        s = df[c]
        assert out.loc[c, "n"] == len(s)
        assert out.loc[c, "n_null"] == int(s.isna().sum())
        assert out.loc[c, "n_distinct"] == s.dropna().nunique()
        assert out.loc[c, "vmin"] == s.min() and out.loc[c, "vmax"] == s.max()


def test_windowed_quantiles_matches_brute(ray_session):
    from raysketch.ops.stats import windowed_quantiles
    import math

    rng = np.random.default_rng(15)
    df = pd.DataFrame({
        "w": rng.integers(0, 5, 3000),
        "v": np.floor(rng.uniform(0, 40, 3000) * 100 + 0.5) / 100})
    out = windowed_quantiles(_mk(df, 6), "w", "v", 100).to_pandas()
    assert list(out["w"]) == sorted(df["w"].unique())
    for _, row in out.iterrows():
        x = np.sort(df.loc[df["w"] == row["w"], "v"].to_numpy())
        n = len(x)
        assert row["n"] == n
        for q, col in [(0.5, "q50"), (0.9, "q90"), (0.99, "q99")]:
            assert row[col] == x[math.ceil(q * n) - 1]


def test_windowed_quantiles_rejects_excess_decimals(ray_session):
    from raysketch.ops.stats import windowed_quantiles

    df = pd.DataFrame({"w": [1, 1], "v": [1.234, 2.0]})
    with pytest.raises(Exception, match="more decimals"):
        windowed_quantiles(_mk(df, 1), "w", "v", 100).to_pandas()


def test_trimmed_mean_matches_brute(ray_session):
    from raysketch.ops.stats import trimmed_mean

    rng = np.random.default_rng(16)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 2203),
        "v": rng.integers(0, 100, 2203).astype(np.float64)})
    df.loc[:9, "v"] = 10_000.0  # tail mass the trim must drop
    out = trimmed_mean(_mk(df, 5), "g", "v", alpha=0.05).to_pandas()
    for _, row in out.iterrows():
        x = np.sort(df.loc[df["g"] == row["g"], "v"].to_numpy())
        n = len(x)
        k = int(np.floor(0.05 * n))
        kept = x[k:n - k]
        assert row["n"] == n and row["n_used"] == len(kept)
        assert abs(row["trimmed_mean"] - round(kept.mean(), 6)) < 2e-6
        assert row["trimmed_mean"] < 200  # outliers trimmed away


def test_grouped_linear_fit_matches_numpy(ray_session):
    from raysketch.ops.stats import grouped_linear_fit

    rng = np.random.default_rng(17)
    n = 3000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], n),
        "x": rng.integers(1, 50, n).astype(np.float64)})
    df["y"] = np.floor((df["x"] * 12.5
                        + rng.normal(0, 30, n)) * 100 + 0.5) / 100
    out = grouped_linear_fit(_mk(df, 6), "g", "x", "y",
                             y_scale=100).to_pandas()
    for _, row in out.iterrows():
        sub = df[df["g"] == row["g"]]
        sl, ic = np.polyfit(sub["x"], sub["y"], 1)
        r = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert abs(row["slope"] - sl) < 1e-6
        assert abs(row["intercept"] - ic) < 1e-6
        assert abs(row["r2"] - r * r) < 1e-6


def test_grouped_linear_fit_block_invariance(ray_session):
    from raysketch.ops.stats import grouped_linear_fit

    rng = np.random.default_rng(18)
    df = pd.DataFrame({"g": ["z"] * 400,
                       "x": rng.integers(0, 9, 400).astype(np.float64)})
    df["y"] = np.floor(rng.uniform(0, 5, 400) * 100 + 0.5) / 100
    a = grouped_linear_fit(_mk(df, 1), "g", "x", "y", 100).to_pandas()
    b = grouped_linear_fit(_mk(df, 9), "g", "x", "y", 100).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # exact int sums → bit-identical


def test_chunked_int_sum_exact_beyond_int64():
    from raysketch.ops.stats import _chunked_int_sum

    a = np.full(2000, 9_000_000_000_000_000, dtype=np.int64)
    assert _chunked_int_sum(a, chunk=1000) == 9_000_000_000_000_000 * 2000


def test_fk_orphan_counts_routes_identical(ray_session):
    from raysketch.ops.setops import fk_orphan_counts_multi

    rng = np.random.default_rng(22)
    child = pd.DataFrame({"fk": rng.integers(0, 120, 3000)})
    parent = pd.DataFrame({"pk": np.arange(0, 100, dtype=np.int64)})
    edges = [("e", _mk(child, 6), "fk", _mk(parent, 3), "pk")]
    a = fk_orphan_counts_multi(edges)
    edges = [("e", _mk(child, 6), "fk", _mk(parent, 3), "pk")]
    b = fk_orphan_counts_multi(edges, driver_fold_limit=0)  # shuffle route
    assert a == b
    orphan = child[child["fk"] >= 100]
    assert a["e"] == (len(orphan), orphan["fk"].nunique())


def test_melt_inverts_pivot_shape(ray_session):
    from raysketch.ops.reshape import melt

    df = pd.DataFrame({"id": [1, 2, 3],
                       "a": [1.5, 2.0, -3.25],
                       "b": [0.0, 7.0, 9.5]})
    out = (melt(_mk(df, 2), "id", ["a", "b"]).to_pandas()
           .sort_values(["name", "id"]).reset_index(drop=True))
    assert len(out) == 6
    assert list(out.columns) == ["id", "name", "value"]
    for _, row in out.iterrows():
        assert row["value"] == df.set_index("id").loc[row["id"], row["name"]]
