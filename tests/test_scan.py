"""running_scan (ops/scan.py) — distributed ordered per-key window
functions: brute-force parity, route identity (hash vs sorted prefix
scan), block-count invariance, hot keys spanning many blocks, ties on
the order value, and the -1 first-row delta sentinel."""

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.scan import running_scan


def _mk_ds(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    """Row-at-a-time reference: seq / running / delta per key in
    (o, uid) order."""
    rows = []
    for k, g in df.sort_values(["k", "o", "uid"]).groupby("k"):
        run = 0
        prev_o = None
        for i, (_, r) in enumerate(g.iterrows(), start=1):
            run += int(r["v"])
            rows.append(
                {
                    "k": k,
                    "uid": r["uid"],
                    "o": r["o"],
                    "v": r["v"],
                    "seq": i,
                    "running": run,
                    "delta": -1 if prev_o is None else int(r["o"]) - prev_o,
                }
            )
            prev_o = int(r["o"])
    return (
        pd.DataFrame(rows)
        .sort_values(["k", "seq"])
        .reset_index(drop=True)
        .astype({c: "int64" for c in ["k", "uid", "o", "v", "seq", "running", "delta"]})
    )


def _run(ds, route):
    out = running_scan(ds, "k", ["o", "uid"], "v", route=route).to_pandas()
    cols = ["k", "uid", "o", "v", "seq", "running", "delta"]
    return (
        out[cols]
        .sort_values(["k", "seq"])
        .reset_index(drop=True)
        .astype({c: "int64" for c in cols})
    )


@pytest.fixture()
def frame():
    rng = np.random.default_rng(11)
    n, n_keys = 600, 9
    df = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n).astype(np.int64),
            "uid": np.arange(n, dtype=np.int64),
            # coarse order values force ties within a key (uid tiebreak)
            "o": rng.integers(0, 40, n).astype(np.int64),
            "v": rng.integers(-50, 200, n).astype(np.int64),
        }
    )
    return df


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("route", ["hash", "sorted"])
def test_parity_vs_brute_force(frame, route):
    got = _run(_mk_ds(frame), route)
    pd.testing.assert_frame_equal(got, _brute(frame))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("parallelism", [1, 3, 8])
def test_block_count_invariance(frame, parallelism):
    got_h = _run(_mk_ds(frame, parallelism), "hash")
    got_s = _run(_mk_ds(frame, parallelism), "sorted")
    expect = _brute(frame)
    pd.testing.assert_frame_equal(got_h, expect)
    pd.testing.assert_frame_equal(got_s, expect)


@pytest.mark.usefixtures("ray_session")
def test_hot_key_spans_blocks():
    """One key holds 90% of rows: the sorted route must stitch its
    running sums across many blocks via the prefix offsets."""
    rng = np.random.default_rng(3)
    n = 1000
    k = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 3, n)).astype(np.int64)
    df = pd.DataFrame(
        {
            "k": k,
            "uid": np.arange(n, dtype=np.int64),
            "o": rng.integers(0, 10_000, n).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    expect = _brute(df)
    pd.testing.assert_frame_equal(_run(_mk_ds(df, 8), "sorted"), expect)
    pd.testing.assert_frame_equal(_run(_mk_ds(df, 8), "hash"), expect)


@pytest.mark.usefixtures("ray_session")
def test_one_key_many_blocks_chain():
    """A single key across MANY blocks exercises the sorted route's
    one-chain carry fold (every block is a single-key block)."""
    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame({
        "k": np.full(n, 5, dtype=np.int64),
        "uid": np.arange(n, dtype=np.int64),
        "o": rng.integers(0, 10_000, n).astype(np.int64),
        "v": rng.integers(-30, 60, n).astype(np.int64),
    })
    expect = _brute(df)
    pd.testing.assert_frame_equal(_run(_mk_ds(df, 10), "sorted"), expect)


@pytest.mark.usefixtures("ray_session")
def test_empty_input_keeps_output_contract():
    """Both routes must emit the scan columns on empty input."""
    import ray.data as rd

    empty = pd.DataFrame({
        "k": pd.Series([], dtype="int64"),
        "uid": pd.Series([], dtype="int64"),
        "o": pd.Series([], dtype="int64"),
        "v": pd.Series([], dtype="int64"),
    })
    ds = rd.from_pandas(empty)
    # the contract is at SCHEMA level: Dataset.to_pandas() on any
    # zero-row dataset drops columns (Ray-wide; see queries._pairs_df)
    for route in ("hash", "sorted"):
        out = running_scan(ds, "k", ["o", "uid"], "v", route=route)
        assert out.count() == 0
        names = out.schema().names
        for c in ("k", "uid", "o", "v", "seq", "running", "delta"):
            assert c in names, (route, names)
    from raysketch.ops.scan import rolling_scan

    roll = rolling_scan(ds, "k", ["o", "uid"], "v", 3)
    assert roll.count() == 0
    for c in ("roll_sum", "roll_min", "roll_max", "roll_n"):
        assert c in roll.schema().names


@pytest.mark.usefixtures("ray_session")
def test_single_row_groups_and_negative_sums():
    df = pd.DataFrame(
        {
            "k": np.array([1, 2, 3], dtype=np.int64),
            "uid": np.array([10, 20, 30], dtype=np.int64),
            "o": np.array([5, 5, 5], dtype=np.int64),
            "v": np.array([-7, 0, 7], dtype=np.int64),
        }
    )
    for route in ("hash", "sorted"):
        got = _run(_mk_ds(df, 2), route)
        assert got["seq"].tolist() == [1, 1, 1]
        assert got["running"].tolist() == [-7, 0, 7]
        assert got["delta"].tolist() == [-1, -1, -1]


def test_unknown_route_raises():
    with pytest.raises(ValueError):
        running_scan(None, "k", ["o"], "v", route="nope")


def _roll_brute(df: pd.DataFrame, w: int) -> pd.DataFrame:
    rows = []
    for k, g in df.sort_values(["k", "o", "uid"]).groupby("k"):
        vals = []
        for _, r in g.iterrows():
            vals.append(int(r["v"]))
            fr = vals[-w:]
            rows.append(
                {"k": k, "uid": r["uid"], "roll_sum": sum(fr),
                 "roll_min": min(fr), "roll_max": max(fr), "roll_n": len(fr)}
            )
    return (
        pd.DataFrame(rows).sort_values(["k", "uid"]).reset_index(drop=True)
        .astype("int64")
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("w", [1, 4, 100])
def test_rolling_parity_vs_brute_force(frame, w):
    from raysketch.ops.scan import rolling_scan

    out = rolling_scan(_mk_ds(frame), "k", ["o", "uid"], "v", w).to_pandas()
    cols = ["k", "uid", "roll_sum", "roll_min", "roll_max", "roll_n"]
    got = (
        out[cols].sort_values(["k", "uid"]).reset_index(drop=True).astype("int64")
    )
    pd.testing.assert_frame_equal(got, _roll_brute(frame, w))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("k", [1, 3, 4, 7])
def test_rank_scan_ntile_vs_brute(frame, k):
    from raysketch.ops.scan import rank_scan

    out = rank_scan(_mk_ds(frame), "k", ["o", "uid"], n_tiles=k).to_pandas()
    out = out.sort_values(["k", "rank"]).reset_index(drop=True)
    for key, g in out.groupby("k"):
        n = len(g)
        # ranks are 1..n
        assert g["rank"].tolist() == list(range(1, n + 1))
        # ntile: first n%k tiles have ceil(n/k) rows, the rest floor
        sizes = g["tile"].value_counts().sort_index()
        big, rem = n // k, n % k
        expect = [big + 1] * rem + [big] * (min(k, n) - rem if big else 0)
        assert sizes.tolist() == [s for s in expect if s > 0]
        # percent_rank / cume_dist closed forms on the total order
        r = g["rank"].to_numpy()
        if n > 1:
            assert np.allclose(g["percent_rank"], np.round((r - 1) / (n - 1), 6),
                               atol=1e-9)
        else:
            assert g["percent_rank"].tolist() == [0.0]
        assert np.allclose(g["cume_dist"], np.round(r / n, 6), atol=1e-9)


def test_rank_scan_bad_tiles_raises():
    from raysketch.ops.scan import rank_scan

    with pytest.raises(ValueError):
        rank_scan(None, "k", ["o"], n_tiles=0)


def test_rolling_bad_window_raises():
    from raysketch.ops.scan import rolling_scan

    with pytest.raises(ValueError):
        rolling_scan(None, "k", ["o"], "v", 0)
