"""ops/funnel.py — ordered-sequence funnel: brute-force parity on random
event streams, strict-after boundary, absent stages, block invariance."""

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.funnel import funnel


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


def _brute(df: pd.DataFrame, stages):
    counts = []
    reach = {}
    for i, st in enumerate(stages):
        cur = {}
        for u, g in df[df["event_type"] == st].groupby("user_id"):
            if i == 0:
                cur[u] = g["ts"].min()
            elif u in reach:
                after = g[g["ts"] > reach[u]]
                if len(after):
                    cur[u] = after["ts"].min()
        reach = cur
        counts.append((i + 1, st, len(cur)))
    return counts


def _run(ds, stages):
    out = funnel(ds, "user_id", "ts", "event_type", stages).to_pandas()
    return list(out.itertuples(index=False, name=None))


@pytest.fixture()
def stream():
    rng = np.random.default_rng(17)
    n = 2000
    return pd.DataFrame({
        "user_id": rng.integers(0, 80, n).astype(np.int64),
        "ts": rng.integers(0, 100_000, n).astype(np.int64),
        "event_type": rng.choice(
            ["view", "click", "purchase", "noise"], n, p=[0.4, 0.3, 0.1, 0.2]
        ),
    })


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("parallelism", [1, 4, 9])
def test_parity_vs_brute_force(stream, parallelism):
    stages = ["view", "click", "purchase"]
    assert _run(_mk(stream, parallelism), stages) == _brute(stream, stages)


@pytest.mark.usefixtures("ray_session")
def test_strict_after_boundary():
    # click at exactly the view time does NOT count; one later does
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 2, 2], dtype=np.int64),
        "ts": np.array([10, 10, 10, 11], dtype=np.int64),
        "event_type": ["view", "click", "view", "click"],
    })
    got = _run(_mk(df, 2), ["view", "click"])
    assert got == [(1, "view", 2), (2, "click", 1)]


@pytest.mark.usefixtures("ray_session")
def test_absent_stage_zeroes_tail(stream):
    got = _run(_mk(stream), ["view", "never_happens", "click"])
    assert got[0][2] > 0
    assert got[1] == (2, "never_happens", 0)
    assert got[2] == (3, "click", 0)


@pytest.mark.usefixtures("ray_session")
def test_no_matching_events_yields_zero_rows_per_stage(stream):
    """The oracle contract: stages with no reachable users still appear
    with n_users = 0 — even when NO event matches ANY stage (the empty
    groupby would otherwise lose the schema entirely)."""
    got = _run(_mk(stream), ["ghost1", "ghost2"])
    assert got == [(1, "ghost1", 0), (2, "ghost2", 0)]

    empty = stream.iloc[0:0]
    got = _run(_mk(empty, 1), ["view", "click"])
    assert got == [(1, "view", 0), (2, "click", 0)]


def test_bad_stages_raise():
    with pytest.raises(ValueError):
        funnel(None, "u", "t", "e", [])
    with pytest.raises(ValueError):
        funnel(None, "u", "t", "e", ["a", "a"])


@pytest.mark.usefixtures("ray_session")
def test_assoc_rules_brute_parity_users_span_blocks():
    import ray.data as rd

    from raysketch.ops.funnel import assoc_rules

    rng = np.random.default_rng(3)
    items = np.array(["a", "b", "c", "d"])
    # interleave users so every user's events span many blocks
    users = np.tile(np.arange(12, dtype=np.int64), 15)
    its = rng.choice(items, size=len(users))
    df = pd.DataFrame({"user_id": users, "event_type": its})
    got = assoc_rules(rd.from_pandas(df).repartition(9)).to_pandas()

    # brute force
    baskets = df.drop_duplicates().groupby("user_id")["event_type"] \
        .agg(set)
    N = len(baskets)
    cnt = {i: sum(1 for s in baskets if i in s) for i in items}
    rows = []
    for a in sorted(items):
        for b in sorted(items):
            if a == b:
                continue
            cab = sum(1 for s in baskets if a in s and b in s)
            if cab == 0:
                continue
            rows.append((a, b, cab, cab / N, cab / cnt[a],
                         (cab * N) / (cnt[a] * cnt[b])))
    assert [tuple(r[:3]) for r in rows] == \
        list(got[["a", "b", "n_ab"]].itertuples(index=False, name=None))
    r6 = lambda x: np.floor(abs(x) * 1e6 + 0.5) / 1e6 * np.sign(x)
    np.testing.assert_array_equal(got["support"], [r6(r[3]) for r in rows])
    np.testing.assert_array_equal(got["confidence"],
                                  [r6(r[4]) for r in rows])
    np.testing.assert_array_equal(got["lift"], [r6(r[5]) for r in rows])


@pytest.mark.usefixtures("ray_session")
def test_cohort_retention_brute_parity():
    import ray.data as rd

    from raysketch.ops.funnel import cohort_retention

    rng = np.random.default_rng(5)
    WEEK = 604_800_000_000
    rows = []
    for u in range(25):
        first = rng.integers(0, 4)
        for w in sorted({first} | set(rng.integers(first, 8,
                                                   size=rng.integers(1, 6)))):
            # a couple of events inside the week, any offset
            for _ in range(rng.integers(1, 3)):
                rows.append((u, w * WEEK + int(rng.integers(0, WEEK))))
    df = pd.DataFrame(rows, columns=["user_id", "ts_us"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    got = cohort_retention(
        rd.from_pandas(df[["user_id", "ts"]]).repartition(6)).to_pandas()

    # brute force
    uw = df.assign(w=df["ts_us"] // WEEK)[["user_id", "w"]] \
        .drop_duplicates()
    cw = uw.groupby("user_id")["w"].min().rename("cw")
    j = uw.join(cw, on="user_id")
    j["off"] = j["w"] - j["cw"]
    exp = j.groupby(["cw", "off"]).size().rename("n_active").reset_index()
    sz = exp[exp["off"] == 0].set_index("cw")["n_active"]
    exp["cohort_size"] = sz.reindex(exp["cw"]).to_numpy()
    exp = exp.sort_values(["cw", "off"]).reset_index(drop=True)
    assert got["cohort_week"].tolist() == exp["cw"].tolist()
    assert got["week_offset"].tolist() == exp["off"].tolist()
    assert got["n_active"].tolist() == exp["n_active"].tolist()
    assert got["cohort_size"].tolist() == exp["cohort_size"].tolist()
    r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6
    np.testing.assert_array_equal(
        got["retention"],
        r6(exp["n_active"].to_numpy(float) / exp["cohort_size"].to_numpy(float)))
    # offset-0 retention is exactly 1.0 for every cohort
    assert (got.loc[got["week_offset"] == 0, "retention"] == 1.0).all()
