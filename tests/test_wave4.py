"""Fourth-session round-4 ops: skyline Pareto front, mutual_info
micro-nats, sliding_distinct HLL window reuse, dsir_select importance
resampling. Brute-force/exact parities + edge cases; end-to-end SQL
parity runs in test_oracle_parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raysketch.ops.curate import dsir_select
from raysketch.ops.setops import _pareto_front, skyline
from raysketch.ops.stats import mutual_info
from raysketch.ops.window import sliding_distinct


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------

def _brute_front(X: np.ndarray) -> set[int]:
    keep = set()
    for i in range(len(X)):
        dominated = False
        for j in range(len(X)):
            if i == j:
                continue
            if (X[j] >= X[i]).all() and (X[j] > X[i]).any():
                dominated = True
                break
        if not dominated:
            keep.add(i)
    return keep


def test_pareto_kernel_matches_brute_force():
    rng = np.random.default_rng(7)
    for d in (1, 2, 3, 4):
        X = rng.integers(0, 12, size=(400, d)).astype(np.float64)
        got = set(_pareto_front(X, chunk=64).tolist())
        assert got == _brute_front(X), f"d={d}"


def test_pareto_duplicates_all_survive():
    # duplicate points never strictly dominate each other: every copy
    # of a front point must survive (SQL NOT-EXISTS semantics)
    X = np.array([[5.0, 5.0], [5.0, 5.0], [1.0, 1.0], [5.0, 1.0]])
    got = set(_pareto_front(X).tolist())
    assert got == {0, 1}


def test_pareto_empty():
    assert _pareto_front(np.zeros((0, 3))).size == 0


@pytest.mark.usefixtures("ray_session")
def test_skyline_min_max_mix_matches_brute():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "id": np.arange(500, dtype=np.int64),
        "a": rng.integers(0, 20, 500).astype(np.int64),  # maximize
        "b": rng.integers(0, 20, 500).astype(np.int64),  # minimize
    })
    out = skyline(_mk(df, 6), {"a": True, "b": False}, keep_cols=["id"])
    X = np.column_stack([df["a"].to_numpy(np.float64),
                         -df["b"].to_numpy(np.float64)])
    want = sorted(df["id"].iloc[sorted(_brute_front(X))].tolist())
    got = out["id"].to_pylist()
    assert got == want
    # dims ride along with their raw values
    assert set(out.column_names) == {"id", "a", "b"}


# ---------------------------------------------------------------------------
# mutual_info
# ---------------------------------------------------------------------------

def _mi_direct(a: list, b: list) -> dict[str, int]:
    df = pd.DataFrame({"a": a, "b": b}).astype(str)
    cells = df.groupby(["a", "b"]).size()
    n = len(df)
    ca = df.groupby("a").size()
    cb = df.groupby("b").size()

    def micro(x: float) -> int:
        return int(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5))

    mi = sum(micro(c * np.log(n * c / (ca[i[0]] * cb[i[1]])))
             for i, c in cells.items())
    h_a = sum(micro(c * np.log(n / c)) for c in ca)
    h_b = sum(micro(c * np.log(n / c)) for c in cb)
    return {"n": n, "mi_micro_nats": mi,
            "h_a_micro_nats": h_a, "h_b_micro_nats": h_b}


@pytest.mark.usefixtures("ray_session")
def test_mutual_info_matches_direct():
    rng = np.random.default_rng(3)
    a = rng.choice(["x", "y", "z"], 800).tolist()
    # b correlates with a on half the rows
    b = [ai if rng.random() < 0.5 else rng.choice(["x", "y", "z", "w"])
         for ai in a]
    got = mutual_info(_mk(pd.DataFrame({"a": a, "b": b}), 5), "a", "b")
    assert got == _mi_direct(a, b)
    assert got["mi_micro_nats"] > 0


@pytest.mark.usefixtures("ray_session")
def test_mutual_info_independent_and_identical():
    # identical columns: MI == both entropies (up to per-cell rounding)
    a = (["u"] * 10 + ["v"] * 30 + ["w"] * 60)
    got = mutual_info(_mk(pd.DataFrame({"a": a, "b": a}), 3), "a", "b")
    assert got["mi_micro_nats"] == got["h_a_micro_nats"]
    assert got["h_a_micro_nats"] == got["h_b_micro_nats"]
    # constant column: zero entropy, zero MI
    got = mutual_info(
        _mk(pd.DataFrame({"a": a, "b": ["k"] * len(a)}), 3), "a", "b")
    assert got["mi_micro_nats"] == 0
    assert got["h_b_micro_nats"] == 0


@pytest.mark.usefixtures("ray_session")
def test_mutual_info_empty_raises():
    ds = _mk(pd.DataFrame({"a": pd.Series([], dtype=str),
                           "b": pd.Series([], dtype=str)}), 1)
    with pytest.raises(ValueError, match="empty"):
        mutual_info(ds, "a", "b")


# ---------------------------------------------------------------------------
# sliding_distinct
# ---------------------------------------------------------------------------

def _mk_events(n: int, n_users: int, hours: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = 400_000 * 3_600_000_000  # epoch-us at an arbitrary hour
    us = base + rng.integers(0, hours * 3_600_000_000, n)
    return pd.DataFrame({
        "ts": pd.to_datetime(np.sort(us), unit="us"),
        "uid": rng.integers(0, n_users, n).astype(np.int64),
    })


@pytest.mark.usefixtures("ray_session")
def test_sliding_distinct_sparse_exact():
    df = _mk_events(3000, 80, hours=70, seed=9)
    out = sliding_distinct(_mk(df, 6), "ts", "uid",
                           window_hours=24, slide_hours=6).to_pandas()
    hour = (df["ts"].astype("int64") // 1000) // 3_600_000_000
    h0 = int(hour.min())
    want = []
    for ws in range(h0, int(hour.max()) + 1, 6):
        m = (hour >= ws) & (hour < ws + 24)
        if m.any():
            want.append((ws, int(m.sum()), df.loc[m, "uid"].nunique()))
    assert list(map(tuple, out.itertuples(index=False))) == want


@pytest.mark.usefixtures("ray_session")
def test_sliding_distinct_gap_drops_empty_windows():
    # two event bursts 90 hours apart, window 4 / slide 4: the gap's
    # windows must be absent, not zero-rows
    base = 500_000 * 3_600_000_000
    us = np.array([0, 1, 2, 90 * 3_600_000_000,
                   90 * 3_600_000_000 + 5]) + base
    df = pd.DataFrame({"ts": pd.to_datetime(us, unit="us"),
                       "uid": np.array([1, 2, 1, 3, 3], dtype=np.int64)})
    out = sliding_distinct(_mk(df, 2), "ts", "uid",
                           window_hours=4, slide_hours=4).to_pandas()
    assert out["window_start"].tolist() == [500_000, 500_088]
    assert out["n_events"].tolist() == [3, 2]
    assert out["distinct_keys"].tolist() == [2, 1]


@pytest.mark.usefixtures("ray_session")
def test_sliding_distinct_validates_args():
    df = _mk_events(10, 3, hours=2, seed=1)
    with pytest.raises(ValueError):
        sliding_distinct(_mk(df, 1), "ts", "uid", window_hours=0)


# ---------------------------------------------------------------------------
# dsir_select
# ---------------------------------------------------------------------------

def _mk_docs() -> pd.DataFrame:
    # target (lang=en) docs say "alpha beta", raw background says
    # "gamma delta"; a mixed doc sits between
    rows = []
    for i in range(40):
        rows.append((i, "en", "alpha beta alpha"))
    for i in range(40, 80):
        rows.append((i, "de", "gamma delta gamma"))
    rows.append((80, "de", "alpha gamma"))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


@pytest.mark.usefixtures("ray_session")
def test_dsir_ranks_target_like_docs_first():
    df = _mk_docs()
    out = dsir_select(lambda: _mk(df, 4), "lang", "en",
                      n_buckets=64, top_k=81).to_pandas()
    assert len(out) == 81
    scores = dict(zip(out["doc_id"], out["dsir_micro_nats"]))
    # every en doc outscores every pure-de doc; the mixed doc lands
    # strictly between
    assert min(scores[i] for i in range(40)) > scores[80]
    assert scores[80] > max(scores[i] for i in range(40, 80))
    # ties broken by doc_id ascending within equal scores
    en_block = out.head(40)
    assert en_block["doc_id"].tolist() == sorted(en_block["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_dsir_top_k_and_validation():
    df = _mk_docs()
    out = dsir_select(lambda: _mk(df, 4), "lang", "en",
                      n_buckets=32, top_k=5).to_pandas()
    assert len(out) == 5
    assert set(out["doc_id"]) <= set(range(40))
    with pytest.raises(ValueError, match="target"):
        dsir_select(lambda: _mk(df, 2), "lang", "zz", top_k=3)
    with pytest.raises(ValueError):
        dsir_select(lambda: _mk(df, 2), "lang", "en", top_k=0)
