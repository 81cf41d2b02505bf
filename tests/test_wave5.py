"""Fifth-session round-4 ops: Benford profile, Flesch readability,
triangle counting, z-order layout. Kernel-level brute-force parities +
edge cases; end-to-end SQL parity runs in test_oracle_parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raysketch.ops.curate import write_zorder_shards, zorder_keys
from raysketch.ops.graph import cooccurrence_edges, triangle_count
from raysketch.ops.rules import readability_scores
from raysketch.ops.stats import BENFORD_MICRO, benford_profile


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


# ---------------------------------------------------------------------------
# benford_profile
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_benford_matches_direct_and_drops_nonpositive():
    rng = np.random.default_rng(5)
    # log-uniform magnitudes -> roughly Benford; sprinkle zeros/negatives
    x = np.exp(rng.uniform(0, 10, 2000))
    x[:25] = 0.0
    x[25:50] = -3.5
    out = benford_profile(_mk(pd.DataFrame({"v": x}), 6), "v").to_pandas()
    cents = np.floor(x * 100 + 0.5).astype(np.int64)
    cents = cents[cents > 0]
    first = np.array([int(str(c)[0]) for c in cents])
    want = np.bincount(first, minlength=10)[1:10]
    assert out["digit"].tolist() == list(range(1, 10))
    assert out["n_obs"].tolist() == want.tolist()
    n = int(want.sum())
    assert out["exp_micro"].tolist() == (n * BENFORD_MICRO).tolist()
    e = (n * BENFORD_MICRO).astype(np.float64) / 1e6
    term = (want.astype(np.float64) - e) ** 2 / e
    chi = (np.sign(term) * np.floor(np.abs(term) * 1e6 + 0.5)).astype(int)
    assert out["chi_micro"].tolist() == chi.tolist()


@pytest.mark.usefixtures("ray_session")
def test_benford_all_rows_dropped_gives_zero_profile():
    out = benford_profile(
        _mk(pd.DataFrame({"v": [0.0, -1.0, 0.001]}), 1), "v").to_pandas()
    # 0.001 scales to 0 cents -> dropped too
    assert out["n_obs"].sum() == 0
    assert (out["chi_micro"] == 0).all()
    assert (out["exp_micro"] == 0).all()


# ---------------------------------------------------------------------------
# readability_scores
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_readability_hand_computed():
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [
            "The cat sat. It sat!",   # 5 words, 2 sentences, 5 vgroups
            "tsk tsk",                # no vowels: syllable clamp, sent>=1
            "Hello world",            # 2 words, 0 punct -> 1 sentence
        ]})
    out = readability_scores(_mk(docs, 2), "doc_id", "text") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_words"].tolist() == [5, 2, 2]
    assert out["n_sentences"].tolist() == [2, 1, 1]
    # doc1: zero vowel groups but 2 words -> 2 clamped syllables
    assert out["n_syllables"].tolist() == [5, 2, 3]
    w, s, sy = 5.0, 2.0, 5.0
    want = 206.835 - 1.015 * (w / s) - 84.6 * (sy / w)
    want = np.floor(abs(want) * 1e6 + 0.5) / 1e6 * np.sign(want)
    assert out["flesch"][0] == want


@pytest.mark.usefixtures("ray_session")
def test_readability_drops_wordless_docs():
    docs = pd.DataFrame({"doc_id": np.array([1, 2], dtype=np.int64),
                         "text": ["   ", "one. two."]})
    out = readability_scores(_mk(docs, 1), "doc_id", "text").to_pandas()
    assert out["doc_id"].tolist() == [2]


# ---------------------------------------------------------------------------
# triangle_count / cooccurrence_edges
# ---------------------------------------------------------------------------

def _brute_triangles(edges: set[tuple[int, int]]):
    nodes = sorted({n for e in edges for n in e})
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = 0
    for u, v in edges:
        tri += len(adj[u] & adj[v])
    wedges = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes)
    return len(nodes), len(edges), tri // 3, wedges


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_matches_brute_force():
    rng = np.random.default_rng(2)
    u = rng.integers(0, 40, 600).astype(np.int64)
    v = rng.integers(0, 40, 600).astype(np.int64)
    out = triangle_count(
        _mk(pd.DataFrame({"a": u, "b": v}), 5), "a", "b").to_pandas()
    edges = {(min(a, b), max(a, b)) for a, b in zip(u, v) if a != b}
    nn, ne, nt, nw = _brute_triangles(edges)
    assert out.iloc[0].tolist() == [nn, ne, nt, nw]


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_self_loops_and_dups_ignored():
    df = pd.DataFrame({"a": np.array([1, 1, 2, 3, 1], dtype=np.int64),
                       "b": np.array([2, 2, 3, 1, 1], dtype=np.int64)})
    out = triangle_count(_mk(df, 2), "a", "b").to_pandas()
    # edges {1-2, 2-3, 1-3}: one triangle, 3 wedges
    assert out.iloc[0].tolist() == [3, 3, 1, 3]


@pytest.mark.usefixtures("ray_session")
def test_cooccurrence_edges_pairs_per_group():
    df = pd.DataFrame({
        "g": np.array([1, 1, 1, 2, 2, 2, 2], dtype=np.int64),
        "i": np.array([10, 11, 10, 20, 21, 22, 20], dtype=np.int64)})
    out = (cooccurrence_edges(_mk(df, 3), "g", "i").to_pandas()
           .sort_values(["u", "v"]).reset_index(drop=True))
    # group1 members {10,11} -> (10,11); group2 {20,21,22} -> 3 pairs
    want = [(10, 11), (20, 21), (20, 22), (21, 22)]
    assert list(map(tuple, out.itertuples(index=False))) == want


# ---------------------------------------------------------------------------
# z-order layout
# ---------------------------------------------------------------------------

def test_zorder_keys_interleave_reference():
    rng = np.random.default_rng(8)
    a = rng.integers(1, 500, 300).astype(np.int64)
    b = rng.integers(1, 90, 300).astype(np.int64)
    z = zorder_keys(a, b, 1, 499, 1, 89, bits=8)

    def ref(av, bv):
        ba = (av - 1) * 256 // 499
        bb = (bv - 1) * 256 // 89
        out = 0
        for i in range(8):
            out |= ((ba >> i) & 1) << (2 * i + 1)
            out |= ((bb >> i) & 1) << (2 * i)
        return out

    assert z.tolist() == [ref(x, y) for x, y in zip(a, b)]
    assert z.min() >= 0 and z.max() < 1 << 16


@pytest.mark.usefixtures("ray_session")
def test_write_zorder_shards_locality_and_validation(tmp_path):
    from raysketch.engine.sinks import read_back

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "a": rng.integers(0, 1000, 4000).astype(np.int64),
        "b": rng.integers(0, 1000, 4000).astype(np.int64),
    })
    root, (alo, ahi, blo, bhi) = write_zorder_shards(
        _mk(df, 4), str(tmp_path / "z"), "a", "b", bits=8, n_shards=8)
    assert (alo, ahi, blo, bhi) == (df["a"].min(), df["a"].max(),
                                    df["b"].min(), df["b"].max())
    back = read_back(root).to_pandas()
    back["shard"] = back["shard"].astype("int64")
    assert len(back) == len(df)
    # routing is exactly z >> 13, and shards are contiguous z-ranges
    z = zorder_keys(back["a"].to_numpy(np.int64),
                    back["b"].to_numpy(np.int64),
                    int(alo), int(ahi), int(blo), int(bhi), bits=8)
    assert (back["shard"].to_numpy(np.int64) == (z >> 13)).all()
    # z-order locality: every shard's a-range and b-range must each
    # span at most half the domain (one leading bit is fixed per axis
    # after 3 shard bits... top shard bits pin a's top bits 2:1)
    g = back.groupby("shard")
    assert g.ngroups == 8
    for _, sub in g:
        za = zorder_keys(sub["a"].to_numpy(np.int64),
                         sub["b"].to_numpy(np.int64),
                         int(alo), int(ahi), int(blo), int(bhi), 8)
        lo, hi = int(za.min()) >> 13, int(za.max()) >> 13
        assert lo == hi
    with pytest.raises(ValueError, match="power of two"):
        write_zorder_shards(_mk(df, 2), str(tmp_path / "z2"), "a", "b",
                            n_shards=6)
    with pytest.raises(ValueError, match="exceeds"):
        write_zorder_shards(_mk(df, 2), str(tmp_path / "z3"), "a", "b",
                            bits=1, n_shards=32)


# ---------------------------------------------------------------------------
# sliding_topk
# ---------------------------------------------------------------------------

def _mk_events(n: int, n_users: int, hours: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = 400_000 * 3_600_000_000
    us = base + rng.integers(0, hours * 3_600_000_000, n)
    return pd.DataFrame({
        "ts": pd.to_datetime(np.sort(us), unit="us"),
        "uid": rng.integers(0, n_users, n).astype(np.int64),
    })


@pytest.mark.usefixtures("ray_session")
def test_sliding_topk_matches_brute_force():
    from raysketch.ops.window import sliding_topk

    df = _mk_events(4000, 60, hours=60, seed=13)
    out = sliding_topk(_mk(df, 5), "ts", "uid", window_hours=24,
                       slide_hours=6, top_n=4).to_pandas()
    hour = (df["ts"].astype("int64") // 1000) // 3_600_000_000
    want = []
    for ws in range(int(hour.min()), int(hour.max()) + 1, 6):
        m = (hour >= ws) & (hour < ws + 24)
        if not m.any():
            continue
        vc = (df.loc[m].groupby("uid").size().rename("n").reset_index()
              .sort_values(["n", "uid"], ascending=[False, True]).head(4))
        for r, (u, n) in enumerate(zip(vc["uid"], vc["n"]), 1):
            want.append((ws, r, int(u), int(n)))
    assert list(map(tuple, out.itertuples(index=False))) == want


@pytest.mark.usefixtures("ray_session")
def test_sliding_topk_validates():
    from raysketch.ops.window import sliding_topk

    df = _mk_events(10, 3, hours=2, seed=1)
    with pytest.raises(ValueError):
        sliding_topk(_mk(df, 1), "ts", "uid", top_n=0)


# ---------------------------------------------------------------------------
# compact_dataset
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_compact_dataset_preserves_rows(tmp_path):
    from raysketch.engine.sinks import (compact_dataset, parquet_files,
                                        read_back, write_dataset)

    df = pd.DataFrame({"x": np.arange(5000, dtype=np.int64)})
    write_dataset(_mk(df, 16), str(tmp_path / "small"))
    assert len(parquet_files(str(tmp_path / "small"))) == 16
    info = compact_dataset(str(tmp_path / "small"),
                           str(tmp_path / "big"), target_files=2)
    assert info["files_before"] == 16
    assert info["files_after"] <= 2
    assert info["n_rows"] == 5000
    back = read_back(str(tmp_path / "big")).to_pandas()
    assert sorted(back["x"]) == list(range(5000))
    with pytest.raises(ValueError):
        compact_dataset(str(tmp_path / "small"),
                        str(tmp_path / "big2"), target_files=0)


# ---------------------------------------------------------------------------
# incremental_moments
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_incremental_equals_full_recompute(tmp_path):
    from raysketch.ops.stats import grouped_moments, incremental_moments

    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 3000),
        "v": rng.integers(-40, 41, 3000).astype(np.int64)})
    full = grouped_moments(_mk(df, 4), "g", "v").to_pandas()
    state = str(tmp_path / "state.parquet")
    # three arbitrary increments, any split boundary
    out = None
    for lo, hi in ((0, 1100), (1100, 1101), (1101, 3000)):
        out = incremental_moments(
            state, _mk(df.iloc[lo:hi], 3), "g", "v").to_pandas()
    # bit-identical to one full recompute (order-free integer sums)
    pd.testing.assert_frame_equal(out, full)
    # state file holds exactly the folded power sums
    import pyarrow.parquet as pq

    st = pq.read_table(state).to_pandas()
    assert st["n"].sum() == 3000
    assert (st["s1"].sum()) == df["v"].sum()


@pytest.mark.usefixtures("ray_session")
def test_incremental_rejects_noninteger(tmp_path):
    from raysketch.ops.stats import incremental_moments

    df = pd.DataFrame({"g": ["a"], "v": [1.5]})
    with pytest.raises(Exception, match="integer"):
        incremental_moments(str(tmp_path / "s.parquet"),
                            _mk(df, 1), "g", "v")


# ---------------------------------------------------------------------------
# weighted_quantiles
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_weighted_quantiles_matches_expansion():
    import math

    from raysketch.ops.stats import weighted_quantiles

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "v": rng.integers(0, 50, 800).astype(np.int64),
        "w": rng.integers(0, 7, 800).astype(np.int64)})
    qs = [0.01, 0.5, 0.9, 1.0]
    out = weighted_quantiles(_mk(df, 4), "v", "w", qs).to_pandas()
    # expand to the weighted multiset and apply the discrete rule
    expanded = np.sort(np.repeat(df["v"].to_numpy(), df["w"].to_numpy()))
    W = len(expanded)
    want = [int(expanded[max(math.ceil(q * W), 1) - 1]) for q in qs]
    assert out["value"].tolist() == want
    assert out["q"].tolist() == qs


@pytest.mark.usefixtures("ray_session")
def test_weighted_quantiles_validation():
    from raysketch.ops.stats import weighted_quantiles

    df = pd.DataFrame({"v": [1, 2], "w": [0, 0]})
    with pytest.raises(Exception, match="zero total weight"):
        weighted_quantiles(_mk(df, 1), "v", "w", [0.5])
    df2 = pd.DataFrame({"v": [1], "w": [-2]})
    with pytest.raises(Exception, match="non-negative"):
        weighted_quantiles(_mk(df2, 1), "v", "w", [0.5])
    with pytest.raises(ValueError, match="non-empty"):
        weighted_quantiles(_mk(df, 1), "v", "w", [])


# ---------------------------------------------------------------------------
# zone map / pruned read
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_zone_map_prunes_conservatively(tmp_path):
    import pyarrow.parquet as pq

    from raysketch.engine.sinks import (read_pruned_range, write_dataset,
                                        write_zone_map)
    from raysketch.ops.curate import write_range_shards

    rng = np.random.default_rng(31)
    df = pd.DataFrame({"k": rng.integers(0, 1000, 6000).astype(np.int64),
                       "x": np.arange(6000, dtype=np.int64)})
    root = str(tmp_path / "rs")
    write_range_shards(_mk(df, 4), root, "k", n_shards=8)
    zpath = write_zone_map(root, ["k"])
    zm = pq.read_table(zpath).to_pandas()
    assert zm["rows"].sum() // 1 >= 6000  # every file mapped
    # zones really are per-file min/max
    for _, r in zm.iterrows():
        sub = pq.read_table(f"{root}/{r['file']}").to_pandas()
        assert r["vmin"] == sub["k"].min()
        assert r["vmax"] == sub["k"].max()
    lo, hi = 300, 420
    pruned, scanned, total = read_pruned_range(root, "k", lo, hi)
    assert 0 < scanned < total
    back = pruned.to_pandas()
    kk = back["k"].to_numpy(np.int64)
    got = np.sort(kk[(kk >= lo) & (kk <= hi)])
    want = np.sort(df.loc[(df["k"] >= lo) & (df["k"] <= hi), "k"]
                   .to_numpy(np.int64))
    assert np.array_equal(got, want)  # pruning lost no qualifying row
    # disjoint window beyond the domain: everything prunes
    none_ds, s0, t0 = read_pruned_range(root, "k", 5000, 6000)
    assert none_ds is None and s0 == 0 and t0 == total
    with pytest.raises(KeyError):
        read_pruned_range(root, "nope", 0, 1)
    with pytest.raises(FileNotFoundError):
        write_dataset(_mk(df, 2), str(tmp_path / "bare"))
        read_pruned_range(str(tmp_path / "bare"), "k", 0, 1)


@pytest.mark.usefixtures("ray_session")
def test_zone_map_missing_column_raises(tmp_path):
    from raysketch.engine.sinks import write_dataset, write_zone_map

    df = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    write_dataset(_mk(df, 2), str(tmp_path / "d"))
    with pytest.raises(Exception, match="no column"):
        write_zone_map(str(tmp_path / "d"), ["zz"])


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_psi_drift_matches_direct_and_detects_shift():
    from raysketch.ops.rules import psi_drift

    rng = np.random.default_rng(41)
    # group 'shift' draws from a different distribution than the rest
    g = np.array(["a"] * 900 + ["b"] * 900 + ["shift"] * 300, dtype=object)
    v = np.concatenate([rng.integers(0, 20, 1800),
                        rng.integers(15, 35, 300)]).astype(np.int64)
    out = psi_drift(_mk(pd.DataFrame({"g": g, "v": v}), 5),
                    "g", "v").to_pandas().set_index("g")
    # direct replay
    df = pd.DataFrame({"g": g, "v": v})
    pv = df.pivot_table(index="v", columns="g", aggfunc="size",
                        fill_value=0).sort_index()
    M = pv.to_numpy(np.int64)
    V = M.shape[0]
    ng = M.sum(axis=0)
    nt = M.sum()
    p = (M + 1) / (ng + V)
    q = (M.sum(axis=1, keepdims=True) - M + 1) / (nt - ng + V)
    term = (p - q) * np.log(p / q)
    micro = (np.sign(term) * np.floor(np.abs(term) * 1e6 + 0.5)).astype(np.int64)
    want = dict(zip(pv.columns, micro.sum(axis=0)))
    assert out["psi_micro"].to_dict() == want
    assert out.loc["shift", "psi_micro"] > 5 * out.loc["a", "psi_micro"]


# ---------------------------------------------------------------------------
# topn_with_others
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_topn_with_others_exact_rollup():
    from raysketch.ops.topk import topn_with_others

    rng = np.random.default_rng(43)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], 2000),
        "k": rng.integers(0, 30, 2000).astype(np.int64),
        "v": rng.integers(1, 100, 2000).astype(np.int64)})
    out = topn_with_others(_mk(df, 5), "g", "k", "v", n=3) \
        .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)
    for gname, sub in df.assign(k=df["k"].astype(str)) \
            .groupby("g"):
        agg = sub.groupby("k")["v"].sum().reset_index() \
            .sort_values(["v", "k"], ascending=[False, True])
        got = out[out["g"] == gname]
        assert got["k"].tolist()[:3] == agg["k"].tolist()[:3]
        assert got["v"].tolist()[:3] == agg["v"].tolist()[:3]
        assert got["k"].iloc[3] == "__other__"
        assert got["rank"].iloc[3] == 4
        assert got["v"].iloc[3] == agg["v"].iloc[3:].sum()
    # total mass preserved exactly
    assert out["v"].sum() == df["v"].sum()


@pytest.mark.usefixtures("ray_session")
def test_topn_with_others_small_group_no_other_row():
    from raysketch.ops.topk import topn_with_others

    df = pd.DataFrame({"g": ["a", "a"], "k": [1, 2],
                       "v": np.array([5, 3], dtype=np.int64)})
    out = topn_with_others(_mk(df, 1), "g", "k", "v", n=5).to_pandas()
    assert "__other__" not in set(out["k"])
    assert len(out) == 2


# ---------------------------------------------------------------------------
# grouped_geo_mean
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_grouped_geo_mean_matches_direct():
    from raysketch.ops.stats import grouped_geo_mean

    rng = np.random.default_rng(47)
    df = pd.DataFrame({"g": rng.choice(["p", "q"], 1000),
                       "v": rng.integers(1, 500, 1000).astype(np.int64)})
    out = grouped_geo_mean(_mk(df, 4), "g", "v").to_pandas()
    for _, row in out.iterrows():
        sub = df[df["g"] == row["g"]]["v"].to_numpy(np.float64)
        s = int(np.floor(np.log(sub) * 1e6 + 0.5).sum())
        assert row["log_sum_micro"] == s
        gm = np.exp(s / (len(sub) * 1e6))
        assert abs(row["geo_mean"] - gm) < 1e-6
        # geo mean <= arithmetic mean (AM-GM), sanity
        assert row["geo_mean"] <= sub.mean() + 1e-9
    with pytest.raises(Exception, match=">= 1"):
        grouped_geo_mean(
            _mk(pd.DataFrame({"g": ["a"], "v": [0]}), 1), "g", "v")


# ---------------------------------------------------------------------------
# session_paths
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_session_paths_matches_brute_force():
    from raysketch.ops.funnel import session_paths

    rng = np.random.default_rng(53)
    n = 3000
    gap = 1_000_000 * 600  # 10 min
    df = pd.DataFrame({
        "u": rng.integers(0, 40, n).astype(np.int64),
        "t": np.sort(rng.integers(0, 10**12, n)).astype(np.int64),
        "eid": np.arange(n, dtype=np.int64),
        "et": rng.choice(["view", "cart", "buy", "search"], n)})
    ds_df = pd.DataFrame({
        "u": df["u"], "ts": pd.to_datetime(df["t"], unit="us"),
        "eid": df["eid"], "et": df["et"]})
    out = session_paths(_mk(ds_df, 6), "u", "ts", "et", "eid",
                        gap_us=gap, k=3, top_n=10).to_pandas()
    # brute force
    paths = {}
    for u, sub in df.sort_values(["u", "t", "eid"]).groupby("u"):
        ts = sub["t"].to_numpy()
        new = np.ones(len(sub), dtype=bool)
        new[1:] = ts[1:] - ts[:-1] > gap
        sid = np.cumsum(new)
        for s in np.unique(sid):
            ets = sub["et"].to_numpy()[sid == s][:3]
            p = " > ".join(ets)
            paths[p] = paths.get(p, 0) + 1
    want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(map(tuple, out.itertuples(index=False))) == want


@pytest.mark.usefixtures("ray_session")
def test_session_paths_short_sessions_and_validation():
    from raysketch.ops.funnel import session_paths

    # one user, one 2-event session: path has only 2 stages
    df = pd.DataFrame({
        "u": np.array([1, 1], dtype=np.int64),
        "ts": pd.to_datetime([0, 1000], unit="us"),
        "eid": np.array([0, 1], dtype=np.int64),
        "et": ["a", "b"]})
    out = session_paths(_mk(df, 1), "u", "ts", "et", "eid",
                        gap_us=10**9, k=3, top_n=5).to_pandas()
    assert out["path"].tolist() == ["a > b"]
    assert out["n_sessions"].tolist() == [1]
    with pytest.raises(ValueError):
        session_paths(_mk(df, 1), "u", "ts", "et", "eid", gap_us=0)


# ---------------------------------------------------------------------------
# vocab_growth
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_vocab_growth_matches_brute_and_monotone():
    from raysketch.ops.text import vocab_growth

    rng = np.random.default_rng(59)
    vocab = [f"w{i}" for i in range(300)]
    n = 400
    docs = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
            for _ in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": docs})
    out = vocab_growth(_mk(df, 5), n_docs=n, k=10).to_pandas()
    assert out["checkpoint"].tolist() == list(range(1, 11))
    assert out["n_docs"].tolist() == [(i * n) // 10 for i in range(1, 11)]
    first = {}
    for did, text in zip(df["doc_id"], df["text"]):
        for w in text.split():
            first.setdefault(w, did)
    fd = np.array(sorted(first.values()))
    want = [(fd < (i * n) // 10).sum() for i in range(1, 11)]
    assert out["vocab"].tolist() == want
    assert (np.diff(out["vocab"]) >= 0).all()  # cumulative
    with pytest.raises(ValueError):
        vocab_growth(_mk(df, 1), n_docs=0)
