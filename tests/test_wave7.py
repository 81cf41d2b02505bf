"""Seventh-session round-4 ops: time-weighted scan (TWAP), degree
assortativity, dictionary-compression advisor, greedy k-center coreset.
Kernel-level brute-force parities + edge cases; end-to-end SQL parity
runs in test_oracle_parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raysketch.ops.cluster import _round6, _unit, kcenter_select
from raysketch.ops.graph import degree_assortativity
from raysketch.ops.scan import time_weighted_scan
from raysketch.ops.stats import dict_compression_profile


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


# ---------------------------------------------------------------------------
# time_weighted_scan
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_twap_matches_brute_force():
    rng = np.random.default_rng(19)
    n = 2500
    df = pd.DataFrame({
        "k": rng.integers(0, 30, n),
        "t": rng.integers(0, 10_000_000, n),
        "v": rng.integers(-200, 200, n)})
    df = df.drop_duplicates(["k", "t"])  # total order per key
    got = time_weighted_scan(_mk(df, 5), "k", ["t"], "t", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["k"] == row["k"]].sort_values("t")
        t = sub["t"].to_numpy(np.int64)
        v = sub["v"].to_numpy(np.int64)
        assert row["n_rows"] == len(sub)
        assert row["dur"] == int(t[-1] - t[0])
        assert row["twap_num"] == int((v[:-1] * (t[1:] - t[:-1])).sum())


@pytest.mark.usefixtures("ray_session")
def test_twap_single_row_key_contributes_nothing():
    df = pd.DataFrame({"k": [1, 2, 2], "t": [5, 1, 4], "v": [9, 10, 99]})
    got = time_weighted_scan(_mk(df, 1), "k", ["t"], "t", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert got.loc[0].tolist() == [1, 1, 0, 0]
    assert got.loc[1].tolist() == [2, 2, 10 * 3, 3]


# ---------------------------------------------------------------------------
# degree_assortativity
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_assortativity_matches_brute_force():
    rng = np.random.default_rng(23)
    edges = pd.DataFrame({
        "src": rng.integers(0, 40, 300),
        "dst": rng.integers(40, 80, 300)}).drop_duplicates()
    got = degree_assortativity(_mk(edges, 4)).to_pandas().iloc[0]
    # brute: canonical dedup, degree count, doubled pairs, Pearson
    und = pd.concat([edges, edges.rename(
        columns={"src": "dst", "dst": "src"})])
    deg = und.groupby("src").size()
    x = und["src"].map(deg).to_numpy(np.int64)
    y = und["dst"].map(deg).to_numpy(np.int64)
    n = len(x)
    sx, sxx, sxy = int(x.sum()), int((x * x).sum()), int((x * y).sum())
    assert got["n_directed_edges"] == n
    assert got["sum_deg"] == sx
    assert got["sum_deg2"] == sxx
    assert got["sum_xy"] == sxy
    r = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    assert got["assortativity"] == float(
        np.sign(r) * np.floor(abs(r) * 1e6 + 0.5) / 1e6)


@pytest.mark.usefixtures("ray_session")
def test_assortativity_dedups_and_canonicalizes_edges():
    # the same edge in both orientations and repeated must count once
    edges = pd.DataFrame({"src": [1, 2, 1, 1], "dst": [2, 1, 2, 3]})
    got = degree_assortativity(_mk(edges, 2)).to_pandas().iloc[0]
    assert got["n_directed_edges"] == 4  # {1-2, 1-3} doubled


# ---------------------------------------------------------------------------
# dict_compression_profile
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_dict_profile_known_values():
    df = pd.DataFrame({
        "a": ["xx", "xx", "yy", "xx"],        # 2 distinct, 8 plain chars
        "b": ["p", "q", "r", "s"]})           # all distinct
    got = dict_compression_profile(_mk(df, 2), ["a", "b"]).to_pandas()
    a = got[got["column_name"] == "a"].iloc[0]
    b = got[got["column_name"] == "b"].iloc[0]
    assert (a["n"], a["plain_bytes"], a["n_distinct"]) == (4, 8, 2)
    assert a["dict_bytes"] == 4 + 4 * 4  # 2 distinct * 2 chars + 4n
    assert (b["n_distinct"], b["dict_bytes"]) == (4, 4 + 16)
    r = 1.0 - 20 / 8
    assert a["savings_ratio"] == float(
        np.sign(r) * np.floor(abs(r) * 1e6 + 0.5) / 1e6)


# ---------------------------------------------------------------------------
# kcenter_select
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_kcenter_matches_brute_force_greedy():
    rng = np.random.default_rng(29)
    n, d, k = 300, 16, 6
    ids = rng.permutation(n).astype(np.int64) + 100
    V = rng.normal(size=(n, d))
    df = pd.DataFrame({"vec_id": ids, "embedding": list(V)})
    got = kcenter_select(_mk(df, 5), k).to_pandas()
    # route identity: the streaming route (forced by a zero driver
    # budget) must pick the identical trajectory
    stream = kcenter_select(_mk(df, 5), k,
                            driver_value_limit=0).to_pandas()
    assert stream.values.tolist() == got.values.tolist()
    order = np.argsort(ids)
    ids_s, V_s = ids[order], _unit(V[order])
    sel = [0]  # min id first
    want = [(0, int(ids_s[0]), 1.0)]
    for s in range(1, k):
        ms = _round6(V_s @ V_s[sel].T).max(axis=1)
        j = int(np.lexsort((ids_s, ms))[0])
        sel.append(j)
        want.append((s, int(ids_s[j]), float(ms[j])))
    assert [tuple(r) for r in got.itertuples(index=False)] == want


@pytest.mark.usefixtures("ray_session")
def test_kcenter_k1_and_validation():
    df = pd.DataFrame({"vec_id": [7, 3, 9],
                       "embedding": [[1.0, 0.0]] * 3})
    got = kcenter_select(_mk(df, 1), 1).to_pandas()
    assert got.iloc[0].tolist() == [0, 3, 1.0]
    with pytest.raises(ValueError, match="k"):
        kcenter_select(_mk(df, 1), 0)


# ---------------------------------------------------------------------------
# debounce
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_debounce_lag_rule_brute_force():
    from raysketch.ops.window import debounce

    rng = np.random.default_rng(31)
    n = 1500
    df = pd.DataFrame({
        "u": rng.integers(0, 20, n),
        "t": rng.integers(0, 5000, n),
        "i": np.arange(n, dtype=np.int64)})
    got = debounce(_mk(df, 4), ["u"], "t", ["t", "i"], window_us=50) \
        .to_pandas().sort_values(["u", "t", "i"]).reset_index(drop=True)
    sub = df.sort_values(["u", "t", "i"]).reset_index(drop=True)
    prev = sub.groupby("u")["t"].shift(1)
    want = sub[prev.isna() | (sub["t"] - prev > 50)] \
        .reset_index(drop=True)
    assert got["i"].tolist() == want["i"].tolist()
    with pytest.raises(ValueError, match="window_us"):
        debounce(_mk(df, 1), ["u"], "t", ["t", "i"], window_us=-1)


# ---------------------------------------------------------------------------
# k_anonymity_audit
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_k_anonymity_known_values():
    from raysketch.ops.stats import k_anonymity_audit

    df = pd.DataFrame({
        "seg": ["a"] * 6 + ["a"] * 2 + ["b"] * 1,
        "nat": [1] * 6 + [2] * 2 + [1] * 1})
    got = k_anonymity_audit(_mk(df, 3), ["seg", "nat"], k=5) \
        .to_pandas().iloc[0]
    assert got.tolist() == [9, 3, 2, 3, 1]
    with pytest.raises(ValueError, match="k"):
        k_anonymity_audit(_mk(df, 1), ["seg", "nat"], k=0)


# ---------------------------------------------------------------------------
# coverage_islands
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_coverage_islands_brute_force():
    from raysketch.ops.window import coverage_islands

    rng = np.random.default_rng(37)
    n = 1200
    df = pd.DataFrame({
        "k": rng.integers(0, 15, n),
        "s": rng.integers(0, 10_000, n),
        "i": np.arange(n, dtype=np.int64)})
    df["e"] = df["s"] + rng.integers(1, 120, n)
    got = coverage_islands(_mk(df, 4), "k", "s", "e", ["s", "i"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["k"] == row["k"]].sort_values(["s", "i"])
        covered = islands = 0
        cur_s = cur_e = None
        for s, e in zip(sub["s"], sub["e"]):
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                islands += 1
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        assert row["n_rows"] == len(sub)
        assert row["n_islands"] == islands
        assert row["covered"] == covered


@pytest.mark.usefixtures("ray_session")
def test_coverage_islands_touching_intervals_merge():
    from raysketch.ops.window import coverage_islands

    df = pd.DataFrame({"k": [1, 1, 1], "s": [0, 10, 25],
                       "e": [10, 20, 30], "i": [0, 1, 2]})
    got = coverage_islands(_mk(df, 1), "k", "s", "e", ["s", "i"]) \
        .to_pandas().iloc[0]
    # [0,10) touches [10,20) -> one island; [25,30) separate
    assert (got["n_islands"], got["covered"]) == (2, 25)


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

def _lp_brute(edges: pd.DataFrame, iters: int) -> dict[int, int]:
    und = set()
    for a, b in edges.itertuples(index=False):
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj: dict[int, list] = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {n: n for n in adj}
    for _ in range(iters):
        new = {}
        for n, nbrs in adj.items():
            cnt: dict[int, int] = {}
            for m in nbrs:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best[0]
        lab = new
    return lab


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_matches_brute_force():
    from raysketch.ops.graph import label_propagation

    rng = np.random.default_rng(41)
    # two loosely-connected clusters
    a = pd.DataFrame({"src": rng.integers(0, 20, 120),
                      "dst": rng.integers(0, 20, 120)})
    b = pd.DataFrame({"src": rng.integers(100, 120, 120),
                      "dst": rng.integers(100, 120, 120)})
    bridge = pd.DataFrame({"src": [5], "dst": [105]})
    edges = pd.concat([a, b, bridge])
    edges = edges[edges["src"] != edges["dst"]]
    want = _lp_brute(edges, 2)
    # both physical routes, one answer: driver fold and shuffle fold
    for dlimit in (5_000_000, 0):
        got = label_propagation(_mk(edges, 4), iters=2,
                                driver_fold_limit=dlimit).to_pandas()
        assert dict(zip(got["node"], got["label"])) == want, dlimit


# ---------------------------------------------------------------------------
# chi2_independence
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_chi2_matches_integer_brute_force():
    from raysketch.ops.stats import chi2_independence

    rng = np.random.default_rng(43)
    n = 3000
    df = pd.DataFrame({
        "a": rng.choice(list("xyz"), n),
        "b": rng.choice(list("pqrs"), n)})
    got = chi2_independence(_mk(df, 4), "a", "b").to_pandas().iloc[0]
    cells = df.groupby(["a", "b"]).size()
    rm = df.groupby("a").size().to_dict()
    cm = df.groupby("b").size().to_dict()
    micro = 0
    for a, r in rm.items():
        for b, c in cm.items():
            o = int(cells.get((a, b), 0))
            num = (n * o - r * c) ** 2
            den = n * r * c
            micro += (num * 2_000_000 + den) // (2 * den)
    assert got.tolist() == [n, 3, 4, 6, micro]
    # sanity: near-independent draws give chi2/dof in a plausible band
    assert got["chi2_micro"] / 1e6 < 30.0


# ---------------------------------------------------------------------------
# ohlc_bars
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_ohlc_matches_brute_force():
    from raysketch.ops.window import ohlc_bars

    rng = np.random.default_rng(47)
    n = 2000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "bkt": rng.integers(0, 6, n),
        "t": rng.integers(0, 500, n),
        "i": np.arange(n, dtype=np.int64),
        "v": rng.integers(-100, 100, n)})
    got = ohlc_bars(_mk(df, 5), "k", "bkt", "t", "i", "v") \
        .to_pandas().sort_values(["k", "bucket"]).reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[(df["k"] == row["k"]) & (df["bkt"] == row["bucket"])] \
            .sort_values(["t", "i"])
        assert row["open"] == sub["v"].iloc[0]
        assert row["close"] == sub["v"].iloc[-1]
        assert row["high"] == sub["v"].max()
        assert row["low"] == sub["v"].min()
        assert row["n"] == len(sub)
        assert row["sum_value"] == sub["v"].sum()


# ---------------------------------------------------------------------------
# negative_samples
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_negative_samples_deterministic_and_self_free():
    from raysketch.ops.cluster import seed_key32
    from raysketch.ops.sample import negative_samples

    n = 50
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    got = negative_samples(_mk(df, 3), n_ids=n, k=4).to_pandas() \
        .sort_values(["doc_id", "neg_rank"]).reset_index(drop=True)
    assert len(got) == n * 4
    assert (got["neg_id"] != got["doc_id"]).all()
    assert got["neg_id"].between(0, n - 1).all()
    # exact replay of the mix
    rep = got["doc_id"].to_numpy(np.int64)
    rank = got["neg_rank"].to_numpy(np.int64)
    neg = seed_key32(rep * 16 + rank) % n
    neg = (neg + (neg == rep)) % n
    assert (got["neg_id"].to_numpy(np.int64) == neg).all()
    with pytest.raises(ValueError, match="k"):
        negative_samples(_mk(df, 1), n_ids=n, k=0)


# ---------------------------------------------------------------------------
# doc_novelty
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_doc_novelty_brute_force():
    from raysketch.ops.curate import doc_novelty

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b c d e f",          # all novel (first doc)
                 "a b c d e zz yy xx ww vv",  # repeats 0's opening
                 "q w e r t y u"]})      # all novel
    got = doc_novelty(_mk(docs, 2), n=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    sh = {}
    for _, r in docs.iterrows():
        w = r["text"].split()
        ss = {" ".join(w[i:i + 5]) for i in range(len(w) - 4)}
        sh[r["doc_id"]] = ss
    first = {}
    for d in sorted(sh):
        for s in sh[d]:
            first.setdefault(s, d)
    for _, row in got.iterrows():
        ss = sh[row["doc_id"]]
        nov = sum(1 for s in ss if first[s] == row["doc_id"])
        assert row["n_shingles"] == len(ss)
        assert row["n_novel"] == nov


# ---------------------------------------------------------------------------
# embedding_quantization
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_embedding_quantization_brute_force():
    from raysketch.ops.similarity import embedding_quantization

    rng = np.random.default_rng(53)
    n, d = 200, 8
    V = rng.normal(size=(n, d)).astype(np.float32)
    lab = rng.integers(0, 3, n)
    df = pd.DataFrame({"embedding": list(V), "label": lab})
    got = embedding_quantization(_mk(df, 4)).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    Vd = V.astype(np.float64)
    mn, mx = Vd.min(axis=0), Vd.max(axis=0)
    code = np.floor((Vd - mn) * 255 / (mx - mn) + 0.5)
    recon = mn + code * (mx - mn) / 255
    micro = np.floor(np.abs(Vd - recon) * 1e6 + 0.5).astype(np.int64)
    for _, row in got.iterrows():
        m = lab == row["label"]
        assert row["n_vecs"] == int(m.sum())
        assert row["n_vals"] == int(m.sum()) * d
        assert row["err_micro"] == int(micro[m].sum())
    with pytest.raises(ValueError, match="levels"):
        embedding_quantization(_mk(df, 1), levels=1)


# ---------------------------------------------------------------------------
# subsample_ci
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_subsample_ci_brute_force():
    import math

    from raysketch.ops.cluster import seed_key32
    from raysketch.ops.stats import subsample_ci

    rng = np.random.default_rng(59)
    n = 2000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "v": rng.integers(0, 1000, n)})
    got = subsample_ci(_mk(df, 4), "id", "v").to_pandas().iloc[0]
    ids = df["id"].to_numpy(np.int64)
    v = df["v"].to_numpy(np.int64)
    B = 32
    means = []
    for b in range(B):
        keep = seed_key32(ids * B + b) % 2 == 0
        r = v[keep].sum() / keep.sum()
        means.append(np.sign(r) * np.floor(abs(r) * 1e6 + 0.5) / 1e6)
    means = np.sort(means)
    assert got["n_rows"] == n
    m = v.sum() / n
    assert got["mean"] == np.sign(m) * np.floor(abs(m) * 1e6 + 0.5) / 1e6
    assert got["ci_lo"] == means[math.ceil(0.1 * B) - 1]
    assert got["ci_hi"] == means[math.ceil(0.9 * B) - 1]
    assert got["ci_lo"] <= got["mean"] <= got["ci_hi"]


# ---------------------------------------------------------------------------
# zipf_fit
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_zipf_fit_brute_force_and_slope_sign():
    from raysketch.ops.text import zipf_fit

    # counts 16,8,4,2,1 over ranks 1..5: perfect power law, slope<0
    docs = pd.DataFrame({
        "doc_id": [0],
        "text": [" ".join(["a"] * 16 + ["b"] * 8 + ["c"] * 4
                          + ["d"] * 2 + ["e"])]})
    got = zipf_fit(_mk(docs, 1)).to_pandas().iloc[0]
    rank = np.arange(1, 6)
    cnt = np.array([16, 8, 4, 2, 1])
    x = np.floor(np.log(rank) * 1e6 + 0.5).astype(np.int64)
    y = np.floor(np.log(cnt) * 1e6 + 0.5).astype(np.int64)
    n = 5
    num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    den = n * int((x * x).sum()) - int(x.sum()) ** 2
    slope = num / den
    inter = (float(y.sum()) - slope * float(x.sum())) / n
    r6 = lambda v: float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6)  # noqa: E731
    assert got["n_tokens"] == 5
    assert got["slope"] == r6(slope)
    assert got["intercept_micro"] == r6(inter)
    assert got["slope"] < 0


# ---------------------------------------------------------------------------
# source_vocab_overlap
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_source_vocab_overlap_brute_force():
    from raysketch.ops.text import source_vocab_overlap

    df = pd.DataFrame({
        "source": ["s1", "s1", "s2", "s3"],
        "text": ["a b c", "c d", "c d e", "x y"]})
    got = source_vocab_overlap(df.pipe(_mk, 2)).to_pandas()
    vocab = {s: set(" ".join(df[df["source"] == s]["text"]).split())
             for s in ["s1", "s2", "s3"]}
    for _, r in got.iterrows():
        A, B = vocab[r["src_a"]], vocab[r["src_b"]]
        assert r["inter"] == len(A & B)
        assert r["union_size"] == len(A | B)
    # zero-overlap pair present with jaccard 0
    z = got[(got["src_a"] == "s2") & (got["src_b"] == "s3")].iloc[0]
    assert (z["inter"], z["jaccard"]) == (0, 0.0)


# ---------------------------------------------------------------------------
# gini_by_group
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_gini_brute_force_and_bounds():
    from raysketch.ops.stats import gini_by_group

    rng = np.random.default_rng(61)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 800),
        "v": rng.integers(0, 500, 800)})
    got = gini_by_group(_mk(df, 4), "g", "v").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    for _, row in got.iterrows():
        x = np.sort(df[df["g"] == row["g"]]["v"].to_numpy(np.int64))
        n = len(x)
        s1 = int((np.arange(1, n + 1) * x).sum())
        sv = int(x.sum())
        gini = (2 * s1 - (n + 1) * sv) / (n * sv)
        assert row["n"] == n
        assert row["gini"] == float(
            np.sign(gini) * np.floor(abs(gini) * 1e6 + 0.5) / 1e6)
        assert 0.0 <= row["gini"] < 1.0
    # equal values -> perfect equality
    eq = pd.DataFrame({"g": ["e"] * 10, "v": [7] * 10})
    g0 = gini_by_group(_mk(eq, 1), "g", "v").to_pandas().iloc[0]
    assert g0["gini"] == 0.0
    with pytest.raises(Exception, match="non-negative"):
        gini_by_group(_mk(pd.DataFrame({"g": ["x"], "v": [-1]}), 1),
                      "g", "v").materialize()


# ---------------------------------------------------------------------------
# abc_analysis
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_abc_analysis_brute_force():
    from raysketch.ops.topk import abc_analysis

    rng = np.random.default_rng(67)
    n = 1000
    df = pd.DataFrame({"k": rng.integers(0, 60, n),
                       "v": rng.integers(0, 10_000, n)})
    got = abc_analysis(_mk(df, 4), "k", "v").to_pandas()
    per = df.groupby("k", as_index=False)["v"].sum() \
        .sort_values(["v", "k"], ascending=[False, True])
    cum = per["v"].cumsum().to_numpy(np.int64)
    total = int(per["v"].sum())
    cls = np.where(cum * 100 <= 80 * total, "A",
                   np.where(cum * 100 <= 95 * total, "B", "C"))
    want = pd.DataFrame({"c": cls, "n": 1, "s": per["v"].to_numpy()}) \
        .groupby("c", as_index=False).sum().sort_values("c")
    assert got["abc_class"].tolist() == want["c"].tolist()
    assert got["n_keys"].tolist() == want["n"].tolist()
    assert got["sum_value"].tolist() == want["s"].tolist()
    # mass conservation
    assert got["sum_value"].sum() == total


# ---------------------------------------------------------------------------
# join_key_discovery
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_join_key_discovery_containments():
    from raysketch.ops.setops import join_key_discovery

    fact = pd.DataFrame({"fk": [1, 1, 2, 3, 3, 9]})   # 9 is an orphan
    dim = pd.DataFrame({"pk": [1, 2, 3, 4, 5]})
    got = join_key_discovery(
        [("fk", _mk(fact, 2), "fk"), ("pk", _mk(dim, 1), "pk")],
        pairs=[("fk", "pk"), ("pk", "fk")]).to_pandas()
    r = got.iloc[0]
    assert (r["distinct_a"], r["distinct_b"], r["inter"]) == (4, 5, 3)
    assert r["containment_a_in_b"] == 0.75
    r2 = got.iloc[1]
    assert r2["containment_a_in_b"] == 0.6  # 3 of 5 pks referenced
    with pytest.raises(ValueError, match="duplicate"):
        join_key_discovery([("x", _mk(dim, 1), "pk"),
                            ("x", _mk(dim, 1), "pk")])


# ---------------------------------------------------------------------------
# quality_keep_filter
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_quality_keep_filter_picks_best_member():
    import ray.data as rd

    from raysketch.ops.dedup import quality_keep_filter

    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                         "lang": ["en"] * 5})
    # clusters: {1,2,3} labeled 1; {4,5} labeled 4
    clusters = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                             "cluster_id": [1, 1, 1, 4, 4]})
    # best quality: doc 2 in first cluster; TIE in second -> min id 4
    quality = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                            "q_score": [0.2, 0.9, 0.5, 0.7, 0.7]})
    kept = quality_keep_filter(
        _mk(docs, 2), _mk(clusters, 2), _mk(quality, 2)).to_pandas()
    assert sorted(kept["doc_id"]) == [2, 4]


# ---------------------------------------------------------------------------
# new_vs_returning
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_new_vs_returning_brute_force():
    from raysketch.ops.funnel import new_vs_returning

    rng = np.random.default_rng(71)
    n = 1500
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "t": rng.integers(0, 10, n) * 100 + rng.integers(0, 100, n)})
    got = new_vs_returning(_mk(df, 4), "k", "t", bucket_us=100) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    p = df.assign(b=df["t"] // 100).drop_duplicates(["k", "b"])
    first = p.groupby("k")["b"].transform("min")
    want = p.assign(new=(p["b"] == first).astype(int)) \
        .groupby("b").agg(n_active=("k", "count"), n_new=("new", "sum"))
    assert got["n_active"].tolist() == want["n_active"].tolist()
    assert got["n_new"].tolist() == want["n_new"].tolist()
    assert (got["n_active"]
            == got["n_new"] + got["n_returning"]).all()
    # first bucket is all-new
    assert got.iloc[0]["n_returning"] == 0


# ---------------------------------------------------------------------------
# topk_drift
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_topk_drift_ranks_and_true_counts():
    from raysketch.ops.topk import topk_drift

    # before: key 1 dominant; after: key 2 dominant, key 3 enters
    rows = ([(1, 0)] * 9 + [(2, 0)] * 5 + [(4, 0)] * 1
            + [(2, 100)] * 8 + [(3, 100)] * 6 + [(1, 100)] * 2)
    df = pd.DataFrame(rows, columns=["k", "t"])
    got = topk_drift(_mk(df, 3), "k", "t", split_us=50, k=2) \
        .to_pandas().set_index("k")
    assert got.loc[1, ["rank_before", "n_before"]].tolist() == [1, 9]
    assert got.loc[2, ["rank_before", "rank_after"]].tolist() == [2, 1]
    assert got.loc[3, ["rank_before", "rank_after"]].tolist() == [0, 2]
    # key 3 absent from the before TOP but its true before count is 0;
    # key 1 dropped out after but its TRUE after count is reported
    assert got.loc[1, "rank_after"] == 0
    assert got.loc[1, "n_after"] == 2
    with pytest.raises(ValueError, match="k"):
        topk_drift(_mk(df, 1), "k", "t", split_us=50, k=0)


# ---------------------------------------------------------------------------
# max_streak / inter_arrival_profile
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_max_streak_brute_force():
    from raysketch.ops.window import max_streak

    rng = np.random.default_rng(73)
    df = pd.DataFrame({"k": rng.integers(0, 25, 1200),
                       "d": rng.integers(0, 40, 1200)})
    got = max_streak(_mk(df, 4), "k", "d").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    for _, row in got.iterrows():
        days = sorted(set(df[df["k"] == row["k"]]["d"]))
        best = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        assert row["n_days"] == len(days)
        assert row["max_streak"] == best


@pytest.mark.usefixtures("ray_session")
def test_inter_arrival_profile_brute_force():
    from raysketch.ops.window import inter_arrival_profile

    rng = np.random.default_rng(79)
    n = 900
    df = pd.DataFrame({
        "k": rng.integers(0, 20, n),
        "t": rng.integers(0, 100_000, n),
        "i": np.arange(n, dtype=np.int64)})
    df = df.drop_duplicates(["k", "t"])
    got = inter_arrival_profile(_mk(df, 4), "k", "t", ["t", "i"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    for _, row in got.iterrows():
        t = np.sort(df[df["k"] == row["k"]]["t"].to_numpy(np.int64))
        gaps = np.sort(t[1:] - t[:-1])
        if len(gaps) == 0:
            assert (row["n_gaps"], row["median_gap"],
                    row["max_gap"]) == (0, 0.0, 0)
            continue
        assert row["n_gaps"] == len(gaps)
        assert row["median_gap"] == float(np.median(gaps))
        assert row["max_gap"] == int(gaps[-1])
