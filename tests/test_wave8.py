"""Round-4 sixth-session wave: score_auc, winsorized_mean,
wasserstein_drift, transition_latency — brute-force parity on random
frames, block invariance, contract validation. (Oracle parity at
sf0.01 is covered by test_oracle_parity over the new ORACLE_SQL
entries.)"""

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.funnel import transition_latency
from raysketch.ops.stats import (score_auc, wasserstein_drift,
                                 winsorized_mean)


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


def _midranks(x: np.ndarray) -> np.ndarray:
    order = np.argsort(x, kind="stable")
    ranks = np.empty(len(x), dtype=np.float64)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j < len(sx) and sx[j] == sx[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based mid-rank
        i = j
    return ranks


def test_score_auc_matches_brute(ray_session):
    rng = np.random.default_rng(11)
    n = 4000
    y = rng.random(n) < 0.3
    cents = np.where(y, rng.integers(50, 300, n), rng.integers(0, 200, n))
    df = pd.DataFrame({"value": cents / 100.0,
                       "label": np.where(y, "pos", "neg")})
    out = score_auc(_mk(df, 6), "value", "label", "pos").to_pandas()
    r = _midranks(cents.astype(np.float64))
    n1, n0 = int(y.sum()), int((~y).sum())
    auc = (r[y].sum() - n1 * (n1 + 1) / 2.0) / (n1 * n0)
    assert out["n_pos"][0] == n1 and out["n_neg"][0] == n0
    assert abs(out["auc"][0] - auc) < 2e-6


def test_score_auc_perfect_and_degenerate(ray_session):
    df = pd.DataFrame({"value": [1.0, 2.0, 3.0, 4.0],
                       "label": ["n", "n", "p", "p"]})
    out = score_auc(_mk(df, 2), "value", "label", "p").to_pandas()
    assert out["auc"][0] == 1.0
    # all-tied scores -> exactly 0.5
    df2 = pd.DataFrame({"value": [5.0] * 6,
                        "label": ["p", "n"] * 3})
    out2 = score_auc(_mk(df2, 2), "value", "label", "p").to_pandas()
    assert out2["auc"][0] == 0.5
    with pytest.raises(Exception):  # single class refused
        score_auc(_mk(pd.DataFrame({"value": [1.0], "label": ["p"]}), 1),
                  "value", "label", "p")


def test_winsorized_mean_matches_brute(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 2500),
        "v": rng.integers(1, 80, 2500).astype(np.float64)})
    out = winsorized_mean(_mk(df, 5), "g", "v", alpha=0.05).to_pandas()
    for _, row in out.iterrows():
        x = np.sort(df.loc[df["g"] == row["g"], "v"].to_numpy())
        n = len(x)
        lo = x[int(np.ceil(0.05 * n)) - 1]
        hi = x[int(np.ceil(0.95 * n)) - 1]
        w = np.clip(x, lo, hi)
        assert row["lo"] == lo and row["hi"] == hi and row["n"] == n
        assert abs(row["win_mean"] - round(w.mean(), 6)) < 2e-6


def test_wasserstein_drift_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 3000),
        "v": rng.integers(0, 400, 3000).astype(np.float64)})
    out = wasserstein_drift(_mk(df, 6), "g", "v").to_pandas()
    support = np.unique(df["v"].to_numpy())
    for _, row in out.iterrows():
        a = df.loc[df["g"] == row["g"], "v"].to_numpy()
        b = df.loc[df["g"] != row["g"], "v"].to_numpy()
        fa = np.searchsorted(np.sort(a), support, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), support, side="right") / len(b)
        w1 = float((np.diff(support) * np.abs(fa - fb)[:-1]).sum())
        assert row["n"] == len(a)
        assert abs(row["w1"] - w1) < 2e-6


def test_wasserstein_identical_groups_zero(ray_session):
    # two groups with the SAME multiset -> W1 == 0 exactly
    v = np.tile(np.arange(10, dtype=np.float64), 4)
    df = pd.DataFrame({"g": ["a"] * 20 + ["b"] * 20, "v": np.sort(v)})
    df["v"] = np.concatenate([np.repeat(np.arange(10.0), 2)] * 2)
    out = wasserstein_drift(_mk(df, 3), "g", "v").to_pandas()
    assert (out["w1"] == 0.0).all()


def test_transition_latency_brute(ray_session):
    rng = np.random.default_rng(9)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 60, n),
        "ts": pd.to_datetime(
            rng.integers(0, 10**7, n) * 1_000_000, unit="us"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c"], n)})
    out = transition_latency(_mk(df, 5)).to_pandas()
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    same = s["user_id"].to_numpy() == s["user_id"].shift(1).to_numpy()
    # pandas int64 view of datetime64[ns] is NANOSECONDS; the op works
    # in microseconds and floors to whole seconds
    gap = (s["ts"].astype("int64").to_numpy()
           - np.roll(s["ts"].astype("int64").to_numpy(), 1)) // 1_000_000_000
    brute = (pd.DataFrame({
        "prev_type": s["event_type"].shift(1).to_numpy(object),
        "next_type": s["event_type"].to_numpy(object),
        "gap_s": gap})[same]
        .groupby(["prev_type", "next_type"])["gap_s"]
        .agg(n="size", median_gap_s="median").reset_index())
    m = out.merge(brute, on=["prev_type", "next_type"],
                  suffixes=("", "_b"))
    assert len(m) == len(out) == len(brute)
    assert (m["n"] == m["n_b"]).all()
    assert (abs(m["median_gap_s"] - m["median_gap_s_b"]) < 1e-12).all()


def test_block_invariance_new_stats(ray_session):
    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 800),
        "v": rng.integers(0, 50, 800).astype(np.float64)})
    for fn in (lambda d: winsorized_mean(d, "g", "v").to_pandas(),
               lambda d: wasserstein_drift(d, "g", "v").to_pandas()):
        r1 = fn(_mk(df, 1))
        r8 = fn(_mk(df, 8))
        pd.testing.assert_frame_equal(r1, r8)


def test_peak_concurrency_brute(ray_session):
    rng = np.random.default_rng(17)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime(
            rng.integers(0, 3 * 86400 * 10**6, n), unit="us")})
    from raysketch.ops.window import peak_concurrency
    out = peak_concurrency(_mk(df, 6), "user_id", "ts").to_pandas()
    us = df["ts"].astype("int64").to_numpy() // 1000  # ns -> us
    dd = us // 86_400_000_000
    iv = (pd.DataFrame({"u": df["user_id"], "dd": dd, "t": us})
          .groupby(["u", "dd"]).agg(s=("t", "min"), e=("t", "max"))
          .reset_index())
    for day, sub in iv.groupby("dd"):
        t = np.concatenate([sub["s"].to_numpy(), sub["e"].to_numpy()])
        d = np.concatenate([np.ones(len(sub), int), -np.ones(len(sub), int)])
        o = np.lexsort((-d, t))
        peak = int(np.cumsum(d[o]).max())
        row = out[out["day_idx"] == day].iloc[0]
        assert row["n_keys"] == len(sub) and row["peak"] == peak


def test_lag_correlation_brute(ray_session):
    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            rng.integers(0, 200 * 3600 * 10**6, n), unit="us"),
        "event_type": rng.choice(["view", "purchase", "other"], n,
                                 p=[0.5, 0.2, 0.3])})
    from raysketch.ops.stats import lag_correlation
    out = lag_correlation(_mk(df, 5), "ts", "event_type",
                          "view", "purchase", max_lag=6).to_pandas()
    h = (df["ts"].astype("int64").to_numpy() // 1000) // 3_600_000_000
    h0, h1 = h.min(), h.max()
    nh = h1 - h0 + 1
    x = np.bincount((h - h0)[df["event_type"].to_numpy() == "view"],
                    minlength=nh)
    y = np.bincount((h - h0)[df["event_type"].to_numpy() == "purchase"],
                    minlength=nh)
    for _, row in out.iterrows():
        lag = int(row["lag"])
        xa, yb = x[:nh - lag].astype(float), y[lag:].astype(float)
        r = np.corrcoef(xa, yb)[0, 1]
        assert row["n"] == nh - lag
        assert abs(row["r"] - r) < 2e-6


def test_markov_stationary_props(ray_session):
    rng = np.random.default_rng(31)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, n),
        "ts": pd.to_datetime(rng.integers(0, 10**7, n) * 10**6, unit="us"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c", "d"], n,
                                 p=[0.5, 0.3, 0.1, 0.1])})
    from raysketch.ops.funnel import markov_stationary
    out1 = markov_stationary(_mk(df, 3)).to_pandas()
    out2 = markov_stationary(_mk(df, 9)).to_pandas()
    pd.testing.assert_frame_equal(out1, out2)  # block-invariant
    assert abs(out1["pi"].sum() - 1.0) < 1e-3  # near-stochastic
    assert (out1["pi"] >= 0).all()
    # heavy state should dominate the stationary mass
    assert out1.loc[out1["state"] == "a", "pi"].iloc[0] == out1["pi"].max()


def test_group_jsd_brute(ray_session):
    rng = np.random.default_rng(41)
    df = pd.DataFrame({
        "g": rng.choice(["s1", "s2", "s3"], 2000),
        "c": rng.choice(["en", "de", "fr"], 2000, p=[0.6, 0.3, 0.1])})
    from raysketch.ops.stats import group_jsd
    out = group_jsd(_mk(df, 4), "g", "c").to_pandas()
    for _, row in out.iterrows():
        a = df[df["g"] == row["g"]]["c"].value_counts()
        b = df[df["g"] != row["g"]]["c"].value_counts()
        na, nb = a.sum(), b.sum()
        jsd = 0.0
        for cat in set(df["c"]):
            p = a.get(cat, 0) / na
            q = b.get(cat, 0) / nb
            m = (p + q) / 2
            if p > 0:
                jsd += 0.5 * p * np.log(p / m)
            if q > 0:
                jsd += 0.5 * q * np.log(q / m)
        assert row["n"] == na
        assert abs(row["jsd"] - jsd) < 5e-6
        assert -1e-12 <= row["jsd"] <= np.log(2) + 1e-12


def test_kcore_crafted_and_routes(ray_session):
    import ray.data as rd
    from raysketch.ops.graph import kcore
    # triangle {1,2,3} + pendant chain 3-4-5: 2-core = the triangle,
    # and the chain forces TWO peel rounds (5 first, then 4)
    e = pd.DataFrame({"u": [1, 2, 1, 3, 4],
                      "v": [2, 3, 3, 4, 5]})
    out = kcore(rd.from_pandas(e).repartition(2), k=2).to_pandas()
    assert list(out["node"]) == [1, 2, 3]
    assert list(out["core_deg"]) == [2, 2, 2]
    # duplicate + reversed edge rows must not inflate degrees
    e_dup = pd.concat([e, e.rename(columns={"u": "v", "v": "u"}), e])
    out_d = kcore(rd.from_pandas(e_dup).repartition(3), k=2).to_pandas()
    pd.testing.assert_frame_equal(out, out_d)
    # empty core
    out_e = kcore(rd.from_pandas(e), k=3).to_pandas()
    assert len(out_e) == 0
    # distributed route (forced) must equal the driver route
    out_dist = kcore(rd.from_pandas(e_dup).repartition(3), k=2,
                     driver_fold_limit=0).to_pandas()
    pd.testing.assert_frame_equal(out, out_dist)


def test_kcore_random_vs_brute(ray_session):
    import ray.data as rd
    from raysketch.ops.graph import kcore
    rng = np.random.default_rng(13)
    m = 400
    e = pd.DataFrame({"u": rng.integers(0, 60, m),
                      "v": rng.integers(0, 60, m)})
    e = e[e["u"] != e["v"]]
    k = 5
    out = kcore(rd.from_pandas(e).repartition(4), k=k).to_pandas()
    # brute peel
    lo = np.minimum(e["u"], e["v"]).to_numpy()
    hi = np.maximum(e["u"], e["v"]).to_numpy()
    ee = pd.DataFrame({"u": lo, "v": hi}).drop_duplicates()
    u, v = ee["u"].to_numpy(), ee["v"].to_numpy()
    mask = np.ones(len(u), bool)
    while True:
        nodes, deg = np.unique(np.concatenate([u[mask], v[mask]]),
                               return_counts=True)
        weak = nodes[deg < k]
        if len(weak) == 0:
            break
        mask &= ~(np.isin(u, weak) | np.isin(v, weak))
        if not mask.any():
            break
    nodes, deg = (np.unique(np.concatenate([u[mask], v[mask]]),
                            return_counts=True)
                  if mask.any() else (np.zeros(0, np.int64),) * 2)
    assert list(out["node"]) == list(nodes)
    assert list(out["core_deg"]) == list(deg)


def test_substring_containment_brute(ray_session):
    import ray.data as rd
    from raysketch.ops.dedup import substring_containment
    rng = np.random.default_rng(29)
    base = ["the quick brown fox jumps over the lazy dog " * 3,
            "pack my box with five dozen liquor jugs today " * 3,
            "how vexingly quick daft zebras jump over fences " * 3]
    docs = []
    for i in range(60):
        b = base[i % 3]
        if i % 5 == 0:
            # an exact slice of another doc (guaranteed containment)
            s = int(rng.integers(0, 20))
            docs.append(b[s:s + 40])
        else:
            docs.append(b + f" tail {i}")
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": docs})
    out = substring_containment(
        rd.from_pandas(df).repartition(4)).to_pandas()
    got = set(zip(out["inner_id"], out["outer_id"]))
    want = {(a, b) for a in range(60) for b in range(60)
            if a != b and docs[a] in docs[b]}
    assert got == want and len(want) > 0


def test_substring_containment_short_docs(ray_session):
    import ray.data as rd
    from raysketch.ops.dedup import substring_containment
    # doc 0 is SHORTER than the 16-byte anchor window -> fallback path
    df = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": ["needle",
                 "a haystack with a needle inside, long enough text",
                 "no match here at all, also long enough to anchor"]})
    out = substring_containment(
        rd.from_pandas(df).repartition(2)).to_pandas()
    got = set(zip(out["inner_id"], out["outer_id"]))
    assert got == {(0, 1)}


def test_survival_curve_brute(ray_session):
    import ray.data as rd
    from raysketch.ops.stats import survival_curve
    rng = np.random.default_rng(37)
    n = 3000
    # sparse per-user activity so a healthy fraction of users' last
    # events fall before the censor horizon (i.e. real churn events)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 800, n),
        "ts": pd.to_datetime(
            rng.integers(0, 40 * 86400 * 10**6, n), unit="us")})
    out = survival_curve(rd.from_pandas(df).repartition(5),
                         "user_id", "ts", censor_days=7).to_pandas()
    us = df["ts"].astype("int64").to_numpy() // 1000
    iv = (pd.DataFrame({"u": df["user_id"], "t": us})
          .groupby("u")["t"].agg(["min", "max"]))
    end = iv["max"].max()
    dur = (iv["max"] - iv["min"]) // 86_400_000_000
    churn = iv["max"] < end - 7 * 86_400_000_000
    # brute KM with the integer micro product
    km, rows = 1_000_000, []
    for t in sorted(dur.unique()):
        nr = int((dur >= t).sum())
        d = int(((dur == t) & churn).sum())
        if d == 0:
            continue
        km = (km * (nr - d) + nr // 2) // nr
        rows.append((t, nr, d, km / 1e6))
    want = pd.DataFrame(rows, columns=["t_days", "n_risk",
                                       "n_churn", "survival"])
    assert len(out) == len(want) > 0
    for col in want.columns:
        assert (out[col].to_numpy() == want[col].to_numpy()).all(), col
    # survival is monotone nonincreasing, in (0, 1]
    assert (np.diff(out["survival"]) <= 0).all()
    assert out["survival"].iloc[0] <= 1.0 and out["survival"].iloc[-1] > 0


def test_score_calibration_props(ray_session):
    import ray.data as rd
    from raysketch.ops.stats import score_calibration
    rng = np.random.default_rng(43)
    n = 5000
    cents = rng.integers(0, 1000, n)
    # higher score -> more likely positive (monotone-ish calibration)
    y = rng.random(n) < cents / 1000.0
    df = pd.DataFrame({"value": cents / 100.0,
                       "label": np.where(y, "pos", "neg")})
    out = score_calibration(rd.from_pandas(df).repartition(4),
                            "value", "label", "pos").to_pandas()
    assert out["n"].sum() == n and out["n_pos"].sum() == int(y.sum())
    assert len(out) <= 10 and out["bin"].is_monotonic_increasing
    # first vs last bin rates reflect the monotone generator
    assert out["pos_rate"].iloc[-1] > out["pos_rate"].iloc[0]
    # mean_score stays within each bin's score range
    assert (out["mean_score"].to_numpy()
            <= out["mean_score"].to_numpy().max()).all()


def test_ngram_continuations_brute(ray_session):
    import ray.data as rd
    from raysketch.ops.text import ngram_continuations
    docs = ["a b a c a b", "b a b a", "c a c a b a"] * 30
    df = pd.DataFrame({"text": docs})
    out = ngram_continuations(rd.from_pandas(df).repartition(3),
                              topk=2, min_context=10).to_pandas() \
        .sort_values(["w1", "rnk"]).reset_index(drop=True)
    # brute
    from collections import Counter
    bg = Counter()
    for t in docs:
        ws = t.split()
        for i in range(len(ws) - 1):
            bg[(ws[i], ws[i + 1])] += 1
    ctx = Counter()
    for (u, _), c in bg.items():
        ctx[u] += c
    rows = []
    for u in sorted(ctx):
        if ctx[u] < 10:
            continue
        conts = sorted(((v, c) for (uu, v), c in bg.items() if uu == u),
                       key=lambda x: (-x[1], x[0]))[:2]
        for r, (v, c) in enumerate(conts, 1):
            rows.append((u, v, c, ctx[u], r))
    want = pd.DataFrame(rows, columns=["w1", "w2", "n_count",
                                       "n_from", "rnk"])
    assert len(out) == len(want) > 0
    for col in want.columns:
        assert (out[col].to_numpy(object)
                == want[col].to_numpy(object)).all(), col


def test_bigram_cond_entropy_props(ray_session):
    import ray.data as rd
    from raysketch.ops.text import bigram_cond_entropy
    # deterministic text: every context has ONE continuation -> H == 0
    df0 = pd.DataFrame({"text": ["a b c d"] * 20})
    out0 = bigram_cond_entropy(rd.from_pandas(df0).repartition(2)) \
        .to_pandas()
    assert out0["h_cond"][0] == 0.0
    # uniform 2-way branching -> H == ln 2 (exactly, up to micro round)
    df1 = pd.DataFrame({"text": ["a b", "a c"] * 50})
    out1 = bigram_cond_entropy(rd.from_pandas(df1).repartition(2)) \
        .to_pandas()
    assert abs(out1["h_cond"][0] - np.log(2)) < 1e-5
    # block invariance
    out2 = bigram_cond_entropy(rd.from_pandas(df1).repartition(7)) \
        .to_pandas()
    pd.testing.assert_frame_equal(out1, out2)


def test_pairwise_key_overlap_brute(ray_session):
    import ray.data as rd
    from raysketch.ops.setops import pairwise_key_overlap
    rng = np.random.default_rng(47)
    n = 2000
    df = pd.DataFrame({
        "g": rng.choice(["s1", "s2", "s3", "s4"], n),
        "k": rng.integers(0, 300, n).astype(str)})
    out = pairwise_key_overlap(rd.from_pandas(df).repartition(5),
                               "g", "k").to_pandas()
    from itertools import combinations
    rows = []
    for a, b in combinations(sorted(df["g"].unique()), 2):
        ca = df[df["g"] == a]["k"].value_counts()
        cb = df[df["g"] == b]["k"].value_counts()
        shared = set(ca.index) & set(cb.index)
        if shared:
            rows.append((a, b, len(shared),
                         int(sum(ca[s] * cb[s] for s in shared))))
    want = pd.DataFrame(rows, columns=["group_a", "group_b",
                                       "n_keys", "n_pairs"])
    assert len(out) == len(want)
    m = out.merge(want, on=["group_a", "group_b"], suffixes=("", "_w"))
    assert (m["n_keys"] == m["n_keys_w"]).all()
    assert (m["n_pairs"] == m["n_pairs_w"]).all()


def test_pairwise_key_overlap_disjoint_empty(ray_session):
    import ray.data as rd
    from raysketch.ops.setops import pairwise_key_overlap
    df = pd.DataFrame({"g": ["a"] * 5 + ["b"] * 5,
                       "k": [f"x{i}" for i in range(5)]
                            + [f"y{i}" for i in range(5)]})
    out = pairwise_key_overlap(rd.from_pandas(df).repartition(2),
                               "g", "k").to_pandas()
    assert len(out) == 0


def test_last_touch_attribution_brute(ray_session):
    import ray.data as rd
    from raysketch.ops.funnel import last_touch_attribution
    rng = np.random.default_rng(53)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 80, n),
        "ts": pd.to_datetime(
            rng.integers(0, 20 * 86400 * 10**6, n), unit="us"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["view", "purchase", "other"], n,
                                 p=[0.3, 0.2, 0.5])})
    out = last_touch_attribution(
        rd.from_pandas(df).repartition(6)).to_pandas()
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    vts = pd.Series(np.where(s["event_type"] == "view",
                             s["ts"].astype("int64") // 1000, np.nan),
                    index=s.index)
    lt = vts.groupby(s["user_id"].to_numpy()).ffill()
    conv = s["event_type"].to_numpy() == "purchase"
    pts = (s["ts"].astype("int64") // 1000).to_numpy()[conv]
    ltc = lt.to_numpy()[conv]
    delta = np.where(np.isnan(ltc), -1, (pts - ltc) // 1_000_000)
    from collections import Counter
    want = Counter()
    for d in delta:
        if d < 0:
            want["no_touch"] += 1
        elif d <= 3600:
            want["le_3600s"] += 1
        elif d <= 86400:
            want["le_86400s"] += 1
        elif d <= 604800:
            want["le_604800s"] += 1
        else:
            want["older"] += 1
    got = dict(zip(out["bucket"], out["n_conversions"]))
    assert got == {k: want.get(k, 0) for k in got}
    assert sum(got.values()) == int(conv.sum())


def test_edge_churn_crafted(ray_session):
    import ray.data as rd
    from raysketch.ops.graph import edge_churn
    # era 1 orders: {1:(a,b,c)} -> edges ab,ac,bc ; era 2: {2:(a,b),
    # 3:(c,d)} -> edges ab, cd.  stable=ab, dropped=ac,bc, new=cd
    m = pd.DataFrame({
        "g": [1, 1, 1, 2, 2, 3, 3],
        "i": [10, 20, 30, 10, 20, 30, 40],
        "era": [1, 1, 1, 2, 2, 2, 2]})
    out = edge_churn(rd.from_pandas(m).repartition(3),
                     "g", "i", "era").to_pandas()
    assert out.iloc[0].to_dict() == {
        "n_edges_a": 3, "n_edges_b": 2, "n_stable": 1,
        "n_new": 1, "n_dropped": 2}


def test_postings_compression_brute(ray_session):
    import ray.data as rd
    from raysketch.ops.text import postings_compression
    docs = ["alpha beta gamma", "beta gamma delta", "alpha delta",
            "gamma gamma gamma beta"] * 25
    df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64) * 3,
                       "text": docs})
    out = postings_compression(
        rd.from_pandas(df).repartition(4)).to_pandas()
    from collections import defaultdict
    post = defaultdict(set)
    for i, t in zip(df["doc_id"], df["text"]):
        for w in t.split():
            post[w].add(i)

    def vb(d):
        return 1 if d < 128 else 2 if d < 16384 else 3

    total = 0
    npost = 0
    for w, ids in post.items():
        prev = -1
        for i in sorted(ids):
            total += vb(i - prev)
            prev = i
            npost += 1
    assert out["n_terms"][0] == len(post)
    assert out["n_postings"][0] == npost
    assert out["varint_bytes"][0] == total
    assert out["raw_bytes"][0] == 8 * npost


def test_hapax_rate_brute(ray_session):
    import ray.data as rd
    from raysketch.ops.text import hapax_rate
    df = pd.DataFrame({
        "source": ["a", "a", "b"],
        "text": ["one two two three", "three four", "five five six"]})
    out = hapax_rate(rd.from_pandas(df).repartition(2),
                     "source").to_pandas()
    # source a: one(1) two(2) three(2) four(1) -> 4 terms, 2 hapax
    # source b: five(2) six(1) -> 2 terms, 1 hapax
    a = out[out["source"] == "a"].iloc[0]
    b = out[out["source"] == "b"].iloc[0]
    assert (a["n_terms"], a["n_hapax"]) == (4, 2)
    assert (b["n_terms"], b["n_hapax"]) == (2, 1)
    assert a["hapax_rate"] == 0.5 and b["hapax_rate"] == 0.5
