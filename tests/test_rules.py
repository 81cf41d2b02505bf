"""Quality-filter rules (ops/rules.py): hand-computed values on
synthetic docs, brute-force parity, block invariance. (Corpus-scale
DuckDB oracles are gated in test_oracle_parity.py via
repetition_profile / token_entropy / span_dedup_profile.)"""

import math

import numpy as np
import pandas as pd
import pytest


def _ds(texts, npart=3):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    return rd.from_pandas(df).repartition(npart)


def _round6(x):
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


@pytest.mark.usefixtures("ray_session")
def test_repetition_stats_hand_values():
    from raysketch.ops.rules import repetition_stats

    texts = [
        "a b a b a b",       # bigrams: ab,ba,ab,ba,ab -> top 3/5, dup 5/5
        "p q r s t u",       # all bigrams unique -> top 1/5, dup 0
        "solo",              # one token: no bigrams -> fracs 0.0
    ]
    got = repetition_stats(_ds(texts)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_tokens"].tolist() == [6, 6, 1]
    assert got["ttr"].tolist() == [
        _round6(2 / 6), _round6(6 / 6), _round6(1 / 1)]
    assert got["top2_frac"].tolist() == [_round6(3 / 5), _round6(1 / 5), 0.0]
    assert got["dup2_frac"].tolist() == [1.0, 0.0, 0.0]
    # keep: doc0 fails top2 (0.6 > 0.2) and ttr ok? ttr=0.333 >= 0.2 but
    # top2 0.6 > 0.2 -> drop; doc1 keeps; doc2 keeps (fracs 0, ttr 1)
    assert got["keep"].tolist() == [0, 1, 1]


@pytest.mark.usefixtures("ray_session")
def test_repetition_stats_block_invariance():
    from raysketch.ops.rules import repetition_stats

    rng = np.random.default_rng(7)
    vocab = np.array(list("abcdefgh"))
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
             for _ in range(40)]
    a = repetition_stats(_ds(texts, npart=1)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = repetition_stats(_ds(texts, npart=7)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_token_entropy_hand_values():
    from raysketch.ops.rules import token_entropy

    got = token_entropy(_ds(["a a b b", "x x x x", "u v w"])) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc0: n=4, counts {2,2}; s = 2*round(2 ln2 *1e6) micro
    m22 = math.floor(2 * math.log(2.0) * 1e6 + 0.5)
    assert got.loc[0, "s_micro"] == 2 * m22
    assert got.loc[0, "entropy"] == _round6(
        math.log(4.0) - (2 * m22 / 1e6) / 4.0)
    # doc1: single word -> H = ln4 - (4 ln4)/4 = 0
    m4 = math.floor(4 * math.log(4.0) * 1e6 + 0.5)
    assert got.loc[1, "s_micro"] == m4
    assert got.loc[1, "entropy"] == _round6(math.log(4.0) - m4 / 1e6 / 4.0)
    # doc2: uniform distinct -> H = ln3 exactly (each c=1, ln1=0)
    assert got.loc[2, "s_micro"] == 0
    assert got.loc[2, "entropy"] == _round6(math.log(3.0))
    assert got["n_distinct"].tolist() == [2, 1, 3]


@pytest.mark.usefixtures("ray_session")
def test_duplicate_span_profile_brute_parity():
    from raysketch.ops.rules import duplicate_span_profile

    rng = np.random.default_rng(11)
    vocab = np.array(list("abcde"))
    n = 3
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 12)))
             for _ in range(30)]
    got = duplicate_span_profile(_ds(texts, npart=5), n=n).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # brute force
    spans = {}
    per_doc = {}
    for d, t in enumerate(texts):
        toks = t.split()
        ss = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        if ss:
            per_doc[d] = ss
            for s in ss:
                spans.setdefault(s, set()).add(d)
    exp = pd.DataFrame([
        {"doc_id": d, "n_spans": len(ss),
         "n_shared_spans": sum(1 for s in ss if len(spans[s]) >= 2)}
        for d, ss in sorted(per_doc.items())])
    exp["shared_frac"] = [
        _round6(r.n_shared_spans / r.n_spans) for r in exp.itertuples()]
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_spans"].tolist() == exp["n_spans"].tolist()
    assert got["n_shared_spans"].tolist() == exp["n_shared_spans"].tolist()
    assert got["shared_frac"].tolist() == exp["shared_frac"].tolist()
    # some sharing must actually occur for the test to mean anything
    assert got["n_shared_spans"].sum() > 0
    with pytest.raises(ValueError):
        duplicate_span_profile(_ds(texts), n=0)


@pytest.mark.usefixtures("ray_session")
def test_duplicate_span_profile_block_invariance():
    from raysketch.ops.rules import duplicate_span_profile

    texts = ["one two three four", "zero one two three four five",
             "unrelated words entirely here", "one two three nine"]
    a = duplicate_span_profile(_ds(texts, npart=1), n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = duplicate_span_profile(_ds(texts, npart=4), n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # "one two three" appears in docs 0, 1, 3; "two three four" in 0, 1
    d0 = a[a.doc_id == 0].iloc[0]
    assert d0["n_spans"] == 2 and d0["n_shared_spans"] == 2
    d3 = a[a.doc_id == 3].iloc[0]
    assert d3["n_spans"] == 2 and d3["n_shared_spans"] == 1


@pytest.mark.usefixtures("ray_session")
def test_ks_drift_brute_parity():
    import ray.data as rd

    from raysketch.ops.rules import ks_drift

    rng = np.random.default_rng(13)
    # source B drawn from a shifted distribution -> high KS vs rest
    rows = []
    for _ in range(300):
        rows.append(("A", int(rng.integers(0, 30))))
    for _ in range(200):
        rows.append(("B", int(rng.integers(20, 50))))
    for _ in range(250):
        rows.append(("C", int(rng.integers(0, 30))))
    df = pd.DataFrame(rows, columns=["source", "n_chars"])
    got = ks_drift(rd.from_pandas(df).repartition(5),
                   "source", "n_chars").to_pandas()

    # brute force ECDF distance per group vs the complement
    vals = np.sort(df["n_chars"].unique())
    exp = {}
    for g in ["A", "B", "C"]:
        x = df.loc[df["source"] == g, "n_chars"].to_numpy()
        y = df.loc[df["source"] != g, "n_chars"].to_numpy()
        fx = np.searchsorted(np.sort(x), vals, side="right") / len(x)
        fy = np.searchsorted(np.sort(y), vals, side="right") / len(y)
        exp[g] = np.abs(fx - fy).max()
    assert got["source"].tolist() == ["A", "B", "C"]
    for g, ks in zip(got["source"], got["ks"]):
        assert abs(ks - exp[g]) < 2e-6, (g, ks, exp[g])
    # the shifted source must dominate
    ks = dict(zip(got["source"], got["ks"]))
    assert ks["B"] > ks["A"] and ks["B"] > ks["C"]
    assert ks["B"] > 0.5
    assert got["n_rows"].tolist() == [300, 200, 250]
