"""Round-4 seventh-session wave 4: mutual_best_match, oov_rate,
quantile warehouse (KLL payload persistence is covered by the
quantile_warehouse oracle at sf0.001 in test_oracle_parity)."""

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.similarity import mutual_best_match
from raysketch.ops.text import oov_rate


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


# ---------------------------------------------------------------------------
# mutual_best_match
# ---------------------------------------------------------------------------

def test_mutual_best_match_matches_brute(ray_session):
    rng = np.random.default_rng(11)
    n, d = 80, 6
    X = rng.normal(size=(n, d))
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r.astype(np.float32) for r in X]})
    got = mutual_best_match(_mk(df)).to_pandas()
    Xd = X.astype(np.float32).astype(np.float64)
    nrm = np.sqrt((Xd * Xd).sum(axis=1))
    cos = (Xd @ Xd.T) / (nrm[:, None] * nrm[None, :])
    micro = (np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)) \
        .astype(np.int64)
    best = np.empty(n, dtype=np.int64)
    for i in range(n):
        cand = sorted((-int(micro[i, j]), j) for j in range(n) if j != i)
        best[i] = cand[0][1]
    pairs = sorted((a, int(best[a])) for a in range(n)
                   if best[best[a]] == a and a < best[a])
    assert list(zip(got["a"], got["b"])) == pairs
    for _, r in got.iterrows():
        assert r["cos"] == micro[int(r["a"]), int(r["b"])] / 1e6


def test_mutual_best_match_planted_pair(ray_session):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(30, 8))
    X[7] = X[21] * 1.5  # same direction: guaranteed mutual top-1
    df = pd.DataFrame({
        "vec_id": np.arange(30, dtype=np.int64),
        "embedding": [r.astype(np.float32) for r in X]})
    got = mutual_best_match(_mk(df, 3)).to_pandas()
    assert (7, 21) in set(zip(got["a"], got["b"]))
    with pytest.raises(ValueError, match=">= 2"):
        mutual_best_match(_mk(df.head(1), 1))


# ---------------------------------------------------------------------------
# oov_rate
# ---------------------------------------------------------------------------

def test_oov_rate_matches_brute(ray_session):
    rng = np.random.default_rng(5)
    vocab_words = [f"w{i}" for i in range(40)]
    texts, groups = [], []
    for i in range(200):
        g = "a" if i % 3 else "b"
        # zipf-ish frequencies so the top-10 cut is meaningful
        words = rng.choice(vocab_words, size=rng.integers(3, 30),
                           p=np.arange(40, 0, -1) / np.arange(40, 0, -1).sum())
        texts.append(" ".join(words))
        groups.append(g)
    df = pd.DataFrame({"source": groups, "text": texts})
    got = oov_rate(_mk(df, 5), "source", "text", vocab_k=10).to_pandas()
    ex = df.assign(tok=df["text"].str.split()).explode("tok")
    counts = ex["tok"].value_counts()
    order = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {t for t, _ in order[:10]}
    for g, sub in ex.groupby("source"):
        nt = len(sub)
        no = int((~sub["tok"].isin(vocab)).sum())
        row = got[got["source"] == g].iloc[0]
        assert int(row["n_tokens"]) == nt and int(row["n_oov"]) == no
        assert row["oov_rate"] == np.floor(no / nt * 1e6 + 0.5) / 1e6


def test_oov_rate_block_invariant(ray_session):
    df = pd.DataFrame({
        "source": ["s1", "s2"] * 50,
        "text": [f"tok{i % 7} tok{i % 3} rare{i}" for i in range(100)]})
    a = oov_rate(_mk(df, 1), vocab_k=5).to_pandas()
    b = oov_rate(_mk(df, 9), vocab_k=5).to_pandas()
    pd.testing.assert_frame_equal(a, b)
