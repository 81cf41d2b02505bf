"""LM-statistics ops (ops/lm.py) and the bucketed-layout join
(ops/join.bucketed_copartition_join): brute-force parity on small
synthetic corpora, block-structure invariance, and layout semantics.
(The sf-corpus DuckDB oracles are gated in test_oracle_parity.py via
the pmi_cooccurrence / bigram_lm_scores / bucketed_join_layout
entries.)"""

import itertools
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(texts, npart=3):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    return rd.from_pandas(df).repartition(npart)


TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the mat and the log",
    "cats are not dogs",
    "the the the cat cat",
]


def _brute_pmi(texts, vocab_size, top_pairs):
    n_docs = len(texts)
    df = {}
    docsets = []
    for t in texts:
        s = set(t.split())
        docsets.append(s)
        for w in s:
            df[w] = df.get(w, 0) + 1
    vocab = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vset = {w for w, _ in vocab}
    dfm = dict(vocab)
    pairs = {}
    for s in docsets:
        u = sorted(s & vset)
        for a, b in itertools.combinations(u, 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    rows = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:top_pairs]
    out = []
    for (a, b), c in rows:
        pmi = math.log((c * n_docs) / (dfm[a] * dfm[b]))
        pmi = math.copysign(math.floor(abs(pmi) * 1e6 + 0.5), pmi) / 1e6
        out.append((a, b, c, pmi))
    return pd.DataFrame(out, columns=["tok_a", "tok_b", "n_docs", "pmi"])


@pytest.mark.usefixtures("ray_session")
def test_pmi_matches_brute_force_and_block_invariance():
    from raysketch.ops.lm import pmi_cooccurrence

    want = _brute_pmi(TEXTS, vocab_size=5, top_pairs=8)
    for npart in (1, 3, 6):
        got = pmi_cooccurrence(_docs_ds(TEXTS, npart), vocab_size=5,
                               top_pairs=8)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_pmi_sign_semantics():
    # tokens that always co-occur get pmi = ln(N/df) > 0; tokens that
    # co-occur less than independence predicts go negative
    from raysketch.ops.lm import pmi_cooccurrence

    texts = ["x y", "x y", "x y", "x z", "y w", "z w", "z w", "w x"]
    got = pmi_cooccurrence(_docs_ds(texts), vocab_size=4, top_pairs=10)
    got = got.set_index(["tok_a", "tok_b"])
    assert got.loc[("x", "y"), "pmi"] > 0
    assert got.loc[("w", "x"), "pmi"] < 0  # 1 doc vs 4*5/8 expected


def _brute_lm(texts):
    uni, bi = {}, {}
    for t in texts:
        w = t.split()
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(w, w[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    rows = []
    for i, t in enumerate(texts):
        w = t.split()
        if len(w) < 2:
            continue
        mn = 0
        for a, b in zip(w, w[1:]):
            lp = math.log((bi[(a, b)] + 1) / (uni[a] + V))
            mn += int(math.copysign(math.floor(abs(lp) * 1e6 + 0.5), lp))
        n = len(w) - 1
        avg = mn / (1e6 * n)
        avg = math.copysign(math.floor(abs(avg) * 1e6 + 0.5), avg) / 1e6
        rows.append((i, n, avg))
    return pd.DataFrame(rows, columns=["doc_id", "n_bigrams",
                                       "avg_logprob"])


@pytest.mark.usefixtures("ray_session")
def test_bigram_lm_matches_brute_force_and_block_invariance():
    from raysketch.ops.lm import bigram_lm_scores

    want = _brute_lm(TEXTS)
    for npart in (1, 4):
        got = bigram_lm_scores(_docs_ds(TEXTS, npart)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_bigram_lm_partitioned_attach_route_identity():
    # force the size-routed attach into the partitioned hash-join branch
    from raysketch.ops.lm import bigram_lm_scores

    want = _brute_lm(TEXTS)
    got = bigram_lm_scores(_docs_ds(TEXTS, 2), broadcast_limit_rows=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_pmi_empty_corpus():
    # an all-empty Dataset loses its schema (Ray 2.49) — the op must
    # return a typed empty frame, not KeyError on the lost 'df' column
    import ray.data as rd

    from raysketch.ops.lm import pmi_cooccurrence

    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype="object")}))
    out = pmi_cooccurrence(empty, vocab_size=8, top_pairs=5, n_docs=0)
    assert len(out) == 0
    assert list(out.columns) == ["tok_a", "tok_b", "n_docs", "pmi"]


@pytest.mark.usefixtures("ray_session")
def test_single_token_and_empty_docs_drop_out():
    from raysketch.ops.lm import bigram_lm_scores

    texts = ["only", "", "two words", "   "]
    got = bigram_lm_scores(_docs_ds(texts, 2)).to_pandas()
    assert got["doc_id"].tolist() == [2]
    assert got["n_bigrams"].tolist() == [1]


# ---------------------------------------------------------------------------
# bucketed co-partition join
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_bucketed_join_equals_broadcast_join(tmp_path):
    import ray.data as rd

    from raysketch.ops.join import (bucketed_copartition_join,
                                    broadcast_lookup_join)

    rng = np.random.default_rng(17)
    fact = pd.DataFrame({
        "fk": rng.integers(0, 150, 5000).astype(np.int64),  # 100.. unmatched
        "v": rng.integers(0, 10**6, 5000).astype(np.int64)})
    dim = pd.DataFrame({"dk": np.arange(100, dtype=np.int64),
                        "attr": np.arange(100, dtype=np.int64) * 7})
    f_ds = rd.from_pandas(fact).repartition(5)
    d_ds = rd.from_pandas(dim).repartition(2)

    joined, root = bucketed_copartition_join(
        f_ds, d_ds, "fk", "dk", ["attr"], n_buckets=8,
        layout_root=str(tmp_path / "layout"))
    got = joined.to_pandas().sort_values(["fk", "v"]).reset_index(drop=True)
    want = broadcast_lookup_join(
        rd.from_pandas(fact).repartition(5), rd.from_pandas(dim),
        "fk", "dk", ["attr"]).to_pandas() \
        .sort_values(["fk", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # layout persisted with hive dirs + _SUCCESS markers (reusable)
    import os

    assert os.path.exists(str(tmp_path / "layout/fact/_SUCCESS"))
    assert any(p.startswith("bucket=") for p in
               os.listdir(str(tmp_path / "layout/dim")))


@pytest.mark.usefixtures("ray_session")
def test_bucketed_join_rejects_duplicate_dim_keys(tmp_path):
    import ray.data as rd

    from raysketch.ops.join import bucketed_copartition_join

    fact = pd.DataFrame({"fk": np.arange(50, dtype=np.int64)})
    dim = pd.DataFrame({"dk": np.array([1, 1, 2], dtype=np.int64),
                        "attr": np.array([10, 11, 20], dtype=np.int64)})
    joined, _ = bucketed_copartition_join(
        rd.from_pandas(fact), rd.from_pandas(dim), "fk", "dk", ["attr"],
        n_buckets=4, layout_root=str(tmp_path / "dup"))
    with pytest.raises(Exception, match="unique"):
        joined.materialize()


@pytest.mark.usefixtures("ray_session")
def test_bucketed_join_null_key_refused(tmp_path):
    import ray.data as rd

    from raysketch.ops.join import bucketed_copartition_join

    fact = pd.DataFrame({"fk": pd.array([1, None, 3], dtype="Int64")})
    dim = pd.DataFrame({"dk": np.arange(4, dtype=np.int64),
                        "attr": np.arange(4, dtype=np.int64)})
    with pytest.raises(Exception, match="null join key"):
        bucketed_copartition_join(
            rd.from_pandas(fact), rd.from_pandas(dim), "fk", "dk",
            ["attr"], n_buckets=4, layout_root=str(tmp_path / "nulls"))


def test_range_join_equals_broadcast_join(tmp_path, ray_session):
    import ray.data as rd

    from raysketch.ops.join import (broadcast_lookup_join,
                                    range_copartition_join)

    rng = np.random.default_rng(21)
    fact = pd.DataFrame({
        "fk": rng.integers(0, 150, 5000).astype(np.int64),  # 100.. unmatched
        "v": rng.integers(0, 10**6, 5000).astype(np.int64)})
    dim = pd.DataFrame({"dk": np.arange(100, dtype=np.int64),
                        "attr": np.arange(100, dtype=np.int64) * 7})
    joined, root, bounds = range_copartition_join(
        rd.from_pandas(fact).repartition(5),
        rd.from_pandas(dim).repartition(2),
        "fk", "dk", ["attr"], n_shards=4,
        layout_root=str(tmp_path / "layout"))
    got = joined.to_pandas().sort_values(["fk", "v"]).reset_index(drop=True)
    want = broadcast_lookup_join(
        rd.from_pandas(fact).repartition(5), rd.from_pandas(dim),
        "fk", "dk", ["attr"]).to_pandas() \
        .sort_values(["fk", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
    # bounds are the dim key quantiles: sorted, usable for a 3rd table
    assert len(bounds) == 3 and (np.diff(bounds) >= 0).all()
    # shards are CONTIGUOUS key ranges on disk (the range-layout
    # contract the hash variant does not give)
    import glob

    import pyarrow.parquet as pq

    prev_max = -np.inf
    for s in range(4):
        files = glob.glob(str(tmp_path / "layout" / "dim"
                              / f"shard={s}" / "*.parquet"))
        if not files:
            continue
        k = np.concatenate([
            pq.read_table(f, columns=["dk"])["dk"].to_numpy()
            for f in files])
        assert k.min() > prev_max
        prev_max = k.max()


def test_range_join_rejects_duplicate_dim_keys(tmp_path, ray_session):
    import ray.data as rd

    from raysketch.ops.join import range_copartition_join

    fact = pd.DataFrame({"fk": np.array([1, 2], dtype=np.int64)})
    dim = pd.DataFrame({"dk": np.array([1, 1, 2], dtype=np.int64),
                        "attr": np.array([7, 8, 9], dtype=np.int64)})
    joined, _, _ = range_copartition_join(
        rd.from_pandas(fact), rd.from_pandas(dim), "fk", "dk",
        ["attr"], n_shards=2, layout_root=str(tmp_path / "dup"))
    with pytest.raises(Exception, match="unique"):
        joined.to_pandas()
