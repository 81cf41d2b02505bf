"""BM25 scoring: formula cross-check vs a hand-rolled reference,
edge cases (no matches, empty corpus, duplicate terms)."""

import math

import numpy as np
import pyarrow as pa

from raysketch.ops.text import bm25_topk
from raysketch.queries import round6


def _ds(ids, texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))


def _reference(ids, texts, terms, k1=1.2, b=0.75):
    toks = {i: (t or "").split() for i, t in zip(ids, texts)}
    n = len(ids)
    lens = {i: len(v) for i, v in toks.items()}
    nonempty = sum(1 for v in lens.values() if v > 0)
    avgdl = sum(lens.values()) / nonempty
    out = {}
    for i, v in toks.items():
        s = 0.0
        for q in dict.fromkeys(terms):
            df = sum(1 for w in toks.values() if q in w)
            tf = v.count(q)
            if tf:
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * lens[i] / avgdl))
        if s > 0:
            out[i] = round6(s)
    return out


def test_bm25_matches_reference(ray_session):
    rng = np.random.default_rng(4)
    vocab = ["hash", "join", "scan", "sort", "row", "col"]
    ids = list(range(40))
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
             for _ in ids]
    got = bm25_topk(_ds(ids, texts), ["hash", "join"], k=10)
    want = _reference(ids, texts, ["hash", "join"])
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got["doc_id"].tolist() == [i for i, _ in top]
    assert got["score"].tolist() == [s for _, s in top]


def test_bm25_edges(ray_session):
    # no doc contains any term -> empty result
    out = bm25_topk(_ds([1, 2], ["a b", "c d"]), ["zzz"], k=5)
    assert len(out) == 0
    # empty corpus
    out = bm25_topk(_ds([], []), ["x"], k=5)
    assert len(out) == 0 and list(out.columns) == ["doc_id", "score"]
    # duplicate query terms count once
    a = bm25_topk(_ds([1, 2], ["x y", "y y"]), ["y", "y"], k=5)
    bq = bm25_topk(_ds([1, 2], ["x y", "y y"]), ["y"], k=5)
    assert a.equals(bq)
