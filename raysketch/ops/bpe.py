"""Byte-pair-encoding tokenizer training and application — the
tokenizer-construction step of an LLM data pipeline.

Structure follows the standard BPE trainer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm): the CORPUS-scale work is a single distributed word-count
pass (per-block ``value_counts`` partials + one coarse-bucket fold —
the engine's token_topk discipline, shuffle volume bounded by distinct
words); the merge loop then runs over the WEIGHTED VOCABULARY, which is
corpus-size-independent (a trillion-file corpus still folds to its
distinct-word table). Every step is deterministic: pair selection is
(count DESC, pair lexicographic ASC), so two runs — or a kill/re-run —
produce identical merge tables.

``bpe_encode`` applies a trained merge table to a Dataset as a
streaming ``map_batches`` stage with a per-call merge-rank dict
(greedy lowest-rank-first merging, the standard apply rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

END = "</w>"


def word_counts(ds, text_col: str = "text"):
    """Distributed (word, n) fold over whitespace tokens — the ONE
    corpus-scale pass of BPE training."""
    from ..engine.hashing import append_coarse_bucket

    def partial(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pylist(), dtype="object")
        ex = s.str.split().explode().dropna()
        if ex.empty:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = ex.value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(dtype=object),
                                          pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    def bucket(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(b, ["word"], 256, "wb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("word", sort=False)["n"].sum().reset_index()

    return ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(bucket, batch_format="pyarrow").groupby(
            "wb").map_groups(lambda g: fold(g.drop(columns=["wb"])),
                             batch_format="pandas")


def bpe_train(wc: pd.DataFrame, n_merges: int = 64) -> pd.DataFrame:
    """Deterministic BPE merge table from a (word, n) frequency frame.

    Each word is a symbol sequence (its characters + the ``</w>``
    end-of-word marker); each round merges the pair with the highest
    weighted count (ties: lexicographically smallest (left, right)).
    Returns a frame (rank, left, right, merged, pair_count); stops
    early when no pair occurs twice. Vocabulary-sized compute — at any
    corpus scale this runs on the distinct-word table, never rows."""
    seqs: list[list[str]] = [list(w) + [END] for w in wc["word"]]
    weights = wc["n"].to_numpy(np.int64)
    merges = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, wgt in zip(seqs, weights):
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + int(wgt)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merged = left + right
        for seq in seqs:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == left and seq[i + 1] == right:
                    seq[i:i + 2] = [merged]
                else:
                    i += 1
        merges.append((rank, left, right, merged, cnt))
    return pd.DataFrame(merges, columns=["rank", "left", "right",
                                         "merged", "pair_count"])


def _encode_word(word: str, rank_of: dict[tuple[str, str], int]) -> list[str]:
    seq = list(word) + [END]
    while len(seq) > 1:
        best_i, best_r = -1, None
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = rank_of.get(pair)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_encode(ds, merges: pd.DataFrame, id_col: str = "doc_id",
               text_col: str = "text"):
    """Streaming apply: Dataset of (doc_id, n_words, n_bpe_tokens) under
    the trained merge table (greedy lowest-rank-first, the standard
    rule). The merge table broadcasts via closure capture — it is
    n_merges rows by construction. Per-batch work caches each DISTINCT
    word's encoding once (Zipf makes the cache hit rate high)."""
    rank_of = {(l, r): int(k) for k, l, r in
               zip(merges["rank"], merges["left"], merges["right"])}

    def encode(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pylist(), dtype="object").fillna("")
        cache: dict[str, int] = {}
        n_words, n_tok = [], []
        for t in s:
            ws = t.split()
            total = 0
            for w in ws:
                hit = cache.get(w)
                if hit is None:
                    hit = len(_encode_word(w, rank_of))
                    cache[w] = hit
                total += hit
            n_words.append(len(ws))
            n_tok.append(total)
        return pa.table({
            id_col: batch[id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_tok, pa.int64()),
        })

    return ds.map_batches(encode, batch_format="pyarrow")
