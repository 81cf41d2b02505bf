"""Text-analysis operators for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` transforms; the stateful ones
(compiled regexes, stopword tables) are callable classes → Ray actor pools
(setup once per actor in ``__init__``, per-batch work in ``__call__``).

Operators:
- :class:`TokenCounter` — exact per-doc token counts (whitespace and a
  BPE-ish word/punct regex).
- :class:`LangId` — n-gram/stopword heuristic language ID (en/de/es/fr +
  CJK ratio for zh — the languages of the test corpus).
- :class:`QualityScorer` — length / punctuation / stopword / repetition
  ratios (the standard pretraining-quality heuristics).
- :func:`fingerprint_batch` — 64-bit rolling-hash document fingerprint
  (Rabin–Karp over a sliding byte window, min-sampled), the cheap
  containment fingerprint.
- :func:`ngram_count_partial` — per-block word n-gram counts (the
  language-model count partial; one split+explode over the whole block,
  consecutive-run masking, one value_counts — no per-doc loop).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu", "den"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "es", "por"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "dans", "pour"},
}


class TokenCounter:
    """Exact token counting — whitespace tokens and word-ish (BPE-style
    pre-tokenization) tokens per document."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        # GPT-2-ish pre-tokenizer shape: word chars | single non-space symbol
        self.word_re = re.compile(r"\w+|[^\w\s]", re.UNICODE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ws = np.fromiter(
            (len(t.split()) if t else 0 for t in texts), dtype=np.int64, count=len(texts)
        )
        bpe = np.fromiter(
            (len(self.word_re.findall(t)) if t else 0 for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        batch = batch.append_column("n_tokens_ws", pa.array(ws, pa.int64()))
        batch = batch.append_column("n_tokens_re", pa.array(bpe, pa.int64()))
        return batch


class LangId:
    """Heuristic language ID: stopword hit-rates per language + CJK
    character ratio. Deterministic; ties broken by fixed language order."""

    LANGS = ("en", "de", "es", "fr")

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred") -> None:
        self.text_col = text_col
        self.out_col = out_col
        self.word_re = re.compile(r"[a-zA-Zàâäéèêëïîôöùûüñáíóúß]+")
        self.cjk_re = re.compile(r"[一-鿿぀-ヿ]")

    def classify(self, text: str) -> str:
        """Single-doc convenience — same kernel as the batch path."""
        t = pa.table({self.text_col: pa.array([text], pa.string())})
        return self(t)[self.out_col][0].as_py()

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Fully vectorized: ONE findall+explode over the batch's whole
        word stream, one ``isin`` per language with index-grouped sums
        (the QualityScorer pattern) — no per-doc python loop. Tie-break
        preserved: ``argmax`` takes the FIRST language at the max score,
        identical to the strictly-greater scan over (en, de, es, fr)."""
        s = pd.Series(batch[self.text_col].to_pylist(), dtype="object").fillna("")
        n_chars = s.str.len().to_numpy(np.float64)
        cjk = s.str.count(self.cjk_re).to_numpy(np.float64)
        words = s.str.findall(self.word_re)
        n_words = words.str.len().to_numpy(np.float64)
        hits = np.zeros((len(s), len(self.LANGS)))
        ex = words.explode().dropna()
        if len(ex):
            low = ex.str.lower()
            for i, lang in enumerate(self.LANGS):
                h = low.isin(_STOPWORDS[lang])
                hits[:, i] = h.groupby(level=0).sum().reindex(
                    s.index, fill_value=0).to_numpy(np.float64)
        scores = hits / np.maximum(n_words, 1)[:, None]
        best_idx = np.argmax(scores, axis=1)
        best = scores[np.arange(len(s)), best_idx]
        preds = np.array(self.LANGS, dtype=object)[best_idx]
        preds[best <= 0.0] = "und"          # all-zero hit rates
        preds[n_words == 0] = "und"         # no latin-ish words at all
        preds[cjk / np.maximum(n_chars, 1) > 0.05] = "zh"  # CJK overrides
        preds[n_chars == 0] = "und"         # empty text
        return batch.append_column(self.out_col, pa.array(preds, pa.string()))


class QualityScorer:
    """Pretraining quality heuristics per document (all vectorized pandas
    string kernels): char/word counts, punctuation & digit & whitespace
    ratios, stopword ratio, mean word length, max line length, and a
    composite [0,1] score."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.stop = frozenset().union(*_STOPWORDS.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[self.text_col].to_pylist(), dtype="object").fillna("")
        n_chars = s.str.len().to_numpy(np.float64)
        words = s.str.split()
        n_words = words.str.len().fillna(0).to_numpy(np.float64)
        punct = s.str.count(r"[^\w\s]").to_numpy(np.float64)
        digits = s.str.count(r"\d").to_numpy(np.float64)
        # vectorized per-word passes: ONE explode over the batch's whole
        # word stream, then index-grouped sums (no per-doc python lambdas)
        ex = words.explode().dropna()
        if len(ex):
            hit = ex.str.lower().isin(self.stop)
            stop_sum = hit.groupby(level=0).sum()
            wlen_sum = ex.str.len().groupby(level=0).sum()
            stop_hits = stop_sum.reindex(s.index, fill_value=0).to_numpy(np.float64)
            total_wlen = wlen_sum.reindex(s.index, fill_value=0).to_numpy(np.float64)
        else:
            stop_hits = np.zeros(len(s))
            total_wlen = np.zeros(len(s))
        mean_wlen = np.divide(total_wlen, np.maximum(n_words, 1))
        safe_chars = np.maximum(n_chars, 1)
        punct_ratio = punct / safe_chars
        digit_ratio = digits / safe_chars
        stop_ratio = stop_hits / np.maximum(n_words, 1)
        # composite: reward stopwords & sane word length, punish symbol soup
        score = np.clip(
            0.5 * np.clip(stop_ratio * 3, 0, 1)
            + 0.3 * np.clip(1 - np.abs(mean_wlen - 5) / 5, 0, 1)
            + 0.2 * np.clip(1 - punct_ratio * 4, 0, 1),
            0.0,
            1.0,
        )
        for name, arr, typ in [
            ("q_n_words", n_words, pa.int64()),
            ("q_punct_ratio", punct_ratio, pa.float64()),
            ("q_digit_ratio", digit_ratio, pa.float64()),
            ("q_stop_ratio", stop_ratio, pa.float64()),
            ("q_mean_word_len", mean_wlen, pa.float64()),
            ("q_score", score, pa.float64()),
        ]:
            col = arr.astype(np.int64) if typ == pa.int64() else arr
            batch = batch.append_column(name, pa.array(col, typ))
        return batch


_FP_BASE = np.uint64(1099511628211)  # FNV prime as the rolling base


def fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 16, keep: int = 8
) -> pa.Table:
    """Rabin–Karp rolling-hash fingerprints: hash every `window`-byte
    sliding window, keep the `keep` smallest hashes (min-sampling → a
    containment-comparable fingerprint), plus their min as a single
    ``fingerprint`` column. Deterministic.

    Fully vectorized across the batch (the padded-blob trick from
    ``dedup._batch_shingle_hashes``): docs shorter than ``window`` are
    LEFT-zero-padded to ``window`` bytes — leading zeros contribute 0 to
    every polynomial term, so the single padded window hashes to exactly
    the short-doc polynomial hash — then ONE rolling-hash pass covers the
    whole batch blob and per-doc unique/top-``keep`` selection runs as a
    segmented sort (lexsort + run-boundary masks), no per-doc loop."""
    enc = [(t or "").encode("utf-8") for t in batch[text_col].to_pylist()]
    ndocs = len(enc)
    if ndocs == 0:
        batch = batch.append_column(
            "fingerprints", pa.array([], pa.list_(pa.uint64())))
        return batch.append_column("fingerprint", pa.array([], pa.uint64()))
    enc = [e if len(e) >= window else b"\x00" * (window - len(e)) + e
           for e in enc]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=ndocs)
    counts = lens - window + 1  # windows per doc (>= 1)
    arr = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
    n_win = arr.size - window + 1
    h = np.zeros(n_win, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # h[i] = sum_j base^(w-1-j) * byte[i+j], O(window) passes over the
        # blob instead of a (n_win, window) materialized product
        pows = _FP_BASE ** np.arange(window - 1, -1, -1, dtype=np.uint64)
        for j in range(window):
            h += arr[j : j + n_win] * pows[j]
    starts = np.concatenate([[0], np.cumsum(lens[:-1])])
    idx = np.concatenate(
        [np.arange(s, s + c) for s, c in zip(starts, counts)])
    hw = h[idx]  # only windows fully inside their own doc
    seg = np.repeat(np.arange(ndocs), counts)
    order = np.lexsort((hw, seg))  # sort by (doc, hash)
    hs, ss = hw[order], seg[order]
    uniq = np.ones(hs.size, dtype=bool)  # drop within-doc duplicate hashes
    uniq[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
    hu, su = hs[uniq], ss[uniq]
    first = np.ones(su.size, dtype=bool)
    first[1:] = su[1:] != su[:-1]
    gidx = np.arange(su.size)
    rank = gidx - np.maximum.accumulate(np.where(first, gidx, 0))
    keepmask = rank < keep  # smallest `keep` per doc (sorted ascending)
    hk, sk = hu[keepmask], su[keepmask]
    kept_counts = np.bincount(sk, minlength=ndocs)
    offsets = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32)
    fps = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(hk, pa.uint64()))
    mins = hu[first]  # first unique per doc == its min hash
    batch = batch.append_column("fingerprints", fps)
    return batch.append_column("fingerprint", pa.array(mins, pa.uint64()))


def ngram_count_partial(
    batch: pa.Table, text_col: str = "text", n: int = 2, sep: str = " "
) -> pa.Table:
    """Per-block word n-gram counts → ``(ngram, n_count)`` partial rows.

    The map side of an n-gram language-model count (the classic
    large-corpus pipeline): tokens are whitespace words (``str.split``
    semantics — runs of whitespace, no empty tokens), an n-gram is ``n``
    CONSECUTIVE words of one document joined by ``sep``. Fully
    vectorized: one split+explode over the block's whole word stream,
    a same-document run mask over the exploded index (n-grams never
    cross document boundaries), one ``value_counts``. The caller folds
    partials with a coarse-bucket groupby (see ``queries._count_topk``)
    so shuffle volume is bounded by the block's DISTINCT n-grams, never
    its token count.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    s = pd.Series(batch[text_col].to_pylist(), dtype="object").dropna()
    ex = s.str.split().explode().dropna()
    if len(ex) < n:
        return pa.table({"ngram": pa.array([], pa.string()),
                         "n_count": pa.array([], pa.int64())})
    idx = ex.index.to_numpy()
    w = ex.to_numpy(dtype=object)
    m = len(w) - n + 1
    # rows i where words i..i+n-1 all belong to the same document
    same = np.ones(m, dtype=bool)
    for j in range(n - 1):
        same &= idx[j : j + m] == idx[j + 1 : j + 1 + m]
    if not same.any():
        return pa.table({"ngram": pa.array([], pa.string()),
                         "n_count": pa.array([], pa.int64())})
    grams = w[:m][same]
    for j in range(1, n):
        grams = grams + sep + w[j : j + m][same]
    vc = pd.Series(grams).value_counts()
    return pa.table(
        {"ngram": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
         "n_count": pa.array(vc.to_numpy(np.int64), pa.int64())}
    )


def tfidf_top_terms(ds, id_col: str = "doc_id", text_col: str = "text",
                    n: int = 1, n_docs: int | None = None):
    """Per-document top-``n`` TF-IDF terms — the keyword-extraction /
    term-weighting pipeline. Score = ``tf * ln(N / df)`` with raw term
    frequency ``tf``, document frequency ``df``, corpus size ``N``.

    Scale shape (every stage streams):
    1. TF: one split+explode+groupby per block. Each document is ONE
       input row, so per-block (doc, term, tf) rows are already final —
       no cross-block fold.
    2. DF: the tf rows collapse per block to distinct (term, 1) partials,
       then one coarse-bucket ``hash(term)`` shuffle sums them —
       vocabulary-sized, never corpus-sized.
    3. IDF attach: SIZE-ROUTED (``ops.join.attach_by_key``) — the
       (term, df) table broadcasts once via ``ray.put`` while it fits
       the limit (the tf stream resolves each batch with one vectorized
       ``index_in``); a vocabulary beyond worker memory routes to the
       native partitioned hash join automatically (same contract as
       ops/dedup.attach_pair_payloads).
    4. Per-doc top-n: ``ops.topk.grouped_topn`` (map-side pre-filter,
       coarse-bucket re-select; ties broken by term ascending).

    Returns a Dataset of (id_col, term, tf, df, tfidf, rank). Documents
    with no tokens are absent (they have no terms to rank).
    """
    import pyarrow.compute as pc  # noqa: F401

    from .join import attach_by_key
    from .topk import grouped_topn

    if n_docs is None:
        n_docs = ds.count()
    n_docs_f = float(n_docs)

    def tf_partial(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pylist(), dtype="object")
        words = s.str.split().explode().dropna()
        if not len(words):
            return pa.table({
                id_col: pa.array([], batch.schema.field(id_col).type),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64())})
        df = pd.DataFrame({"i": words.index.to_numpy(),
                           "term": words.to_numpy(dtype=object)})
        g = df.groupby(["i", "term"], sort=False).size().reset_index(name="tf")
        out = batch.select([id_col]).take(pa.array(g["i"].to_numpy()))
        out = out.append_column(
            "term", pa.array(g["term"].to_numpy(dtype=object), pa.string()))
        return out.append_column(
            "tf", pa.array(g["tf"].to_numpy(np.int64), pa.int64()))

    tf_ds = ds.map_batches(tf_partial, batch_format="pyarrow")

    from ..engine.hashing import hash64_batch_aligned

    def df_partial(batch: pa.Table) -> pa.Table:
        # (doc, term) rows are distinct → per-block df partial is a
        # value_counts over terms
        vc = pd.Series(batch["term"].to_pylist(), dtype="object").value_counts()
        t = pa.table({
            "term": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
            "df": pa.array(vc.to_numpy(np.int64), pa.int64())})
        h, _ = hash64_batch_aligned(t["term"])
        return t.append_column(
            "tb", pa.array((h % np.uint64(256)).astype(np.int64), pa.int64()))

    def df_fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("term", sort=False)["df"].sum().reset_index()

    df_ds = tf_ds.map_batches(df_partial, batch_format="pyarrow").groupby(
        "tb").map_groups(lambda g: df_fold(g.drop(columns=["tb"])),
                         batch_format="pandas")

    scored = attach_by_key(tf_ds, df_ds, "term", "term", ["df"])

    def score(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        # exact expression mirrored by the SQL oracle: tf * ln(N / df)
        return batch.append_column(
            "tfidf", pa.array(tf * np.log(n_docs_f / dfv), pa.float64()))

    scored = scored.map_batches(score, batch_format="pyarrow")
    return grouped_topn(scored, id_col, "tfidf", n, tiebreak_col="term",
                        carry_cols=["tf", "df"])


# ---------------------------------------------------------------------------
# BM25 relevance scoring
# ---------------------------------------------------------------------------

def bm25_topk(ds, terms: list[str], id_col: str = "doc_id",
              text_col: str = "text", k: int = 20,
              k1: float = 1.2, b: float = 0.75):
    """Top-k documents by BM25 for a fixed query-term set (the Lucene
    idf variant: ``ln((N - df + 0.5)/(df + 0.5) + 1)``; avgdl averages
    over docs with >= 1 token). Two streaming passes, both vectorized:

    - pass 1 reduces each block to ONE stats row (n_docs,
      docs-with-tokens, total token count, per-term df via one exploded
      isin + drop_duplicates — no per-doc loop); the driver folds
      blocks x 1 rows into (idf per term, avgdl).
    - pass 2 broadcasts the tiny (terms, idf, avgdl) tuple, scores each
      block with one pivoted tf matrix, keeps a block-local top-k of
      ROUNDED (round6) scores; the driver resorts candidates once.

    Returns a driver pandas DataFrame (doc_id, score) of <= k rows,
    sorted by (score desc, doc_id) on round6 scores so the SQL oracle
    replays the exact cutoff."""
    from ..queries import round6

    terms = list(dict.fromkeys(terms))

    def stats(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pylist(), dtype="object").fillna("")
        toks = s.str.split()
        lens = toks.str.len()
        ex = toks.explode().dropna()
        fl = ex[ex.isin(terms)]
        pairs = fl.reset_index().drop_duplicates()
        dfc = pairs.groupby(pairs.columns[1], sort=False).size()
        return pa.table({
            "n_docs": pa.array([len(s)], pa.int64()),
            "n_docs_tok": pa.array([int((lens > 0).sum())], pa.int64()),
            "total_len": pa.array([int(lens.sum())], pa.int64()),
            "df": pa.array([[int(dfc.get(t, 0)) for t in terms]],
                           pa.list_(pa.int64())),
        })

    parts = ds.select_columns([text_col]).map_batches(
        stats, batch_format="pyarrow").to_pandas()
    if len(parts) == 0 or int(parts["n_docs_tok"].sum()) == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    n = float(parts["n_docs"].sum())
    avgdl = float(parts["total_len"].sum()) / float(parts["n_docs_tok"].sum())
    df = np.stack(parts["df"].to_numpy()).sum(axis=0).astype(np.float64)
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def score_block(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pylist(), dtype="object").fillna("")
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = s.str.split()
        L = toks.str.len().to_numpy().astype(np.float64)
        ex = toks.explode().dropna()
        fl = ex[ex.isin(terms)]
        if len(fl) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        tf = (fl.reset_index().groupby(["index", 0], sort=False).size()
              .unstack(fill_value=0).reindex(columns=terms, fill_value=0))
        rows = tf.index.to_numpy()
        T = tf.to_numpy().astype(np.float64)           # (m, n_terms)
        norm = k1 * (1.0 - b + b * L[rows, None] / avgdl)
        sc = ((idf[None, :] * T * (k1 + 1.0)) / (T + norm)).sum(axis=1)
        out = pd.DataFrame({id_col: ids[rows], "score": round6(sc)})
        out = out.sort_values(["score", id_col],
                              ascending=[False, True]).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    cand = ds.select_columns([id_col, text_col]).map_batches(
        score_block, batch_format="pyarrow").to_pandas()
    if len(cand) == 0:  # all-empty blocks drop columns (Ray 2.49)
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    return (cand.sort_values(["score", id_col], ascending=[False, True])
            .head(k).reset_index(drop=True))


def vocab_growth(ds, n_docs: int, k: int = 10, id_col: str = "doc_id",
                 text_col: str = "text", num_buckets: int = 256) -> pa.Table:
    """Vocabulary growth curve: cumulative DISTINCT token count after
    the first 1/k, 2/k, … of the corpus (doc-id order) — the diversity
    diagnostic behind "is more data still adding new vocabulary, or
    are we re-crawling duplicates?" (a flattening curve is the
    dedup-ROI signal).

    Plan: per-block (token, min doc_id) partials; ONE coarse
    ``hash(token)`` shuffle so each token's global first occurrence
    resolves in exactly one bucket; the per-bucket fold bincounts
    first-occurrences into the k checkpoint bins — each bucket emits
    ≤ k rows, so the driver folds buckets × k, never the vocabulary.
    Checkpoints are ``docs < ceil(i·n/k)`` (integer thresholds).
    Returns (checkpoint 1..k, n_docs, vocab) — all int64."""
    if k < 1 or n_docs < 1:
        raise ValueError("k and n_docs must be >= 1")
    thresholds = np.array([(i * n_docs) // k for i in range(1, k + 1)],
                          dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        ids = pd.Series(
            b[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        s = pd.Series(b[text_col].to_pylist(), dtype="object")
        ex = s.str.split().explode().dropna()
        if ex.empty:
            t = pa.table({"tok": pa.array([], pa.string()),
                          "first_doc": pa.array([], pa.int64())})
            return append_coarse_bucket(t, ["tok"], num_buckets, "__vb")
        df = pd.DataFrame({
            "tok": ex.to_numpy(dtype=object),
            "first_doc": ids.reindex(ex.index).to_numpy(np.int64)})
        g = df.groupby("tok", sort=False, as_index=False)["first_doc"] \
            .min()
        t = pa.table({
            "tok": pa.array(g["tok"].to_numpy(object), pa.string()),
            "first_doc": pa.array(g["first_doc"].to_numpy(np.int64))})
        return append_coarse_bucket(t, ["tok"], num_buckets, "__vb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        first = df.groupby("tok")["first_doc"].min().to_numpy(np.int64)
        # vocab counted at checkpoint i = tokens with first_doc < t_i
        counts = (first[None, :] < thresholds[:, None]).sum(axis=1)
        return pd.DataFrame({
            "checkpoint": np.arange(1, k + 1, dtype=np.int64),
            "vocab": counts.astype(np.int64)})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("__vb")
             .map_groups(lambda df: fold(df.drop(columns="__vb")),
                         batch_format="pandas")).to_pandas()
    agg = parts.groupby("checkpoint", as_index=False)["vocab"].sum() \
        .sort_values("checkpoint").reset_index(drop=True)
    return pa.table({
        "checkpoint": pa.array(agg["checkpoint"].to_numpy(np.int64)),
        "n_docs": pa.array(thresholds, pa.int64()),
        "vocab": pa.array(agg["vocab"].to_numpy(np.int64))})


def zipf_fit(ds, id_col: str = "doc_id", text_col: str = "text",
             num_buckets: int = 256) -> pa.Table:
    """Zipf-law fit over the token frequency spectrum: regress
    ln(count) on ln(rank) (rank by count desc, token asc) — the
    corpus-health diagnostic whose slope drifts when scraped text
    degenerates (boilerplate flattens it, spam steepens it). EXACT
    statistic: both logs round half-away to INTEGER micro-nats, the
    regression reduces to integer power sums folded in Python big-ints
    (the grouped_linear_fit overflow rule), and slope/intercept are
    integer ratios rounded once at round6 — the DuckDB HUGEINT replay
    matches bit-for-bit.

    Plan: per-block token-count partials → ONE coarse ``hash(token)``
    fold to global counts; ranks need the global order, so the
    vocabulary-sized (count, token) list folds on the driver (the
    `_DRIVER_FOLD_LIMIT` discipline — vocabularies are corpus-bounded;
    swap the sort to ``Dataset.sort`` above it). Returns one row:
    (n_tokens, slope, intercept_micro) as round6 doubles over the
    micro-nat grid."""
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        s = pd.Series(b[text_col].to_pylist(), dtype="object")
        ex = s.str.split().explode().dropna()
        if ex.empty:
            return pa.table({"t": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = ex.value_counts()
        return pa.table({
            "t": pa.array(vc.index.to_numpy(object), pa.string()),
            "n": pa.array(vc.to_numpy(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns="__zb").groupby(
            "t", as_index=False)["n"].sum()

    counts = (ds.select_columns([text_col])
              .map_batches(partial, batch_format="pyarrow")
              .map_batches(lambda b: append_coarse_bucket(
                  b, ["t"], num_buckets, "__zb"),
                  batch_format="pyarrow")
              .groupby("__zb")
              .map_groups(fold, batch_format="pandas")
              .to_pandas())
    if counts.empty:
        raise ValueError("zipf_fit: empty corpus")
    counts = counts.groupby("t", as_index=False)["n"].sum() \
        .sort_values(["n", "t"], ascending=[False, True],
                     kind="mergesort").reset_index(drop=True)
    n_tok = len(counts)
    rank = np.arange(1, n_tok + 1, dtype=np.int64)
    x = np.floor(np.log(rank.astype(np.float64)) * 1e6 + 0.5) \
        .astype(np.int64)
    y = np.floor(np.log(counts["n"].to_numpy(np.int64)
                        .astype(np.float64)) * 1e6 + 0.5) \
        .astype(np.int64)
    sx = int(x.sum())
    sy = int(y.sum())
    sxx = sum(int(v) * int(v) for v in x)  # big-int: micro² overflows
    sxy = sum(int(a) * int(b) for a, b in zip(x, y))
    num = n_tok * sxy - sx * sy
    den = n_tok * sxx - sx * sx
    if den == 0:
        raise ValueError("zipf_fit: degenerate rank spectrum")
    # raw-double slope, then an identical-SHAPE double expression for
    # the intercept (a pure-integer intercept numerator would need
    # sy·den — past HUGEINT at million-token vocabularies)
    slope = float(num) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(n_tok)
    r6 = lambda v: float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6)  # noqa: E731
    return pa.table({
        "n_tokens": pa.array([n_tok], pa.int64()),
        "slope": pa.array([r6(slope)], pa.float64()),
        "intercept_micro": pa.array([r6(intercept)], pa.float64())})


def source_vocab_overlap(ds, group_col: str = "source",
                         text_col: str = "text",
                         num_buckets: int = 256) -> pa.Table:
    """Pairwise vocabulary overlap between groups: |A∩B|, |A∪B| and
    Jaccard for every group pair — "do these two scrape sources speak
    the same language" dedup/mixing diagnostics. BIT-PARALLEL design:
    groups map to bits (≤ 63 groups), each token reduces to ONE
    membership-bitmask row inside a single ``hash(token)`` fold, each
    bucket emits only (mask, count) rows (≤ distinct masks — never the
    vocabulary), and all pairwise intersections/unions come from one
    vectorized popcount pass over the mask histogram. Exact integers;
    Jaccard rounds once at round6 — the SQL self-join replay matches
    bit-for-bit."""
    from ..engine.hashing import append_coarse_bucket

    import pyarrow.compute as pc

    groups = sorted({
        g for b in ds.select_columns([group_col]).iter_batches(
            batch_size=65536, batch_format="pyarrow")
        for g in pc.unique(b[group_col].combine_chunks()).to_pylist()})
    if len(groups) > 63:
        raise ValueError("source_vocab_overlap: > 63 groups")
    bit = {g: 1 << i for i, g in enumerate(groups)}

    def partial(b: pa.Table) -> pa.Table:
        s = pd.Series(b[text_col].to_pylist(), dtype="object")
        g = pd.Series(b[group_col].to_pylist(), dtype="object")
        ex = s.str.split().explode().dropna()
        if ex.empty:
            return pa.table({"t": pa.array([], pa.string()),
                             "m": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "t": ex.to_numpy(object),
            "m": g.reindex(ex.index).map(bit).to_numpy(np.int64)})
        out = df.groupby("t", sort=False, as_index=False)["m"] \
            .agg(lambda x: int(np.bitwise_or.reduce(
                x.to_numpy(np.int64))))
        return pa.table({
            "t": pa.array(out["t"].to_numpy(object), pa.string()),
            "m": pa.array(out["m"].to_numpy(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        masks = df.drop(columns="__vb").groupby("t")["m"] \
            .agg(lambda x: int(np.bitwise_or.reduce(
                x.to_numpy(np.int64))))
        out = pd.Series(masks.to_numpy(np.int64)).value_counts()
        return pd.DataFrame({
            "m": out.index.to_numpy(np.int64),
            "n": out.to_numpy(np.int64)})

    hist = (ds.select_columns([group_col, text_col])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(lambda b: append_coarse_bucket(
                b, ["t"], num_buckets, "__vb"),
                batch_format="pyarrow")
            .groupby("__vb")
            .map_groups(fold, batch_format="pandas")
            .to_pandas().groupby("m", as_index=False)["n"].sum())
    masks = hist["m"].to_numpy(np.int64)
    cnt = hist["n"].to_numpy(np.int64)
    rows = []
    for i, ga in enumerate(groups):
        for j in range(i + 1, len(groups)):
            gb = groups[j]
            ba, bb = 1 << i, 1 << j
            na = int(cnt[(masks & ba) != 0].sum())
            nb = int(cnt[(masks & bb) != 0].sum())
            inter = int(cnt[((masks & ba) != 0)
                            & ((masks & bb) != 0)].sum())
            union = na + nb - inter
            jac = inter / union if union else 0.0
            rows.append((ga, gb, inter, union,
                         float(np.sign(jac)
                               * np.floor(abs(jac) * 1e6 + 0.5) / 1e6)))
    return pa.table({
        "src_a": pa.array([r[0] for r in rows], pa.string()),
        "src_b": pa.array([r[1] for r in rows], pa.string()),
        "inter": pa.array([r[2] for r in rows], pa.int64()),
        "union_size": pa.array([r[3] for r in rows], pa.int64()),
        "jaccard": pa.array([r[4] for r in rows], pa.float64())})


def ngram_continuations(ds, text_col: str = "text", topk: int = 3,
                        min_context: int = 20,
                        num_buckets: int = 256):
    """Top-k next-token continuations per context word — the n-gram LM
    completion table (what follows "the"?): exact bigram counts, per
    context w1 the total outgoing mass ``n_from`` and the ``topk``
    continuations ranked by (count DESC, token ASC — deterministic,
    SQL row_number-replayable); contexts under ``min_context``
    outgoing tokens are dropped.

    Plan: per-block bigram count partials (:func:`ngram_count_partial`
    — tokens never shuffle), ONE coarse fold on hash(ngram) for exact
    bigram counts, then ONE coarse shuffle on hash(w1) so each
    context's full continuation row set folds in one place. Returns a
    Dataset of (w1, w2, n_count, n_from, rnk) — vocabulary-sized."""
    from ..engine.hashing import append_coarse_bucket

    partials = ds.select_columns([text_col]).map_batches(
        lambda b: ngram_count_partial(b, text_col, n=2),
        batch_format="pyarrow")

    def fold_ngram(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("ngram", sort=False, as_index=False)["n_count"] \
            .sum()

    def split_w(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = pc.split_pattern(b["ngram"], " ")
        t = pa.table({"w1": pc.list_element(parts, 0),
                      "w2": pc.list_element(parts, 1),
                      "n_count": b["n_count"]})
        return append_coarse_bucket(t, ["w1"], num_buckets, "__wb")

    def fold_ctx(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "w1": pd.Series([], dtype="object"),
                "w2": pd.Series([], dtype="object"),
                "n_count": pd.Series([], dtype="int64"),
                "n_from": pd.Series([], dtype="int64"),
                "rnk": pd.Series([], dtype="int64")})
        df = df.copy()
        df["n_from"] = df.groupby("w1")["n_count"].transform("sum")
        df = df[df["n_from"] >= min_context]
        df = df.sort_values(["w1", "n_count", "w2"],
                            ascending=[True, False, True], kind="stable")
        df["rnk"] = df.groupby("w1").cumcount() + 1
        out = df[df["rnk"] <= topk]
        return pd.DataFrame({
            "w1": out["w1"].to_numpy(object),
            "w2": out["w2"].to_numpy(object),
            "n_count": out["n_count"].to_numpy(np.int64),
            "n_from": out["n_from"].to_numpy(np.int64),
            "rnk": out["rnk"].to_numpy(np.int64)})

    return (partials.map_batches(
                lambda b: append_coarse_bucket(b, ["ngram"],
                                               num_buckets, "__nb"),
                batch_format="pyarrow")
            .groupby("__nb")
            .map_groups(lambda df: fold_ngram(df.drop(columns="__nb")),
                        batch_format="pandas")
            .map_batches(split_w, batch_format="pyarrow")
            .groupby("__wb")
            .map_groups(lambda df: fold_ctx(df.drop(columns="__wb")),
                        batch_format="pandas"))


def bigram_cond_entropy(ds, text_col: str = "text",
                        num_buckets: int = 256) -> pa.Table:
    """Conditional next-token entropy H(w₂ | w₁) of the corpus bigram
    stream in nats — the sequence-predictability score (low = templated
    text, high = diverse): H = Σ_{u,v} c_uv·(ln c_u· − ln c_uv) / N
    where c_u· is the context total and N the bigram count.

    Every (u,v) term is ONE double expression over two exact integers,
    rounded half-away to integer MICRO-NATS (terms are ≥ 0 since
    c_u· ≥ c_uv — no sign handling) and summed as int64, so the DuckDB
    replay is bit-exact. Plan: bigram count partials → hash(ngram)
    fold → hash(w1) fold computes context totals + per-bucket micro
    sums; the driver adds |buckets| scalars. Returns one row
    (n_bigrams, n_contexts, h_cond)."""
    from ..engine.hashing import append_coarse_bucket

    partials = ds.select_columns([text_col]).map_batches(
        lambda b: ngram_count_partial(b, text_col, n=2),
        batch_format="pyarrow")

    def fold_ngram(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("ngram", sort=False, as_index=False)["n_count"] \
            .sum()

    def split_w(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = pc.split_pattern(b["ngram"], " ")
        t = pa.table({"w1": pc.list_element(parts, 0),
                      "n_count": b["n_count"]})
        return append_coarse_bucket(t, ["w1"], num_buckets, "__wb")

    def fold_ctx(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"h_micro": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "ctx": pd.Series([], dtype="int64")})
        cu = df.groupby("w1")["n_count"].transform("sum") \
            .to_numpy(np.float64)
        c = df["n_count"].to_numpy(np.int64)
        cf = c.astype(np.float64)
        term = np.floor(cf * (np.log(cu) - np.log(cf)) * 1e6 + 0.5) \
            .astype(np.int64)
        return pd.DataFrame({
            "h_micro": pd.Series([int(term.sum())], dtype="int64"),
            "n": pd.Series([int(c.sum())], dtype="int64"),
            "ctx": pd.Series([df["w1"].nunique()], dtype="int64")})

    parts = (partials.map_batches(
                lambda b: append_coarse_bucket(b, ["ngram"],
                                               num_buckets, "__nb"),
                batch_format="pyarrow")
             .groupby("__nb")
             .map_groups(lambda df: fold_ngram(df.drop(columns="__nb")),
                         batch_format="pandas")
             .map_batches(split_w, batch_format="pyarrow")
             .groupby("__wb")
             .map_groups(lambda df: fold_ctx(df.drop(columns="__wb")),
                         batch_format="pandas")
             .to_pandas())
    h_micro = int(parts["h_micro"].sum())
    n = int(parts["n"].sum())
    ctx = int(parts["ctx"].sum())
    h = np.float64(h_micro) / 1e6 / np.float64(n)
    return pa.table({
        "n_bigrams": pa.array([n], pa.int64()),
        "n_contexts": pa.array([ctx], pa.int64()),
        "h_cond": pa.array(
            [float(np.sign(h) * np.floor(abs(h) * 1e6 + 0.5) / 1e6)],
            pa.float64())})


_VARINT_BOUNDS = np.array([1 << 7, 1 << 14, 1 << 21, 1 << 28],
                          dtype=np.int64)


def postings_compression(ds, id_col: str = "doc_id",
                         text_col: str = "text",
                         num_buckets: int = 256) -> pa.Table:
    """Varint-delta compression audit of the corpus inverted index —
    the search/dedup storage-planning number: per term, sorted posting
    ids delta-encode (gap from the previous id, first gap = id + 1)
    and each gap costs the LEB128 varint byte count (1 B under 2⁷,
    2 B under 2¹⁴, …). Reports total terms, postings, raw int64
    bytes, varint bytes, and the round6 compression ratio.

    Plan: per-block DISTINCT (term, doc) pairs, ONE coarse hash(term)
    shuffle so each term's full sorted posting folds in one bucket
    (a vectorized sort + diff + searchsorted — no per-posting loop);
    buckets emit 3 scalars each. Returns one row."""
    from ..engine.hashing import append_coarse_bucket

    def pairs(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pylist(), dtype="object")
        ids = pd.Series(batch[id_col].to_numpy(zero_copy_only=False))
        ex = s.str.split().explode()
        df = pd.DataFrame({
            "doc_id": ids.reindex(ex.index).to_numpy(np.int64),
            "token": ex.to_numpy(dtype=object),
        }).dropna().drop_duplicates()
        t = pa.Table.from_pandas(df, preserve_index=False)
        return append_coarse_bucket(t, ["token"], num_buckets, "__pb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["token", "doc_id"]) \
            .sort_values(["token", "doc_id"], kind="mergesort")
        ids = df["doc_id"].to_numpy(np.int64)
        tok = df["token"].to_numpy(object)
        first = np.ones(len(df), dtype=bool)
        first[1:] = tok[1:] != tok[:-1]
        delta = np.empty(len(df), dtype=np.int64)
        delta[first] = ids[first] + 1
        delta[~first] = (ids - np.roll(ids, 1))[~first]
        nb = 1 + np.searchsorted(_VARINT_BOUNDS, delta, side="right")
        return pd.DataFrame({
            "n_terms": pd.Series([int(first.sum())], dtype="int64"),
            "n_postings": pd.Series([len(df)], dtype="int64"),
            "varint_bytes": pd.Series([int(nb.sum())], dtype="int64")})

    parts = (ds.select_columns([id_col, text_col])
             .map_batches(pairs, batch_format="pyarrow")
             .groupby("__pb")
             .map_groups(lambda df: fold(df.drop(columns="__pb")),
                         batch_format="pandas").to_pandas())
    n_terms = int(parts["n_terms"].sum())
    n_post = int(parts["n_postings"].sum())
    vb = int(parts["varint_bytes"].sum())
    raw = 8 * n_post
    ratio = np.float64(vb) / np.float64(raw)
    return pa.table({
        "n_terms": pa.array([n_terms], pa.int64()),
        "n_postings": pa.array([n_post], pa.int64()),
        "raw_bytes": pa.array([raw], pa.int64()),
        "varint_bytes": pa.array([vb], pa.int64()),
        "ratio": pa.array(
            [float(np.sign(ratio)
                   * np.floor(abs(ratio) * 1e6 + 0.5) / 1e6)],
            pa.float64())})


def hapax_rate(ds, group_col: str, text_col: str = "text",
               num_buckets: int = 256) -> pa.Table:
    """Lexical-richness profile per group: distinct terms, hapax
    legomena (terms occurring exactly ONCE in the group's token
    stream), and the round6 hapax rate — the Zipf-tail health check
    that catches template/boilerplate slices (low hapax) and OCR noise
    (high hapax).

    Plan: per-block (group, term) count partials, ONE coarse shuffle
    on hash(term) — every (group, term) total resolves in one bucket
    because the key includes the term — each bucket emits per-group
    (n_terms, n_hapax) scalars; the driver folds |groups| rows."""
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        s = pd.Series(b[text_col].to_pylist(), dtype="object")
        g = pd.Series(b[group_col].to_pylist(), dtype="object")
        ex = s.str.split().explode()
        df = pd.DataFrame({
            "g": g.reindex(ex.index).to_numpy(object),
            "t": ex.to_numpy(dtype=object)}).dropna()
        out = df.groupby(["g", "t"], sort=False).size().rename("n") \
            .reset_index()
        t = pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "t": pa.array(out["t"].to_numpy(object), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64))})
        return append_coarse_bucket(t, ["t"], num_buckets, "__hb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["g", "t"], as_index=False)["n"].sum()
        out = agg.groupby("g").agg(
            n_terms=("n", "size"),
            n_hapax=("n", lambda s: int((s == 1).sum()))).reset_index()
        out["n_terms"] = out["n_terms"].astype("int64")
        out["n_hapax"] = out["n_hapax"].astype("int64")
        return out

    parts = (ds.select_columns([group_col, text_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("__hb")
             .map_groups(lambda df: fold(df.drop(columns="__hb")),
                         batch_format="pandas").to_pandas())
    agg = parts.groupby("g", as_index=False)[["n_terms", "n_hapax"]] \
        .sum().sort_values("g")
    rate = agg["n_hapax"].to_numpy(np.float64) \
        / agg["n_terms"].to_numpy(np.float64)
    return pa.table({
        group_col: pa.array(agg["g"].to_numpy(object), pa.string()),
        "n_terms": pa.array(agg["n_terms"].to_numpy(np.int64)),
        "n_hapax": pa.array(agg["n_hapax"].to_numpy(np.int64)),
        "hapax_rate": pa.array(
            np.sign(rate) * np.floor(np.abs(rate) * 1e6 + 0.5) / 1e6,
            pa.float64())})


def oov_rate(ds, group_col: str = "source", text_col: str = "text",
             vocab_k: int = 1000, num_buckets: int = 256) -> pa.Table:
    """Out-of-vocabulary token rate per group after fixing the corpus
    vocabulary to its ``vocab_k`` most frequent tokens — the tokenizer-
    coverage audit run before committing a vocab size (high OOV in one
    source means that source will shred into fallback bytes).

    Vocabulary selection is deterministic: (count DESC, token ASC). The
    count fold is the token_topk shape — per-block value_counts, ONE
    coarse hash(token) shuffle, and each bucket emits only its own
    top-``vocab_k`` candidates (a global top-k token lives in exactly
    one bucket, so the driver's final cut sees ≤ buckets·k rows, never
    the vocabulary). Pass 2 re-streams the corpus against the broadcast
    vocab set with per-(group) partials. Returns
    (group, n_tokens, n_oov, oov_rate round6) ordered by group."""
    from ..engine.hashing import append_coarse_bucket

    def count_partial(b: pa.Table) -> pa.Table:
        s = pd.Series(b[text_col].to_pylist(), dtype="object").dropna()
        vc = s.str.split().explode().dropna().value_counts()
        return pa.table({
            "token": pa.array(vc.index.to_numpy(object), pa.string()),
            "n": pa.array(vc.to_numpy(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["n"].sum().reset_index()
        return g.sort_values(["n", "token"],
                             ascending=[False, True]).head(vocab_k)

    cand = (ds.select_columns([text_col])
            .map_batches(count_partial, batch_format="pyarrow")
            .map_batches(lambda b: append_coarse_bucket(
                b, ["token"], num_buckets, "__vb"), batch_format="pyarrow")
            .groupby("__vb")
            .map_groups(lambda d: fold(d.drop(columns="__vb")),
                        batch_format="pandas")
            .to_pandas())
    vocab = set(cand.sort_values(["n", "token"],
                                 ascending=[False, True])
                .head(vocab_k)["token"])

    def rate_partial(b: pa.Table) -> pa.Table:
        s = pd.Series(b[text_col].to_pylist(), dtype="object")
        g = pd.Series(b[group_col].to_pylist(), dtype="object")
        ex = s.str.split().explode().dropna()
        if ex.empty:
            return pa.table({"g": pa.array([], pa.string()),
                             "nt": pa.array([], pa.int64()),
                             "no": pa.array([], pa.int64())})
        gg = g.reindex(ex.index)
        oov = (~ex.isin(vocab)).to_numpy()
        df = pd.DataFrame({"g": gg.to_numpy(object), "oov": oov})
        out = df.groupby("g", sort=False)["oov"].agg(["size", "sum"]) \
            .reset_index()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "nt": pa.array(out["size"].to_numpy(np.int64)),
            "no": pa.array(out["sum"].astype("int64").to_numpy())})

    parts = (ds.select_columns([group_col, text_col])
             .map_batches(rate_partial, batch_format="pyarrow")
             .to_pandas().groupby("g", as_index=False)[["nt", "no"]]
             .sum().sort_values("g"))
    rate = parts["no"].to_numpy(np.float64) / parts["nt"].to_numpy(
        np.float64)
    rate = np.sign(rate) * np.floor(np.abs(rate) * 1e6 + 0.5) / 1e6
    return pa.table({
        group_col: pa.array(parts["g"].to_numpy(object), pa.string()),
        "n_tokens": pa.array(parts["nt"].to_numpy(np.int64)),
        "n_oov": pa.array(parts["no"].to_numpy(np.int64)),
        "oov_rate": pa.array(rate, pa.float64())})
