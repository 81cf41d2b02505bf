"""Corpus language-model statistics: PMI co-occurrence and n-gram
LM scoring — the classic large-corpus text-analysis pipelines a
training-data engine runs after dedup/quality (association mining and
perplexity-style data filtering).

Both operators follow the engine's fold discipline:

- Counting is per-block ``value_counts`` partials folded through ONE
  coarse-bucket ``hash(key)`` shuffle (``engine.hashing
  .append_coarse_bucket``) — shuffle volume is blocks × distinct keys,
  never raw tokens.
- Anything vocabulary-sized (df tables, the LM count table) stays
  distributed; the only driver-sized objects are the fixed-size top-V
  vocabulary (PMI) and the final rollups.
- The per-doc scoring join in :func:`bigram_lm_scores` attaches the LM
  table to the document bigram stream via the SIZE-ROUTED
  ``ops.join.attach_by_key`` — broadcast under the row limit,
  partitioned hash join above it (an LM table at corpus scale exceeds
  worker memory).

Determinism / oracle contract: log-probabilities are converted per
bigram to INTEGER micro-nats (round-half-away of ``ln(p)·1e6`` — the
``nation_revenue`` integer-cents trick), so distributed summation order
cannot perturb a single bit and DuckDB replays every score exactly.
Tokens are whitespace words (``str.split`` semantics), matching
``ops.text.ngram_count_partial``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _round6(a):
    a = np.asarray(a, dtype=np.float64)
    return np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6


def _micro_nats(p_num: np.ndarray, p_den: np.ndarray) -> np.ndarray:
    """ln(num/den) → int64 micro-nats, round half-away-from-zero.

    Both operands arrive as exact int64 counts; the float division and
    ``np.log`` are the same IEEE ops DuckDB's ``ln(CAST(a AS DOUBLE)/b)``
    performs, and the half-away rounding matches SQL ``round``."""
    lp = np.log(p_num.astype(np.float64) / p_den.astype(np.float64))
    return (np.sign(lp) * np.floor(np.abs(lp) * 1e6 + 0.5)).astype(np.int64)


# ---------------------------------------------------------------------------
# distinct (doc, token) partials — shared by PMI df counting
# ---------------------------------------------------------------------------

def doc_token_partial(batch: pa.Table, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """Per-block DISTINCT (doc_id, token) rows (whitespace tokens)."""
    ids = pd.Series(batch[id_col].to_pylist())
    s = pd.Series(batch[text_col].to_pylist(), dtype="object")
    ex = s.str.split().explode().dropna()
    df = pd.DataFrame({"doc_id": ids.reindex(ex.index).to_numpy(),
                       "tok": ex.to_numpy(dtype=object)})
    df = df.drop_duplicates()
    return pa.table({"doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                     "tok": pa.array(df["tok"].to_numpy(dtype=object),
                                     pa.string())})


def token_df(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Document frequency per token as a Dataset of (tok, df) —
    per-block distinct partials, one coarse-bucket fold. A token's rows
    from different blocks may repeat a doc (a doc never spans blocks in
    Ray Data, so they can't — distinct within block IS distinct
    globally per (doc, tok))."""
    from ..engine.hashing import append_coarse_bucket

    parts = ds.map_batches(
        lambda b: doc_token_partial(b, id_col, text_col),
        batch_format="pyarrow")

    def bucket(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(b, ["tok"], 256, "tb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", sort=False)["doc_id"].nunique().reset_index()
        g.columns = ["tok", "df"]
        return g

    return parts.map_batches(bucket, batch_format="pyarrow").groupby(
        "tb").map_groups(lambda g: fold(g.drop(columns=["tb"])),
                         batch_format="pandas")


# ---------------------------------------------------------------------------
# PMI co-occurrence over the top-V vocabulary
# ---------------------------------------------------------------------------

def pmi_cooccurrence(ds, vocab_size: int = 64, top_pairs: int = 50,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_docs: int | None = None):
    """Top document-level co-occurring token pairs with PMI.

    1. ``token_df`` fold → (tok, df); the top-``vocab_size`` tokens by
       (df DESC, tok ASC) form the vocabulary — FIXED-size, so the
       driver pull and ``ray.put`` broadcast are scale-constant.
    2. Per block: each doc's distinct vocab tokens → all unordered
       pairs (a < b) → per-block pair counts. Pair keyspace is bounded
       by V²/2, so partials stay tiny at any corpus size.
    3. One coarse-bucket fold sums pair doc-counts; the driver keeps
       the ``top_pairs`` by (count DESC, pair ASC) and computes
       ``pmi = round6(ln(n_docs·c_ab / (df_a·df_b)))`` — doc-level PMI
       with exact integer operands (SQL-replayable bit-for-bit).

    Returns a pandas DataFrame (driver-sized: ``top_pairs`` rows).
    """
    import ray

    from ..engine.hashing import append_coarse_bucket

    _EMPTY = pd.DataFrame({"tok_a": pd.Series([], dtype="object"),
                           "tok_b": pd.Series([], dtype="object"),
                           "n_docs": pd.Series([], dtype="int64"),
                           "pmi": pd.Series([], dtype="float64")})
    if n_docs is None:
        n_docs = ds.count()
    df_tbl = token_df(ds, id_col, text_col).to_pandas()
    if df_tbl.empty:  # empty corpus: an all-empty Dataset loses schema
        return _EMPTY
    vocab = (df_tbl.sort_values(["df", "tok"], ascending=[False, True],
                                kind="mergesort").head(vocab_size))
    vocab_ref = ray.put(dict(zip(vocab["tok"], vocab["df"].astype(np.int64))))

    empty = pa.table({"tok_a": pa.array([], pa.string()),
                      "tok_b": pa.array([], pa.string()),
                      "n_docs": pa.array([], pa.int64())})

    def pair_partial(batch: pa.Table) -> pa.Table:
        # one boolean doc×V presence matrix per block; the pair counts
        # are its Gram matrix (Bᵀ B upper triangle) — a single int
        # matmul instead of a per-doc Python pair loop
        vtoks = sorted(ray.get(vocab_ref))
        cat = pd.CategoricalDtype(categories=vtoks)
        s = pd.Series(batch[text_col].to_pylist(), dtype="object")
        ex = s.str.split().explode().dropna()
        codes = ex.astype(cat).cat.codes.to_numpy()
        keep = codes >= 0
        if not keep.any():
            return empty
        doc_codes, _ = pd.factorize(ex.index.to_numpy()[keep])
        B = np.zeros((doc_codes.max() + 1, len(vtoks)), dtype=bool)
        B[doc_codes, codes[keep]] = True
        C = B.T.astype(np.int64) @ B.astype(np.int64)
        iu, ju = np.triu_indices(len(vtoks), 1)
        cnt = C[iu, ju]
        nz = cnt > 0
        if not nz.any():
            return empty
        vt = np.asarray(vtoks, dtype=object)
        return pa.table({"tok_a": pa.array(vt[iu[nz]], pa.string()),
                         "tok_b": pa.array(vt[ju[nz]], pa.string()),
                         "n_docs": pa.array(cnt[nz], pa.int64())})

    parts = ds.map_batches(pair_partial, batch_format="pyarrow")

    def bucket(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(b, ["tok_a", "tok_b"], 64, "pb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["tok_a", "tok_b"], sort=False)["n_docs"]
                .sum().reset_index())

    totals = parts.map_batches(bucket, batch_format="pyarrow").groupby(
        "pb").map_groups(lambda g: fold(g.drop(columns=["pb"])),
                         batch_format="pandas").to_pandas()
    if totals.empty:
        return _EMPTY
    top = (totals.sort_values(["n_docs", "tok_a", "tok_b"],
                              ascending=[False, True, True],
                              kind="mergesort").head(top_pairs)
           .reset_index(drop=True))
    dfmap = dict(zip(vocab["tok"], vocab["df"].astype(np.int64)))
    dfa = top["tok_a"].map(dfmap).to_numpy(np.int64)
    dfb = top["tok_b"].map(dfmap).to_numpy(np.int64)
    c = top["n_docs"].to_numpy(np.int64)
    top["pmi"] = _round6(np.log((c * np.int64(n_docs)).astype(np.float64)
                                / (dfa * dfb).astype(np.float64)))
    top["n_docs"] = top["n_docs"].astype("int64")
    return top


# ---------------------------------------------------------------------------
# bigram LM scoring (add-one smoothing, integer micro-nats)
# ---------------------------------------------------------------------------

def _doc_ngram_tagged(batch: pa.Table, id_col: str,
                      text_col: str) -> pa.Table:
    """ONE pass over the block's word stream emitting BOTH per-doc
    unigram counts (kind=1) and per-doc bigram counts (kind=2) as
    (kind, doc_id, ngram, n) rows — the corpus is read once and every
    downstream table of :func:`bigram_lm_scores` folds from these
    partials."""
    empty = pa.table({"kind": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "ngram": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    ids = pd.Series(batch[id_col].to_pylist())
    s = pd.Series(batch[text_col].to_pylist(), dtype="object")
    ex = s.str.split().explode().dropna()
    if ex.empty:
        return empty
    idx = ex.index.to_numpy()
    w = ex.to_numpy(dtype=object)
    docs_all = ids.reindex(idx).to_numpy(np.int64)
    u = (pd.DataFrame({"doc_id": docs_all, "ngram": w})
         .groupby(["doc_id", "ngram"], sort=False).size()
         .reset_index(name="n"))
    frames = [u.assign(kind=1)]
    m = len(w) - 1
    if m > 0:
        same = idx[:m] == idx[1:m + 1]
        if same.any():
            grams = (w[:m][same] + " " + w[1:][same])
            docs = ids.reindex(idx[:m][same]).to_numpy(np.int64)
            b2 = (pd.DataFrame({"doc_id": docs, "ngram": grams})
                  .groupby(["doc_id", "ngram"], sort=False).size()
                  .reset_index(name="n"))
            frames.append(b2.assign(kind=2))
    df = pd.concat(frames, ignore_index=True)
    return pa.table({
        "kind": pa.array(df["kind"].to_numpy(np.int64)),
        "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
        "ngram": pa.array(df["ngram"].to_numpy(dtype=object), pa.string()),
        "n": pa.array(df["n"].to_numpy(np.int64))})


def bigram_lm_scores(ds, id_col: str = "doc_id", text_col: str = "text",
                     broadcast_limit_rows: int = 2_000_000):
    """Per-document average bigram log-probability under an add-one
    corpus LM — the perplexity-style quality signal.

    ONE corpus pass (:func:`_doc_ngram_tagged`) emits per-doc unigram
    and bigram count partials; everything else folds from those
    materialized partials (the corpus is never re-read):
      - bigram counts ``c12`` / unigram counts ``c1``: coarse-bucket
        folds of the kind=2 / kind=1 partials summed over docs;
      - ``V`` = corpus distinct-token count (the unigram table's size);
      - the per-doc bigram stream is the kind=2 partials themselves.

    The LM table attaches ``c1`` to each bigram row keyed by its first
    word (vocabulary × vocabulary-sized — the SIZE-ROUTED
    ``attach_by_key`` keeps it off the driver above the limit), then the
    per-doc bigram stream attaches ``(c12, c1)`` the same way and folds

        score_micro_nats = Σ n · round_half_away(ln((c12+1)/(c1+V))·1e6)

    per doc (INTEGER sum — order-free), with
    ``avg_logprob = round6(micro_nats / (1e6 · n_bigrams))``.

    Returns a Dataset of (doc_id, n_bigrams, avg_logprob) — per-doc
    sized, streamable to a sink at corpus scale.
    """
    from ..engine.hashing import append_coarse_bucket
    from .join import attach_by_key

    tagged = ds.map_batches(
        lambda b: _doc_ngram_tagged(b, id_col, text_col),
        batch_format="pyarrow").materialize()

    def _kind(k: int, keep_doc: bool):
        def f(b: pa.Table) -> pa.Table:
            kk = b["kind"].to_numpy(zero_copy_only=False)
            t = b.filter(pa.array(kk == k))
            cols = ["doc_id", "ngram", "n"] if keep_doc else ["ngram", "n"]
            return t.select(cols)

        return f

    # --- train: BOTH count tables from ONE ngram-keyed shuffle ----------
    def bucket(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(b.select(["kind", "ngram", "n"]),
                                    ["ngram"], 256, "cb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["kind", "ngram"], sort=False)["n"].sum() \
            .reset_index()
        g.columns = ["kind", "ngram", "n_count"]
        return g

    counts = tagged.map_batches(bucket, batch_format="pyarrow").groupby(
        "cb").map_groups(lambda g: fold(g.drop(columns=["cb"])),
                         batch_format="pandas").materialize()
    bi = counts.map_batches(
        lambda b: b.filter(pa.array(
            b["kind"].to_numpy(zero_copy_only=False) == 2))
        .select(["ngram", "n_count"]), batch_format="pyarrow")
    uni = counts.map_batches(
        lambda b: b.filter(pa.array(
            b["kind"].to_numpy(zero_copy_only=False) == 1))
        .select(["ngram", "n_count"]), batch_format="pyarrow")
    vocab_n = uni.count()

    # --- LM table: (ngram, c12, c1) --------------------------------------
    def first_word(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w1 = pc.list_element(pc.split_pattern(b["ngram"], " "), 0)
        return pa.table({"ngram": b["ngram"],
                         "c12": b["n_count"],
                         "w1": w1})

    bi_keyed = bi.map_batches(first_word, batch_format="pyarrow")
    uni_named = uni.map_batches(
        lambda b: pa.table({"tok": b["ngram"], "c1": b["n_count"]}),
        batch_format="pyarrow")
    lm = attach_by_key(bi_keyed, uni_named, "w1", "tok", ["c1"],
                       broadcast_limit_rows=broadcast_limit_rows) \
        .select_columns(["ngram", "c12", "c1"])

    # --- score: per-doc bigram stream (the kind=2 partials) ⋈ LM table --
    doc_bi = tagged.map_batches(_kind(2, True), batch_format="pyarrow")
    scored = attach_by_key(doc_bi, lm, "ngram", "ngram", ["c12", "c1"],
                           broadcast_limit_rows=broadcast_limit_rows)

    def to_micronats(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        c12 = b["c12"].to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = b["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        mn = _micro_nats(c12 + 1, c1 + np.int64(vocab_n)) * n
        return pa.table({"doc_id": b["doc_id"],
                         "n": pa.array(n, pa.int64()),
                         "mn": pa.array(mn, pa.int64())})

    parts = scored.map_batches(to_micronats, batch_format="pyarrow")

    def bucket_doc(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(b, ["doc_id"], 256, "db")

    def fold_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False).agg(
            n_bigrams=("n", "sum"), mn=("mn", "sum")).reset_index()
        g["avg_logprob"] = _round6(
            g["mn"].to_numpy(np.float64)
            / (1e6 * g["n_bigrams"].to_numpy(np.float64)))
        return g[["doc_id", "n_bigrams", "avg_logprob"]]

    return parts.map_batches(bucket_doc, batch_format="pyarrow").groupby(
        "db").map_groups(lambda g: fold_doc(g.drop(columns=["db"])),
                         batch_format="pandas")
