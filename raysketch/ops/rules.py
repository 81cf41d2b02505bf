"""Corpus quality-filter rules: Gopher-style repetition signals, word
entropy, and the C4 duplicate-span profile — the heuristic filter pass
a pretraining pipeline runs between language-ID and dedup.

All four ops here are deterministic and SQL-replayable (full DuckDB
oracles in ``queries.py``); repetition/entropy are pure per-block
streaming transforms (no shuffle at ANY corpus size), the span profile
is the engine's standard two-coarse-fold shape, and :func:`ks_drift`
is one count fold plus a value-domain-bounded driver pivot.

- :func:`repetition_stats` — per-doc repetition heuristics from the
  Gopher paper's rule family (Rae et al. 2021, "Scaling Language
  Models", §A1.1): type-token ratio, most-frequent-bigram share, and
  the fraction of bigram instances belonging to repeated bigrams, plus
  a composite ``keep`` flag evaluated on the ROUNDED values so the SQL
  oracle replays the exact comparisons.
- :func:`token_entropy` — per-doc Shannon entropy of the word
  distribution in INTEGER micro-nats (``H = ln n − (Σ c·ln c)/n``; the
  Σ term rounds half-away per word ×1e6 and sums as int64, so
  distributed summation order cannot perturb a bit — the
  ``bigram_lm_scores`` trick, see ``ops/lm.py``).
- :func:`duplicate_span_profile` — for every doc, how many of its
  DISTINCT ``n``-token spans also appear in at least one OTHER doc
  (the corpus-level signal behind C4's duplicate-span removal,
  Raffel et al. 2020 §2.2). Distinct (doc, span) pairs fold through
  ONE coarse shuffle on hash(span) — each span's full posting list
  lands in exactly one bucket, so within-bucket doc counts ARE global
  — then per-doc sums fold through a second coarse shuffle on
  hash(doc). Shuffle volume is the distinct pair stream (the same
  volume MinHash dedup's shingle pass moves); nothing ever gathers on
  the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _round6(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, dtype=np.float64)
    return np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6


def _explode_words(batch: pa.Table, id_col: str, text_col: str):
    """(doc index-aligned ids Series, exploded word Series) — one
    vectorized split over the block's whole word stream."""
    ids = pd.Series(batch[id_col].to_pylist())
    s = pd.Series(batch[text_col].to_pylist(), dtype="object")
    ex = s.str.split().explode().dropna()
    return ids, ex


# ---------------------------------------------------------------------------
# Gopher repetition rules (pure per-block streaming)
# ---------------------------------------------------------------------------

def repetition_stats(ds, id_col: str = "doc_id", text_col: str = "text",
                     max_top2_frac: float = 0.20,
                     max_dup2_frac: float = 0.60,
                     min_ttr: float = 0.20):
    """Dataset of per-doc repetition heuristics:

    - ``n_tokens`` int64 — whitespace token count
    - ``ttr`` float64 — type-token ratio ``round6(distinct / n)``
    - ``top2_frac`` float64 — share of the most frequent bigram among
      the doc's ``n−1`` bigram instances (0.0 when n < 2)
    - ``dup2_frac`` float64 — fraction of bigram instances whose bigram
      occurs ≥ 2 times in the doc (0.0 when n < 2)
    - ``keep`` int64 — 1 iff ``top2_frac ≤ max_top2_frac AND dup2_frac
      ≤ max_dup2_frac AND ttr ≥ min_ttr``, compared on the ROUNDED
      values (bit-identical to the SQL oracle's CASE)

    Pure per-block map (docs never span blocks in Ray Data) — no
    shuffle at any corpus size; every step is a pandas/numpy kernel
    over the block's exploded word stream, never a per-row loop."""

    def stats(batch: pa.Table) -> pa.Table:
        ids, ex = _explode_words(batch, id_col, text_col)
        if len(ex) == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "ttr": pa.array([], pa.float64()),
                "top2_frac": pa.array([], pa.float64()),
                "dup2_frac": pa.array([], pa.float64()),
                "keep": pa.array([], pa.int64()),
            })
        idx = ex.index.to_numpy()
        w = ex.to_numpy(dtype=object)
        tok = pd.DataFrame({"d": idx, "w": w})
        per = tok.groupby("d").agg(n=("w", "size"),
                                   nd=("w", "nunique"))
        # bigrams: adjacent positions within the same doc
        m = len(w) - 1
        if m > 0:
            same = idx[:m] == idx[1:]
            bd = idx[:m][same]
            bg = w[:m][same] + " " + w[1:][same]
            bc = (pd.DataFrame({"d": bd, "b": bg})
                  .groupby(["d", "b"]).size().rename("c").reset_index())
            c = bc["c"].to_numpy(np.int64)
            bc["dup"] = np.where(c >= 2, c, 0)
            bagg = bc.groupby("d").agg(nb=("c", "sum"), topc=("c", "max"),
                                       dupc=("dup", "sum"))
        else:
            bagg = pd.DataFrame(columns=["nb", "topc", "dupc"])
        per = per.join(bagg, how="left").fillna(0)
        n = per["n"].to_numpy(np.int64)
        nd = per["nd"].to_numpy(np.int64)
        nb = per["nb"].to_numpy(np.int64)
        topc = per["topc"].to_numpy(np.int64)
        dupc = per["dupc"].to_numpy(np.int64)
        ttr = _round6(nd.astype(np.float64) / n.astype(np.float64))
        safe_nb = np.maximum(nb, 1).astype(np.float64)
        top2 = _round6(np.where(nb > 0, topc / safe_nb, 0.0))
        dup2 = _round6(np.where(nb > 0, dupc / safe_nb, 0.0))
        keep = ((top2 <= max_top2_frac) & (dup2 <= max_dup2_frac)
                & (ttr >= min_ttr)).astype(np.int64)
        doc_ids = ids.reindex(per.index).to_numpy(np.int64)
        return pa.table({
            id_col: pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "ttr": pa.array(ttr, pa.float64()),
            "top2_frac": pa.array(top2, pa.float64()),
            "dup2_frac": pa.array(dup2, pa.float64()),
            "keep": pa.array(keep, pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# word-distribution entropy (integer micro-nats)
# ---------------------------------------------------------------------------

def token_entropy(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of (doc_id, n_tokens, n_distinct, s_micro, entropy):

    ``H = ln n − (Σ_w c_w·ln c_w)/n`` over the doc's word counts; the
    Σ term is carried as ``s_micro`` int64 = Σ floor(c·ln(c)·1e6 + 0.5)
    (c ≥ 1 so every term is ≥ 0 — no sign handling needed) and
    ``entropy = round6(ln(n) − (s_micro/1e6)/n)`` with the identical
    IEEE expression order the DuckDB oracle uses. Integer summation
    makes the result independent of block boundaries and fold order.
    Pure per-block streaming — no shuffle at any corpus size."""

    def ent(batch: pa.Table) -> pa.Table:
        ids, ex = _explode_words(batch, id_col, text_col)
        if len(ex) == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "s_micro": pa.array([], pa.int64()),
                "entropy": pa.array([], pa.float64()),
            })
        wc = (pd.DataFrame({"d": ex.index.to_numpy(),
                            "w": ex.to_numpy(dtype=object)})
              .groupby(["d", "w"]).size().rename("c").reset_index())
        cf = wc["c"].to_numpy(np.int64).astype(np.float64)
        wc["m"] = np.floor(cf * np.log(cf) * 1e6 + 0.5).astype(np.int64)
        per = wc.groupby("d").agg(n=("c", "sum"), nd=("c", "size"),
                                  s=("m", "sum"))
        n = per["n"].to_numpy(np.int64)
        s = per["s"].to_numpy(np.int64)
        nf = n.astype(np.float64)
        entropy = _round6(np.log(nf) - (s.astype(np.float64) / 1e6) / nf)
        doc_ids = ids.reindex(per.index).to_numpy(np.int64)
        return pa.table({
            id_col: pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "n_distinct": pa.array(per["nd"].to_numpy(np.int64), pa.int64()),
            "s_micro": pa.array(s, pa.int64()),
            "entropy": pa.array(entropy, pa.float64()),
        })

    return ds.map_batches(ent, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# C4 duplicate-span profile (two coarse folds)
# ---------------------------------------------------------------------------

def duplicate_span_profile(ds, n: int = 8, id_col: str = "doc_id",
                           text_col: str = "text",
                           num_buckets: int = 256):
    """Dataset of (doc_id, n_spans, n_shared_spans, shared_frac): for
    every doc, its count of DISTINCT ``n``-token spans (shingles) and
    how many of those also occur in at least one OTHER doc —
    ``shared_frac = round6(n_shared_spans / n_spans)``. Docs shorter
    than ``n`` tokens emit no row (they have no spans).

    Plan (the engine's standard exact-dedup shape, see module
    docstring): distinct (doc, span) block partials → coarse shuffle
    on hash(span) (a span's full posting list is co-located, so the
    within-bucket distinct-doc count is the GLOBAL document frequency)
    → per-doc partial sums → second coarse shuffle on hash(doc) →
    final sums. Driver never sees the pair stream."""
    from ..engine.hashing import append_coarse_bucket
    from .curate import _doc_shingles

    if n < 1:
        raise ValueError("span length n must be >= 1")

    def pairs(batch: pa.Table) -> pa.Table:
        d, s = _doc_shingles(batch, n, id_col, text_col)
        return pa.table({id_col: pa.array(d, pa.int64()),
                         "s": pa.array(s, pa.string())})

    def by_span(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(b, ["s"], num_buckets, "__b")

    def fold_span(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "n_spans": pd.Series([], dtype="int64"),
                                 "n_shared": pd.Series([], dtype="int64")})
        # rows are globally distinct (doc, span); posting lists whole
        df = df.assign(sh=(df.groupby("s")[id_col].transform("size") >= 2)
                       .to_numpy(np.int64))
        out = df.groupby(id_col, as_index=False).agg(
            n_spans=("s", "size"), n_shared=("sh", "sum"))
        out[id_col] = out[id_col].astype("int64")
        out["n_spans"] = out["n_spans"].astype("int64")
        out["n_shared"] = out["n_shared"].astype("int64")
        return out

    def by_doc(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(b, [id_col], num_buckets, "__b")

    def fold_doc(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "n_spans": pd.Series([], dtype="int64"),
                "n_shared_spans": pd.Series([], dtype="int64"),
                "shared_frac": pd.Series([], dtype="float64")})
        out = df.groupby(id_col, as_index=False).agg(
            n_spans=("n_spans", "sum"), n_shared_spans=("n_shared", "sum"))
        out[id_col] = out[id_col].astype("int64")
        out["n_spans"] = out["n_spans"].astype("int64")
        out["n_shared_spans"] = out["n_shared_spans"].astype("int64")
        out["shared_frac"] = _round6(
            out["n_shared_spans"].to_numpy(np.int64).astype(np.float64)
            / out["n_spans"].to_numpy(np.int64).astype(np.float64))
        return out

    per_span = (ds.map_batches(pairs, batch_format="pyarrow")
                .map_batches(by_span, batch_format="pyarrow")
                .groupby("__b")
                .map_groups(lambda df: fold_span(df.drop(columns="__b")),
                            batch_format="pandas"))
    return (per_span.map_batches(by_doc, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(lambda df: fold_doc(df.drop(columns="__b")),
                        batch_format="pandas"))


# ---------------------------------------------------------------------------
# distribution drift (two-sample Kolmogorov–Smirnov per group)
# ---------------------------------------------------------------------------

def ks_drift(ds, group_col: str, value_col: str, num_buckets: int = 64):
    """Per-group two-sample Kolmogorov–Smirnov drift statistic: for
    every group g, ``ks = round6(max_v |F_g(v) − F_rest(v)|)`` — the
    empirical-CDF distance between the group's integer ``value_col``
    distribution and the REST of the corpus (the data-drift /
    source-shift monitor of a curation pipeline).

    Plan: per-block (group, value) count partials → one coarse
    hash(group, value) fold → the driver pivots groups × DISTINCT
    values and computes every ECDF with one numpy cumsum. The fold
    output is bounded by groups × the VALUE DOMAIN (lengths, scores,
    bucketed features — domain-bounded by construction), independent
    of corpus row count; for unbounded real-valued columns, quantize
    first (e.g. ``equi_depth_histogram`` buckets).

    Returns a driver-sized pa.Table of (group, n_rows, ks)."""

    def part(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": b[group_col].to_pylist(),
            "v": b[value_col].to_numpy(zero_copy_only=False)})
        g = df.groupby(["g", "v"], sort=False).size().rename("n") \
            .reset_index()
        return pa.table({"g": pa.array(g["g"].to_numpy(object),
                                       pa.string()),
                         "v": pa.array(g["v"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    def bucket(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, ["g", "v"], num_buckets, "__b")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["g", "v"], as_index=False)["n"].sum()

    parts = (ds.map_batches(part, batch_format="pyarrow")
             .map_batches(bucket, batch_format="pyarrow")
             .groupby("__b")
             .map_groups(lambda df: fold(df.drop(columns="__b")),
                         batch_format="pandas"))
    counts = parts.to_pandas()
    if counts.empty:
        raise ValueError("ks_drift: empty input")
    # pivot: groups × distinct values (value-domain bounded)
    pv = counts.pivot_table(index="v", columns="g", values="n",
                            aggfunc="sum", fill_value=0).sort_index()
    M = pv.to_numpy(np.int64)                      # (values, groups)
    cs = np.cumsum(M, axis=0).astype(np.float64)   # per-group cum counts
    ns = M.sum(axis=0).astype(np.float64)          # per-group totals
    gc = cs.sum(axis=1, keepdims=True)             # global cum counts
    n_tot = float(ns.sum())
    f_g = cs / ns                                  # (values, groups)
    f_rest = (gc - cs) / (n_tot - ns)
    ks = np.abs(f_g - f_rest).max(axis=0)
    ks = np.floor(ks * 1e6 + 0.5) / 1e6
    groups = list(pv.columns)
    order = np.argsort(np.asarray(groups, dtype=object))
    return pa.table({
        group_col: pa.array(np.asarray(groups, object)[order], pa.string()),
        "n_rows": pa.array(ns.astype(np.int64)[order], pa.int64()),
        "ks": pa.array(ks[order], pa.float64()),
    })


# ---------------------------------------------------------------------------
# Flesch readability (syllable-heuristic reading-ease score)
# ---------------------------------------------------------------------------

def readability_scores(ds, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Dataset of per-doc Flesch reading-ease scores (Flesch 1948; the
    readability band CCNet-style curation uses alongside LM perplexity)
    from three exact regex counts:

    - ``n_words`` int64 — whitespace tokens (the corpus-wide word rule)
    - ``n_sentences`` int64 — runs of ``[.!?]+``, clamped to ≥ 1
    - ``n_syllables`` int64 — vowel-group heuristic: runs of
      ``[aeiouy]+`` in the lowercased text, plus 1 for every word with
      no vowel at all (each word counts ≥ 1 syllable)
    - ``flesch`` float64 — ``round6(206.835 − 1.015·(w/s) −
      84.6·(sy/w))``; the count inputs are exact ints and the double
      expression shape matches the SQL oracle term-for-term, so the
      score replays bit-for-bit

    Pure per-block map (no shuffle at any corpus size); every count is
    a vectorized pandas ``str.count`` / exploded-word kernel. Docs with
    zero words are dropped (the score is undefined). The corpus is
    pure ASCII, which is what makes the RE2/Python regex counts agree
    (the lang_id/quality discipline)."""

    def score(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(batch[text_col].to_pylist(), dtype="object")
        low = s.str.lower()
        n_words = low.str.count(r"\S+").to_numpy(np.int64)
        n_sent = np.maximum(
            low.str.count(r"[.!?]+").to_numpy(np.int64), 1)
        vgroups = low.str.count(r"[aeiouy]+").to_numpy(np.int64)
        ex = low.str.split().explode().dropna()
        novowel = np.zeros(len(s), dtype=np.int64)
        if len(ex):
            nv = (~ex.str.contains(r"[aeiouy]", regex=True))
            np.add.at(novowel, ex.index.to_numpy(),
                      nv.to_numpy().astype(np.int64))
        syl = vgroups + novowel
        keep = n_words > 0
        w = n_words[keep].astype(np.float64)
        sn = n_sent[keep].astype(np.float64)
        sy = syl[keep].astype(np.float64)
        flesch = 206.835 - 1.015 * (w / sn) - 84.6 * (sy / w)
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            "n_words": pa.array(n_words[keep], pa.int64()),
            "n_sentences": pa.array(n_sent[keep], pa.int64()),
            "n_syllables": pa.array(syl[keep], pa.int64()),
            "flesch": pa.array(_round6(flesch), pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Population Stability Index (per-group drift vs rest of corpus)
# ---------------------------------------------------------------------------

def psi_drift(ds, group_col: str, value_col: str,
              num_buckets: int = 64) -> pa.Table:
    """Per-group Population Stability Index — THE production drift
    metric (credit-scoring lineage; the standard alarm thresholds are
    0.1/0.25): for every group g,

        psi = Σ_v (p_v − q_v) · ln(p_v / q_v)

    between the group's integer ``value_col`` distribution (p) and the
    REST of the corpus (q), Laplace-smoothed over the corpus' distinct
    value set so empty cells never hit ln(0). Terms are ≥ 0 by
    construction ((p−q) and ln(p/q) share sign) and round half-away to
    INTEGER micro-units per term, so the statistic is an order-free
    int64 the SQL oracle replays term-for-term.

    Same plan (and same value-domain-bounded contract) as
    :func:`ks_drift`: per-block (group, value) count partials, one
    coarse fold, driver pivot of groups × distinct values. Returns
    (group, n_rows, psi_micro)."""

    def part(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": b[group_col].to_pylist(),
            "v": b[value_col].to_numpy(zero_copy_only=False)})
        g = df.groupby(["g", "v"], sort=False).size().rename("n") \
            .reset_index()
        return pa.table({"g": pa.array(g["g"].to_numpy(object),
                                       pa.string()),
                         "v": pa.array(g["v"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    def bucket(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, ["g", "v"], num_buckets, "__b")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["g", "v"], as_index=False)["n"].sum()

    counts = (ds.map_batches(part, batch_format="pyarrow")
              .map_batches(bucket, batch_format="pyarrow")
              .groupby("__b")
              .map_groups(lambda df: fold(df.drop(columns="__b")),
                          batch_format="pandas")).to_pandas()
    if counts.empty:
        raise ValueError("psi_drift: empty input")
    pv = counts.pivot_table(index="v", columns="g", values="n",
                            aggfunc="sum", fill_value=0).sort_index()
    M = pv.to_numpy(np.int64)                    # (values, groups)
    V = M.shape[0]                               # corpus distinct values
    ng = M.sum(axis=0).astype(np.int64)          # per-group totals
    nt = int(ng.sum())
    cg = M.astype(np.float64)
    cr = (M.sum(axis=1, keepdims=True) - M).astype(np.float64)
    p = (cg + 1) / (ng.astype(np.float64) + V)
    q = (cr + 1) / ((nt - ng).astype(np.float64) + V)
    term = (p - q) * np.log(p / q)
    micro = (np.sign(term) * np.floor(np.abs(term) * 1e6 + 0.5)) \
        .astype(np.int64)
    psi = micro.sum(axis=0)
    groups = np.asarray(list(pv.columns), dtype=object)
    order = np.argsort(groups)
    return pa.table({
        group_col: pa.array(groups[order], pa.string()),
        "n_rows": pa.array(ng[order], pa.int64()),
        "psi_micro": pa.array(psi[order], pa.int64())})


def redact_patterns(ds, pattern: str, group_col: str = "source",
                    text_col: str = "text") -> pa.Table:
    """Vectorized regex redaction audit — the PII-scrub accounting pass
    a curation pipeline runs before release: per group, how many docs
    matched the pattern, how many total matches, and how many
    characters redaction removes. The kernels are pyarrow's RE2
    engines (``count_substring_regex`` / ``replace_substring_regex``,
    leftmost non-overlapping, all occurrences) — the SAME regex engine
    DuckDB's regexp functions use, so the DuckDB oracle replays match
    counts and redacted-char totals exactly; no Python-re/RE2 dialect
    gap can open. Per-block partials are |groups|-sized; the driver
    folds only those."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        t = b[text_col]
        cnt = pc.count_substring_regex(t, pattern)
        red = pc.replace_substring_regex(t, pattern, "")
        removed = pc.subtract(pc.utf8_length(t), pc.utf8_length(red))
        df = pd.DataFrame({
            "g": pd.Series(b[group_col].to_pylist(), dtype="object"),
            "n_docs": np.ones(b.num_rows, dtype=np.int64),
            "docs_matched": (cnt.to_numpy(zero_copy_only=False) > 0)
            .astype(np.int64),
            "n_matches": cnt.to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "chars_redacted": removed.to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        out = df.groupby("g", sort=False, as_index=False).sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "n_docs": pa.array(out["n_docs"].to_numpy(np.int64)),
            "docs_matched": pa.array(out["docs_matched"]
                                     .to_numpy(np.int64)),
            "n_matches": pa.array(out["n_matches"].to_numpy(np.int64)),
            "chars_redacted": pa.array(out["chars_redacted"]
                                       .to_numpy(np.int64))})

    parts = (ds.select_columns([group_col, text_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if parts.empty:
        return pa.table({group_col: pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "docs_matched": pa.array([], pa.int64()),
                         "n_matches": pa.array([], pa.int64()),
                         "chars_redacted": pa.array([], pa.int64())})
    agg = parts.groupby("g", as_index=False).sum().sort_values("g") \
        .reset_index(drop=True)
    return pa.table({
        group_col: pa.array(agg["g"].to_numpy(object), pa.string()),
        "n_docs": pa.array(agg["n_docs"].to_numpy(np.int64)),
        "docs_matched": pa.array(agg["docs_matched"].to_numpy(np.int64)),
        "n_matches": pa.array(agg["n_matches"].to_numpy(np.int64)),
        "chars_redacted": pa.array(agg["chars_redacted"]
                                   .to_numpy(np.int64))})
