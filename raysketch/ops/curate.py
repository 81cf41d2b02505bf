"""Corpus-curation operators: context-window chunking, benchmark
decontamination, and per-group token-budget mixing — the steps between
"cleaned corpus" and "training batches" in an LLM data pipeline.

All three are streaming ``map_batches`` transforms plus the engine's
standard folds; everything is deterministic and SQL-replayable so the
queries carry full DuckDB oracles:

- :func:`chunk_documents` — split each doc's whitespace tokens into
  fixed-size overlapping windows (``chunk_size``, ``stride``), the
  standard context-window preparation. Pure per-block (no shuffle);
  chunk text re-joins with single spaces.
- :func:`decontaminate` — flag training docs sharing ≥ ``min_hits``
  distinct ``n``-token shingles with an evaluation set (train/test
  overlap scrubbing). The eval shingle set broadcasts via ``ray.put``
  (eval sets are benchmark-sized by nature); the docstring documents
  the Bloom-prefilter escape for adversarially large eval sets
  (``ops.join.bloom_semi_join`` shape).
- :func:`token_budget_mix` — keep each group's docs in a deterministic
  hash order until a token budget is exhausted (data-mixing rebalance);
  the per-group running token sums ride :func:`ops.scan.running_scan`
  (one coarse shuffle, vectorized folds), so no group ever sits on the
  driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


# ---------------------------------------------------------------------------
# context-window chunking
# ---------------------------------------------------------------------------

def chunk_documents(ds, chunk_size: int = 16, overlap: int = 4,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of (doc_id, chunk_idx, n_tokens, chunk_text): whitespace
    tokens windowed at ``stride = chunk_size - overlap``; starts are
    ``0, stride, 2·stride, …  < n_tokens`` (every token is covered; the
    final window may be short — the simple rule both sides replay).
    Empty/whitespace-only docs produce no chunks."""
    if chunk_size < 1 or overlap < 0 or overlap >= chunk_size:
        raise ValueError("need chunk_size >= 1 and 0 <= overlap < chunk_size")
    stride = chunk_size - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col].to_pylist()
        out_id, out_ix, out_n, out_tx = [], [], [], []
        for did, t in zip(ids, texts):
            toks = t.split() if t is not None else []
            n = len(toks)
            if n == 0:
                continue
            for ix, start in enumerate(range(0, n, stride)):
                w = toks[start:start + chunk_size]
                out_id.append(did)
                out_ix.append(ix)
                out_n.append(len(w))
                out_tx.append(" ".join(w))
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_ix, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "chunk_text": pa.array(out_tx, pa.string()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# decontamination (train/eval shingle overlap)
# ---------------------------------------------------------------------------

def _doc_shingles(batch: pa.Table, n: int, id_col: str, text_col: str):
    """(doc_ids int64[], shingles object[]) — DISTINCT n-token shingles
    per doc, vectorized over the block's whole word stream."""
    ids = pd.Series(batch[id_col].to_pylist())
    s = pd.Series(batch[text_col].to_pylist(), dtype="object")
    ex = s.str.split().explode().dropna()
    if len(ex) < n:
        return np.zeros(0, np.int64), np.zeros(0, object)
    idx = ex.index.to_numpy()
    w = ex.to_numpy(dtype=object)
    m = len(w) - n + 1
    same = np.ones(m, dtype=bool)
    for j in range(n - 1):
        same &= idx[j:j + m] == idx[j + 1:j + 1 + m]
    if not same.any():
        return np.zeros(0, np.int64), np.zeros(0, object)
    sh = w[:m][same]
    for j in range(1, n):
        sh = sh + " " + w[j:j + m][same]
    docs = ids.reindex(idx[:m][same]).to_numpy(np.int64)
    df = pd.DataFrame({"d": docs, "s": sh}).drop_duplicates()
    return df["d"].to_numpy(np.int64), df["s"].to_numpy(dtype=object)


def decontaminate(train_ds, eval_ds, n: int = 5, min_hits: int = 1,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of (doc_id, n_shared_shingles) — training docs whose
    DISTINCT ``n``-token shingle overlap with the union of the eval
    set's shingles reaches ``min_hits``.

    The eval shingle set gathers once and broadcasts via ``ray.put``
    (benchmark suites are small by nature — the only gather in the op);
    every training block then resolves with one vectorized ``isin``.
    For an eval side too big to broadcast exactly, swap the probe for a
    Bloom broadcast + exact shuffle verify (``ops/join.bloom_semi_join``
    + ``partitioned_semi_join`` — same contract as dormant_customers).
    """
    import ray

    ev: set = set()
    for b in eval_ds.select_columns([id_col, text_col]).iter_batches(
            batch_size=4096, batch_format="pyarrow"):
        _, sh = _doc_shingles(b, n, id_col, text_col)
        ev.update(sh.tolist())
    ev_ref = ray.put(ev)

    def probe(batch: pa.Table) -> pa.Table:
        evs = ray.get(ev_ref)
        docs, sh = _doc_shingles(batch, n, id_col, text_col)
        if docs.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_shared_shingles": pa.array([], pa.int64())})
        hit = pd.Series(sh).isin(evs).to_numpy()
        g = (pd.DataFrame({"d": docs[hit]})
             .groupby("d").size().reset_index(name="h"))
        g = g[g["h"] >= min_hits]
        return pa.table({
            id_col: pa.array(g["d"].to_numpy(np.int64)),
            "n_shared_shingles": pa.array(g["h"].to_numpy(np.int64)),
        })

    return train_ds.map_batches(probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# token-budget data mixing
# ---------------------------------------------------------------------------

def token_budget_mix(ds, budget: int, group_col: str = "lang",
                     id_col: str = "doc_id", text_col: str = "text"):
    """Per-group token-budget selection (data-mixing rebalance): docs
    are ordered inside each group by ``(seed_key32(doc_id), doc_id)``
    (the engine's SQL-replayable spreading key — a deterministic
    shuffle) and kept while the group's running whitespace-token total
    stays ≤ ``budget``.

    Returns a Dataset of kept (group, doc_id, n_tokens, running) rows.
    The running sums come from :func:`ops.scan.running_scan`'s hash
    route — one coarse shuffle, no group on the driver.
    """
    from .cluster import seed_key32
    from .scan import running_scan

    def tokens(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(batch[text_col].to_pylist(), dtype="object").fillna("")
        n = s.str.split().map(len).to_numpy(np.int64)
        return pa.table({
            group_col: batch[group_col],
            id_col: pa.array(ids, pa.int64()),
            "skey": pa.array(seed_key32(ids), pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
        })

    keyed = ds.map_batches(tokens, batch_format="pyarrow")
    scanned = running_scan(keyed, group_col, ["skey", id_col], "n_tokens")

    def keep(batch: pa.Table) -> pa.Table:
        run = batch["running"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(run <= budget)).select(
            [group_col, id_col, "n_tokens", "running"])

    return scanned.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# training-shard emission (the pipeline's last mile)
# ---------------------------------------------------------------------------

def write_training_shards(ds, out_root: str, n_shards: int = 8,
                          id_col: str = "doc_id", text_col: str = "text"):
    """Write the corpus as ``n_shards`` deterministic training shards
    (hive dirs ``shard=i/``, atomic ``_SUCCESS`` publish) and return the
    root. Shard assignment is ``seed_key32(doc_id) % n_shards`` — a
    deterministic hash shuffle, the scale-honest stand-in for an RNG
    pass (SQL-replayable, stable under any re-run or partitioning, and
    docs land spread across shards regardless of input order). Within a
    shard, consumer order is the deterministic ``(seed_key32(id), id)``
    rule — a pure function of content, so nothing order-dependent needs
    to survive the parallel write. Rows carry ``n_tokens`` so consumers
    can budget batches without re-tokenizing."""
    from ..engine.sinks import write_dataset
    from .cluster import seed_key32

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(batch[text_col].to_pylist(), dtype="object").fillna("")
        n = s.str.split().map(len).to_numpy(np.int64)
        shard = seed_key32(ids) % np.int64(n_shards)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            text_col: batch[text_col],
            "n_tokens": pa.array(n, pa.int64()),
            "shard": pa.array(shard, pa.int64()),
        })

    return write_dataset(
        ds.map_batches(assign, batch_format="pyarrow"),
        out_root, partition_cols=["shard"])


def write_training_shards_checkpointed(
    shard_paths: list[str],
    out_root: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    _fail_after: int | None = None,
) -> dict:
    """Resumable shard emission for corpus-scale runs: each INPUT chunk
    (one source parquet shard) writes its own atomically-published
    layout directory ``out_root/chunk-<j>/shard=<i>/...`` — a killed run
    re-submitted with the same ``out_root`` skips every chunk whose
    ``_SUCCESS`` marker exists and produces byte-identical shards
    (assignment is the deterministic ``seed_key32 % n_shards``; no RNG,
    no cross-chunk state). Consumers read training shard ``i`` as the
    union of ``chunk-*/shard=<i>`` (``read_training_shard``).

    The resume unit is the input chunk because shard assignment is
    row-local: unlike the dedup pipeline's global shuffle stages there
    is NO stage whose output spans chunks, so per-chunk granularity is
    both honest and maximal. ``_fail_after=j`` is the test kill hook
    (raises after chunk index ``j`` publishes).

    Returns ``{"chunks_total", "chunks_skipped_resume", "chunks_written"}``.
    """
    import os

    import ray.data as rd

    from ..engine.sinks import SUCCESS_MARKER, write_dataset
    from .cluster import seed_key32

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    os.makedirs(out_root, exist_ok=True)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(batch[text_col].to_pylist(), dtype="object").fillna("")
        n = s.str.split().map(len).to_numpy(np.int64)
        shard = seed_key32(ids) % np.int64(n_shards)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            text_col: batch[text_col],
            "n_tokens": pa.array(n, pa.int64()),
            "shard": pa.array(shard, pa.int64()),
        })

    skipped = written = 0
    for j, src in enumerate(sorted(shard_paths)):
        chunk_dir = os.path.join(out_root, f"chunk-{j:05d}")
        if os.path.exists(os.path.join(chunk_dir, SUCCESS_MARKER)):
            skipped += 1
            continue
        ds = rd.read_parquet(src, columns=[id_col, text_col])
        write_dataset(ds.map_batches(assign, batch_format="pyarrow"),
                      chunk_dir, partition_cols=["shard"])
        written += 1
        if _fail_after is not None and j >= _fail_after:
            raise RuntimeError(f"injected failure after chunk {j}")
    return {"chunks_total": len(shard_paths),
            "chunks_skipped_resume": skipped,
            "chunks_written": written}


def read_training_shard(out_root: str, shard: int):
    """Dataset over ONE training shard across every published chunk of a
    :func:`write_training_shards_checkpointed` layout (chunks without a
    ``_SUCCESS`` marker — crashed partial writes — are never read)."""
    import glob
    import os

    import ray.data as rd

    from ..engine.sinks import SUCCESS_MARKER

    dirs = []
    for chunk in sorted(glob.glob(os.path.join(out_root, "chunk-*"))):
        if not os.path.exists(os.path.join(chunk, SUCCESS_MARKER)):
            continue
        sub = os.path.join(chunk, f"shard={shard}")
        if os.path.isdir(sub):
            dirs.append(sub)
    if not dirs:
        raise FileNotFoundError(
            f"{out_root}: no published chunks carry shard={shard}")
    return rd.read_parquet(dirs, file_extensions=["parquet"])


def pack_sequences(ds, seq_tokens: int = 32, id_col: str = "doc_id",
                   text_col: str = "text"):
    """GPT-style sequence packing (concatenate-and-split): the corpus's
    whitespace tokens are concatenated in the deterministic
    ``(seed_key32(doc_id), doc_id)`` shuffle order and split every
    ``seq_tokens`` tokens; returns a Dataset of per-sequence profiles
    ``(seq_id, n_docs, n_tokens)`` — ``n_tokens == seq_tokens``
    everywhere except the final partial sequence.

    Plan: per-doc token counts ride :func:`ops.scan.running_scan`'s
    SORTED route (the single global order is one hot key by
    construction — exactly the hot-key case the sort-partitioned prefix
    scan exists for; the driver folds only per-block summaries). Each
    doc then knows its global token span ``[running - n, running)`` and
    emits one row per sequence it touches (≤ n/seq_tokens + 2 rows,
    vectorized repeat/arithmetic — no Python loop), and one coarse
    fold sums per-sequence contributions.
    """
    from ..engine.hashing import append_coarse_bucket
    from .cluster import seed_key32
    from .scan import running_scan

    if seq_tokens < 1:
        raise ValueError("seq_tokens must be >= 1")

    def tokens(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(batch[text_col].to_pylist(), dtype="object").fillna("")
        n = s.str.split().map(len).to_numpy(np.int64)
        return pa.table({
            "g": pa.array(np.zeros(len(ids), np.int64)),
            id_col: pa.array(ids, pa.int64()),
            "skey": pa.array(seed_key32(ids), pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
        })

    keyed = ds.map_batches(tokens, batch_format="pyarrow")
    scanned = running_scan(keyed, "g", ["skey", id_col], "n_tokens",
                           route="sorted")

    S = np.int64(seq_tokens)

    def spans(batch: pa.Table) -> pa.Table:
        run = batch["running"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = batch["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        live = n > 0  # empty docs touch no sequence
        run, n = run[live], n[live]
        if run.size == 0:
            return pa.table({"seq_id": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        start = run - n
        first, last = start // S, (run - 1) // S
        reps = (last - first + 1).astype(np.int64)
        base = np.repeat(first, reps)
        # within-doc sequence index 0..reps-1 via grouped cumcount
        ends = np.cumsum(reps)
        offs = np.arange(ends[-1], dtype=np.int64) \
            - np.repeat(ends - reps, reps)
        seq = base + offs
        st = np.repeat(start, reps)
        en = np.repeat(run, reps)
        t = np.minimum(en, (seq + 1) * S) - np.maximum(st, seq * S)
        return pa.table({"seq_id": pa.array(seq, pa.int64()),
                         "t": pa.array(t, pa.int64()),
                         "d": pa.array(np.ones(seq.size, np.int64))})

    parts = scanned.map_batches(spans, batch_format="pyarrow")

    def bucket(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(b, ["seq_id"], 256, "sb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("seq_id", sort=False).agg(
            n_docs=("d", "sum"), n_tokens=("t", "sum")).reset_index()
        return g[["seq_id", "n_docs", "n_tokens"]]

    return parts.map_batches(bucket, batch_format="pyarrow").groupby(
        "sb").map_groups(lambda g: fold(g.drop(columns=["sb"])),
                         batch_format="pandas")


def write_range_shards(ds, out_root: str, key_col: str,
                       n_shards: int = 8, kll_k: int = 2048):
    """Write the corpus as ``n_shards`` RANGE-partitioned shards (hive
    dirs ``shard=i/``, atomic ``_SUCCESS`` publish) and return
    ``(root, bounds)`` — the sorted-layout counterpart of
    :func:`write_training_shards`' hash layout. Range layout is what
    enables merge joins, sorted scans, and key-range pruning at
    warehouse scale.

    Shard boundaries are the ``(i/n)``-quantiles of ``key_col`` from a
    merged KLL sketch (one cheap pass; sparse-exact — the ceil(q·n)
    discrete rule — below compaction capacity, rank-error-bounded
    above, which only skews shard SIZES, never correctness); shard
    assignment is ``searchsorted(bounds, key, side='left')`` — shards
    are DISJOINT, CONTIGUOUS key ranges by construction: every key in
    shard i is ≤ every bound_j (j ≥ i) and > bound_{i-1}. One counting
    pass assigns and writes; never a global sort."""
    import functools

    from ..engine.aggregate import sketch_aggregate
    from ..engine.sinks import write_dataset
    from ..engine.udaf import SketchSpec
    from ..sketches import KLL

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    merged = sketch_aggregate(
        ds, [SketchSpec("q", key_col, functools.partial(KLL, kll_k))],
        merge="driver")
    kl = merged[""]["q"]
    bounds = np.asarray(
        [kl.quantile(i / n_shards) for i in range(1, n_shards)],
        dtype=np.float64)
    root = write_range_shards_aligned(ds, out_root, key_col, bounds)
    return root, bounds


def write_range_shards_aligned(ds, out_root: str, key_col: str,
                               bounds: "np.ndarray") -> str:
    """Write ``ds`` range-partitioned on CALLER-PROVIDED shard bounds —
    the co-partitioning half of the range layout: two tables written
    with the SAME bounds on their join key align shard-for-shard, so a
    later join touches each shard pair with no runtime shuffle
    (:func:`raysketch.ops.join.range_copartition_join`)."""
    from ..engine.sinks import write_dataset

    bounds = np.asarray(bounds, dtype=np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        shard = np.searchsorted(bounds, k, side="left").astype(np.int64)
        return batch.append_column("shard", pa.array(shard, pa.int64()))

    return write_dataset(ds.map_batches(assign, batch_format="pyarrow"),
                         out_root, partition_cols=["shard"])


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------

# per-worker-process token→bucket cache (the ops/join._DIM_BUCKET_CACHE
# discipline: worker processes are reused across blocks, so a module
# dict amortizes the sha256 of recurring vocabulary)
_DSIR_HASH_CACHE: dict[int, dict[str, int]] = {}
_DSIR_CACHE_MAX = 1_000_000


def _dsir_buckets(tokens: np.ndarray, n_buckets: int) -> np.ndarray:
    """Bucket ids for an object array of tokens: sha256 hex[:16] as
    uint64 mod n_buckets (the feature_hashing scheme — DuckDB-replayable
    via sha256 + HUGEINT arithmetic), hashed once per DISTINCT token
    per process."""
    import hashlib

    cache = _DSIR_HASH_CACHE.setdefault(n_buckets, {})
    if len(cache) > _DSIR_CACHE_MAX:
        cache.clear()
    uniq, inv = np.unique(tokens.astype(str), return_inverse=True)
    bk = np.empty(len(uniq), dtype=np.int64)
    for i, t in enumerate(uniq):
        b = cache.get(t)
        if b is None:
            b = int(hashlib.sha256(t.encode()).hexdigest()[:16], 16) \
                % n_buckets
            cache[t] = b
        bk[i] = b
    return bk[inv]


def dsir_select(ds_factory, target_col: str, target_value: str,
                n_buckets: int = 64, top_k: int = 100,
                id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023) over hashed unigram features: score every document by how
    much more likely its token stream is under the TARGET distribution
    (rows where ``target_col == target_value``) than under the raw
    corpus, and keep the ``top_k`` — the published recipe for skewing a
    100-TB crawl toward a high-quality slice without training a model.

    Two streaming passes over the corpus (``ds_factory()`` builds a
    fresh Dataset per pass — DSIR fundamentally needs global bucket
    statistics before it can score):

    1. Each block reduces to ``(bucket, n_raw, n_tgt)`` token counts
       (≤ ``n_buckets`` rows per block); the driver folds them and
       forms Laplace-smoothed log-ratios in INTEGER micro-nats:
       ``r[b] = round(ln(p_tgt[b]/p_raw[b])·1e6)``.
    2. Each block scores its docs — ``score = Σ_tokens r[bucket]``,
       an exact int64 — and keeps a local (score desc, id asc) top-k;
       the driver folds blocks × k rows.

    The ratio table is ``n_buckets`` ints (a closure capture, never a
    shuffle); token hashing is sha256-per-distinct-token with a
    per-process cache, so the whole statistic — hash, smoothing, log,
    rounding, tie-break — replays bit-for-bit in DuckDB. Deterministic
    top-k stands in for gumbel-top-k sampling (same selection shape,
    seedable by salting the hash input)."""
    if top_k < 1 or n_buckets < 1:
        raise ValueError("top_k and n_buckets must be >= 1")

    def count_partial(b: pa.Table) -> pa.Table:
        s = pd.Series(b[text_col].to_pylist(), dtype="object")
        is_tgt = np.asarray(
            [v == target_value for v in b[target_col].to_pylist()])
        ex = s.str.split().explode().dropna()
        if ex.empty:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_raw": pa.array([], pa.int64()),
                             "n_tgt": pa.array([], pa.int64())})
        bk = _dsir_buckets(ex.to_numpy(dtype=object), n_buckets)
        tgt = is_tgt[ex.index.to_numpy()]
        n_raw = np.bincount(bk, minlength=n_buckets)
        n_tgt = np.bincount(bk[tgt], minlength=n_buckets)
        keep = np.flatnonzero(n_raw)
        return pa.table({
            "bucket": pa.array(keep, pa.int64()),
            "n_raw": pa.array(n_raw[keep], pa.int64()),
            "n_tgt": pa.array(n_tgt[keep], pa.int64())})

    cnt = (ds_factory().map_batches(count_partial, batch_format="pyarrow")
           .to_pandas().groupby("bucket", as_index=False).sum())
    c_raw = np.zeros(n_buckets, dtype=np.int64)
    c_tgt = np.zeros(n_buckets, dtype=np.int64)
    c_raw[cnt["bucket"]] = cnt["n_raw"]
    c_tgt[cnt["bucket"]] = cnt["n_tgt"]
    t_raw, t_tgt = int(c_raw.sum()), int(c_tgt.sum())
    if t_tgt == 0:
        raise ValueError("dsir_select: no target rows "
                         f"({target_col} == {target_value!r})")
    p_t = (c_tgt + 1) / np.float64(t_tgt + n_buckets)
    p_r = (c_raw + 1) / np.float64(t_raw + n_buckets)
    lr = np.log(p_t / p_r) * 1e6
    r_micro = (np.sign(lr) * np.floor(np.abs(lr) + 0.5)).astype(np.int64)

    def score_partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(b[text_col].to_pylist(), dtype="object")
        ex = s.str.split().explode().dropna()
        scores = np.zeros(len(ids), dtype=np.int64)
        if not ex.empty:
            bk = _dsir_buckets(ex.to_numpy(dtype=object), n_buckets)
            np.add.at(scores, ex.index.to_numpy(), r_micro[bk])
        order = np.lexsort((ids, -scores))[:top_k]
        return pa.table({
            id_col: pa.array(ids[order], pa.int64()),
            "dsir_micro_nats": pa.array(scores[order], pa.int64())})

    parts = (ds_factory().map_batches(score_partial, batch_format="pyarrow")
             .to_pandas())
    parts = parts.sort_values(
        ["dsir_micro_nats", id_col], ascending=[False, True]).head(top_k)
    return pa.Table.from_pandas(parts.reset_index(drop=True),
                                preserve_index=False)


# ---------------------------------------------------------------------------
# Z-order (Morton) multi-column layout
# ---------------------------------------------------------------------------

def zorder_keys(a: np.ndarray, b: np.ndarray,
                a_min: int, a_max: int, b_min: int, b_max: int,
                bits: int = 8) -> np.ndarray:
    """Morton z-values for two integer columns: each column is
    equi-width bucketized to ``2^bits`` buckets with PURE integer
    arithmetic (``(x − lo) · 2^bits // (hi − lo + 1)`` — exact,
    BIGINT-replayable), then the bucket bits interleave
    (a takes the odd bit positions). Vectorized: one fixed
    ``bits``-iteration numpy loop, never per-row."""
    span_a = a_max - a_min + 1
    span_b = b_max - b_min + 1
    ba = (a.astype(np.int64) - a_min) * (1 << bits) // span_a
    bb = (b.astype(np.int64) - b_min) * (1 << bits) // span_b
    z = np.zeros(len(ba), dtype=np.int64)
    for i in range(bits):
        z |= ((ba >> i) & 1) << (2 * i + 1)
        z |= ((bb >> i) & 1) << (2 * i)
    return z


def write_zorder_shards(ds, out_root: str, a_col: str, b_col: str,
                        bits: int = 8, n_shards: int = 8):
    """Write the corpus as ``n_shards`` Z-ORDER-clustered shards (hive
    dirs, atomic ``_SUCCESS``) — the multi-column locality layout
    (Morton order; what lakehouse OPTIMIZE ZORDER implements) that lets
    later scans prune on EITHER column: each shard is a contiguous
    z-range, so both columns' value ranges per shard stay narrow
    instead of one column sorted and the other scattered.

    One cheap pass folds the two columns' global int min/max (a 1-row
    partial per block); the assign pass computes :func:`zorder_keys`
    and routes ``shard = z >> (2·bits − log2(n_shards))`` — contiguous
    disjoint z-ranges by construction. No global sort at any scale;
    skewed value distributions skew shard SIZES only (the equi-width
    trade-off vs :func:`write_range_shards`' quantile bounds).
    ``n_shards`` must be a power of two ≤ ``4^bits``. Returns
    ``(root, (a_min, a_max, b_min, b_max))``."""
    from ..engine.sinks import write_dataset

    if n_shards < 1 or (n_shards & (n_shards - 1)) != 0:
        raise ValueError("n_shards must be a power of two")
    shift = 2 * bits - int(n_shards).bit_length() + 1
    if shift < 0:
        raise ValueError("n_shards exceeds 4^bits z-buckets")

    def mm_partial(b: pa.Table) -> pa.Table:
        a = b[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("a_min", "a_max", "b_min", "b_max")})
        return pa.table({
            "a_min": pa.array([int(a.min())], pa.int64()),
            "a_max": pa.array([int(a.max())], pa.int64()),
            "b_min": pa.array([int(v.min())], pa.int64()),
            "b_max": pa.array([int(v.max())], pa.int64())})

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    if mm.empty:
        raise ValueError("write_zorder_shards: empty input")
    a_lo, a_hi = int(mm["a_min"].min()), int(mm["a_max"].max())
    b_lo, b_hi = int(mm["b_min"].min()), int(mm["b_max"].max())

    def assign(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        z = zorder_keys(a, v, a_lo, a_hi, b_lo, b_hi, bits)
        batch = batch.append_column("zval", pa.array(z, pa.int64()))
        return batch.append_column(
            "shard", pa.array(z >> shift, pa.int64()))

    root = write_dataset(ds.map_batches(assign, batch_format="pyarrow"),
                         out_root, partition_cols=["shard"])
    return root, (a_lo, a_hi, b_lo, b_hi)


def doc_novelty(ds, n: int = 5, id_col: str = "doc_id",
                text_col: str = "text", num_buckets: int = 256):
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    n-token shingles whose GLOBAL first occurrence (smallest doc id) is
    this doc — the "how much of this document is new text"
    memorization/boilerplate proxy novelty-based curation filters on
    (low novelty ⇒ the doc restates earlier corpus content). Returns a
    Dataset of (id, n_shingles, n_novel, novelty round6).

    Plan: distinct (doc, shingle) pairs stream out of one vectorized
    pass; ONE coarse ``hash(shingle)`` fold resolves each shingle's
    global min-doc (the vocab_growth shape — every shingle decides in
    exactly one bucket) and emits (doc, total, novel) count partials;
    a second coarse ``hash(doc)`` fold sums them. Shuffle volume is
    the distinct pair stream; the shingle vocabulary never gathers."""
    from ..engine.hashing import append_coarse_bucket

    def pairs(b: pa.Table) -> pa.Table:
        d, s = _doc_shingles(b, n, id_col, text_col)
        t = pa.table({"d": pa.array(d, pa.int64()),
                      "s": pa.array(s, pa.string())})
        return append_coarse_bucket(t, ["s"], num_buckets, "__nb")

    def shingle_fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__nb").drop_duplicates(["d", "s"])
        if df.empty:
            return pd.DataFrame({
                "d": pd.Series([], dtype="int64"),
                "tot": pd.Series([], dtype="int64"),
                "nov": pd.Series([], dtype="int64")})
        first = df.groupby("s")["d"].transform("min")
        out = pd.DataFrame({
            "d": df["d"],
            "tot": np.ones(len(df), np.int64),
            "nov": (df["d"].to_numpy(np.int64)
                    == first.to_numpy(np.int64)).astype(np.int64)}) \
            .groupby("d", as_index=False).sum()
        return out

    def doc_fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns="__db").groupby("d", as_index=False).sum()
        tot = out["tot"].to_numpy(np.int64)
        nov = out["nov"].to_numpy(np.int64)
        ratio = nov / np.maximum(tot, 1)
        r6 = np.sign(ratio) * np.floor(np.abs(ratio) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({
            id_col: out["d"].to_numpy(np.int64),
            "n_shingles": tot,
            "n_novel": nov,
            "novelty": r6})

    return (ds.select_columns([id_col, text_col])
            .map_batches(pairs, batch_format="pyarrow")
            .groupby("__nb")
            .map_groups(shingle_fold, batch_format="pandas")
            .map_batches(lambda b: append_coarse_bucket(
                b, ["d"], num_buckets, "__db"),
                batch_format="pyarrow")
            .groupby("__db")
            .map_groups(doc_fold, batch_format="pandas"))


def chunk_dedup_coverage(ds, chunk_size: int = 16,
                         id_col: str = "doc_id", text_col: str = "text",
                         num_buckets: int = 256):
    """C4-style duplicate-paragraph coverage: chunk every doc into
    NON-overlapping ``chunk_size``-token windows
    (:func:`chunk_documents` at overlap 0) and report, per doc, how
    many of its chunks' texts also occur in at least one OTHER doc —
    the span-level contamination measure that doc-level exact dedup
    misses entirely.

    Plan: the chunk stream folds ONCE on ``hash(chunk_text)`` — each
    bucket owns every (doc, text) occurrence of its texts, computes
    which texts span ≥ 2 distinct docs, and emits per-doc
    (n_chunks, n_dup) partials; one narrow ``hash(doc)`` fold sums
    them. Returns a Dataset of (doc_id, n_chunks, n_dup_chunks,
    dup_frac round6) — doc-sized, streamable."""
    from ..engine.hashing import append_coarse_bucket

    chunks = chunk_documents(ds, chunk_size=chunk_size, overlap=0,
                             id_col=id_col, text_col=text_col)

    def bucket_text(b: pa.Table) -> pa.Table:
        t = b.select([id_col, "chunk_text"])
        return append_coarse_bucket(t, ["chunk_text"], num_buckets,
                                    "__tb")

    def fold_text(df: pd.DataFrame) -> pd.DataFrame:
        nd = df.groupby("chunk_text")[id_col].transform("nunique")
        df = df.assign(dup=(nd >= 2).astype(np.int64))
        out = df.groupby(id_col, as_index=False).agg(
            n_chunks=("dup", "size"), n_dup=("dup", "sum"))
        out["n_chunks"] = out["n_chunks"].astype("int64")
        out["n_dup"] = out["n_dup"].astype("int64")
        return out

    def fold_doc(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(id_col, as_index=False)[["n_chunks", "n_dup"]] \
            .sum()
        frac = out["n_dup"].to_numpy(np.float64) \
            / out["n_chunks"].to_numpy(np.float64)
        out["dup_frac"] = np.sign(frac) * np.floor(
            np.abs(frac) * 1e6 + 0.5) / 1e6
        return out.rename(columns={"n_dup": "n_dup_chunks"})

    return (chunks.map_batches(bucket_text, batch_format="pyarrow")
            .groupby("__tb")
            .map_groups(lambda df: fold_text(df.drop(columns="__tb")),
                        batch_format="pandas")
            .map_batches(lambda b: append_coarse_bucket(
                b, [id_col], num_buckets, "__db"),
                batch_format="pyarrow")
            .groupby("__db")
            .map_groups(lambda df: fold_doc(df.drop(columns="__db")),
                        batch_format="pandas"))


def cdc_chunk_table(batch: pa.Table, group_col: str, text_col: str,
                    window: int, mask: int) -> pa.Table:
    """One block -> its (g, chunk) content-defined chunk stream
    (cdc_chunks' boundary rule, hoisted for reuse by the transfer
    estimator)."""
    from .text import _FP_BASE

    texts = batch[text_col].to_pylist()
    groups = batch[group_col].to_pylist()
    enc = [(t or "").encode("utf-8") for t in texts]
    lens = np.fromiter((len(e) for e in enc), np.int64,
                       count=len(enc))
    keep = lens > 0
    if not keep.any():
        return pa.table({"g": pa.array([], pa.string()),
                         "chunk": pa.array([], pa.binary())})
    enc = [e for e, k in zip(enc, keep) if k]
    groups = [g for g, k in zip(groups, keep) if k]
    lens = lens[keep]
    blob = np.frombuffer(b"".join(enc), np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens)])  # len+1 fence
    n = blob.size
    cuts = np.zeros(0, np.int64)
    if n >= window:
        h = np.zeros(n - window + 1, np.uint64)
        with np.errstate(over="ignore"):
            pows = _FP_BASE ** np.arange(window - 1, -1, -1,
                                         dtype=np.uint64)
            arr = blob.astype(np.uint64)
            for j in range(window):
                h += arr[j:j + n - window + 1] * pows[j]
        # window [i, i+window) → cut AFTER global byte i+window;
        # valid only when the window sits inside ONE doc
        end = np.arange(window, n + 1, dtype=np.int64)
        doc_of_start = np.searchsorted(starts, end - window,
                                       side="right") - 1
        doc_of_last = np.searchsorted(starts, end - 1,
                                      side="right") - 1
        hit = (h % np.uint64(mask + 1) == 0) \
            & (doc_of_start == doc_of_last)
        cuts = end[hit]
    bounds = np.unique(np.concatenate([starts, cuts]))
    off = bounds.astype(np.int32)
    # chunk i spans [bounds[i], bounds[i+1]); map to its doc
    doc_idx = np.searchsorted(starts, bounds[:-1], side="right") - 1
    chunks = pa.Array.from_buffers(
        pa.binary(), len(bounds) - 1,
        [None, pa.py_buffer(off.tobytes()),
         pa.py_buffer(blob.tobytes())])
    garr = pa.array(
        np.asarray(groups, object)[doc_idx], pa.string())
    return pa.table({"g": garr, "chunk": chunks})



def cdc_chunks(ds, group_col: str = "source", text_col: str = "text",
               window: int = 8, mask: int = 63,
               num_buckets: int = 256):
    """Content-defined chunking (the rsync/LBFS/storage-dedup
    primitive): a chunk boundary falls AFTER byte i whenever the
    Rabin–Karp hash of the ``window`` bytes ending at i satisfies
    ``h % (mask+1) == 0`` — so identical content produces identical
    chunks at ANY offset (insertions only disturb neighboring chunks,
    which fixed-window chunking cannot promise). Reports per-group
    chunk-level dedup: total vs distinct chunks/bytes and the
    storage ratio a chunk store would achieve.

    Fully vectorized AND loop-free: one rolling-hash pass over the
    block's byte blob (fingerprint_batch's machinery), boundary
    positions become ONE Arrow BinaryArray offsets buffer — chunk
    extraction is zero-copy, never a per-chunk slice loop. Chunk
    texts fold once on hash(chunk) coarse buckets (every copy of a
    chunk lands in one bucket), emitting narrow per-group partials.
    Returns (group, n_chunks, n_bytes, n_distinct, distinct_bytes,
    dedup_ratio round6) ordered by group. The boundary rule replays
    in DuckDB HUGEINT arithmetic (the fingerprints oracle family)."""
    from ..engine.hashing import append_coarse_bucket
    from .text import _FP_BASE  # same polynomial family

    if window < 2 or mask < 1:
        raise ValueError("cdc_chunks: need window >= 2 and mask >= 1")

    def chunk(batch: pa.Table) -> pa.Table:
        return cdc_chunk_table(batch, group_col, text_col, window, mask)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        ln = df["chunk"].str.len().to_numpy(np.int64)
        df = df.assign(ln=ln)
        tot = df.groupby("g", sort=False)["ln"].agg(["size", "sum"])
        dis = df.drop_duplicates(["g", "chunk"]) \
            .groupby("g", sort=False)["ln"].agg(["size", "sum"])
        out = tot.join(dis, lsuffix="_t", rsuffix="_d").reset_index()
        return pd.DataFrame({
            "g": out["g"],
            "n_chunks": out["size_t"].astype("int64"),
            "n_bytes": out["sum_t"].astype("int64"),
            "n_distinct": out["size_d"].astype("int64"),
            "distinct_bytes": out["sum_d"].astype("int64")})

    parts = (ds.select_columns([group_col, text_col])
             .map_batches(chunk, batch_format="pyarrow")
             .map_batches(lambda b: append_coarse_bucket(
                 b, ["chunk"], num_buckets, "__cb"),
                 batch_format="pyarrow")
             .groupby("__cb")
             .map_groups(lambda d: fold(d.drop(columns="__cb")),
                         batch_format="pandas")
             .to_pandas()
             .groupby("g", as_index=False).sum().sort_values("g"))
    ratio = parts["distinct_bytes"].to_numpy(np.float64) \
        / parts["n_bytes"].to_numpy(np.float64)
    ratio = np.sign(ratio) * np.floor(np.abs(ratio) * 1e6 + 0.5) / 1e6
    return pa.table({
        group_col: pa.array(parts["g"].to_numpy(object), pa.string()),
        "n_chunks": pa.array(parts["n_chunks"].astype("int64")),
        "n_bytes": pa.array(parts["n_bytes"].astype("int64")),
        "n_distinct": pa.array(parts["n_distinct"].astype("int64")),
        "distinct_bytes": pa.array(parts["distinct_bytes"]
                                   .astype("int64")),
        "dedup_ratio": pa.array(ratio, pa.float64())})


def cdc_transfer_estimate(ds_old, ds_new, group_col: str = "source",
                          text_col: str = "text", window: int = 8,
                          mask: int = 63,
                          num_buckets: int = 256) -> pa.Table:
    """rsync/dedup-store DELTA-SYNC planner: per group, which DISTINCT
    chunks of the NEW version are absent from the old version's chunk
    store — the bytes a content-addressed store actually uploads when a
    corpus revision lands (content-defined boundaries make an edited
    prefix disturb only its neighborhood, so unchanged tails reuse).

    Both versions chunk with the same rule (:func:`cdc_chunk_table`),
    sides are tagged, and ONE hash(chunk) fold resolves presence —
    every copy of a chunk text, either side, lands in one bucket, so
    old∩new is decided locally and only narrow per-group partials
    leave the fold. Returns (group, n_new_chunks, transfer_chunks,
    transfer_bytes, reuse_bytes, reuse_ratio round6) ordered."""
    from ..engine.hashing import append_coarse_bucket

    def tagged(side: int):
        def f(b: pa.Table) -> pa.Table:
            t = cdc_chunk_table(b, group_col, text_col, window, mask)
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int64)))
        return f

    stream = ds_old.select_columns([group_col, text_col]) \
        .map_batches(tagged(0), batch_format="pyarrow") \
        .union(ds_new.select_columns([group_col, text_col])
               .map_batches(tagged(1), batch_format="pyarrow"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["g", "chunk", "side"])
        piv = d.assign(one=1).pivot_table(
            index=["g", "chunk"], columns="side", values="one",
            aggfunc="max", fill_value=0).reset_index()
        if 0 not in piv.columns:
            piv[0] = 0
        if 1 not in piv.columns:
            piv[1] = 0
        new = piv[piv[1] == 1]
        ln = new["chunk"].str.len().to_numpy(np.int64)
        xfer = (new[0] == 0).to_numpy()
        out = pd.DataFrame({
            "g": new["g"].to_numpy(object), "ln": ln,
            "x": xfer.astype(np.int64)})
        out["bx"] = np.where(xfer, ln, 0)
        out["br"] = np.where(xfer, 0, ln)
        agg = out.groupby("g", sort=False).agg(
            n_new=("x", "size"), n_xfer=("x", "sum"),
            b_xfer=("bx", "sum"), b_reuse=("br", "sum")).reset_index()
        return agg.astype({c: "int64" for c in
                           ("n_new", "n_xfer", "b_xfer", "b_reuse")})

    parts = (stream.map_batches(
        lambda b: append_coarse_bucket(b, ["chunk"], num_buckets, "__tb"),
        batch_format="pyarrow")
        .groupby("__tb")
        .map_groups(lambda d: fold(d.drop(columns="__tb")),
                    batch_format="pandas")
        .to_pandas()
        .groupby("g", as_index=False)[["n_new", "n_xfer", "b_xfer",
                                       "b_reuse"]].sum()
        .sort_values("g"))
    tot = parts["b_xfer"].to_numpy(np.int64) \
        + parts["b_reuse"].to_numpy(np.int64)
    ratio = parts["b_reuse"].to_numpy(np.float64) \
        / np.where(tot == 0, 1, tot).astype(np.float64)
    ratio = np.sign(ratio) * np.floor(np.abs(ratio) * 1e6 + 0.5) / 1e6
    return pa.table({
        group_col: pa.array(parts["g"].to_numpy(object), pa.string()),
        "n_new_chunks": pa.array(parts["n_new"].astype("int64")),
        "transfer_chunks": pa.array(parts["n_xfer"].astype("int64")),
        "transfer_bytes": pa.array(parts["b_xfer"].astype("int64")),
        "reuse_bytes": pa.array(parts["b_reuse"].astype("int64")),
        "reuse_ratio": pa.array(ratio, pa.float64())})
