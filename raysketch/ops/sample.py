"""Sampling operators.

The reference ecosystem samples by message matcher (1% via
``Uuid < '\\003'``, heka_message_monitor.lua:20) — i.e. a DETERMINISTIC
hash-threshold sample, not an RNG one. Same idea here, generalized:

- :func:`hash_sample` — uniform sample WITHOUT replacement of exactly k
  rows: every row gets a deterministic 64-bit key from its id column
  (seeded splitmix remix), the sample is the k smallest keys. Map side
  emits each block's k smallest candidates (narrow), the driver keeps the
  global k — shuffle volume is ``num_blocks × k`` rows regardless of
  input size. Retry-safe: no RNG state, same rows every run.
- :func:`hash_threshold_filter` — the streaming form: keep rows whose key
  is below ``rate * 2^64`` (an expected-rate Bernoulli sample that is
  consistent across runs and across tables sharing the id column).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..engine.hashing import hash64_batch_aligned, splitmix64


def _keys(batch: pa.Table, id_col: str, seed: int) -> np.ndarray:
    """Row-ALIGNED sample keys: one key per batch row (null ids get the max
    key, so they sort last / fail every threshold and are never silently
    swapped for a neighboring row)."""
    h, valid = hash64_batch_aligned(batch[id_col])
    key = splitmix64(h ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    key[~valid] = np.uint64(0xFFFFFFFFFFFFFFFF)
    return key


def _sha_keys(batch: pa.Table, id_col: str) -> np.ndarray:
    """Hex-sha256-of-str(id) sample keys (object array of str; nulls sort
    last). Slower than the hash64 path but reproducible by any engine —
    ``ORDER BY sha256(CAST(id AS VARCHAR))`` selects the same rows."""
    from ..engine.hashing import sha256_batch

    ids = batch[id_col].to_pylist()
    keys = sha256_batch(pa.array([None if i is None else str(i) for i in ids]))
    return np.array(["￿" if s is None else s for s in keys], dtype=object)


def hash_sample(ds, k: int, id_col: str, seed: int = 42, key: str = "hash64"):
    """Exactly-k deterministic uniform sample (all original columns).

    ``key="hash64"`` (default) uses the engine's vectorized hash;
    ``key="sha256"`` keys rows by ``sha256(str(id))`` hex — slower, but the
    selection is cross-engine checkable (a SQL oracle reproduces it with
    ``ORDER BY sha256(CAST(id AS VARCHAR)) LIMIT k``).
    """
    if key not in ("hash64", "sha256"):
        raise ValueError("key must be 'hash64' or 'sha256'")

    def block_candidates(batch: pa.Table) -> pa.Table:
        kk = min(k, batch.num_rows)
        if key == "hash64":
            kv = _keys(batch, id_col, seed)
            idx = np.argpartition(kv, kk - 1)[:kk] if batch.num_rows > kk else \
                np.arange(batch.num_rows)
            out = batch.take(pa.array(np.sort(idx)))
            return out.append_column(
                "__sample_key", pa.array(kv[np.sort(idx)], pa.uint64())
            )
        kv = _sha_keys(batch, id_col)
        idx = np.argsort(kv, kind="stable")[:kk]
        out = batch.take(pa.array(np.sort(idx)))
        return out.append_column(
            "__sample_key", pa.array(list(kv[np.sort(idx)]), pa.string())
        )

    def refold(batch: pa.Table) -> pa.Table:
        """Tree level: keep this coalesced batch's k smallest keys, so the
        driver sees ≤ (blocks / fan-in) × k rows per level instead of
        blocks × k — candidates stay bounded at any block count."""
        kv = batch["__sample_key"].to_numpy(zero_copy_only=False)
        if key == "hash64":
            kv = kv.astype(np.uint64)
        if batch.num_rows <= k:
            return batch
        order = np.argsort(kv, kind="stable")[:k]
        return batch.take(pa.array(np.sort(order)))

    cand = ds.map_batches(block_candidates, batch_format="pyarrow").map_batches(
        refold, batch_format="pyarrow", batch_size=64 * max(k, 1)
    )
    parts = list(cand.iter_batches(batch_size=65536, batch_format="pyarrow"))
    if not parts:  # empty input: empty typed result, original schema
        sch = ds.schema()
        return pa.table({n: pa.array([], t)
                         for n, t in zip(sch.names, sch.types)})
    merged = pa.concat_tables(parts)
    # canonical output order = ascending sample key: block arrival order
    # varies run to run, the key order never does (keys are unique w.h.p.)
    keys_np = merged["__sample_key"].to_numpy(zero_copy_only=False)
    if key == "hash64":
        keys_np = keys_np.astype(np.uint64)
    order = np.argsort(keys_np, kind="stable")[:k]
    return merged.take(pa.array(order)).drop_columns(["__sample_key"])


def stratified_hash_sample(ds, k: int, group_col: str, id_col: str,
                           seed: int = 42, key: str = "hash64"):
    """Exactly-k-per-group deterministic sample (all original columns) —
    the stratified form of :func:`hash_sample` (per-language /
    per-source training-data subsets with reproducible selection).

    Map side keeps each block's k smallest keys PER GROUP (one vectorized
    pandas sort + grouped head, no per-group loop); a coalescing refold
    level bounds candidates at any block count; the driver fold touches
    ≤ groups × k narrow-candidate rows. That driver bound is the size
    contract: at extreme group cardinality (groups × k beyond driver
    memory) use a ``groupby(group).map_groups`` plan instead — this
    operator targets the stratification case (languages, sources, time
    buckets: group counts in the thousands).

    ``key="sha256"`` keys rows by ``sha256(str(id))`` so a SQL oracle
    reproduces the selection with ``row_number() OVER (PARTITION BY g
    ORDER BY sha256(CAST(id AS VARCHAR))) <= k``.
    """
    import pandas as pd

    if key not in ("hash64", "sha256"):
        raise ValueError("key must be 'hash64' or 'sha256'")

    def _group_head_idx(batch: pa.Table, kv: np.ndarray) -> np.ndarray:
        """Row indices of each group's k smallest keys (sorted ascending).
        ``dropna=False``: a NULL group value is a real stratum exactly as
        in the SQL oracle's PARTITION BY (a null-dropping groupby would
        silently lose the whole stratum)."""
        df = pd.DataFrame({
            "g": batch[group_col].to_pandas(),  # Arrow-backed, no boxing
            "k": kv,
            "i": np.arange(batch.num_rows),
        })
        keep = (df.sort_values(["g", "k"], kind="stable")
                .groupby("g", sort=False, dropna=False).head(k)["i"].to_numpy())
        return np.sort(keep)

    def block_candidates(batch: pa.Table) -> pa.Table:
        kv = (_keys(batch, id_col, seed) if key == "hash64"
              else _sha_keys(batch, id_col))
        idx = _group_head_idx(batch, kv)
        out = batch.take(pa.array(idx))
        typ = pa.uint64() if key == "hash64" else pa.string()
        # slice the already-computed keys — never a second hash pass
        return out.append_column("__sample_key", pa.array(list(kv[idx]), typ))

    def refold(batch: pa.Table) -> pa.Table:
        kv = batch["__sample_key"].to_numpy(zero_copy_only=False)
        if key == "hash64":
            kv = kv.astype(np.uint64)
        return batch.take(pa.array(_group_head_idx(batch, kv)))

    cand = ds.map_batches(block_candidates, batch_format="pyarrow").map_batches(
        refold, batch_format="pyarrow", batch_size=64 * max(k, 1)
    )
    parts = list(cand.iter_batches(batch_size=65536, batch_format="pyarrow"))
    if not parts:  # empty input: empty typed result, original schema
        sch = ds.schema()
        return pa.table({n: pa.array([], t)
                         for n, t in zip(sch.names, sch.types)})
    merged = pa.concat_tables(parts)
    kv = merged["__sample_key"].to_numpy(zero_copy_only=False)
    if key == "hash64":
        kv = kv.astype(np.uint64)
    return merged.take(pa.array(_group_head_idx(merged, kv))).drop_columns(
        ["__sample_key"])


def hash_threshold_filter(ds, rate: float, id_col: str, seed: int = 42):
    """Expected-``rate`` deterministic Bernoulli sample as a streaming
    filter stage (consistent across runs/tables for the same id)."""
    if not (0.0 < rate <= 1.0):
        raise ValueError("rate must be in (0, 1]")
    threshold = np.uint64(int(rate * float(2**64 - 1)))

    def keep(batch: pa.Table) -> pa.Table:
        key = _keys(batch, id_col, seed)
        return batch.filter(pa.array(key <= threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_hash_sample(ds, k: int, weight_col: str, id_col: str,
                         seed: int = 42, key: str = "hash64"):
    """Exactly-k deterministic WEIGHTED sample without replacement
    (Efraimidis–Spirakis A-ES, the one-pass mergeable scheme): each row
    gets priority ``-ln(u)/w`` with ``u`` a deterministic uniform from
    its id and ``w`` its weight; the sample is the k SMALLEST priorities
    (equivalently the k largest ``u^(1/w)`` of the original paper —
    inclusion probability proportional to weight, no RNG state, same
    rows every run/retry). The standard weighted training-data
    subsampling primitive (quality- or length-weighted corpus cuts).

    Same shuffle discipline as :func:`hash_sample`: per-block k-smallest
    candidates (narrow), a coalescing refold level, driver keeps the
    global k — candidate volume is blocks × k rows at any input size,
    and the per-block top-k commutes because A-ES priorities are
    row-independent.

    Rows with a NULL id, or a NULL / non-finite / non-positive weight,
    are never selected (priority +inf). ``key="sha256"`` derives ``u``
    from the first 16 hex chars of ``sha256(str(id))`` so a SQL oracle
    reproduces the selection exactly: ``ORDER BY -ln((v + 1.0) / 2^64)
    / w LIMIT k`` with ``v`` the same hex-parsed UBIGINT.
    """
    import pandas as pd  # noqa: F401  (kept for symmetry with siblings)

    if key not in ("hash64", "sha256"):
        raise ValueError("key must be 'hash64' or 'sha256'")

    def _priorities(batch: pa.Table) -> np.ndarray:
        if key == "hash64":
            h, valid = hash64_batch_aligned(batch[id_col])
            h = splitmix64(
                h ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
        else:
            from ..engine.hashing import sha256_batch

            ids = batch[id_col].to_pylist()
            hx = sha256_batch(
                pa.array([None if i is None else str(i) for i in ids]))
            valid = np.array([s is not None for s in hx], dtype=bool)
            h = np.array([0 if s is None else int(s[:16], 16) for s in hx],
                         dtype=np.uint64)
        # u in (0, 1]: (v + 1) / 2^64 in double — the +1.0 is exact for
        # small v and a no-op at the top of the range, and the SQL oracle
        # evaluates the IDENTICAL double expression
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        w = np.asarray(
            batch[weight_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            pri = -np.log(u) / w
        pri[~valid | ~np.isfinite(w) | (w <= 0.0)] = np.inf
        return pri

    def block_candidates(batch: pa.Table) -> pa.Table:
        kk = min(k, batch.num_rows)
        pri = _priorities(batch)
        idx = np.sort(np.argsort(pri, kind="stable")[:kk])
        out = batch.take(pa.array(idx))
        return out.append_column("__sample_key",
                                 pa.array(pri[idx], pa.float64()))

    def refold(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        pri = batch["__sample_key"].to_numpy(zero_copy_only=False)
        idx = np.sort(np.argsort(pri, kind="stable")[:k])
        return batch.take(pa.array(idx))

    cand = ds.map_batches(block_candidates, batch_format="pyarrow").map_batches(
        refold, batch_format="pyarrow", batch_size=64 * max(k, 1)
    )
    parts = list(cand.iter_batches(batch_size=65536, batch_format="pyarrow"))
    if not parts:  # empty input: empty typed result, original schema
        sch = ds.schema()
        return pa.table({n: pa.array([], t)
                         for n, t in zip(sch.names, sch.types)})
    merged = pa.concat_tables(parts)
    pri = merged["__sample_key"].to_numpy(zero_copy_only=False)
    keep = np.argsort(pri, kind="stable")
    keep = keep[np.isfinite(pri[keep])][:k]  # +inf rows are non-selectable
    return merged.take(pa.array(keep)).drop_columns(["__sample_key"])


def negative_samples(ds, n_ids: int, k: int = 4,
                     id_col: str = "doc_id"):
    """Deterministic negative sampling for contrastive training: for
    every row, ``k`` pseudo-random partner ids drawn from the DENSE id
    space [0, n_ids) via the engine's seed_key32 integer mix on
    ``id·16 + rank`` — self-pairs step to the next id. Pure
    */%//xor arithmetic on non-negative ints, so a DuckDB
    BIGINT/HUGEINT replay picks the identical partners (the kmeans
    seed-rule recipe); no RNG state, so any shard of the corpus can
    be (re)sampled independently — the property epoch-resumable
    training needs. Returns a Dataset of (id, neg_rank, neg_id);
    output is k rows per input row, streaming."""
    from ..ops.cluster import seed_key32

    if not (1 <= k <= 16):
        raise ValueError("k must be in [1, 16]")
    if n_ids < 2:
        raise ValueError("n_ids must be >= 2")

    def expand(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = np.repeat(ids, k)
        rank = np.tile(np.arange(k, dtype=np.int64), len(ids))
        key = seed_key32(rep * 16 + rank)
        neg = key % n_ids
        neg = (neg + (neg == rep)) % n_ids
        return pa.table({
            id_col: pa.array(rep),
            "neg_rank": pa.array(rank),
            "neg_id": pa.array(neg.astype(np.int64))})

    return ds.select_columns([id_col]).map_batches(
        expand, batch_format="pyarrow")


def stratified_split(ds, stratum_col: str, id_col: str,
                     num_buckets: int = 256, hb_shift: int = 24):
    """Deterministic 80/10/10 train/val/test split with EXACT
    per-stratum proportions — grouped kfold's leakage guarantee plus
    stratified_hash_sample's balance, in two counting passes and ONE
    balanced shuffle (never a per-stratum hot-key group).

    Rows rank within their stratum by (seed_key32(id), id); the split
    rule is pure integer arithmetic on the 0-based rank r and stratum
    size n — train iff 5r < 4n, val iff 10r < 9n, else test — so both
    engines decide identically with no float thresholds. Pass 1 counts
    (stratum, h-bucket) cells (narrow: strata × 2^(32-hb_shift) rows);
    the driver turns them into global rank offsets; pass 2 shuffles on
    hash(stratum, h-bucket) coarse buckets and each fold resolves its
    cells with one vectorized sort — cells are ~n/256ths of a stratum,
    so a fact-sized stratum never lands on one task. Returns a Dataset
    of (stratum, id, split)."""
    import pandas as pd

    from ..engine.hashing import append_coarse_bucket
    from .cluster import seed_key32

    def keyed(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = seed_key32(ids)
        return pa.table({
            stratum_col: b[stratum_col],
            id_col: pa.array(ids),
            "__h": pa.array(h),
            "__hb": pa.array(h >> np.int64(hb_shift))})

    keyed_ds = ds.select_columns([stratum_col, id_col]) \
        .map_batches(keyed, batch_format="pyarrow").materialize()

    def pass1(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "s": pd.Series(b[stratum_col].to_pylist(), dtype="object"),
            "hb": b["__hb"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["s", "hb"], sort=False).size().reset_index(
            name="c")
        return pa.table({
            "s": pa.array(g["s"].to_numpy(object), pa.string()),
            "hb": pa.array(g["hb"].to_numpy(np.int64)),
            "c": pa.array(g["c"].to_numpy(np.int64))})

    cells = keyed_ds.map_batches(pass1, batch_format="pyarrow") \
        .to_pandas().groupby(["s", "hb"], as_index=False)["c"].sum() \
        .sort_values(["s", "hb"])
    cells["off"] = cells.groupby("s")["c"].cumsum() - cells["c"]
    offsets = {(s, int(hb)): int(o)
               for s, hb, o in zip(cells["s"], cells["hb"], cells["off"])}
    ntot = cells.groupby("s")["c"].sum().to_dict()

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (s, hb), g in df.groupby([stratum_col, "__hb"], sort=False):
            g = g.sort_values(["__h", id_col])
            r = offsets[(s, int(hb))] + np.arange(len(g), dtype=np.int64)
            n = ntot[s]
            split = np.where(
                5 * r < 4 * n, "train",
                np.where(10 * r < 9 * n, "val", "test"))
            outs.append(pd.DataFrame({
                stratum_col: s,
                id_col: g[id_col].to_numpy(np.int64),
                "split": split}))
        return pd.concat(outs, ignore_index=True)

    return (keyed_ds.map_batches(
        lambda b: append_coarse_bucket(b, [stratum_col, "__hb"],
                                       num_buckets, "__b"),
        batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda d: assign(d.drop(columns="__b")),
                    batch_format="pandas"))


def stratified_split_checkpointed(
    shard_paths: list[str], out_root: str, stratum_col: str,
    id_col: str, hb_shift: int = 24,
    _fail_after: int | None = None) -> dict:
    """Resumable corpus-scale train/val/test split (run.py --pipeline
    split). Two per-chunk-resumable stages:

    stage A — each input chunk publishes its (stratum, h-bucket) cell
    counts as one atomic manifest file (skip on resume);
    stage B — each chunk assigns and writes its own hive
    ``chunk-<j>/split=.../`` directory using ONLY the stage-A manifests
    (skip on resume).

    The rank rule is (h-bucket, chunk, h, id) lexicographic — a
    deterministic permutation per stratum, so the 80/10/10 integer
    thresholds (5r < 4n / 10r < 9n) hold EXACTLY per stratum, and a
    killed run resumed with the same inputs reproduces byte-identical
    output. (The in-memory :func:`stratified_split` ranks by (h, id)
    globally — a differently-seeded but equally-exact split; chunk
    locality is what buys resumability here.) ``_fail_after=j`` is the
    test kill hook. Returns chunk accounting."""
    import glob
    import os

    import pandas as pd

    import ray.data as rd

    from ..engine.sinks import SUCCESS_MARKER, write_dataset, write_table
    from .cluster import seed_key32

    os.makedirs(out_root, exist_ok=True)
    paths = sorted(shard_paths)

    def keyed_frame(src: str) -> pd.DataFrame:
        t = rd.read_parquet(src, columns=[stratum_col, id_col]) \
            .to_pandas()
        ids = t[id_col].to_numpy(np.int64)
        h = seed_key32(ids)
        return pd.DataFrame({
            "s": t[stratum_col].astype(str), "id": ids, "h": h,
            "hb": h >> np.int64(hb_shift)})

    # stage A: per-chunk cell-count manifests
    counted = skipped_a = 0
    for j, src in enumerate(paths):
        man = os.path.join(out_root, f"counts-{j:05d}.parquet")
        if os.path.exists(man):
            skipped_a += 1
            continue
        df = keyed_frame(src)
        g = df.groupby(["s", "hb"], sort=True).size().reset_index(
            name="c")
        g["chunk"] = np.int64(j)
        write_table(pa.Table.from_pandas(g, preserve_index=False), man)
        counted += 1

    import pyarrow.parquet as pq

    cells = pd.concat(
        [pq.read_table(m).to_pandas() for m in
         sorted(glob.glob(os.path.join(out_root, "counts-*.parquet")))],
        ignore_index=True)
    # global offsets: cells ordered (s, hb, chunk)
    cells = cells.sort_values(["s", "hb", "chunk"]).reset_index(drop=True)
    cells["off"] = cells.groupby("s")["c"].cumsum() - cells["c"]
    offsets = {(s, int(hb), int(ch)): int(o) for s, hb, ch, o in
               zip(cells["s"], cells["hb"], cells["chunk"],
                   cells["off"])}
    ntot = cells.groupby("s")["c"].sum().to_dict()

    # stage B: per-chunk assignment + atomic hive write
    written = skipped_b = 0
    for j, src in enumerate(paths):
        chunk_dir = os.path.join(out_root, f"chunk-{j:05d}")
        if os.path.exists(os.path.join(chunk_dir, SUCCESS_MARKER)):
            skipped_b += 1
            continue
        df = keyed_frame(src).sort_values(["s", "hb", "h", "id"])
        local = df.groupby(["s", "hb"]).cumcount().to_numpy(np.int64)
        off = np.fromiter(
            (offsets[(s, int(hb), j)] for s, hb in
             zip(df["s"], df["hb"])), np.int64, count=len(df))
        r = off + local
        n = np.fromiter((ntot[s] for s in df["s"]), np.int64,
                        count=len(df))
        split = np.where(5 * r < 4 * n, "train",
                         np.where(10 * r < 9 * n, "val", "test"))
        out = pa.table({
            stratum_col: pa.array(df["s"].to_numpy(object),
                                  pa.string()),
            id_col: pa.array(df["id"].to_numpy(np.int64)),
            "split": pa.array(split, pa.string())})
        write_dataset(rd.from_arrow(out), chunk_dir,
                      partition_cols=["split"])
        written += 1
        if _fail_after is not None and j >= _fail_after:
            raise RuntimeError(f"injected failure after chunk {j}")
    return {"chunks_total": len(paths), "counts_written": counted,
            "counts_skipped_resume": skipped_a,
            "chunks_written": written,
            "chunks_skipped_resume": skipped_b}


def read_split(out_root: str, split: str):
    """Dataset over ONE split across every published chunk of a
    :func:`stratified_split_checkpointed` layout (unpublished chunks
    are invisible)."""
    import glob
    import os

    import ray.data as rd

    from ..engine.sinks import SUCCESS_MARKER

    dirs = []
    for chunk in sorted(glob.glob(os.path.join(out_root, "chunk-*"))):
        if not os.path.isdir(chunk) or not os.path.exists(
                os.path.join(chunk, SUCCESS_MARKER)):
            continue
        sub = os.path.join(chunk, f"split={split}")
        if os.path.isdir(sub):
            dirs.append(sub)
    if not dirs:
        raise FileNotFoundError(f"{out_root}: no published {split!r}")
    return rd.read_parquet(dirs, file_extensions=["parquet"])
