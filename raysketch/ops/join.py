"""Broadcast joins/lookups — the shuffle-free join patterns.

The reference has no relational joins (SURVEY.md §2.8); these are the
engine's lookup primitives for pipelines that need them at corpus scale:

- :func:`broadcast_semi_join` — EXACT semi/anti join when the small side's
  keys fit in memory: ``ray.put`` the key set once, every map task reads
  the shared-memory copy and filters its batch with one vectorized
  ``pc.is_in``. No shuffle; big side streams.
- :func:`bloom_semi_join` — the 10^9-key variant: broadcast a Bloom filter
  of the small side instead (bits, not keys). One-sided error: keeps all
  matching rows plus ~fpr false positives — a pre-filter that cuts the
  big side before an exact join, never a final answer by itself.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def broadcast_semi_join(
    big_ds,
    small_ds,
    big_key: str,
    small_key: str | None = None,
    anti: bool = False,
):
    """Keep big-side rows whose ``big_key`` is (not, if ``anti``) in the
    small side's key set. Small side materializes to one key array
    (driver-bounded by construction), broadcast via the object store."""
    import ray

    small_key = small_key or big_key
    keys: list = []
    for b in small_ds.select_columns([small_key]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        keys.append(b[small_key].combine_chunks())
    if keys:
        key_arr = pa.concat_arrays(keys)
    else:  # empty small side: typed empty set (semi -> nothing, anti -> all)
        sch = small_ds.schema()
        key_type = dict(zip(sch.names, sch.types))[small_key]
        key_arr = pa.array([], type=key_type)
    key_ref = ray.put(pc.unique(key_arr))

    # stateless task fn (NOT an actor pool): keeps Ray Data operator fusion
    # with the upstream read, and the per-call ray.get is a zero-copy
    # shared-memory read of the broadcast key set
    def keep(batch: pa.Table) -> pa.Table:
        keys = ray.get(key_ref)
        mask = pc.is_in(batch[big_key], value_set=keys)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return big_ds.map_batches(keep, batch_format="pyarrow")


def broadcast_lookup_join(
    big_ds,
    small_ds,
    big_key: str,
    small_key: str,
    value_cols: list[str],
    how: str = "inner",
):
    """Attach small-side columns to the big side by key — the broadcast
    form of an equi-join: the small side's (key, values) arrays ship once
    via ``ray.put``; every map task resolves its batch with one vectorized
    ``pc.index_in`` + ``take`` (no shuffle; the big side streams and
    fuses with its upstream read). ``how="inner"`` drops unmatched big
    rows, ``"left"`` keeps them with nulls. For small sides beyond
    memory, use the native partitioned hash join instead
    (``Dataset.join`` — see ops/dedup.attach_pair_payloads)."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    keys: list = []
    vals: dict[str, list] = {c: [] for c in value_cols}
    for b in small_ds.select_columns([small_key] + value_cols).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        keys.append(b[small_key].combine_chunks())
        for c in value_cols:
            vals[c].append(b[c].combine_chunks())
    if keys:
        key_arr = pa.concat_arrays(keys)
        # LOOKUP semantics require unique small-side keys: index_in takes
        # the first match, which would silently drop duplicate-key rows a
        # real equi-join would emit — refuse instead of guessing
        if len(pc.unique(key_arr)) != len(key_arr):
            raise ValueError(
                "broadcast_lookup_join: small-side keys must be unique "
                "(duplicate keys need a real equi-join, e.g. Dataset.join)"
            )
        val_arrs = {c: pa.concat_arrays(v) for c, v in vals.items()}
    else:
        # empty small side; schema may be unknowable (e.g. a fully
        # filtered row-based dataset) — type the key per batch instead
        sch = small_ds.schema(fetch_if_missing=True)
        if sch is not None and sch.names:
            types = dict(zip(sch.names, sch.types))
            key_arr = pa.array([], type=types[small_key])
            val_arrs = {c: pa.array([], type=types[c]) for c in value_cols}
        else:
            key_arr = None
            val_arrs = {c: pa.array([], type=pa.null()) for c in value_cols}
    ref = ray.put((key_arr, val_arrs))

    def attach(batch: pa.Table) -> pa.Table:
        k, v = ray.get(ref)  # zero-copy shared-memory read
        if k is None:
            k = pa.array([], type=batch.schema.field(big_key).type)
        idx = pc.index_in(batch[big_key], value_set=k)
        if how == "inner":
            mask = pc.is_valid(idx)
            batch = batch.filter(mask)
            idx = idx.filter(mask)
        for c in value_cols:
            batch = batch.append_column(c, pc.take(v[c], idx))
        return batch

    return big_ds.map_batches(attach, batch_format="pyarrow")


def attach_by_key(
    fact_ds,
    dim_ds,
    fact_key: str,
    dim_key: str,
    value_cols: list[str],
    broadcast_limit_rows: int = 2_000_000,
    num_partitions: int = 8,
    how: str = "inner",
):
    """SIZE-ROUTED dimension attach: the dim's (key, values) projection
    is materialized once (narrow) and counted; at or under
    ``broadcast_limit_rows`` the shuffle-free broadcast lookup wins,
    above it Ray's native partitioned hash join carries the attach with
    neither side on the driver. The partitioned route only engages at
    volumes where every key partition is non-empty (the tiny-input
    empty-partition pitfall can't fire above the limit).
    ``how="left"`` keeps unmatched fact rows with nulls (broadcast
    ``how="left"`` / partitioned ``left_outer``)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    dim = dim_ds.select_columns([dim_key] + value_cols).materialize()
    if dim.count() <= broadcast_limit_rows:
        return broadcast_lookup_join(fact_ds, dim, fact_key, dim_key,
                                     value_cols, how=how)
    # Ray's join already omits the right-side key from the output, so
    # both routes emit the same columns: fact columns + value_cols
    return fact_ds.join(dim, "inner" if how == "inner" else "left_outer",
                        num_partitions,
                        on=(fact_key,), right_on=(dim_key,))


def partitioned_semi_join(
    big_ds,
    keys_ds,
    big_key: str,
    small_key: str | None = None,
    anti: bool = False,
    num_buckets: int = 256,
):
    """Shuffle-based semi/anti join for key sets too large to broadcast:
    big-side ROWS (payload intact) and small-side DISTINCT keys co-locate
    under one coarse ``hash(key) % num_buckets`` shuffle; each bucket
    fold keeps (or drops, ``anti``) the rows whose key appears in its
    key partition with one vectorized ``isin``. The scale escape for
    :func:`broadcast_semi_join` — no driver gather, no re-ship."""
    import pandas as pd

    from ..engine.hashing import append_coarse_bucket

    small_key = small_key or big_key
    big_sch = big_ds.schema()
    payload = list(zip(big_sch.names, big_sch.types))

    def _default_array(t: pa.DataType, n: int) -> pa.Array:
        # typed NON-NULL filler for the key side's payload columns (they
        # are dropped in the fold): nulls would float-widen int64 payload
        # through the pandas fold and round ids above 2^53
        if pa.types.is_integer(t):
            return pa.array(np.zeros(n, dtype=np.int64), t)
        if pa.types.is_floating(t):
            return pa.array(np.zeros(n, dtype=np.float64), t)
        if pa.types.is_timestamp(t):
            return pa.array(np.zeros(n, dtype=np.int64), pa.int64()).cast(t)
        return pa.array([""] * n, pa.string()).cast(t)

    def tag_big(b: pa.Table) -> pa.Table:
        b = b.select([n for n, _ in payload])  # pin column order
        b = b.append_column("__side", pa.array(
            np.zeros(b.num_rows, dtype=np.int64), pa.int64()))
        return append_coarse_bucket(b, [big_key], num_buckets, "__jb")

    def tag_keys(b: pa.Table) -> pa.Table:
        k = pc.unique(b[small_key])
        cols = {
            n: (k if n == big_key else _default_array(t, len(k)))
            for n, t in payload
        }
        t = pa.table(cols)
        t = t.append_column("__side", pa.array(
            np.ones(len(k), dtype=np.int64), pa.int64()))
        return append_coarse_bucket(t, [big_key], num_buckets, "__jb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        keys = set(df.loc[df["__side"] == 1, big_key])
        rows = df[df["__side"] == 0]
        m = rows[big_key].isin(keys)
        out = rows[~m] if anti else rows[m]
        return out.drop(columns=["__side"])

    tagged = big_ds.map_batches(tag_big, batch_format="pyarrow").union(
        keys_ds.select_columns([small_key]).map_batches(
            tag_keys, batch_format="pyarrow")
    )
    return tagged.groupby("__jb").map_groups(
        lambda df: fold(df.drop(columns=["__jb"])), batch_format="pandas"
    )


def bloom_semi_join(
    big_ds,
    small_ds,
    big_key: str,
    small_key: str | None = None,
    capacity: int = 1_000_000,
    fpr: float = 0.001,
):
    """Bloom pre-filter: big-side rows whose key *may* be in the small side
    (no false negatives; ~fpr false positives survive). Broadcasts the
    filter bits once; use before an exact join to cut shuffle volume."""
    import ray

    from ..sketches import BloomFilter

    small_key = small_key or big_key
    bloom = BloomFilter(capacity, fpr)
    for b in small_ds.select_columns([small_key]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        bloom.update_batch(b[small_key])
    blob_ref = ray.put(bloom.to_bytes())

    # stateless task fn: preserves operator fusion; from_bytes on the
    # shared-memory blob is one cheap frombuffer per call
    def keep(batch: pa.Table) -> pa.Table:
        bl = BloomFilter.from_bytes(ray.get(blob_ref))
        hits = bl.contains_batch(batch[big_key])
        return batch.filter(pa.array(hits))

    return big_ds.map_batches(keep, batch_format="pyarrow")


def plan_equi_join(ds_a, key_a: str, ds_b, key_b: str,
                   epsilon: float = 1e-4, delta: float = 1e-3,
                   broadcast_row_limit: int = 5_000_000):
    """Join planning from sketches alone — estimate the equi-join output
    cardinality WITHOUT running the join (plain-update CMS inner
    product, Cormode–Muthukrishnan §4.2: true ≤ est ≤ true +
    ε·|A|·|B| w.h.p.) and pick the strategy this module's size-routing
    uses everywhere:

    - ``broadcast_b`` / ``broadcast_a``: the smaller side fits the
      broadcast limit → `broadcast_lookup_join` (no shuffle).
    - ``partitioned``: both sides large → Ray's native partitioned hash
      join.

    Each side costs one streaming sketch pass (the two run from driver
    threads; dataset construction stays with the caller, so no
    concurrent read_parquet first-imports). Returns
    ``{est_rows, n_a, n_b, strategy}``."""
    from concurrent.futures import ThreadPoolExecutor

    from ..engine.aggregate import sketch_aggregate
    from ..engine.udaf import SketchSpec
    from ..sketches.cms import CMSketch
    import functools

    factory = functools.partial(CMSketch, epsilon, delta, conservative=False)

    def build(ds, col):
        merged = sketch_aggregate(
            ds, [SketchSpec("s", col, factory)], merge="driver")
        return merged[""]["s"]

    with ThreadPoolExecutor(2) as ex:
        fa = ex.submit(build, ds_a, key_a)
        fb = ex.submit(build, ds_b, key_b)
        ca, cb = fa.result(), fb.result()
    n_a, n_b = int(ca.item_count), int(cb.item_count)
    if n_b <= broadcast_row_limit and n_b <= n_a:
        strategy = "broadcast_b"
    elif n_a <= broadcast_row_limit:
        strategy = "broadcast_a"
    else:
        strategy = "partitioned"
    return {"est_rows": ca.inner_product(cb), "n_a": n_a, "n_b": n_b,
            "strategy": strategy}


# per-WORKER-PROCESS dim-bucket cache for bucketed_copartition_join's
# task-based join stage: Ray reuses worker processes, so each process
# reads a given dim bucket once; bounded FIFO so long sessions touching
# many layouts/buckets can't grow without limit
_DIM_BUCKET_CACHE: dict = {}
_DIM_BUCKET_CACHE_MAX = 8


def _dim_bucket_index(dpath: str, dim_key: str, value_cols: list[str]):
    key = (dpath, dim_key, tuple(value_cols))
    hit = _DIM_BUCKET_CACHE.get(key)
    if hit is None:
        import pyarrow.parquet as pq

        t = pq.read_table(dpath, columns=[dim_key] + list(value_cols))
        k = t[dim_key].combine_chunks()
        if len(pc.unique(k)) != len(k):
            raise ValueError(
                "bucketed_copartition_join: dim keys must be unique "
                "(duplicate keys need a real equi-join, e.g. Dataset.join)")
        hit = (k, {c: t[c].combine_chunks() for c in value_cols})
        while len(_DIM_BUCKET_CACHE) >= _DIM_BUCKET_CACHE_MAX:
            _DIM_BUCKET_CACHE.pop(next(iter(_DIM_BUCKET_CACHE)))
        _DIM_BUCKET_CACHE[key] = hit
    return hit


def bucketed_copartition_join(
    fact_ds,
    dim_ds,
    fact_key: str,
    dim_key: str,
    value_cols: list[str],
    n_buckets: int = 16,
    layout_root: str | None = None,
):
    """Storage-layout join: write BOTH sides hive-partitioned by
    ``hash64(key) % n_buckets`` (``engine.sinks.write_dataset``, atomic
    _SUCCESS publish), then join bucket-by-bucket with NO runtime
    shuffle — each bucket's dim slice broadcasts only into that bucket's
    fact partition (the co-partitioned map-join every warehouse relies
    on when one layout is reused across many joins).

    The scale contract: a bucketed layout is written ONCE and amortized
    over every subsequent join/aggregation on the same key — at corpus
    scale ``n_buckets`` is sized so one dim bucket fits a worker's heap
    (dim_rows / n_buckets ≤ broadcast budget), and failed runs resume
    per-partition (``read_partition`` prunes to one hive directory).

    Returns ``(joined_dataset, layout_root)``; the layout stays on disk
    for reuse/inspection, caller cleans up.
    """
    import os
    import uuid

    from ..engine.hashing import hash64_batch_aligned
    from ..engine.sinks import read_back, write_dataset

    if layout_root is None:
        layout_root = os.path.join(
            "/tmp/raysketch_layouts",
            f"copart_{os.getpid()}_{uuid.uuid4().hex[:8]}")

    def with_bucket(key: str):
        def add(b):
            import numpy as np
            import pyarrow as pa

            h, valid = hash64_batch_aligned(b[key])
            if not valid.all():
                raise ValueError(f"null join key in {key}")
            bk = (h % np.uint64(n_buckets)).astype(np.int64)
            return b.append_column("bucket", pa.array(bk, pa.int64()))

        return add

    write_dataset(
        fact_ds.map_batches(with_bucket(fact_key), batch_format="pyarrow"),
        os.path.join(layout_root, "fact"), partition_cols=["bucket"])
    write_dataset(
        dim_ds.map_batches(with_bucket(dim_key), batch_format="pyarrow"),
        os.path.join(layout_root, "dim"), partition_cols=["bucket"])

    dim_root = os.path.join(layout_root, "dim")

    # ONE stateless-TASK stage over the whole fact layout (NOT an actor
    # pool: a user-level error raised inside a Ray Data actor — e.g. the
    # dup-key refusal below — triggers the executor's infinite actor
    # restart/retry loop in Ray 2.49 and the pipeline hangs instead of
    # failing; task errors fail fast, and tasks also keep operator
    # fusion with the upstream read). Each batch comes from one hive
    # partition file, so its ``bucket`` column is (near-)constant; the
    # task loads dim buckets inside the worker — never through the
    # driver — via a process-level cache (worker processes are reused,
    # so each dim bucket is read ~once per worker; entries are at most
    # ``dim_rows / n_buckets`` rows, the layout's memory contract).
    def layout_join(batch: pa.Table) -> pa.Table:
        bks = batch["bucket"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        batch = batch.drop_columns(["bucket"])
        pieces = []
        for b in np.unique(bks):
            part = batch.filter(pa.array(bks == b))
            dpath = os.path.join(dim_root, f"bucket={int(b)}")
            if not os.path.isdir(dpath):
                continue  # no dim rows -> inner join emits nothing
            keys, vals = _dim_bucket_index(dpath, dim_key, value_cols)
            idx = pc.index_in(part[fact_key], value_set=keys)
            mask = pc.is_valid(idx)
            part = part.filter(mask)
            idx = idx.filter(mask)
            for c in value_cols:
                part = part.append_column(c, pc.take(vals[c], idx))
            pieces.append(part)
        if not pieces:
            # schema-stable empty output: dim value types from the layout
            import glob

            import pyarrow.parquet as pq

            sample = sorted(glob.glob(
                os.path.join(dim_root, "bucket=*", "*.parquet")))
            sch = pq.read_schema(sample[0])
            out = batch.slice(0, 0)
            for c in value_cols:
                out = out.append_column(
                    c, pa.array([], sch.field(c).type))
            return out
        return pa.concat_tables(pieces)

    fact = read_back(os.path.join(layout_root, "fact"))
    # the hive reader returns the partition column (string-typed in Ray
    # 2.49); normalize to int64 before the join stage
    def norm_bucket(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("bucket")
        return b.set_column(i, "bucket", pc.cast(b["bucket"], pa.int64()))

    joined = fact.map_batches(norm_bucket, batch_format="pyarrow") \
        .map_batches(layout_join, batch_format="pyarrow")
    return joined, layout_root


# worker-process cache of SORTED range-shard indexes (same lifecycle
# contract as _DIM_BUCKET_CACHE: tasks on reused worker processes read
# each dim shard ~once; entries are one shard of the dim side)
_RANGE_SHARD_CACHE: dict = {}
_RANGE_SHARD_CACHE_MAX = 64


def _range_shard_index(dpath: str, dim_key: str, value_cols: list[str]):
    key = (dpath, dim_key, tuple(value_cols))
    hit = _RANGE_SHARD_CACHE.get(key)
    if hit is None:
        import pyarrow.parquet as pq

        t = pq.read_table(dpath, columns=[dim_key] + list(value_cols))
        k = t[dim_key].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(np.unique(k)) != len(k):
            raise ValueError(
                "range_copartition_join: dim keys must be unique "
                "(duplicate keys need a real equi-join, e.g. Dataset.join)")
        order = np.argsort(k, kind="stable")
        vals = {c: t[c].combine_chunks().take(pa.array(order))
                for c in value_cols}
        hit = (k[order], vals)
        while len(_RANGE_SHARD_CACHE) >= _RANGE_SHARD_CACHE_MAX:
            _RANGE_SHARD_CACHE.pop(next(iter(_RANGE_SHARD_CACHE)))
        _RANGE_SHARD_CACHE[key] = hit
    return hit


def range_copartition_join(
    fact_ds,
    dim_ds,
    fact_key: str,
    dim_key: str,
    value_cols: list[str],
    n_shards: int = 8,
    layout_root: str | None = None,
):
    """RANGE-layout co-partition join — the sorted counterpart of
    :func:`bucketed_copartition_join`: shard bounds are the dim side's
    key quantiles (``ops/curate.write_range_shards``), the fact side is
    written with the SAME bounds
    (``ops/curate.write_range_shards_aligned``), so shard i of the fact
    joins ONLY shard i of the dim — no runtime shuffle, and unlike the
    hash layout the shards are contiguous key ranges (key-range pruning
    and ordered scans come free with the same bytes).

    Per-shard matching is a true merge join: the worker-cached dim
    shard is sorted once and every fact batch binary-searches it
    (``searchsorted``) — int64-exact, no hash table. Dup dim keys
    refuse from a stateless TASK stage (fail fast — the Ray 2.49
    actor-restart hang documented on the hash variant). Returns
    ``(joined_dataset, layout_root, bounds)``; the layout persists for
    reuse — the bounds are the contract a THIRD table would be written
    with to join shuffle-free against either side."""
    import os
    import uuid

    from ..engine.sinks import read_back
    from .curate import write_range_shards, write_range_shards_aligned

    if layout_root is None:
        layout_root = os.path.join(
            "/tmp/raysketch_layouts",
            f"range_{os.getpid()}_{uuid.uuid4().hex[:8]}")

    dim_root = os.path.join(layout_root, "dim")
    _, bounds = write_range_shards(
        dim_ds.select_columns([dim_key] + list(value_cols)),
        dim_root, dim_key, n_shards=n_shards)
    write_range_shards_aligned(
        fact_ds, os.path.join(layout_root, "fact"), fact_key, bounds)

    def layout_join(batch: pa.Table) -> pa.Table:
        shards = batch["shard"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        batch = batch.drop_columns(["shard"])
        pieces = []
        for s in np.unique(shards):
            part = batch.filter(pa.array(shards == s))
            dpath = os.path.join(dim_root, f"shard={int(s)}")
            if not os.path.isdir(dpath):
                continue  # no dim rows in range -> inner join drops
            keys, vals = _range_shard_index(dpath, dim_key, value_cols)
            fk = part[fact_key].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            pos = np.searchsorted(keys, fk)
            pos_c = np.minimum(pos, len(keys) - 1)
            hit = keys[pos_c] == fk
            part = part.filter(pa.array(hit))
            take = pa.array(pos_c[hit].astype(np.int64))
            for c in value_cols:
                part = part.append_column(c, vals[c].take(take))
            pieces.append(part)
        if not pieces:
            import glob

            import pyarrow.parquet as pq

            sample = sorted(glob.glob(
                os.path.join(dim_root, "shard=*", "*.parquet")))
            sch = pq.read_schema(sample[0])
            out = batch.slice(0, 0)
            for c in value_cols:
                out = out.append_column(c, pa.array([], sch.field(c).type))
            return out
        return pa.concat_tables(pieces)

    fact = read_back(os.path.join(layout_root, "fact"))

    def norm_shard(b: pa.Table) -> pa.Table:
        # hive reader returns the partition column string-typed (Ray 2.49)
        i = b.schema.get_field_index("shard")
        return b.set_column(i, "shard", pc.cast(b["shard"], pa.int64()))

    joined = fact.map_batches(norm_shard, batch_format="pyarrow") \
        .map_batches(layout_join, batch_format="pyarrow")
    return joined, layout_root, bounds


def salted_attach_by_key(
    fact_ds,
    dim_ds,
    fact_key: str,
    dim_key: str,
    value_cols: list[str],
    salt: int = 8,
    num_partitions: int = 8,
    how: str = "inner",
):
    """HOT-KEY-SAFE partitioned dimension attach: when one join key
    carries a disproportionate share of fact rows, a plain hash join
    sends that key's entire volume to ONE partition — the straggler
    that stalls a 256-node cluster. Salting splits it: the dim side is
    REPLICATED ``salt`` times (dim rows × salt is cheap — the dim is
    the small side by contract), the fact side gets a deterministic
    per-row salt from ``seed_key32`` of its block-local row index mixed
    with the key (stateless — no RNG, reruns identical), and the join
    runs on (key, salt) so a hot key spreads over ``salt`` partitions.

    Emits exactly :func:`attach_by_key`'s columns and rows — route
    identity is test-pinned. Use when ``key_skew_profile`` flags a hot
    key; the unsalted route is cheaper on balanced keys (no dim
    replication)."""
    from .cluster import seed_key32

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if salt < 2:
        raise ValueError("salt must be >= 2")
    dim = dim_ds.select_columns([dim_key] + value_cols).materialize()

    def replicate(b: pa.Table) -> pa.Table:
        n = b.num_rows
        idx = np.repeat(np.arange(n, dtype=np.int64), salt)
        t = b.take(pa.array(idx))
        return t.append_column("__salt", pa.array(
            np.tile(np.arange(salt, dtype=np.int64), n)))

    dim_salted = dim.map_batches(replicate, batch_format="pyarrow")

    def add_salt(b: pa.Table) -> pa.Table:
        k = b[fact_key].to_numpy(zero_copy_only=False).astype(np.int64)
        # stateless per-row spread: block-local position mixed with the
        # key through seed_key32 — deterministic under re-execution of
        # the same block, uniform across salts
        pos = np.arange(b.num_rows, dtype=np.int64)
        return b.append_column("__salt", pa.array(
            seed_key32(k * 131 + pos * 31 + 7) % np.int64(salt)))

    fact_salted = fact_ds.map_batches(add_salt, batch_format="pyarrow")
    joined = fact_salted.join(
        dim_salted, "inner" if how == "inner" else "left_outer",
        num_partitions, on=(fact_key, "__salt"),
        right_on=(dim_key, "__salt"))
    return joined.drop_columns(["__salt"])
