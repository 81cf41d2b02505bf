"""Distributed sketch aggregation over ray.data Datasets.

``sketch_aggregate(ds, specs, group_key=...)`` is the engine's core
operation: per-block vectorized partials (map+combine fused) → tiny
serialized-partial shuffle → associative merge → decoded sketches.

Merge topologies:

- ``merge="driver"`` — pull the KB-sized partials to the driver and tree
  merge there. Right when ``groups × specs`` is small (a per-lang rollup);
  the partial table is ~``num_blocks × groups × specs`` rows regardless of
  input size, so this stays O(MB) even on a 10^12-row corpus *if* the
  group cardinality is bounded.
- ``merge="dataset"`` — ``groupby(group, spec).map_groups(fold)`` on the
  partials Dataset; scales to unbounded group cardinality (e.g. per-repo).
  With very hot groups (many blocks contributing to one key) an optional
  salted pre-merge level folds each group's partials in chunks of
  ``fan_in`` under key ``(group, spec, salt)`` first — the two-level
  salted-shuffle plan from SURVEY.md §4.2.
- ``merge="auto"`` — driver when the partial count is small.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import pyarrow as pa

from ..sketches import SKETCH_KINDS
from .udaf import PARTIAL_SCHEMA, SketchSpec, merge_payloads, partials_for_block

_DRIVER_MERGE_MAX_PARTIALS = 2_048  # dense partials can be MBs: keep the driver's share small


def build_partials(
    ds: "ray.data.Dataset",  # noqa: F821
    specs: list[SketchSpec],
    group_key: str | None = None,
    batch_size: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
):
    """Map side: one partial per (block, group, spec).

    ``batch_size=None`` processes each materialized block whole (zero-copy
    Arrow) — partial count tracks block count, not row count. Columns are
    pruned before the pass so wide columns (``content``) never ride along.
    """
    needed = sorted({s.column for s in specs} | ({group_key} if group_key else set()))
    ds = ds.select_columns(needed)
    if concurrency is not None:
        # opt-in actor pool (PartialBuilder): specs construct once per
        # actor. NOT the default — a class UDF breaks Ray Data's operator
        # fusion, so read→derive→build would materialize the content-heavy
        # intermediate blocks through the object store (measured 3x slower
        # than the fused stateless-task form on the bench corpus).
        from .udaf import PartialBuilder

        return ds.map_batches(
            PartialBuilder,
            fn_constructor_kwargs={"specs": specs, "group_key": group_key},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return ds.map_batches(
        lambda b: partials_for_block(b, specs, group_key),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def merge_partials_driver(partials_ds) -> dict[tuple[str, str], bytes]:
    """Reduce side on the driver: collect payload lists per (group, spec),
    then one bulk ``merge_many`` per key (sparse-aware, single
    recompression). Payload volume is KBs per partial by construction."""
    from .udaf import merge_payloads_obj

    from .udaf import check_family

    buckets: dict[tuple[str, str], list[bytes]] = {}
    kinds: dict[tuple[str, str], str] = {}
    families: set[str] = set()
    for batch in partials_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for row in batch.to_pylist():
            key = (row["group"], row["spec"])
            buckets.setdefault(key, []).append(row["payload"])
            kinds[key] = row["kind"]
            families.add(row["family"])
    if families:
        check_family(families)
    return {
        k: merge_payloads_obj(kinds[k], payloads).to_bytes()
        for k, payloads in buckets.items()
    }


def _fold_group(df: pd.DataFrame) -> pd.DataFrame:
    from .udaf import check_family

    payload = merge_payloads(df["kind"].iloc[0], list(df["payload"]))
    return pd.DataFrame(
        {
            "group": [df["group"].iloc[0]],
            "spec": [df["spec"].iloc[0]],
            "kind": [df["kind"].iloc[0]],
            "payload": [payload],
            "rows": [int(df["rows"].sum())],
            "family": [check_family(df["family"])],
        }
    )


def _fold_partial_batch(batch: pa.Table) -> pa.Table:
    """Merge all partials sharing (group, spec) within one coalesced batch.

    Used by the tree merge: no shuffle — Ray Data's batch coalescing feeds
    consecutive partial blocks to each fold task, so every level is a
    node-local reduction that shrinks partial volume by the fan-in factor.
    """
    from .udaf import check_family, merge_payloads

    rows = batch.to_pylist()
    buckets: dict[tuple[str, str], list[dict]] = {}
    for r in rows:
        buckets.setdefault((r["group"], r["spec"]), []).append(r)
    out = {"group": [], "spec": [], "kind": [], "payload": [], "rows": [],
           "family": []}
    for (g, s), rs in buckets.items():
        out["group"].append(g)
        out["spec"].append(s)
        out["kind"].append(rs[0]["kind"])
        out["payload"].append(merge_payloads(rs[0]["kind"], [r["payload"] for r in rs]))
        out["rows"].append(sum(r["rows"] for r in rs))
        out["family"].append(check_family(r["family"] for r in rs))
    return pa.Table.from_arrays(
        [
            pa.array(out["group"], pa.string()),
            pa.array(out["spec"], pa.string()),
            pa.array(out["kind"], pa.string()),
            pa.array(out["payload"], pa.large_binary()),
            pa.array(out["rows"], pa.int64()),
            pa.array(out["family"], pa.string()),
        ],
        schema=PARTIAL_SCHEMA,
    )


def merge_partials_tree(
    partials_ds,
    fan_in_rows: int = 512,
    max_driver_partials: int = 2048,
    max_levels: int = 8,
    keys_bound: int = 4096,
):
    """Parallel log-depth reduction of a (materialized) partials Dataset.

    Each level coalesces ~fan_in_rows partial rows per task and folds them
    per (group, spec); enough levels are CHAINED LAZILY (no materialize
    barrier between levels — the whole tree streams in one execution) so
    the driver's final fold sees at most ~``max_driver_partials`` rows.
    Level count comes from the worst-case reduction factor: a fold batch
    of ``fan_in_rows`` rows emits at most min(fan_in_rows, #distinct
    (group, spec) keys ≤ ``keys_bound``) rows. Scales to any block count:
    no level is an all-to-all exchange, and the driver never decodes more
    than the final level (dense sketch partials can be 0.5-2 MB each, so
    per-block partials over 10^5+ blocks are far too big for one process).
    """
    import math

    ds = partials_ds
    n = ds.count()  # cheap: partials_ds is materialized by sketch_aggregate
    if n > max_driver_partials:
        # exact distinct (group, spec) count: one narrow scan of the
        # materialized partials (strings only, payloads never move)
        keys = set()
        for b in ds.select_columns(["group", "spec"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            keys.update(zip(b["group"].to_pylist(), b["spec"].to_pylist()))
        keys_bound = max(1, len(keys))
    for _ in range(max_levels):
        if n <= max_driver_partials:
            break
        ds = ds.map_batches(
            _fold_partial_batch, batch_format="pyarrow", batch_size=fan_in_rows
        )
        n = math.ceil(n / fan_in_rows) * min(fan_in_rows, keys_bound)
    return merge_partials_driver(ds)


def merge_partials_ds(partials_ds, salt_fan_in: int | None = None,
                      coarse_buckets: int = 256):
    """Reduce side as a Dataset groupby over COARSE buckets.

    The shuffle key is ``hash(group, spec) % coarse_buckets`` (plus a
    round-robin salt level when ``salt_fan_in`` is set): group count per
    shuffle stays bounded regardless of group cardinality, and each reduce
    task folds the real (group, spec) keys inside its bucket with one
    vectorized pandas groupby + ``merge_many`` — one map_groups call per
    TINY group would dominate wall time at 10^6+ groups.
    """
    import numpy as np

    def _bucket(batch: pa.Table, with_salt: bool) -> pa.Table:
        from .hashing import combine_hash64, hash64_batch_aligned

        hg, _ = hash64_batch_aligned(batch["group"])
        hs, _ = hash64_batch_aligned(batch["spec"])
        key = combine_hash64(hg, hs)
        bucket = (key % np.uint64(coarse_buckets)).astype(np.int64)
        batch = batch.append_column("bucket", pa.array(bucket, pa.int64()))
        if with_salt:
            salt = np.arange(batch.num_rows, dtype=np.int64) % int(salt_fan_in)
            batch = batch.append_column("salt", pa.array(salt, pa.int64()))
        return batch

    def _fold_bucket(df) -> "pd.DataFrame":  # noqa: F821
        import pandas as pd

        from .udaf import check_family, merge_payloads

        drop = [c for c in ("bucket", "salt") if c in df.columns]
        rows = []
        for (g, s), sub in df.groupby(["group", "spec"], sort=False):
            rows.append({
                "group": g, "spec": s, "kind": sub["kind"].iloc[0],
                "payload": merge_payloads(sub["kind"].iloc[0], list(sub["payload"])),
                "rows": int(sub["rows"].sum()),
                "family": check_family(sub["family"]),
            })
        return pd.DataFrame(rows).drop(columns=drop, errors="ignore")

    # compact the KB-sized partial blocks before shuffling: per-block task
    # overhead on hundreds of tiny blocks otherwise dwarfs the fold work
    if partials_ds.num_blocks() > 32:
        partials_ds = partials_ds.repartition(16)

    if salt_fan_in:
        salted = partials_ds.map_batches(
            lambda b: _bucket(b, True), batch_format="pyarrow"
        )
        pre = salted.groupby(["bucket", "salt"]).map_groups(
            _fold_bucket, batch_format="pandas"
        )
        rebucketed = pre.map_batches(
            lambda b: _bucket(b, False), batch_format="pyarrow"
        )
        return rebucketed.groupby("bucket").map_groups(
            _fold_bucket, batch_format="pandas"
        )
    bucketed = partials_ds.map_batches(
        lambda b: _bucket(b, False), batch_format="pyarrow"
    )
    return bucketed.groupby("bucket").map_groups(_fold_bucket, batch_format="pandas")


def sketch_aggregate(
    ds,
    specs: list[SketchSpec],
    group_key: str | None = None,
    merge: str = "auto",
    batch_size: int | None = None,
    salt_fan_in: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> dict[str, dict[str, Any]]:
    """End-to-end: build partials, merge, decode.

    Returns ``{group_value: {spec_name: sketch_object}}`` (group value ""
    for ungrouped). The result is small by construction — sketches, not
    data — so driver materialization here is sound at any input scale.
    """
    partials = build_partials(ds, specs, group_key, batch_size=batch_size,
                              concurrency=concurrency)
    # Materialize the partials exactly once: they are KB-sized by
    # construction (sparse codecs), so this pins MBs in the object store —
    # never the input — and lets count() + the merge pass read the same
    # executed result instead of re-running the whole pipeline.
    partials = partials.materialize()
    if merge == "auto":
        merge = "driver" if partials.count() <= _DRIVER_MERGE_MAX_PARTIALS else "tree"
    if merge == "driver":
        merged = merge_partials_driver(partials)
    elif merge == "tree":
        merged = merge_partials_tree(partials)
    elif merge == "dataset":
        out = merge_partials_ds(partials, salt_fan_in=salt_fan_in)
        merged = {}
        for b in out.iter_batches(batch_size=4096, batch_format="pyarrow"):
            for g, s, p in zip(b["group"].to_pylist(), b["spec"].to_pylist(),
                               b["payload"].to_pylist()):
                merged[(g, s)] = p
    else:
        raise ValueError(f"unknown merge mode {merge!r}")

    kind_by_spec = {s.name: s.kind for s in specs}
    result: dict[str, dict[str, Any]] = {}
    for (gval, spec_name), payload in merged.items():
        cls = SKETCH_KINDS[kind_by_spec[spec_name]]
        result.setdefault(gval, {})[spec_name] = cls.from_bytes(payload)
    return result


def distinct_count_partials(ds, key_cols: list[str], item_col: str,
                            num_buckets: int = 256):
    """EXACT distributed ``count(DISTINCT item) GROUP BY keys``: per-block
    distinct (keys, item) rows collapse before ONE coarse shuffle on
    ``hash(keys, item)`` — every distinct tuple lands in exactly one
    bucket, so the per-bucket dedup + per-key size is exact — and the
    returned partial Dataset holds ≤ buckets × keys rows of
    ``(*key_cols, n)`` for the caller to fold (``_fold_partials`` /
    driver sum). The doc_stats / hourly-actives plan, one definition."""
    import pyarrow as pa

    from .hashing import append_coarse_bucket

    cols = key_cols + [item_col]

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(cols).to_pandas().drop_duplicates()
        t = pa.Table.from_pandas(df, preserve_index=False)
        return append_coarse_bucket(t, cols, num_buckets, "__dc")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(cols)
        return u.groupby(key_cols, sort=False).size().reset_index(name="n")

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__dc")
        .map_groups(lambda df: fold(df.drop(columns=["__dc"])),
                    batch_format="pandas")
    )


def rollup_levels(finest: pd.DataFrame, keys: list[str],
                  sum_cols: list[str], min_cols: list[str] = (),
                  max_cols: list[str] = (), sentinel: str = "ALL"
                  ) -> pd.DataFrame:
    """SQL ``GROUP BY ROLLUP(keys...)`` derived from the FINEST exact
    aggregate — the grouping-sets pattern that costs one distributed
    pass: sums/counts/min/max re-aggregate associatively, so every
    coarser level (k1..k_{i}, ALL, ..., ALL) folds from the tiny finest
    table on the driver, never from the raw data. Rolled-up key columns
    carry ``sentinel`` (the SQL side mirrors with COALESCE).

    The finest table must fit the driver — true by construction for
    rollup keys (group cardinality ≤ the finest GROUP BY's, which the
    caller already materialized).
    """
    agg = ({c: "sum" for c in sum_cols} | {c: "min" for c in min_cols}
           | {c: "max" for c in max_cols})
    vals = list(agg)
    levels = [finest[keys + vals].copy()]
    for i in range(len(keys) - 1, -1, -1):
        lvl = (finest.groupby(keys[:i], sort=False)[vals].agg(agg).reset_index()
               if i else finest[vals].agg(agg).to_frame().T)
        for k in keys[i:]:
            lvl[k] = sentinel
        levels.append(lvl[keys + vals])
    return pd.concat(levels, ignore_index=True).sort_values(
        keys, kind="mergesort").reset_index(drop=True)


def cube_levels(finest: pd.DataFrame, keys: list[str],
                sum_cols: list[str], min_cols: list[str] = (),
                max_cols: list[str] = (), sentinel: str = "ALL"
                ) -> pd.DataFrame:
    """SQL ``GROUP BY CUBE(keys...)`` from the FINEST exact aggregate:
    every one of the 2^k grouping sets folds associatively from the tiny
    finest table (same one-distributed-pass contract as
    :func:`rollup_levels`; ROLLUP emits the k+1 prefix sets, CUBE all
    subsets). Cubed-away key columns carry ``sentinel``."""
    from itertools import combinations

    agg = ({c: "sum" for c in sum_cols} | {c: "min" for c in min_cols}
           | {c: "max" for c in max_cols})
    vals = list(agg)
    levels = []
    for r in range(len(keys), -1, -1):
        for subset in combinations(keys, r):
            sub = list(subset)
            if r == len(keys):
                lvl = finest[keys + vals].copy()
            elif sub:
                lvl = finest.groupby(sub, sort=False)[vals].agg(agg).reset_index()
            else:
                lvl = finest[vals].agg(agg).to_frame().T
            for k in keys:
                if k not in sub:
                    lvl[k] = sentinel
            levels.append(lvl[keys + vals])
    return pd.concat(levels, ignore_index=True).sort_values(
        keys, kind="mergesort").reset_index(drop=True)


def grouping_sets_levels(finest: pd.DataFrame, keys: list[str],
                         sets: list[list[str]], sum_cols: list[str],
                         min_cols: list[str] = (), max_cols: list[str] = (),
                         sentinel: str = "ALL") -> pd.DataFrame:
    """SQL ``GROUP BY GROUPING SETS (...)`` — ARBITRARY set lists folded
    from the FINEST exact aggregate (ROLLUP = the prefix sets, CUBE = all
    subsets; this is the general form, same one-distributed-pass
    contract). Each set must be a subset of ``keys``; absent keys carry
    ``sentinel``."""
    agg = ({c: "sum" for c in sum_cols} | {c: "min" for c in min_cols}
           | {c: "max" for c in max_cols})
    vals = list(agg)
    levels = []
    for sub in sets:
        if not set(sub) <= set(keys):
            raise ValueError(f"grouping set {sub!r} not a subset of {keys!r}")
        if set(sub) == set(keys):
            lvl = finest[keys + vals].copy()
        elif sub:
            lvl = finest.groupby(list(sub), sort=False)[vals].agg(
                agg).reset_index()
        else:
            lvl = finest[vals].agg(agg).to_frame().T
        for k in keys:
            if k not in sub:
                lvl[k] = sentinel
        levels.append(lvl[keys + vals])
    return pd.concat(levels, ignore_index=True).sort_values(
        keys, kind="mergesort").reset_index(drop=True)


def pivot_wide(finest: pd.DataFrame, row_key: str, col_key: str,
               value_col: str, categories: list[str], fill=0) -> pd.DataFrame:
    """Wide pivot of a FINEST aggregate: one output row per ``row_key``,
    one column per category of ``col_key``. Like :func:`rollup_levels`
    this is a driver-side reshape of the already-folded (tiny) finest
    table — the distributed work is the partial count fold, and the
    output schema is FIXED by ``categories`` (a streaming engine cannot
    discover columns mid-write; dynamic category sets need a separate
    distinct pass first). Unseen categories fill with ``fill``; rows
    whose category is outside ``categories`` are dropped."""
    p = finest.pivot_table(index=row_key, columns=col_key, values=value_col,
                           aggfunc="sum", fill_value=fill)
    p = p.reindex(columns=categories, fill_value=fill)
    p.columns = list(categories)
    return p.reset_index().sort_values(row_key).reset_index(drop=True)
