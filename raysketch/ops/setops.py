"""Distributed distinct set operations (INTERSECT / EXCEPT / UNION
DISTINCT) between two key streams — classic SQL set semantics the
reference only approximates via sketches (SURVEY.md §2.8: HLL
duplicate-%, Bloom membership; the exact forms live here).

Plan: each side collapses to per-block DISTINCT partials inside
``map_batches`` (shuffle volume ≤ blocks × per-block distinct keys, never
raw rows), tagged with a side bit; ONE coarse shuffle on
``hash(key) % num_buckets`` co-locates all copies of a key (both sides
land in the same bucket by construction); the per-bucket fold computes a
vectorized side bitmask per key and emits the requested ops. No driver
materialization — results stream out of the reduce tasks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_VALID_OPS = ("intersect", "except", "union")


def distinct_set_op(
    ds_a,
    ds_b,
    col_a: str,
    col_b: str | None = None,
    ops: tuple[str, ...] = _VALID_OPS,
    num_buckets: int = 256,
):
    """Emit (op, key) rows for the requested distinct set operations.

    ``intersect`` = keys in both sides, ``except`` = keys of A not in B,
    ``union`` = keys of either side — all over DISTINCT keys. The key
    column keeps side A's name in the output.
    """
    for op in ops:
        if op not in _VALID_OPS:
            raise ValueError(f"unknown set op {op!r}")
    col_b = col_b or col_a

    def partial(col: str, side: int):
        def fn(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keys = pc.unique(b[col])
            return pa.table({
                col_a: keys,
                "__side": pa.array(
                    np.full(len(keys), side, dtype=np.int64), pa.int64()
                ),
            })

        return fn

    a = ds_a.select_columns([col_a]).map_batches(
        partial(col_a, 1), batch_format="pyarrow"
    )
    b = ds_b.select_columns([col_b]).map_batches(
        partial(col_b, 2), batch_format="pyarrow"
    )

    def coarse(t: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(t, [col_a], num_buckets, "__kb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "op": pd.Series([], dtype="object"),
                col_a: pd.Series([], dtype=df[col_a].dtype),
            })
        # side bitmask per key: 1 = A only, 2 = B only, 3 = both
        mask = (
            df.drop_duplicates([col_a, "__side"])
            .groupby(col_a, sort=False)["__side"]
            .sum()
        )
        out = []
        if "intersect" in ops:
            k = mask.index[mask.to_numpy() == 3]
            out.append(pd.DataFrame({"op": "intersect", col_a: k}))
        if "except" in ops:
            k = mask.index[mask.to_numpy() == 1]
            out.append(pd.DataFrame({"op": "except", col_a: k}))
        if "union" in ops:
            out.append(pd.DataFrame({"op": "union", col_a: mask.index}))
        return pd.concat(out, ignore_index=True)

    return (
        a.union(b)
        .map_batches(coarse, batch_format="pyarrow")
        .groupby("__kb")
        .map_groups(
            lambda df: fold(df.drop(columns=["__kb"])), batch_format="pandas"
        )
    )


def table_diff(ds_old, ds_new, id_col: str, content_cols: list[str],
               num_buckets: int = 256):
    """CDC-style snapshot diff between two versions of a keyed table:
    a Dataset of (id, status) where status ∈ {'added', 'removed',
    'changed'} — unchanged rows are dropped inside the fold and never
    leave the reduce tasks (the common case at snapshot scale).

    Plan: each side reduces to NARROW (id, content hash64, side)
    partials in the same fused map that reads it (content never rides
    the shuffle); ONE coarse shuffle on ``hash(id)`` co-locates both
    versions of a key; the per-bucket fold compares vectorized. A
    64-bit content hash can collide a changed row into 'unchanged' at
    astronomically low probability (~n²/2⁶⁴ per key-pair is not the
    relevant bound — collisions only matter per-KEY, old vs new value:
    p ≈ 2⁻⁶⁴ per changed row); swap in ``sha256_batch`` where absolute
    certainty beats the 4× hash throughput."""
    from ..engine.hashing import append_coarse_bucket, hash64_batch

    def side(tag: int):
        def f(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            blob = pd.Series([""] * len(ids), dtype="object")
            for c in content_cols:  # stable field separator
                blob = blob + pd.Series(b[c].to_pylist(),
                                        dtype="object").astype(str) + "\x1f"
            h = hash64_batch(blob.to_numpy(dtype=object)) \
                .astype(np.int64)
            return pa.table({
                "id": pa.array(ids), "h": pa.array(h),
                "side": pa.array(np.full(len(ids), tag, np.int64))})

        return f

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        pv = df.pivot_table(index="id", columns="side", values="h",
                            aggfunc="first")
        old = pv[0] if 0 in pv.columns else pd.Series(index=pv.index,
                                                      dtype="float64")
        new = pv[1] if 1 in pv.columns else pd.Series(index=pv.index,
                                                      dtype="float64")
        status = np.where(
            old.isna(), "added",
            np.where(new.isna(), "removed",
                     np.where(old != new, "changed", "unchanged")))
        out = pd.DataFrame({"id": pv.index.to_numpy(np.int64),
                            "status": status})
        return out[out["status"] != "unchanged"].reset_index(drop=True)

    tagged = (ds_old.map_batches(side(0), batch_format="pyarrow")
              .union(ds_new.map_batches(side(1), batch_format="pyarrow")))
    return (tagged.map_batches(
        lambda b: append_coarse_bucket(b, ["id"], num_buckets, "__b"),
        batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda df: fold(df.drop(columns="__b")),
                    batch_format="pandas"))
