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
