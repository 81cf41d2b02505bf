"""Long→wide reshape: distributed pivot with a bounded pivot taxonomy.

``pivot_wide`` turns an event-style long table into one wide row per
key — ``n_<type>`` counts and ``sum_<type>`` fixed-decimal sums per
pivot value — the feature layout a per-user model trains on.  The pivot
vocabulary must be taxonomy-bounded (event types, product categories):
the wide schema is |V|-wide, discovered with one tiny distinct fold.
Keys are corpus-sized, so the result is a Dataset, never a driver
table.  Value sums ride as INTEGER scaled units (the nation_revenue
integer-cents discipline) so the fold is block-order-free and the SQL
replay is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pivot_wide(ds, key_col: str, pivot_col: str, value_col: str,
               scale: int = 100, num_buckets: int = 256):
    """Return a Dataset with one row per key: (key, n_<v>..., sum_<v>...)
    for every distinct pivot value v (sorted), where ``sum_<v>`` is the
    exact fixed-decimal sum (``value_col`` must carry ≤ log10(scale)
    decimals — validated per block).

    Plan: per-block (key, pivot) partials (count + int64 scaled sum, one
    vectorized groupby — raw rows never shuffle) → ONE coarse shuffle on
    ``hash(key) % num_buckets`` → each bucket folds duplicates and
    pivots to wide.  The |V| vocabulary is discovered with a per-block
    distinct partial folded on the driver (|V| rows per block)."""
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.floor(np.abs(v) * scale + 0.5) * np.sign(v)
        if not np.allclose(cents / scale, v, rtol=0, atol=1e-9):
            raise ValueError(
                f"pivot_wide: {value_col} carries more decimals than "
                f"scale={scale} represents")
        df = pd.DataFrame({
            "k": b[key_col].to_numpy(zero_copy_only=False),
            "p": pd.Series(b[pivot_col].to_pylist(), dtype="object"),
            "n": np.ones(len(v), dtype=np.int64),
            "s": cents.astype(np.int64)})
        out = df.groupby(["k", "p"], sort=False, as_index=False).sum()
        return pa.table({
            "k": pa.array(out["k"].to_numpy(np.int64)),
            "p": pa.array(out["p"].to_numpy(object), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "s": pa.array(out["s"].to_numpy(np.int64))})

    parts = ds.select_columns([key_col, pivot_col, value_col]) \
        .map_batches(partial, batch_format="pyarrow")
    parts = parts.materialize()  # used twice: vocab fold + pivot

    def vocab_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"p": pc.unique(b["p"])})

    vocab = sorted(parts.map_batches(
        vocab_partial, batch_format="pyarrow").to_pandas()["p"].unique())

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["k", "p"], as_index=False)[["n", "s"]].sum()
        wn = agg.pivot(index="k", columns="p", values="n") \
            .reindex(columns=vocab).fillna(0).astype(np.int64)
        ws = agg.pivot(index="k", columns="p", values="s") \
            .reindex(columns=vocab).fillna(0).astype(np.int64)
        out = pd.DataFrame({key_col: wn.index.to_numpy(np.int64)})
        for t in vocab:
            out[f"n_{t}"] = wn[t].to_numpy(np.int64)
            # int-cents / scale: both sides of the oracle compute the
            # nearest double to the exact decimal — bit-identical
            out[f"sum_{t}"] = ws[t].to_numpy(np.int64) / np.float64(scale)
        return out

    return (parts.map_batches(
                lambda b: append_coarse_bucket(b, ["k"], num_buckets, "__b"),
                batch_format="pyarrow")
            .groupby("__b")
            .map_groups(lambda df: fold(df.drop(columns="__b")),
                        batch_format="pandas"))


def melt(ds, id_col: str, value_cols: list[str],
         name_col: str = "name", value_out: str = "value"):
    """Wide→long unpivot, the inverse of :func:`pivot_wide`: each input
    row emits one (id, column-name, value) row per value column. Pure
    per-block streaming — no shuffle, no state; output is |value_cols|×
    the input rows, emitted block-by-block. Values cast to float64 (the
    numeric-column contract shared with table_profile)."""

    def unpivot(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        vals = np.concatenate([
            b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in value_cols]) if n else np.zeros(0, np.float64)
        return pa.table({
            id_col: pa.array(np.tile(ids, len(value_cols)), pa.int64()),
            name_col: pa.array(
                np.repeat(np.asarray(value_cols, dtype=object), n),
                pa.string()),
            value_out: pa.array(vals, pa.float64()),
        })

    return ds.select_columns([id_col] + list(value_cols)) \
        .map_batches(unpivot, batch_format="pyarrow")
