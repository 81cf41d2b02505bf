"""Ordered-sequence funnel analysis over an event stream — "how many
users reached stage i" where stage i counts only events STRICTLY after
the user's stage-(i-1) reach time (the classic product-analytics funnel;
a sequence-detection capability the reference's per-bucket aggregates
cannot express).

Plan: ONE coarse shuffle on ``hash(user) % num_buckets`` co-locates each
user's events (the sessionize contract, ops/window.py); the per-bucket
fold walks the stage list with vectorized pandas (per-user min-ts of the
stage's events, filtered to after the previous reach time via one merge)
and emits ≤ ``len(stages)`` count rows per bucket; a tiny final fold
sums buckets. Shuffle volume is the events of the stage types only
(other event types are dropped at the map stage)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def funnel(
    ds,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    num_buckets: int = 256,
):
    """Return a Dataset (stage_idx int64 1-based, stage string, n_users
    int64): users reaching each funnel stage in order."""
    if not stages:
        raise ValueError("stages must be non-empty")

    stage_set = list(dict.fromkeys(stages))
    if len(stage_set) != len(stages):
        raise ValueError("stages must be distinct")

    def coarse(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..engine.hashing import append_coarse_bucket

        b = b.select([user_col, ts_col, type_col])
        b = b.filter(pc.is_in(b[type_col], value_set=pa.array(stages)))
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        else:
            ts = pc.cast(ts, pa.int64())
        b = b.set_column(b.schema.get_field_index(ts_col), ts_col, ts)
        return append_coarse_bucket(b, [user_col], num_buckets, "__fb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        reached: pd.Series | None = None
        out = []
        for i, st in enumerate(stages):
            sub = df[df[type_col] == st]
            if i == 0:
                cur = sub.groupby(user_col)[ts_col].min()
            elif reached is None or reached.empty:
                cur = pd.Series([], dtype="int64")
            else:
                prev = reached.rename("__prev").reset_index()
                prev.columns = [user_col, "__prev"]
                m = sub.merge(prev, on=user_col)
                m = m[m[ts_col] > m["__prev"]]
                cur = m.groupby(user_col)[ts_col].min()
            reached = cur
            out.append((i + 1, st, int(len(cur))))
        return pd.DataFrame(out, columns=["stage_idx", "stage", "n_users"])

    per_bucket = (
        ds.map_batches(coarse, batch_format="pyarrow")
        .groupby("__fb")
        .map_groups(
            lambda df: fold(df.drop(columns=["__fb"])), batch_format="pandas"
        )
    )

    # buckets × stages tiny rows: fold driver-side (the _fold_partials
    # discipline). Starting from the explicit zero base also fixes the
    # no-matching-events case — a groupby over an empty dataset loses
    # its schema entirely, but the contract is one row per stage with
    # n_users = 0 (what the SQL replay returns).
    import ray.data as rd

    base = pd.DataFrame({
        "stage_idx": np.arange(1, len(stages) + 1, dtype=np.int64),
        "stage": stages,
        "n_users": np.zeros(len(stages), dtype=np.int64),
    })
    parts = per_bucket.to_pandas()
    if len(parts):
        sums = parts.groupby("stage_idx")["n_users"].sum()
        base["n_users"] = (
            base["stage_idx"].map(sums).fillna(0).astype(np.int64)
        )
    return rd.from_pandas(base)
