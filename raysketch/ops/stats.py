"""Distributed higher-moment statistics — exact grouped skewness /
kurtosis from integer power sums.

The reference's running_stats (running_stats.c) streams mean/variance
via Welford; production data QC also wants the 3rd/4th moments
(distribution-shape drift, heavy-tail detection).  Floating-point power
sums are block-order-dependent, so the distributed pass here demands an
INTEGER-VALUED column (callers scale fixed-decimal data up front, the
nation_revenue integer-cents discipline): every per-block partial is an
exact int64 ``(n, Σv, Σv², Σv³, Σv⁴)`` per group, the fold is
order-free, and the driver applies the closed-form sample-adjusted
G1/G2 formulas (the ones DuckDB's skewness()/kurtosis() implement) once
per group.  Caller contract: ``n · max|v|⁴ < 2⁶³`` (e.g. |v| ≤ 2 000 at
a trillion rows); the op validates the per-partial bound it can see.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _r6(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def grouped_moments(ds, group_col: str, value_col: str) -> pa.Table:
    """Exact per-group mean / sample stddev / skewness / excess
    kurtosis of an integer-valued column in ONE distributed pass.

    Plan: each block reduces to ≤ |groups| rows of int64 power sums
    (one vectorized pandas groupby — no shuffle of raw values); the
    driver folds blocks × groups tiny partials and evaluates the
    moment formulas.  Returns a driver-sized pa.Table ordered by
    group: (<group_col>, n, mean, stddev, skewness, kurtosis), floats
    round6 — matching DuckDB avg/stddev_samp/skewness/kurtosis on the
    same column bit-for-bit at round6."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi, v.astype(np.float64)):
            raise ValueError(
                f"grouped_moments: {value_col} must be integer-valued "
                "(scale fixed-decimal data to integers first)")
        g = pd.Series(b[group_col].to_pylist(), dtype="object")
        df = pd.DataFrame({
            "g": g, "n": np.ones(len(vi), dtype=np.int64),
            "s1": vi, "s2": vi * vi, "s3": vi * vi * vi,
            "s4": (vi * vi) * (vi * vi)})
        out = df.groupby("g", sort=False, as_index=False).sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "s1": pa.array(out["s1"].to_numpy(np.int64)),
            "s2": pa.array(out["s2"].to_numpy(np.int64)),
            "s3": pa.array(out["s3"].to_numpy(np.int64)),
            "s4": pa.array(out["s4"].to_numpy(np.int64)),
        })

    parts = (ds.select_columns([group_col, value_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if parts.empty:
        return pa.table({
            group_col: pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "mean": pa.array([], pa.float64()),
            "stddev": pa.array([], pa.float64()),
            "skewness": pa.array([], pa.float64()),
            "kurtosis": pa.array([], pa.float64())})
    agg = parts.groupby("g", as_index=False).sum().sort_values("g") \
        .reset_index(drop=True)
    n = agg["n"].to_numpy(np.int64).astype(np.float64)
    s1 = agg["s1"].to_numpy(np.int64).astype(np.float64)
    s2 = agg["s2"].to_numpy(np.int64).astype(np.float64)
    s3 = agg["s3"].to_numpy(np.int64).astype(np.float64)
    s4 = agg["s4"].to_numpy(np.int64).astype(np.float64)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3.0 * mu * s2 / n + 2.0 * mu**3
    m4 = s4 / n - 4.0 * mu * s3 / n + 6.0 * mu * mu * s2 / n - 3.0 * mu**4
    with np.errstate(divide="ignore", invalid="ignore"):
        # sample-adjusted G1/G2 (what DuckDB skewness()/kurtosis() return)
        g1 = m3 / m2**1.5
        sk = g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0)
        g2 = m4 / (m2 * m2) - 3.0
        ku = ((n + 1.0) * g2 + 6.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0))
        sd = np.sqrt(m2 * n / (n - 1.0))
    return pa.table({
        group_col: pa.array(agg["g"].to_numpy(object), pa.string()),
        "n": pa.array(agg["n"].to_numpy(np.int64)),
        "mean": pa.array(_r6(mu), pa.float64()),
        "stddev": pa.array(_r6(sd), pa.float64()),
        "skewness": pa.array(_r6(sk), pa.float64()),
        "kurtosis": pa.array(_r6(ku), pa.float64()),
    })
