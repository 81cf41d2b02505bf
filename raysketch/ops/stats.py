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

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _r6(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


# Driver budget for histogram-partial folds (rows, not bytes — the
# partials here are 3-4 narrow int64/string columns). Module-level so
# route-identity tests can monkeypatch it; same discipline as the
# pagerank/key-skew `_DRIVER_FOLD_LIMIT`.
_HIST_DRIVER_LIMIT = 5_000_000


def _fold_hist_partials(parts_ds, key_cols: list, sum_cols: list,
                        num_buckets: int = 256) -> pd.DataFrame:
    """SIZE-ROUTED fold of per-block (key…, count…) histogram partials
    to driver pandas. The counting-pass ops' partials are bounded by
    |keys|×|domain| PER BLOCK, but the stream of them is blocks × that —
    at corpus scale (10⁵-10⁶ blocks) gathering the raw stream would put
    10⁸-10¹⁰ rows through the driver. Under ``_HIST_DRIVER_LIMIT`` total
    partial rows the driver folds directly (one pandas groupby beats a
    Ray shuffle whose only job is dedup); above it ONE coarse
    ``hash(key…)`` shuffle pre-folds duplicate (block × key) rows inside
    the cluster, so the driver sees at most the key-domain itself — the
    grouped_mode / table_profile pattern, shared.

    Returns the folded histogram (key_cols + summed sum_cols); empty
    input gives an empty DataFrame with the right columns (empty Ray
    datasets lose their schema, so the frame is built by hand)."""
    parts_ds = parts_ds.materialize()
    if parts_ds.count() == 0:
        return pd.DataFrame(columns=list(key_cols) + list(sum_cols))
    if parts_ds.count() <= _HIST_DRIVER_LIMIT:
        return parts_ds.to_pandas().groupby(
            list(key_cols), as_index=False)[list(sum_cols)].sum()
    from ..engine.hashing import append_coarse_bucket

    folded = (parts_ds.map_batches(
        lambda b: append_coarse_bucket(b, list(key_cols), num_buckets,
                                       "__hb"),
        batch_format="pyarrow")
        .groupby("__hb")
        .map_groups(lambda df: df.drop(columns="__hb").groupby(
            list(key_cols), as_index=False)[list(sum_cols)].sum(),
            batch_format="pandas"))
    return folded.to_pandas()


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
    return _finalize_moments(agg, group_col)


def _finalize_moments(agg: pd.DataFrame, group_col: str) -> pa.Table:
    """Sample-adjusted G1/G2 formulas over a folded power-sum state
    (columns g, n, s1..s4) — the shared finalize step of
    :func:`grouped_moments` and :func:`incremental_moments`."""
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


def _weighted_median(vals: np.ndarray, cnt: np.ndarray) -> float:
    """Interpolating median of a value→count histogram (what DuckDB's
    median() computes on the expanded column): for even n the mean of
    the two middle order statistics, else the middle one. Exact when
    values are exact binary fractions (integers, halves)."""
    order = np.argsort(vals)
    v, c = vals[order], cnt[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    if n % 2:
        return float(v[np.searchsorted(cum, n // 2 + 1)])
    lo = float(v[np.searchsorted(cum, n // 2)])
    hi = float(v[np.searchsorted(cum, n // 2 + 1)])
    return (lo + hi) / 2.0


def robust_profile(ds, group_col: str, value_col: str,
                   z_cut: float = 3.0) -> pa.Table:
    """Robust per-group distribution profile from ONE counting pass:
    exact interpolating median, MAD (median of |x − median|, the
    robust scale DuckDB's mad() returns), and the count of robust
    outliers (|x − median| > z_cut · MAD) — the data-QC screen that
    survives heavy tails where mean/stddev rules break.

    Requires a BOUNDED integer value domain (ratings, counts,
    quantities): each block reduces to ≤ |groups|×|domain| count rows,
    the partial stream folds via the size-routed
    :func:`_fold_hist_partials` (coarse ``hash(g, v)`` pre-shuffle above
    the driver budget), and every statistic is computed from the
    exact histogram — medians land on halves, MADs on quarters, all
    exact binary fractions, so the DuckDB replay matches bit-for-bit
    with no rounding slack. Outlier comparison uses the unrounded
    values on both sides."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi, v.astype(np.float64)):
            raise ValueError(
                f"robust_profile: {value_col} must be integer-valued")
        df = pd.DataFrame({
            "g": pd.Series(b[group_col].to_pylist(), dtype="object"),
            "v": vi, "n": np.ones(len(vi), dtype=np.int64)})
        out = df.groupby(["g", "v"], sort=False, as_index=False)["n"].sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "v": pa.array(out["v"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    hist = _fold_hist_partials(
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow"), ["g", "v"], ["n"])
    if hist.empty:
        return pa.table({group_col: pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "median": pa.array([], pa.float64()),
                         "mad": pa.array([], pa.float64()),
                         "n_outliers": pa.array([], pa.int64())})
    rows = []
    for g, sub in hist.groupby("g", sort=True):
        v = sub["v"].to_numpy(np.int64).astype(np.float64)
        c = sub["n"].to_numpy(np.int64)
        med = _weighted_median(v, c)
        dev = np.abs(v - med)  # halves — exact
        mad = _weighted_median(dev, c)
        out = int(c[dev > z_cut * mad].sum())
        rows.append((g, int(c.sum()), med, mad, out))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "median": pa.array([r[2] for r in rows], pa.float64()),
        "mad": pa.array([r[3] for r in rows], pa.float64()),
        "n_outliers": pa.array([r[4] for r in rows], pa.int64()),
    })


def grouped_mode(ds, group_col: str, value_col: str,
                 num_buckets: int = 256):
    """Exact modal value per group with a DETERMINISTIC tie-break (the
    smallest value among the most frequent — SQL-replayable via
    row_number, unlike DuckDB's order-dependent mode()). Groups are
    corpus-sized (users, documents), so the result is a Dataset.

    Plan: per-block (group, value) count partials (one vectorized
    groupby — raw rows never shuffle) → ONE coarse shuffle on
    ``hash(group)`` → each bucket folds duplicate partials and takes
    the per-group argmax. Returns (group, mode_value, n_mode)."""
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": b[group_col].to_numpy(zero_copy_only=False),
            "v": pd.Series(b[value_col].to_pylist(), dtype="object"),
            "n": np.ones(b.num_rows, dtype=np.int64)})
        out = df.groupby(["g", "v"], sort=False, as_index=False)["n"].sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(np.int64)),
            "v": pa.array(out["v"].to_numpy(object), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["g", "v"], as_index=False)["n"].sum()
        agg = agg.sort_values(["g", "n", "v"],
                              ascending=[True, False, True], kind="stable")
        top = agg.drop_duplicates("g", keep="first")
        return pd.DataFrame({
            group_col: top["g"].to_numpy(np.int64),
            "mode_value": top["v"].to_numpy(object),
            "n_mode": top["n"].to_numpy(np.int64)})

    return (ds.select_columns([group_col, value_col])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(
                lambda b: append_coarse_bucket(b, ["g"], num_buckets, "__b"),
                batch_format="pyarrow")
            .groupby("__b")
            .map_groups(lambda df: fold(df.drop(columns="__b")),
                        batch_format="pandas"))


def table_profile(ds, columns: list[str], num_buckets: int = 256) -> pa.Table:
    """Distributed data-profiling pass (the engine's DESCRIBE): for each
    numeric column, exact row count, null count, DISTINCT count, min and
    max — the schema-drift screen a pipeline runs on every new drop.

    ONE pass over the data emits two kinds of narrow partials per block:
    a scalar summary row per column (n, nulls, min, max) and the block's
    DISTINCT (column, value) pairs. Both ride ONE coarse
    ``hash(col, value)`` shuffle; each bucket counts its distinct values
    and folds its scalar rows, and the driver combines buckets ×
    |columns| tiny partials. Exact distinct counts cost the only value
    exchange, and it ships each distinct value at most once per block.
    Values are profiled as float64 (distinctness-preserving for int64
    below 2⁵³ and fixed-decimal data — the numeric-column contract)."""

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        outs = []
        for ci, c in enumerate(columns):
            col = b[c]
            nn = col.null_count
            vals = pc.drop_null(col).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            u = np.unique(vals)
            # kind 0: one scalar summary row; kind 1: distinct values
            outs.append(pd.DataFrame({
                "ci": np.full(1 + len(u), ci, dtype=np.int64),
                "kind": np.r_[np.zeros(1, np.int64), np.ones(len(u), np.int64)],
                "n": np.r_[np.int64(len(col)), np.zeros(len(u), np.int64)],
                "n_null": np.r_[np.int64(nn), np.zeros(len(u), np.int64)],
                "v": np.r_[np.float64(0), u],
                "mn": np.r_[u.min() if u.size else np.inf,
                            np.zeros(len(u))],
                "mx": np.r_[u.max() if u.size else -np.inf,
                            np.zeros(len(u))],
            }))
        df = pd.concat(outs, ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        sc = df[df["kind"] == 0]
        dv = df[df["kind"] == 1].drop_duplicates(["ci", "v"])
        nd = dv.groupby("ci").size()
        rows = []
        for ci in sorted(set(sc["ci"]) | set(dv["ci"])):
            s = sc[sc["ci"] == ci]
            rows.append((
                ci, int(s["n"].sum()), int(s["n_null"].sum()),
                int(nd.get(ci, 0)),
                float(s["mn"].min()) if len(s) else np.inf,
                float(s["mx"].max()) if len(s) else -np.inf))
        return pd.DataFrame(rows, columns=["ci", "n", "n_null",
                                           "n_distinct", "mn", "mx"])

    from ..engine.hashing import append_coarse_bucket

    parts = (ds.select_columns(columns)
             .map_batches(partial, batch_format="pyarrow")
             .map_batches(
                 lambda b: append_coarse_bucket(b, ["ci", "v"],
                                                num_buckets, "__b"),
                 batch_format="pyarrow")
             .groupby("__b")
             .map_groups(lambda df: fold(df.drop(columns="__b")),
                         batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("ci").agg(
        n=("n", "sum"), n_null=("n_null", "sum"),
        n_distinct=("n_distinct", "sum"),
        mn=("mn", "min"), mx=("mx", "max")).sort_index()
    return pa.table({
        "col_name": pa.array([columns[i] for i in agg.index], pa.string()),
        "n": pa.array(agg["n"].to_numpy(np.int64)),
        "n_null": pa.array(agg["n_null"].to_numpy(np.int64)),
        "n_distinct": pa.array(agg["n_distinct"].to_numpy(np.int64)),
        "vmin": pa.array(agg["mn"].to_numpy(np.float64)),
        "vmax": pa.array(agg["mx"].to_numpy(np.float64)),
    })


def _disc_quantile(vals: np.ndarray, cnt: np.ndarray,
                   qs: list[float]) -> list[float]:
    """quantile_disc over a value→count histogram: the order statistic
    at index ceil(q·n)−1 (the DuckDB rule used across this repo)."""
    import math

    order = np.argsort(vals)
    v, c = vals[order], cnt[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    return [float(v[np.searchsorted(cum, math.ceil(q * n) - 1 + 1)])
            for q in qs]


def windowed_quantiles(ds, window_col: str, value_col: str, scale: int,
                       qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> pa.Table:
    """Exact per-window value percentiles (the latency/size monitoring
    staple) from ONE counting pass: ``value_col`` must be fixed-decimal
    with ≤ log10(scale) decimals over a bounded domain, so each block
    reduces to ≤ |windows|×|domain| exact integer count rows
    (validated per block), the driver folds them, and each window's
    discrete quantiles come off the exact histogram — the
    quantile_disc(ceil(q·n)−1) rule, replayed bit-for-bit in SQL.
    Returns (window, n, q50, q90, q99) ordered by window."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.floor(np.abs(v) * scale + 0.5) * np.sign(v)
        if not np.allclose(cents / scale, v, rtol=0, atol=1e-9):
            raise ValueError(
                f"windowed_quantiles: {value_col} carries more decimals "
                f"than scale={scale} represents")
        df = pd.DataFrame({
            "w": b[window_col].to_numpy(zero_copy_only=False),
            "v": cents.astype(np.int64),
            "n": np.ones(len(v), dtype=np.int64)})
        out = df.groupby(["w", "v"], sort=False, as_index=False)["n"].sum()
        return pa.table({"w": pa.array(out["w"].to_numpy(np.int64)),
                         "v": pa.array(out["v"].to_numpy(np.int64)),
                         "n": pa.array(out["n"].to_numpy(np.int64))})

    hist = _fold_hist_partials(
        ds.select_columns([window_col, value_col])
        .map_batches(partial, batch_format="pyarrow"), ["w", "v"], ["n"])
    cols = {window_col: [], "n": []}
    for q in qs:
        cols[f"q{int(round(q * 100))}"] = []
    if not hist.empty:
        for w, sub in hist.groupby("w", sort=True):
            v = sub["v"].to_numpy(np.int64)
            c = sub["n"].to_numpy(np.int64)
            cols[window_col].append(int(w))
            cols["n"].append(int(c.sum()))
            # int-cents / scale: nearest double to the exact decimal on
            # both sides of the oracle
            for q, x in zip(qs, _disc_quantile(v.astype(np.float64), c, list(qs))):
                cols[f"q{int(round(q * 100))}"].append(x / np.float64(scale))
    out = {window_col: pa.array(cols[window_col], pa.int64()),
           "n": pa.array(cols["n"], pa.int64())}
    for q in qs:
        k = f"q{int(round(q * 100))}"
        out[k] = pa.array(cols[k], pa.float64())
    return pa.table(out)


def trimmed_mean(ds, group_col: str, value_col: str,
                 alpha: float = 0.05) -> pa.Table:
    """Exact per-group α-trimmed mean of an integer-valued column from
    ONE counting pass: drop the floor(α·n) smallest and largest
    observations and average the exact integer sum of the rest — the
    outlier-resistant location estimate, replayed in SQL with a
    row_number window. Returns (group, n, n_used, trimmed_mean round6)
    ordered by group."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi, v.astype(np.float64)):
            raise ValueError(
                f"trimmed_mean: {value_col} must be integer-valued")
        df = pd.DataFrame({
            "g": pd.Series(b[group_col].to_pylist(), dtype="object"),
            "v": vi, "n": np.ones(len(vi), dtype=np.int64)})
        out = df.groupby(["g", "v"], sort=False, as_index=False)["n"].sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "v": pa.array(out["v"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    hist = _fold_hist_partials(
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow"), ["g", "v"], ["n"])
    if hist.empty:
        return pa.table({group_col: pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "n_used": pa.array([], pa.int64()),
                         "trimmed_mean": pa.array([], pa.float64())})
    rows = []
    for g, sub in hist.groupby("g", sort=True):
        sub = sub.sort_values("v")
        v = sub["v"].to_numpy(np.int64)
        c = sub["n"].to_numpy(np.int64)
        n = int(c.sum())
        k = int(np.floor(alpha * n))
        # exact integer count of survivors per value after trimming
        # k from each tail: clip cumulative ranks into [k, n-k]
        cum_hi = np.cumsum(c)
        cum_lo = cum_hi - c
        kept = np.minimum(cum_hi, n - k) - np.maximum(cum_lo, k)
        kept = np.maximum(kept, 0)
        s = int((v * kept).sum())
        used = int(kept.sum())
        rows.append((g, n, used, s / np.float64(used)))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "n_used": pa.array([r[2] for r in rows], pa.int64()),
        "trimmed_mean": pa.array(_r6(np.array([r[3] for r in rows])),
                                 pa.float64()),
    })


def _chunked_int_sum(a: np.ndarray, chunk: int = 8192) -> int:
    """Exact arbitrary-precision sum of an int64 array: chunk sums stay
    below 2⁶³ (caller bounds per-element magnitude), chunk results fold
    as Python ints — overflow-proof at any row count."""
    return sum(int(a[i:i + chunk].sum()) for i in range(0, len(a), chunk))


def grouped_linear_fit(ds, group_col: str, x_col: str, y_col: str,
                       y_scale: int = 1) -> pa.Table:
    """Exact per-group simple linear regression (slope, intercept, R²)
    in ONE distributed pass — the closed-form normal equations over
    EXACT integer power sums. ``x_col`` must be integer-valued;
    ``y_col`` fixed-decimal with ≤ log10(y_scale) decimals (both
    validated per block). Power sums ride the exchange as DECIMAL
    STRINGS and fold in Python arbitrary-precision ints, so no row
    count overflows them; the driver evaluates slope/intercept/R² with
    exact integer numerators and one correctly-rounded float division
    each — matching DuckDB regr_slope/regr_intercept/regr_r2 at round6.
    Groups must be taxonomy-bounded (the per-block loop is over groups,
    never rows)."""

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        xi = x.astype(np.int64)
        if not np.array_equal(xi.astype(np.float64), x):
            raise ValueError(
                f"grouped_linear_fit: {x_col} must be integer-valued")
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        yc = np.floor(np.abs(y) * y_scale + 0.5) * np.sign(y)
        if not np.allclose(yc / y_scale, y, rtol=0, atol=1e-9):
            raise ValueError(
                f"grouped_linear_fit: {y_col} carries more decimals "
                f"than y_scale={y_scale} represents")
        yi = yc.astype(np.int64)
        g = pd.Series(b[group_col].to_pylist(), dtype="object")
        rows = []
        for gv in sorted(g.unique()):
            m = (g == gv).to_numpy()
            xm, ym = xi[m], yi[m]
            rows.append((
                gv, len(xm),
                str(_chunked_int_sum(xm)), str(_chunked_int_sum(ym)),
                str(_chunked_int_sum(xm * xm)),
                str(_chunked_int_sum(ym * ym, chunk=64)),
                str(_chunked_int_sum(xm * ym, chunk=512))))
        out = pd.DataFrame(rows, columns=["g", "n", "sx", "sy",
                                          "sxx", "syy", "sxy"])
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = (ds.select_columns([group_col, x_col, y_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if parts.empty:
        return pa.table({group_col: pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "slope": pa.array([], pa.float64()),
                         "intercept": pa.array([], pa.float64()),
                         "r2": pa.array([], pa.float64())})
    rows = []
    for gv, sub in parts.groupby("g", sort=True):
        n = int(sub["n"].sum())
        sx = sum(int(s) for s in sub["sx"])
        sy = sum(int(s) for s in sub["sy"])
        sxx = sum(int(s) for s in sub["sxx"])
        syy = sum(int(s) for s in sub["syy"])
        sxy = sum(int(s) for s in sub["sxy"])
        # exact integer numerators/denominators; one float division each
        dxx = n * sxx - sx * sx
        dyy = n * syy - sy * sy
        dxy = n * sxy - sx * sy
        slope = dxy / dxx / y_scale
        intercept = (sy / y_scale - slope * sx) / n
        r2 = (dxy * dxy) / (dxx * dyy) if dxx and dyy else float("nan")
        rows.append((gv, n, slope, intercept, r2))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "slope": pa.array(_r6(np.array([r[2] for r in rows])),
                          pa.float64()),
        "intercept": pa.array(_r6(np.array([r[3] for r in rows])),
                              pa.float64()),
        "r2": pa.array(_r6(np.array([r[4] for r in rows])), pa.float64()),
    })


def _micro(x: np.ndarray) -> np.ndarray:
    """Round to integer micro-nats, half AWAY from zero (DuckDB
    round() semantics — never numpy half-to-even)."""
    return (np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5)).astype(np.int64)


def mutual_info(ds, a_col: str, b_col: str) -> dict[str, int]:
    """Mutual information and marginal entropies between two
    categorical columns, in INTEGER micro-nats — the feature/label
    dependence screen (and redundant-column detector) a pipeline runs
    before training. One distributed pass: each block reduces to its
    (a, b, n) contingency partial (narrow — |A|·|B| rows, never raw
    rows); the driver folds blocks × cells and evaluates

        mi = Σ_ab round(c_ab · ln(n·c_ab / (c_a·c_b)) · 1e6)
        h_x = Σ_x round(c_x · ln(n / c_x) · 1e6)

    Per-CELL rounding (not per-sum) makes every term an int64 and the
    whole statistic bit-replayable in DuckDB double arithmetic; the
    true nat values are off by ≤ cells·0.5e-6 / n. MI cell terms are
    signed (c_ab below independence is negative) — half-away rounding
    handles both signs. Returns ``{"n", "mi_micro_nats",
    "h_a_micro_nats", "h_b_micro_nats"}`` (micro-nats scaled by n·1e6;
    divide by n·1e6 for nats)."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "a": np.asarray(b[a_col].to_pylist(), dtype=object),
            "b": np.asarray(b[b_col].to_pylist(), dtype=object)})
        g = df.groupby(["a", "b"], sort=False).size().reset_index(name="n")
        return pa.table({
            "a": pa.array(g["a"].astype(str), pa.string()),
            "b": pa.array(g["b"].astype(str), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64))})

    raw = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if raw.empty:  # all-empty Dataset loses its schema (Ray 2.49)
        raise ValueError("mutual_info: empty input")
    cells = raw.groupby(["a", "b"], as_index=False)["n"].sum()
    n = int(cells["n"].sum())
    ca = cells.groupby("a")["n"].transform("sum").to_numpy(np.float64)
    cb = cells.groupby("b")["n"].transform("sum").to_numpy(np.float64)
    c = cells["n"].to_numpy(np.float64)
    mi = int(_micro(c * np.log(n * c / (ca * cb))).sum())
    ha = cells.groupby("a", as_index=False)["n"].sum()["n"] \
        .to_numpy(np.float64)
    hb = cells.groupby("b", as_index=False)["n"].sum()["n"] \
        .to_numpy(np.float64)
    h_a = int(_micro(ha * np.log(n / ha)).sum())
    h_b = int(_micro(hb * np.log(n / hb)).sum())
    return {"n": n, "mi_micro_nats": mi,
            "h_a_micro_nats": h_a, "h_b_micro_nats": h_b}


# ---------------------------------------------------------------------------
# Benford first-digit drift profile
# ---------------------------------------------------------------------------

# Benford probabilities log10(1 + 1/d) in integer MICRO-UNITS — fixed
# published constants (not computed at runtime), so the expectation is
# an exact int64 (n · p_micro) and both sides of the oracle share the
# identical literals instead of racing libm log10 ulps.
BENFORD_MICRO = np.array([301030, 176091, 124939, 96910, 79181,
                          66947, 57992, 51153, 45757], dtype=np.int64)


def benford_profile(ds, value_col: str, scale: int = 100) -> pa.Table:
    """First-significant-digit profile of a positive fixed-decimal
    column vs Benford's law — the classic fabricated/drifted-numeric
    screen a QC pipeline runs over money-like columns.

    Values are scaled to integers first (``floor(x·scale + 0.5)``, the
    nation_revenue cents discipline) so the leading digit comes from
    exact integer arithmetic, never float formatting; rows whose scaled
    value is ≤ 0 are dropped (Benford is defined on positive
    magnitudes). Each block reduces to a ≤9-row (digit, n) partial —
    narrow at any corpus size — and the driver folds blocks × 9 rows.

    Returns 9 rows (digit 1-9 — absent digits count 0):
    ``digit`` int64, ``n_obs`` int64, ``exp_micro`` int64 (expected
    count in micro-units: ``n · BENFORD_MICRO[d]``, exact), and
    ``chi_micro`` int64 — the digit's chi-square term
    ``round((obs − e)²/e · 1e6)`` half-away, where ``e = n·p_micro/1e6``
    in doubles whose expression shape the SQL oracle mirrors exactly."""

    def partial(b: pa.Table) -> pa.Table:
        x = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.floor(x * scale + 0.5).astype(np.int64)
        v = v[v > 0]
        while (v >= 10).any():
            m = v >= 10
            v[m] //= 10
        cnt = np.bincount(v, minlength=10)[1:10]
        return pa.table({
            "digit": pa.array(np.arange(1, 10), pa.int64()),
            "n_obs": pa.array(cnt, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    obs = np.zeros(9, dtype=np.int64)
    if not parts.empty:
        g = parts.groupby("digit")["n_obs"].sum()
        obs[g.index.to_numpy() - 1] = g.to_numpy(np.int64)
    n = int(obs.sum())
    exp_micro = n * BENFORD_MICRO  # exact int64 (n·3e5 ≪ 2^63)
    e = exp_micro.astype(np.float64) / 1e6
    if n > 0:
        term = (obs.astype(np.float64) - e) ** 2 / e
    else:
        term = np.zeros(9)
    chi = (np.sign(term) * np.floor(np.abs(term) * 1e6 + 0.5)) \
        .astype(np.int64)
    return pa.table({
        "digit": pa.array(np.arange(1, 10), pa.int64()),
        "n_obs": pa.array(obs, pa.int64()),
        "exp_micro": pa.array(exp_micro, pa.int64()),
        "chi_micro": pa.array(chi, pa.int64())})


def _moments_state(ds, group_col: str, value_col: str) -> pd.DataFrame:
    """Folded per-group int64 power-sum state (g, n, s1..s4) of a
    Dataset — one streaming pass, the grouped_moments partial shape."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi, v.astype(np.float64)):
            raise ValueError(
                f"moments: {value_col} must be integer-valued")
        g = pd.Series(b[group_col].to_pylist(), dtype="object")
        df = pd.DataFrame({
            "g": g, "n": np.ones(len(vi), dtype=np.int64),
            "s1": vi, "s2": vi * vi, "s3": vi * vi * vi,
            "s4": (vi * vi) * (vi * vi)})
        out = df.groupby("g", sort=False, as_index=False).sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            **{c: pa.array(out[c].to_numpy(np.int64))
               for c in ("n", "s1", "s2", "s3", "s4")}})

    parts = (ds.select_columns([group_col, value_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if parts.empty:
        return pd.DataFrame(columns=["g", "n", "s1", "s2", "s3", "s4"])
    return parts.groupby("g", as_index=False).sum()


def incremental_moments(state_path: str, delta_ds, group_col: str,
                        value_col: str) -> pa.Table:
    """Incremental aggregate maintenance: fold a DELTA batch into a
    PERSISTED per-group power-sum state table and return the finalized
    moments over everything absorbed so far — the warehouse pattern
    (maintain the narrow mergeable state, never re-scan history; the
    sketch_warehouse discipline applied to exact moments).

    The state parquet holds |groups| rows of int64 (g, n, s1..s4);
    power sums are order-free integers, so ANY split of the corpus
    into increments — including block/run boundaries — finalizes
    bit-identically to one full recompute. The updated state is
    published atomically (temp file + rename); a crash leaves the old
    state readable. A missing ``state_path`` means "first increment"."""
    import pyarrow.parquet as pq

    new = _moments_state(delta_ds, group_col, value_col)
    if os.path.exists(state_path):
        old = pq.read_table(state_path).to_pandas()
        new = pd.concat([old, new], ignore_index=True) \
            .groupby("g", as_index=False).sum()
    agg = new.sort_values("g").reset_index(drop=True)
    for c in ("n", "s1", "s2", "s3", "s4"):
        agg[c] = agg[c].astype("int64")
    tmp = f"{state_path}.tmp-{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(agg, preserve_index=False), tmp)
    os.replace(tmp, state_path)
    return _finalize_moments(agg, group_col)



def weighted_quantiles(ds, value_col: str, weight_col: str,
                       qs: list[float]) -> pa.Table:
    """Exact WEIGHTED discrete quantiles of a bounded-integer-domain
    column — "the median TOKEN lives in a doc with value X" (weight =
    token count), the corpus-mass view plain quantiles miss. One
    counting pass: each block reduces to a (value, total-weight)
    histogram partial; the driver folds value-domain-sized rows and
    applies the discrete rule ``smallest v with cumw ≥ ceil(q·W)``
    (integer thresholds — the quantile_disc ceil(q·n) family, so the
    SQL window-cumsum oracle replays it exactly). Weights must be
    non-negative integers."""
    if not qs:
        raise ValueError("qs must be non-empty")

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False)
        wi = w.astype(np.int64)
        if not np.array_equal(wi, w.astype(np.float64)) or (wi < 0).any():
            raise ValueError(
                f"weighted_quantiles: {weight_col} must be "
                "non-negative integers")
        df = pd.DataFrame({"v": v, "w": wi})
        g = df.groupby("v", as_index=False)["w"].sum()
        return pa.table({"v": pa.array(g["v"].to_numpy(np.int64)),
                         "w": pa.array(g["w"].to_numpy(np.int64))})

    hist = _fold_hist_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["v"], ["w"])
    if hist.empty or hist["w"].sum() == 0:
        raise ValueError("weighted_quantiles: zero total weight")
    hist = hist.sort_values("v").reset_index(drop=True)
    vals = hist["v"].to_numpy(np.int64)
    cumw = hist["w"].to_numpy(np.int64).cumsum()
    W = int(cumw[-1])
    out_q, out_v = [], []
    for q in qs:
        t = max(int(math.ceil(q * W)), 1)  # binary q*W ≥ decimal (0<q≤1)
        out_q.append(float(q))
        out_v.append(int(vals[np.searchsorted(cumw, t, side="left")]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})


def grouped_geo_mean(ds, group_col: str, value_col: str) -> pa.Table:
    """Exact-statistic geometric mean per group of a POSITIVE integer
    column — the multiplicative average (growth factors, durations,
    lengths) the arithmetic mean overstates under skew. Per-value log
    terms round half-away to INTEGER micro-nats and sum as int64
    (ln v > 0 for v ≥ 1... v = 1 gives 0 — all terms ≥ 0), so the
    distributed fold is order-free and the SQL oracle replays the sum
    term-for-term; the finalize ``round6(exp(S / (n·1e6)))`` is one
    shared double expression. Narrow partials: ≤ |groups| rows per
    block. Returns (group, n, log_sum_micro, geo_mean)."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi, v.astype(np.float64)) or (vi < 1).any():
            raise ValueError(
                f"grouped_geo_mean: {value_col} must be integers >= 1")
        lm = np.floor(np.log(vi.astype(np.float64)) * 1e6 + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({
            "g": pd.Series(b[group_col].to_pylist(), dtype="object"),
            "n": np.ones(len(vi), dtype=np.int64), "s": lm})
        out = df.groupby("g", sort=False, as_index=False).sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "s": pa.array(out["s"].to_numpy(np.int64))})

    parts = (ds.select_columns([group_col, value_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if parts.empty:
        raise ValueError("grouped_geo_mean: empty input")
    agg = parts.groupby("g", as_index=False).sum().sort_values("g") \
        .reset_index(drop=True)
    n = agg["n"].to_numpy(np.int64)
    s = agg["s"].to_numpy(np.int64)
    gm = _r6(np.exp(s.astype(np.float64) / (n.astype(np.float64) * 1e6)))
    return pa.table({
        group_col: pa.array(agg["g"].to_numpy(object), pa.string()),
        "n": pa.array(n, pa.int64()),
        "log_sum_micro": pa.array(s, pa.int64()),
        "geo_mean": pa.array(gm, pa.float64())})


def seasonal_anomalies(ds, group_col: str, ts_col: str, value_col: str,
                       scale: int = 100, z_cut: float = 3.0,
                       num_buckets: int = 64) -> "object":
    """Seasonal robust-baseline anomaly screen: for every (group,
    hour-of-day) cell, the exact interpolating median and MAD of the
    scaled integer value plus the count of robust outliers
    (|x − median| > z_cut · MAD) — the monitoring rule that catches
    "3am traffic looks like 3pm" drifts a global baseline hides.

    Plan: each block reduces to (group, hour, value)-count partials
    (bounded by the integer value domain — the robust_profile
    contract); ONE coarse shuffle on ``hash(group, hour)`` co-locates
    each cell's histogram, and the per-bucket fold computes median,
    MAD and the outlier count from the SAME histogram — no second
    data pass, nothing on the driver. Medians land on halves, MADs on
    quarters (exact binary fractions), and the outlier comparison uses
    those unrounded values, so a DuckDB median()/mad() replay matches
    bit-for-bit. Output: one row per (group, hour)."""
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = b[value_col].to_numpy(zero_copy_only=False)
        cents = np.floor(v * scale + 0.5).astype(np.int64)
        hour = pc.hour(b[ts_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = pd.DataFrame({
            "g": pd.Series(b[group_col].to_pylist(), dtype="object"),
            "h": hour, "v": cents, "n": np.ones(len(cents), np.int64)})
        out = df.groupby(["g", "h", "v"], sort=False, as_index=False)[
            "n"].sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "h": pa.array(out["h"].to_numpy(np.int64)),
            "v": pa.array(out["v"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__sb")
        rows = []
        hist = df.groupby(["g", "h", "v"], as_index=False)["n"].sum()
        for (g, h), sub in hist.groupby(["g", "h"], sort=True):
            v = sub["v"].to_numpy(np.int64).astype(np.float64)
            c = sub["n"].to_numpy(np.int64)
            med = _weighted_median(v, c)
            dev = np.abs(v - med)  # halves — exact
            mad = _weighted_median(dev, c)
            out = int(c[dev > z_cut * mad].sum())
            rows.append((g, int(h), int(c.sum()), med, mad, out))
        return pd.DataFrame({
            group_col: pd.Series([r[0] for r in rows], dtype="object"),
            "hour": pd.Series([r[1] for r in rows], dtype="int64"),
            "n": pd.Series([r[2] for r in rows], dtype="int64"),
            "median": pd.Series([r[3] for r in rows], dtype="float64"),
            "mad": pd.Series([r[4] for r in rows], dtype="float64"),
            "n_outliers": pd.Series([r[5] for r in rows], dtype="int64")})

    return (ds.select_columns([group_col, ts_col, value_col])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(
                lambda b: append_coarse_bucket(b, ["g", "h"], num_buckets,
                                               "__sb"),
                batch_format="pyarrow")
            .groupby("__sb")
            .map_groups(fold, batch_format="pandas"))


def changepoint(ds, key_col: str, order_col: str, value_col: str,
                num_buckets: int = 256) -> "object":
    """Exact per-key CUSUM change-point: over the key's series summed
    per ``order_col`` step, the step ``k`` maximizing
    ``|n·S_k − k·S_n|`` (the scaled cumulative-deviation statistic of
    Pettitt-family tests; S = prefix sums of the integer value) with a
    smallest-order tie-break — "when did this supplier's revenue level
    shift". All arithmetic is int64 (exact, order-free; the caller
    bounds n·|S_n| < 2^63 — step-count × total magnitude), so the SQL
    window replay matches bit-for-bit.

    Plan: per-block (key, order)-sum partials (raw rows never shuffle)
    → ONE coarse shuffle on ``hash(key)`` → the per-bucket fold merges
    duplicate (key, order) partials, sorts, and takes the vectorized
    grouped cumsum + argmax. Emits ONE row per key: (key, cp_order,
    stat, n_steps)."""
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": b[key_col].to_numpy(zero_copy_only=False).astype(np.int64),
            "o": b[order_col].to_numpy(zero_copy_only=False)
                 .astype(np.int64),
            "c": b[value_col].to_numpy(zero_copy_only=False)
                 .astype(np.int64)})
        out = df.groupby(["k", "o"], sort=False, as_index=False)["c"].sum()
        return pa.table({
            "k": pa.array(out["k"].to_numpy(np.int64)),
            "o": pa.array(out["o"].to_numpy(np.int64)),
            "c": pa.array(out["c"].to_numpy(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__cb")
        if df.empty:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="int64"),
                "cp_order": pd.Series([], dtype="int64"),
                "stat": pd.Series([], dtype="int64"),
                "n_steps": pd.Series([], dtype="int64")})
        agg = df.groupby(["k", "o"], as_index=False)["c"].sum() \
            .sort_values(["k", "o"], kind="mergesort") \
            .reset_index(drop=True)
        g = agg.groupby("k", sort=False)
        sk = g["c"].cumsum().to_numpy(np.int64)
        rn = (g.cumcount() + 1).to_numpy(np.int64)
        n = g["c"].transform("size").to_numpy(np.int64)
        sn = g["c"].transform("sum").to_numpy(np.int64)
        stat = np.abs(n * sk - rn * sn)
        agg["stat"] = stat
        agg["n"] = n
        # argmax with smallest-order tie-break: orders are already
        # ascending per key, so a stable max-first sort suffices
        best = agg.sort_values(["k", "stat", "o"],
                               ascending=[True, False, True],
                               kind="mergesort").drop_duplicates("k")
        return pd.DataFrame({
            key_col: best["k"].to_numpy(np.int64),
            "cp_order": best["o"].to_numpy(np.int64),
            "stat": best["stat"].to_numpy(np.int64),
            "n_steps": best["n"].to_numpy(np.int64)})

    return (ds.select_columns([key_col, order_col, value_col])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(
                lambda b: append_coarse_bucket(b, ["k"], num_buckets, "__cb"),
                batch_format="pyarrow")
            .groupby("__cb")
            .map_groups(fold, batch_format="pandas"))


def dict_compression_profile(ds, columns: list[str],
                             code_bytes: int = 4,
                             num_buckets: int = 64) -> pa.Table:
    """Storage-layout advisor for string columns: for each column the
    exact row count, total value bytes as stored plain, distinct count,
    and the bytes a dictionary encoding would use (each distinct value
    once + a ``code_bytes`` code per row) — the "should this column be
    dict-encoded" decision a 100-TB parquet sink makes per column.
    Lengths are utf8 character counts (== bytes on the ASCII corpus;
    both sides of the oracle measure identically either way).

    Plan: plain totals stream as |columns|-sized per-block partials;
    distinct values from all columns union into ONE (column, value)
    stream that folds under a single coarse ``hash(column, value)``
    shuffle — each value's global dedup resolves in exactly one bucket
    and buckets emit only per-column sums, so the vocabulary never
    gathers. Returns one row per column with ``savings_ratio`` =
    round6(1 − dict/plain)."""
    import pyarrow.compute as pc

    from ..engine.hashing import append_coarse_bucket

    def plain_partial(b: pa.Table) -> pa.Table:
        names, ns, bs = [], [], []
        for c in columns:
            ln = pc.utf8_length(b[c]).to_numpy(zero_copy_only=False)
            names.append(c)
            ns.append(b.num_rows)
            bs.append(int(ln.sum()))
        return pa.table({
            "c": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "plain": pa.array(bs, pa.int64())})

    def distinct_partial(b: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in columns:
            u = pc.unique(b[c].combine_chunks())
            cols.extend([c] * len(u))
            vals.extend(u.to_pylist())
        t = pa.table({"c": pa.array(cols, pa.string()),
                      "v": pa.array(vals, pa.string())})
        return append_coarse_bucket(t, ["c", "v"], num_buckets, "__xb")

    def distinct_fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__xb").drop_duplicates(["c", "v"])
        ln = df["v"].str.len().to_numpy(np.int64)
        out = pd.DataFrame({"c": df["c"].to_numpy(object),
                            "nd": np.ones(len(df), np.int64),
                            "db": ln}) \
            .groupby("c", as_index=False).sum()
        return out

    plain = ds.select_columns(columns) \
        .map_batches(plain_partial, batch_format="pyarrow").to_pandas() \
        .groupby("c", as_index=False).sum()
    dist = (ds.select_columns(columns)
            .map_batches(distinct_partial, batch_format="pyarrow")
            .groupby("__xb")
            .map_groups(distinct_fold, batch_format="pandas")
            .to_pandas().groupby("c", as_index=False).sum())
    m = plain.merge(dist, on="c").sort_values("c").reset_index(drop=True)
    n = m["n"].to_numpy(np.int64)
    pl = m["plain"].to_numpy(np.int64)
    dict_b = m["db"].to_numpy(np.int64) + code_bytes * n
    ratio = np.where(pl > 0, 1.0 - dict_b / np.maximum(pl, 1), 0.0)
    return pa.table({
        "column_name": pa.array(m["c"].to_numpy(object), pa.string()),
        "n": pa.array(n, pa.int64()),
        "plain_bytes": pa.array(pl, pa.int64()),
        "n_distinct": pa.array(m["nd"].to_numpy(np.int64)),
        "dict_bytes": pa.array(dict_b, pa.int64()),
        "savings_ratio": pa.array(_r6(ratio), pa.float64())})


def k_anonymity_audit(ds, quasi_cols: list[str], k: int = 5,
                      num_buckets: int = 64) -> pa.Table:
    """Privacy-release audit: group the table by its quasi-identifier
    columns and report how much of it fails k-anonymity — rows whose
    quasi-identifier combination is shared by fewer than ``k`` rows are
    re-identifiable and must be generalized or suppressed before
    release (Sweeney 2002). One narrow counting pass: per-block
    (quasi-combo, count) partials, ONE coarse ``hash(combo)`` fold, and
    a |combos|-bounded summary — (n_rows, n_groups, n_small_groups,
    n_risk_rows, min_group_size) — gathers on the driver."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(quasi_cols).to_pandas()
        df["n"] = np.ones(len(df), np.int64)
        out = df.groupby(quasi_cols, sort=False, as_index=False)["n"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns="__kb").groupby(
            quasi_cols, as_index=False)["n"].sum()
        return pd.DataFrame({
            "n_rows": [int(out["n"].sum())],
            "n_groups": [len(out)],
            "n_small_groups": [int((out["n"] < k).sum())],
            "n_risk_rows": [int(out.loc[out["n"] < k, "n"].sum())],
            "min_group_size": [int(out["n"].min())]})

    parts = (ds.select_columns(quasi_cols)
             .map_batches(partial, batch_format="pyarrow")
             .map_batches(lambda b: append_coarse_bucket(
                 b, quasi_cols, num_buckets, "__kb"),
                 batch_format="pyarrow")
             .groupby("__kb")
             .map_groups(fold, batch_format="pandas")
             .to_pandas())
    return pa.table({
        "n_rows": pa.array([int(parts["n_rows"].sum())], pa.int64()),
        "n_groups": pa.array([int(parts["n_groups"].sum())], pa.int64()),
        "n_small_groups": pa.array([int(parts["n_small_groups"].sum())],
                                   pa.int64()),
        "n_risk_rows": pa.array([int(parts["n_risk_rows"].sum())],
                                pa.int64()),
        "min_group_size": pa.array([int(parts["min_group_size"].min())],
                                   pa.int64())})


def chi2_independence(ds, a_col: str, b_col: str,
                      num_buckets: int = 64) -> pa.Table:
    """Pearson chi-squared test of independence between two bounded
    categorical columns — the "is language associated with source"
    screen behind stratification decisions. The statistic is EXACT:
    each grid cell's term ``(n·o − r·c)² / (n·r·c)`` is a ratio of
    integers, rounded half-away to INTEGER micro-units in pure integer
    arithmetic (``(num·2e6 + den) // (2·den)``) and summed as int64 —
    order-free, and a DuckDB HUGEINT replay matches term-for-term
    (the PSI/entropy micro-unit family). Zero cells are included (their
    expected count is positive). Returns one row: (n_rows, n_a, n_b,
    dof, chi2_micro).

    Plan: per-block (a, b) count partials (bounded by the category
    grid), ONE coarse ``hash(a, b)`` fold, and a grid-sized driver
    finalize."""
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "a": pd.Series(b[a_col].to_pylist(), dtype="object"),
            "b": pd.Series(b[b_col].to_pylist(), dtype="object"),
            "n": np.ones(b.num_rows, np.int64)})
        out = df.groupby(["a", "b"], sort=False, as_index=False)["n"].sum()
        return pa.table({
            "a": pa.array(out["a"].to_numpy(object), pa.string()),
            "b": pa.array(out["b"].to_numpy(object), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns="__qb").groupby(
            ["a", "b"], as_index=False)["n"].sum()

    cells = (ds.select_columns([a_col, b_col])
             .map_batches(partial, batch_format="pyarrow")
             .map_batches(lambda b: append_coarse_bucket(
                 b, ["a", "b"], num_buckets, "__qb"),
                 batch_format="pyarrow")
             .groupby("__qb")
             .map_groups(fold, batch_format="pandas")
             .to_pandas())
    if cells.empty:
        raise ValueError("chi2_independence: empty input")
    cells = cells.groupby(["a", "b"], as_index=False)["n"].sum()
    rm = cells.groupby("a")["n"].sum().to_dict()
    cm = cells.groupby("b")["n"].sum().to_dict()
    obs = {(r["a"], r["b"]): int(r["n"]) for _, r in cells.iterrows()}
    n = int(cells["n"].sum())
    chi_micro = 0
    for a, r in rm.items():
        for b, c in cm.items():
            o = obs.get((a, b), 0)
            num = (n * o - int(r) * int(c)) ** 2
            den = n * int(r) * int(c)
            chi_micro += (num * 2_000_000 + den) // (2 * den)
    dof = (len(rm) - 1) * (len(cm) - 1)
    return pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "n_a": pa.array([len(rm)], pa.int64()),
        "n_b": pa.array([len(cm)], pa.int64()),
        "dof": pa.array([dof], pa.int64()),
        "chi2_micro": pa.array([int(chi_micro)], pa.int64())})


def subsample_ci(ds, id_col: str, value_col: str, n_resamples: int = 32,
                 q_lo: float = 0.1, q_hi: float = 0.9) -> pa.Table:
    """Deterministic subsampling confidence interval for the mean — the
    uncertainty band a quality dashboard needs WITHOUT an RNG state:
    resample ``b`` keeps row ``i`` iff ``seed_key32(id·B + b)`` is even
    (half-samples; the hash argument makes membership stateless and
    shard-independent, the negative-sampling property), each
    half-sample's mean is an exact integer ratio, and the band is the
    discrete-quantile rule (rank = ceil(q·B)) over the B means — every
    step replays in DuckDB integer arithmetic + round6, so the oracle
    is bit-exact. One streaming pass: each block emits B (resample,
    n, sum) partials; the driver folds B rows.

    Returns one row: (n_rows, mean, ci_lo, ci_hi) — mean over all rows,
    band over resample means, all round6 doubles."""
    import math

    from ..ops.cluster import seed_key32

    if n_resamples < 2:
        raise ValueError("n_resamples must be >= 2")
    if not (0.0 < q_lo < q_hi < 1.0):
        raise ValueError("need 0 < q_lo < q_hi < 1")
    B = n_resamples

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bs = np.arange(B, dtype=np.int64)
        keep = seed_key32((ids[:, None] * B + bs[None, :]).ravel()) \
            .reshape(len(ids), B) % 2 == 0
        return pa.table({
            "b": pa.array(bs),
            "n": pa.array(keep.sum(axis=0).astype(np.int64)),
            "s": pa.array((v[:, None] * keep).sum(axis=0)
                          .astype(np.int64)),
            "tn": pa.array(np.full(B, len(ids), np.int64)),
            "ts": pa.array(np.full(B, int(v.sum()), np.int64))})

    parts = (ds.select_columns([id_col, value_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if parts.empty:
        raise ValueError("subsample_ci: empty input")
    agg = parts.groupby("b", as_index=False).sum().sort_values("b")
    means = np.sort(_r6(agg["s"].to_numpy(np.int64)
                        / np.maximum(agg["n"].to_numpy(np.int64), 1)))
    total_n = int(agg["tn"].iloc[0])  # per-block totals sum across blocks
    total_s = int(agg["ts"].iloc[0])
    lo = means[max(math.ceil(q_lo * B), 1) - 1]
    hi = means[max(math.ceil(q_hi * B), 1) - 1]
    mean = float(_r6(np.array([total_s / max(total_n, 1)]))[0])
    return pa.table({
        "n_rows": pa.array([total_n], pa.int64()),
        "mean": pa.array([mean], pa.float64()),
        "ci_lo": pa.array([float(lo)], pa.float64()),
        "ci_hi": pa.array([float(hi)], pa.float64())})


def gini_by_group(ds, group_col: str, value_col: str,
                  num_buckets: int = 64) -> pa.Table:
    """Exact Gini coefficient of a non-negative bounded-integer column
    per group — the concentration diagnostic ("is this source's doc
    length mass in a few giants") a mixing policy reads next to means.
    One counting pass: per-block (group, value) histogram partials,
    ONE coarse ``hash(group)`` fold, and inside the fold the rank sums
    come from cumulative counts over the sorted histogram —
    ``Σ rank·x`` for a tie block of count c after p predecessors is
    ``x·(c·p + c(c+1)/2)``, all Python big-ints (n²·v exceeds int64 at
    corpus scale) — so ``G = (2·S1 − (n+1)·Σx) / (n·Σx)`` is an exact
    integer ratio rounded once at round6; the DuckDB HUGEINT window
    replay matches bit-for-bit."""
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi, v.astype(np.float64)) or (vi < 0).any():
            raise ValueError(
                f"gini_by_group: {value_col} must be non-negative "
                "integers")
        df = pd.DataFrame({
            "g": pd.Series(b[group_col].to_pylist(), dtype="object"),
            "v": vi, "c": np.ones(len(vi), np.int64)})
        out = df.groupby(["g", "v"], sort=False, as_index=False)["c"].sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "v": pa.array(out["v"].to_numpy(np.int64)),
            "c": pa.array(out["c"].to_numpy(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        hist = df.drop(columns="__gb").groupby(
            ["g", "v"], as_index=False)["c"].sum()
        rows = []
        for g, sub in hist.groupby("g", sort=True):
            sub = sub.sort_values("v")
            v = [int(x) for x in sub["v"]]
            c = [int(x) for x in sub["c"]]
            n = sum(c)
            sv = sum(a * b for a, b in zip(v, c))
            if sv == 0:
                rows.append((g, n, 0.0))
                continue
            s1, p = 0, 0
            for vi_, ci in zip(v, c):
                s1 += vi_ * (ci * p + ci * (ci + 1) // 2)
                p += ci
            gini = float(2 * s1 - (n + 1) * sv) / float(n * sv)
            rows.append((g, n, float(
                np.sign(gini) * np.floor(abs(gini) * 1e6 + 0.5) / 1e6)))
        return pd.DataFrame({
            group_col: pd.Series([r[0] for r in rows], dtype="object"),
            "n": pd.Series([r[1] for r in rows], dtype="int64"),
            "gini": pd.Series([r[2] for r in rows], dtype="float64")})

    return (ds.select_columns([group_col, value_col])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(lambda b: append_coarse_bucket(
                b, ["g"], num_buckets, "__gb"),
                batch_format="pyarrow")
            .groupby("__gb")
            .map_groups(fold, batch_format="pandas"))


def score_auc(ds, score_col: str, label_col: str, positive: str,
              scale: int = 100) -> pa.Table:
    """Exact ROC AUC of a numeric score separating ``label == positive``
    rows from the rest — the Mann–Whitney U statistic with the standard
    mid-rank tie correction, computed from ONE counting pass (the
    model-eval primitive a 100-TB labelled corpus needs: no global sort,
    no per-row ranks).

    ``score_col`` must be fixed-decimal with ≤ log10(scale) decimals
    (validated per block): each block reduces to ≤ |domain| exact
    (score·scale, n_pos, n_neg) count rows; the driver folds them. With
    cum(v) = rows strictly below v, the positive mid-rank sum doubled is
    R₂ = Σ_v p(v)·(2·cum(v) + c(v) + 1) — an integer — and

        AUC = (R₂ − n₁(n₁+1)) / (2·n₁·n₀)

    is an exact integer ratio, rounded half-away-from-zero to 6 dp in
    pure integer arithmetic (``(num·1e6·2 + den) // (2·den)``) so DuckDB
    replays it bit-for-bit in HUGEINT. Ranks fold as Python big-ints —
    R₂ ~ n² overflows int64 long before 100 TB. Returns one row
    (n_pos, n_neg, auc)."""

    def partial(b: pa.Table) -> pa.Table:
        s = b[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        si = np.floor(s * scale + 0.5).astype(np.int64)
        if not np.allclose(si / scale, s, rtol=0, atol=1e-9):
            raise ValueError(
                f"score_auc: {score_col} must be fixed-decimal/{scale}")
        y = (np.asarray(b[label_col].to_numpy(zero_copy_only=False),
                        dtype=object) == positive)
        df = pd.DataFrame({"v": si, "p": y.astype(np.int64),
                           "c": np.ones(len(si), dtype=np.int64)})
        out = df.groupby("v", sort=False, as_index=False).sum()
        return pa.table({"v": pa.array(out["v"].to_numpy(np.int64)),
                         "p": pa.array(out["p"].to_numpy(np.int64)),
                         "c": pa.array(out["c"].to_numpy(np.int64))})

    parts = (ds.select_columns([score_col, label_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    hist = parts.groupby("v", as_index=False)[["p", "c"]].sum()
    hist = hist.sort_values("v")
    p = [int(x) for x in hist["p"]]
    c = [int(x) for x in hist["c"]]
    n1 = sum(p)
    n = sum(c)
    n0 = n - n1
    if n1 == 0 or n0 == 0:
        raise ValueError("score_auc: need both classes present")
    r2, cum = 0, 0
    for pi, ci in zip(p, c):
        r2 += pi * (2 * cum + ci + 1)
        cum += ci
    num = r2 - n1 * (n1 + 1)
    den = 2 * n1 * n0
    micro = (num * 2_000_000 + den) // (2 * den)
    return pa.table({"n_pos": pa.array([n1], pa.int64()),
                     "n_neg": pa.array([n0], pa.int64()),
                     "auc": pa.array([micro / 1e6], pa.float64())})


def winsorized_mean(ds, group_col: str, value_col: str,
                    alpha: float = 0.05) -> pa.Table:
    """Exact per-group α-winsorized mean of an integer-valued column
    from ONE counting pass: clip every observation into the discrete
    [q_α, q_{1−α}] quantile bounds (the ``ceil(q·n)`` order statistic,
    the repo-wide quantile_disc rule) and average the exact clipped
    integer sum — the tail-robust location estimate that, unlike the
    trimmed mean, keeps n constant. Returns
    (group, n, lo, hi, win_mean round6) ordered by group; the SQL
    replay is quantile_disc bounds + avg(greatest(lo, least(v, hi)))."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi, v.astype(np.float64)):
            raise ValueError(
                f"winsorized_mean: {value_col} must be integer-valued")
        df = pd.DataFrame({
            "g": pd.Series(b[group_col].to_pylist(), dtype="object"),
            "v": vi, "n": np.ones(len(vi), dtype=np.int64)})
        out = df.groupby(["g", "v"], sort=False, as_index=False)["n"].sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "v": pa.array(out["v"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    parts = (ds.select_columns([group_col, value_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    hist = parts.groupby(["g", "v"], as_index=False)["n"].sum()
    rows = []
    for g, sub in hist.groupby("g", sort=True):
        sub = sub.sort_values("v")
        v = sub["v"].to_numpy(np.int64)
        c = sub["n"].to_numpy(np.int64)
        n = int(c.sum())
        lo, hi = _disc_quantile(v.astype(np.float64), c,
                                [alpha, 1.0 - alpha])
        clipped = np.clip(v.astype(np.float64), lo, hi)
        s = _chunked_int_sum((clipped.astype(np.int64) * c))
        rows.append((g, n, lo, hi, s / np.float64(n)))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "lo": pa.array([r[2] for r in rows], pa.float64()),
        "hi": pa.array([r[3] for r in rows], pa.float64()),
        "win_mean": pa.array(_r6(np.array([r[4] for r in rows])),
                             pa.float64()),
    })


def wasserstein_drift(ds, group_col: str, value_col: str) -> pa.Table:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between each
    group's integer value distribution and the REST of the corpus —
    the drift statistic that, unlike KS (``ks_drift``), weighs HOW FAR
    mass moved, not just the worst CDF gap.

    One counting pass: per-block (group, value) exact counts; the
    driver folds the ≤ |groups|×|domain| histogram. Over the sorted
    union support, W1 = Σ_i (v_{i+1} − v_i) · |F_A(v_i) − F_B(v_i)|
    = Σ gap·|cumA·n_B − cumB·n_A| / (n_A·n_B) — an exact integer
    ratio folded in Python big-ints (cum·n ~ n² overflows int64) and
    rounded half-away to 6 dp in integer arithmetic, so DuckDB replays
    bit-for-bit in HUGEINT. Returns (group, n, w1) ordered by group."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi, v.astype(np.float64)):
            raise ValueError(
                f"wasserstein_drift: {value_col} must be integer-valued")
        df = pd.DataFrame({
            "g": pd.Series(b[group_col].to_pylist(), dtype="object"),
            "v": vi, "n": np.ones(len(vi), dtype=np.int64)})
        out = df.groupby(["g", "v"], sort=False, as_index=False)["n"].sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "v": pa.array(out["v"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    parts = (ds.select_columns([group_col, value_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    hist = parts.groupby(["g", "v"], as_index=False)["n"].sum()
    total = hist.groupby("v", as_index=False)["n"].sum()
    tot_map = dict(zip((int(x) for x in total["v"]),
                       (int(x) for x in total["n"])))
    n_all = sum(tot_map.values())
    support = sorted(tot_map)
    rows = []
    for g, sub in hist.groupby("g", sort=True):
        cnt = dict(zip((int(x) for x in sub["v"]),
                       (int(x) for x in sub["n"])))
        na = sum(cnt.values())
        nb = n_all - na
        if nb == 0:
            raise ValueError("wasserstein_drift: single-group input")
        num, cuma, cumb = 0, 0, 0
        for i, v in enumerate(support[:-1]):
            ca = cnt.get(v, 0)
            cuma += ca
            cumb += tot_map[v] - ca
            num += (support[i + 1] - v) * abs(cuma * nb - cumb * na)
        den = na * nb
        micro = (num * 2_000_000 + den) // (2 * den)
        rows.append((g, na, micro / 1e6))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "w1": pa.array([r[2] for r in rows], pa.float64()),
    })


def lag_correlation(ds, ts_col: str, type_col: str, type_x: str,
                    type_y: str, hour_us: int = 3_600_000_000,
                    max_lag: int = 12) -> pa.Table:
    """Cross-correlation by lag between the hourly count series of two
    event types (does X lead Y?): for each lag L ∈ [0, max_lag], the
    Pearson r between x[h] and y[h+L] over the zero-filled contiguous
    hour range — the lead/lag diagnostic behind alerting rules and
    feature pipelines.

    One counting pass reduces the corpus to ≤ |hours|×2 exact integer
    counts (per-block partials, driver fold — the hour range is
    time-bounded, never event-bounded); every per-lag sum (Σx, Σy,
    Σx², Σy², Σxy, n) is an exact int64, and r is ONE double
    expression over those integers rounded half-away to 6 dp — DuckDB
    evaluates the identical expression shape on the identical integers,
    so the replay is bit-exact (the embedding_quantization precedent).
    Zero variance on either side yields r = 0.0 by definition.
    Returns (lag, n, r) for all lags, ordered by lag."""

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        h = ts.to_numpy(zero_copy_only=False) // hour_us
        ty = np.asarray(b[type_col].to_numpy(zero_copy_only=False),
                        dtype=object)
        df = pd.DataFrame({
            "h": h,
            "x": (ty == type_x).astype(np.int64),
            "y": (ty == type_y).astype(np.int64)})
        out = df.groupby("h", sort=False, as_index=False).sum()
        return pa.table({"h": pa.array(out["h"].to_numpy(np.int64)),
                         "x": pa.array(out["x"].to_numpy(np.int64)),
                         "y": pa.array(out["y"].to_numpy(np.int64))})

    parts = (ds.select_columns([ts_col, type_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    hist = parts.groupby("h", as_index=False)[["x", "y"]].sum()
    h0, h1 = int(hist["h"].min()), int(hist["h"].max())
    nh = h1 - h0 + 1
    x = np.zeros(nh, dtype=np.int64)
    y = np.zeros(nh, dtype=np.int64)
    idx = hist["h"].to_numpy(np.int64) - h0
    x[idx] = hist["x"].to_numpy(np.int64)
    y[idx] = hist["y"].to_numpy(np.int64)
    rows = []
    for lag in range(0, max_lag + 1):
        xa, yb = x[:nh - lag], y[lag:]
        n = int(len(xa))
        sx, sy = int(xa.sum()), int(yb.sum())
        sxx = _chunked_int_sum(xa * xa)
        syy = _chunked_int_sum(yb * yb)
        sxy = _chunked_int_sum(xa * yb)
        vx = np.float64(n) * np.float64(sxx) - np.float64(sx) ** 2
        vy = np.float64(n) * np.float64(syy) - np.float64(sy) ** 2
        if vx <= 0 or vy <= 0:
            r = 0.0
        else:
            r = float((np.float64(n) * np.float64(sxy)
                       - np.float64(sx) * np.float64(sy))
                      / np.sqrt(vx * vy))
        rows.append((lag, n, float(
            np.sign(r) * np.floor(abs(r) * 1e6 + 0.5) / 1e6)))
    return pa.table({
        "lag": pa.array([r[0] for r in rows], pa.int64()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "r": pa.array([r[2] for r in rows], pa.float64())})


def group_jsd(ds, group_col: str, cat_col: str) -> pa.Table:
    """Jensen–Shannon divergence (nats) between each group's categorical
    distribution and the REST of the corpus — the bounded, symmetric
    drift score (0 = identical mix, ln 2 = disjoint support) used to
    rank sources by how unusual their composition is.

    One counting pass: per-block (group, category) exact counts; the
    driver folds the ≤ |groups|×|categories| histogram. Each (group,
    category) contributes ½·(aᵢ/n_A)·ln(pᵢ/mᵢ) + ½·(bᵢ/n_B)·ln(qᵢ/mᵢ);
    every contribution is ONE double expression over four exact
    integers (aᵢ, bᵢ, n_A, n_B), rounded half-away to integer
    MICRO-NATS per term and summed as int64 — order-free, and DuckDB
    replays the identical expression shape bit-for-bit. Returns
    (group, n, jsd) ordered by group."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": pd.Series(b[group_col].to_pylist(), dtype="object"),
            "c": pd.Series(b[cat_col].to_pylist(), dtype="object"),
            "n": np.ones(b.num_rows, dtype=np.int64)})
        out = df.groupby(["g", "c"], sort=False, as_index=False)["n"].sum()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "c": pa.array(out["c"].to_numpy(object), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    parts = (ds.select_columns([group_col, cat_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    hist = parts.groupby(["g", "c"], as_index=False)["n"].sum()
    tot = hist.groupby("c")["n"].sum()
    n_all = int(tot.sum())
    rows = []
    for g, sub in hist.groupby("g", sort=True):
        cnt = dict(zip(sub["c"], (int(x) for x in sub["n"])))
        na = sum(cnt.values())
        nb = n_all - na
        if nb == 0:
            raise ValueError("group_jsd: single-group input")
        micro = np.int64(0)
        for c, t in tot.items():
            a = cnt.get(c, 0)
            b_ = int(t) - a
            p = a / np.float64(na)
            q = b_ / np.float64(nb)
            m = (p + q) / np.float64(2.0)
            term = np.float64(0.0)
            if a > 0:
                term += np.float64(0.5) * p * np.log(p / m)
            if b_ > 0:
                term += np.float64(0.5) * q * np.log(q / m)
            micro += np.int64(np.sign(term)
                              * np.floor(abs(term) * 1e6 + 0.5))
        rows.append((g, na, int(micro) / 1e6))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "jsd": pa.array([r[2] for r in rows], pa.float64())})


def survival_curve(ds, key_col: str, ts_col: str,
                   censor_days: int = 7,
                   day_us: int = 86_400_000_000) -> pa.Table:
    """Kaplan–Meier survival estimate over key lifetimes with
    right-censoring — the churn/retention curve: a key's lifetime is
    (last − first event) in whole days; keys whose last event falls
    within ``censor_days`` of the corpus end are CENSORED (still
    alive), everyone else' lifetime ends in an observed churn event.

    At each distinct churn time t: n_risk = keys with lifetime ≥ t,
    d = churn events at t, and the survival product steps by
    (n_risk − d)/n_risk. The product runs in INTEGER micro-units with
    half-away rounding each step — km_i = (km_{i−1}·(n−d) + n//2) // n
    — so it is deterministic and a recursive-CTE BIGINT replay matches
    bit-for-bit (a float cumprod would be order-fragile and
    SQL-inexpressible without exp/ln slack).

    Plan: per-block (key, min, max) partials → ONE coarse hash(key)
    fold to exact per-key intervals → lifetime-day COUNT partials
    (domain = corpus span in days, bounded) → driver folds the
    histogram and walks the ≤ |days| event points. Returns
    (t_days, n_risk, n_churn, survival) ordered by t_days."""
    import pyarrow.compute as pc

    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        t = ts.to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "k": b[key_col].to_numpy(zero_copy_only=False), "t": t})
        out = df.groupby("k", sort=False, as_index=False).agg(
            s=("t", "min"), e=("t", "max"))
        tb = pa.table({"k": pa.array(out["k"].to_numpy(np.int64)),
                       "s": pa.array(out["s"].to_numpy(np.int64)),
                       "e": pa.array(out["e"].to_numpy(np.int64))})
        return append_coarse_bucket(tb, ["k"], 256, "__b")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("k", as_index=False).agg(
            s=("s", "min"), e=("e", "max"))
        return out

    intervals = (ds.select_columns([key_col, ts_col])
                 .map_batches(partial, batch_format="pyarrow")
                 .groupby("__b")
                 .map_groups(lambda df: fold(df.drop(columns="__b")),
                             batch_format="pandas")
                 .materialize())
    end_us = int(intervals.max("e"))
    cutoff = end_us - censor_days * day_us

    def dur_partial(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        e = b["e"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "t": (e - s) // day_us,
            "churn": (e < cutoff).astype(np.int64),
            "n": np.ones(len(s), dtype=np.int64)})
        out = df.groupby(["t", "churn"], sort=False, as_index=False)["n"] \
            .sum()
        return pa.table({
            "t": pa.array(out["t"].to_numpy(np.int64)),
            "churn": pa.array(out["churn"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    hist = intervals.map_batches(
        dur_partial, batch_format="pyarrow").to_pandas()
    hist = hist.groupby(["t", "churn"], as_index=False)["n"].sum()
    all_t = hist.groupby("t")["n"].sum().rename("all")
    d_t = hist.loc[hist["churn"] == 1].groupby("t")["n"].sum().rename("d")
    per_t = pd.concat([all_t, d_t], axis=1).fillna(0).astype(np.int64) \
        .reset_index().sort_values("t")
    total = int(per_t["all"].sum())
    cum_before = per_t["all"].cumsum().shift(1, fill_value=0)
    per_t["n_risk"] = total - cum_before
    pts = per_t[per_t["d"] > 0]
    km = 1_000_000
    rows = []
    for _, r in pts.iterrows():
        nr, d = int(r["n_risk"]), int(r["d"])
        km = (km * (nr - d) + nr // 2) // nr
        rows.append((int(r["t"]), nr, d, km / 1e6))
    return pa.table({
        "t_days": pa.array([r[0] for r in rows], pa.int64()),
        "n_risk": pa.array([r[1] for r in rows], pa.int64()),
        "n_churn": pa.array([r[2] for r in rows], pa.int64()),
        "survival": pa.array([r[3] for r in rows], pa.float64())})


def score_calibration(ds, score_col: str, label_col: str, positive: str,
                      num_bins: int = 10, scale: int = 100) -> pa.Table:
    """Calibration / reliability profile of a numeric score against a
    binary outcome: equal-WIDTH bins over the observed score range
    (the z-order bucketize rule ``(v − lo)·B // (hi − lo + 1)`` —
    integer, replayable), per bin the exact count, positive count,
    positive rate, and mean score — the companion diagnostic to
    :func:`score_auc` (AUC says "ranks well", calibration says "the
    score VALUE means what it claims").

    ONE counting pass (the score_auc partial shape): the driver folds
    the ≤ |domain| (score·scale, n_pos, n) histogram and derives the
    range and every bin aggregate from it. Rates/means round half-away
    (round6). Returns (bin, lo, hi, n, n_pos, pos_rate, mean_score)."""

    def partial(b: pa.Table) -> pa.Table:
        s = b[score_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        si = np.floor(s * scale + 0.5).astype(np.int64)
        if not np.allclose(si / scale, s, rtol=0, atol=1e-9):
            raise ValueError(
                f"score_calibration: {score_col} must be "
                f"fixed-decimal/{scale}")
        y = (np.asarray(b[label_col].to_numpy(zero_copy_only=False),
                        dtype=object) == positive)
        df = pd.DataFrame({"v": si, "p": y.astype(np.int64),
                           "c": np.ones(len(si), dtype=np.int64)})
        out = df.groupby("v", sort=False, as_index=False).sum()
        return pa.table({"v": pa.array(out["v"].to_numpy(np.int64)),
                         "p": pa.array(out["p"].to_numpy(np.int64)),
                         "c": pa.array(out["c"].to_numpy(np.int64))})

    parts = (ds.select_columns([score_col, label_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    hist = parts.groupby("v", as_index=False)[["p", "c"]].sum()
    v = hist["v"].to_numpy(np.int64)
    lo, hi = int(v.min()), int(v.max())
    bins = (v - lo) * num_bins // (hi - lo + 1)
    hist["bin"] = bins
    hist["sv"] = hist["v"] * hist["c"]
    agg = hist.groupby("bin", as_index=False).agg(
        n=("c", "sum"), n_pos=("p", "sum"), sv=("sv", "sum"))
    agg = agg.sort_values("bin")
    rate = agg["n_pos"].to_numpy(np.float64) / agg["n"].to_numpy(np.float64)
    mean = agg["sv"].to_numpy(np.float64) \
        / (scale * agg["n"].to_numpy(np.float64))
    return pa.table({
        "bin": pa.array(agg["bin"].to_numpy(np.int64)),
        "n": pa.array(agg["n"].to_numpy(np.int64)),
        "n_pos": pa.array(agg["n_pos"].to_numpy(np.int64)),
        "pos_rate": pa.array(_r6(rate), pa.float64()),
        "mean_score": pa.array(_r6(mean), pa.float64())})


def target_encoding(ds, cat_col: str, y_col: str, m: int = 20,
                    y_scale: int = 100) -> pa.Table:
    """Smoothed + leave-one-out target encoding per category — the
    classic categorical-feature preprocessing step (mean target with a
    prior of weight ``m`` pulled toward the global mean; the LOO
    variant each ROW would actually receive removes its own target so
    the encoding never leaks the label it encodes).

    EXACT: targets become integer units (floor(|y|·scale + 0.5), the
    nation_revenue cents rule), per-block partials are narrow
    (category, n, sum, min, max) rows, and the driver evaluates every
    encoding as ONE integer ratio micro-rounded half-away
    ((num·2e6 + den) // (2·den) — the lang_source_chi2 recipe) in
    Python big-ints, so no row count or magnitude overflows. LOO mean/
    min/max are closed forms of the same sums (Σᵢ(S−yᵢ+mP)/(n−1+m)
    telescopes), so one counting pass yields the full audit. All six
    columns replay in DuckDB HUGEINT arithmetic. Categories must be
    taxonomy-bounded; rows never are."""
    if m < 1:
        raise ValueError("target_encoding: prior weight m must be >= 1")

    def partial(b: pa.Table) -> pa.Table:
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        yi = (np.sign(y) * np.floor(np.abs(y) * y_scale + 0.5)) \
            .astype(np.int64)
        g = pd.Series(b[cat_col].to_pylist(), dtype="object")
        df = pd.DataFrame({"g": g, "y": yi})
        out = df.groupby("g", sort=False)["y"] \
            .agg(n="size", s="sum", mn="min", mx="max").reset_index()
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "s": pa.array(out["s"].astype("int64").to_numpy()),
            "mn": pa.array(out["mn"].astype("int64").to_numpy()),
            "mx": pa.array(out["mx"].astype("int64").to_numpy())})

    parts = (ds.select_columns([cat_col, y_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if parts.empty:
        raise ValueError("target_encoding: empty input")
    N = int(parts["n"].sum())
    G = sum(int(v) for v in parts["s"])  # Python-int fold: overflow-proof

    def ratio6(num: int, den: int) -> float:
        # micro-units, half AWAY from zero, exact integer arithmetic
        sgn = -1 if num < 0 else 1
        return sgn * ((abs(num) * 2_000_000 + den) // (2 * den)) / 1e6

    rows = []
    for gv, sub in parts.groupby("g", sort=True):
        n = int(sub["n"].sum())
        s = sum(int(v) for v in sub["s"])
        mn, mx = int(sub["mn"].min()), int(sub["mx"].max())
        den_full = (n + m) * N * y_scale
        den_loo = (n - 1 + m) * N * y_scale
        rows.append((
            gv, n,
            ratio6(s * N + m * G, den_full),
            ratio6(n * (s * N + m * G) - s * N, n * den_loo),
            ratio6((s - mx) * N + m * G, den_loo),
            ratio6((s - mn) * N + m * G, den_loo)))
    return pa.table({
        cat_col: pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "enc": pa.array([r[2] for r in rows], pa.float64()),
        "loo_mean": pa.array([r[3] for r in rows], pa.float64()),
        "loo_min": pa.array([r[4] for r in rows], pa.float64()),
        "loo_max": pa.array([r[5] for r in rows], pa.float64())})


def welch_ttest(ds, group_col: str, y_col: str, group_a, group_b,
                y_scale: int = 100) -> pa.Table:
    """Welch's unequal-variance two-sample t-test between two groups of
    one numeric column — the drift/AB significance screen. One
    distributed counting pass: per-block partials carry n and the Σy /
    Σy² power sums as DECIMAL STRINGS (grouped_linear_fit's
    overflow-proof exchange — y² in scaled units overflows int64 long
    before 100 TB), folded in Python big-ints. The t statistic and
    Welch–Satterthwaite df are then IDENTICAL-SHAPE double expressions
    of the exact integer sums (every operand CAST once, the
    embedding_quantization discipline), so DuckDB replays them
    bit-for-bit at round6."""

    def partial(b: pa.Table) -> pa.Table:
        g = pd.Series(b[group_col].to_pylist(), dtype="object")
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        yi = (np.sign(y) * np.floor(np.abs(y) * y_scale + 0.5)) \
            .astype(np.int64)
        rows = []
        for gv in (group_a, group_b):
            mask = (g == gv).to_numpy()
            ym = yi[mask]
            rows.append((str(gv), len(ym), str(_chunked_int_sum(ym)),
                         str(_chunked_int_sum(ym * ym, chunk=64))))
        out = pd.DataFrame(rows, columns=["g", "n", "s", "s2"])
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = (ds.select_columns([group_col, y_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    stats = {}
    for gv, sub in parts.groupby("g", sort=True):
        stats[gv] = (int(sub["n"].sum()),
                     sum(int(v) for v in sub["s"]),
                     sum(int(v) for v in sub["s2"]))
    (n1, s1, s11) = stats[str(group_a)]
    (n2, s2, s22) = stats[str(group_b)]
    if n1 < 2 or n2 < 2:
        raise ValueError("welch_ttest: both groups need >= 2 rows")
    # identical-shape float evaluation: exact int -> one double CAST
    # per operand, then the same IEEE operation tree as the SQL replay
    m1 = float(s1) / float(n1)
    m2 = float(s2) / float(n2)
    v1 = float(n1 * s11 - s1 * s1) / float(n1 * (n1 - 1))
    v2 = float(n2 * s22 - s2 * s2) / float(n2 * (n2 - 1))
    se1 = v1 / float(n1)
    se2 = v2 / float(n2)
    se = se1 + se2
    t = (m1 - m2) / math.sqrt(se)
    df = (se * se) / (se1 * se1 / float(n1 - 1)
                      + se2 * se2 / float(n2 - 1))
    r6 = lambda x: float(np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5)
                         / 1e6)
    sc = float(y_scale)
    return pa.table({
        "group_a": pa.array([str(group_a)], pa.string()),
        "group_b": pa.array([str(group_b)], pa.string()),
        "n_a": pa.array([n1], pa.int64()),
        "n_b": pa.array([n2], pa.int64()),
        "mean_a": pa.array([r6(m1 / sc)], pa.float64()),
        "mean_b": pa.array([r6(m2 / sc)], pa.float64()),
        "t_stat": pa.array([r6(t)], pa.float64()),
        "welch_df": pa.array([r6(df)], pa.float64())})


def grouped_median_impute(ds, group_col: str, value_col: str,
                          missing_col: str, scale: int = 100,
                          num_buckets: int = 64) -> pa.Table:
    """Group-median missing-value imputation — the standard tabular-ML
    cleaning step, EXACT and distributed: per-group discrete medians
    (quantile_disc rank ceil(n/2)) come from one counting pass over the
    integer-scaled value domain (the ks_drift value-domain-bounded
    contract), and the post-imputation total is pure integer arithmetic
    (observed sum + n_missing · median) — no imputed row ever
    materializes. Returns (group, n_rows, n_imputed, imputed_value,
    total_value) with the two value columns round6 of the same double
    expressions DuckDB replays."""

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c = (np.sign(v) * np.floor(np.abs(v) * scale + 0.5)) \
            .astype(np.int64)
        miss = b[missing_col].to_numpy(zero_copy_only=False) \
            .astype(bool)
        g = pd.Series(b[group_col].to_pylist(), dtype="object")
        obs = pd.DataFrame({"g": g[~miss].to_numpy(object),
                            "c": c[~miss]})
        oc = obs.groupby(["g", "c"], sort=False).size() \
            .reset_index(name="n")
        mc = pd.DataFrame({"g": g[miss].to_numpy(object)}) \
            .groupby("g", sort=False).size().reset_index(name="nm")
        oc["nm"] = np.int64(0)
        if not mc.empty:
            mc["c"] = np.int64(0)
            mc["n"] = np.int64(0)
            oc = pd.concat([oc, mc[["g", "c", "n", "nm"]]],
                           ignore_index=True)
        return pa.table({
            "g": pa.array(oc["g"].to_numpy(object), pa.string()),
            "c": pa.array(oc["c"].to_numpy(np.int64)),
            "n": pa.array(oc["n"].to_numpy(np.int64)),
            "nm": pa.array(oc["nm"].to_numpy(np.int64))})

    parts = _fold_hist_partials(
        ds.select_columns([group_col, value_col, missing_col])
        .map_batches(partial, batch_format="pyarrow"),
        ["g", "c"], ["n", "nm"])
    rows = []
    for gv, sub in parts.groupby("g", sort=True):
        n_miss = int(sub["nm"].sum())
        sub = sub[sub["n"] > 0].sort_values("c")
        n_obs = int(sub["n"].sum())
        if n_obs == 0:
            raise ValueError(
                f"grouped_median_impute: group {gv!r} has no observed "
                "values to impute from")
        cum = sub["n"].cumsum().to_numpy(np.int64)
        rank = (n_obs + 1) // 2  # ceil(0.5·n) == quantile_disc
        med = int(sub["c"].to_numpy(np.int64)[
            np.searchsorted(cum, rank)])
        s_obs = int((sub["c"].to_numpy(np.int64)
                     * sub["n"].to_numpy(np.int64)).sum())
        total = s_obs + n_miss * med
        r6 = lambda x: float(np.sign(x)
                             * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6)
        rows.append((gv, n_obs + n_miss, n_miss,
                     r6(float(med) / float(scale)),
                     r6(float(total) / float(scale))))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "n_imputed": pa.array([r[2] for r in rows], pa.int64()),
        "imputed_value": pa.array([r[3] for r in rows], pa.float64()),
        "total_value": pa.array([r[4] for r in rows], pa.float64())})


def grouped_spearman(ds, group_col: str, x_col: str, y_col: str,
                     x_scale: int = 1, y_scale: int = 1) -> pa.Table:
    """Exact per-group Spearman rank correlation (midranks for ties) —
    the robust monotone-dependence screen Pearson isn't (one outlier
    can't move a rank). EXACT and distributed on BOUNDED integer
    domains (the ks_drift value-domain contract, validated per block):
    one counting pass reduces each block to (group, x, y, n) JOINT
    cells; the driver reconstructs doubled midranks 2R = 2·cum_less +
    count + 1 (always an integer) per margin, folds all rank power
    sums in Python big-ints (midrank products overflow int64 early),
    and evaluates ρ as ONE identical-shape double expression DuckDB
    replays at round6."""

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        xi = (np.sign(x) * np.floor(np.abs(x) * x_scale + 0.5)) \
            .astype(np.int64)
        yi = (np.sign(y) * np.floor(np.abs(y) * y_scale + 0.5)) \
            .astype(np.int64)
        if not np.allclose(xi / x_scale, x, rtol=0, atol=1e-9):
            raise ValueError(f"grouped_spearman: {x_col} carries more "
                             f"precision than x_scale represents")
        if not np.allclose(yi / y_scale, y, rtol=0, atol=1e-9):
            raise ValueError(f"grouped_spearman: {y_col} carries more "
                             f"precision than y_scale represents")
        g = pd.Series(b[group_col].to_pylist(), dtype="object")
        df = pd.DataFrame({"g": g, "x": xi, "y": yi})
        c = df.groupby(["g", "x", "y"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(c, preserve_index=False)

    cells = (ds.select_columns([group_col, x_col, y_col])
             .map_batches(partial, batch_format="pyarrow")
             .to_pandas()
             .groupby(["g", "x", "y"], as_index=False)["n"].sum())
    rows = []
    for gv, sub in cells.groupby("g", sort=True):
        n = int(sub["n"].sum())
        if n < 2:
            raise ValueError(f"grouped_spearman: group {gv!r} needs "
                             ">= 2 rows")

        def doubled_midranks(col: str) -> dict[int, int]:
            m = sub.groupby(col)["n"].sum().sort_index()
            cum = m.cumsum().shift(fill_value=0)
            return {int(v): int(2 * c + k + 1) for v, c, k in
                    zip(m.index, cum, m)}

        rx = doubled_midranks("x")
        ry = doubled_midranks("y")
        sx = sy = sxx = syy = sxy = 0
        for x, y, c in zip(sub["x"], sub["y"], sub["n"]):
            a, b2, ci = rx[int(x)], ry[int(y)], int(c)
            sx += ci * a
            sy += ci * b2
            sxx += ci * a * a
            syy += ci * b2 * b2
            sxy += ci * a * b2
        num = float(n * sxy - sx * sy)
        dx = float(n * sxx - sx * sx)
        dy = float(n * syy - sy * sy)
        rho = num / math.sqrt(dx * dy) if dx > 0 and dy > 0 \
            else float("nan")
        r6 = float(np.sign(rho) * np.floor(np.abs(rho) * 1e6 + 0.5)
                   / 1e6) if rho == rho else float("nan")
        rows.append((gv, n, r6))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "spearman": pa.array([r[2] for r in rows], pa.float64())})


def grouped_kendall(ds, group_col: str, x_col: str, y_col: str,
                    x_scale: int = 1, y_scale: int = 1) -> pa.Table:
    """Exact per-group Kendall τ-b (tie-corrected) — the
    concordant/discordant-pair rank correlation, from the SAME joint
    counting cells :func:`grouped_spearman` uses: C and D are cell-pair
    products over the bounded grid (one numpy broadcast per group,
    |X|·|Y| cells squared — never row pairs), tie terms come from the
    margins, and τ-b = (C − D)/√((T−Tx)(T−Ty)) evaluates as one
    identical-shape double expression DuckDB replays at round6."""

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        xi = (np.sign(x) * np.floor(np.abs(x) * x_scale + 0.5)) \
            .astype(np.int64)
        yi = (np.sign(y) * np.floor(np.abs(y) * y_scale + 0.5)) \
            .astype(np.int64)
        g = pd.Series(b[group_col].to_pylist(), dtype="object")
        c = pd.DataFrame({"g": g, "x": xi, "y": yi}) \
            .groupby(["g", "x", "y"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(c, preserve_index=False)

    cells = (ds.select_columns([group_col, x_col, y_col])
             .map_batches(partial, batch_format="pyarrow")
             .to_pandas()
             .groupby(["g", "x", "y"], as_index=False)["n"].sum())
    rows = []
    for gv, sub in cells.groupby("g", sort=True):
        n = int(sub["n"].sum())
        xv = sub["x"].to_numpy(np.int64)
        yv = sub["y"].to_numpy(np.int64)
        cn = sub["n"].to_numpy(np.int64)
        # cell-pair concordance over the bounded grid (python-int sums:
        # n² terms overflow int64 at corpus row counts)
        gx = xv[:, None] < xv[None, :]
        prod = cn[:, None].astype(object) * cn[None, :].astype(object)
        C = int((prod * (gx & (yv[:, None] < yv[None, :]))).sum())
        D = int((prod * (gx & (yv[:, None] > yv[None, :]))).sum())
        tx = sum(int(c_) * (int(c_) - 1) // 2
                 for c_ in sub.groupby("x")["n"].sum())
        ty = sum(int(c_) * (int(c_) - 1) // 2
                 for c_ in sub.groupby("y")["n"].sum())
        tt = n * (n - 1) // 2
        dx, dy = tt - tx, tt - ty
        tau = float(C - D) / math.sqrt(float(dx) * float(dy)) \
            if dx > 0 and dy > 0 else float("nan")
        r6 = float(np.sign(tau) * np.floor(np.abs(tau) * 1e6 + 0.5)
                   / 1e6) if tau == tau else float("nan")
        rows.append((gv, n, r6))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "kendall_tau": pa.array([r[2] for r in rows], pa.float64())})
