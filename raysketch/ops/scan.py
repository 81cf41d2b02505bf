"""Distributed ordered per-key window functions (the SQL
``SUM(...) OVER (PARTITION BY key ORDER BY ...)`` / ``ROW_NUMBER`` /
``LAG`` family) — streaming-scan semantics the reference's fixed-width
circular buffer cannot express (SURVEY.md §2.4: time_series.c holds one
aggregate per bucket; a running scan needs the full ordered history per
key).

Two physical plans, same result:

- ``route="hash"`` (default): ONE coarse shuffle on ``hash(key) %
  num_buckets`` co-locates each key's rows; the per-bucket fold is fully
  vectorized pandas (mergesort + groupby cumsum/cumcount/diff). Per-KEY
  volume must fit a reduce task — the sessionize contract
  (ops/window.py). Right for many-moderate-keys workloads.
- ``route="sorted"``: the hot-key escape. A global ``Dataset.sort`` on
  ``(key, *order_cols)`` range-partitions the stream; each sorted block
  computes its LOCAL running values plus a tiny per-(block, key) summary
  (rows, last running sum); the driver folds those summaries into
  per-block prefix OFFSETS (key count, sum, previous-row order value at
  each block's start) and a second map adds them. No single task ever
  holds a whole key — a key spanning many blocks costs only its
  one-row-per-block summary on the driver. Shuffle volume is the sort
  itself; the offset table is ``blocks × keys-crossing-a-boundary`` rows.

Emitted columns: the input columns plus ``seq`` (1-based row number per
key), ``running`` (cumulative int64 sum of ``sum_col``) and ``delta``
(difference of ``order_cols[0]`` from the key's previous row; ``-1`` on
each key's first row — the LAG-is-NULL sentinel kept int64-clean).

All scan inputs are int64 (cast up front): integer running sums are
order-free and bit-exact, so both routes and any SQL oracle agree
bit-for-bit (the nation_revenue integer-cents rule, queries.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _schema_anchor(ds, extra_cols):
    """Zero-row block carrying (input schema + extra columns).

    ``extra_cols`` is a list of names (int64 assumed) or (name, type)
    pairs. A Ray groupby over an EMPTY dataset yields no groups and the
    result loses its schema entirely (the round-3 empty-projection
    pitfall); unioning this anchor onto the result keeps the operator's
    output contract — the scan columns exist at zero rows — without
    costing the non-empty path anything."""
    import ray.data as rd

    sch = ds.schema()
    if sch is None:
        return None
    fields = list(zip(sch.names, sch.types)) + [
        c if isinstance(c, tuple) else (c, pa.int64()) for c in extra_cols
    ]
    return rd.from_arrow(pa.table({n: pa.array([], t) for n, t in fields}))


def _fold_frame(
    df: pd.DataFrame, key_col: str, order_cols: list[str], sum_col: str
) -> pd.DataFrame:
    """Vectorized running scan over one co-located, unsorted frame."""
    if df.empty:
        out = df.copy()
        for c in ("seq", "running", "delta"):
            out[c] = pd.Series([], dtype="int64")
        return out
    df = df.sort_values([key_col, *order_cols], kind="mergesort").reset_index(
        drop=True
    )
    g = df.groupby(key_col, sort=False)
    df["seq"] = (g.cumcount() + 1).astype(np.int64)
    df["running"] = g[sum_col].cumsum().astype(np.int64)
    o = df[order_cols[0]].to_numpy(np.int64)
    prev = np.empty(len(df), dtype=np.int64)
    prev[1:] = o[:-1]
    prev[0] = 0
    delta = o - prev
    delta[df["seq"].to_numpy(np.int64) == 1] = -1
    df["delta"] = delta
    return df


def running_scan(
    ds,
    key_col: str,
    order_cols: list[str],
    sum_col: str,
    route: str = "hash",
    num_buckets: int = 256,
):
    """Per-key ordered running aggregates; see module docstring.

    ``order_cols`` must totally order each key's rows (append a unique
    id as tiebreak — equal order values would make running values
    plan-dependent). ``sum_col`` and ``order_cols`` must be integral.
    """
    if route == "hash":
        return _running_hash(ds, key_col, order_cols, sum_col, num_buckets)
    if route == "sorted":
        return _running_sorted(ds, key_col, order_cols, sum_col)
    raise ValueError(f"unknown route {route!r}")


def rolling_scan(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window_rows: int,
    num_buckets: int = 256,
):
    """Per-key ROWS-frame rolling aggregates (the SQL ``... OVER
    (PARTITION BY key ORDER BY ... ROWS BETWEEN window_rows-1 PRECEDING
    AND CURRENT ROW)`` family): emits ``roll_sum`` / ``roll_min`` /
    ``roll_max`` / ``roll_n`` (int64) next to the input columns.

    Same physical plan as the hash route of :func:`running_scan` — one
    coarse shuffle co-locates each key, the per-bucket fold is a sorted
    grouped pandas rolling. ``value_col`` must be integral (rolling sums
    pass through float64; exact below 2^53, re-cast to int64)."""
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")

    def coarse(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, [key_col], num_buckets, "__rb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = df.copy()
            for c in ("roll_sum", "roll_min", "roll_max", "roll_n"):
                out[c] = pd.Series([], dtype="int64")
            return out
        df = df.sort_values([key_col, *order_cols], kind="mergesort").reset_index(
            drop=True
        )
        agg = (
            df.groupby(key_col, sort=False)[value_col]
            .rolling(window_rows, min_periods=1)
            .agg(["sum", "min", "max", "count"])  # one pass over the windows
        )
        for out_c, in_c in (("roll_sum", "sum"), ("roll_min", "min"),
                            ("roll_max", "max"), ("roll_n", "count")):
            df[out_c] = agg[in_c].to_numpy().astype(np.int64)
        return df

    out = (
        ds.map_batches(coarse, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(
            lambda df: fold(df.drop(columns=["__rb"])), batch_format="pandas"
        )
    )
    anchor = _schema_anchor(ds, ["roll_sum", "roll_min", "roll_max", "roll_n"])
    return out.union(anchor) if anchor is not None else out


def rank_scan(
    ds,
    key_col: str,
    order_cols: list[str],
    n_tiles: int = 4,
    num_buckets: int = 256,
):
    """Per-key rank-family window functions over a TOTAL order (the
    caller appends a unique tiebreak to ``order_cols``, so RANK ==
    ROW_NUMBER and the SQL tie variants coincide): emits ``rank`` int64,
    ``percent_rank`` / ``cume_dist`` float64 (round6 — the oracle
    convention) and ``tile`` (SQL NTILE(n_tiles): the first ``n %
    n_tiles`` tiles get the extra row). Same hash co-location plan as
    :func:`running_scan`."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")

    def coarse(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, [key_col], num_buckets, "__rb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = df.copy()
            out["rank"] = pd.Series([], dtype="int64")
            out["percent_rank"] = pd.Series([], dtype="float64")
            out["cume_dist"] = pd.Series([], dtype="float64")
            out["tile"] = pd.Series([], dtype="int64")
            return out
        df = df.sort_values([key_col, *order_cols], kind="mergesort").reset_index(
            drop=True
        )
        g = df.groupby(key_col, sort=False)
        rank = (g.cumcount() + 1).to_numpy(np.int64)
        n = g[order_cols[0]].transform("size").to_numpy(np.int64)
        df["rank"] = rank
        pr = np.zeros(len(df), dtype=np.float64)
        multi = n > 1
        pr[multi] = (rank[multi] - 1) / (n[multi] - 1)
        df["percent_rank"] = _round6_arr(pr)
        df["cume_dist"] = _round6_arr(rank / n)
        # NTILE: first (n % k) tiles carry ceil(n/k) rows
        k = n_tiles
        big, rem = n // k, n % k
        cut = rem * (big + 1)
        in_big = rank <= cut
        tile = np.where(
            in_big,
            (rank - 1) // np.maximum(big + 1, 1) + 1,
            np.where(big > 0, rem + (rank - cut - 1) // np.maximum(big, 1) + 1, 0),
        )
        df["tile"] = tile.astype(np.int64)
        return df

    out = (
        ds.map_batches(coarse, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(
            lambda df: fold(df.drop(columns=["__rb"])), batch_format="pandas"
        )
    )
    anchor = _schema_anchor(ds, [
        "rank", ("percent_rank", pa.float64()),
        ("cume_dist", pa.float64()), "tile",
    ])
    return out.union(anchor) if anchor is not None else out


def ewma_scan(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    lags: int = 16,
    num_buckets: int = 256,
):
    """Per-key truncated exponentially-weighted moving average at the
    key's LATEST row — the trend-now statistic (α = 1/2, truncated at
    ``lags`` terms): ``ewma = Σ_{i=0}^{lags-1} x_{last-i} · 2^{-(i+1)}``.

    Every weight is an exact power of two, each term ``x · 2^{-(i+1)}``
    is exact in float64 for integer ``|x| < 2^(53-lags)``, and all terms
    share denominator ``2^-lags`` — so the sum is EXACT and order-free,
    and a SQL replay (``cents * pow(0.5, n-rn+1)`` over the last ``lags``
    rows per key) matches bit-for-bit with no rounding slack. The
    untruncated EWMA recursion is inherently sequential and rounds
    differently under every evaluation order; truncation is what buys
    exactness AND a bounded per-row cost.

    Plan: ONE coarse shuffle on ``hash(key) % num_buckets`` co-locates
    each key (the sessionize per-key-volume contract); the per-bucket
    fold is one mergesort + two vectorized grouped passes and emits ONE
    row per key — (key, n_rows, ewma) — so output volume is key
    cardinality, never row count. ``value_col`` must be integral."""
    if lags < 1:
        raise ValueError("lags must be >= 1")

    def coarse(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, [key_col], num_buckets, "__eb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__eb")
        if df.empty:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="int64"),
                "n_rows": pd.Series([], dtype="int64"),
                "ewma": pd.Series([], dtype="float64")})
        df = df.sort_values([key_col, *order_cols],
                            kind="mergesort").reset_index(drop=True)
        v = df[value_col].to_numpy(np.int64)
        if np.abs(v).max(initial=0) >= 2 ** (53 - lags):
            raise ValueError("ewma_scan: |value| too large for an exact "
                             f"float64 sum at lags={lags}")
        g = df.groupby(key_col, sort=False)
        n = g[value_col].transform("size").to_numpy(np.int64)
        rn = (g.cumcount() + 1).to_numpy(np.int64)
        from_end = n - rn  # 0 on each key's latest row
        w = np.where(from_end < lags, np.ldexp(1.0, -(from_end + 1)), 0.0)
        term = pd.Series(v * w, index=df[key_col].to_numpy())
        ew = term.groupby(level=0, sort=False).sum()
        last = df.loc[rn == n, [key_col]].reset_index(drop=True)
        return pd.DataFrame({
            key_col: last[key_col].to_numpy(np.int64),
            "n_rows": n[rn == n],
            "ewma": ew.loc[last[key_col].to_numpy()].to_numpy(np.float64)})

    cols = [key_col, *order_cols, value_col]
    return (ds.select_columns(list(dict.fromkeys(cols)))
            .map_batches(coarse, batch_format="pyarrow")
            .groupby("__eb")
            .map_groups(fold, batch_format="pandas"))


def _round6_arr(a: np.ndarray) -> np.ndarray:
    return np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6


def _running_hash(ds, key_col, order_cols, sum_col, num_buckets):
    def coarse(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, [key_col], num_buckets, "__rb")

    out = (
        ds.map_batches(coarse, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(
            lambda df: _fold_frame(
                df.drop(columns=["__rb"]), key_col, order_cols, sum_col
            ),
            batch_format="pandas",
        )
    )
    anchor = _schema_anchor(ds, ["seq", "running", "delta"])
    return out.union(anchor) if anchor is not None else out


def _running_sorted(ds, key_col, order_cols, sum_col):
    """Sort-partitioned prefix scan: local scans + driver prefix offsets.

    Stage A materializes the globally sorted Dataset and takes its block
    refs IN ORDER (Ray preserves block order after sort). Stage B (one
    remote task per block) emits the block's local running values and a
    per-key tail summary. The driver folds summaries left-to-right into
    per-block starting offsets — O(blocks + boundary-crossing keys)
    driver work, never row data. Stage C adds each block's offset row
    and unions the results back into one Dataset.
    """
    import ray
    import ray.data as rd

    sorted_ds = ds.sort([key_col, *order_cols]).materialize()
    if sorted_ds.count() == 0:
        # empty-input contract: sorting an empty Dataset leaves one
        # ZERO-COLUMN block, so rebuild the schema from the input —
        # output must still carry the scan columns (hash-route parity)
        anchor = _schema_anchor(ds, ["seq", "running", "delta"])
        return anchor if anchor is not None else sorted_ds
    refs = sorted_ds.to_arrow_refs()

    @ray.remote(num_returns=2)
    def local_scan(tbl: pa.Table):
        out = _fold_frame(tbl.to_pandas(), key_col, order_cols, sum_col)
        if out.empty:
            return pa.Table.from_pandas(out, preserve_index=False), None
        # boundary summary: in globally sorted order only the block's
        # FIRST key can continue a previous block's chain and only its
        # LAST key can continue into later blocks, so two entries bound
        # the driver fold at O(blocks) — never one per distinct key.
        # The block total is the key's SUM of sum_col — NOT
        # max(running), which under-counts whenever negative values
        # make the running sum non-monotone.
        tail = out.groupby(key_col, sort=False).agg(
            n=("seq", "max"), s=(sum_col, "sum"), last_o=(order_cols[0], "max")
        )
        first_k = out[key_col].iloc[0]
        last_k = out[key_col].iloc[-1]

        def stats(k):
            return (int(tail.loc[k, "n"]), int(tail.loc[k, "s"]),
                    int(tail.loc[k, "last_o"]))

        summary = (first_k, stats(first_k), last_k, stats(last_k))
        return pa.Table.from_pandas(out, preserve_index=False), summary

    @ray.remote
    def apply_offset(scanned: pa.Table, offsets: dict):
        if scanned.num_rows == 0 or not offsets:
            return scanned
        df = scanned.to_pandas()
        keys = df[key_col].to_numpy()
        for k, (dn, dsum, prev_o) in offsets.items():
            m = keys == k
            df.loc[m, "seq"] += dn
            df.loc[m, "running"] += dsum
            # the block's first row of k is no longer the key's first:
            # its delta becomes (order − previous block's last order)
            first = int(np.flatnonzero(m)[0])
            df.iat[first, df.columns.get_loc("delta")] = (
                int(df.iloc[first][order_cols[0]]) - prev_o
            )
        return pa.Table.from_pandas(df, preserve_index=False)

    scan_refs = [local_scan.remote(r) for r in refs]
    # the driver fetches ONLY the two-entry boundary summaries; scanned
    # row data stays in the object store. The fold carries ONE chain —
    # the accumulated totals of the previous block's last key.
    summaries = ray.get([s for _, s in scan_refs])
    offsets_per_block: list[dict] = []
    carry_key, carry = None, None
    for summary in summaries:
        if summary is None:
            offsets_per_block.append({})
            continue
        first_k, first_stats, last_k, last_stats = summary
        if carry is not None and carry_key == first_k:
            offsets_per_block.append({carry_key: carry})
            if first_k == last_k:  # single-key block extends the chain
                n, s, last_o = last_stats
                carry = (carry[0] + n, carry[1] + s, last_o)
                continue
        else:
            offsets_per_block.append({})
        carry_key, carry = last_k, last_stats

    out_refs = [
        apply_offset.remote(df_ref, off)
        for (df_ref, _), off in zip(scan_refs, offsets_per_block)
    ]
    return rd.from_arrow_refs(out_refs)


def time_weighted_scan(
    ds,
    key_col: str,
    order_cols: list[str],
    ts_col: str,
    value_col: str,
    num_buckets: int = 256,
):
    """Per-key time-weighted value integral (the TWAP family): each row
    holds its value until the key's NEXT row, contributing
    ``value · (next_ts − ts)``; the key's last row has no successor and
    contributes nothing. Emits ONE row per key — (key, n_rows,
    twap_num = Σ value·gap, dur = Σ gap) — int64 throughout (the caller
    bounds Σ|value|·gap < 2^63; value in cents × gaps in µs holds to
    ~10^5 rows·seconds per key), so the SQL LEAD() replay is bit-exact
    and the finalize ``round6(num/dur)`` is one shared double division.

    Same physical plan as :func:`ewma_scan`: ONE coarse ``hash(key)``
    shuffle, a vectorized sorted fold (grouped shift), key-cardinality
    output."""

    def coarse(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, [key_col], num_buckets, "__tb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__tb")
        if df.empty:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="int64"),
                "n_rows": pd.Series([], dtype="int64"),
                "twap_num": pd.Series([], dtype="int64"),
                "dur": pd.Series([], dtype="int64")})
        df = df.sort_values([key_col, *order_cols],
                            kind="mergesort").reset_index(drop=True)
        t = df[ts_col].to_numpy(np.int64)
        v = df[value_col].to_numpy(np.int64)
        k = df[key_col].to_numpy(np.int64)
        nxt = np.empty(len(t), dtype=np.int64)
        nxt[:-1] = t[1:]
        nxt[-1] = t[-1]
        last = np.empty(len(t), dtype=bool)
        last[:-1] = k[:-1] != k[1:]
        last[-1] = True
        gap = np.where(last, 0, nxt - t)
        agg = pd.DataFrame({
            "k": k, "n": np.ones(len(t), np.int64),
            "num": v * gap, "dur": gap}) \
            .groupby("k", sort=False, as_index=False).sum()
        return pd.DataFrame({
            key_col: agg["k"].to_numpy(np.int64),
            "n_rows": agg["n"].to_numpy(np.int64),
            "twap_num": agg["num"].to_numpy(np.int64),
            "dur": agg["dur"].to_numpy(np.int64)})

    cols = list(dict.fromkeys([key_col, *order_cols, ts_col, value_col]))
    return (ds.select_columns(cols)
            .map_batches(coarse, batch_format="pyarrow")
            .groupby("__tb")
            .map_groups(fold, batch_format="pandas"))


def decayed_counts(ds, key_col: str, ts_col: str,
                   half_life_us: int = 86_400_000_000,
                   max_lags: int = 16) -> pa.Table:
    """Exponentially-decayed event count per key at the corpus
    horizon: each event contributes 0.5^age (age = whole half-lives
    before the max timestamp), truncated at ``max_lags`` — the
    recency-weighted popularity score behind trending lists.

    EXACT and order-free: a truncated power-of-two weight is the
    INTEGER 2^(max_lags − age), so per-block partials sum in int64 and
    the final score is int_sum / 2^max_lags — dyadic, no float
    summation anywhere, and the SQL replay is a CASE shift. The corpus
    horizon comes from one scalar max() pass; the count fold is one
    counting pass. Returns (key, n_events, decayed round6) ordered."""
    import pyarrow.compute as pc

    def to_us(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        return pa.table({"k": b[key_col], "t": ts})

    base = ds.select_columns([key_col, ts_col]) \
        .map_batches(to_us, batch_format="pyarrow").materialize()
    end_us = int(base.max("t"))

    def partial(b: pa.Table) -> pa.Table:
        t = b["t"].to_numpy(zero_copy_only=False)
        age = (end_us - t) // half_life_us
        w = np.where(age <= max_lags,
                     np.left_shift(np.int64(1),
                                   np.maximum(max_lags - age, 0)),
                     0).astype(np.int64)
        df = pd.DataFrame({
            "k": pd.Series(b["k"].to_pylist(), dtype="object"),
            "n": np.ones(len(t), dtype=np.int64), "w": w})
        out = df.groupby("k", sort=False, as_index=False).sum()
        return pa.table({
            "k": pa.array(out["k"].to_numpy(object), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "w": pa.array(out["w"].to_numpy(np.int64))})

    parts = base.map_batches(partial, batch_format="pyarrow") \
        .to_pandas().groupby("k", as_index=False)[["n", "w"]].sum() \
        .sort_values("k")
    dec = parts["w"].to_numpy(np.float64) / np.float64(1 << max_lags)
    return pa.table({
        key_col: pa.array(parts["k"].to_numpy(object), pa.string()),
        "n_events": pa.array(parts["n"].to_numpy(np.int64)),
        "decayed": pa.array(
            np.sign(dec) * np.floor(np.abs(dec) * 1e6 + 0.5) / 1e6,
            pa.float64())})
