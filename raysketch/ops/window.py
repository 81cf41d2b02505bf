"""Stream-shaped windowed aggregation over the events table.

Ray Data is a batch engine (no watermarks); windows are expressed
declaratively: ``bucket = ts // width`` then grouped aggregation — the
reference's circular time-series buffer recast as a window filter
(SURVEY.md §2.4: time_series.c's advancing window + zeroing of skipped
rows becomes "keep the last `rows` buckets, fill gaps with zero, drop
late data").

- :func:`tumbling_window` — (key, bucket) grouped exact aggregates via
  per-batch partial aggregation (map-side combine) + a small groupby.
- :func:`time_series_window` — reference-semantics windowed series per
  key: last ``rows`` buckets ending at the max bucket, skipped buckets
  zero-filled, observations older than the window dropped (INT_MIN/nil in
  the reference → simply excluded here), values summed within a bucket
  ("add" mode) or last-write ("set" mode, ts-ordered).
- :func:`window_stats` — the Lua ``stats()`` range aggregate
  (lua_binding/time_series.c:198-345): sum/min/max/avg/sd/usd over a
  bucket range, zeros treated as missing unless ``include_zero``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.running_stats import RunningStats

_I64_MIN, _I64_MAX = np.iinfo(np.int64).min, np.iinfo(np.int64).max


def _sat64(sums) -> np.ndarray:
    """Saturating float64 → int64 (reference ts.c per-add saturation).

    Values at or beyond the int64 range clamp to the exact bounds; a plain
    ``np.clip(...).astype(np.int64)`` would clip to float64(INT64_MAX) ==
    2^63 and then WRAP on the cast."""
    s = np.asarray(sums, dtype=np.float64)
    out = np.empty(s.shape, dtype=np.int64)
    hi = s >= np.float64(_I64_MAX)  # float64(_I64_MAX) == 2^63: catches all >= 2^63-1024
    lo = s <= np.float64(_I64_MIN)
    mid = ~(hi | lo)
    out[hi] = _I64_MAX
    out[lo] = _I64_MIN
    out[mid] = s[mid].astype(np.int64)
    return out


def add_bucket(
    batch: pa.Table, ts_col: str = "ts", width_s: int = 3600, out: str = "bucket"
) -> pa.Table:
    import pyarrow.compute as pc

    # epoch microseconds → integer bucket of width_s seconds
    us = pc.cast(batch[ts_col], pa.int64())
    bucket = pc.divide(us, pa.scalar(width_s * 1_000_000, pa.int64()))
    return batch.append_column(out, pc.cast(bucket, pa.int64()))


def tumbling_window(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    width_s: int = 3600,
):
    """Per (key, bucket): n_events + min/max value (exact).

    Map-side partial aggregation inside map_batches keeps the shuffle at
    one row per (batch, key, bucket); the fold is a coarse-bucket
    groupby. Only ``key_col``/``ts_col``/``value_col`` are read."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = add_bucket(batch, ts_col, width_s)
        df = batch.select([key_col, "bucket", value_col]).to_pandas()
        g = (
            df.groupby([key_col, "bucket"], sort=False)
            .agg(
                n_events=(value_col, "size"),
                vmin=(value_col, "min"),
                vmax=(value_col, "max"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    # coarse-bucket shuffle (bounded group count at any key×bucket
    # cardinality); each reduce task folds its real windows with ONE
    # vectorized pandas groupby — per-tiny-group map_groups calls would
    # dominate at scale
    def coarse(batch: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(batch, [key_col, "bucket"], 256, "wb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([key_col, "bucket"], sort=False)
            .agg(n_events=("n_events", "sum"), vmin=("vmin", "min"),
                 vmax=("vmax", "max"))
            .reset_index()
        )

    return partials.map_batches(coarse, batch_format="pyarrow").groupby(
        "wb"
    ).map_groups(lambda df: fold(df.drop(columns=["wb"])), batch_format="pandas")


def hopping_window(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    width_s: int = 7200,
    hop_s: int = 3600,
):
    """Overlapping (hopping / sliding) windows: per (key, win) exact
    n_events + min/max value, where window ``win`` covers
    ``[win*hop_s, win*hop_s + width_s)`` — every event lands in
    ``width_s/hop_s`` windows.

    The scale trick: events are first collapsed to HOP-granularity
    partials inside map_batches (one row per (block, key, hop-bucket)),
    and the ×(width/hop) replication happens on those PARTIALS, never on
    raw events — shuffle volume is ``blocks × keys × hop-buckets ×
    (width/hop)`` narrow rows regardless of event count. Count/min/max
    replicate losslessly because every event of a hop-bucket belongs to
    exactly the same set of windows. Fold is the tumbling coarse-bucket
    discipline (bounded group count, one vectorized pandas groupby per
    reduce task). Contrast ``stream_join.interval_join``, which solves
    the general per-event window-membership join; this operator is the
    aggregate-only fast path.
    """
    if width_s % hop_s != 0 or width_s < hop_s:
        raise ValueError("width_s must be a positive multiple of hop_s")
    nw = width_s // hop_s

    def partial(batch: pa.Table) -> pa.Table:
        batch = add_bucket(batch, ts_col, hop_s, out="hb")
        df = batch.select([key_col, "hb", value_col]).to_pandas()
        g = (
            df.groupby([key_col, "hb"], sort=False)
            .agg(
                n_events=(value_col, "size"),
                vmin=(value_col, "min"),
                vmax=(value_col, "max"),
            )
            .reset_index()
        )
        # replicate hop-bucket partials to their nw covering windows:
        # window w = hb - j covers every ts of hop-bucket hb for
        # j in 0..nw-1 (and no other window does)
        rep = pd.concat(
            [g.assign(win=g["hb"] - j) for j in range(nw)], ignore_index=True
        ).drop(columns=["hb"])
        return pa.Table.from_pandas(rep, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def coarse(batch: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(batch, [key_col, "win"], 256, "wb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([key_col, "win"], sort=False)
            .agg(n_events=("n_events", "sum"), vmin=("vmin", "min"),
                 vmax=("vmax", "max"))
            .reset_index()
        )

    return partials.map_batches(coarse, batch_format="pyarrow").groupby(
        "wb"
    ).map_groups(lambda df: fold(df.drop(columns=["wb"])), batch_format="pandas")


def time_series_window(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    ns_per_row: int,
    rows: int,
    mode: str = "add",
    single_shuffle_limit: int = 2_000_000,
):
    """Reference circular-buffer semantics per key (time_series.c:34-121):

    window = the ``rows`` buckets ending at the key's max bucket; buckets
    with no data are zero (advancing time zeroes skipped rows,
    time_series.c:40-53); data older than the window is dropped
    (:54-56). Values are int64; "add" saturates at int bounds like the
    reference, "set" keeps the last write in timestamp order.

    Returns one row per key: (key, current_time, values list[int64]).

    Plan is routed by PARTIAL VOLUME: the bucket-level partial stream is
    counted after the map-side collapse; at or under
    ``single_shuffle_limit`` rows, ONE coarse shuffle keyed by
    hash(key) co-locates each key's bucket partials and the fold +
    window assembly run in the same reduce task (a second sort saves
    nothing at that volume). Above the limit the 3-stage plan holds:
    first a (key, bucket)-keyed coarse fold — which bounds per-task rows
    even for a hot key with an arbitrarily long history, because no
    single task ever sees all of a key's buckets — then the per-key
    assembly over collapsed bucket rows only.
    """
    if rows < 2:
        raise ValueError("rows must be >= 2")  # time_series.c:63
    if mode not in ("add", "set"):
        raise ValueError("mode must be 'add' or 'set'")

    # stage 1 — map-side per-(key, bucket) partials: the raw event stream
    # collapses to bucket granularity BEFORE any shuffle, so per-key work
    # downstream is bounded by the key's time span / ns_per_row, never by
    # its event count (a hot key's raw rows would otherwise all land in
    # one reduce task). "set" keeps the (ts, value)-max write per bucket —
    # last-write-wins with a deterministic value tiebreak for equal ts.
    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key_col: b[key_col].to_pylist(),
            "bucket": b[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
            // ns_per_row,
            "ts": b[ts_col].to_numpy(zero_copy_only=False).astype(np.int64),
            "v": b[value_col].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        if mode == "add":
            # accumulate in float64 and saturate per partial sum: a plain
            # int64 pandas sum near the bound would silently WRAP before
            # stage 3's clamp ever runs (reference ts.c saturates per add)
            df["v"] = df["v"].astype(np.float64)
            g = df.groupby([key_col, "bucket"], sort=False)["v"].sum().reset_index()
            g["v"] = _sat64(g["v"].to_numpy())
            g["ts"] = 0
        else:
            g = df.sort_values(["ts", "v"]).groupby(
                [key_col, "bucket"], sort=False).last().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()

    # stage 2 — coarse-bucket fold to one row per (key, bucket)
    def coarse(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, [key_col, "bucket"], 256, "cb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if mode == "add":
            df = df.assign(v=df["v"].astype(np.float64))
            out = df.groupby([key_col, "bucket"], sort=False)["v"].sum().reset_index()
            out["v"] = _sat64(out["v"].to_numpy())  # saturate, don't wrap
            out["ts"] = 0
            return out
        return df.sort_values(["ts", "v"]).groupby(
            [key_col, "bucket"], sort=False).last().reset_index()

    # stage 3 — per-key window assembly over bucket-level rows only
    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        bucket = df["bucket"].to_numpy(np.int64)
        vals = df["v"].to_numpy(np.int64)
        cur = int(bucket.max())
        lo = cur - rows + 1
        keep = bucket >= lo  # older-than-window data drops (ts.c:54-56)
        bucket, vals = bucket[keep], vals[keep]
        out = np.zeros(rows, dtype=np.int64)
        idx = (bucket - lo).astype(np.int64)
        if mode == "add":
            sums = np.zeros(rows, dtype=np.float64)
            np.add.at(sums, idx, vals.astype(np.float64))
            out = _sat64(sums)  # saturation (no wrap at the float64 bound)
        else:
            out[idx] = vals
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "current_time": [cur * ns_per_row],
                "values": [out.tolist()],
            }
        )

    if partials.count() <= single_shuffle_limit:
        # single-shuffle route: shuffle partials once on hash(key), fold
        # and assemble in the same reduce task (fold is associative over
        # bucket partials, so skipping the intermediate (key,bucket)
        # shuffle changes nothing but the plan)
        def key_coarse(b: pa.Table) -> pa.Table:
            from ..engine.hashing import append_coarse_bucket

            return append_coarse_bucket(b, [key_col], 256, "kb")

        def fold_assemble(df: pd.DataFrame) -> pd.DataFrame:
            folded = fold(df.drop(columns=["kb"]))
            return pd.concat(
                [per_key(g) for _, g in folded.groupby(key_col, sort=False)],
                ignore_index=True,
            )

        return partials.map_batches(key_coarse, batch_format="pyarrow").groupby(
            "kb"
        ).map_groups(fold_assemble, batch_format="pandas")

    bucketed = partials.map_batches(coarse, batch_format="pyarrow").groupby(
        "cb"
    ).map_groups(lambda df: fold(df.drop(columns=["cb"])), batch_format="pandas")
    return bucketed.groupby(key_col).map_groups(per_key, batch_format="pandas")


def sessionize(
    ds,
    key_col: str,
    ts_col: str,
    gap_us: int,
    value_col: str | None = None,
    num_buckets: int = 256,
):
    """Gap-based session windows per key (the classic streaming
    sessionization the reference's fixed-width circular buffer cannot
    express): consecutive events of a key belong to one session while
    the gap between them is <= ``gap_us``; a STRICTLY larger gap starts
    a new session. Sessions number from 1 per key in start order.

    Returns one row per session: (key, session_id, session_start_us,
    session_end_us, n_events[, sum_value]).

    Plan: ONE coarse shuffle on ``hash(key) % num_buckets`` co-locates
    each key's events; the per-bucket fold is fully vectorized pandas —
    sort by (key, ts), flag gaps, cumsum session ids, one grouped
    aggregate. Per-key volume must fit a reduce task (the same contract
    as every per-key fold here); keys are never materialized driver-side.
    """
    if gap_us <= 0:
        raise ValueError("gap_us must be positive")

    def coarse(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..engine.hashing import append_coarse_bucket

        cols = [key_col, ts_col] + ([value_col] if value_col else [])
        b = b.select(cols)
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        b = b.append_column("__t_us", pc.cast(ts, pa.int64()))
        return append_coarse_bucket(b, [key_col], num_buckets, "__sb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = [key_col, "session_id", "session_start_us",
                    "session_end_us", "n_events"] + (
                        ["sum_value"] if value_col else [])
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        df = df.sort_values([key_col, "__t_us"], kind="mergesort")
        t = df["__t_us"].to_numpy(np.int64)
        new_key = (df[key_col] != df[key_col].shift()).to_numpy()
        gap = np.empty(len(df), dtype=bool)
        gap[0:1] = True
        if len(df) > 1:
            gap[1:] = (t[1:] - t[:-1]) > gap_us
        new_sess = new_key | gap
        sess = np.cumsum(new_sess)  # global session counter within bucket
        df = df.assign(__sess=sess)
        aggs = {
            "session_start_us": ("__t_us", "min"),
            "session_end_us": ("__t_us", "max"),
            "n_events": ("__t_us", "size"),
        }
        if value_col:
            aggs["sum_value"] = (value_col, "sum")
        g = df.groupby([key_col, "__sess"], sort=False).agg(**aggs).reset_index()
        # renumber 1..n per key in start order (bucket-global __sess ids
        # are already start-ordered within each key by construction)
        g = g.sort_values([key_col, "session_start_us"], kind="mergesort")
        g["session_id"] = g.groupby(key_col, sort=False).cumcount() + 1
        return g.drop(columns=["__sess"])[
            [key_col, "session_id", "session_start_us", "session_end_us", "n_events"]
            + (["sum_value"] if value_col else [])
        ]

    return (
        ds.map_batches(coarse, batch_format="pyarrow")
        .groupby("__sb")
        .map_groups(
            lambda df: fold(df.drop(columns=["__sb"])), batch_format="pandas"
        )
    )


def window_stats(
    values: np.ndarray, stat: str = "sum", include_zero: bool = False
) -> tuple[float, int]:
    """The Lua ts:stats() range aggregate (lua_binding/time_series.c:198-345):
    zeros are missing data unless include_zero; returns (stat, rows_used)."""
    v = np.asarray(values, dtype=np.float64)
    if not include_zero:
        v = v[v != 0]
    n = int(v.size)
    if n == 0:
        return (float("nan"), 0)
    if stat == "sum":
        return (float(v.sum()), n)
    if stat == "min":
        return (float(v.min()), n)
    if stat == "max":
        return (float(v.max()), n)
    rs = RunningStats()
    rs.update_batch(v)
    if stat == "avg":
        return (rs.avg(), n)
    if stat == "sd":
        return (rs.sd(), n)
    if stat == "usd":
        return (rs.usd(), n)
    raise ValueError(f"unknown stat {stat!r}")


def sliding_distinct(ds, ts_col: str, key_col: str,
                     window_hours: int = 24, slide_hours: int = 6,
                     p: int = 14) -> pa.Table:
    """Sliding-window distinct-key counts via HLL sketch REUSE — the
    "distinct users in the trailing day, every 6 hours" monitor. The
    input is scanned ONCE: each block reduces to per-hour HLL partials
    (plus exact row counts); the driver folds blocks × hours sketches
    (hours, not rows — KB each under the sparse codec) and every
    sliding window is a ``merge_many`` over its member hours' payloads,
    so overlapping windows share work instead of re-scanning. Sparse
    mode keeps the counts EXACT below the promotion threshold (the
    hll_distinct discipline); at corpus scale estimates carry the dense
    1.04/√2¹⁴ bound. Windows start at the corpus' min hour and step by
    ``slide_hours``; only windows with ≥1 event are emitted (the SQL
    inner-join semantics). Returns (window_start int64 epoch-hour,
    n_events int64, distinct_keys int64)."""
    from ..sketches.hll import HyperLogLog

    if window_hours < 1 or slide_hours < 1:
        raise ValueError("window_hours and slide_hours must be >= 1")

    def partial(b: pa.Table) -> pa.Table:
        # normalize the unit FIRST: rd.from_pandas yields timestamp[ns]
        # while parquet reads yield [us] (pinned in cohort_retention)
        us = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        keys = b[key_col].to_numpy(zero_copy_only=False)
        hs, payloads, counts = [], [], []
        for h in np.unique(hour):
            m = hour == h
            sk = HyperLogLog(p)
            sk.update_batch(keys[m])
            hs.append(int(h))
            payloads.append(sk.to_bytes())
            counts.append(int(m.sum()))
        return pa.table({
            "hour": pa.array(hs, pa.int64()),
            "n": pa.array(counts, pa.int64()),
            "payload": pa.array(payloads, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({"window_start": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "distinct_keys": pa.array([], pa.int64())})
    by_hour: dict[int, list[bytes]] = {}
    n_by_hour: dict[int, int] = {}
    for h, cnt, pl in zip(parts["hour"].astype(int), parts["n"],
                          parts["payload"]):
        by_hour.setdefault(h, []).append(bytes(pl))
        n_by_hour[h] = n_by_hour.get(h, 0) + int(cnt)
    # fold each hour's block partials once; windows then merge the
    # per-hour payloads (each hour merged into window/slide windows)
    hour_payload = {h: HyperLogLog.merge_many(pls).to_bytes()
                    for h, pls in by_hour.items()}
    h0, h1 = min(hour_payload), max(hour_payload)
    starts, n_events, distinct = [], [], []
    for ws in range(h0, h1 + 1, slide_hours):
        member = [h for h in range(ws, ws + window_hours)
                  if h in hour_payload]
        if not member:
            continue
        win = HyperLogLog.merge_many([hour_payload[h] for h in member])
        starts.append(ws)
        n_events.append(sum(n_by_hour[h] for h in member))
        distinct.append(int(round(win.estimate())))
    return pa.table({"window_start": pa.array(starts, pa.int64()),
                     "n_events": pa.array(n_events, pa.int64()),
                     "distinct_keys": pa.array(distinct, pa.int64())})


def sliding_topk(ds, ts_col: str, key_col: str,
                 window_hours: int = 24, slide_hours: int = 6,
                 top_n: int = 5, k: int = 4096) -> pa.Table:
    """Sliding-window top-N keys via SpaceSaving sketch REUSE — the
    "top users in the trailing day, every 6 hours" monitor, the
    heavy-hitter sibling of :func:`sliding_distinct`. ONE scan reduces
    each block to per-hour Misra–Gries partials; every sliding window
    is a ``merge_many`` over its member hours' payloads, so the
    window overlap shares work instead of re-scanning. While the
    per-window distinct-key count stays ≤ ``k`` the summary is EXACT
    (err == 0, the sparse-exact principle) and the SQL
    count-rank-QUALIFY oracle replays it bit-for-bit; beyond that the
    retained counts carry the documented ≤ n/(k+1) undercount.
    Returns (window_start int64, rank int64 1-based, key int64,
    n_events int64) — ties broken by key ascending."""
    from ..sketches.spacesaving import SpaceSaving

    if window_hours < 1 or slide_hours < 1 or top_n < 1:
        raise ValueError("window_hours/slide_hours/top_n must be >= 1")

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        keys = b[key_col].to_numpy(zero_copy_only=False)
        hs, payloads = [], []
        for h in np.unique(hour):
            sk = SpaceSaving(k)
            sk.update_batch(keys[hour == h])
            hs.append(int(h))
            payloads.append(sk.to_bytes())
        return pa.table({"hour": pa.array(hs, pa.int64()),
                         "payload": pa.array(payloads, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({"window_start": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "key": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    by_hour: dict[int, list[bytes]] = {}
    for h, pl in zip(parts["hour"].astype(int), parts["payload"]):
        by_hour.setdefault(h, []).append(bytes(pl))
    hour_payload = {h: SpaceSaving.merge_many(pls).to_bytes()
                    for h, pls in by_hour.items()}
    h0, h1 = min(hour_payload), max(hour_payload)
    ws_l, rk_l, key_l, n_l = [], [], [], []
    for ws in range(h0, h1 + 1, slide_hours):
        member = [hour_payload[h] for h in range(ws, ws + window_hours)
                  if h in hour_payload]
        if not member:
            continue
        win = SpaceSaving.merge_many(member)
        df = pd.DataFrame({
            "key": win.counts.index.astype(np.int64),
            "n": win.counts.to_numpy(np.int64)})
        df = df.sort_values(["n", "key"], ascending=[False, True]) \
            .head(top_n)
        m = len(df)
        ws_l.extend([ws] * m)
        rk_l.extend(range(1, m + 1))
        key_l.extend(df["key"].tolist())
        n_l.extend(df["n"].tolist())
    return pa.table({"window_start": pa.array(ws_l, pa.int64()),
                     "rank": pa.array(rk_l, pa.int64()),
                     "key": pa.array(key_l, pa.int64()),
                     "n_events": pa.array(n_l, pa.int64())})


def debounce(ds, key_cols: list[str], ts_col: str,
             order_cols: list[str], window_us: int,
             num_buckets: int = 256):
    """Burst-collapse event dedup (at-least-once delivery cleaning):
    within each key chain a row is KEPT iff it is the chain's first or
    its gap from the PREVIOUS row exceeds ``window_us`` — the LAG rule
    (vectorizable and SQL-replayable), deliberately not the
    sequential last-kept debounce whose result depends on a running
    state no window function expresses. Returns the kept rows as a
    Dataset (input columns, original values).

    ONE coarse ``hash(key_cols)`` shuffle co-locates each chain; the
    per-bucket fold is one mergesort + a vectorized grouped diff.
    ``order_cols`` must totally order each chain (ts first, unique id
    tiebreak)."""
    if window_us < 0:
        raise ValueError("window_us must be >= 0")

    def coarse(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, key_cols, num_buckets, "__db")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__db")
        if df.empty:
            return df
        df = df.sort_values([*key_cols, *order_cols],
                            kind="mergesort").reset_index(drop=True)
        t = df[ts_col].to_numpy(np.int64)
        prev = np.empty(len(t), dtype=np.int64)
        prev[1:] = t[:-1]
        prev[0] = np.iinfo(np.int64).min
        first = np.zeros(len(t), dtype=bool)
        first[0] = True
        for c in key_cols:
            k = df[c].to_numpy()
            first[1:] |= k[:-1] != k[1:]
        keep = first | ((t - prev) > window_us)
        return df[keep].reset_index(drop=True)

    return (ds.map_batches(coarse, batch_format="pyarrow")
            .groupby("__db")
            .map_groups(fold, batch_format="pandas"))


def coverage_islands(ds, key_col: str, start_col: str, end_col: str,
                     order_cols: list[str], num_buckets: int = 256):
    """Gaps-and-islands interval merge per key: overlapping or touching
    [start, end) intervals coalesce into islands; emits ONE row per key
    — (key, n_rows, n_islands, covered = Σ island extents) — the
    uptime/coverage accounting SQL does with a prefix-max window. A new
    island starts where ``start > running max of previous ends`` (a
    TOUCHING interval, start == prev end, EXTENDS the island). All
    int64: the prefix max, break flags and extents are order-free exact
    under the caller's total order (``order_cols`` — start first,
    unique id tiebreak), so the SQL replay is bit-exact.

    ONE coarse ``hash(key)`` shuffle co-locates each key; the
    per-bucket fold is one mergesort + a vectorized per-key
    maximum.accumulate + one grouped (key, island) reduce."""

    def coarse(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, [key_col], num_buckets, "__ib")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__ib")
        if df.empty:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="int64"),
                "n_rows": pd.Series([], dtype="int64"),
                "n_islands": pd.Series([], dtype="int64"),
                "covered": pd.Series([], dtype="int64")})
        df = df.sort_values([key_col, *order_cols],
                            kind="mergesort").reset_index(drop=True)
        k = df[key_col].to_numpy(np.int64)
        s = df[start_col].to_numpy(np.int64)
        e = df[end_col].to_numpy(np.int64)
        first = np.zeros(len(k), dtype=bool)
        first[0] = True
        first[1:] = k[:-1] != k[1:]
        # per-key running max of END over PREVIOUS rows: grouped cummax
        # then a grouped one-row shift (both vectorized pandas kernels)
        g = df.groupby(key_col, sort=False)
        pmax_s = g[end_col].cummax().shift(1)
        pmax = pmax_s.fillna(np.iinfo(np.int64).min) \
            .to_numpy(np.int64)
        brk = first | (s > pmax)
        island = np.cumsum(brk)
        agg = pd.DataFrame({"k": k, "i": island, "s": s, "e": e}) \
            .groupby(["k", "i"], sort=False) \
            .agg(smin=("s", "min"), emax=("e", "max")).reset_index()
        out = pd.DataFrame({
            "k": agg["k"], "n_islands": np.ones(len(agg), np.int64),
            "covered": (agg["emax"] - agg["smin"]).to_numpy(np.int64)}) \
            .groupby("k", sort=False, as_index=False).sum()
        rows = pd.DataFrame({"k": k, "n": np.ones(len(k), np.int64)}) \
            .groupby("k", sort=False, as_index=False).sum()
        m = rows.merge(out, on="k")
        return pd.DataFrame({
            key_col: m["k"].to_numpy(np.int64),
            "n_rows": m["n"].to_numpy(np.int64),
            "n_islands": m["n_islands"].to_numpy(np.int64),
            "covered": m["covered"].to_numpy(np.int64)})

    cols = list(dict.fromkeys(
        [key_col, start_col, end_col, *order_cols]))
    return (ds.select_columns(cols)
            .map_batches(coarse, batch_format="pyarrow")
            .groupby("__ib")
            .map_groups(fold, batch_format="pandas"))


def ohlc_bars(ds, key_col: str, bucket_col: str, ts_col: str,
              tie_col: str, value_col: str, num_buckets: int = 256):
    """Time-series resampling to OHLC bars: per (key, bucket) the OPEN
    (value at the earliest (ts, tie)), CLOSE (latest), HIGH, LOW, row
    count and sum — the downsampling step monitoring/financial
    pipelines run before plotting or modeling. Open/close make the
    aggregate non-commutative, so each per-block partial CARRIES its
    argmin/argmax witnesses ((ts, tie, value) triples) — that makes
    partials mergeable and the fold exact under any arrival order; all
    int64, so the SQL first_value/last_value window replay is
    bit-exact.

    Plan: one vectorized per-block pre-reduce to ≤ |key×bucket| partial
    rows (raw rows never shuffle), ONE coarse ``hash(key, bucket)``
    fold."""
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": pd.Series(b[key_col].to_pylist(), dtype="object"),
            "bkt": b[bucket_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "t": b[ts_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "tie": b[tie_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "v": b[value_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        df = df.sort_values(["k", "bkt", "t", "tie"],
                            kind="mergesort").reset_index(drop=True)
        g = df.groupby(["k", "bkt"], sort=False)
        out = g.agg(
            open_t=("t", "first"), open_tie=("tie", "first"),
            open_v=("v", "first"),
            close_t=("t", "last"), close_tie=("tie", "last"),
            close_v=("v", "last"),
            hi=("v", "max"), lo=("v", "min"),
            sum_v=("v", "sum"), n=("v", "size")).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__ob")
        opens = df.sort_values(["k", "bkt", "open_t", "open_tie"],
                               kind="mergesort") \
            .drop_duplicates(["k", "bkt"])[
            ["k", "bkt", "open_v"]]
        closes = df.sort_values(["k", "bkt", "close_t", "close_tie"],
                                ascending=[True, True, False, False],
                                kind="mergesort") \
            .drop_duplicates(["k", "bkt"])[
            ["k", "bkt", "close_v"]]
        sums = df.groupby(["k", "bkt"], as_index=False).agg(
            hi=("hi", "max"), lo=("lo", "min"),
            sum_v=("sum_v", "sum"), n=("n", "sum"))
        m = sums.merge(opens, on=["k", "bkt"]) \
            .merge(closes, on=["k", "bkt"])
        return pd.DataFrame({
            key_col: m["k"].to_numpy(object),
            "bucket": m["bkt"].to_numpy(np.int64),
            "open": m["open_v"].to_numpy(np.int64),
            "high": m["hi"].to_numpy(np.int64),
            "low": m["lo"].to_numpy(np.int64),
            "close": m["close_v"].to_numpy(np.int64),
            "n": m["n"].to_numpy(np.int64),
            "sum_value": m["sum_v"].to_numpy(np.int64)})

    cols = list(dict.fromkeys(
        [key_col, bucket_col, ts_col, tie_col, value_col]))
    return (ds.select_columns(cols)
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(lambda b: append_coarse_bucket(
                b, ["k", "bkt"], num_buckets, "__ob"),
                batch_format="pyarrow")
            .groupby("__ob")
            .map_groups(fold, batch_format="pandas"))


def max_streak(ds, key_col: str, day_col: str,
               num_buckets: int = 256):
    """Longest consecutive-day streak per key (the engagement metric):
    over each key's DISTINCT day set, the longest run of days with no
    gap. One ``hash(key)`` co-location fold — per-block distinct
    (key, day) pre-reduce, then the classic ``day − row_number``
    grouping entirely vectorized; one row per key, int64 — the SQL
    replay uses the identical trick."""

    def pairs(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        df = pd.DataFrame({
            "k": b[key_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "d": b[day_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)}).drop_duplicates()
        t = pa.table({"k": pa.array(df["k"].to_numpy(np.int64)),
                      "d": pa.array(df["d"].to_numpy(np.int64))})
        return append_coarse_bucket(t, ["k"], num_buckets, "__mb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__mb").drop_duplicates(["k", "d"])
        if df.empty:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="int64"),
                "n_days": pd.Series([], dtype="int64"),
                "max_streak": pd.Series([], dtype="int64")})
        df = df.sort_values(["k", "d"], kind="mergesort") \
            .reset_index(drop=True)
        g = df.groupby("k", sort=False)
        rn = g.cumcount().to_numpy(np.int64)
        grp = df["d"].to_numpy(np.int64) - rn  # constant within a run
        runs = pd.DataFrame({
            "k": df["k"], "grp": grp,
            "n": np.ones(len(df), np.int64)}) \
            .groupby(["k", "grp"], as_index=False)["n"].sum()
        out = runs.groupby("k", as_index=False).agg(
            max_streak=("n", "max"))
        days = g.size().reset_index(name="n_days")
        m = days.merge(out, left_on="k", right_on="k")
        return pd.DataFrame({
            key_col: m["k"].to_numpy(np.int64),
            "n_days": m["n_days"].to_numpy(np.int64),
            "max_streak": m["max_streak"].to_numpy(np.int64)})

    return (ds.select_columns([key_col, day_col])
            .map_batches(pairs, batch_format="pyarrow")
            .groupby("__mb")
            .map_groups(fold, batch_format="pandas"))


def inter_arrival_profile(ds, key_col: str, ts_col: str,
                          order_cols: list[str],
                          num_buckets: int = 256):
    """Per-key inter-arrival gap profile: number of gaps, exact
    interpolating MEDIAN gap (halves — exact binary fractions, so
    DuckDB median() replays with no slack) and max gap — the
    engagement-cadence signal next to raw counts. One ``hash(key)``
    co-location fold (the sessionize per-key-volume contract); keys
    with a single row emit (0, 0.0, 0)."""

    def coarse(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, [key_col], num_buckets, "__gb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__gb")
        if df.empty:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="int64"),
                "n_gaps": pd.Series([], dtype="int64"),
                "median_gap": pd.Series([], dtype="float64"),
                "max_gap": pd.Series([], dtype="int64")})
        df = df.sort_values([key_col, *order_cols],
                            kind="mergesort").reset_index(drop=True)
        k = df[key_col].to_numpy(np.int64)
        t = df[ts_col].to_numpy(np.int64)
        gap = np.empty(len(t), dtype=np.int64)
        gap[1:] = t[1:] - t[:-1]
        gap[0] = -1
        first = np.zeros(len(k), dtype=bool)
        first[0] = True
        first[1:] = k[:-1] != k[1:]
        gap[first] = -1  # no gap on a key's first row
        rows = []
        gdf = pd.DataFrame({"k": k, "g": gap})
        for key, sub in gdf.groupby("k", sort=False):
            gs = sub["g"].to_numpy(np.int64)
            gs = gs[gs >= 0]
            if len(gs) == 0:
                rows.append((int(key), 0, 0.0, 0))
                continue
            gs.sort()
            n = len(gs)
            med = float(gs[n // 2]) if n % 2 else \
                (float(gs[n // 2 - 1]) + float(gs[n // 2])) / 2.0
            rows.append((int(key), n, med, int(gs[-1])))
        return pd.DataFrame({
            key_col: pd.Series([r[0] for r in rows], dtype="int64"),
            "n_gaps": pd.Series([r[1] for r in rows], dtype="int64"),
            "median_gap": pd.Series([r[2] for r in rows],
                                    dtype="float64"),
            "max_gap": pd.Series([r[3] for r in rows], dtype="int64")})

    cols = list(dict.fromkeys([key_col, ts_col, *order_cols]))
    return (ds.select_columns(cols)
            .map_batches(coarse, batch_format="pyarrow")
            .groupby("__gb")
            .map_groups(fold, batch_format="pandas"))


def peak_concurrency(ds, key_col: str, ts_col: str,
                     day_us: int = 86_400_000_000,
                     num_buckets: int = 256) -> pa.Table:
    """Max concurrent active keys per day — the interval-stacking
    boundary sweep (capacity planning / connection-pool sizing over an
    event log): each key's daily activity is the INCLUSIVE interval
    [first event, last event] that day; the peak is the max of the
    running +1/−1 sum with all starts ordered before ends at equal
    timestamps.

    Plan: per-block (key, day, min_us, max_us) partials (one vectorized
    groupby — raw events never shuffle), ONE coarse shuffle on
    ``hash(key, day)`` folds exact per-(key, day) intervals, a second
    tiny shuffle on ``hash(day)`` runs the per-day sweep over ≤ |keys|
    boundary rows (a day's interval set is key-bounded, never
    event-bounded). Returns (day_idx, n_keys, peak) ordered by day."""
    import pyarrow.compute as pc

    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        t = ts.to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"k": b[key_col].to_numpy(zero_copy_only=False),
                           "dd": t // day_us, "t": t})
        out = df.groupby(["k", "dd"], sort=False, as_index=False).agg(
            s=("t", "min"), e=("t", "max"))
        return pa.table({
            "k": pa.array(out["k"].to_numpy(np.int64)),
            "dd": pa.array(out["dd"].to_numpy(np.int64)),
            "s": pa.array(out["s"].to_numpy(np.int64)),
            "e": pa.array(out["e"].to_numpy(np.int64))})

    def fold_intervals(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["k", "dd"], as_index=False).agg(
            s=("s", "min"), e=("e", "max"))
        return out

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for dd, sub in df.groupby("dd", sort=False):
            t = np.concatenate([sub["s"].to_numpy(np.int64),
                                sub["e"].to_numpy(np.int64)])
            d = np.concatenate([np.ones(len(sub), dtype=np.int64),
                                -np.ones(len(sub), dtype=np.int64)])
            order = np.lexsort((-d, t))  # starts before ends at ties
            peak = int(np.cumsum(d[order]).max())
            rows.append((int(dd), len(sub), peak))
        return pd.DataFrame({
            "day_idx": pd.Series([r[0] for r in rows], dtype="int64"),
            "n_keys": pd.Series([r[1] for r in rows], dtype="int64"),
            "peak": pd.Series([r[2] for r in rows], dtype="int64")})

    parts = (ds.select_columns([key_col, ts_col])
             .map_batches(partial, batch_format="pyarrow")
             .map_batches(lambda b: append_coarse_bucket(
                 b, ["k", "dd"], num_buckets, "__b"),
                 batch_format="pyarrow")
             .groupby("__b")
             .map_groups(lambda df: fold_intervals(df.drop(columns="__b")),
                         batch_format="pandas")
             .map_batches(lambda b: append_coarse_bucket(
                 b, ["dd"], num_buckets, "__d"),
                 batch_format="pyarrow")
             .groupby("__d")
             .map_groups(lambda df: sweep(df.drop(columns="__d")),
                         batch_format="pandas"))
    out = parts.to_pandas().sort_values("day_idx").reset_index(drop=True)
    return pa.table({
        "day_idx": pa.array(out["day_idx"].to_numpy(np.int64)),
        "n_keys": pa.array(out["n_keys"].to_numpy(np.int64)),
        "peak": pa.array(out["peak"].to_numpy(np.int64))})


def calendar_densify(ds, key_col: str, ts_col: str,
                     day_us: int = 86_400_000_000) -> pa.Table:
    """Dense (key × day) event-count grid with explicit ZERO rows for
    the gaps — the gap-fill pass every per-key time-series model needs
    (a missing day is a 0, not an absent row, and downstream windows
    must see it). One distributed counting pass reduces the corpus to
    narrow (key, day, n) partials; the driver then fills the
    calendar-bounded grid (keys × days — bounded by taxonomy × time,
    never by rows) between the GLOBAL min/max day. Returns
    (key, day_idx, n_events, is_gap) ordered."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        d = ts.to_numpy(zero_copy_only=False) // day_us
        df = pd.DataFrame({
            "k": pd.Series(b[key_col].to_pylist(), dtype="object"),
            "d": d})
        g = df.groupby(["k", "d"], sort=False).size().reset_index(
            name="n")
        return pa.table({
            "k": pa.array(g["k"].to_numpy(object), pa.string()),
            "d": pa.array(g["d"].to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64))})

    parts = (ds.select_columns([key_col, ts_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby(["k", "d"], as_index=False)["n"].sum())
    if parts.empty:
        return pa.table({key_col: pa.array([], pa.string()),
                         "day_idx": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "is_gap": pa.array([], pa.int64())})
    lo, hi = int(parts["d"].min()), int(parts["d"].max())
    keys = sorted(parts["k"].unique())
    days = np.arange(lo, hi + 1, dtype=np.int64)
    grid = pd.MultiIndex.from_product([keys, days], names=["k", "d"])
    dense = parts.set_index(["k", "d"])["n"].reindex(grid, fill_value=0) \
        .reset_index()
    return pa.table({
        key_col: pa.array(dense["k"].to_numpy(object), pa.string()),
        "day_idx": pa.array(dense["d"].to_numpy(np.int64)),
        "n_events": pa.array(dense["n"].to_numpy(np.int64)),
        "is_gap": pa.array((dense["n"].to_numpy(np.int64) == 0)
                           .astype(np.int64))})
