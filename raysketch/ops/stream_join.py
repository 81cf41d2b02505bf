"""Time/range join operators — as-of join and interval (range) join.

The reference engine has no relational joins at all (SURVEY.md §2.8);
these are the two time-axis join shapes every training-data / telemetry
pipeline eventually needs and that Ray Data's native ``Dataset.join``
(equi-key hash join) cannot express:

- :func:`asof_join` — for each left row, attach the right row with the
  greatest right timestamp <= the left timestamp for the same key
  ("most recent fact as of this event"). Size-routed like the near-dup
  verify gathers (ops/dedup.py): a BROADCAST plan when the right side is
  driver-bounded (``ray.put`` once, one vectorized ``pd.merge_asof``
  match per left batch, no shuffle — the left side streams and fuses
  with its read), and a PARTITIONED plan above the limit (both sides
  shuffled once on ``hash(key) % num_buckets``, the per-bucket fold runs
  one vectorized match over that bucket's keys).
- :func:`interval_join` — point-in-interval join of a streaming point
  table against a broadcast interval table (maintenance windows, sliding
  windows, session ranges). Intervals may OVERLAP arbitrarily; matching
  is two ``np.searchsorted`` probes on the lo-sorted starts bounded by
  the max interval length, then an exact hi mask — O(log n + hits) per
  point, fully vectorized per batch, shuffle-free.

Determinism contract (both ops feed hash-compared oracles): as-of ties
on equal right timestamps resolve to the row with the LARGEST
``tiebreak`` column value; interval matches are exact set semantics.

Exactness: pandas sees only (key, ts-in-us, tiebreak, row-index)
columns — the MATCH is computed in pandas (``merge_asof``) but every
VALUE column rides Arrow ``take`` end-to-end, so int64 ids never pass
through a nullable-float widening (CLAUDE.md round-3 fact: nullable
int64 → float64 rounds above 2^53).

Scale notes: the partitioned as-of plan co-locates each key's rows in
one reduce task — per-key volume must fit a task (salt hot keys by time
range if not, as with every per-key fold in this engine); the broadcast
plans ship the small side once per node via the object store, never per
batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Right sides at or under this many rows take the broadcast plan (narrow
# key/ts/value columns: ~50 MB at the default — comfortably one object
# store entry). Above it, the partitioned plan shuffles both sides once.
ASOF_BROADCAST_ROWS = 2_000_000

_TS_US = "__t_us"  # internal int64-microsecond join axis
_SIDE = "__side"  # union marker: 0 = right, 1 = left
_BUCKET = "__jb"  # coarse shuffle bucket


def _to_us(col) -> pa.ChunkedArray:
    """Timestamp/integer column → int64 microseconds (timestamps cast
    bit-exact; plain ints pass through as already-epoch values)."""
    t = col.type
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            col = pc.cast(col, pa.timestamp("us"))
    return pc.cast(col, pa.int64())


def _np_key(col) -> np.ndarray:
    """Join-key column → numpy for the pandas match frame (object for
    strings, native for numerics; null keys become NaN/None and simply
    never match — merge_asof NaN semantics)."""
    return col.to_numpy(zero_copy_only=False)


def _prep_right(r_tbl: pa.Table, key: str, tiebreak: str) -> pa.Table:
    """Resolve duplicate (key, ts) right rows to the max-``tiebreak`` row
    and sort by ts — ``merge_asof`` would otherwise pick whichever sorted
    last, making the join nondeterministic under ties. Null-key/null-ts
    rows drop FIRST (they can never match, and leaving them in would
    float-widen an int64 key in the pandas match frame). Returns the
    reordered ARROW table (values untouched)."""
    if r_tbl.num_rows == 0:
        return r_tbl
    valid = pc.and_(pc.is_valid(r_tbl[key]), pc.is_valid(r_tbl[_TS_US]))
    if not pc.all(valid).as_py():
        r_tbl = r_tbl.filter(valid)
        if r_tbl.num_rows == 0:
            return r_tbl
    df = pd.DataFrame(
        {
            "k": _np_key(r_tbl[key]),
            "t": r_tbl[_TS_US].to_numpy(zero_copy_only=False),
            "b": r_tbl[tiebreak].to_numpy(zero_copy_only=False),
            "i": np.arange(r_tbl.num_rows, dtype=np.int64),
        }
    )
    df = df.sort_values(["t", "b"], kind="mergesort").drop_duplicates(
        ["k", "t"], keep="last"
    )
    df = df.sort_values("t", kind="mergesort")
    return r_tbl.take(pa.array(df["i"].to_numpy(), pa.int64()))


def _asof_match(l_tbl: pa.Table, r_prepped: pa.Table, l_key: str, r_key: str) -> np.ndarray:
    """Backward as-of match of ``l_tbl`` against a ``_prep_right``-ed
    right side. Returns an int64 right-row index per left row IN THE
    LEFT TABLE'S ORIGINAL ORDER (-1 = unmatched). Only (key, ts,
    row-index) ever enter pandas; values stay in Arrow. Null-key left
    rows never match and never enter the match frame (keeping the key
    column's native dtype — a null int64 would float-widen it and break
    merge_asof's dtype check)."""
    n = l_tbl.num_rows
    idx = np.full(n, -1, dtype=np.int64)
    if n == 0 or r_prepped.num_rows == 0:
        return idx
    valid = pc.and_(pc.is_valid(l_tbl[l_key]), pc.is_valid(l_tbl[_TS_US]))
    if pc.all(valid).as_py():
        pos = np.arange(n, dtype=np.int64)
        l_sub = l_tbl
    else:
        mask = valid.to_numpy(zero_copy_only=False)
        pos = np.flatnonzero(mask).astype(np.int64)
        if len(pos) == 0:
            return idx
        l_sub = l_tbl.filter(valid)
    lf = pd.DataFrame(
        {
            "k": _np_key(l_sub[l_key]),
            _TS_US: l_sub[_TS_US].to_numpy(zero_copy_only=False),
            "i": pos,
        }
    ).sort_values(_TS_US, kind="mergesort")
    rf = pd.DataFrame(
        {
            "k": _np_key(r_prepped[r_key]),
            _TS_US: r_prepped[_TS_US].to_numpy(zero_copy_only=False),
            "__ri": np.arange(r_prepped.num_rows, dtype=np.int64),
        }
    )
    m = pd.merge_asof(lf, rf, on=_TS_US, by="k", direction="backward")
    ri = m["__ri"].to_numpy()
    if ri.dtype.kind == "f":  # NaN where unmatched
        ri = np.where(np.isnan(ri), -1, ri)
    idx[m["i"].to_numpy()] = ri.astype(np.int64)
    return idx


def _assemble(
    l_tbl: pa.Table,
    r_prepped: pa.Table,
    idx: np.ndarray,
    left_cols: list[str],
    right_vals: list[str],
    rtypes: dict[str, pa.DataType],
    how: str,
) -> pa.Table:
    """Joined output: left rows (original order) + right value columns
    taken by matched row index in Arrow (nulls where idx == -1)."""
    if how == "inner":
        keep = idx >= 0
        l_tbl = l_tbl.filter(pa.array(keep))
        idx = idx[keep]
    out = l_tbl.select(left_cols)
    if r_prepped.num_rows == 0:
        for c in right_vals:
            out = out.append_column(c, pa.nulls(out.num_rows, rtypes[c]))
        return out
    mask = idx < 0
    take = pa.array(np.where(mask, 0, idx), pa.int64())
    null_sel = pa.array(mask)
    for c in right_vals:
        col = pc.take(r_prepped[c], take)
        if mask.any():
            col = pc.if_else(null_sel, pa.nulls(1, rtypes[c])[0], col)
        out = out.append_column(c, col)
    return out


def asof_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tiebreak: str | None = None,
    how: str = "left",
    broadcast_rows_limit: int = ASOF_BROADCAST_ROWS,
    num_buckets: int = 256,
):
    """Backward as-of join: each left row gains ``right_vals`` from the
    right row with the greatest ``right_ts`` <= ``left_ts`` sharing its
    key (equal timestamps match). Ties on ``right_ts`` take the row with
    the largest ``tiebreak`` (default: first of ``right_vals``) so the
    result is deterministic. ``how="left"`` keeps unmatched left rows
    with nulls, ``"inner"`` drops them.

    Plan is routed by right-side row count (counted on the pruned
    projection): at or under ``broadcast_rows_limit`` the right side
    ships once via ``ray.put`` and every left batch resolves with one
    vectorized match — no shuffle, the left side fuses with its read.
    Above the limit both sides shuffle ONCE on ``hash(key) %
    num_buckets`` and each bucket folds with the same vectorized match.
    """
    import ray

    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    if not right_vals:
        raise ValueError("right_vals must name at least one column")
    tiebreak = tiebreak or right_vals[0]
    rval_cols = list(dict.fromkeys(right_vals + [tiebreak]))
    right_cols = [right_key, right_ts] + [
        c for c in rval_cols if c not in (right_key, right_ts)
    ]
    left_schema = left_ds.schema()
    left_cols = list(left_schema.names)
    clash = set(right_vals) & set(left_cols)
    if clash:
        raise ValueError(f"right_vals collide with left columns: {sorted(clash)}")

    # types come from the UN-projected right side: projecting an empty
    # dataset loses its schema entirely (observed on Ray 2.49)
    rschema = right_ds.schema(fetch_if_missing=True)
    if rschema is None:
        raise ValueError("right_ds has no schema (fully schema-less empty input)")
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types) if n in right_cols}
    missing = [c for c in right_cols if c not in rtypes]
    if missing:
        raise ValueError(f"right_ds lacks columns: {missing}")
    right_proj = right_ds.select_columns(right_cols)

    def with_us(tbl: pa.Table, ts_col: str) -> pa.Table:
        return tbl.append_column(_TS_US, _to_us(tbl[ts_col]))

    n_right = right_proj.count()

    if n_right <= broadcast_rows_limit:
        # ---- broadcast plan: gather the pruned right side, dedupe ties
        # ONCE on the driver, ship via the object store; left streams.
        parts = [
            with_us(b, right_ts)
            for b in right_proj.iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
        ]
        if parts:
            r_tbl = pa.concat_tables(parts)
        else:
            r_tbl = pa.schema(
                [(c, rtypes[c]) for c in right_cols] + [(_TS_US, pa.int64())]
            ).empty_table()
        # tiebreak on the raw ts column == tiebreak on _TS_US (monotone cast)
        r_prepped = _prep_right(
            r_tbl, right_key, tiebreak if tiebreak != right_ts else _TS_US
        )
        r_ref = ray.put(r_prepped)

        # stateless fn (not an actor): keeps operator fusion with the
        # upstream read; ray.get is a shared-memory read per call
        def attach(batch: pa.Table) -> pa.Table:
            r = ray.get(r_ref)
            l_tbl = with_us(batch, left_ts)
            idx = _asof_match(l_tbl, r, left_key, right_key)
            return _assemble(l_tbl, r, idx, left_cols, right_vals, rtypes, how)

        return left_ds.map_batches(attach, batch_format="pyarrow")

    # ---- partitioned plan: one shuffle each side on hash(key), fold per
    # coarse bucket. Sides union under an aligned null-padded schema; the
    # fold splits them back and matches in Arrow (values never widen).
    from ..engine.hashing import hash64_batch_aligned

    ltypes = dict(zip(left_schema.names, left_schema.types))
    # right non-key columns ride the union under internal __r_ names so a
    # right column can never collide with a left column (e.g. both "ts")
    pad_right = [c for c in right_cols if c != right_key]
    rname = {c: f"__r_{c}" for c in pad_right}

    def bucket_col(hashes: np.ndarray) -> pa.Array:
        return pa.array(
            (hashes % np.uint64(num_buckets)).astype(np.int64), pa.int64()
        )

    def tag_left(b: pa.Table) -> pa.Table:
        hk, _ = hash64_batch_aligned(b[left_key])
        n = b.num_rows
        b = with_us(b, left_ts)
        b = b.append_column(_SIDE, pa.array(np.ones(n, np.int8), pa.int8()))
        for c in pad_right:
            b = b.append_column(rname[c], pa.nulls(n, rtypes[c]))
        b = b.append_column(_BUCKET, bucket_col(hk))
        return b.select(
            left_cols + [_TS_US, _SIDE] + [rname[c] for c in pad_right] + [_BUCKET]
        )

    def tag_right(b: pa.Table) -> pa.Table:
        hk, _ = hash64_batch_aligned(b[right_key])
        n = b.num_rows
        b = with_us(b, right_ts)
        out = {}
        for c in left_cols:
            out[c] = (
                pc.cast(b[right_key], ltypes[c])
                if c == left_key
                else pa.nulls(n, ltypes[c])
            )
        tbl = pa.table(out)
        tbl = tbl.append_column(_TS_US, b[_TS_US])
        tbl = tbl.append_column(_SIDE, pa.array(np.zeros(n, np.int8), pa.int8()))
        for c in pad_right:
            tbl = tbl.append_column(rname[c], b[c])
        return tbl.append_column(_BUCKET, bucket_col(hk))

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_proj.map_batches(tag_right, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [(c, ltypes[c]) for c in left_cols]
        + [(c, rtypes[c]) for c in right_vals]
    )

    def fold(tbl: pa.Table) -> pa.Table:
        side = tbl[_SIDE].to_numpy(zero_copy_only=False)
        l_tbl = tbl.filter(pa.array(side == 1)).select(left_cols + [_TS_US])
        if l_tbl.num_rows == 0:
            return out_schema.empty_table()
        r_tbl = tbl.filter(pa.array(side == 0)).select(
            [left_key, _TS_US] + [rname[c] for c in pad_right]
        )
        # restore real right names (key rode in under the left key name)
        r_tbl = r_tbl.rename_columns(
            [right_key]
            + [_TS_US]
            + pad_right
        )
        r_prepped = _prep_right(
            r_tbl, right_key, tiebreak if tiebreak != right_ts else _TS_US
        )
        idx = _asof_match(l_tbl, r_prepped, left_key, right_key)
        return _assemble(
            l_tbl, r_prepped, idx, left_cols, right_vals, rtypes, how
        ).cast(out_schema)

    return tagged.groupby(_BUCKET).map_groups(fold, batch_format="pyarrow")


def interval_join(
    points_ds,
    intervals: "pa.Table | pd.DataFrame",
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    id_col: str = "interval_id",
    carry_cols: list[str] | None = None,
):
    """Point-in-interval join: emit one row per (point, matching interval)
    with the interval's ``id_col`` attached. Intervals are half-open
    ``[lo, hi)``, may overlap arbitrarily, and are BROADCAST (a window /
    calendar table is driver-sized by construction; a billion-interval
    side wants the partitioned as-of machinery instead).

    Matching is exact and vectorized: intervals sort by ``lo`` once on
    the driver; each point probes ``searchsorted`` twice — candidates are
    the starts in ``(p - max_len, p]`` — then an exact ``p < hi`` mask
    trims them. Points with no match drop (inner join). ``carry_cols``
    limits which point columns ride the expansion (default: all); the
    expansion fuses with any downstream map-side aggregation, so matched
    rows need not cross the object store at all.
    """
    import ray

    idf = intervals.to_pandas() if isinstance(intervals, pa.Table) else intervals
    if len(idf) == 0:
        raise ValueError("intervals table is empty")
    lo = idf[lo_col].to_numpy()
    hi = idf[hi_col].to_numpy()
    if np.issubdtype(lo.dtype, np.datetime64):
        lo = lo.astype("datetime64[us]").astype(np.int64)
        hi = hi.astype("datetime64[us]").astype(np.int64)
    lo = lo.astype(np.int64)
    hi = hi.astype(np.int64)
    if (hi <= lo).any():
        raise ValueError("every interval needs hi > lo (half-open [lo, hi))")
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    ids = np.asarray(idf[id_col].to_numpy())[order]
    max_len = int((hi - lo).max())
    ref = ray.put((lo, hi, ids))
    id_is_int = np.issubdtype(ids.dtype, np.integer)

    def expand(batch: pa.Table) -> pa.Table:
        lo_a, hi_a, id_a = ray.get(ref)  # shared-memory read
        if carry_cols is not None:
            batch = batch.select(list(dict.fromkeys(carry_cols + [point_col])))
        p = _to_us(batch[point_col]).to_numpy(zero_copy_only=False)
        # candidates: lo in (p - max_len, p]  (lo <= p; and p < hi => lo > p - max_len)
        start = np.searchsorted(lo_a, p - max_len, side="right")
        stop = np.searchsorted(lo_a, p, side="right")
        counts = stop - start
        rows = np.repeat(np.arange(len(p)), counts)
        if len(rows) == 0:
            empty = batch.take(pa.array([], pa.int64()))
            return empty.append_column(
                id_col,
                pa.array([], pa.int64() if id_is_int else pa.string()),
            )
        # per-row candidate ranges → one flat index array
        offsets = np.concatenate(([0], np.cumsum(counts)))
        flat = (
            np.arange(offsets[-1])
            - np.repeat(offsets[:-1], counts)
            + np.repeat(start, counts)
        )
        keep = p[rows] < hi_a[flat]  # exact mask over length-bounded candidates
        rows, flat = rows[keep], flat[keep]
        out = batch.take(pa.array(rows, pa.int64()))
        return out.append_column(id_col, pa.array(id_a[flat]))

    return points_ds.map_batches(expand, batch_format="pyarrow")
