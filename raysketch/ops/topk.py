"""Heavy hitters (CMS-scored top-k) and exact grouped top-N.

The reference ecosystem's "sparse mode" heavy-hitter tracking with
count-based decay (heka_message_monitor.lua:562-590) recast for batch:
each block emits (a) a CMS partial over ALL its keys and (b) its local
top candidates (2k by in-block count — any global heavy hitter is a local
heavy hitter in at least one block by pigeonhole when candidates ≥ k per
block). Every reduction is DISTRIBUTED:

1. CMS partials fold through coalescing map_batches levels (bulk sparse
   ``merge_many`` per task) until the driver merges a handful of
   payloads — never one payload per block on the driver.
2. Candidate rows dedupe through a coarse-bucket groupby, are scored
   against the BROADCAST merged sketch (``ray.put`` once, point-query
   batch per block), and each bucket emits only its local top-k — the
   driver sees ≤ buckets × k rows regardless of block count.

Shuffle volume: one CMS partial + ≤2k candidate rows per block.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches.cms import CMSketch

_UNION_SCHEMA = pa.schema(
    [
        ("part_kind", pa.string()),  # "cand" | "cms"
        ("token", pa.string()),
        ("n", pa.int64()),
        ("payload", pa.large_binary()),
    ]
)


def _block_partials(
    batch: pa.Table, col: str, cand_per_block: int, epsilon: float, delta: float
) -> pa.Table:
    import pyarrow.compute as pc

    vals = batch[col]
    vc = pc.value_counts(vals)
    tokens = vc.field("values").to_pylist()
    counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = [i for i, t in enumerate(tokens) if t is not None]
    tokens = [tokens[i] for i in keep]
    counts = counts[keep]

    cms = CMSketch(epsilon, delta, fast_hash=True)
    cms.update_batch(vals)

    order = np.lexsort((np.array(tokens, dtype=object), -counts))[:cand_per_block]
    cand_tokens = [str(tokens[i]) for i in order]
    cand_counts = counts[order]

    return pa.Table.from_arrays(
        [
            pa.array(["cand"] * len(cand_tokens) + ["cms"], pa.string()),
            pa.array(cand_tokens + [""], pa.string()),
            pa.array(list(cand_counts) + [0], pa.int64()),
            pa.array([b""] * len(cand_tokens) + [cms.to_bytes()], pa.large_binary()),
        ],
        schema=_UNION_SCHEMA,
    )


def _fold_cms_batch(batch: pa.Table) -> pa.Table:
    """One tree level: bulk-merge this coalesced batch of CMS payloads."""
    payloads = batch["payload"].to_pylist()
    merged = CMSketch.merge_many(payloads) if payloads else None
    out = [merged.to_bytes()] if merged else []
    return pa.table({"payload": pa.array(out, pa.large_binary())})


def cms_topk(
    ds,
    col: str,
    k: int = 20,
    epsilon: float = 1e-4,
    delta: float = 1e-3,
    batch_size: int | None = None,
    coarse_buckets: int = 256,
) -> pa.Table:
    """Top-k values of ``col`` by merged-CMS estimate.

    Returns (token, est) sorted est desc, token asc. Estimates are upper
    bounds within eps*N of truth w.p. 1-delta.
    """
    import ray

    cand_per_block = max(2 * k, 64)
    partials = ds.select_columns([col]).map_batches(
        functools.partial(
            _block_partials,
            col=col,
            cand_per_block=cand_per_block,
            epsilon=epsilon,
            delta=delta,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).materialize()

    # 1. distributed CMS fold: two coalescing levels of 64-way bulk
    # merges shrink blocks → blocks/4096 payloads before the driver merge
    import pyarrow.compute as pc

    def take_cms(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["part_kind"], "cms")).select(["payload"])

    def take_cand(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["part_kind"], "cand")).select(["token"])

    # vectorized splits (an expression mask per block); a per-row python
    # filter would copy every MB-sized CMS payload through a row dict
    cms_rows = partials.map_batches(take_cms, batch_format="pyarrow")
    folded = cms_rows.map_batches(
        _fold_cms_batch, batch_format="pyarrow", batch_size=64
    ).map_batches(_fold_cms_batch, batch_format="pyarrow", batch_size=64)
    final_payloads = [
        p for b in folded.iter_batches(batch_size=1024, batch_format="pyarrow")
        for p in b["payload"].to_pylist()
    ]
    if not final_payloads:
        return pa.table({"token": pa.array([], pa.string()),
                         "est": pa.array([], pa.int64())})
    cms = CMSketch.merge_many(final_payloads)
    cms_ref = ray.put(cms.to_bytes())

    # 2. candidates: coarse-bucket dedupe → broadcast-CMS scoring →
    # per-bucket top-k → tiny driver top-k
    cand_rows = partials.map_batches(take_cand, batch_format="pyarrow")

    def bucket(batch: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(batch, ["token"], coarse_buckets, "tb")

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["token"].drop_duplicates().tolist()
        sk = CMSketch.from_bytes(ray.get(cms_ref))
        ests = sk.point_query_batch(toks).astype(np.int64)
        order = np.lexsort((np.array(toks, dtype=object), -ests))[:k]
        return pd.DataFrame({"token": [toks[i] for i in order],
                             "est": ests[order]})

    scored = cand_rows.map_batches(bucket, batch_format="pyarrow").groupby(
        "tb"
    ).map_groups(lambda df: score_topk(df.drop(columns=["tb"])),
                 batch_format="pandas").to_pandas()
    if scored.empty:
        return pa.table({"token": pa.array([], pa.string()),
                         "est": pa.array([], pa.int64())})
    order = np.lexsort((scored["token"].to_numpy(dtype=object),
                        -scored["est"].to_numpy()))[:k]
    out = scored.iloc[order]
    return pa.table({"token": pa.array(out["token"].tolist(), pa.string()),
                     "est": pa.array(out["est"].to_numpy(np.int64), pa.int64())})


def grouped_topn(
    ds,
    group_col: str,
    order_col: str,
    n: int,
    tiebreak_col: str,
    ascending: bool = False,
    carry_cols: list[str] | None = None,
    num_buckets: int = 256,
):
    """EXACT top-``n`` rows per group by ``order_col`` (the SQL
    ``row_number() OVER (PARTITION BY g ORDER BY v) QUALIFY rn <= n``
    shape), with ``rank`` 1..n attached. Total order is deterministic:
    ``order_col`` (desc by default), ties broken by ``tiebreak_col``
    ascending — required, so reruns and both fold levels agree.

    Scale shape: rank selection commutes with pre-filtering — the global
    top-n of a group is contained in the union of per-block top-n — so
    each map task keeps at most n rows per (block, group) BEFORE the
    shuffle; the fold re-selects inside coarse hash(group) buckets. The
    shuffle therefore carries <= blocks x groups x n narrow rows, never
    the raw table. Per-group output (n rows) must fit a reduce task.

    Null semantics (verified): null GROUP keys drop (pandas groupby);
    null ORDER values sort last within their group (after all non-null
    rows in either direction) — SQL NULLS LAST.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    cols = list(
        dict.fromkeys([group_col, order_col, tiebreak_col] + (carry_cols or []))
    )

    def local_top(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        df = df.sort_values(
            [group_col, order_col, tiebreak_col],
            ascending=[True, ascending, True],
            kind="mergesort",
        )
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(n), preserve_index=False
        )

    def bucket(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, [group_col], num_buckets, "__gb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [group_col, order_col, tiebreak_col],
            ascending=[True, ascending, True],
            kind="mergesort",
        )
        out = df.groupby(group_col, sort=False).head(n).copy()
        out["rank"] = out.groupby(group_col, sort=False).cumcount() + 1
        return out

    return (
        ds.map_batches(local_top, batch_format="pyarrow")
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("__gb")
        .map_groups(
            lambda df: fold(df.drop(columns=["__gb"])), batch_format="pandas"
        )
    )


def topn_with_others(ds, group_col: str, key_col: str, value_col: str,
                     n: int = 5, num_buckets: int = 256):
    """Per-group top-N keys by an integer metric plus an ``__other__``
    rollup of everything else — the reporting primitive ("top 5
    suppliers per region, rest as one bar") plain grouped top-N can't
    express because the remainder must still be EXACTLY aggregated.

    Plan: per-block (group, key) integer-sum partials (narrow — never
    raw rows), ONE coarse ``hash(group)`` shuffle so each group's full
    key set lands in one reduce task, and the per-bucket fold ranks by
    (value DESC, key ASC), keeps N rows and collapses the tail into
    ``__other__`` (rank N+1) in the same vectorized pass. Returns a
    Dataset of (group, key string, rank int64, value int64); groups
    with ≤ N keys emit no ``__other__`` row."""
    from ..engine.hashing import append_coarse_bucket

    if n < 1:
        raise ValueError("n must be >= 1")

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi, v.astype(np.float64)):
            raise ValueError(
                f"topn_with_others: {value_col} must be integer-valued")
        df = pd.DataFrame({
            "g": pd.Series(b[group_col].to_pylist(), dtype="object"),
            "k": pd.Series(b[key_col].to_pylist(), dtype="object")
            .astype(str),
            "v": vi})
        out = df.groupby(["g", "k"], sort=False, as_index=False)["v"].sum()
        t = pa.table({"g": pa.array(out["g"].to_numpy(object), pa.string()),
                      "k": pa.array(out["k"].to_numpy(object), pa.string()),
                      "v": pa.array(out["v"].to_numpy(np.int64))})
        return append_coarse_bucket(t, ["g"], num_buckets, "__tb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["g", "k"], as_index=False)["v"].sum()
        agg = agg.sort_values(["g", "v", "k"],
                              ascending=[True, False, True],
                              kind="mergesort")
        rank = agg.groupby("g").cumcount() + 1
        head = agg[rank <= n].copy()
        head["rank"] = rank[rank <= n]
        tail = agg[rank > n]
        rows = [head]
        if not tail.empty:
            oth = tail.groupby("g", as_index=False)["v"].sum()
            oth["k"] = "__other__"
            oth["rank"] = n + 1
            rows.append(oth)
        out = pd.concat(rows, ignore_index=True)[["g", "k", "rank", "v"]]
        out["rank"] = out["rank"].astype("int64")
        return out.rename(columns={"g": group_col, "k": key_col,
                                   "v": value_col})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__tb")
            .map_groups(lambda df: fold(df.drop(columns="__tb")),
                        batch_format="pandas"))


def abc_analysis(ds, key_col: str, value_col: str,
                 a_pct: int = 80, b_pct: int = 95,
                 num_buckets: int = 256) -> pa.Table:
    """Pareto / ABC contribution analysis: keys sorted by contribution
    (value desc, key asc), classed A while the running share is within
    ``a_pct``% of the total, B within ``b_pct``%, else C — "the top
    1% of suppliers carry 60% of revenue" inventory rule. Class
    boundaries compare integers only (``cum·100 ≤ pct·total``), so the
    SQL window replay is bit-exact. Returns one row per class:
    (class, n_keys, sum_value).

    Plan: per-block (key, value) sum partials → ONE coarse
    ``hash(key)`` fold to per-key totals → the key-cardinality list
    folds on the driver for the global sort (the `_DRIVER_FOLD_LIMIT`
    discipline; swap to ``Dataset.sort`` above it)."""
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": b[key_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "v": b[value_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        out = df.groupby("k", sort=False, as_index=False)["v"].sum()
        return pa.table({
            "k": pa.array(out["k"].to_numpy(np.int64)),
            "v": pa.array(out["v"].to_numpy(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns="__ab").groupby(
            "k", as_index=False)["v"].sum()

    per_key = (ds.select_columns([key_col, value_col])
               .map_batches(partial, batch_format="pyarrow")
               .map_batches(lambda b: append_coarse_bucket(
                   b, ["k"], num_buckets, "__ab"),
                   batch_format="pyarrow")
               .groupby("__ab")
               .map_groups(fold, batch_format="pandas")
               .to_pandas())
    if per_key.empty:
        raise ValueError("abc_analysis: empty input")
    per_key = per_key.groupby("k", as_index=False)["v"].sum() \
        .sort_values(["v", "k"], ascending=[False, True],
                     kind="mergesort").reset_index(drop=True)
    v = per_key["v"].to_numpy(np.int64)
    if (v < 0).any():
        raise ValueError("abc_analysis: negative contributions")
    total = int(v.sum())
    cum = np.cumsum(v)
    cls = np.where(cum * 100 <= a_pct * total, "A",
                   np.where(cum * 100 <= b_pct * total, "B", "C"))
    out = pd.DataFrame({"abc_class": cls, "n_keys": 1, "sum_value": v}) \
        .groupby("abc_class", as_index=False).sum() \
        .sort_values("abc_class").reset_index(drop=True)
    return pa.table({
        "abc_class": pa.array(out["abc_class"].to_numpy(object),
                              pa.string()),
        "n_keys": pa.array(out["n_keys"].to_numpy(np.int64)),
        "sum_value": pa.array(out["sum_value"].to_numpy(np.int64))})


def topk_drift(ds, key_col: str, ts_col: str, split_us: int,
               k: int = 10, num_buckets: int = 256) -> pa.Table:
    """Heavy-hitter set drift across a time split: exact top-k keys by
    count before vs after ``split_us`` (ties → smaller key), reported
    as one row per key in EITHER top set with both ranks (0 = absent)
    — the "who left/entered the leaderboard" monitoring view. Exact:
    per-block (key, side, count) partials, ONE ``hash(key)`` fold to
    global per-side counts, and only the key-cardinality count table
    reaches the driver for the two rank sorts (size-route discipline).
    SQL replay: two QUALIFY rank windows, bit-exact."""
    from ..engine.hashing import append_coarse_bucket

    if k < 1:
        raise ValueError("k must be >= 1")

    def partial(b: pa.Table) -> pa.Table:
        t = b[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "k": b[key_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "side": (t >= split_us).astype(np.int64),
            "n": np.ones(len(t), np.int64)})
        out = df.groupby(["k", "side"], sort=False, as_index=False)[
            "n"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns="__tb").groupby(
            ["k", "side"], as_index=False)["n"].sum()

    counts = (ds.select_columns([key_col, ts_col])
              .map_batches(partial, batch_format="pyarrow")
              .map_batches(lambda b: append_coarse_bucket(
                  b, ["k"], num_buckets, "__tb"),
                  batch_format="pyarrow")
              .groupby("__tb")
              .map_groups(fold, batch_format="pandas")
              .to_pandas())
    counts = counts.groupby(["k", "side"], as_index=False)["n"].sum()
    tops = {}
    for side in (0, 1):
        sub = counts[counts["side"] == side] \
            .sort_values(["n", "k"], ascending=[False, True],
                         kind="mergesort").head(k).reset_index(drop=True)
        tops[side] = {int(r["k"]): i + 1
                      for i, (_, r) in enumerate(sub.iterrows())}
    full = {(int(r["k"]), int(r["side"])): int(r["n"])
            for _, r in counts.iterrows()}
    keys = sorted(set(tops[0]) | set(tops[1]))
    return pa.table({
        key_col: pa.array(keys, pa.int64()),
        "rank_before": pa.array(
            [tops[0].get(x, 0) for x in keys], pa.int64()),
        "n_before": pa.array(
            [full.get((x, 0), 0) for x in keys], pa.int64()),
        "rank_after": pa.array(
            [tops[1].get(x, 0) for x in keys], pa.int64()),
        "n_after": pa.array(
            [full.get((x, 1), 0) for x in keys], pa.int64())})
