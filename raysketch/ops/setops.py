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


def fk_orphan_counts_multi(
    edges: list, num_buckets: int = 256,
    driver_fold_limit: int = 5_000_000) -> dict[str, tuple[int, int]]:
    """Audit MANY foreign-key edges in ONE exchange: every edge's child
    count partials and parent distinct-key partials are tagged with the
    edge id and ride a single union. ``edges`` is a list of
    ``(name, child_ds, fk_col, parent_ds, pk_col)``; returns
    ``{name: (orphan_rows, orphan_keys)}``. Same per-edge semantics as
    :func:`fk_orphan_counts` (which delegates here) at a quarter of the
    pipeline launches when auditing a whole schema.

    SIZE-ROUTED reduce (the _DRIVER_FOLD_LIMIT discipline): partials
    are narrow (edge, key, n, side) rows bounded by per-block distinct
    keys; at or below ``driver_fold_limit`` one vectorized driver merge
    beats the coarse shuffle's fixed cost, above it the
    ``hash(edge, key)`` bucket fold runs (route identity test-pinned)."""
    import numpy as np
    import pandas as pd

    from ..engine.hashing import append_coarse_bucket

    if not edges:
        return {}

    def child_partial(eid: int, fk_col: str):
        def f(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "k": b[fk_col].to_numpy(zero_copy_only=False),
                "n": np.ones(b.num_rows, dtype=np.int64)})
            out = df.groupby("k", sort=False, as_index=False)["n"].sum()
            return pa.table({
                "e": pa.array(np.full(len(out), eid, dtype=np.int64)),
                "k": pa.array(out["k"].to_numpy(np.int64)),
                "n": pa.array(out["n"].to_numpy(np.int64)),
                "side": pa.array(np.zeros(len(out), dtype=np.int64))})
        return f

    def parent_partial(eid: int, pk_col: str):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            k = pc.unique(b[pk_col])
            return pa.table({
                "e": pa.array(np.full(len(k), eid, dtype=np.int64)),
                "k": k.cast(pa.int64()),
                "n": pa.array(np.zeros(len(k), dtype=np.int64)),
                "side": pa.array(np.ones(len(k), dtype=np.int64))})
        return f

    streams = []
    for eid, (_, child, fk, parent, pk) in enumerate(edges):
        streams.append(child.select_columns([fk]).map_batches(
            child_partial(eid, fk), batch_format="pyarrow"))
        streams.append(parent.select_columns([pk]).map_batches(
            parent_partial(eid, pk), batch_format="pyarrow"))
    # ONE union call, not a chained .union() tower
    tagged = streams[0].union(*streams[1:]).materialize()

    if tagged.count() <= driver_fold_limit:
        df = tagged.to_pandas()
        out = {name: (0, 0) for name, *_ in edges}
        if not df.empty:
            par = df.loc[df["side"] == 1, ["e", "k"]].drop_duplicates()
            ch = df[df["side"] == 0].groupby(
                ["e", "k"], as_index=False)["n"].sum()
            m = ch.merge(par.assign(__p=1), on=["e", "k"], how="left")
            orph = m[m["__p"].isna()]
            agg = orph.groupby("e")["n"].agg(["sum", "size"])
            for eid, (name, *_) in enumerate(edges):
                if eid in agg.index:
                    out[name] = (int(agg.loc[eid, "sum"]),
                                 int(agg.loc[eid, "size"]))
        return out

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for e, sub in df.groupby("e"):
            parent = sub.loc[sub["side"] == 1, "k"].unique()
            ch = sub[sub["side"] == 0].groupby("k", as_index=False)["n"] \
                .sum()
            orph = ch[~ch["k"].isin(parent)]
            rows.append((int(e), int(orph["n"].sum()), int(len(orph))))
        return pd.DataFrame(rows, columns=["e", "orphan_rows",
                                           "orphan_keys"])

    parts = (tagged.map_batches(
        lambda b: append_coarse_bucket(b, ["e", "k"], num_buckets, "__b"),
        batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda df: fold(df.drop(columns="__b")),
                    batch_format="pandas")
        .to_pandas())
    out = {name: (0, 0) for name, *_ in edges}
    if not parts.empty:
        agg = parts.groupby("e")[["orphan_rows", "orphan_keys"]].sum()
        for eid, (name, *_) in enumerate(edges):
            if eid in agg.index:
                out[name] = (int(agg.loc[eid, "orphan_rows"]),
                             int(agg.loc[eid, "orphan_keys"]))
    return out


def fk_orphan_counts(child_ds, parent_ds, fk_col: str, pk_col: str,
                     num_buckets: int = 256) -> tuple[int, int]:
    """Referential-integrity audit of ONE edge: how many child ROWS
    (and distinct child KEYS) reference a parent key that does not
    exist — the dangling-pointer screen a pipeline runs before joining
    fact tables at 100 TB (an orphan side silently drops rows in inner
    joins). Pre-reduced narrow (key, n) child partials and per-block
    distinct parent keys share one ``hash(key)`` exchange; neither side
    is broadcast, so fact-sized parents cost one narrow shuffle, never
    a driver gather. Delegates to :func:`fk_orphan_counts_multi` —
    schema-wide audits put every edge on the SAME exchange. Returns
    ``(orphan_rows, orphan_keys)``."""
    return fk_orphan_counts_multi(
        [("edge", child_ds, fk_col, parent_ds, pk_col)],
        num_buckets=num_buckets)["edge"]


def _pareto_front(X: np.ndarray, chunk: int = 512) -> np.ndarray:
    """Row indices of the Pareto front of ``X`` (float64, LARGER is
    better on every column). Dominance: x dominates y iff x ≥ y on all
    dims and x > y on at least one — so sum(x) > sum(y), meaning after
    a descending-sum sort every dominator precedes what it dominates.
    One scan keeps a running front; each chunk is screened against the
    (small) front vectorized, then intra-chunk in one broadcast —
    never the O(n²) all-pairs matrix. Duplicate points never dominate
    each other, so all copies survive (SQL NOT-EXISTS semantics)."""
    n = len(X)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(-X.sum(axis=1), kind="stable")
    Xs = X[order]
    front_rows: list[np.ndarray] = []
    front_idx: list[np.ndarray] = []
    for lo in range(0, n, chunk):
        C = Xs[lo:lo + chunk]
        alive = np.ones(len(C), dtype=bool)
        if front_rows:
            F = np.concatenate(front_rows)
            # F (f,d) vs C (c,d) -> (f,c) dominance screen
            ge = (F[:, None, :] >= C[None, :, :]).all(axis=2)
            gt = (F[:, None, :] > C[None, :, :]).any(axis=2)
            alive = ~(ge & gt).any(axis=0)
        if alive.any():
            S = C[alive]
            ge = (S[:, None, :] >= S[None, :, :]).all(axis=2)
            gt = (S[:, None, :] > S[None, :, :]).any(axis=2)
            dominated = (ge & gt).any(axis=0)
            keep = np.flatnonzero(alive)[~dominated]
            front_rows.append(C[keep])
            front_idx.append(order[lo + keep])
    return np.sort(np.concatenate(front_idx))


def skyline(ds, dims: dict[str, bool], keep_cols: list[str]) -> pa.Table:
    """Distributed skyline (Pareto-optimal set) over numeric columns —
    the multi-objective filter (Börzsönyi et al., ICDE 2001) a curation
    pipeline runs to keep documents no other document beats on every
    axis at once. ``dims`` maps column → True to maximize / False to
    minimize; ``keep_cols`` ride along on the survivors.

    Plan: the global skyline is contained in the union of per-block
    skylines (a dominator of x in the full set dominates x in x's own
    block too), so each block reduces to its local front inside
    ``map_batches`` — the driver folds only blocks × |local front| rows
    (fronts are tiny for correlated dims; worst case documented: an
    anti-correlated 2-D disk makes the front O(√n) and the fold pays
    it). One pass, no shuffle. Returns a driver-sized pa.Table sorted
    by ``keep_cols[0]``."""
    dcols = sorted(dims)
    sign = np.array([1.0 if dims[c] else -1.0 for c in dcols])
    out_cols = list(dict.fromkeys(keep_cols + dcols))

    def local_front(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select(out_cols)
        X = np.column_stack([
            b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in dcols]) * sign
        keep = _pareto_front(X)
        return b.select(out_cols).take(pa.array(keep, pa.int64()))

    parts = ds.map_batches(local_front, batch_format="pyarrow").to_pandas()
    X = parts[dcols].to_numpy(dtype=np.float64) * sign
    keep = _pareto_front(X)
    out = parts.iloc[keep].sort_values(keep_cols[0]).reset_index(drop=True)
    return pa.Table.from_pandas(out[out_cols], preserve_index=False)


def upsert_merge(base_ds, delta_ds, key_col: str, ver_col: str,
                 op_col: str = "op", num_buckets: int = 256):
    """CDC changeset apply (the warehouse MERGE / SCD-type-1 upsert):
    fold a base snapshot and a delta stream into the post-merge table —
    per key the row with the HIGHEST ``ver_col`` wins, and a winning
    row whose ``op_col`` is ``'D'`` (tombstone) deletes the key. Both
    inputs must already carry ``ver_col``/``op_col`` (the caller tags
    the base with version 0) and versions must be distinct per key —
    equal versions would make the winner plan-dependent, so the fold
    refuses them.

    Plan: schema-aligned union → ONE coarse shuffle on ``hash(key)``
    co-locates every version of a key → the per-bucket fold is one
    vectorized sort + drop_duplicates + tombstone filter. The merged
    table streams out of the reduce tasks; nothing gathers on the
    driver — the snapshot-scale path table_diff's narrow-partial
    design cannot provide when the OUTPUT is the full merged table."""
    from ..engine.hashing import append_coarse_bucket

    def coarse(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(b, [key_col], num_buckets, "__ub")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__ub")
        if df.empty:
            return df
        if df.duplicated([key_col, ver_col]).any():
            raise ValueError(
                "upsert_merge: duplicate (key, version) — winner would "
                "be plan-dependent")
        df = df.sort_values([key_col, ver_col], ascending=[True, False],
                            kind="mergesort").drop_duplicates(key_col)
        return df[df[op_col] != "D"].reset_index(drop=True)

    merged = (base_ds.union(delta_ds)
              .map_batches(coarse, batch_format="pyarrow")
              .groupby("__ub")
              .map_groups(fold, batch_format="pandas"))
    return merged


def join_key_discovery(column_specs: list, num_buckets: int = 64,
                       pairs: list | None = None) -> pa.Table:
    """Join-key discovery across tables (the data-catalog containment
    scan): for each candidate column pair, the exact distinct
    cardinalities, intersection, and containment |A∩B| / |A| — a
    containment near 1.0 marks a foreign-key edge worth joining on.
    BIT-PARALLEL (the vocab-overlap design): columns map to bits
    (≤ 63), every distinct VALUE reduces to one membership-bitmask
    row inside a single ``hash(value)`` fold, buckets emit only
    (mask, count) histogram rows, and all pair statistics come from
    one popcount pass — value sets never gather.

    ``column_specs`` is ``[(name, dataset, column), ...]``; ``pairs``
    selects (name_a, name_b) pairs to report (default: all ordered
    pairs). int64 key columns only (one shared hash family)."""
    from ..engine.hashing import append_coarse_bucket

    names = [n for n, _, _ in column_specs]
    if len(names) > 63:
        raise ValueError("join_key_discovery: > 63 columns")
    if len(set(names)) != len(names):
        raise ValueError("join_key_discovery: duplicate names")
    bit = {n: 1 << i for i, n in enumerate(names)}

    tagged = []
    for name, ds, col in column_specs:
        def tag(b: pa.Table, col=col, m=bit[name]) -> pa.Table:
            v = np.unique(b[col].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
            return pa.table({
                "v": pa.array(v),
                "m": pa.array(np.full(len(v), m, np.int64))})

        tagged.append(ds.select_columns([col])
                      .map_batches(tag, batch_format="pyarrow"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        masks = df.drop(columns="__jb").groupby("v")["m"] \
            .agg(lambda x: int(np.bitwise_or.reduce(
                x.to_numpy(np.int64))))
        out = pd.Series(masks.to_numpy(np.int64)).value_counts()
        return pd.DataFrame({
            "m": out.index.to_numpy(np.int64),
            "n": out.to_numpy(np.int64)})

    first, *rest = tagged
    stream = first.union(*rest) if rest else first
    hist = (stream.map_batches(lambda b: append_coarse_bucket(
                b, ["v"], num_buckets, "__jb"), batch_format="pyarrow")
            .groupby("__jb")
            .map_groups(fold, batch_format="pandas")
            .to_pandas().groupby("m", as_index=False)["n"].sum())
    masks = hist["m"].to_numpy(np.int64)
    cnt = hist["n"].to_numpy(np.int64)
    if pairs is None:
        pairs = [(a, b) for i, a in enumerate(names)
                 for b in names[i + 1:]]
    rows = []
    for na, nb in pairs:
        ba, bb = bit[na], bit[nb]
        da = int(cnt[(masks & ba) != 0].sum())
        db = int(cnt[(masks & bb) != 0].sum())
        inter = int(cnt[((masks & ba) != 0) & ((masks & bb) != 0)]
                    .sum())
        containment = inter / da if da else 0.0
        rows.append((na, nb, da, db, inter, float(
            np.sign(containment)
            * np.floor(abs(containment) * 1e6 + 0.5) / 1e6)))
    return pa.table({
        "col_a": pa.array([r[0] for r in rows], pa.string()),
        "col_b": pa.array([r[1] for r in rows], pa.string()),
        "distinct_a": pa.array([r[2] for r in rows], pa.int64()),
        "distinct_b": pa.array([r[3] for r in rows], pa.int64()),
        "inter": pa.array([r[4] for r in rows], pa.int64()),
        "containment_a_in_b": pa.array([r[5] for r in rows],
                                       pa.float64())})


def pairwise_key_overlap(ds, group_col: str, key_col: str,
                         num_buckets: int = 256) -> pa.Table:
    """Cross-group duplicate-key matrix: for every unordered group pair
    (a < b), how many distinct key values both groups contain
    (``n_keys``) and how many cross-group row pairs share a key
    (``n_pairs`` = Σ_key cnt_a·cnt_b) — the contamination/mirror screen
    between sources when ``key_col`` is a content fingerprint.

    Plan: per-block (key, group) exact count partials (one vectorized
    groupby), ONE coarse shuffle on ``hash(key)`` so each key's full
    per-group count vector folds in one bucket; each bucket emits
    group-pair partial sums (taxonomy² tiny rows) and the driver adds
    them. Keys never co-locate by group, so group skew cannot hot-spot
    the shuffle. Returns (group_a, group_b, n_keys, n_pairs) ordered."""
    from ..engine.hashing import append_coarse_bucket

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": pd.Series(b[key_col].to_pylist(), dtype="object"),
            "g": pd.Series(b[group_col].to_pylist(), dtype="object"),
            "n": np.ones(b.num_rows, dtype=np.int64)})
        out = df.groupby(["k", "g"], sort=False, as_index=False)["n"].sum()
        t = pa.table({
            "k": pa.array(out["k"].to_numpy(object), pa.string()),
            "g": pa.array(out["g"].to_numpy(object), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64))})
        return append_coarse_bucket(t, ["k"], num_buckets, "__kb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["k", "g"], as_index=False)["n"].sum()
        m = agg.merge(agg, on="k")
        m = m[m["g_x"] < m["g_y"]]
        if m.empty:
            return pd.DataFrame({
                "group_a": pd.Series([], dtype="object"),
                "group_b": pd.Series([], dtype="object"),
                "n_keys": pd.Series([], dtype="int64"),
                "n_pairs": pd.Series([], dtype="int64")})
        m["p"] = m["n_x"] * m["n_y"]
        out = m.groupby(["g_x", "g_y"], as_index=False).agg(
            n_keys=("k", "nunique"), n_pairs=("p", "sum"))
        return pd.DataFrame({
            "group_a": out["g_x"].to_numpy(object),
            "group_b": out["g_y"].to_numpy(object),
            "n_keys": out["n_keys"].to_numpy(np.int64),
            "n_pairs": out["n_pairs"].to_numpy(np.int64)})

    parts = (ds.select_columns([group_col, key_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("__kb")
             .map_groups(lambda df: fold(df.drop(columns="__kb")),
                         batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pa.table({"group_a": pa.array([], pa.string()),
                         "group_b": pa.array([], pa.string()),
                         "n_keys": pa.array([], pa.int64()),
                         "n_pairs": pa.array([], pa.int64())})
    agg = parts.groupby(["group_a", "group_b"], as_index=False) \
        [["n_keys", "n_pairs"]].sum().sort_values(["group_a", "group_b"])
    return pa.table({
        "group_a": pa.array(agg["group_a"].to_numpy(object), pa.string()),
        "group_b": pa.array(agg["group_b"].to_numpy(object), pa.string()),
        "n_keys": pa.array(agg["n_keys"].to_numpy(np.int64)),
        "n_pairs": pa.array(agg["n_pairs"].to_numpy(np.int64))})
