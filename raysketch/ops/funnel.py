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


def transition_matrix(ds, user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      order_col: str = "event_id",
                      num_buckets: int = 256) -> pa.Table:
    """First-order Markov transition matrix over per-user event
    sequences: for every ordered type pair (prev, nxt) that appears as
    consecutive events of one user (ordered by ``(ts, order_col)``),
    emit the exact transition count and ``p = round6(n / n_from)``
    where ``n_from`` is all transitions leaving ``prev`` — the
    row-stochastic estimate a sequence model trains on.

    Plan: ONE coarse shuffle on ``hash(user) % num_buckets`` co-locates
    each user's events (the sessionize/funnel contract); the per-bucket
    fold is one vectorized sort + shift + pair groupby and emits at most
    |V|² tiny count rows per bucket; the driver sums buckets. Shuffle
    volume is (user, ts, order, type) — value columns never move.
    Returns a driver-sized pa.Table (|V|² is taxonomy-bounded
    regardless of corpus size), ordered by (prev_type, next_type)."""
    import pyarrow.compute as pc

    from ..engine.hashing import append_coarse_bucket

    def coarse(b: pa.Table) -> pa.Table:
        b = b.select([user_col, ts_col, order_col, type_col])
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):  # normalize ns/ms inputs
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        else:
            ts = pc.cast(ts, pa.int64())
        b = b.set_column(b.schema.get_field_index(ts_col), ts_col, ts)
        return append_coarse_bucket(b, [user_col], num_buckets, "__b")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"prev_type": pd.Series([], dtype="object"),
                                 "next_type": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        df = df.sort_values([user_col, ts_col, order_col], kind="stable")
        same = df[user_col].to_numpy() == df[user_col].shift(1).to_numpy()
        out = (pd.DataFrame({
            "prev_type": df[type_col].shift(1).to_numpy(object),
            "next_type": df[type_col].to_numpy(object)})[same]
            .groupby(["prev_type", "next_type"]).size().rename("n")
            .reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    parts = (ds.map_batches(coarse, batch_format="pyarrow")
             .groupby("__b")
             .map_groups(lambda df: fold(df.drop(columns="__b")),
                         batch_format="pandas"))
    agg = parts.to_pandas()
    if agg.empty:
        return pa.table({"prev_type": pa.array([], pa.string()),
                         "next_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "p": pa.array([], pa.float64())})
    agg = agg.groupby(["prev_type", "next_type"], as_index=False)["n"].sum()
    agg["n_from"] = agg.groupby("prev_type")["n"].transform("sum")
    agg = agg.sort_values(["prev_type", "next_type"]).reset_index(drop=True)

    def r6(x):
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    return pa.table({
        "prev_type": pa.array(agg["prev_type"].to_numpy(object),
                              pa.string()),
        "next_type": pa.array(agg["next_type"].to_numpy(object),
                              pa.string()),
        "n": pa.array(agg["n"].to_numpy(np.int64)),
        "p": pa.array(r6(agg["n"].to_numpy(np.int64).astype(np.float64)
                         / agg["n_from"].to_numpy(np.int64)
                         .astype(np.float64)), pa.float64()),
    })


def assoc_rules(ds, user_col: str = "user_id",
                item_col: str = "event_type", num_buckets: int = 256):
    """Market-basket association rules over an event stream: for every
    ordered item pair (a, b), a ≠ b, that co-occurs in at least one
    user's basket (the user's DISTINCT item set), emit

        support    = n_ab / N          (fraction of users with both)
        confidence = n_ab / n_a        (P(b | a))
        lift       = (n_ab · N) / (n_a · n_b)

    on exact integer counts, ratios round6 — the SQL oracle replays
    every expression. Returns a driver-sized pa.Table of (a, b, n_ab,
    support, confidence, lift) ordered by (a, b): the item vocabulary
    is small and fixed (event taxonomies, product catalogs' top level),
    so the result is |V|² rows regardless of corpus size.

    Plan: per-block DISTINCT (user, item) partials → ONE coarse shuffle
    on hash(user) (baskets co-located; a user MAY span blocks, so the
    fold re-distincts inside the bucket — block-level distinct is only
    a volume reducer) → each bucket builds its users × V presence
    matrix and reduces to ONE (V×V pair-count matmul, V item counts,
    user count) partial → the driver sums buckets × (V² + V + 1) tiny
    rows. Shuffle volume is distinct (user, item) pairs, never raw
    events."""
    from ..engine.hashing import append_coarse_bucket

    def pairs(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": b[user_col].to_numpy(zero_copy_only=False),
            "it": b[item_col].to_pylist()}).drop_duplicates()
        return pa.table({"u": pa.array(df["u"].to_numpy(np.int64)),
                         "it": pa.array(df["it"].to_numpy(object),
                                        pa.string())})

    def bucket(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(b, ["u"], num_buckets, "__b")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["u", "it"])
        if df.empty:
            return pd.DataFrame({"a": pd.Series([], dtype="object"),
                                 "b": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        items = np.asarray(sorted(df["it"].unique()), dtype=object)
        ii = pd.Index(items)
        u_codes, _ = pd.factorize(df["u"], sort=False)
        i_codes = ii.get_indexer(df["it"])
        P = np.zeros((u_codes.max() + 1, len(items)), dtype=np.int64)
        P[u_codes, i_codes] = 1
        M = P.T @ P  # co-occurrence counts; diagonal = item counts
        a_ix, b_ix = np.nonzero(M)
        out = pd.DataFrame({"a": items[a_ix], "b": items[b_ix],
                            "n": M[a_ix, b_ix]})
        nu = pd.DataFrame({"a": ["\x00users"], "b": ["\x00users"],
                           "n": [P.shape[0]]})
        return pd.concat([out, nu], ignore_index=True)

    parts = (ds.map_batches(pairs, batch_format="pyarrow")
             .map_batches(bucket, batch_format="pyarrow")
             .groupby("__b")
             .map_groups(lambda df: fold(df.drop(columns="__b")),
                         batch_format="pandas"))
    tot = parts.to_pandas().groupby(["a", "b"], as_index=False)["n"].sum()
    n_users = int(tot.loc[tot["a"] == "\x00users", "n"].sum())
    tot = tot[tot["a"] != "\x00users"]
    diag = tot[tot["a"] == tot["b"]].set_index("a")["n"]
    rules = tot[tot["a"] != tot["b"]].sort_values(["a", "b"]) \
        .reset_index(drop=True)
    n_ab = rules["n"].to_numpy(np.int64)
    n_a = diag.reindex(rules["a"]).to_numpy(np.int64)
    n_b = diag.reindex(rules["b"]).to_numpy(np.int64)

    def r6(x):
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    fab = n_ab.astype(np.float64)
    return pa.table({
        "a": pa.array(rules["a"].to_numpy(object), pa.string()),
        "b": pa.array(rules["b"].to_numpy(object), pa.string()),
        "n_ab": pa.array(n_ab, pa.int64()),
        "support": pa.array(r6(fab / np.float64(n_users)), pa.float64()),
        "confidence": pa.array(r6(fab / n_a.astype(np.float64)),
                               pa.float64()),
        "lift": pa.array(r6((fab * np.float64(n_users))
                            / (n_a.astype(np.float64)
                               * n_b.astype(np.float64))), pa.float64()),
    })


def cohort_retention(ds, user_col: str = "user_id", ts_col: str = "ts",
                     week_us: int = 604_800_000_000,
                     num_buckets: int = 256) -> pa.Table:
    """Cohort retention matrix: users are cohorted by the week of their
    FIRST event (integer week = epoch_us // week_us — no calendar
    arithmetic, replayable in SQL); each (cohort_week, week_offset)
    cell counts the cohort's users active that week, with
    ``retention = round6(n_active / cohort_size)``.

    Plan: per-block DISTINCT (user, week) partials → ONE coarse shuffle
    on hash(user) (a user's whole history co-locates, so the in-bucket
    min week IS the global cohort) → each bucket emits (cohort, offset)
    count partials → the driver folds buckets × cohorts × offsets tiny
    rows. Shuffle volume is distinct (user, week) pairs, never raw
    events. Returns a driver-sized pa.Table (cohorts × offsets is
    calendar-bounded regardless of corpus size)."""
    import pyarrow.compute as pc

    from ..engine.hashing import append_coarse_bucket

    def pairs(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):  # normalize ns/ms inputs
            ts = pc.cast(ts, pa.timestamp("us"))
        us = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
        w = us // week_us
        df = pd.DataFrame({
            "u": b[user_col].to_numpy(zero_copy_only=False),
            "w": w}).drop_duplicates()
        return pa.table({"u": pa.array(df["u"].to_numpy(np.int64)),
                         "w": pa.array(df["w"].to_numpy(np.int64))})

    def bucket(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(b, ["u"], num_buckets, "__b")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "cohort_week": pd.Series([], dtype="int64"),
                "week_offset": pd.Series([], dtype="int64"),
                "n_active": pd.Series([], dtype="int64")})
        df = df.drop_duplicates(["u", "w"])  # users span blocks
        df["cw"] = df.groupby("u")["w"].transform("min")
        out = (df.assign(off=df["w"] - df["cw"])
               .groupby(["cw", "off"]).size().rename("n_active")
               .reset_index())
        out.columns = ["cohort_week", "week_offset", "n_active"]
        return out.astype("int64")

    parts = (ds.map_batches(pairs, batch_format="pyarrow")
             .map_batches(bucket, batch_format="pyarrow")
             .groupby("__b")
             .map_groups(lambda df: fold(df.drop(columns="__b")),
                         batch_format="pandas"))
    agg = parts.to_pandas().groupby(
        ["cohort_week", "week_offset"], as_index=False)["n_active"].sum()
    size = agg.loc[agg["week_offset"] == 0,
                   ["cohort_week", "n_active"]] \
        .rename(columns={"n_active": "cohort_size"})
    agg = agg.merge(size, on="cohort_week") \
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)

    def r6(x):
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    return pa.table({
        "cohort_week": pa.array(agg["cohort_week"].astype("int64")),
        "week_offset": pa.array(agg["week_offset"].astype("int64")),
        "n_active": pa.array(agg["n_active"].astype("int64")),
        "cohort_size": pa.array(agg["cohort_size"].astype("int64")),
        "retention": pa.array(
            r6(agg["n_active"].to_numpy(np.int64).astype(np.float64)
               / agg["cohort_size"].to_numpy(np.int64).astype(np.float64)),
            pa.float64()),
    })


def session_paths(ds, user_col: str, ts_col: str, type_col: str,
                  tiebreak_col: str, gap_us: int, k: int = 3,
                  top_n: int = 20, num_buckets: int = 256) -> pa.Table:
    """Top common session-opening paths: sessionize each user's event
    stream by gap (> ``gap_us`` starts a new session, the
    ``ops/window.sessionize`` rule), take each session's FIRST ``k``
    event types in (ts, tiebreak) order, join them into a path string
    ("view > cart > buy"), and return the ``top_n`` paths by session
    count — the entry-journey report a product pipeline derives from a
    clickstream.

    Plan: ONE coarse ``hash(user)`` shuffle co-locates each user's
    events; the per-bucket fold is vectorized end-to-end (sort, gap
    flags, cumsum session ids, rank, pivot the first-k ranks into k
    string COLUMNS and concat column-wise — never a per-session Python
    join) and emits (path, n) partials; the driver folds path counts
    (bounded by |event types|^k, a domain, not a row count) and cuts
    ``top_n`` by (n DESC, path ASC)."""
    from ..engine.hashing import append_coarse_bucket

    if gap_us <= 0 or k < 1 or top_n < 1:
        raise ValueError("gap_us, k and top_n must be positive")

    def coarse(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.select([user_col, ts_col, tiebreak_col, type_col])
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        b = b.append_column("__t", pc.cast(ts, pa.int64()))
        return append_coarse_bucket(b, [user_col], num_buckets, "__pb")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"path": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        df = df.sort_values([user_col, "__t", tiebreak_col],
                            kind="mergesort").reset_index(drop=True)
        u = df[user_col].to_numpy()
        t = df["__t"].to_numpy(np.int64)
        new = np.ones(len(df), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > gap_us)
        sid = np.cumsum(new)
        df = df.assign(__sid=sid)
        df["__r"] = df.groupby("__sid").cumcount()
        head = df[df["__r"] < k]
        pv = head.pivot(index="__sid", columns="__r", values=type_col)
        path = pv[0].astype(str)
        for i in range(1, k):
            if i in pv.columns:
                ext = path + " > " + pv[i].astype(str)
                path = path.where(pv[i].isna(), ext)
        out = path.groupby(path).size().rename("n").reset_index(name="n")
        out.columns = ["path", "n"]
        return out

    parts = (ds.map_batches(coarse, batch_format="pyarrow")
             .groupby("__pb")
             .map_groups(lambda df: fold(df.drop(columns="__pb")),
                         batch_format="pandas")).to_pandas()
    agg = parts.groupby("path", as_index=False)["n"].sum() \
        .sort_values(["n", "path"], ascending=[False, True],
                     kind="mergesort").head(top_n).reset_index(drop=True)
    return pa.table({
        "path": pa.array(agg["path"].to_numpy(object), pa.string()),
        "n_sessions": pa.array(agg["n"].to_numpy(np.int64), pa.int64())})


def new_vs_returning(ds, key_col: str, ts_col: str,
                     bucket_us: int = 86_400_000_000,
                     num_buckets: int = 256):
    """Daily new-vs-returning actives: per time bucket the distinct
    active keys and how many of them are globally NEW (their first-ever
    bucket is this one) — the growth-accounting split every usage
    dashboard opens with. Exact and one-shuffle: distinct (key, bucket)
    pairs stream out of per-block pre-reduces, each key's full history
    lands in ONE ``hash(key)`` fold which tags its min bucket, and the
    per-bucket rollup is a second narrow fold over (bucket, new-flag)
    counts. SQL replay: min() over a window, bit-exact int64."""

    def pairs(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        df = pd.DataFrame({
            "k": b[key_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "bkt": (b[ts_col].to_numpy(zero_copy_only=False)
                    .astype(np.int64) // bucket_us)})
        df = df.drop_duplicates()
        t = pa.table({"k": pa.array(df["k"].to_numpy(np.int64)),
                      "bkt": pa.array(df["bkt"].to_numpy(np.int64))})
        return append_coarse_bucket(t, ["k"], num_buckets, "__nb")

    def key_fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__nb").drop_duplicates(["k", "bkt"])
        first = df.groupby("k")["bkt"].transform("min")
        out = pd.DataFrame({
            "bkt": df["bkt"],
            "n_active": np.ones(len(df), np.int64),
            "n_new": (df["bkt"].to_numpy(np.int64)
                      == first.to_numpy(np.int64)).astype(np.int64)}) \
            .groupby("bkt", as_index=False).sum()
        return out

    parts = (ds.select_columns([key_col, ts_col])
             .map_batches(pairs, batch_format="pyarrow")
             .groupby("__nb")
             .map_groups(key_fold, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("bkt", as_index=False).sum() \
        .sort_values("bkt").reset_index(drop=True)
    return pa.table({
        "bucket": pa.array(agg["bkt"].to_numpy(np.int64)),
        "n_active": pa.array(agg["n_active"].to_numpy(np.int64)),
        "n_new": pa.array(agg["n_new"].to_numpy(np.int64)),
        "n_returning": pa.array(
            (agg["n_active"] - agg["n_new"]).to_numpy(np.int64))})


def transition_latency(ds, user_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type",
                       order_col: str = "event_id",
                       num_buckets: int = 256) -> pa.Table:
    """Exact median inter-event latency per transition edge: for every
    consecutive per-user event pair (prev → next, ordered by
    ``(ts, order_col)``), the gap in WHOLE SECONDS
    (``(ts_us − prev_us) // 1e6`` — floor division, second resolution
    bounds the histogram domain by the corpus time range), then per
    (prev_type, next_type) the exact transition count and interpolating
    median gap — the "how long do users dwell between steps" companion
    to ``transition_matrix``.

    Plan: ONE coarse shuffle on ``hash(user) % num_buckets`` co-locates
    each user's events; the per-bucket fold is one vectorized
    sort + shift and emits (prev, next, gap_s) COUNT partials (≤
    |V|²×|gap domain| tiny rows); the driver folds the histogram. The
    median lands on halves — exact binary fractions — so DuckDB's
    median() replays bit-for-bit. Returns a driver-sized pa.Table
    (prev_type, next_type, n, median_gap_s) ordered by (prev, next)."""
    import pyarrow.compute as pc

    from ..engine.hashing import append_coarse_bucket
    from .stats import _weighted_median

    def coarse(b: pa.Table) -> pa.Table:
        b = b.select([user_col, ts_col, order_col, type_col])
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):  # normalize ns/ms inputs
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        else:
            ts = pc.cast(ts, pa.int64())
        b = b.set_column(b.schema.get_field_index(ts_col), ts_col, ts)
        return append_coarse_bucket(b, [user_col], num_buckets, "__b")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"prev_type": pd.Series([], dtype="object"),
                              "next_type": pd.Series([], dtype="object"),
                              "gap_s": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64")})
        if df.empty:
            return empty
        df = df.sort_values([user_col, ts_col, order_col], kind="stable")
        same = df[user_col].to_numpy() == df[user_col].shift(1).to_numpy()
        ts = df[ts_col].to_numpy(np.int64)
        gap = np.floor_divide(ts - np.roll(ts, 1), 1_000_000)
        out = (pd.DataFrame({
            "prev_type": df[type_col].shift(1).to_numpy(object),
            "next_type": df[type_col].to_numpy(object),
            "gap_s": gap})[same]
            .groupby(["prev_type", "next_type", "gap_s"])
            .size().rename("n").reset_index())
        if out.empty:
            return empty
        out["gap_s"] = out["gap_s"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    parts = (ds.map_batches(coarse, batch_format="pyarrow")
             .groupby("__b")
             .map_groups(lambda df: fold(df.drop(columns="__b")),
                         batch_format="pandas"))
    agg = parts.to_pandas()
    if agg.empty:
        return pa.table({"prev_type": pa.array([], pa.string()),
                         "next_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "median_gap_s": pa.array([], pa.float64())})
    agg = agg.groupby(["prev_type", "next_type", "gap_s"],
                      as_index=False)["n"].sum()
    rows = []
    for (pv, nx), sub in agg.groupby(["prev_type", "next_type"],
                                     sort=True):
        v = sub["gap_s"].to_numpy(np.int64).astype(np.float64)
        c = sub["n"].to_numpy(np.int64)
        rows.append((pv, nx, int(c.sum()), _weighted_median(v, c)))
    return pa.table({
        "prev_type": pa.array([r[0] for r in rows], pa.string()),
        "next_type": pa.array([r[1] for r in rows], pa.string()),
        "n": pa.array([r[2] for r in rows], pa.int64()),
        "median_gap_s": pa.array([r[3] for r in rows], pa.float64()),
    })


def markov_stationary(ds, user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      order_col: str = "event_id",
                      iters: int = 10) -> pa.Table:
    """Stationary distribution of the per-user event-type Markov chain
    by power iteration — "where does a user's session settle" — run
    ENTIRELY in integer micro-probability arithmetic so every
    iteration is order-free and the DuckDB replay (unrolled CTE per
    iteration, pure BIGINT) matches bit-for-bit:

    - transition micros: P(prev→s) = (n·2e6 + n_from) // (2·n_from)
      (half-away-from-zero 6-dp rounding of the row-stochastic MLE);
      states with NO outgoing transitions get the uniform row
      (2e6 + |S|) // (2·|S|) — the pagerank dangling rule;
    - π₀ = uniform micros; each step π'(s) = Σ_prev
      (π(prev)·P_micro + 5e5) // 1e6 — integer terms, integer sums.

    The heavy lift is the ONE distributed transition-count pass
    (``transition_matrix``'s hash(user) fold); the iteration itself is
    |S|² driver work on a taxonomy-bounded matrix. Returns
    (state, pi) after ``iters`` steps, ordered by state."""
    counts = transition_matrix(ds, user_col, ts_col, type_col,
                               order_col).to_pandas()
    states = sorted(set(
        ds.select_columns([type_col]).unique(type_col)))
    ns = len(states)
    idx = {s: i for i, s in enumerate(states)}
    n = np.zeros((ns, ns), dtype=np.int64)
    for _, row in counts.iterrows():
        n[idx[row["prev_type"]], idx[row["next_type"]]] = int(row["n"])
    nf = n.sum(axis=1)
    pm = np.zeros((ns, ns), dtype=np.int64)
    uni = (2_000_000 + ns) // (2 * ns)
    for i in range(ns):
        if nf[i] == 0:
            pm[i, :] = uni
        else:
            for j in range(ns):
                pm[i, j] = (int(n[i, j]) * 2_000_000 + int(nf[i])) \
                    // (2 * int(nf[i]))
    pi = np.full(ns, uni, dtype=np.int64)
    for _ in range(iters):
        # integer terms keep every step order-free and SQL-replayable
        pi = ((pi[:, None] * pm + 500_000) // 1_000_000).sum(axis=0)
    return pa.table({
        "state": pa.array(states, pa.string()),
        "pi": pa.array(pi.astype(np.float64) / 1e6, pa.float64())})


def last_touch_attribution(ds, user_col: str = "user_id",
                           ts_col: str = "ts", type_col: str = "event_type",
                           order_col: str = "event_id",
                           touch_type: str = "view",
                           convert_type: str = "purchase",
                           bucket_bounds_s: tuple = (3600, 86400, 604800),
                           num_buckets: int = 256) -> pa.Table:
    """Last-touch attribution latency profile: for every conversion
    event, the time since the user's most recent PRIOR touch event in
    sequence order (``(ts, order_col)`` — a same-timestamp touch with a
    smaller order id counts), bucketed into attribution windows plus a
    ``no_touch`` bucket — the marketing-attribution staple.

    Plan: ONE coarse hash(user) shuffle co-locates histories; the
    per-bucket fold is fully vectorized (sort + per-user forward-fill
    of the running touch timestamp — the SQL ``max(CASE) OVER (...
    ROWS UNBOUNDED PRECEDING)`` window, exactly) and emits ≤ |buckets|
    count rows; the driver sums. Returns (bucket, n_conversions)
    ordered by window, with ``no_touch`` last."""
    import pyarrow.compute as pc

    from ..engine.hashing import append_coarse_bucket

    labels = [f"le_{b}s" for b in bucket_bounds_s] + ["older", "no_touch"]

    def coarse(b: pa.Table) -> pa.Table:
        b = b.select([user_col, ts_col, order_col, type_col])
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        else:
            ts = pc.cast(ts, pa.int64())
        b = b.set_column(b.schema.get_field_index(ts_col), ts_col, ts)
        return append_coarse_bucket(b, [user_col], num_buckets, "__b")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"bucket": pd.Series([], dtype="object"),
                              "n": pd.Series([], dtype="int64")})
        if df.empty:
            return empty
        df = df.sort_values([user_col, ts_col, order_col], kind="stable")
        is_touch = df[type_col].to_numpy(object) == touch_type
        vts = pd.Series(
            np.where(is_touch, df[ts_col].to_numpy(np.int64), np.nan),
            index=df.index)
        last_touch = vts.groupby(df[user_col].to_numpy()).ffill()
        conv = df[type_col].to_numpy(object) == convert_type
        if not conv.any():
            return empty
        pts = df[ts_col].to_numpy(np.int64)[conv]
        lt = last_touch.to_numpy(np.float64)[conv]
        delta_s = np.where(np.isnan(lt), -1,
                           (pts - lt) // 1_000_000).astype(np.int64)
        which = np.full(len(delta_s), len(bucket_bounds_s),
                        dtype=np.int64)  # 'older'
        for i, bound in reversed(list(enumerate(bucket_bounds_s))):
            which[delta_s <= bound] = i
        which[delta_s < 0] = len(bucket_bounds_s) + 1  # 'no_touch'
        lab = np.asarray(labels, dtype=object)[which]
        out = pd.Series(lab).value_counts().rename_axis("bucket") \
            .rename("n").reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    parts = (ds.map_batches(coarse, batch_format="pyarrow")
             .groupby("__b")
             .map_groups(lambda df: fold(df.drop(columns="__b")),
                         batch_format="pandas").to_pandas())
    agg = parts.groupby("bucket", as_index=False)["n"].sum() \
        if not parts.empty else pd.DataFrame({"bucket": [], "n": []})
    counts = {row["bucket"]: int(row["n"]) for _, row in agg.iterrows()}
    return pa.table({
        "bucket": pa.array(labels, pa.string()),
        "n_conversions": pa.array([counts.get(l_, 0) for l_ in labels],
                                  pa.int64())})

