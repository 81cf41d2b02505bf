"""Distributed graph algorithms over edge-list Datasets.

The reference library has no graph operators; this module extends the
engine for the graphs a training-data pipeline actually builds — link
graphs between documents/repos, near-dup cluster graphs
(`ops/dedup.neardup_clusters`), entity co-occurrence — with PageRank as
the first citizen.

Design (the `neardup_clusters` message-passing shape): every iteration
is coarse ``hash(node) % buckets`` groupby folds, NEVER a ``Dataset.join``
— with near-empty key partitions the partitioned hash join cannot infer
the right-side schema (Ray 2.49), and an iterative loop hits that case
constantly. All fold rows carry non-null int64/float64 columns with a
``kind`` discriminator (a nullable int64 would float-widen inside the
pandas map_groups batches and round ids above 2^53).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_DRIVER_PAGERANK_LIMIT = 5_000_000  # edges; narrow int rows


def _pagerank_driver(src: np.ndarray, dst: np.ndarray, damping: float,
                     iters: int, w: np.ndarray | None = None,
                     seeds: np.ndarray | None = None) -> pd.DataFrame:
    """Vectorized single-process route: factorize nodes, bincount
    scatter-sums per iteration (deterministic summation order).
    ``w`` (edge weights) turns the walk into a weight-proportional
    transition: msg = r·w / out-strength; ``None`` == all-ones.
    ``seeds`` switches to PERSONALIZED PageRank: the teleport
    distribution concentrates uniformly on the seed nodes
    (r ← (1−d)·p + d·(msgs + dangling·p)); ``None`` == global uniform."""
    nodes = np.unique(np.concatenate([src, dst]))
    i_src = np.searchsorted(nodes, src)
    i_dst = np.searchsorted(nodes, dst)
    n = nodes.size
    if w is None:
        w = np.ones(src.size, dtype=np.float64)
    else:
        w = np.asarray(w, dtype=np.float64)
    if seeds is None:
        p = np.full(n, 1.0 / n, dtype=np.float64)
    else:
        seeds = np.unique(np.asarray(seeds, dtype=np.int64))
        pos = np.searchsorted(nodes, seeds)
        if (pos >= n).any() or (nodes[np.minimum(pos, n - 1)] != seeds).any():
            raise ValueError("pagerank: seed nodes absent from the graph")
        p = np.zeros(n, dtype=np.float64)
        p[pos] = 1.0 / seeds.size
    deg = np.bincount(i_src, weights=w, minlength=n)  # out-strength
    r = p.copy() if seeds is not None else np.full(n, 1.0 / n)
    dangling_mask = deg == 0
    safe_deg = np.where(dangling_mask, 1.0, deg)
    for _ in range(iters):
        msg = r[i_src] * w / safe_deg[i_src]
        s = np.bincount(i_dst, weights=msg, minlength=n)
        dangling = float(r[dangling_mask].sum())
        if seeds is None:
            # division form, NOT (1/n)-vector multiplies: the global
            # oracle SQL divides by n and the two differ in the last ulp
            r = (1.0 - damping) / n + damping * (s + dangling / n)
        else:
            r = (1.0 - damping) * p + damping * (s + dangling * p)
    return pd.DataFrame({"node": nodes.astype(np.int64), "rank": r})


def pagerank(edges_ds, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 10,
             driver_limit: int = _DRIVER_PAGERANK_LIMIT,
             coarse_buckets: int = 256, weight: str | None = None,
             seeds=None):
    """Damped PageRank over a DIRECTED int64 edge-list Dataset →
    ``ray.data.Dataset`` of ``(node, rank)`` covering every node that
    appears as a source or destination. Parallel edge rows count as
    multi-edges (contribute multiply); callers wanting a simple graph
    dedupe first. Dangling nodes (no out-edges) redistribute their mass
    uniformly (the standard Page et al. correction), so ``sum(rank)==1``.
    ``weight`` names an edge-weight column: the walk follows edges with
    probability proportional to weight (msg = r·w / out-strength);
    ``None`` is the uniform all-ones walk. ``seeds`` (an int64 array of
    graph nodes) switches to PERSONALIZED PageRank — the teleport
    distribution concentrates uniformly on the seed set, ranking the
    graph by proximity to the seeds; every seed must be a graph node.

    Size-routed like every gather in this repo:

    - ≤ ``driver_limit`` edge rows: vectorized numpy on the driver
      (factorize + bincount per iteration) — exact, cheap, and the
      common route at query scale.
    - above: out-degrees attach to edges with ONE upfront coarse fold;
      each iteration is then two coarse ``hash(node)`` groupby folds —
      fold A co-locates every node's current rank WITH its out-edge rows
      and emits one ``rank/deg`` message per edge (plus per-bucket
      dangling mass rows); a tiny scalar aggregate collects the global
      dangling mass; fold B sums messages per destination against the
      static node universe. Shuffle volume per iteration = edges +
      2·nodes narrow rows; rank state is node-sized and re-materialized
      each round (never the input).

    Both routes compute identical math (route-identity test up to float
    summation order; the bincount/pandas-groupby sums differ in the last
    ulp only).
    """
    import ray.data as rd

    from ..engine.hashing import append_coarse_bucket

    if not (0.0 < damping < 1.0):
        raise ValueError("damping must be in (0,1)")
    if iters < 1:
        raise ValueError("iters must be >= 1")

    cols = [src, dst] + ([weight] if weight else [])
    edges_ds = edges_ds.select_columns(cols).materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        empty = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                              "rank": pd.Series([], dtype="float64")})
        return rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))

    if n_edges <= driver_limit:
        chunks_s, chunks_d, chunks_w = [], [], []
        for b in edges_ds.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow"):
            chunks_s.append(b[src].to_numpy(zero_copy_only=False))
            chunks_d.append(b[dst].to_numpy(zero_copy_only=False))
            if weight:
                chunks_w.append(b[weight].to_numpy(zero_copy_only=False))
        out = _pagerank_driver(
            np.concatenate(chunks_s).astype(np.int64),
            np.concatenate(chunks_d).astype(np.int64), damping, iters,
            w=np.concatenate(chunks_w) if weight else None,
            seeds=seeds)
        return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))

    state = _distributed_state(edges_ds, src, dst, coarse_buckets,
                               weight=weight)
    if seeds is not None:
        seeds = np.unique(np.asarray(seeds, dtype=np.int64))
        found = state["nodes_ds"].map_batches(
            lambda b: pa.table({"n": pa.array([int(np.isin(
                b["node"].to_numpy(zero_copy_only=False), seeds).sum())])}),
            batch_format="pyarrow").sum("n")
        if int(found) != seeds.size:
            raise ValueError("pagerank: seed nodes absent from the graph")
    ranks = _seed_ranks(state, seeds=seeds)
    return _distributed_iterations(state, ranks, 0, iters, damping,
                                   coarse_buckets, seeds=seeds)


def _distributed_state(edges_ds, src: str, dst: str, coarse_buckets: int,
                       weight: str | None = None):
    """Static prep for the distributed route (deterministic; cheap to
    recompute on resume): out-degrees attached to edge rows with one
    coarse fold, plus the node universe and its size."""
    from ..engine.hashing import append_coarse_bucket

    # Static prep 1: out-strength rides each edge row (one coarse fold
    # on hash(src); deg = Σ edge weights per src, count when unweighted).
    def edge_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        w = (b[weight].to_numpy(zero_copy_only=False).astype(np.float64)
             if weight else np.ones(n, dtype=np.float64))
        t = pa.table({"node": pa.array(
            b[src].to_numpy(zero_copy_only=False).astype(np.int64)),
            "dst": pa.array(b[dst].to_numpy(zero_copy_only=False).astype(np.int64)),
            "w": pa.array(w)})
        return append_coarse_bucket(t, ["node"], coarse_buckets, "__pr")

    def attach_deg(df: pd.DataFrame) -> pd.DataFrame:
        deg = df.groupby("node", sort=False)["w"].transform("sum")
        return pd.DataFrame({
            "node": df["node"].to_numpy(np.int64),
            "dst": df["dst"].to_numpy(np.int64),
            "w": df["w"].to_numpy(np.float64),
            "deg": deg.to_numpy(np.float64),
        })

    edges_deg = (
        edges_ds.map_batches(edge_rows, batch_format="pyarrow")
        .groupby("__pr").map_groups(attach_deg, batch_format="pandas")
        .materialize()
    )

    # Static prep 2: node universe (distinct src ∪ dst) + N.
    def node_rows(b: pa.Table) -> pa.Table:
        both = np.unique(np.concatenate([
            b[src].to_numpy(zero_copy_only=False).astype(np.int64),
            b[dst].to_numpy(zero_copy_only=False).astype(np.int64)]))
        t = pa.table({"node": pa.array(both)})
        return append_coarse_bucket(t, ["node"], coarse_buckets, "__pr")

    def dedup_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.unique(df["node"].to_numpy(np.int64))})

    nodes_ds = (
        edges_ds.map_batches(node_rows, batch_format="pyarrow")
        .groupby("__pr").map_groups(dedup_nodes, batch_format="pandas")
        .materialize()
    )
    return {"edges_deg": edges_deg, "nodes_ds": nodes_ds,
            "n_nodes": nodes_ds.count()}


def _seed_ranks(state, seeds: np.ndarray | None = None):
    """Initial ranks over the node universe: uniform, or the teleport
    distribution concentrated on ``seeds`` (personalized)."""
    n_nodes = state["n_nodes"]
    pmass = None if seeds is None else 1.0 / seeds.size

    def seed_fn(b: pa.Table) -> pa.Table:
        if seeds is None:
            val = np.full(b.num_rows, 1.0 / n_nodes)
        else:
            nodes = b["node"].to_numpy(zero_copy_only=False)
            val = np.where(np.isin(nodes, seeds), pmass, 0.0)
        return pa.table({"node": b["node"], "rank": pa.array(val)})

    return state["nodes_ds"].map_batches(
        seed_fn, batch_format="pyarrow").materialize()


def _distributed_iterations(state, ranks, start_iter: int, iters: int,
                            damping: float, coarse_buckets: int,
                            on_iter=None, seeds: np.ndarray | None = None):
    """Run iterations ``start_iter..iters-1`` from the given rank state;
    ``on_iter(i, ranks)`` fires after each materialized iteration (the
    checkpoint hook). Returns the final ranks Dataset."""
    from ..engine.hashing import append_coarse_bucket

    edges_deg, nodes_ds = state["edges_deg"], state["nodes_ds"]
    n_nodes = state["n_nodes"]

    # Uniform fold-row schema (non-null throughout): kind 0 = rank row
    # (node, rank), kind 1 = edge row (node=src, dst, w, deg).
    def tag_rank(b: pa.Table) -> pa.Table:
        z = np.zeros(b.num_rows, dtype=np.int64)
        zf = np.zeros(b.num_rows, dtype=np.float64)
        t = pa.table({
            "node": b["node"], "kind": pa.array(z),
            "dst": pa.array(z), "w": pa.array(zf), "deg": pa.array(zf),
            "rank": b["rank"]})
        return append_coarse_bucket(t, ["node"], coarse_buckets, "__pr")

    def tag_edge(b: pa.Table) -> pa.Table:
        t = pa.table({
            "node": b["node"],
            "kind": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "dst": b["dst"], "w": b["w"], "deg": b["deg"],
            "rank": pa.array(np.zeros(b.num_rows))})
        return append_coarse_bucket(t, ["node"], coarse_buckets, "__pr")

    def fold_messages(df: pd.DataFrame) -> pd.DataFrame:
        r = df[df["kind"] == 0].set_index("node")["rank"]
        e = df[df["kind"] == 1]
        # deg == 0 (a weighted node whose out-edges all carry weight 0)
        # is DANGLING, not a division: its edges emit nothing and its
        # rank joins the dangling mass — mirroring the driver route's
        # safe_deg handling (route-identity would otherwise diverge on
        # NaN/inf propagating into every downstream rank)
        live = e["deg"].to_numpy(np.float64) > 0.0
        el = e[live]
        msg = (r.reindex(el["node"]).to_numpy()
               * el["w"].to_numpy(np.float64)
               / el["deg"].to_numpy(np.float64))
        msgs = pd.DataFrame({
            "node": el["dst"].to_numpy(np.int64), "val": msg,
            "kind": np.zeros(len(el), dtype=np.int64)})
        dang = r[~r.index.isin(el["node"].unique())]
        drows = pd.DataFrame({
            "node": np.full(len(dang), -1, dtype=np.int64),
            "val": dang.to_numpy(np.float64),
            "kind": np.full(len(dang), 2, dtype=np.int64)})
        return pd.concat([msgs, drows], ignore_index=True)

    pmass = None if seeds is None else 1.0 / seeds.size

    def make_tag_universe(base_const: float, dangling: float):
        # universe rows carry each node's TELEPORT term (kind 3): the
        # base constant when global, (1−d)·p(n) + d·dangling·p(n) when
        # personalized — so the rank fold stays one uniform kind-split
        def tag_universe(b: pa.Table) -> pa.Table:
            if seeds is None:
                val = np.full(b.num_rows, base_const)
            else:
                nodes = b["node"].to_numpy(zero_copy_only=False)
                mass = ((1.0 - damping) * pmass
                        + damping * dangling * pmass)
                val = np.where(np.isin(nodes, seeds), mass, 0.0)
            t = pa.table({
                "node": b["node"], "val": pa.array(val),
                "kind": pa.array(np.full(b.num_rows, 3, dtype=np.int64))})
            return append_coarse_bucket(t, ["node"], coarse_buckets, "__pr")

        return tag_universe

    def rebucket_messages(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(
            b.select(["node", "val", "kind"]), ["node"], coarse_buckets, "__pr")

    def fold_ranks(df: pd.DataFrame) -> pd.DataFrame:
        # rank = teleport term (one kind-3 row per node) + d·Σ messages
        t = df[df["kind"] == 3].groupby("node", sort=False)["val"].sum()
        s = df[df["kind"] == 0].groupby("node", sort=False)["val"].sum()
        s = s.reindex(t.index, fill_value=0.0)
        return pd.DataFrame({
            "node": t.index.to_numpy(np.int64),
            "rank": t.to_numpy(np.float64)
            + damping * s.to_numpy(np.float64)})

    for it in range(start_iter, iters):
        tagged = ranks.map_batches(tag_rank, batch_format="pyarrow").union(
            edges_deg.map_batches(tag_edge, batch_format="pyarrow"))
        folded = (
            tagged.groupby("__pr")
            .map_groups(fold_messages, batch_format="pandas")
            .materialize()
        )
        # tiny scalar: global dangling mass this round
        dang_ds = folded.filter(expr="kind == 2")
        dangling = dang_ds.sum("val") if dang_ds.count() else 0.0
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        msgs = folded.filter(expr="kind == 0").map_batches(
            rebucket_messages, batch_format="pyarrow")
        uni = nodes_ds.map_batches(make_tag_universe(base, dangling),
                                   batch_format="pyarrow")
        ranks = (
            msgs.union(uni).groupby("__pr")
            .map_groups(fold_ranks, batch_format="pandas")
            .materialize()
        )
        if on_iter is not None:
            on_iter(it, ranks)
    return ranks


def pagerank_checkpointed(shard_paths, checkpoint_root: str, job_id: str,
                          src: str = "src", dst: str = "dst",
                          damping: float = 0.85, iters: int = 10,
                          coarse_buckets: int = 64,
                          weight: str | None = None,
                          _fail_after: int | None = None):
    """Resumable distributed PageRank (`python -m raysketch.run
    --pipeline pagerank`): iterative jobs are exactly the ones a
    preemption kills mid-way, and re-running N-1 finished power
    iterations is the waste checkpointing exists to avoid.

    Checkpoint layout under ``checkpoint_root/job_id``: each iteration's
    rank state publishes atomically as ``stage_iter_NNNN/`` via
    `engine.sinks.write_dataset` (staging rename + ``_SUCCESS``; a
    killed write is invisible). On resume the highest complete stage
    seeds the loop and only the remaining iterations run; the static
    prep (degrees, node universe) is deterministic and cheap relative
    to iterations, so it recomputes rather than checkpoints. Rank
    state is node-sized — the input edges never ride a checkpoint.

    ``_fail_after=i`` (tests only) raises AFTER stage i commits,
    simulating a mid-job kill. Returns ``{"ranks": Dataset,
    "resumed_from_iter": int}`` — ranks read back from the final stage
    so the returned result is exactly what is on disk."""
    import os

    import ray.data as rd

    from ..engine import sinks

    if iters < 1:
        raise ValueError("iters must be >= 1")
    base = os.path.join(checkpoint_root, job_id)
    os.makedirs(base, exist_ok=True)

    def stage_dir(i: int) -> str:
        return os.path.join(base, f"stage_iter_{i:04d}")

    # resume point FIRST: a no-op resume (all stages complete) must not
    # touch the input edges or rebuild the static prep at all
    start = 0
    ranks = None
    for i in range(iters - 1, -1, -1):
        try:
            ranks = sinks.read_back(stage_dir(i)).materialize()
            start = i + 1
            break
        except FileNotFoundError:
            continue

    def on_iter(i: int, r) -> None:
        sinks.write_dataset(r, stage_dir(i))
        if _fail_after is not None and i == _fail_after:
            raise RuntimeError(f"_fail_after: killed after iteration {i}")

    if start < iters:
        cols = [src, dst] + ([weight] if weight else [])
        edges_ds = rd.read_parquet(list(shard_paths), columns=cols)
        state = _distributed_state(edges_ds, src, dst, coarse_buckets,
                                   weight=weight)
        if ranks is None:
            ranks = _seed_ranks(state)
        _distributed_iterations(state, ranks, start, iters, damping,
                                coarse_buckets, on_iter=on_iter)
    final = sinks.read_back(stage_dir(iters - 1))
    return {"ranks": final, "resumed_from_iter": start}


# ---------------------------------------------------------------------------
# HITS (hubs and authorities)
# ---------------------------------------------------------------------------

def _hits_driver(src: np.ndarray, dst: np.ndarray,
                 iters: int) -> pd.DataFrame:
    nodes = np.unique(np.concatenate([src, dst]))
    n = nodes.size
    i_s, i_d = np.searchsorted(nodes, src), np.searchsorted(nodes, dst)
    h = np.ones(n, dtype=np.float64)
    a = np.zeros(n, dtype=np.float64)
    for _ in range(iters):
        a = np.bincount(i_d, weights=h[i_s], minlength=n)
        a = a / np.sqrt((a * a).sum())
        h = np.bincount(i_s, weights=a[i_d], minlength=n)
        h = h / np.sqrt((h * h).sum())
    return pd.DataFrame({"node": nodes.astype(np.int64), "hub": h,
                         "auth": a})


def _push_sum(values_ds, edges_ds, from_col: str, to_col: str,
              nodes_ds, coarse_buckets: int):
    """One distributed HITS half-step: for every node, the sum of
    ``value`` over incoming ``from → to`` edges (zero when none) — one
    coarse hash(from) fold co-locating values with edges, then one
    coarse hash(to) fold summing messages against the node universe."""
    from ..engine.hashing import append_coarse_bucket

    def tag_val(b: pa.Table) -> pa.Table:
        t = pa.table({
            "node": b["node"],
            "kind": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "other": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "val": b["value"]})
        return append_coarse_bucket(t, ["node"], coarse_buckets, "__h")

    def tag_edge(b: pa.Table) -> pa.Table:
        t = pa.table({
            "node": pa.array(
                b[from_col].to_numpy(zero_copy_only=False).astype(np.int64)),
            "kind": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "other": pa.array(
                b[to_col].to_numpy(zero_copy_only=False).astype(np.int64)),
            "val": pa.array(np.zeros(b.num_rows))})
        return append_coarse_bucket(t, ["node"], coarse_buckets, "__h")

    def fold_msgs(df: pd.DataFrame) -> pd.DataFrame:
        v = df[df["kind"] == 0].set_index("node")["val"]
        e = df[df["kind"] == 1]
        return pd.DataFrame({
            "node": e["other"].to_numpy(np.int64),
            "val": v.reindex(e["node"]).to_numpy(np.float64)})

    def tag_universe(b: pa.Table) -> pa.Table:
        t = pa.table({"node": b["node"],
                      "val": pa.array(np.zeros(b.num_rows))})
        return append_coarse_bucket(t, ["node"], coarse_buckets, "__h")

    def rebucket(b: pa.Table) -> pa.Table:
        return append_coarse_bucket(
            b.select(["node", "val"]), ["node"], coarse_buckets, "__h")

    def fold_sums(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("node", sort=False)["val"].sum()
        return pd.DataFrame({"node": s.index.to_numpy(np.int64),
                             "value": s.to_numpy(np.float64)})

    msgs = (
        values_ds.map_batches(tag_val, batch_format="pyarrow")
        .union(edges_ds.map_batches(tag_edge, batch_format="pyarrow"))
        .groupby("__h").map_groups(fold_msgs, batch_format="pandas")
        .map_batches(rebucket, batch_format="pyarrow")
    )
    uni = nodes_ds.map_batches(tag_universe, batch_format="pyarrow")
    return (msgs.union(uni).groupby("__h")
            .map_groups(fold_sums, batch_format="pandas").materialize())


def _l2_normalize(values_ds):
    """Divide the value column by its global L2 norm (one tiny scalar
    aggregate + one map; norm of all-zero state raises)."""
    import pyarrow.compute as pc

    ss = values_ds.map_batches(
        lambda b: pa.table({"s2": pa.array(
            [float(pc.sum(pc.multiply(b["value"], b["value"])).as_py()
                   or 0.0)])}),
        batch_format="pyarrow").sum("s2")
    z = float(np.sqrt(ss))
    if z == 0.0:
        raise ValueError("hits: zero vector (graph has no edges?)")

    def div(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"],
                         "value": pc.divide(b["value"], pa.scalar(z))})

    return values_ds.map_batches(div, batch_format="pyarrow").materialize()


def hits(edges_ds, src: str = "src", dst: str = "dst", iters: int = 10,
         driver_limit: int = _DRIVER_PAGERANK_LIMIT,
         coarse_buckets: int = 256):
    """HITS hubs/authorities over a directed int64 edge list (Kleinberg
    1999): ``a ← Eᵀh, normalize; h ← Ea, normalize`` per iteration,
    h₀ = 1. Nodes with no in-edges get authority 0; no out-edges → hub 0
    (exactly the LEFT-JOIN-COALESCE semantics the SQL oracle replays).

    Size-routed like `pagerank`: vectorized driver numpy under
    ``driver_limit`` edges; above it each half-step is the `_push_sum`
    message fold (values co-located with edges on hash(from), sums
    against the node universe on hash(to)) plus one scalar L2 aggregate.
    Returns a Dataset of ``(node, hub, auth)``."""
    import ray.data as rd

    if iters < 1:
        raise ValueError("iters must be >= 1")
    edges_ds = edges_ds.select_columns([src, dst]).materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        empty = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                              "hub": pd.Series([], dtype="float64"),
                              "auth": pd.Series([], dtype="float64")})
        return rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))

    if n_edges <= driver_limit:
        chunks_s, chunks_d = [], []
        for b in edges_ds.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow"):
            chunks_s.append(b[src].to_numpy(zero_copy_only=False))
            chunks_d.append(b[dst].to_numpy(zero_copy_only=False))
        out = _hits_driver(np.concatenate(chunks_s).astype(np.int64),
                           np.concatenate(chunks_d).astype(np.int64), iters)
        return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))

    state = _distributed_state(edges_ds, src, dst, coarse_buckets)
    nodes_ds = state["nodes_ds"]

    def seed(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"],
                         "value": pa.array(np.ones(b.num_rows))})

    h = nodes_ds.map_batches(seed, batch_format="pyarrow").materialize()
    a = None
    for _ in range(iters):
        a = _l2_normalize(_push_sum(h, edges_ds, src, dst, nodes_ds,
                                    coarse_buckets))
        h = _l2_normalize(_push_sum(a, edges_ds, dst, src, nodes_ds,
                                    coarse_buckets))

    hp = h.to_pandas().rename(columns={"value": "hub"})
    ap = a.to_pandas().rename(columns={"value": "auth"})
    out = hp.merge(ap, on="node").sort_values("node").reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


# ---------------------------------------------------------------------------
# Triangle counting / global clustering coefficient
# ---------------------------------------------------------------------------

def triangle_count(edges_ds, a_col: str, b_col: str,
                   num_buckets: int = 256) -> pa.Table:
    """Exact triangle count + wedge count of the undirected simple
    graph given by an edge-list Dataset — the cohesion statistic
    (global clustering coefficient = 3·triangles / wedges) a pipeline
    computes over co-occurrence graphs.

    Plan: one coarse ``hash(min_node) % num_buckets`` shuffle
    deduplicates the canonical (u<v) edges — self-loops dropped,
    duplicate edge rows collapse inside their bucket, so each distinct
    edge leaves exactly one bucket — then the driver folds the
    DISTINCT edge set and counts triangles with one boolean-adjacency
    matmul (``(A²∘A).sum()/6``, exact int64). The dense matmul assumes
    a DIMENSION-sized node set (suppliers, repos, languages — the
    graphs this engine builds co-occurrence over); at corpus-scale
    node counts swap the driver fold for degree-oriented MPS
    per-bucket intersection (documented, not needed for any current
    caller). Edge dedup is the distributed, scale-bearing stage: the
    raw pair stream (e.g. per-order supplier pairs) never gathers.

    Returns one row: n_nodes, n_edges, n_triangles, n_wedges (all
    int64; wedges = Σ deg·(deg−1)/2, the open+closed path-2 count)."""
    from ..engine.hashing import append_coarse_bucket

    def canon(b: pa.Table) -> pa.Table:
        u = b[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        keep = lo != hi
        t = pa.table({"u": pa.array(lo[keep], pa.int64()),
                      "v": pa.array(hi[keep], pa.int64())})
        return append_coarse_bucket(t, ["u"], num_buckets, "__tb")

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["u", "v"])[["u", "v"]]

    uniq = (edges_ds.map_batches(canon, batch_format="pyarrow")
            .groupby("__tb").map_groups(dedup, batch_format="pandas")
            .to_pandas())
    if uniq.empty:
        return pa.table({"n_nodes": pa.array([0], pa.int64()),
                         "n_edges": pa.array([0], pa.int64()),
                         "n_triangles": pa.array([0], pa.int64()),
                         "n_wedges": pa.array([0], pa.int64())})
    u = uniq["u"].to_numpy(np.int64)
    v = uniq["v"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([u, v]))
    n = nodes.size
    iu = np.searchsorted(nodes, u)
    iv = np.searchsorted(nodes, v)
    A = np.zeros((n, n), dtype=np.int64)
    A[iu, iv] = 1
    A[iv, iu] = 1
    tri = int((A @ A * A).sum()) // 6
    deg = A.sum(axis=1)
    wedges = int((deg * (deg - 1) // 2).sum())
    return pa.table({"n_nodes": pa.array([n], pa.int64()),
                     "n_edges": pa.array([len(u)], pa.int64()),
                     "n_triangles": pa.array([tri], pa.int64()),
                     "n_wedges": pa.array([wedges], pa.int64())})


def cooccurrence_edges(ds, group_col: str, item_col: str,
                       num_buckets: int = 256):
    """Dataset of canonical (u < v) item-pair edges: items co-occurring
    under the same group key (suppliers in an order, entities in a doc).
    Per-block DISTINCT (group, item) pre-reduce cuts the shuffle to the
    distinct-membership stream; ONE coarse ``hash(group)`` shuffle
    co-locates each group, and the per-bucket fold emits its pairs with
    one vectorized self-merge. Pairs are distinct within a group but
    may repeat across groups — feed :func:`triangle_count`, which
    dedups edges in its own bucket fold."""
    from ..engine.hashing import append_coarse_bucket

    def members(b: pa.Table) -> pa.Table:
        df = b.select([group_col, item_col]).to_pandas() \
            .drop_duplicates([group_col, item_col])
        t = pa.table({
            "g": pa.array(df[group_col].to_numpy(np.int64), pa.int64()),
            "i": pa.array(df[item_col].to_numpy(np.int64), pa.int64())})
        return append_coarse_bucket(t, ["g"], num_buckets, "__cb")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["g", "i"])
        m = df.merge(df, on="g")
        m = m[m["i_x"] < m["i_y"]]
        # bucket-local pair dedup: cross-group repeats collapse here,
        # shrinking the downstream edge-dedup shuffle
        m = m.drop_duplicates(["i_x", "i_y"])
        return pd.DataFrame({"u": m["i_x"].to_numpy(np.int64),
                             "v": m["i_y"].to_numpy(np.int64)})

    return (ds.map_batches(members, batch_format="pyarrow")
            .groupby("__cb").map_groups(pairs, batch_format="pandas"))


def bfs_hops(edges_ds, seeds_ds, src: str = "src", dst: str = "dst",
             seed_col: str = "node", max_hops: int = 3,
             num_buckets: int = 64,
             frontier_broadcast_limit: int = 2_000_000,
             driver_fold_limit: int = 5_000_000):
    """Bounded-depth BFS over an UNDIRECTED edge list: the minimum hop
    distance (0 = seed) from a seed node set, out to ``max_hops`` —
    the reachability/blast-radius primitive (which suppliers are
    within two trades of this region, which docs within one link of a
    flagged set). Returns a Dataset of (node, dist) covering every
    node reached, int64 throughout.

    SIZE-ROUTED on the edge count (the pagerank `_DRIVER_FOLD_LIMIT`
    discipline): at or under ``driver_fold_limit`` edges the per-round
    reduce is a DRIVER fold — one broadcast probe pass over the pinned
    edge list per round, each block emitting only its DISTINCT matched
    neighbors, folded into a numpy visited set (state is
    node-cardinality by construction; a per-round Ray shuffle on a
    bounded graph is pure fixed cost — measured 30s → ~4s at sf0.1).
    Above the limit, the distributed route: per round the frontier
    SEMI-JOINS the edge list (broadcast ``pc.is_in`` under
    ``frontier_broadcast_limit`` nodes, coarse-bucket partitioned
    semi-join above), matched edges emit (neighbor, d+1) messages both
    directions, and ONE coarse ``hash(node)`` groupby folds them into
    the state with a vectorized per-node min (the neardup_clusters
    message-passing shape — never Dataset.join, whose near-empty key
    partitions lose schema on iterative workloads). In BOTH routes a
    node never re-enters a later frontier, so each edge is expanded at
    most twice; rounds are bounded by ``max_hops``."""
    import ray.data as rd

    from ..engine.hashing import append_coarse_bucket
    from .join import broadcast_semi_join, partitioned_semi_join

    def tag_dist(ds_in, d):
        def tag(b: pa.Table) -> pa.Table:
            n = b[seed_col if d == 0 else "node"] \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "node": pa.array(n),
                "dist": pa.array(np.full(len(n), d, np.int64))})
        return ds_in.map_batches(tag, batch_format="pyarrow")

    # the edge list is probed repeatedly across rounds — a lazy
    # upstream pipeline would re-execute for every probe, so pin it
    # in the object store once
    edges_ds = edges_ds.materialize()

    if edges_ds.count() <= driver_fold_limit:
        import ray

        seeds = np.unique(np.concatenate([
            b[seed_col].to_numpy(zero_copy_only=False).astype(np.int64)
            for b in seeds_ds.iter_batches(batch_size=65536,
                                           batch_format="pyarrow")]
            or [np.zeros(0, np.int64)]))
        nodes, dists = seeds, np.zeros(len(seeds), np.int64)
        frontier = seeds
        for d in range(max_hops):
            if len(frontier) == 0:
                break
            ref = ray.put(pa.array(frontier, pa.int64()))

            def probe(b: pa.Table, ref=ref) -> pa.Table:
                import pyarrow.compute as pc
                import ray as _ray

                f = _ray.get(ref)
                s = b[src].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                t = b[dst].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                ms = pc.is_in(b[src], value_set=f) \
                    .to_numpy(zero_copy_only=False)
                mt = pc.is_in(b[dst], value_set=f) \
                    .to_numpy(zero_copy_only=False)
                cand = np.unique(np.concatenate([t[ms], s[mt]]))
                return pa.table({"node": pa.array(cand)})

            cand = (edges_ds.map_batches(probe, batch_format="pyarrow")
                    .to_pandas())
            cand = np.unique(cand["node"].to_numpy(np.int64)) \
                if len(cand) else np.zeros(0, np.int64)
            new = cand[~np.isin(cand, nodes)]
            nodes = np.concatenate([nodes, new])
            dists = np.concatenate(
                [dists, np.full(len(new), d + 1, np.int64)])
            frontier = new
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "dist": pa.array(dists, pa.int64())}))

    def fold_min(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)["dist"].min()
        return pd.DataFrame({"node": out["node"].to_numpy(np.int64),
                             "dist": out["dist"].to_numpy(np.int64)})

    state = tag_dist(seeds_ds, 0).materialize()
    frontier = state
    for d in range(max_hops):
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        semi = (broadcast_semi_join
                if n_frontier <= frontier_broadcast_limit
                else partitioned_semi_join)
        msgs = []
        for a, b_ in ((src, dst), (dst, src)):
            hit = semi(edges_ds, frontier, a, "node")

            def emit(t: pa.Table, col=b_, dd=d + 1) -> pa.Table:
                n = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
                return pa.table({
                    "node": pa.array(n),
                    "dist": pa.array(np.full(len(n), dd, np.int64))})

            msgs.append(hit.map_batches(emit, batch_format="pyarrow"))
        state = (state.union(*msgs)
                 .map_batches(lambda b: append_coarse_bucket(
                     b, ["node"], num_buckets, "__bb"),
                     batch_format="pyarrow")
                 .groupby("__bb")
                 .map_groups(lambda df: fold_min(df.drop(columns="__bb")),
                             batch_format="pandas")
                 .materialize())
        target = d + 1

        def is_new(b: pa.Table, t=target) -> pa.Table:
            m = b["dist"].to_numpy(zero_copy_only=False) == t
            return b.filter(pa.array(m))

        frontier = state.map_batches(is_new,
                                     batch_format="pyarrow").materialize()
    return state


def degree_assortativity(edges_ds, src: str = "src", dst: str = "dst",
                         num_buckets: int = 64,
                         broadcast_limit_rows: int = 2_000_000) -> pa.Table:
    """Degree assortativity of an UNDIRECTED graph: the Pearson
    correlation of endpoint degrees over the direction-doubled edge
    list — positive means hubs link hubs (social nets), negative means
    hubs link leaves (bipartite trade fans out). On the doubled list
    Σx = Σy and Σx² = Σy², so the usual sqrt denominator collapses and
    ``r = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)`` is a RATIO OF INTEGERS —
    computed in Python big-ints from int64-safe chunked partials (the
    grouped_linear_fit overflow rule) and rounded once at round6, so a
    DuckDB HUGEINT replay matches bit-for-bit.

    Plan: edges dedup through one coarse ``hash(u,v)`` fold (canonical
    u<v), degrees through one ``hash(node)`` count fold, degrees attach
    back to both endpoints SIZE-ROUTED (broadcast under
    ``broadcast_limit_rows`` nodes, partitioned join above), and the
    power sums fold from one-row-per-block partials. Returns one row:
    (n_directed_edges, sum_deg, sum_deg2, sum_xy, assortativity)."""
    from ..engine.hashing import append_coarse_bucket
    from .join import attach_by_key

    def canon(b: pa.Table) -> pa.Table:
        a = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(a, c)
        v = np.maximum(a, c)
        df = pd.DataFrame({"u": u, "v": v}).drop_duplicates()
        t = pa.table({"u": pa.array(df["u"].to_numpy(np.int64)),
                      "v": pa.array(df["v"].to_numpy(np.int64))})
        return append_coarse_bucket(t, ["u", "v"], num_buckets, "__eb")

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns="__eb").drop_duplicates(["u", "v"])

    und = (edges_ds.map_batches(canon, batch_format="pyarrow")
           .groupby("__eb").map_groups(dedup, batch_format="pandas")
           .materialize())

    def node_partial(b: pa.Table) -> pa.Table:
        n = np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)]).astype(np.int64)
        df = pd.DataFrame({"node": n, "deg": np.ones(len(n), np.int64)})
        out = df.groupby("node", sort=False, as_index=False)["deg"].sum()
        return pa.table({
            "node": pa.array(out["node"].to_numpy(np.int64)),
            "deg": pa.array(out["deg"].to_numpy(np.int64))})

    def deg_fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns="__db").groupby(
            "node", as_index=False)["deg"].sum()
        return out

    degrees = (und.map_batches(node_partial, batch_format="pyarrow")
               .map_batches(lambda b: append_coarse_bucket(
                   b, ["node"], num_buckets, "__db"),
                   batch_format="pyarrow")
               .groupby("__db")
               .map_groups(deg_fold, batch_format="pandas")
               .materialize())

    ex = attach_by_key(und, degrees, "u", "node", ["deg"],
                       broadcast_limit_rows=broadcast_limit_rows)
    ex = ex.map_batches(
        lambda b: b.rename_columns(
            [{"deg": "deg_u"}.get(c, c) for c in b.column_names]),
        batch_format="pyarrow")
    ex = attach_by_key(ex, degrees, "v", "node", ["deg"],
                       broadcast_limit_rows=broadcast_limit_rows)

    def power_partial(b: pa.Table) -> pa.Table:
        from ..ops.stats import _chunked_int_sum

        x = b["deg_u"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        # doubled list: both orientations of every canonical edge
        xs = np.concatenate([x, y])
        ys = np.concatenate([y, x])
        return pa.table({
            "n": pa.array([2 * len(x)], pa.int64()),
            "sx": pa.array([str(_chunked_int_sum(xs))], pa.string()),
            "sxx": pa.array([str(_chunked_int_sum(xs * xs))],
                            pa.string()),
            "sxy": pa.array([str(_chunked_int_sum(xs * ys))],
                            pa.string())})

    parts = ex.map_batches(power_partial,
                           batch_format="pyarrow").to_pandas()
    if parts.empty or parts["n"].sum() == 0:
        raise ValueError("degree_assortativity: no edges")
    n = int(parts["n"].sum())
    sx = sum(int(s) for s in parts["sx"])
    sxx = sum(int(s) for s in parts["sxx"])
    sxy = sum(int(s) for s in parts["sxy"])
    num = n * sxy - sx * sx  # Σy = Σx on the doubled list
    den = n * sxx - sx * sx
    r = 0.0 if den == 0 else float(num) / float(den)
    r6 = float(np.sign(r) * np.floor(abs(r) * 1e6 + 0.5) / 1e6)
    return pa.table({
        "n_directed_edges": pa.array([n], pa.int64()),
        "sum_deg": pa.array([sx], pa.int64()),
        "sum_deg2": pa.array([sxx], pa.int64()),
        "sum_xy": pa.array([sxy], pa.int64()),
        "assortativity": pa.array([r6], pa.float64())})


def label_propagation(edges_ds, src: str = "src", dst: str = "dst",
                      iters: int = 2, num_buckets: int = 64,
                      broadcast_limit_rows: int = 2_000_000,
                      driver_fold_limit: int = _DRIVER_PAGERANK_LIMIT):
    """Synchronous label propagation over an UNDIRECTED edge list —
    the lightweight community detector (Raghavan et al. 2007): every
    node starts as its own label; each iteration every node adopts the
    MODE of its neighbors' labels with a deterministic smallest-label
    tie-break (isolated update order — all nodes step together), which
    makes the whole trajectory bit-replayable by ``iters`` unrolled
    SQL count/argmax stages. Returns a Dataset of (node, label) after
    ``iters`` rounds.

    Plan per iteration: the current label table attaches to both edge
    endpoints SIZE-ROUTED (broadcast under ``broadcast_limit_rows``
    labels, partitioned hash join above — label volume is
    node-cardinality); each block pre-reduces to (node,
    neighbor_label, count) partials; ONE coarse ``hash(node)`` fold
    merges counts and takes the (max count, min label) argmax — the
    grouped_mode shape. Nodes with no edges keep their own label (the
    node table is unioned in at count 0)."""
    from ..engine.hashing import append_coarse_bucket
    from .join import attach_by_key

    def nodes_of(b: pa.Table) -> pa.Table:
        n = np.unique(np.concatenate([
            b[src].to_numpy(zero_copy_only=False),
            b[dst].to_numpy(zero_copy_only=False)])).astype(np.int64)
        return pa.table({"node": pa.array(n),
                         "label": pa.array(n)})

    # neighborhood-mode semantics are defined on the SIMPLE graph:
    # dedupe globally (canonical u<v under one hash(u,v) fold) so a
    # repeated edge can't multiply its label's vote
    def canon(b: pa.Table) -> pa.Table:
        a = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({src: np.minimum(a, c),
                           dst: np.maximum(a, c)}).drop_duplicates()
        df = df[df[src] != df[dst]]  # self-loops carry no information
        t = pa.Table.from_pandas(df, preserve_index=False)
        return append_coarse_bucket(t, [src, dst], num_buckets, "__eb")

    edges_ds = (edges_ds.map_batches(canon, batch_format="pyarrow")
                .groupby("__eb")
                .map_groups(lambda df: df.drop(columns="__eb")
                            .drop_duplicates([src, dst]),
                            batch_format="pandas")
                .materialize())

    if edges_ds.count() <= driver_fold_limit:
        # SIZE-ROUTED driver fold (the pagerank/bfs discipline): per
        # iteration Ray shuffles on a bounded graph are pure fixed
        # cost (measured 25.6 s → ~2 s warm at sf0.1). The deduped
        # edge list is narrow int rows; LPA state is node-cardinality.
        import ray.data as rd

        us, vs = [], []
        for b in edges_ds.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow"):
            us.append(b[src].to_numpy(zero_copy_only=False))
            vs.append(b[dst].to_numpy(zero_copy_only=False))
        u = np.concatenate(us).astype(np.int64) if us \
            else np.zeros(0, np.int64)
        v = np.concatenate(vs).astype(np.int64) if vs \
            else np.zeros(0, np.int64)
        a = np.concatenate([u, v])
        b_arr = np.concatenate([v, u])
        nodes = np.unique(a)
        labv = nodes.copy()  # every node starts as its own label
        ai = np.searchsorted(nodes, a)
        bi = np.searchsorted(nodes, b_arr)
        for _ in range(iters):
            df = pd.DataFrame({"node": bi, "lab": labv[ai]})
            cnt = df.groupby(["node", "lab"]).size().reset_index(
                name="n")
            cnt = cnt.sort_values(["node", "n", "lab"],
                                  ascending=[True, False, True],
                                  kind="mergesort") \
                .drop_duplicates("node")
            new = labv.copy()
            new[cnt["node"].to_numpy(np.int64)] = \
                cnt["lab"].to_numpy(np.int64)
            labv = new
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "label": pa.array(labv, pa.int64())}))

    labels = (edges_ds.map_batches(nodes_of, batch_format="pyarrow")
              .map_batches(lambda b: append_coarse_bucket(
                  b, ["node"], num_buckets, "__lb"),
                  batch_format="pyarrow")
              .groupby("__lb")
              .map_groups(lambda df: df.drop(columns="__lb")
                          .drop_duplicates("node"),
                          batch_format="pandas")
              .materialize())

    for _ in range(iters):
        # attach the CURRENT label of each endpoint's neighbor: for
        # messages INTO dst we need src's label, and vice versa
        msgs = []
        for a, b_ in ((src, dst), (dst, src)):
            at = attach_by_key(
                edges_ds, labels, a, "node", ["label"],
                broadcast_limit_rows=broadcast_limit_rows)

            def partial(t: pa.Table, col=b_) -> pa.Table:
                df = pd.DataFrame({
                    "node": t[col].to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "lab": t["label"].to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "n": np.ones(t.num_rows, np.int64)})
                out = df.groupby(["node", "lab"], sort=False,
                                 as_index=False)["n"].sum()
                return pa.Table.from_pandas(out, preserve_index=False)

            msgs.append(at.map_batches(partial, batch_format="pyarrow"))
        # isolated nodes: keep the own label alive at count 0 so the
        # fold emits them (never the winner when any neighbor exists —
        # real counts are >= 1)
        own = labels.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "lab": b["label"],
                "n": pa.array(np.zeros(b.num_rows, np.int64))}),
            batch_format="pyarrow")
        folded = (msgs[0].union(msgs[1], own)
                  .map_batches(lambda b: append_coarse_bucket(
                      b, ["node"], num_buckets, "__lb"),
                      batch_format="pyarrow")
                  .groupby("__lb")
                  .map_groups(_lp_mode_fold, batch_format="pandas")
                  .materialize())
        labels = folded
    return labels


def _lp_mode_fold(df: pd.DataFrame) -> pd.DataFrame:
    df = df.drop(columns="__lb")
    if df.empty:
        return pd.DataFrame({
            "node": pd.Series([], dtype="int64"),
            "label": pd.Series([], dtype="int64")})
    agg = df.groupby(["node", "lab"], as_index=False)["n"].sum()
    # a node with ONLY the count-0 own row is isolated: keep it; any
    # real neighbor count (>=1) outranks it
    agg = agg.sort_values(["node", "n", "lab"],
                          ascending=[True, False, True],
                          kind="mergesort").drop_duplicates("node")
    return pd.DataFrame({
        "node": agg["node"].to_numpy(np.int64),
        "label": agg["lab"].to_numpy(np.int64)})


def kcore(edges_ds, k: int, u_col: str = "u", v_col: str = "v",
          num_buckets: int = 64,
          driver_fold_limit: int = 5_000_000) -> pa.Table:
    """k-core of an undirected graph: iteratively peel every node whose
    degree in the surviving subgraph is < k until fixpoint, then report
    each surviving node with its in-core degree — the classic dense-
    subgraph screen (spam rings, power-user cliques, load-bearing
    parts). The edge list is GLOBALLY deduplicated first (duplicate
    pair rows would multiply degrees — the trade_communities lesson).

    SIZE-ROUTED on the deduped edge count (the pagerank
    `_DRIVER_FOLD_LIMIT` discipline — per-round Ray shuffles on a
    bounded graph are pure fixed cost): at or under
    ``driver_fold_limit`` the peel runs as a driver numpy loop over
    the pinned edge arrays (each round is one bincount + isin). Above
    it, each round computes degrees with a per-block partial +
    coarse-bucket fold and broadcasts the (dimension-sized) removal
    set into an edge filter — every round touches each edge once, and
    rounds are bounded by the peel depth, not |V|. Returns a
    driver-ordered pa.Table (node, core_deg); empty if the k-core is
    empty."""
    import ray

    from ..engine.hashing import append_coarse_bucket

    def pre(b: pa.Table) -> pa.Table:
        df = b.select([u_col, v_col]).to_pandas() \
            .drop_duplicates([u_col, v_col])
        a = df[u_col].to_numpy(np.int64)
        bb = df[v_col].to_numpy(np.int64)
        lo, hi = np.minimum(a, bb), np.maximum(a, bb)
        t = pa.table({"u": pa.array(lo), "v": pa.array(hi)})
        return append_coarse_bucket(t, ["u"], num_buckets, "__eb")

    def dedup_fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["u", "v"])

    edges = (edges_ds.map_batches(pre, batch_format="pyarrow")
             .groupby("__eb")
             .map_groups(lambda df: dedup_fold(df.drop(columns="__eb")),
                         batch_format="pandas")
             .materialize())
    n_edges = edges.count()

    def empty() -> pa.Table:
        return pa.table({"node": pa.array([], pa.int64()),
                         "core_deg": pa.array([], pa.int64())})

    if n_edges == 0:
        return empty()

    if n_edges <= driver_fold_limit:
        df = edges.to_pandas()
        u = df["u"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        mask = np.ones(len(u), bool)
        while True:
            nodes, deg = np.unique(np.concatenate([u[mask], v[mask]]),
                                   return_counts=True)
            weak = nodes[deg < k]
            if len(weak) == 0 or len(nodes) == 0:
                break
            bad = np.isin(u, weak) | np.isin(v, weak)
            if not (bad & mask).any():
                break
            mask &= ~bad
        if not mask.any():
            return empty()
        nodes, deg = np.unique(np.concatenate([u[mask], v[mask]]),
                               return_counts=True)
        return pa.table({"node": pa.array(nodes),
                         "core_deg": pa.array(deg.astype(np.int64))})

    # distributed route: per-round degree fold + broadcast removal set
    while True:
        def deg_partial(b: pa.Table) -> pa.Table:
            nodes, cnt = np.unique(
                np.concatenate([b["u"].to_numpy(zero_copy_only=False),
                                b["v"].to_numpy(zero_copy_only=False)]),
                return_counts=True)
            t = pa.table({"node": pa.array(nodes.astype(np.int64)),
                          "c": pa.array(cnt.astype(np.int64))})
            return append_coarse_bucket(t, ["node"], num_buckets, "__db")

        def deg_fold(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("node", as_index=False)["c"].sum()
            return out[out["c"] < k][["node"]]

        weak = (edges.map_batches(deg_partial, batch_format="pyarrow")
                .groupby("__db")
                .map_groups(lambda df: deg_fold(df.drop(columns="__db")),
                            batch_format="pandas").to_pandas())
        if weak.empty:
            break
        ref = ray.put(pa.array(weak["node"].to_numpy(np.int64),
                               pa.int64()))

        def drop(b: pa.Table, ref=ref) -> pa.Table:
            import pyarrow.compute as pc
            import ray as _ray

            w = _ray.get(ref)
            keep = pc.and_(
                pc.invert(pc.is_in(b["u"], value_set=w)),
                pc.invert(pc.is_in(b["v"], value_set=w)))
            return b.filter(keep)

        edges = edges.map_batches(drop, batch_format="pyarrow") \
            .materialize()
        if edges.count() == 0:
            return empty()

    # final degrees distributed too — only the node-cardinality
    # (node, deg) result ever reaches the driver
    def fin_partial(b: pa.Table) -> pa.Table:
        nodes, cnt = np.unique(
            np.concatenate([b["u"].to_numpy(zero_copy_only=False),
                            b["v"].to_numpy(zero_copy_only=False)]),
            return_counts=True)
        t = pa.table({"node": pa.array(nodes.astype(np.int64)),
                      "c": pa.array(cnt.astype(np.int64))})
        return append_coarse_bucket(t, ["node"], num_buckets, "__db")

    def fin_fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["c"].sum()

    deg = (edges.map_batches(fin_partial, batch_format="pyarrow")
           .groupby("__db")
           .map_groups(lambda df: fin_fold(df.drop(columns="__db")),
                       batch_format="pandas")
           .to_pandas().sort_values("node"))
    return pa.table({
        "node": pa.array(deg["node"].to_numpy(np.int64)),
        "core_deg": pa.array(deg["c"].to_numpy(np.int64))})


def edge_churn(members_tagged, group_col: str, item_col: str,
               era_col: str = "era", num_buckets: int = 256) -> pa.Table:
    """Temporal churn of a co-occurrence graph between two eras (era
    values 1 and 2): build each era's distinct item-pair edge set
    (:func:`cooccurrence_edges` semantics) and count stable / new /
    dropped edges — "which trading relationships appeared or died
    after the split".

    ``members_tagged`` carries (group, item, era) rows; BOTH eras ride
    ONE hash(group) pair-forming shuffle (the per-bucket fold forms
    pairs within (group, era) and dedups bucket-locally per era), then
    ONE hash(u, v) fold reduces every edge to its 2-bit era-presence
    mask — two shuffles total, no edge list ever gathers to the
    driver, which adds |buckets| count rows. Returns one row
    (n_edges_a, n_edges_b, n_stable, n_new, n_dropped)."""
    from ..engine.hashing import append_coarse_bucket

    def members(b: pa.Table) -> pa.Table:
        df = b.select([group_col, item_col, era_col]).to_pandas() \
            .drop_duplicates()
        t = pa.table({
            "g": pa.array(df[group_col].to_numpy(np.int64)),
            "i": pa.array(df[item_col].to_numpy(np.int64)),
            "era": pa.array(df[era_col].to_numpy(np.int64))})
        return append_coarse_bucket(t, ["g"], num_buckets, "__cb")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["g", "i", "era"])
        m = df.merge(df, on=["g", "era"])
        m = m[m["i_x"] < m["i_y"]]
        m = m.drop_duplicates(["i_x", "i_y", "era"])
        return pd.DataFrame({"u": m["i_x"].to_numpy(np.int64),
                             "v": m["i_y"].to_numpy(np.int64),
                             "era": m["era"].to_numpy(np.int64)})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby(["u", "v"])["era"].agg(
            lambda s: int(np.bitwise_or.reduce(s.to_numpy()))) \
            .reset_index(name="mask")
        cnt = m["mask"].value_counts()
        return pd.DataFrame({
            "n_a": pd.Series([int(cnt.get(1, 0) + cnt.get(3, 0))],
                             dtype="int64"),
            "n_b": pd.Series([int(cnt.get(2, 0) + cnt.get(3, 0))],
                             dtype="int64"),
            "n_stable": pd.Series([int(cnt.get(3, 0))], dtype="int64"),
            "n_new": pd.Series([int(cnt.get(2, 0))], dtype="int64"),
            "n_dropped": pd.Series([int(cnt.get(1, 0))], dtype="int64")})

    parts = (members_tagged.map_batches(members, batch_format="pyarrow")
             .groupby("__cb")
             .map_groups(lambda df: pairs(df.drop(columns="__cb")),
                         batch_format="pandas")
             .map_batches(lambda b: append_coarse_bucket(
                 b, ["u", "v"], num_buckets, "__eb"),
                 batch_format="pyarrow")
             .groupby("__eb")
             .map_groups(lambda df: fold(df.drop(columns="__eb")),
                         batch_format="pandas").to_pandas())
    tot = parts.sum()
    return pa.table({
        "n_edges_a": pa.array([int(tot["n_a"])], pa.int64()),
        "n_edges_b": pa.array([int(tot["n_b"])], pa.int64()),
        "n_stable": pa.array([int(tot["n_stable"])], pa.int64()),
        "n_new": pa.array([int(tot["n_new"])], pa.int64()),
        "n_dropped": pa.array([int(tot["n_dropped"])], pa.int64())})


# driver-vs-distributed budget for the per-edge popcount fold
# (edges × uint64-words per adjacency row); module-level so a
# route-identity test can monkeypatch it
_POPCOUNT_DRIVER_WORK = 32 << 20


def _swar_common_counts(words: np.ndarray, cu: np.ndarray,
                        cv: np.ndarray) -> np.ndarray:
    """|N(u)∩N(v)| per edge from packed uint64 adjacency rows —
    4-step SWAR popcount of the row AND, vectorized over edges."""
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    s1, s2, s4, s56 = (np.uint64(k) for k in (1, 2, 4, 56))
    x = words[cu] & words[cv]
    x = x - ((x >> s1) & m1)
    x = (x & m2) + ((x >> s2) & m2)
    x = (x + (x >> s4)) & m4
    return ((x * h01) >> s56).sum(axis=1).astype(np.int64)


def local_clustering(edges_ds, u_col: str = "u", v_col: str = "v",
                     num_buckets: int = 64,
                     driver_limit: int = 5_000_000) -> pa.Table:
    """Per-node local clustering coefficient over an undirected simple
    graph: cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the
    community-density screen (high cc = tight cliques, low = hub
    spokes). Edges are globally deduplicated first (the
    trade_communities lesson).

    Follows :func:`triangle_count`'s size contract: the DISTINCT edge
    set must be dimension-sized (≤ ``driver_limit``) — refusing loudly
    above the limit rather than silently materializing a fact-sized
    adjacency. Per-node triangles come from bit-packed common-neighbor
    popcounts per edge (tri(v) = Σ_{e∋v} |N(u)∩N(v)| / 2), chunked over
    edges — edges × n/8 byte-ops, never the O(n³) dense matmul (a 20k-
    node sf0.1 part graph would need 8e12 integer ops that way).
    Returns (node, deg, n_tri, cc round6) ordered by node."""
    from ..engine.hashing import append_coarse_bucket

    def pre(b: pa.Table) -> pa.Table:
        df = b.select([u_col, v_col]).to_pandas() \
            .drop_duplicates([u_col, v_col])
        a = df[u_col].to_numpy(np.int64)
        bb = df[v_col].to_numpy(np.int64)
        lo, hi = np.minimum(a, bb), np.maximum(a, bb)
        keep = lo != hi
        t = pa.table({"u": pa.array(lo[keep]), "v": pa.array(hi[keep])})
        return append_coarse_bucket(t, ["u"], num_buckets, "__eb")

    pre_ds = edges_ds.map_batches(pre, batch_format="pyarrow") \
        .materialize()
    if pre_ds.count() <= driver_limit:
        # block-deduped stream already fits the driver contract: one
        # pandas drop_duplicates beats a Ray shuffle whose only job is
        # dedup (per-round shuffle fixed cost ~3s on this box)
        df = pre_ds.to_pandas().drop(columns="__eb") \
            .drop_duplicates(["u", "v"])
    else:
        edges = (pre_ds.groupby("__eb")
                 .map_groups(lambda df: df.drop(columns="__eb")
                             .drop_duplicates(["u", "v"]),
                             batch_format="pandas").materialize())
        if edges.count() > driver_limit:
            raise ValueError(
                "local_clustering: distinct edge set exceeds the "
                "driver popcount contract; raise driver_limit only "
                "with matching memory")
        df = edges.to_pandas()
    u = df["u"].to_numpy(np.int64)
    v = df["v"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([u, v]))
    iu = np.searchsorted(nodes, u)
    iv = np.searchsorted(nodes, v)
    n = len(nodes)
    # driver memory is O(n²/8) for the packed adjacency — the edge-count
    # route guard alone lets a sparse 5M-edge/1M-node graph through that
    # would need ~125GB here; bound the PACKED bytes explicitly
    width = ((n + 63) // 64) * 8  # bytes per row, uint64-aligned
    if n * width > (2 << 30):
        raise ValueError(
            f"local_clustering: packed adjacency needs {n * width >> 20} MiB "
            f"for {n} nodes — exceeds the 2 GiB driver budget; bucket the "
            "graph or reduce the node set")
    # build the packed bitmap DIRECTLY from edge indices (MSB-first, as
    # np.packbits would) — never materializing the n×n bool intermediate
    packed = np.zeros((n, width), dtype=np.uint8)
    rows = np.concatenate([iu, iv])
    cols = np.concatenate([iv, iu])
    np.bitwise_or.at(packed, (rows, cols >> 3),
                     (np.uint8(0x80) >> (cols & 7).astype(np.uint8)))
    deg = np.bincount(rows, minlength=n).astype(np.int64)
    # the AND + SWAR popcount runs 8 bytes at a time (a uint8 table
    # lookup here measured 25s on the sf0.1 part graph; SWAR ~2s).
    # SIZE-ROUTED on total word-ops (edges × words/row): small graphs
    # loop on the driver; dense fact-scale graphs (the sf0.1 co-order
    # graph is 1.2M edges × 313 words ≈ 375M word-ops — ~20s of pure
    # memory-bound popcount) broadcast the packed matrix ONCE
    # (ray.put, ~n²/8 bytes — already driver-budget-guarded above) and
    # fan the edge chunks over the cluster; per-node partial sums fold
    # exactly, so both routes are bit-identical.
    words = packed.view(np.uint64)
    tri2 = np.zeros(n, dtype=np.int64)  # 2·tri(v): each triangle at v
    # is seen by BOTH of v's incident edges via the common neighbor
    if len(iu) * words.shape[1] <= _POPCOUNT_DRIVER_WORK:
        chunk = max(1, (64 << 20) // max(8 * words.shape[1], 1))
        for s in range(0, len(iu), chunk):
            cu, cv = iu[s:s + chunk], iv[s:s + chunk]
            cn = _swar_common_counts(words, cu, cv)
            tri2 += np.bincount(cu, weights=cn, minlength=n) \
                .astype(np.int64)
            tri2 += np.bincount(cv, weights=cn, minlength=n) \
                .astype(np.int64)
    else:
        import ray
        import ray.data as rd

        wref = ray.put(words)
        n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 4)

        def count_part(b: pa.Table) -> pa.Table:
            W = ray.get(wref)
            cu = b["cu"].to_numpy(zero_copy_only=False)
            cv = b["cv"].to_numpy(zero_copy_only=False)
            t2 = np.zeros(n, dtype=np.float64)
            chunk = max(1, (64 << 20) // max(8 * W.shape[1], 1))
            for s in range(0, len(cu), chunk):
                cn = _swar_common_counts(W, cu[s:s + chunk],
                                         cv[s:s + chunk])
                t2 += np.bincount(cu[s:s + chunk], weights=cn,
                                  minlength=n)
                t2 += np.bincount(cv[s:s + chunk], weights=cn,
                                  minlength=n)
            nz = np.flatnonzero(t2)
            return pa.table({"node": pa.array(nz.astype(np.int64)),
                             "t2": pa.array(t2[nz].astype(np.int64))})

        parts = (rd.from_arrow(pa.table({"cu": pa.array(iu.astype(np.int64)),
                                         "cv": pa.array(iv.astype(np.int64))}))
                 .repartition(n_blocks)
                 .map_batches(count_part, batch_format="pyarrow",
                              batch_size=None)
                 .to_pandas())
        agg = parts.groupby("node")["t2"].sum()
        tri2[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)
    tri = tri2 // 2
    denom = (deg * (deg - 1)).astype(np.float64)
    cc = np.where(deg >= 2,
                  (2.0 * tri.astype(np.float64))
                  / np.where(denom == 0, 1.0, denom), 0.0)
    cc = np.sign(cc) * np.floor(np.abs(cc) * 1e6 + 0.5) / 1e6
    return pa.table({
        "node": pa.array(nodes),
        "deg": pa.array(deg),
        "n_tri": pa.array(tri),
        "cc": pa.array(cc, pa.float64())})


def deterministic_walks(edges_ds, n_walks: int = 2, length: int = 3,
                        u_col: str = "u", v_col: str = "v",
                        num_buckets: int = 64,
                        driver_limit: int = 5_000_000) -> pa.Table:
    """Stateless deterministic random walks over an undirected simple
    graph — the node2vec/DeepWalk corpus generator: ``n_walks`` walks
    of ``length`` steps start at EVERY node, and the step rule is
    RNG-free: at node c, step s, walk w the next node is the sorted
    neighbor at rank ``seed_key32(c·16 + s·n_walks + w) % deg(c)``
    (injective for s·n_walks + w < 16), so any executor, any block
    order, and the DuckDB HUGEINT replay all walk the same paths.

    Size-routed on the block-deduped edge stream (the bounded-graph
    driver-fold discipline): under ``driver_limit`` one numpy CSR walk
    on the driver; above it the adjacency is rank-annotated once via a
    hash(u) fold and each step is one tagged-union bucket fold joining
    the frontier to (u, rank) — ``length`` bounded shuffles, no
    per-pair blowup. Returns (start, walk_id, step, node) for steps
    0..length; output is nodes × n_walks × (length+1) rows (write it
    to a sink for fact-sized node sets)."""
    from ..engine.hashing import append_coarse_bucket
    from .cluster import seed_key32

    if n_walks < 1 or length < 1 or n_walks * length + n_walks - 1 >= 16:
        raise ValueError("deterministic_walks: need n_walks, length >= 1 "
                         "and length*n_walks + n_walks - 1 < 16")

    def pre(b: pa.Table) -> pa.Table:
        df = b.select([u_col, v_col]).to_pandas() \
            .drop_duplicates([u_col, v_col])
        a = df[u_col].to_numpy(np.int64)
        bb = df[v_col].to_numpy(np.int64)
        keep = a != bb
        a, bb = a[keep], bb[keep]
        t = pa.table({"u": pa.array(np.concatenate([a, bb])),
                      "v": pa.array(np.concatenate([bb, a]))})
        t = pa.Table.from_pandas(
            t.to_pandas().drop_duplicates(["u", "v"]),
            preserve_index=False)
        return append_coarse_bucket(t, ["u"], num_buckets, "__wb")

    pre_ds = edges_ds.map_batches(pre, batch_format="pyarrow") \
        .materialize()

    if pre_ds.count() <= driver_limit:
        df = pre_ds.to_pandas().drop(columns="__wb") \
            .drop_duplicates(["u", "v"]).sort_values(["u", "v"])
        u = df["u"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        nodes = np.unique(u)
        indptr = np.searchsorted(u, nodes)
        indptr = np.append(indptr, len(u))
        deg = np.diff(indptr).astype(np.int64)
        starts = np.repeat(nodes, n_walks)
        walks = np.tile(np.arange(n_walks, dtype=np.int64), len(nodes))
        cur = starts.copy()
        frames = [(starts, walks, np.zeros(len(cur), np.int64), cur)]
        for s in range(1, length + 1):
            key = cur * 16 + np.int64(s * n_walks) + walks
            idx = np.searchsorted(nodes, cur)
            rank = seed_key32(key) % deg[idx]
            cur = v[indptr[idx] + rank]
            frames.append((starts, walks,
                           np.full(len(cur), s, np.int64), cur))
        out = pd.DataFrame({
            "start": np.concatenate([f[0] for f in frames]),
            "walk_id": np.concatenate([f[1] for f in frames]),
            "step": np.concatenate([f[2] for f in frames]),
            "node": np.concatenate([f[3] for f in frames])}) \
            .sort_values(["start", "walk_id", "step"])
        return pa.Table.from_pandas(out.reset_index(drop=True),
                                    preserve_index=False)

    # distributed route: rank-annotate the adjacency once, then one
    # tagged-union bucket fold per step
    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__wb").drop_duplicates(["u", "v"]) \
            .sort_values(["u", "v"])
        df["rk"] = df.groupby("u").cumcount().astype(np.int64)
        df["deg"] = df.groupby("u")["v"].transform("size") \
            .astype(np.int64)
        return df

    adj = pre_ds.groupby("__wb") \
        .map_groups(annotate, batch_format="pandas").materialize()

    def seeds(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["rk"] == 0]
        n0 = df["u"].to_numpy(np.int64)
        return pa.table({
            "start": pa.array(np.repeat(n0, n_walks)),
            "walk_id": pa.array(np.tile(
                np.arange(n_walks, dtype=np.int64), len(n0))),
            "node": pa.array(np.repeat(n0, n_walks))})

    frontier = adj.map_batches(seeds, batch_format="pyarrow") \
        .materialize()
    collected = [frontier.to_pandas().assign(step=np.int64(0))]

    def tag_adj(b: pa.Table) -> pa.Table:
        t = pa.table({
            "u": b["u"], "v": b["v"], "rk": b["rk"], "deg": b["deg"],
            # zero sentinels, never nulls: nullable int64 turns
            # float64 inside the pandas fold and rounds ids > 2^53
            "start": pa.array(np.zeros(b.num_rows, np.int64)),
            "walk_id": pa.array(np.zeros(b.num_rows, np.int64)),
            "kind": pa.array(np.zeros(b.num_rows, np.int64))})
        return append_coarse_bucket(t, ["u"], num_buckets, "__sb")

    adj_tagged = adj.map_batches(tag_adj, batch_format="pyarrow") \
        .materialize()

    for s in range(1, length + 1):
        def tag_frontier(b: pa.Table, _s=s) -> pa.Table:
            t = pa.table({
                "u": b["node"],
                "v": pa.array(np.zeros(b.num_rows, np.int64)),
                "rk": pa.array(np.zeros(b.num_rows, np.int64)),
                "deg": pa.array(np.zeros(b.num_rows, np.int64)),
                "start": b["start"], "walk_id": b["walk_id"],
                "kind": pa.array(np.ones(b.num_rows, np.int64))})
            return append_coarse_bucket(t, ["u"], num_buckets, "__sb")

        def step_fold(df: pd.DataFrame, _s=s) -> pd.DataFrame:
            a = df[df["kind"] == 0]
            f = df[df["kind"] == 1]
            if f.empty or a.empty:
                return pd.DataFrame({
                    "start": pd.Series(dtype="int64"),
                    "walk_id": pd.Series(dtype="int64"),
                    "node": pd.Series(dtype="int64")})
            dg = a[["u", "deg"]].drop_duplicates("u")
            fm = f[["start", "walk_id", "u"]].astype("int64") \
                .merge(dg.astype({"u": "int64", "deg": "int64"}), on="u")
            key = fm["u"].to_numpy(np.int64) * 16 \
                + np.int64(_s * n_walks) \
                + fm["walk_id"].to_numpy(np.int64)
            from .cluster import seed_key32 as _sk
            fm["rk"] = _sk(key) % fm["deg"].to_numpy(np.int64)
            nx = fm.merge(a[["u", "rk", "v"]].astype("int64"),
                          on=["u", "rk"])
            return pd.DataFrame({
                "start": nx["start"].to_numpy(np.int64),
                "walk_id": nx["walk_id"].to_numpy(np.int64),
                "node": nx["v"].to_numpy(np.int64)})

        stepped = (adj_tagged.union(
            frontier.map_batches(tag_frontier, batch_format="pyarrow"))
            .groupby("__sb")
            .map_groups(lambda d, _f=step_fold: _f(d.drop(columns="__sb")),
                        batch_format="pandas").materialize())
        frontier = stepped
        collected.append(stepped.to_pandas().assign(step=np.int64(s)))

    out = pd.concat(collected, ignore_index=True) \
        [["start", "walk_id", "step", "node"]] \
        .astype("int64").sort_values(["start", "walk_id", "step"])
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def neighbor_features(edges_ds, feat_ds, node_col: str, feat_col: str,
                      u_col: str = "u", v_col: str = "v",
                      feat_scale: int = 100,
                      num_buckets: int = 64) -> "object":
    """One round of GNN-style feature propagation over an undirected
    simple graph: for every node, the COUNT and integer-scaled SUM/MEAN
    of its distinct neighbors' feature — the graph feature-engineering
    pass (e.g. "average account balance of my trading partners") that
    turns an edge list into model columns.

    Plan: edges dedup+symmetrize per block, the neighbor value rides a
    SIZE-ROUTED attach (feature table is node-sized), and ONE coarse
    hash(u) fold emits (node, n_nbrs, nbr_sum, nbr_mean) — mean is an
    exact integer ratio micro-rounded half-away, so DuckDB replays it.
    Returns a Dataset ordered within folds; node-sized output."""
    from ..engine.hashing import append_coarse_bucket
    from .join import attach_by_key

    def pre(b: pa.Table) -> pa.Table:
        df = b.select([u_col, v_col]).to_pandas() \
            .drop_duplicates([u_col, v_col])
        a = df[u_col].to_numpy(np.int64)
        bb = df[v_col].to_numpy(np.int64)
        keep = a != bb
        a, bb = a[keep], bb[keep]
        t = pa.table({"u": pa.array(np.concatenate([a, bb])),
                      "v": pa.array(np.concatenate([bb, a]))})
        return pa.Table.from_pandas(
            t.to_pandas().drop_duplicates(["u", "v"]),
            preserve_index=False)

    def scale_feat(b: pa.Table) -> pa.Table:
        x = b[feat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        xi = (np.sign(x) * np.floor(np.abs(x) * feat_scale + 0.5)) \
            .astype(np.int64)
        return pa.table({node_col: b[node_col], "__fv": pa.array(xi)})

    edges = edges_ds.map_batches(pre, batch_format="pyarrow")
    feats = feat_ds.select_columns([node_col, feat_col]) \
        .map_batches(scale_feat, batch_format="pyarrow")
    tagged = attach_by_key(edges, feats, "v", node_col, ["__fv"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["u", "v"])
        g = df.groupby("u", sort=True)["__fv"].agg(["size", "sum"]) \
            .reset_index()
        n = g["size"].to_numpy(np.int64)
        s = g["sum"].astype("int64").to_numpy()
        den = n * np.int64(feat_scale)
        micro = np.sign(s) * ((np.abs(s) * 2_000_000 + den)
                              // (2 * den))
        return pd.DataFrame({
            "node": g["u"].to_numpy(np.int64),
            "n_nbrs": n,
            "nbr_sum": s,
            "nbr_mean": micro.astype(np.float64) / 1e6})

    return (tagged.map_batches(
        lambda b: append_coarse_bucket(b, ["u"], num_buckets, "__nb"),
        batch_format="pyarrow")
        .groupby("__nb")
        .map_groups(lambda d: fold(d.drop(columns="__nb")),
                    batch_format="pandas"))
