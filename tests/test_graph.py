"""PageRank: driver route vs distributed message-passing route identity,
dangling-mass redistribution, multi-edge semantics, and a numpy
power-iteration cross-check."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raysketch.ops.graph import pagerank


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, dtype=np.int64)),
        "dst": pa.array(np.asarray(dst, dtype=np.int64))}))


def _ranks(ds) -> pd.Series:
    df = ds.to_pandas().sort_values("node").reset_index(drop=True)
    return df.set_index("node")["rank"]


def _power_iteration(src, dst, damping, iters):
    nodes = np.unique(np.concatenate([src, dst]))
    n = nodes.size
    i_s, i_d = np.searchsorted(nodes, src), np.searchsorted(nodes, dst)
    deg = np.bincount(i_s, minlength=n).astype(float)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        msg = np.where(deg[i_s] > 0, r[i_s] / np.maximum(deg[i_s], 1), 0.0)
        s = np.bincount(i_d, weights=msg, minlength=n)
        dang = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (s + dang / n)
    return pd.Series(r, index=nodes)


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(17)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    keep = src != dst
    # node 61 exists only as a destination twice -> dangling node
    src = np.concatenate([src[keep], [3, 5]])
    dst = np.concatenate([dst[keep], [61, 61]])
    return src.astype(np.int64), dst.astype(np.int64)


def test_driver_route_matches_power_iteration(ray_session, graph):
    src, dst = graph
    got = _ranks(pagerank(_edges_ds(src, dst), damping=0.85, iters=8))
    want = _power_iteration(src, dst, 0.85, 8)
    assert got.index.tolist() == want.index.tolist()
    assert np.allclose(got.to_numpy(), want.to_numpy(), atol=1e-14)
    assert abs(got.sum() - 1.0) < 1e-9  # dangling mass redistributed


def test_distributed_route_identity(ray_session, graph):
    src, dst = graph
    drv = _ranks(pagerank(_edges_ds(src, dst), iters=4))
    dist = _ranks(pagerank(_edges_ds(src, dst), iters=4, driver_limit=0,
                           coarse_buckets=8))
    assert drv.index.tolist() == dist.index.tolist()
    # identical math; only float summation order differs between numpy
    # bincount and the per-bucket pandas groupby sums
    assert np.allclose(drv.to_numpy(), dist.to_numpy(), atol=1e-12)
    assert abs(dist.sum() - 1.0) < 1e-9


def test_multi_edges_count_multiply(ray_session):
    # duplicating an edge doubles its contribution weight
    single = _ranks(pagerank(_edges_ds([1, 2], [2, 1]), iters=3))
    multi = _ranks(pagerank(_edges_ds([1, 1, 2], [2, 2, 1]), iters=3))
    assert single.index.tolist() == multi.index.tolist() == [1, 2]
    # symmetric 2-cycle: both uniform; multi-edge 1->2 (deg 2 both rows)
    # still sends ALL of node 1's mass to 2 -> identical here by design
    assert np.allclose(single.to_numpy(), multi.to_numpy())


def test_converges_to_dominant_eigenvector(ray_session):
    # star graph 0 <-> {1,2,3}: 200 damped iterations (0.85^200 ~ 1e-14)
    # must reach the google-matrix dominant eigenvector
    r = _ranks(pagerank(_edges_ds([0, 0, 0, 1, 2, 3], [1, 2, 3, 0, 0, 0]),
                        iters=200))
    P = np.array([[0, 1 / 3, 1 / 3, 1 / 3],
                  [1, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]]).T
    G = 0.15 / 4 + 0.85 * P
    w, v = np.linalg.eig(G)
    pi = np.real(v[:, np.argmax(np.real(w))])
    pi = pi / pi.sum()
    assert np.allclose(r.sort_index().to_numpy(), pi, atol=1e-12)


def test_validation_and_empty(ray_session):
    with pytest.raises(ValueError):
        pagerank(_edges_ds([1], [2]), damping=1.5)
    with pytest.raises(ValueError):
        pagerank(_edges_ds([1], [2]), iters=0)
    out = pagerank(_edges_ds([], []))
    # empty-Dataset to_pandas drops columns (Ray 2.49) -> assert via schema
    assert out.count() == 0 and out.schema().names == ["node", "rank"]


def test_plan_equi_join(ray_session):
    # (placed here to reuse the module's Ray fixture) join-size planning
    # via CMS inner product: overestimate-bounded, exact in the sparse
    # regime, and the strategy routes by the smaller side
    import pyarrow as pa
    import ray.data as rd

    from raysketch.ops.join import plan_equi_join

    rng = np.random.default_rng(8)
    a = rng.integers(0, 30, 5000).astype(np.int64)
    b = rng.integers(0, 30, 700).astype(np.int64)
    ds_a = rd.from_arrow(pa.table({"k": pa.array(a)}))
    ds_b = rd.from_arrow(pa.table({"k": pa.array(b)}))
    plan = plan_equi_join(ds_a, "k", ds_b, "k")
    ca = np.bincount(a, minlength=30)
    cb = np.bincount(b, minlength=30)
    true = int((ca * cb).sum())
    assert plan["est_rows"] == true  # sparse-exact regime
    assert plan["n_a"] == 5000 and plan["n_b"] == 700
    assert plan["strategy"] == "broadcast_b"
    # force the partitioned route
    plan2 = plan_equi_join(ds_a, "k", ds_b, "k", broadcast_row_limit=10)
    assert plan2["strategy"] == "partitioned"
    plan3 = plan_equi_join(ds_b, "k", ds_a, "k", broadcast_row_limit=1000)
    assert plan3["strategy"] == "broadcast_a"
    assert plan3["est_rows"] == true  # symmetric


def test_query_shuffle_routes_match_driver_routes(ray_session, monkeypatch):
    # force the >limit shuffle branches of pagerank_suppliers and
    # key_skew_profile and pin them to the driver-route outputs
    import raysketch.queries as q

    d = "/root/testdata/sf0.001"
    drv_pr = q.q_pagerank_suppliers(d).to_pandas()
    drv_sk = q.q_key_skew_profile(d).to_pandas()
    monkeypatch.setattr(q, "_DRIVER_FOLD_LIMIT", 0)
    shf_pr = q.q_pagerank_suppliers(d).to_pandas()
    shf_sk = q.q_key_skew_profile(d).to_pandas()
    assert drv_pr["node"].tolist() == shf_pr["node"].tolist()
    # float sum order differs between the routes; round6 must agree
    assert drv_pr["pr"].tolist() == shf_pr["pr"].tolist()
    assert drv_sk.equals(shf_sk)


def test_pagerank_checkpointed_kill_resume(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from raysketch.ops.graph import pagerank_checkpointed

    rng = np.random.default_rng(21)
    src = rng.integers(0, 50, 300).astype(np.int64)
    dst = rng.integers(0, 50, 300).astype(np.int64)
    shards = []
    for i in range(3):
        p = str(tmp_path / f"edges-{i}.parquet")
        pq.write_table(pa.table({"src": pa.array(src[i::3]),
                                 "dst": pa.array(dst[i::3])}), p)
        shards.append(p)
    ck = str(tmp_path / "ck")

    # full run (no failures) in its own job: the ground truth
    full = pagerank_checkpointed(shards, ck, "full", iters=4,
                                 coarse_buckets=8)
    assert full["resumed_from_iter"] == 0
    want = full["ranks"].to_pandas().sort_values("node").reset_index(drop=True)

    # killed after iteration 1 commits
    with pytest.raises(RuntimeError, match="_fail_after"):
        pagerank_checkpointed(shards, ck, "killed", iters=4,
                              coarse_buckets=8, _fail_after=1)
    # stages 0 and 1 are complete on disk; 2+ absent
    assert os.path.exists(os.path.join(ck, "killed", "stage_iter_0001",
                                       "_SUCCESS"))
    assert not os.path.exists(os.path.join(ck, "killed", "stage_iter_0002"))

    # resume: skips iterations 0-1, finishes 2-3, identical final ranks
    res = pagerank_checkpointed(shards, ck, "killed", iters=4,
                                coarse_buckets=8)
    assert res["resumed_from_iter"] == 2
    got = res["ranks"].to_pandas().sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == want["node"].tolist()
    assert np.allclose(got["rank"].to_numpy(), want["rank"].to_numpy(),
                       atol=1e-15)

    # a third run is a no-op resume (everything complete)
    res2 = pagerank_checkpointed(shards, ck, "killed", iters=4,
                                 coarse_buckets=8)
    assert res2["resumed_from_iter"] == 4


def test_hits_routes_and_properties(ray_session, graph):
    from raysketch.ops.graph import hits

    src, dst = graph
    drv = hits(_edges_ds(src, dst), iters=3).to_pandas().sort_values(
        "node").reset_index(drop=True)
    dist = hits(_edges_ds(src, dst), iters=3, driver_limit=0,
                coarse_buckets=8).to_pandas().sort_values(
        "node").reset_index(drop=True)
    assert drv["node"].tolist() == dist["node"].tolist()
    assert np.allclose(drv["hub"], dist["hub"], atol=1e-12)
    assert np.allclose(drv["auth"], dist["auth"], atol=1e-12)
    # L2 norms are 1 after the final normalization of each vector
    assert abs(np.square(drv["hub"]).sum() - 1.0) < 1e-9
    assert abs(np.square(drv["auth"]).sum() - 1.0) < 1e-9
    # bipartite sanity: a node that is ONLY a destination has hub 0
    only_dst = set(dst) - set(src)
    if only_dst:
        n0 = drv.set_index("node")
        assert (n0.loc[sorted(only_dst), "hub"] == 0).all()
    with pytest.raises(ValueError):
        hits(_edges_ds([1], [2]), iters=0)
    out = hits(_edges_ds([], []))
    assert out.count() == 0 and out.schema().names == ["node", "hub", "auth"]


def test_weighted_pagerank_routes_and_semantics(ray_session, graph):
    import pyarrow as pa2
    import ray.data as rd

    src, dst = graph
    rng = np.random.default_rng(3)
    w = rng.integers(1, 9, src.size).astype(np.float64)
    eds = rd.from_arrow(pa2.table({
        "src": pa2.array(src), "dst": pa2.array(dst), "w": pa2.array(w)}))
    drv = _ranks(pagerank(eds, iters=4, weight="w"))
    dist = _ranks(pagerank(eds, iters=4, weight="w", driver_limit=0,
                           coarse_buckets=8))
    assert drv.index.tolist() == dist.index.tolist()
    assert np.allclose(drv.to_numpy(), dist.to_numpy(), atol=1e-12)
    assert abs(drv.sum() - 1.0) < 1e-9
    # weight semantics: an integer weight k equals k parallel unit edges
    multi = _ranks(pagerank(_edges_ds(
        np.repeat(src, w.astype(int)), np.repeat(dst, w.astype(int))),
        iters=4))
    assert np.allclose(drv.to_numpy(), multi.to_numpy(), atol=1e-12)
    # unweighted call is unchanged by the weight plumbing (w=1 identity)
    u1 = _ranks(pagerank(_edges_ds(src, dst), iters=4))
    ones = rd.from_arrow(pa2.table({
        "src": pa2.array(src), "dst": pa2.array(dst),
        "w": pa2.array(np.ones(src.size))}))
    u2 = _ranks(pagerank(ones, iters=4, weight="w"))
    assert (u1.to_numpy() == u2.to_numpy()).all()


def test_personalized_pagerank(ray_session, graph):
    src, dst = graph
    seeds = np.unique(src)[:3]
    drv = _ranks(pagerank(_edges_ds(src, dst), iters=6, seeds=seeds))
    dist = _ranks(pagerank(_edges_ds(src, dst), iters=6, seeds=seeds,
                           driver_limit=0, coarse_buckets=8))
    assert drv.index.tolist() == dist.index.tolist()
    assert np.allclose(drv.to_numpy(), dist.to_numpy(), atol=1e-12)
    # mass conserved; seeds hold concentrated mass vs the global walk
    assert abs(drv.sum() - 1.0) < 1e-9
    glob = _ranks(pagerank(_edges_ds(src, dst), iters=6))
    assert drv.loc[seeds].sum() > glob.loc[seeds].sum()
    # a node far from seeds ranks lower than under the global teleport
    with pytest.raises(ValueError):
        pagerank(_edges_ds(src, dst), seeds=np.array([10**9]))
    with pytest.raises(ValueError):
        pagerank(_edges_ds(src, dst), seeds=np.array([10**9]),
                 driver_limit=0, coarse_buckets=8)


def test_polars_hash_width_independent_and_role_based_pool():
    # the role-based POLARS_MAX_THREADS sizing is safe ONLY because hash
    # values are identical at any pool width — pin that in fresh
    # subprocesses (pool width is fixed at first polars import)
    import subprocess
    import sys

    code = (
        "import os; os.environ['POLARS_MAX_THREADS'] = '{w}'\n"
        "import pyarrow as pa\n"
        "from raysketch.engine.hashing import hash64_batch_aligned\n"
        "h, fam = hash64_batch_aligned("
        "pa.array(['a','b','c','dd','eee']))\n"
        "print(list(h), bool(fam.all()))\n"
    )
    outs = []
    for w in ("1", "8"):
        r = subprocess.run([sys.executable, "-c", code.format(w=w)],
                           capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout)
    assert outs[0] == outs[1] and outs[0].strip()


def test_weighted_zero_out_strength_node_is_dangling(ray_session):
    # a node whose out-edges ALL carry weight 0 has out-strength 0: the
    # driver route treats it as dangling via safe_deg; the distributed
    # fold must do the same (not divide by deg==0 into NaN/inf) —
    # round-3 advisor finding, route identity pinned here
    import pyarrow as pa2
    import ray.data as rd

    eds = rd.from_arrow(pa2.table({
        "src": pa2.array(np.array([1, 2, 3, 3], dtype=np.int64)),
        "dst": pa2.array(np.array([2, 3, 1, 2], dtype=np.int64)),
        "w": pa2.array(np.array([1.0, 2.0, 0.0, 0.0]))}))
    drv = _ranks(pagerank(eds, iters=4, weight="w"))
    dist = _ranks(pagerank(eds, iters=4, weight="w", driver_limit=0,
                           coarse_buckets=4))
    assert np.isfinite(dist.to_numpy()).all()
    assert drv.index.tolist() == dist.index.tolist()
    assert np.allclose(drv.to_numpy(), dist.to_numpy(), atol=1e-12)
    assert abs(dist.sum() - 1.0) < 1e-9  # node 3's mass redistributed


def test_ray_worker_forces_narrow_polars_pool(ray_session):
    # the driver's POLARS_MAX_THREADS=8 rides os.environ into every Ray
    # worker child; raysketch's package init must FORCE-assign 1 there
    # (setdefault would silently keep 8 per worker) — round-3 advisor
    # finding, verified inside a real worker process
    import ray

    @ray.remote
    def probe():
        import os

        import raysketch  # noqa: F401  (package init ran at import)
        import polars as pl

        return os.environ.get("POLARS_MAX_THREADS"), pl.thread_pool_size()

    env_val, pool = ray.get(probe.remote())
    assert env_val == "1"
    assert pool == 1


def test_graph_queries_partitioned_attach_route_identity(
        ray_session, monkeypatch):
    # round-3 verdict item #1: the five trade-graph queries now build
    # their edge lists through the SIZE-ROUTED attach_by_key. Force the
    # partitioned hash-join branch and pin it to the broadcast-branch
    # output (oracle-shaped results are round6 -> bit-comparable).
    import raysketch.ops.join as join_mod
    import raysketch.queries as q

    d = "/root/testdata/sf0.001"
    real = join_mod.attach_by_key

    def forced(fact_ds, dim_ds, fact_key, dim_key, value_cols, **kw):
        kw["broadcast_limit_rows"] = 0
        kw.setdefault("num_partitions", 4)
        return real(fact_ds, dim_ds, fact_key, dim_key, value_cols, **kw)

    for fn in (q.q_pagerank_suppliers, q.q_hits_trade,
               q.q_customer_order_profile):
        monkeypatch.undo()
        want = fn(d).to_pandas()
        monkeypatch.setattr(join_mod, "attach_by_key", forced)
        got = fn(d).to_pandas()
        pd.testing.assert_frame_equal(
            got.sort_values(got.columns.tolist()).reset_index(drop=True),
            want.sort_values(want.columns.tolist()).reset_index(drop=True))
