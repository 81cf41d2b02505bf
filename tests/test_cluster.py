"""ops/cluster.py — distributed k-means: seed determinism and block
invariance, assignment tiebreak, Lloyd recovery of planted blobs, and
block-structure-fixed determinism of the fit."""

# (sha256 seed rule replaced by the vectorized seed_key32 in round 4)

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.cluster import kmeans_assign, kmeans_fit, kmeans_seeds


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


def _blobs(n_per: int = 120, k: int = 3, d: int = 16, seed: int = 9):
    """Well-separated unit-vector blobs (orthogonal-ish centers)."""
    rng = np.random.default_rng(seed)
    centers = np.eye(k, d) * 5.0
    X = np.concatenate(
        [centers[j] + 0.15 * rng.standard_normal((n_per, d)) for j in range(k)]
    )
    labels = np.repeat(np.arange(k), n_per)
    df = pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": [row.tolist() for row in X],
    })
    return df, labels


def test_seed_key32_matches_duckdb_integer_replay():
    # the numpy mix and the oracle's BIGINT/HUGEINT SQL must agree
    # bit-for-bit, including ids above 2^32
    import duckdb

    from raysketch.ops.cluster import seed_key32

    ids = np.concatenate([
        np.arange(10_000, dtype=np.int64),
        np.array([2**52 + 7, 2**40 + 1, 123456789012345], dtype=np.int64)])
    got = seed_key32(ids)
    tbl = pd.DataFrame({"i": ids})
    want = duckdb.query("""
        SELECT CAST(xor(h2, h2 // 65536) AS BIGINT) AS skey FROM (
          SELECT (xor(h1, h1 // 65536) * 73244475) % 4294967296 AS h2 FROM (
            SELECT (CAST(i AS HUGEINT) * 2654435761) % 4294967296 AS h1
            FROM tbl) a) b
    """).df()["skey"].to_numpy()
    assert (got == want).all()


@pytest.mark.usefixtures("ray_session")
def test_seeds_match_key_rule_and_block_invariance():
    from raysketch.ops.cluster import seed_key32

    df, _ = _blobs()
    keys = seed_key32(df["vec_id"].to_numpy())
    expect = [int(i) for i in
              np.lexsort((df["vec_id"].to_numpy(), keys))[:5]]
    for par in (1, 4, 7):
        sid, svec = kmeans_seeds(_mk(df, par), 5)
        assert sorted(sid.tolist()) == sorted(expect)
        # vectors correspond to their ids
        for i, vid in enumerate(sid):
            assert np.allclose(svec[i], df.loc[vid, "embedding"])


@pytest.mark.usefixtures("ray_session")
def test_assign_argmax_and_tiebreak():
    # two identical centroids: every vector must pick the smaller id
    df = pd.DataFrame({
        "vec_id": np.arange(6, dtype=np.int64),
        "embedding": [list(np.eye(1, 8, 0)[0])] * 6,
    })
    cids = np.array([42, 7], dtype=np.int64)
    cvecs = np.stack([np.eye(1, 8, 0)[0]] * 2)
    out = kmeans_assign(_mk(df, 2), cids, cvecs).to_pandas()
    assert (out["cluster_id"] == 7).all()
    assert np.allclose(out["cosine"], 1.0)


@pytest.mark.usefixtures("ray_session")
def test_fit_recovers_planted_blobs():
    df, labels = _blobs()
    ds = _mk(df, 4).materialize()
    sid, svec = kmeans_seeds(ds, 3)
    cid, C, iters = kmeans_fit(ds, sid, svec, iters=15)
    assert iters < 15  # converged
    out = kmeans_assign(ds, cid, C).to_pandas().sort_values("vec_id")
    # each planted blob maps to exactly one learned cluster
    tbl = pd.crosstab(labels, out["cluster_id"].to_numpy())
    assert (tbl.to_numpy() > 0).sum() == 3
    assert sorted(tbl.max(axis=1).tolist()) == [120, 120, 120]


@pytest.mark.usefixtures("ray_session")
def test_fit_reduce_route_identity():
    """Driver fold vs dataset groupby fold: bit-identical centroids."""
    df, _ = _blobs(n_per=60)
    ds = _mk(df, 4).materialize()
    sid, svec = kmeans_seeds(ds, 3)
    r_driver = kmeans_fit(ds, sid, svec, iters=6)
    r_dataset = kmeans_fit(ds, sid, svec, iters=6, driver_reduce_limit=0)
    assert np.array_equal(r_driver[1], r_dataset[1])
    assert r_driver[2] == r_dataset[2]


@pytest.mark.usefixtures("ray_session")
def test_fit_deterministic_for_fixed_blocks():
    df, _ = _blobs(n_per=60)
    ds = _mk(df, 3).materialize()
    sid, svec = kmeans_seeds(ds, 3)
    r1 = kmeans_fit(ds, sid, svec, iters=6)
    r2 = kmeans_fit(ds, sid, svec, iters=6)
    assert (r1[0] == r2[0]).all()
    assert np.array_equal(r1[1], r2[1])  # bit-identical centroids
    assert r1[2] == r2[2]


@pytest.mark.usefixtures("ray_session")
def test_feature_hashing_hand_values_and_block_invariance():
    import hashlib

    import ray.data as rd

    from raysketch.ops.cluster import feature_hashing

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "lang": ["en", "de", "en", "fr", "de", "en"],
    })
    feats = {"lang": lambda b: np.asarray(b["lang"].to_pylist(),
                                          dtype=object)}

    def run(npart):
        return feature_hashing(
            rd.from_pandas(df).repartition(npart), feats, n_dims=8) \
            .to_pandas().sort_values(["doc_id", "dim"]) \
            .reset_index(drop=True)

    got = run(3)
    pd.testing.assert_frame_equal(got, run(1))  # block invariance

    # hand-replay the projection for every row
    for _, r in got.merge(df, on="doc_id").iterrows():
        h = int(hashlib.sha256(f"lang={r['lang']}".encode())
                .hexdigest()[:16], 16)
        assert r["dim"] == h % 8
        assert r["weight"] == 1 - 2 * ((h // 8) % 2)
    assert len(got) == 6  # one feature -> one row per doc
    with pytest.raises(ValueError):
        feature_hashing(rd.from_pandas(df), feats, n_dims=0)
