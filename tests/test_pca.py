"""Distributed covariance / PCA: one-pass block partials vs numpy,
eigh component properties, and the projection stage."""

import numpy as np
import pyarrow as pa
import pytest

from raysketch.ops.similarity import covariance, pca, pca_project


def _ds(X):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in X],
                              pa.list_(pa.float32()))}))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(9)
    # anisotropic cloud: known dominant directions
    W = rng.normal(size=(6, 6)) * np.array([5, 3, 2, 1, 0.5, 0.1])
    X = (rng.normal(size=(4000, 6)) @ W).astype(np.float32)
    return X


def test_covariance_matches_numpy(ray_session, data):
    ds = _ds(data).repartition(7)  # force multi-block partials
    n, mean, cov = covariance(ds)
    X = data.astype(np.float64)
    assert n == len(X)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-10)
    assert np.allclose(cov, np.cov(X, rowvar=False, bias=True), atol=1e-9)
    with pytest.raises(ValueError):
        covariance(_ds(data[:0]))


def test_pca_components(ray_session, data):
    mean, comps, eigvals = pca(_ds(data), k=4)
    # orthonormal rows, descending eigenvalues
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-10)
    assert (np.diff(eigvals) <= 1e-12).all() and (eigvals > 0).all()
    # matches numpy PCA up to sign; sign canonicalization: the
    # largest-|entry| coordinate of every component is positive
    X = data.astype(np.float64)
    w, v = np.linalg.eigh(np.cov(X, rowvar=False, bias=True))
    top = v[:, np.argsort(w)[::-1][:4]].T
    for r, ref in zip(comps, top):
        assert np.allclose(r, ref, atol=1e-8) or np.allclose(r, -ref, atol=1e-8)
        assert r[np.abs(r).argmax()] > 0


def test_projection_variance_equals_eigvals(ray_session, data):
    ds = _ds(data)
    mean, comps, eigvals = pca(ds, k=3)
    out = pca_project(ds, mean, comps, out_prefix="pc").to_pandas()
    assert set(out.columns) == {"vec_id", "pc1", "pc2", "pc3"}
    P = out.sort_values("vec_id")[["pc1", "pc2", "pc3"]].to_numpy()
    # projections are centered and their population variance per
    # component IS the eigenvalue; cross-component covariance vanishes
    assert np.allclose(P.mean(axis=0), 0, atol=1e-9)
    C = np.cov(P, rowvar=False, bias=True)
    assert np.allclose(np.diag(C), eigvals, rtol=1e-8)
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 1e-8


def test_covariance_survives_empty_blocks(ray_session, data):
    # Ray 2.49 hands empty blocks to map_batches (e.g. a filter that
    # clears a block); the per-block partial must emit a schema-stable
    # empty partial instead of crashing on a 1-D empty array — round-3
    # advisor finding
    import ray.data as rd

    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(data), dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in data],
                              pa.list_(pa.float32()))})
    ds = rd.from_arrow([tbl.slice(0, 0), tbl, tbl.slice(0, 0)])
    n, mean, cov = covariance(ds)
    assert n == len(data)
    np.testing.assert_allclose(mean, data.astype(np.float64).mean(axis=0),
                               rtol=1e-10)
    np.testing.assert_allclose(
        cov, np.cov(data.astype(np.float64).T, bias=True), rtol=1e-8)


def test_ridge_probe_separable_clusters(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raysketch.ops.similarity import ridge_probe

    rng = np.random.default_rng(19)
    rows = []
    centers = np.eye(3) * 5.0
    for i in range(600):
        c = i % 3
        rows.append((centers[c] + rng.normal(0, 0.3, 3), c))
    df = pd.DataFrame({"embedding": [r[0].tolist() for r in rows],
                       "label": [r[1] for r in rows]})
    out = ridge_probe(rd.from_pandas(df).repartition(5)).to_pandas()
    diag = out[out["label"] == out["pred"]]["n"].sum()
    assert diag == 600  # perfectly separable -> perfect train confusion


def test_ridge_probe_matches_driver_solve(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raysketch.ops.similarity import ridge_probe

    rng = np.random.default_rng(20)
    X = rng.normal(0, 1, (400, 6))
    y = rng.integers(0, 4, 400)
    df = pd.DataFrame({"embedding": [x.tolist() for x in X],
                       "label": y})
    out = ridge_probe(rd.from_pandas(df).repartition(4),
                      lam=1e-3).to_pandas()
    # driver-side closed form with the same lambda
    k = 4
    Y = np.zeros((len(y), k))
    Y[np.arange(len(y)), y] = 1.0
    W = np.linalg.solve(X.T @ X + 1e-3 * len(y) * np.eye(6), X.T @ Y)
    pred = np.argmax(X @ W, axis=1)
    want = pd.DataFrame({"label": y, "pred": pred}) \
        .groupby(["label", "pred"]).size()
    assert out["n"].sum() == 400
    for _, row in out.iterrows():
        assert row["n"] == want.loc[(row["label"], row["pred"])]
