"""Round-4 seventh-session wave 3: knn_label_noise, stratified_split,
versioned snapshot sink."""

import os

import numpy as np
import pandas as pd
import pytest

from raysketch.engine.sinks import (list_versions, read_version,
                                    write_version)
from raysketch.ops.sample import stratified_split
from raysketch.ops.similarity import knn_label_noise


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


# ---------------------------------------------------------------------------
# knn_label_noise
# ---------------------------------------------------------------------------

def _clustered(n=120, d=8, seed=1):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, d)) * 5
    labels = rng.integers(0, 3, n)
    X = centers[labels] + rng.normal(size=(n, d))
    # flip a few labels to plant noise
    flipped = rng.choice(n, 6, replace=False)
    labels[flipped] = (labels[flipped] + 1) % 3
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
        "label": labels.astype(np.int64)}), flipped


def _brute_noise(df: pd.DataFrame, k=5):
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    ids = df["vec_id"].to_numpy(np.int64)
    labels = df["label"].to_numpy(np.int64)
    nrm = np.sqrt((X * X).sum(axis=1))
    cos = (X @ X.T) / (nrm[:, None] * nrm[None, :])
    micro = (np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)) \
        .astype(np.int64)
    out = []
    for i in range(len(ids)):
        cand = [(int(-micro[i, j]), int(ids[j]), int(labels[j]))
                for j in range(len(ids)) if j != i]
        cand.sort()
        n_same = sum(1 for c in cand[:k] if c[2] == labels[i])
        out.append((int(ids[i]), int(labels[i]), n_same,
                    int(2 * n_same < k)))
    return pd.DataFrame(out, columns=["vec_id", "label", "n_same",
                                      "noisy"])


def test_knn_label_noise_matches_brute(ray_session):
    df, flipped = _clustered()
    got = knn_label_noise(_mk(df), k=5).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    want = _brute_noise(df)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))
    # planted flips are overwhelmingly detected in separated clusters
    assert got.loc[got.vec_id.isin(flipped), "noisy"].mean() > 0.8


def test_knn_label_noise_guards(ray_session):
    df, _ = _clustered(n=20)
    big = df.copy()
    big["vec_id"] = big["vec_id"] + (1 << 40)
    with pytest.raises(ValueError, match="33 bits"):
        knn_label_noise(_mk(big), k=5)
    with pytest.raises(ValueError, match="more rows"):
        knn_label_noise(_mk(df.head(3), 1), k=5)


# ---------------------------------------------------------------------------
# stratified_split
# ---------------------------------------------------------------------------

def test_stratified_split_exact_proportions(ray_session):
    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "src": rng.choice(["a", "b", "c"], n, p=[0.7, 0.2, 0.1]),
        "id": np.arange(n, dtype=np.int64)})
    got = stratified_split(_mk(df, 6), "src", "id").to_pandas()
    # partition: every row exactly once
    assert sorted(got["id"]) == list(range(n))
    for s, sub in got.groupby("src"):
        ns = len(sub)
        counts = sub["split"].value_counts()
        # integer thresholds: train = #{r : 5r < 4n}, val adds 10r < 9n
        n_train = sum(1 for r in range(ns) if 5 * r < 4 * ns)
        n_val = sum(1 for r in range(ns)
                    if not 5 * r < 4 * ns and 10 * r < 9 * ns)
        assert counts.get("train", 0) == n_train
        assert counts.get("val", 0) == n_val
        assert counts.get("test", 0) == ns - n_train - n_val


def test_stratified_split_block_invariant_and_deterministic(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "src": rng.choice(["x", "y"], 400),
        "id": rng.permutation(400).astype(np.int64)})
    a = stratified_split(_mk(df, 1), "src", "id").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    b = stratified_split(_mk(df.sample(frac=1, random_state=0), 7),
                         "src", "id").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# versioned snapshot sink
# ---------------------------------------------------------------------------

def test_versioned_sink_roundtrip(ray_session, tmp_path):
    root = str(tmp_path / "snap")
    d1 = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    d2 = pd.DataFrame({"k": np.arange(4, dtype=np.int64) + 100})
    assert write_version(_mk(d1, 2), root) == 1
    assert write_version(_mk(d2, 2), root) == 2
    assert list_versions(root) == [1, 2]
    assert sorted(read_version(root, 1).to_pandas()["k"]) == list(range(10))
    # default resolves to the latest snapshot
    assert sorted(read_version(root).to_pandas()["k"]) == [100, 101,
                                                           102, 103]
    with pytest.raises(FileNotFoundError, match="not committed"):
        read_version(root, 7)
    # an uncommitted stage dir is invisible to readers
    os.makedirs(os.path.join(root, "_stage-dead"))
    os.makedirs(os.path.join(root, "v=9"))  # no _SUCCESS
    assert list_versions(root) == [1, 2]
    with pytest.raises(FileNotFoundError):
        read_version(str(tmp_path / "nothing"))


def test_versioned_sink_cas_retry(ray_session, tmp_path):
    # a competing writer committed v=1 between our stage write and
    # rename: the rename fails atomically and we land on v=2
    root = str(tmp_path / "race")
    d = pd.DataFrame({"k": np.arange(5, dtype=np.int64)})
    assert write_version(_mk(d, 1), root) == 1
    # simulate the loser's view: a fresh write must skip the taken slot
    assert write_version(_mk(d, 1), root) == 2
    os.makedirs(os.path.join(root, "v=3"))
    with open(os.path.join(root, "v=3", "_SUCCESS"), "w"):
        pass
    assert write_version(_mk(d, 1), root) == 4
    assert list_versions(root) == [1, 2, 3, 4]
