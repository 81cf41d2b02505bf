"""Checkpoint/resume: killed-run semantics, skip-finished, identical results."""

import functools
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from raysketch.corpus import generate_corpus
from raysketch.engine.checkpoint import CheckpointStore, run_with_checkpoint
from raysketch.engine.udaf import SketchSpec
from raysketch.sketches import HyperLogLog, RunningStats


# derive must be an importable library function (Ray workers unpickle it
# by module path; test-module closures are not importable there)
from raysketch.corpus import derive_columns as _derive


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    paths = []
    for i in range(6):
        t = generate_corpus(800, seed=100 + i)
        p = str(d / f"shard-{i:03d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def _specs():
    return [
        SketchSpec("d_content", "content", functools.partial(HyperLogLog, p=14)),
        SketchSpec("len_stats", "content_length", RunningStats),
    ]


def test_full_run_then_resume_skips_everything(ray_session, shards, tmp_path):
    store = CheckpointStore(str(tmp_path), "job1")
    r1 = run_with_checkpoint(shards, _specs(), store, group_key="lang", derive=_derive)
    assert len(store.done_partitions()) == 6
    mtimes = {
        n: os.path.getmtime(os.path.join(store.partials_dir, n))
        for n in os.listdir(store.partials_dir)
    }
    r2 = run_with_checkpoint(shards, _specs(), store, group_key="lang", derive=_derive)
    # nothing recomputed: partial files untouched
    for n, t in mtimes.items():
        assert os.path.getmtime(os.path.join(store.partials_dir, n)) == t
    assert set(r1) == set(r2)
    for k in r1:
        assert r1[k].to_bytes() == r2[k].to_bytes()


def test_partial_run_resumes_and_matches_clean_run(ray_session, shards, tmp_path):
    # clean run for ground truth
    clean = CheckpointStore(str(tmp_path), "clean")
    want = run_with_checkpoint(shards, _specs(), clean, group_key="lang", derive=_derive)

    # simulated kill: only 2 shards finished
    killed = CheckpointStore(str(tmp_path), "killed")
    run_with_checkpoint(shards[:2], _specs(), killed, group_key="lang", derive=_derive)
    assert len(killed.done_partitions()) == 2

    got = run_with_checkpoint(shards, _specs(), killed, group_key="lang", derive=_derive)
    assert set(got) == set(want)
    for k in want:
        assert got[k].to_bytes() == want[k].to_bytes()


def test_corrupt_partition_is_recomputed(ray_session, shards, tmp_path):
    store = CheckpointStore(str(tmp_path), "corrupt")
    run_with_checkpoint(shards, _specs(), store, group_key="lang", derive=_derive)
    victim = sorted(os.listdir(store.partials_dir))[0]
    with open(os.path.join(store.partials_dir, victim), "wb") as f:
        f.write(b"not parquet")
    assert len(store.done_partitions()) == 5  # corrupt one dropped
    r = run_with_checkpoint(shards, _specs(), store, group_key="lang", derive=_derive)
    assert len(store.done_partitions()) == 6
    clean = CheckpointStore(str(tmp_path), "clean2")
    want = run_with_checkpoint(shards, _specs(), clean, group_key="lang", derive=_derive)
    for k in want:
        assert r[k].to_bytes() == want[k].to_bytes()


def test_metrics_summary(ray_session, shards, tmp_path):
    store = CheckpointStore(str(tmp_path), "metrics")
    run_with_checkpoint(shards, _specs(), store, group_key="lang", derive=_derive)
    m = store.metrics_summary()
    assert m["partitions"] == 6
    assert m["rows"] == 6 * 800
    assert m["wall_p99"] >= m["wall_p50"] >= 0
    for man in store.manifests():
        assert man["payload_sha256"]
        assert man["input_file"].endswith(".parquet")


def test_stratified_split_checkpointed_kill_resume(ray_session, tmp_path):
    """Killed split run resumes: finished stages skip, output is
    byte-identical to a clean run, proportions stay exact."""
    import glob

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raysketch.ops.sample import (read_split,
                                      stratified_split_checkpointed)

    rng = np.random.default_rng(4)
    srcs = []
    for j in range(4):
        t = pa.table({
            "src": pa.array(rng.choice(["a", "b"], 250), pa.string()),
            "doc_id": pa.array(np.arange(250, dtype=np.int64) + j * 250)})
        p = str(tmp_path / f"in-{j}.parquet")
        pq.write_table(t, p)
        srcs.append(p)

    clean_root = str(tmp_path / "clean")
    stats = stratified_split_checkpointed(srcs, clean_root, "src",
                                          "doc_id")
    assert stats["chunks_written"] == 4 and stats["counts_written"] == 4

    crash_root = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected"):
        stratified_split_checkpointed(srcs, crash_root, "src", "doc_id",
                                      _fail_after=1)
    resumed = stratified_split_checkpointed(srcs, crash_root, "src",
                                            "doc_id")
    assert resumed["counts_skipped_resume"] == 4  # stage A finished
    assert resumed["chunks_skipped_resume"] == 2  # chunks 0,1 published
    assert resumed["chunks_written"] == 2

    def collect(root):
        frames = [read_split(root, s).to_pandas().assign(split=s)
                  for s in ("train", "val", "test")]
        return pd.concat(frames, ignore_index=True) \
            .sort_values("doc_id").reset_index(drop=True)

    a, b = collect(clean_root), collect(crash_root)
    pd.testing.assert_frame_equal(a, b)  # byte-identical resume
    assert sorted(a["doc_id"]) == list(range(1000))  # partition
    for s, sub in a.groupby("src"):
        ns = len(sub)
        n_train = sum(1 for r in range(ns) if 5 * r < 4 * ns)
        assert (sub["split"] == "train").sum() == n_train
