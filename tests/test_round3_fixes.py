"""Round-3 items: Dataset-returning pair ops + pair sinks, checkpointed
minhash dedup with kill/resume, atomic sink markers, checkpoint
hash-family recompute, window partial saturation, and the vectorized
fingerprint/lang-id kernels (pinned against the former per-doc
reference implementations)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import raysketch.ops.dedup as dd
from raysketch.ops.text import _FP_BASE, LangId, fingerprint_batch


# ---------------------------------------------------------------------------
# pair ops return Datasets; pair results sink + read back
# ---------------------------------------------------------------------------

class TestPairDatasets:
    def test_minhash_pairs_dataset_sinks_and_reads_back(
        self, ray_session, sf_dir, tmp_path
    ):
        import ray.data as rd

        from raysketch.engine.sinks import read_back, write_dataset

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
        pairs = dd.minhash_dedup_pairs(docs, threshold=0.5, num_perm=64,
                                       bands=16)
        assert isinstance(pairs, rd.Dataset)
        direct = pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(
            drop=True)
        p = str(tmp_path / "pairs")
        write_dataset(pairs, p)
        back = read_back(p).to_pandas().sort_values(["id_a", "id_b"]).reset_index(
            drop=True)
        assert back.equals(direct)
        assert len(back) > 0

    def test_simhash_and_embedding_lsh_return_datasets(self, ray_session):
        import ray.data as rd

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["aaa bbb ccc", "zzz yyy xxx"])})
        assert isinstance(dd.simhash_neardup_pairs(rd.from_arrow(t)), rd.Dataset)
        rng = np.random.default_rng(3)
        v = rng.standard_normal((20, 8))
        e = pa.table({"vec_id": pa.array(range(20), pa.int64()),
                      "embedding": pa.array([x.tolist() for x in v],
                                            pa.list_(pa.float64()))})
        assert isinstance(dd.embedding_neardup_lsh(rd.from_arrow(e)), rd.Dataset)
        assert isinstance(dd.embedding_neardup(rd.from_arrow(e), threshold=0.2),
                          rd.Dataset)  # exact route wraps to a Dataset too


# ---------------------------------------------------------------------------
# checkpointed minhash dedup: kill/resume with identical final pairs
# ---------------------------------------------------------------------------

class TestMinhashCheckpointed:
    @pytest.fixture(scope="class")
    def shards(self, sf_dir, tmp_path_factory):
        """sf0.001 documents split into 3 shard files (the resume unit)."""
        root = tmp_path_factory.mktemp("shards")
        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
        paths = []
        n = t.num_rows
        for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3),
                                      (2 * n // 3, n)]):
            p = str(root / f"shard-{i}.parquet")
            pq.write_table(t.slice(lo, hi - lo), p)
            paths.append(p)
        return paths

    def test_uninterrupted_equals_oneshot(self, ray_session, shards, tmp_path):
        import ray.data as rd

        out = dd.minhash_dedup_pairs_checkpointed(
            shards, str(tmp_path), "job-full", threshold=0.5, num_perm=64,
            bands=16,
        ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        oneshot = dd.minhash_dedup_pairs(
            rd.read_parquet(shards, columns=["doc_id", "text"]),
            threshold=0.5, num_perm=64, bands=16,
        ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert out.equals(oneshot)
        assert len(out) > 0
        # lineage manifests cover every shard
        mdir = os.path.join(str(tmp_path), "job-full", "manifest")
        manifests = [json.load(open(os.path.join(mdir, f)))
                     for f in sorted(os.listdir(mdir))]
        assert {m["input_file"] for m in manifests} == set(shards)
        assert all(m["rows"] > 0 and "wall_sec" in m for m in manifests)

    def test_kill_after_bands_resumes_without_recompute(
        self, ray_session, shards, tmp_path
    ):
        root = str(tmp_path)
        with pytest.raises(RuntimeError, match="simulated kill"):
            dd.minhash_dedup_pairs_checkpointed(
                shards, root, "job-killed", threshold=0.5, num_perm=64,
                bands=16, _fail_after="bands",
            )
        bands_dir = os.path.join(root, "job-killed", "stage_bands")
        before = {f: os.stat(os.path.join(bands_dir, f)).st_mtime_ns
                  for f in os.listdir(bands_dir)}
        assert len(before) == 3  # all shards finished before the kill
        assert not os.path.exists(os.path.join(
            root, "job-killed", "stage_verified", "_SUCCESS"))
        resumed = dd.minhash_dedup_pairs_checkpointed(
            shards, root, "job-killed", threshold=0.5, num_perm=64, bands=16,
        ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        after = {f: os.stat(os.path.join(bands_dir, f)).st_mtime_ns
                 for f in os.listdir(bands_dir)}
        assert after == before  # finished shard work was SKIPPED, not redone
        fresh = dd.minhash_dedup_pairs_checkpointed(
            shards, root, "job-fresh", threshold=0.5, num_perm=64, bands=16,
        ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert resumed.equals(fresh)  # identical final pairs

    def test_resume_with_changed_shard_set_recomputes_stages(
        self, ray_session, shards, tmp_path
    ):
        """Global stages record the shard set; resuming after the input
        glob changed must invalidate them, not silently reuse pairs that
        miss (or ghost-include) docs."""
        root = str(tmp_path)
        dd.minhash_dedup_pairs_checkpointed(
            shards, root, "j-chg", threshold=0.5, num_perm=64, bands=16)
        sub = shards[:2]  # one shard removed before re-submit
        out = dd.minhash_dedup_pairs_checkpointed(
            sub, root, "j-chg", threshold=0.5, num_perm=64, bands=16
        ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        fresh = dd.minhash_dedup_pairs_checkpointed(
            sub, str(tmp_path / "f"), "j-f", threshold=0.5, num_perm=64,
            bands=16
        ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert out.equals(fresh)

    def test_kill_after_candidates_skips_both_stages(
        self, ray_session, shards, tmp_path
    ):
        root = str(tmp_path)
        with pytest.raises(RuntimeError, match="simulated kill"):
            dd.minhash_dedup_pairs_checkpointed(
                shards, root, "job-k2", threshold=0.5, num_perm=64,
                bands=16, _fail_after="candidates",
            )
        cdir = os.path.join(root, "job-k2", "stage_candidates")
        assert os.path.exists(os.path.join(cdir, "_SUCCESS"))
        stamp = os.stat(os.path.join(cdir, "_SUCCESS")).st_mtime_ns
        out = dd.minhash_dedup_pairs_checkpointed(
            shards, root, "job-k2", threshold=0.5, num_perm=64, bands=16,
        ).to_pandas()
        assert os.stat(os.path.join(cdir, "_SUCCESS")).st_mtime_ns == stamp
        assert len(out) > 0


# ---------------------------------------------------------------------------
# verify-route equivalence: direct / broadcast / partitioned-join gathers
# ---------------------------------------------------------------------------

class TestVerifyRouteEquivalence:
    def test_minhash_all_routes_identical(self, ray_session, sf_dir,
                                          monkeypatch):
        """The size-routed verify (direct, broadcast est/shingles, join
        fallbacks) must produce byte-identical pairs on every route."""
        import ray.data as rd

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

        def run():
            return dd.minhash_dedup_pairs(
                docs, threshold=0.5, num_perm=64, bands=16
            ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

        base = run()  # direct route (few candidates at sf0.001)
        assert len(base) > 0
        monkeypatch.setattr(dd, "_DIRECT_VERIFY_LIMIT", 0)
        monkeypatch.setattr(dd, "_SIG_BROADCAST_BYTES", 0)
        monkeypatch.setattr(dd, "_SHINGLE_BROADCAST_BYTES", 0)
        assert run().equals(base)  # full partitioned-join route
        monkeypatch.setattr(dd, "_SIG_BROADCAST_BYTES", 256 << 20)
        monkeypatch.setattr(dd, "_SHINGLE_BROADCAST_BYTES", 256 << 20)
        assert run().equals(base)  # est+verify broadcast route

    def test_embedding_lsh_routes_identical(self, ray_session, monkeypatch):
        import ray.data as rd

        rng = np.random.default_rng(11)
        base_v = rng.normal(size=(500, 16))
        base_v /= np.linalg.norm(base_v, axis=1, keepdims=True)
        planted = base_v[:10] + 0.02 * rng.normal(size=(10, 16))
        planted /= np.linalg.norm(planted, axis=1, keepdims=True)
        vecs = np.vstack([base_v, planted])
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float64()))}))

        def run():
            return dd.embedding_neardup_lsh(ds, threshold=0.9).to_pandas(
            ).sort_values(["id_a", "id_b"]).reset_index(drop=True)

        bcast = run()
        assert len(bcast) >= 8
        monkeypatch.setattr(dd, "_SHINGLE_BROADCAST_BYTES", 0)
        assert run().equals(bcast)


def test_stratified_hash_sample(ray_session, sf_dir):
    """Exactly-k rows per group, deterministic across runs, both keys."""
    import ray.data as rd

    from raysketch.ops.sample import stratified_hash_sample

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "lang"])
    counts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
    ).to_pandas()["lang"].value_counts()
    for key in ("hash64", "sha256"):
        a = stratified_hash_sample(ds, 10, "lang", "doc_id", key=key).to_pandas()
        b = stratified_hash_sample(ds, 10, "lang", "doc_id", key=key).to_pandas()
        assert a.sort_values("doc_id").reset_index(drop=True).equals(
            b.sort_values("doc_id").reset_index(drop=True))
        per = a["lang"].value_counts()
        for lang, n in counts.items():
            assert per.get(lang, 0) == min(10, n), (key, lang)


def test_neardup_clusters_routes_identical(ray_session):
    """Driver union-find and distributed min-label propagation must agree
    on chains, triangles, singleton-pair components, and merged clusters."""
    import ray.data as rd

    # components: {1..5 chain}, {10,11,12 triangle}, {20,21}, {30,31,32}
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12),
             (20, 21), (31, 30), (31, 32)]
    t = pa.table({"id_a": pa.array([a for a, _ in edges], pa.int64()),
                  "id_b": pa.array([b for _, b in edges], pa.int64())})
    ds = rd.from_arrow(t)
    drv = dd.neardup_clusters(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    dist = dd.neardup_clusters(ds, driver_limit=0).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert drv.equals(dist)
    want = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10,
            20: 20, 21: 20, 30: 30, 31: 30, 32: 30}
    assert dict(zip(drv["doc_id"], drv["cluster_id"])) == want


def test_neardup_filter_routes_identical(ray_session, sf_dir):
    """Broadcast anti-join and partitioned LEFT-ANTI join agree, and
    exactly the non-canonical cluster members are dropped."""
    import ray.data as rd

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pairs = dd.minhash_dedup_pairs(docs, threshold=0.5, num_perm=64,
                                   bands=16).materialize()
    clusters = dd.neardup_clusters(pairs).materialize()
    cdf = clusters.to_pandas()
    losers = set(cdf.loc[cdf["doc_id"] != cdf["cluster_id"], "doc_id"])
    a = dd.neardup_filter(docs, clusters).to_pandas()
    b = dd.neardup_filter(docs, clusters, broadcast_limit=0).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert set(a["doc_id"]).isdisjoint(losers)
    assert len(a) == docs.count() - len(losers)


def test_neardup_clusters_big_ids_route_identity(ray_session):
    """Ids above 2^53 must survive the distributed route intact: a
    nullable-int64 state column would round-trip through float64 in the
    pandas folds and round them (found in review, reproduced, fixed via
    the null-free (node, kind, val) encoding)."""
    import ray.data as rd

    base = 2 ** 60
    edges = [(base + 1, base + 2), (base + 2, base + 3), (7, base + 9)]
    t = pa.table({"id_a": pa.array([a for a, _ in edges], pa.int64()),
                  "id_b": pa.array([b for _, b in edges], pa.int64())})
    ds = rd.from_arrow(t)
    drv = dd.neardup_clusters(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    dist = dd.neardup_clusters(ds, driver_limit=0).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert drv.equals(dist)
    assert dict(zip(drv["doc_id"], drv["cluster_id"])) == {
        base + 1: base + 1, base + 2: base + 1, base + 3: base + 1,
        7: 7, base + 9: 7}


def test_stratified_sample_null_group_is_a_stratum(ray_session):
    """NULL group values form a real partition (SQL PARTITION BY
    semantics), not silently dropped rows."""
    import ray.data as rd

    from raysketch.ops.sample import stratified_hash_sample

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "lang": pa.array(["en", None, "en", None, None])})
    out = stratified_hash_sample(rd.from_arrow(t), 2, "lang", "doc_id")
    df = out.to_pandas()
    assert (df["lang"].isna()).sum() == 2  # k of the 3 null-lang rows kept
    assert (df["lang"] == "en").sum() == 2


def test_samplers_empty_input(ray_session):
    import ray.data as rd

    from raysketch.ops.sample import hash_sample, stratified_hash_sample

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "lang": pa.array([], pa.string())})
    ds = rd.from_arrow(t)
    for out in (hash_sample(ds, 5, "doc_id"),
                stratified_hash_sample(ds, 5, "lang", "doc_id")):
        assert out.num_rows == 0
        assert set(out.schema.names) == {"doc_id", "lang"}


def test_neardup_clusters_empty(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                 "id_b": pa.array([], pa.int64())}))
    out = dd.neardup_clusters(ds).to_pandas()
    assert len(out) == 0


def test_lookup_sorted_membership():
    """Broadcast gathers must flag missing ids, not index a neighbor."""
    ids = np.array([2, 5, 9], dtype=np.int64)
    pos, ok = dd._lookup_sorted(ids, np.array([2, 3, 9, 11], dtype=np.int64))
    assert ok.tolist() == [True, False, True, False]
    assert pos[ok].tolist() == [0, 2]


# ---------------------------------------------------------------------------
# sink atomicity
# ---------------------------------------------------------------------------

class TestSinkAtomicity:
    def test_read_back_refuses_unmarked_dir(self, ray_session, tmp_path):
        import ray.data as rd

        from raysketch.engine.sinks import read_back, write_dataset

        t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
        p = str(tmp_path / "out")
        write_dataset(rd.from_arrow(t), p)
        assert read_back(p).count() == 3
        os.remove(os.path.join(p, "_SUCCESS"))
        with pytest.raises(FileNotFoundError, match="_SUCCESS"):
            read_back(p)

    def test_read_partition_prunes_and_guards(self, ray_session, tmp_path):
        import ray.data as rd

        from raysketch.engine.sinks import read_partition, write_dataset

        t = pa.table({
            "g": pa.array(["a", "a", "b"], pa.string()),
            "x": pa.array([1, 2, 3], pa.int64()),
        })
        p = str(tmp_path / "byg")
        write_dataset(rd.from_arrow(t), p, partition_cols=["g"])
        got = read_partition(p, "g", "a").to_pandas()
        assert sorted(got["x"].tolist()) == [1, 2]
        # hive writers URL-encode values: 'a b' lands as 'g=a%20b' and
        # must still be reachable by its REAL value
        t2 = pa.table({
            "g": pa.array(["a b", "c=d"], pa.string()),
            "x": pa.array([7, 8], pa.int64()),
        })
        p2 = str(tmp_path / "byg2")
        write_dataset(rd.from_arrow(t2), p2, partition_cols=["g"])
        assert read_partition(p2, "g", "a b").to_pandas()["x"].tolist() == [7]
        assert read_partition(p2, "g", "c=d").to_pandas()["x"].tolist() == [8]
        with pytest.raises(FileNotFoundError, match="no such partition"):
            read_partition(p, "g", "zz")
        os.remove(os.path.join(p, "_SUCCESS"))
        with pytest.raises(FileNotFoundError, match="_SUCCESS"):
            read_partition(p, "g", "a")

    def test_overwrite_leaves_no_staging(self, ray_session, tmp_path):
        import ray.data as rd

        from raysketch.engine.sinks import read_back, write_dataset

        p = str(tmp_path / "out")
        for vals in ([1, 2], [7, 8, 9]):
            write_dataset(
                rd.from_arrow(pa.table({"a": pa.array(vals, pa.int64())})), p)
        assert read_back(p).count() == 3
        leftovers = [n for n in os.listdir(str(tmp_path))
                     if n.startswith(".staging-")]
        assert leftovers == []


# ---------------------------------------------------------------------------
# checkpoint hash-family drift degrades to recompute
# ---------------------------------------------------------------------------

def test_checkpoint_family_drift_recomputes(ray_session, sf_dir, tmp_path):
    import functools
    import glob

    from raysketch.engine.checkpoint import CheckpointStore, run_with_checkpoint
    from raysketch.engine.udaf import SketchSpec
    from raysketch.sketches import HyperLogLog

    store = CheckpointStore(str(tmp_path), "fam-job")
    shards = [os.path.join(sf_dir, "documents.parquet")]
    specs = [SketchSpec("d", "text", functools.partial(HyperLogLog, 14))]
    res1 = run_with_checkpoint(shards, specs, store)
    assert len(store.done_partitions()) == 1
    # simulate a hash-backend change between submit and resume
    mf = glob.glob(os.path.join(store.manifest_dir, "*.json"))[0]
    m = json.load(open(mf))
    m["hash_family"] = "polars-0.0.1|pandas-0.0.1"
    with open(mf, "w") as f:
        json.dump(m, f)
    assert store.done_partitions() == set()  # stale family => not done
    res2 = run_with_checkpoint(shards, specs, store)  # recomputes, no raise
    key = next(iter(res1))
    assert res1[key].estimate() == res2[key].estimate()
    assert len(store.done_partitions()) == 1  # manifest re-stamped current


# ---------------------------------------------------------------------------
# windowed-add partial sums saturate (never wrap) at the int64 bound
# ---------------------------------------------------------------------------

def test_time_series_window_partial_saturation(ray_session):
    import ray.data as rd

    from raysketch.ops.window import time_series_window

    big = 2 ** 62
    t = pa.table({
        "k": pa.array(["a"] * 6),
        "ts": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
        "v": pa.array([big, big, big, big, 5, 7], pa.int64()),
    })
    out = time_series_window(rd.from_arrow(t), "k", "ts", "v",
                             ns_per_row=100, rows=2).to_pandas()
    vals = out["values"].iloc[0]
    assert vals[-1] == 2 ** 63 - 1  # 4*2^62 + 12 saturates at INT64_MAX


def test_time_series_window_routes_identical(ray_session, sf_dir):
    """Single-shuffle and 3-stage plans must agree in both modes."""
    import ray.data as rd

    from raysketch.ops.window import time_series_window

    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                       columns=["event_type", "ts", "value"])
    t = pa.table({
        "k": ev["event_type"],
        "ts": pa.array(ev["ts"].cast(pa.int64()).to_numpy(), pa.int64()),
        "v": pa.array((ev["value"].to_numpy() * 100).astype(np.int64),
                      pa.int64()),
    })
    ds = rd.from_arrow(t)
    for mode in ("add", "set"):
        one = time_series_window(ds, "k", "ts", "v", ns_per_row=3_600_000_000,
                                 rows=24, mode=mode).to_pandas()
        three = time_series_window(ds, "k", "ts", "v", ns_per_row=3_600_000_000,
                                   rows=24, mode=mode,
                                   single_shuffle_limit=0).to_pandas()
        one = one.sort_values("k").reset_index(drop=True)
        three = three.sort_values("k").reset_index(drop=True)
        assert one["k"].tolist() == three["k"].tolist()
        assert one["current_time"].tolist() == three["current_time"].tolist()
        assert [list(v) for v in one["values"]] == [list(v) for v in three["values"]]


def test_sat64_boundary_values():
    from raysketch.ops.window import _sat64

    imax, imin = 2 ** 63 - 1, -(2 ** 63)
    got = _sat64(np.array([0.0, 1e19, -1e19, float(imax), float(imin), 42.5]))
    assert got.tolist() == [0, imax, imin, imax, imin, 42]


# ---------------------------------------------------------------------------
# vectorized fingerprint == the former per-doc reference implementation
# ---------------------------------------------------------------------------

def _fingerprint_reference(texts, window=16, keep=8):
    """The pre-vectorization per-doc implementation, kept as the golden
    pin for the padded-blob rewrite."""
    fps, mins = [], []
    for t in texts:
        data = (t or "").encode("utf-8")
        if len(data) < window:
            h = np.uint64(0)
            with np.errstate(over="ignore"):
                for b in data:
                    h = h * _FP_BASE + np.uint64(b)
            fps.append([int(h)])
            mins.append(int(h))
            continue
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            pows = _FP_BASE ** np.arange(window - 1, -1, -1, dtype=np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(arr, window)
            hashes = (win * pows).sum(axis=1)
        smallest = np.sort(np.unique(hashes))[:keep]
        fps.append([int(x) for x in smallest])
        mins.append(int(smallest[0]))
    return fps, mins


def test_fingerprint_vectorized_matches_reference(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    texts = t["text"].to_pylist() + [
        "", "x", "short", "exactly16bytes!!", "a" * 15, "a" * 16, "a" * 17,
        None, "répété çà et là",  # multi-byte utf-8 crosses the pad logic
    ]
    batch = pa.table({"text": pa.array(texts, pa.string())})
    out = fingerprint_batch(batch)
    ref_fps, ref_mins = _fingerprint_reference(texts)
    assert out["fingerprints"].to_pylist() == ref_fps
    assert out["fingerprint"].to_pylist() == ref_mins


def test_fingerprint_empty_batch():
    out = fingerprint_batch(pa.table({"text": pa.array([], pa.string())}))
    assert out.num_rows == 0
    assert out["fingerprints"].type == pa.list_(pa.uint64())


# ---------------------------------------------------------------------------
# vectorized LangId keeps the scan semantics (first-wins ties, zh, und)
# ---------------------------------------------------------------------------

def test_langid_vectorized_semantics():
    li = LangId()
    cases = {
        "": "und",
        "the and of to a in": "en",
        "der die das und ist": "de",
        "el la que y en un": "es",
        "le les des et une pour": "fr",
        "zzz qqq www": "und",            # words but zero stopword hits
        "12345 !!! ???": "und",          # no latin words at all
        "中文中文中文中文中文 x": "zh",     # CJK ratio over 5%
        "the der": "en",                 # tie -> first language in order
        "der the": "en",
        "und der die el": "de",          # de 3/4 beats es 1/4
    }
    batch = pa.table({"text": pa.array(list(cases), pa.string())})
    preds = li(batch)["lang_pred"].to_pylist()
    assert preds == list(cases.values())
    assert li.classify("the and of") == "en"  # single-doc path shares kernel
