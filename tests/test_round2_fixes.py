"""Regression tests for the round-1 advisory findings (ADVICE.md r1):

- shingle hashing must be batch-position-independent, including empty and
  shorter-than-k docs anywhere in the batch;
- a fast_hash CMS must index scalar update/point_query with the same hash
  family as its batch path;
- hash_sample / hash_threshold_filter keys must stay row-aligned when the
  id column contains nulls;
- sha256_batch must accept Arrow binary arrays;
- sketch partials record the hash-backend family and refuse to merge
  across mismatched families.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raysketch.engine.hashing import HASH_FAMILY, sha256_batch
from raysketch.ops.dedup import _batch_shingle_hashes, batch_minhash_signatures
from raysketch.sketches.cms import CMSketch


def _doc_hash_sets(texts, k):
    h, offs = _batch_shingle_hashes(texts, k)
    return [frozenset(h[offs[i]:offs[i + 1]].tolist()) for i in range(len(texts))]


class TestShingleBatchIndependence:
    def test_empty_doc_positions_do_not_crash_or_vary(self):
        docs = ["hello world", "", "x", "ab", "another document here"]
        k = 5
        # every doc's hash set must be identical no matter how the batch
        # is split or ordered around it
        ref = {d: s for d, s in zip(docs, _doc_hash_sets(docs, k))}
        for batch in ([""], ["", "hello world"], ["hello world", ""],
                      ["", ""], ["x", "", "ab"], docs[::-1]):
            for d, s in zip(batch, _doc_hash_sets(batch, k)):
                if d in ref:
                    assert s == ref[d], f"doc {d!r} hashes vary with batch"

    def test_single_empty_doc(self):
        h, offs = _batch_shingle_hashes([""], 5)
        assert offs.tolist() == [0, 1]
        assert h.size == 1  # the all-zero sentinel window

    def test_short_doc_gets_len_windows(self):
        h, offs = _batch_shingle_hashes(["ab"], 5)
        assert offs.tolist() == [0, 2]

    def test_signatures_deterministic_across_batching(self):
        docs = ["the quick brown fox", "", "jumps over", "the quick brown fox!"]
        whole = batch_minhash_signatures(docs, 5, 16)
        parts = np.vstack([batch_minhash_signatures([d], 5, 16) for d in docs])
        np.testing.assert_array_equal(whole, parts)

    def test_empty_doc_signature_not_borrowing_neighbor(self):
        sig_alone = batch_minhash_signatures([""], 5, 8)
        sig_mixed = batch_minhash_signatures(["", "neighbor text"], 5, 8)
        np.testing.assert_array_equal(sig_alone[0], sig_mixed[0])


class TestCMSFastHashScalar:
    def test_scalar_update_then_point_query(self):
        cms = CMSketch(0.01, 0.01, fast_hash=True)
        cms.update("k", 5)
        assert cms.point_query("k") == 5

    def test_scalar_and_batch_updates_share_cells(self):
        a = CMSketch(0.01, 0.01, fast_hash=True)
        a.update_batch(pa.array(["k", "k", "k"]))
        b = CMSketch(0.01, 0.01, fast_hash=True)
        for _ in range(3):
            b.update("k")
        assert a.point_query("k") == b.point_query("k") == 3
        assert np.array_equal(np.flatnonzero(a.counts.ravel()),
                              np.flatnonzero(b.counts.ravel()))

    def test_scalar_negative_update_fast_hash(self):
        cms = CMSketch(0.01, 0.01, fast_hash=True)
        cms.update("k", 10)
        cms.update("k", -4)
        assert cms.point_query("k") == 6


class TestSampleNullAlignment:
    @pytest.fixture()
    def null_batch(self):
        return pa.table({
            "doc_id": pa.array([1, None, 3, None, 5], pa.int64()),
            "lang": pa.array(list("abcde"), pa.string()),
        })

    def test_keys_row_aligned(self, null_batch):
        from raysketch.ops.sample import _keys

        key = _keys(null_batch, "doc_id", 42)
        assert key.size == null_batch.num_rows
        assert key[1] == np.uint64(0xFFFFFFFFFFFFFFFF)
        assert key[3] == np.uint64(0xFFFFFFFFFFFFFFFF)

    def test_hash_sample_with_nulls(self, ray_session, null_batch):
        import ray.data as rd

        from raysketch.ops.sample import hash_sample

        out = hash_sample(rd.from_arrow(null_batch), 2, "doc_id")
        ids = out["doc_id"].to_pylist()
        assert len(ids) == 2
        assert None not in ids  # null ids sort last, never sampled

    def test_hash_threshold_filter_with_nulls(self, ray_session, null_batch):
        import ray.data as rd

        from raysketch.ops.sample import hash_threshold_filter

        out = hash_threshold_filter(rd.from_arrow(null_batch), 0.5, "doc_id")
        t = pa.concat_tables(out.iter_batches(batch_size=10, batch_format="pyarrow"))
        assert None not in t["doc_id"].to_pylist()
        # kept rows keep their own lang (alignment preserved)
        full = null_batch.to_pydict()
        expect = dict(zip(full["doc_id"], full["lang"]))
        for i, l in zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()):
            assert expect[i] == l


class TestSha256Binary:
    def test_binary_array(self):
        import hashlib

        arr = pa.array([b"abc", None, b"\x00\xff"], pa.binary())
        out = sha256_batch(arr)
        assert out[0] == hashlib.sha256(b"abc").hexdigest()
        assert out[1] is None
        assert out[2] == hashlib.sha256(b"\x00\xff").hexdigest()

    def test_string_array_unchanged(self):
        import hashlib

        out = sha256_batch(pa.array(["abc"], pa.string()))
        assert out[0] == hashlib.sha256(b"abc").hexdigest()


class TestListArrowHashConsistency:
    def test_list_and_arrow_inputs_hash_identically(self):
        from raysketch.engine.hashing import hash64_batch

        vals = ["alpha", "beta", "gamma"]
        np.testing.assert_array_equal(
            hash64_batch(vals), hash64_batch(pa.array(vals, pa.string()))
        )

    def test_bloom_probes_list_after_arrow_build(self):
        from raysketch.sketches import BloomFilter

        bl = BloomFilter(1000, 0.001)
        bl.update_batch(pa.array([f"src{i}" for i in range(20)]))
        hits = bl.contains_batch([f"src{i}" for i in range(8)])
        assert all(bool(h) for h in hits), "present keys must probe True"


class TestEmbeddingNeardupRouting:
    def test_dense_threshold_routes_exact(self, ray_session, sf_dir):
        """Below the sparse-output threshold the dispatcher uses the exact
        block-pair join — identical to exact_cosine_pairs by construction."""
        import ray.data as rd

        from raysketch.ops.dedup import embedding_neardup, exact_cosine_pairs

        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        exact = exact_cosine_pairs(ds, threshold=0.45)
        routed = embedding_neardup(ds, threshold=0.45).to_pandas()
        routed = routed.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert routed.values.tolist() == exact.values.tolist()

    def test_lsh_sparse_regime_planted_neardups(self, ray_session):
        """Planted near-duplicates (cos ≈ 0.98) in a random corpus: the
        LSH route must equal the exact join at threshold 0.9 — total
        recall for true near-dups, exact precision from the verify, and
        candidate volume tracking the true pair count."""
        import ray.data as rd

        from raysketch.ops.dedup import embedding_neardup_lsh, exact_cosine_pairs

        rng = np.random.default_rng(11)
        base = rng.normal(size=(2000, 32))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        planted = base[:30] + 0.03 * rng.normal(size=(30, 32))
        planted /= np.linalg.norm(planted, axis=1, keepdims=True)
        vecs = np.vstack([base, planted])
        t = pa.table({
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float64())),
        })
        ds = rd.from_arrow(t)
        exact = exact_cosine_pairs(ds, threshold=0.9)
        lsh = embedding_neardup_lsh(ds, threshold=0.9).to_pandas()
        e = set(map(tuple, exact[["id_a", "id_b"]].values.tolist()))
        l = set(map(tuple, lsh[["id_a", "id_b"]].values.tolist()))
        assert len(e) >= 25  # the plant worked
        assert l == e


class TestBroadcastLookupJoin:
    @pytest.fixture()
    def sides(self, ray_session):
        import ray.data as rd

        big = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, 9], pa.int64()),
                                      "x": pa.array(list("abcd"))}))
        small = rd.from_arrow(pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                                        "v": pa.array([10, 20, 30], pa.int64()),
                                        "w": pa.array(list("xyz"))}))
        return big, small

    def test_inner_drops_unmatched(self, sides):
        from raysketch.ops.join import broadcast_lookup_join

        big, small = sides
        out = broadcast_lookup_join(big, small, "k", "id", ["v", "w"]).to_pandas()
        out = out.sort_values("k").reset_index(drop=True)
        assert out["k"].tolist() == [1, 2, 3]
        assert out["v"].tolist() == [10, 20, 30]
        assert out["w"].tolist() == ["x", "y", "z"]

    def test_left_keeps_nulls(self, sides):
        from raysketch.ops.join import broadcast_lookup_join

        big, small = sides
        out = broadcast_lookup_join(big, small, "k", "id", ["v"],
                                    how="left").to_pandas()
        out = out.sort_values("k").reset_index(drop=True)
        assert out["k"].tolist() == [1, 2, 3, 9]
        assert pd.isna(out["v"].iloc[3])

    def test_empty_small_side(self, ray_session, sides):
        import ray.data as rd

        from raysketch.ops.join import broadcast_lookup_join

        big, small = sides
        empty = small.filter(lambda r: False)
        out = broadcast_lookup_join(big, empty, "k", "id", ["v"]).to_pandas()
        assert len(out) == 0


class TestPartitionedSink:
    def test_hive_partition_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        from raysketch.engine.sinks import read_back, write_dataset

        t = pa.table({"lang": pa.array(["en", "de", "en", "fr"]),
                      "v": pa.array([1, 2, 3, 4], pa.int64())})
        p = write_dataset(rd.from_arrow(t), str(tmp_path / "out"),
                          partition_cols=["lang"])
        import os

        assert sorted(os.listdir(p)) == ["_SUCCESS", "lang=de", "lang=en",
                                         "lang=fr"]
        back = read_back(p).to_pandas().sort_values("v").reset_index(drop=True)
        assert back["v"].tolist() == [1, 2, 3, 4]


class TestHashFamilyEnvelope:
    def test_partials_carry_family(self):
        import functools

        from raysketch.engine.udaf import SketchSpec, partials_for_block
        from raysketch.sketches import HyperLogLog

        t = pa.table({"k": pa.array(["a", "b", "a"]), "g": pa.array(["x"] * 3)})
        p = partials_for_block(
            t, [SketchSpec("h", "k", functools.partial(HyperLogLog, 12))], "g"
        )
        assert p["family"].to_pylist() == [HASH_FAMILY]

    def test_mismatched_family_merge_raises(self):
        from raysketch.engine.udaf import check_family

        with pytest.raises(ValueError, match="mismatched hash families"):
            check_family(["polars-1.0|pandas-2.0", "pandas-2.0"])
        assert check_family([HASH_FAMILY, HASH_FAMILY]) == HASH_FAMILY
