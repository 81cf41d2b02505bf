"""Round-5 ADVICE regression pins: sinks crash windows, countsketch
guards/sign independence, local_clustering memory contract."""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(df, blocks=1):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(blocks)


# ---------------------------------------------------------------------------
# write_version: a writer that crashed BETWEEN os.rename and _SUCCESS must
# not wedge version allocation (pre-fix: busy-loop forever on the taken N)
# ---------------------------------------------------------------------------

def test_write_version_skips_uncommitted_leftover(ray_session, tmp_path):
    from raysketch.engine.sinks import (list_versions, read_version,
                                        write_version)

    root = str(tmp_path / "snap")
    d = pd.DataFrame({"k": np.arange(5, dtype=np.int64)})
    assert write_version(_mk(d), root) == 1
    # crashed writer: v=2 dir exists (rename done) but no _SUCCESS
    os.makedirs(os.path.join(root, "v=2"))
    with open(os.path.join(root, "v=2", "junk.parquet"), "wb") as f:
        f.write(b"half-written")
    assert write_version(_mk(d), root) == 3  # skips past, never retries v=2
    assert list_versions(root) == [1, 3]  # readers still never see v=2
    assert sorted(read_version(root).to_pandas()["k"]) == list(range(5))


# ---------------------------------------------------------------------------
# write_tables_atomic: a failed publish rename must leave the PREVIOUS
# snapshot readable (pre-fix: old root rmtree'd before rename, then the
# except handler deleted staging too -> both copies lost)
# ---------------------------------------------------------------------------

def test_write_tables_atomic_failed_publish_restores_old(ray_session,
                                                         tmp_path):
    import pyarrow.parquet as pq

    from raysketch.engine import sinks

    root = str(tmp_path / "tables")
    sinks.write_tables_atomic({"a": _mk(pd.DataFrame({"x": [1]}))}, root)
    real_rename = sinks.os.rename

    def bad_rename(src, dst):
        if dst == root and ".staging-" in os.path.basename(src):
            raise OSError("injected publish failure")
        return real_rename(src, dst)

    sinks.os.rename = bad_rename
    try:
        with pytest.raises(OSError, match="injected"):
            sinks.write_tables_atomic(
                {"a": _mk(pd.DataFrame({"x": [999]}))}, root)
    finally:
        sinks.os.rename = real_rename
    # previous snapshot restored, no staging/old litter
    assert pq.read_table(os.path.join(root, "a")).to_pandas()["x"].tolist() \
        == [1]
    litter = [n for n in os.listdir(str(tmp_path))
              if n.startswith((".staging-", ".old-"))]
    assert litter == []


def test_write_tables_atomic_republish_over_existing(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from raysketch.engine.sinks import write_tables_atomic

    root = str(tmp_path / "tables2")
    write_tables_atomic({"a": _mk(pd.DataFrame({"x": [1]}))}, root)
    write_tables_atomic({"a": _mk(pd.DataFrame({"x": [2]}))}, root)
    assert pq.read_table(os.path.join(root, "a")).to_pandas()["x"].tolist() \
        == [2]
    assert [n for n in os.listdir(str(tmp_path)) if n.startswith(".old-")] \
        == []


# ---------------------------------------------------------------------------
# CountSketch: sparse codec stores uint32 flat indices -> tables beyond
# 2^32 cells must be refused at construction, and the sign hash must be
# INDEPENDENT of the bucket hash (distinct remix families)
# ---------------------------------------------------------------------------

def test_countsketch_rejects_table_beyond_uint32_codec():
    from raysketch.sketches import CountSketch

    with pytest.raises(ValueError, match="2\\^32"):
        CountSketch(5, 1 << 30)
    CountSketch(3, 1 << 30)  # 3 * 2^30 < 2^32: fine


def test_countsketch_sign_independent_of_bucket():
    from raysketch.sketches.countsketch import _ROW_MULT, _SIGN_MULT, \
        CountSketch

    # distinct remix constants per row (independence precondition)
    assert not set(_ROW_MULT.tolist()) & set(_SIGN_MULT.tolist())
    # empirically: among hashes landing in the SAME bucket of row 0,
    # signs split ~50/50 (correlated derivation gave constant sign runs)
    cs = CountSketch(1, 1 << 4)
    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**64, 200_000, dtype=np.uint64)
    idx, sgn = cs._cells(h)
    for b in range(16):
        s = sgn[0][idx[0] == b]
        assert 0.45 < (s > 0).mean() < 0.55


# ---------------------------------------------------------------------------
# local_clustering: driver memory is O(n^2/8) packed — node-count budget
# must refuse graphs whose packed adjacency exceeds 2 GiB even when the
# EDGE count passes, and the direct packed build must equal brute force
# ---------------------------------------------------------------------------

def test_local_clustering_node_budget_guard(ray_session):
    import ray.data as rd

    from raysketch.ops.graph import local_clustering

    n = 200_000  # chain: only 200k edges but (n^2)/8 = 5 GB packed
    chain = pa.table({"u": pa.array(np.arange(n - 1, dtype=np.int64)),
                      "v": pa.array(np.arange(1, n, dtype=np.int64))})
    with pytest.raises(ValueError, match="driver budget"):
        local_clustering(rd.from_arrow(chain))


def test_local_clustering_packed_build_matches_bruteforce(ray_session):
    import ray.data as rd

    from raysketch.ops.graph import local_clustering

    rng = np.random.default_rng(3)
    m = rng.integers(0, 40, size=(300, 2))
    m = m[m[:, 0] != m[:, 1]]
    eds = rd.from_arrow(pa.table({"u": pa.array(m[:, 0]),
                                  "v": pa.array(m[:, 1])}))
    out = local_clustering(eds).to_pandas().set_index("node")
    # brute force on the deduped simple graph
    lo = np.minimum(m[:, 0], m[:, 1])
    hi = np.maximum(m[:, 0], m[:, 1])
    simple = set(zip(lo.tolist(), hi.tolist()))
    adj = {}
    for a, b in simple:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for node, nbrs in adj.items():
        tri = sum(len(adj[x] & nbrs) for x in nbrs) // 2
        assert out.loc[node, "deg"] == len(nbrs)
        assert out.loc[node, "n_tri"] == tri


# ---------------------------------------------------------------------------
# counting-pass stats ops: the histogram-partial fold is SIZE-ROUTED
# (_fold_hist_partials) — the forced coarse-shuffle route must produce
# bit-identical output to the driver-fold route on every op
# ---------------------------------------------------------------------------

def _mk_blocks(df, parallelism=6):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


def test_hist_fold_route_identity(ray_session, monkeypatch):
    import pyarrow.compute as pc  # noqa: F401

    from raysketch.ops import stats as st

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "d"], n),
        "v": rng.integers(0, 50, n).astype(np.float64),
        "w": rng.integers(0, 30, n).astype(np.int64),
        "win": rng.integers(0, 5, n).astype(np.int64),
        "miss": rng.random(n) < 0.1,
    })

    def run_all():
        return {
            "robust": st.robust_profile(_mk_blocks(df), "g", "v"),
            "windowed": st.windowed_quantiles(
                _mk_blocks(df.assign(v=df["v"] / 100.0)), "win", "v", 100),
            "trimmed": st.trimmed_mean(_mk_blocks(df), "g", "v"),
            "weighted": st.weighted_quantiles(
                _mk_blocks(df[["v", "w"]]), "v", "w", qs=(0.1, 0.5, 0.9)),
            "impute": st.grouped_median_impute(
                _mk_blocks(df.assign(v=df["v"].where(~df["miss"], 0.0))),
                "g", "v", "miss"),
        }

    assert st._HIST_DRIVER_LIMIT > 100_000  # default: driver route
    base = run_all()
    monkeypatch.setattr(st, "_HIST_DRIVER_LIMIT", 0)  # force the shuffle
    routed = run_all()
    for name in base:
        assert base[name].equals(routed[name]), name


# ---------------------------------------------------------------------------
# similarity screens: above the broadcast budget the ops now ROUTE through
# the IVF-bucketed screen instead of raising. With n_probe == n_cells the
# route is exact by construction -> bit-identical to the broadcast route.
# ---------------------------------------------------------------------------

def _vec_corpus(n=90, d=6, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, d)) * 8
    labels = rng.integers(0, 3, n)
    X = centers[labels] + rng.normal(size=(n, d))
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.tolist() for row in X],
        "label": labels.astype(np.int64)})


def test_similarity_screens_ivf_route_identity(ray_session):
    from raysketch.ops.similarity import (hard_negatives, knn_label_noise,
                                          mutual_best_match)

    df = _vec_corpus()
    mk = lambda: _mk(df, 5)
    # knn_label_noise
    base = knn_label_noise(mk(), k=5).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    ivf = knn_label_noise(mk(), k=5, broadcast_budget=1,
                          n_cells=8, n_probe=8).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(base.astype("int64"), ivf.astype("int64"))
    # mutual_best_match (driver table, ordered by a)
    base = mutual_best_match(mk()).to_pandas()
    ivf = mutual_best_match(mk(), broadcast_budget=1,
                            n_cells=8, n_probe=8).to_pandas()
    pd.testing.assert_frame_equal(base.reset_index(drop=True),
                                  ivf.reset_index(drop=True))
    assert len(base) > 0
    # hard_negatives
    cols = ["vec_id", "label", "neg_id", "neg_label", "cos"]
    base = hard_negatives(mk()).to_pandas()[cols] \
        .sort_values("vec_id").reset_index(drop=True)
    ivf = hard_negatives(mk(), broadcast_budget=1,
                         n_cells=8, n_probe=8).to_pandas()[cols] \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, ivf)


def test_similarity_ivf_route_partial_probe_recall(ray_session):
    # well-separated clusters: probing a strict subset of cells still
    # recovers nearly every broadcast answer (the documented trade-off)
    from raysketch.ops.similarity import knn_label_noise

    df = _vec_corpus(n=120, seed=9)
    base = knn_label_noise(_mk(df, 5), k=5).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    ivf = knn_label_noise(_mk(df, 5), k=5, broadcast_budget=1,
                          n_cells=8, n_probe=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(ivf) == len(base)
    agree = (base["noisy"].to_numpy() == ivf["noisy"].to_numpy()).mean()
    assert agree >= 0.95, agree


def test_local_clustering_popcount_route_identity(ray_session, monkeypatch):
    # the distributed popcount fold must equal the driver loop exactly
    import ray.data as rd

    from raysketch.ops import graph as gr

    rng = np.random.default_rng(13)
    m = rng.integers(0, 200, size=(3000, 2))
    m = m[m[:, 0] != m[:, 1]]
    eds = lambda: rd.from_arrow(pa.table({"u": pa.array(m[:, 0]),
                                          "v": pa.array(m[:, 1])}))
    base = gr.local_clustering(eds())
    monkeypatch.setattr(gr, "_POPCOUNT_DRIVER_WORK", 0)
    routed = gr.local_clustering(eds())
    assert base.equals(routed)


# ---------------------------------------------------------------------------
# round-5 self-review fixes
# ---------------------------------------------------------------------------

def test_mjpeg_fill_bytes_and_truncation():
    from raysketch.ops.jpeg import decode_jpeg, encode_jpeg
    from raysketch.ops.mjpeg import split_frames

    y, x = np.mgrid[0:16, 0:16]
    f = np.stack([x * 8 % 256, y * 8 % 256, (x + y) * 4 % 256],
                 axis=2).astype(np.uint8)
    enc = encode_jpeg(f, quality=92)
    # T.81 B.1.1.2 fill bytes: 0xFF padding before EOI must not derail
    # the marker walk (a naive length-read after 0xFF 0xFF skips junk)
    doctored = enc[:-2] + b"\xff\xff\xff" + enc[-2:]
    parts = split_frames(doctored + enc)
    assert len(parts) == 2
    assert np.array_equal(decode_jpeg(parts[1]), decode_jpeg(enc))
    # truncation in marker state raises the contractual ValueError,
    # never IndexError
    with pytest.raises(ValueError):
        split_frames(b"\xff\xd8\xff")


def test_adpcm_rejects_corrupt_headers_before_allocating():
    import struct

    from raysketch.ops.adpcm import decode_adpcm

    with pytest.raises(ValueError, match="zero samples"):
        decode_adpcm(b"ADP1" + struct.pack("<IIhB", 0, 8000, 5, 0))
    # a huge bogus n must be rejected against actual payload bytes
    with pytest.raises(ValueError, match="truncated"):
        decode_adpcm(b"ADP1" + struct.pack("<IIhB", 0xFFFFFFFF, 8000, 5, 0))


def test_media_stages_quarantine_corrupt_rows(ray_session):
    from raysketch.ops import multimodal as mm

    t = mm.synthesize_media_batch(list(range(4)), kind="audio")
    bad = t.set_column(t.schema.get_field_index("payload"), "payload",
                       pa.array([t["payload"][0].as_py(), b"garbage",
                                 t["payload"][2].as_py(), b"ADP1xx"],
                                pa.large_binary()))
    out = mm.DecodeAudio()(bad)  # must NOT raise (actor-stage rule)
    f = out["features"].to_pylist()
    assert f[0][1] > 0.2 and f[2][1] > 0.2
    assert f[1] == [0.0] * 12 and f[3] == [0.0] * 12
    tv = mm.synthesize_media_batch([1, 3], kind="video")  # MJPEG rows
    badv = tv.set_column(tv.schema.get_field_index("payload"), "payload",
                         pa.array([tv["payload"][0].as_py(), b"\x00bad"],
                                  pa.large_binary()))
    outv = mm.SampleVideoFrames()(badv)
    fv = outv["features"].to_pylist()
    assert fv[0][0] >= 1 and fv[1] == [0.0] * 4


def test_recover_tables_kill_window(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from raysketch.engine import sinks

    root = str(tmp_path / "t")
    sinks.write_tables_atomic({"a": _mk(pd.DataFrame({"x": [1]}))}, root)
    # simulate a SIGKILL between the two publish renames: root moved
    # aside, a COMMITTED staging left behind
    old = str(tmp_path / ".old-t-deadbeef")
    os.rename(root, old)
    staging = str(tmp_path / ".staging-t-cafebabe")
    os.makedirs(os.path.join(staging, "a"))
    import pandas as _pd
    pq.write_table(pa.Table.from_pandas(_pd.DataFrame({"x": [2]}),
                                        preserve_index=False),
                   os.path.join(staging, "a", "d.parquet"))
    with open(os.path.join(staging, "a", "_SUCCESS"), "w"):
        pass
    with open(os.path.join(staging, "_SUCCESS"), "w") as fh:
        fh.write("a\n")
    # fresh leftovers are protected (could be a LIVE publisher's window)
    assert sinks.recover_tables(root) is None
    picked = sinks.recover_tables(root, min_age_s=0)  # explicit recovery
    assert picked == staging  # committed staging promoted (newer data)
    assert pq.read_table(os.path.join(root, "a")).to_pandas()["x"] \
        .tolist() == [2]
    # rollback path: only an .old dir remains
    root2 = str(tmp_path / "t2")
    sinks.write_tables_atomic({"a": _mk(pd.DataFrame({"x": [7]}))}, root2)
    os.rename(root2, str(tmp_path / ".old-t2-feedface"))
    assert sinks.recover_tables(root2, min_age_s=0) \
        .endswith(".old-t2-feedface")
    assert pq.read_table(os.path.join(root2, "a")).to_pandas()["x"] \
        .tolist() == [7]
    # next write_tables_atomic self-heals AGED leftovers before
    # publishing (fresh ones could be a live publisher's window)
    aside = str(tmp_path / ".old-t2-00000000")
    os.rename(root2, aside)
    os.utime(aside, (0, 0))  # backdate: crashed long ago
    sinks.write_tables_atomic({"a": _mk(pd.DataFrame({"x": [9]}))}, root2)
    assert pq.read_table(os.path.join(root2, "a")).to_pandas()["x"] \
        .tolist() == [9]


def test_ivf_screen_tiny_corpus_clamps_probes(ray_session):
    # corpus smaller than n_cells/n_probe: centroid count clamps the
    # probe fan-out instead of IndexError inside a map task
    from raysketch.ops.similarity import mutual_best_match

    df = pd.DataFrame({
        "vec_id": np.arange(3, dtype=np.int64),
        "embedding": [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]})
    out = mutual_best_match(_mk(df, 2), broadcast_budget=1,
                            n_cells=16, n_probe=8).to_pandas()
    base = mutual_best_match(_mk(df, 2)).to_pandas()
    # full-probe tiny corpus: IVF degenerates to exact
    pd.testing.assert_frame_equal(out, base)


def test_decode_image_quarantines_corrupt_subformat_masquerade():
    # a bit-flipped baseline JPEG can read as progressive/16-bit-DQT
    # (NotImplementedError from the codec) — must quarantine, while the
    # real=True unsupported-MIME stub stays loud
    import pyarrow as pa_

    from raysketch.ops import multimodal as mm

    t = mm.synthesize_media_batch(list(range(2)), kind="jpeg")
    p = bytearray(t["payload"][0].as_py())
    for j in range(8, min(len(p), 200), 7):
        p[j] ^= 0xFF
    t = t.set_column(t.schema.get_field_index("payload"), "payload",
                     pa_.array([bytes(p), t["payload"][1].as_py()],
                               pa_.large_binary()))
    out = mm.DecodeImage(real=True)(t)  # corrupt row -> fake pixels
    assert out.num_rows == 2
    fake = mm.synthesize_media_batch([1], kind="mystery")
    with pytest.raises(NotImplementedError):
        mm.DecodeImage(real=True)(fake)


def test_mutual_resolve_route_identity(ray_session, monkeypatch):
    # the distributed hash(min(src,dst)) bucket fold must equal the
    # driver searchsorted exactly, on both entry routes
    from raysketch.ops import similarity as sim

    df = _vec_corpus(n=80, seed=21)[["vec_id", "embedding"]]
    base = sim.mutual_best_match(_mk(df, 4)).to_pandas()
    monkeypatch.setattr(sim, "_MUTUAL_DRIVER_LIMIT", 0)
    routed = sim.mutual_best_match(_mk(df, 4)).to_pandas()
    pd.testing.assert_frame_equal(base.reset_index(drop=True),
                                  routed.reset_index(drop=True))
    assert len(base) > 0
    # and through the IVF entry route (full probes -> exact)
    ivf = sim.mutual_best_match(_mk(df, 4), broadcast_budget=1,
                                n_cells=8, n_probe=8).to_pandas()
    pd.testing.assert_frame_equal(base.reset_index(drop=True),
                                  ivf.reset_index(drop=True))
