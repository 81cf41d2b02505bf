"""Curation ops (ops/curate.py): brute-force parity on synthetic docs,
block invariance, parameter validation. (Corpus-scale DuckDB oracles are
gated in test_oracle_parity.py via doc_chunks / decontamination /
token_budget_mix.)"""

import numpy as np
import pandas as pd
import pytest


def _ds(texts, langs=None, npart=3):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    if langs is not None:
        df["lang"] = langs
    return rd.from_pandas(df).repartition(npart)


@pytest.mark.usefixtures("ray_session")
def test_chunking_rule_and_coverage():
    from raysketch.ops.curate import chunk_documents

    texts = ["a b c d e f g h i j",  # 10 toks, size 4 / overlap 1 -> stride 3
             "x y",                   # short: one chunk
             ""]                      # empty: no chunks
    got = chunk_documents(_ds(texts), chunk_size=4, overlap=1) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)
    d0 = got[got.doc_id == 0]
    assert d0["chunk_text"].tolist() == [
        "a b c d", "d e f g", "g h i j", "j"]
    assert d0["n_tokens"].tolist() == [4, 4, 4, 1]
    assert got[got.doc_id == 1]["chunk_text"].tolist() == ["x y"]
    assert (got.doc_id == 2).sum() == 0
    # every token covered: concat of stride-prefixes == original
    rebuilt = " ".join(t if i == len(d0) - 1 else " ".join(t.split()[:3])
                       for i, t in enumerate(d0["chunk_text"]))
    assert rebuilt == texts[0]
    with pytest.raises(ValueError):
        chunk_documents(_ds(texts), chunk_size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(_ds(texts), chunk_size=0)


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_counts_distinct_shared_shingles():
    from raysketch.ops.curate import decontaminate

    ev = _ds(["one two three four five six"])          # shingles: 2
    tr_texts = [
        "one two three four five six seven",  # shares both eval shingles
        "zzz one two three four five zzz",    # shares one
        "totally different words here now ok",  # none
        # repeats the same eval shingle twice -> DISTINCT count is 1
        "one two three four five one two three four five",
    ]
    tr = _ds(tr_texts)
    got = decontaminate(tr, ev, n=5).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got["doc_id"].tolist() == [0, 1, 3]
    assert got["n_shared_shingles"].tolist() == [2, 1, 1]
    # min_hits threshold
    got2 = decontaminate(tr, ev, n=5, min_hits=2).to_pandas()
    assert got2["doc_id"].tolist() == [0]


@pytest.mark.usefixtures("ray_session")
def test_token_budget_mix_respects_budget_and_order():
    from raysketch.ops.cluster import seed_key32
    from raysketch.ops.curate import token_budget_mix

    rng = np.random.default_rng(5)
    texts = [" ".join(["w"] * int(n)) for n in rng.integers(5, 40, 60)]
    langs = [("en", "de")[i % 2] for i in range(60)]
    got = token_budget_mix(_ds(texts, langs, npart=4), budget=150) \
        .to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)

    # brute force: same order, same cumsum rule
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "lang": langs,
                       "n_tokens": [len(t.split()) for t in texts]})
    df["skey"] = seed_key32(df["doc_id"].to_numpy())
    keep = []
    for lang, g in df.groupby("lang"):
        g = g.sort_values(["skey", "doc_id"])
        run = g["n_tokens"].cumsum()
        k = g[run <= 150].copy()
        k["running"] = run[run <= 150]
        keep.append(k[["lang", "doc_id", "n_tokens", "running"]])
    want = pd.concat(keep).sort_values(["lang", "doc_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["lang", "doc_id", "n_tokens", "running"]].astype(
            {"running": "int64"}),
        want.astype({"running": "int64"}), check_dtype=False)
    # budget respected per group
    assert (got.groupby("lang")["n_tokens"].sum() <= 150).all()


@pytest.mark.usefixtures("ray_session")
def test_training_shards_deterministic_and_complete(tmp_path):
    import os

    import ray.data as rd

    from raysketch.engine.sinks import read_back
    from raysketch.ops.cluster import seed_key32
    from raysketch.ops.curate import write_training_shards

    texts = [" ".join(["t"] * (3 + i % 5)) for i in range(200)]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts})
    root = str(tmp_path / "shards")
    write_training_shards(rd.from_pandas(df).repartition(4), root,
                          n_shards=4)
    assert os.path.exists(os.path.join(root, "_SUCCESS"))
    back = read_back(root).to_pandas()
    back["shard"] = back["shard"].astype("int64")
    # complete: every doc exactly once
    assert sorted(back["doc_id"].tolist()) == list(range(200))
    # assignment rule replayed
    want = seed_key32(df["doc_id"].to_numpy()) % 4
    got = back.sort_values("doc_id")["shard"].to_numpy()
    assert (got == want).all()
    # token counts carried
    assert back.sort_values("doc_id")["n_tokens"].tolist() == \
        [3 + i % 5 for i in range(200)]
    # every shard non-empty on 200 docs (hash spreads)
    assert back["shard"].nunique() == 4
    with pytest.raises(ValueError):
        write_training_shards(rd.from_pandas(df), root + "2", n_shards=0)


@pytest.mark.usefixtures("ray_session")
def test_checkpointed_shards_kill_resume(tmp_path):
    import os
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raysketch.ops.curate import (read_training_shard,
                                      write_training_shards_checkpointed)

    # 5 input chunks of 40 docs each
    srcs = []
    for j in range(5):
        ids = np.arange(j * 40, (j + 1) * 40, dtype=np.int64)
        t = pa.table({"doc_id": pa.array(ids),
                      "text": pa.array([f"d{i} tok tok" for i in ids])})
        p = str(tmp_path / f"src-{j}.parquet")
        pq.write_table(t, p)
        srcs.append(p)

    # uninterrupted reference run
    ref_root = str(tmp_path / "ref")
    stats = write_training_shards_checkpointed(srcs, ref_root, n_shards=4)
    assert stats == {"chunks_total": 5, "chunks_skipped_resume": 0,
                     "chunks_written": 5}

    # killed after chunk 1 publishes -> resume skips 2, writes 3
    root = str(tmp_path / "resumable")
    with pytest.raises(RuntimeError, match="injected failure"):
        write_training_shards_checkpointed(srcs, root, n_shards=4,
                                           _fail_after=1)
    stats2 = write_training_shards_checkpointed(srcs, root, n_shards=4)
    assert stats2["chunks_skipped_resume"] == 2
    assert stats2["chunks_written"] == 3

    # byte-identical shards vs the uninterrupted run, read across chunks
    for i in range(4):
        a = read_training_shard(ref_root, i).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = read_training_shard(root, i).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
    # all 200 docs present exactly once across shards
    allb = pd.concat([read_training_shard(root, i).to_pandas()
                      for i in range(4)])
    assert sorted(allb["doc_id"].tolist()) == list(range(200))

    # CLI drive (own Ray session in a subprocess)
    out_root = str(tmp_path / "cli")
    r = subprocess.run(
        [sys.executable, "-m", "raysketch.run", "--pipeline", "shards",
         "--input", str(tmp_path / "src-*.parquet"), "--job-id", "t1",
         "--output", out_root, "--n-shards", "4", "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    import json as _json

    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    assert _json.loads(line)["chunks_written"] == 5
    c = read_training_shard(out_root, 2).to_pandas()
    want = read_training_shard(ref_root, 2).to_pandas()
    pd.testing.assert_frame_equal(
        c.sort_values("doc_id").reset_index(drop=True),
        want.sort_values("doc_id").reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_sequence_packing_brute_parity_and_block_invariance():
    from raysketch.ops.cluster import seed_key32
    from raysketch.ops.curate import pack_sequences

    rng = np.random.default_rng(11)
    texts = [" ".join(["w"] * int(n)) for n in rng.integers(0, 23, 80)]
    S = 10

    # brute force: concatenate in (skey, doc_id) order, split every S
    df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64),
                       "n": [len(t.split()) for t in texts]})
    df["skey"] = seed_key32(df["doc_id"].to_numpy())
    df = df.sort_values(["skey", "doc_id"])
    owners = np.repeat(df["doc_id"].to_numpy(), df["n"].to_numpy())
    seq = np.arange(owners.size) // S
    want = (pd.DataFrame({"seq_id": seq, "doc": owners})
            .groupby("seq_id")
            .agg(n_docs=("doc", "nunique"), n_tokens=("doc", "size"))
            .reset_index())

    for npart in (1, 4, 9):
        got = pack_sequences(_ds(texts, npart=npart), seq_tokens=S) \
            .to_pandas().sort_values("seq_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # structure: every sequence except the last is exactly S tokens
    assert (got.iloc[:-1]["n_tokens"] == S).all()
    assert got["n_tokens"].sum() == owners.size
    with pytest.raises(ValueError):
        pack_sequences(_ds(texts), seq_tokens=0)


@pytest.mark.usefixtures("ray_session")
def test_range_shards_disjoint_complete_roundtrip(tmp_path):
    import ray.data as rd

    from raysketch.engine.sinks import read_back
    from raysketch.ops.curate import write_range_shards

    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64),
        "n_chars": rng.integers(10, 500, 400).astype(np.int64)})
    root, bounds = write_range_shards(
        rd.from_pandas(df).repartition(5), str(tmp_path / "rng"),
        "n_chars", n_shards=4)
    assert len(bounds) == 3 and (np.diff(bounds) >= 0).all()
    back = read_back(root).to_pandas()
    back["shard"] = back["shard"].astype("int64")
    # complete: every row exactly once
    assert sorted(back["doc_id"]) == list(range(400))
    # routing matches searchsorted on the returned bounds
    exp = np.searchsorted(bounds, back["n_chars"].to_numpy(np.float64),
                          side="left")
    np.testing.assert_array_equal(back["shard"].to_numpy(), exp)
    # shards are disjoint contiguous ranges
    g = back.groupby("shard")["n_chars"].agg(["min", "max"]).sort_index()
    assert (g["max"].to_numpy()[:-1] <= g["min"].to_numpy()[1:]).all()
    # quantile bounds balance shard sizes (sparse-exact at this n)
    sizes = back.groupby("shard").size()
    assert sizes.min() >= 400 // 4 - 25
    with pytest.raises(ValueError):
        write_range_shards(rd.from_pandas(df), str(tmp_path / "r2"),
                           "n_chars", n_shards=0)
