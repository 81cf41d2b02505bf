"""Round-4 seventh-session wave: chunk_dedup_coverage, decayed_counts,
local_clustering — brute-force parity on random frames, block
invariance, contract validation. (Oracle parity at sf0.01 is covered
by test_oracle_parity over the new ORACLE_SQL entries.)"""

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.curate import chunk_dedup_coverage
from raysketch.ops.graph import local_clustering
from raysketch.ops.scan import decayed_counts


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


# ---------------------------------------------------------------------------
# chunk_dedup_coverage
# ---------------------------------------------------------------------------

def _brute_coverage(docs: pd.DataFrame, chunk_size: int = 16):
    rows = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        toks = t.split()
        for s in range(0, len(toks), chunk_size):
            rows.append((did, " ".join(toks[s:s + chunk_size])))
    ch = pd.DataFrame(rows, columns=["doc_id", "chunk_text"])
    nd = ch.groupby("chunk_text")["doc_id"].nunique()
    ch["dup"] = (nd.reindex(ch["chunk_text"]).to_numpy() >= 2).astype(int)
    out = ch.groupby("doc_id", as_index=False).agg(
        n_chunks=("dup", "size"), n_dup_chunks=("dup", "sum"))
    frac = out["n_dup_chunks"] / out["n_chunks"]
    out["dup_frac"] = np.floor(frac * 1e6 + 0.5) / 1e6
    return out.sort_values("doc_id").reset_index(drop=True)


def test_chunk_dedup_coverage_matches_brute(ray_session):
    rng = np.random.default_rng(7)
    # small vocab + short docs so cross-doc duplicate chunks actually occur
    vocab = [f"w{i}" for i in range(6)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 40)))
             for _ in range(120)]
    # plant an exact duplicate span across two docs
    texts[3] = texts[50]
    docs = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                         "text": texts})
    got = (chunk_dedup_coverage(_mk(docs), chunk_size=16).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _brute_coverage(docs)
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_chunks", "n_dup_chunks", "dup_frac"]].astype(
            {"n_chunks": "int64", "n_dup_chunks": "int64"}),
        want.astype({"n_chunks": "int64", "n_dup_chunks": "int64"}))
    # the planted duplicate doc is flagged fully duplicated
    assert got.loc[got.doc_id == 3, "dup_frac"].iloc[0] == 1.0


def test_chunk_dedup_coverage_block_invariant(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [" ".join([f"t{j % 4}" for j in range(i + 1)])
                 for i in range(40)]})
    a = (chunk_dedup_coverage(_mk(docs, 1)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (chunk_dedup_coverage(_mk(docs, 7)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# decayed_counts
# ---------------------------------------------------------------------------

def test_decayed_counts_matches_brute(ray_session):
    rng = np.random.default_rng(13)
    n = 5000
    day = 86_400_000_000
    t0 = 1_700_000_000_000_000
    ts = t0 + rng.integers(0, 30 * day, n)
    keys = rng.choice(["a", "b", "c"], n)
    df = pd.DataFrame({
        "k": keys, "ts": pd.to_datetime(ts, unit="us")})
    got = decayed_counts(_mk(df), "k", "ts").to_pandas()
    end = ts.max()
    age = (end - ts) // day
    w = np.where(age <= 16, 1 << np.maximum(16 - age, 0), 0)
    brute = pd.DataFrame({"k": keys, "w": w}).groupby(
        "k", as_index=False).agg(n_events=("w", "size"), wsum=("w", "sum"))
    brute["decayed"] = np.floor(
        brute["wsum"] / 65536.0 * 1e6 + 0.5) / 1e6
    for _, r in brute.iterrows():
        g = got[got["k"] == r["k"]]
        assert int(g["n_events"].iloc[0]) == int(r["n_events"])
        assert float(g["decayed"].iloc[0]) == float(r["decayed"])


def test_decayed_counts_block_invariant(ray_session):
    day = 86_400_000_000
    ts = pd.to_datetime(
        1_600_000_000_000_000 + np.arange(300, dtype=np.int64) * day // 7,
        unit="us")
    df = pd.DataFrame({"k": [f"g{i % 5}" for i in range(300)], "ts": ts})
    a = decayed_counts(_mk(df, 1), "k", "ts").to_pandas()
    b = decayed_counts(_mk(df, 9), "k", "ts").to_pandas()
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# local_clustering
# ---------------------------------------------------------------------------

def _brute_cc(edges: pd.DataFrame) -> pd.DataFrame:
    und = set()
    for u, v in zip(edges["u"], edges["v"]):
        if u != v:
            und.add((min(u, v), max(u, v)))
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    rows = []
    for node in sorted(adj):
        nb = adj[node]
        deg = len(nb)
        tri = sum(len(adj[x] & nb) for x in nb) // 2
        cc = 2.0 * tri / (deg * (deg - 1)) if deg >= 2 else 0.0
        rows.append((node, deg, tri, np.floor(abs(cc) * 1e6 + 0.5) / 1e6))
    return pd.DataFrame(rows, columns=["node", "deg", "n_tri", "cc"])


def test_local_clustering_matches_brute(ray_session):
    rng = np.random.default_rng(5)
    m = 600
    edges = pd.DataFrame({
        "u": rng.integers(0, 40, m).astype(np.int64),
        "v": rng.integers(0, 40, m).astype(np.int64)})
    got = local_clustering(_mk(edges)).to_pandas()
    want = _brute_cc(edges)
    pd.testing.assert_frame_equal(
        got.astype({"node": "int64", "deg": "int64", "n_tri": "int64"}),
        want.astype({"node": "int64", "deg": "int64", "n_tri": "int64"}))


def test_local_clustering_triangle_golden(ray_session):
    # K3 plus a pendant: triangle nodes cc=1 except the one with the
    # pendant (deg 3, 1 triangle -> cc = 2/6); pendant cc=0
    edges = pd.DataFrame({"u": np.array([1, 2, 3, 1], np.int64),
                          "v": np.array([2, 3, 1, 9], np.int64)})
    got = local_clustering(_mk(edges, 2)).to_pandas().set_index("node")
    assert got.loc[1, "cc"] == pytest.approx(1.0 / 3.0, abs=1e-6)
    assert got.loc[2, "cc"] == 1.0 and got.loc[3, "cc"] == 1.0
    assert got.loc[9, "cc"] == 0.0 and int(got.loc[9, "deg"]) == 1
    assert int(got["n_tri"].sum()) == 3  # one triangle seen at 3 nodes


def test_local_clustering_route_identity(ray_session):
    # few distinct edges repeated across many blocks: pre-reduced
    # stream exceeds the limit (shuffle-dedup branch) while the
    # distinct set stays under it — both routes must agree bit-for-bit
    rng = np.random.default_rng(3)
    base = pd.DataFrame({"u": rng.integers(0, 12, 35).astype(np.int64),
                         "v": rng.integers(0, 12, 35).astype(np.int64)})
    rep = pd.concat([base] * 20, ignore_index=True)
    driver = local_clustering(_mk(rep, 8)).to_pandas()
    shuffled = local_clustering(_mk(rep, 8), driver_limit=100).to_pandas()
    assert (_mk(rep, 8).map_batches(
        lambda b: b, batch_format="pyarrow").count() == 700)
    pd.testing.assert_frame_equal(driver, shuffled)


def test_local_clustering_refuses_above_limit(ray_session):
    edges = pd.DataFrame({"u": np.arange(50, dtype=np.int64),
                          "v": np.arange(50, dtype=np.int64) + 100})
    with pytest.raises(ValueError, match="driver"):
        local_clustering(_mk(edges), driver_limit=10)
