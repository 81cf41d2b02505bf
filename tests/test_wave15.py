"""Round-4 seventh-session wave 7: dedup_lineage (incremental_quantiles
is a composition of build_partials + the versioned sink + KLL merge,
oracle-gated end-to-end in test_oracle_parity)."""

import os

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.dedup import dedup_lineage


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


def test_dedup_lineage_matches_brute(ray_session):
    rng = np.random.default_rng(5)
    texts = [f"doc body {i}" for i in range(60)]
    # plant duplicate groups: {3, 17, 41} share one text, {8, 9} another
    for i in (17, 41):
        texts[i] = texts[3]
    texts[9] = texts[8]
    ids = rng.permutation(60).astype(np.int64) + 100
    df = pd.DataFrame({"doc_id": ids, "text": [texts[i] for i in range(60)]})
    got = dedup_lineage(_mk(df, 6)).to_pandas() \
        .sort_values("dropped_id").reset_index(drop=True)
    w = df.groupby("text")["doc_id"].min()
    want = df[df["doc_id"] != w.reindex(df["text"]).to_numpy()]
    want = pd.DataFrame({
        "dropped_id": want["doc_id"].to_numpy(np.int64),
        "winner_id": w.reindex(want["text"]).to_numpy(np.int64)}) \
        .sort_values("dropped_id").reset_index(drop=True)
    assert len(got) == 3  # two losers in the triple, one in the pair
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))


def test_dedup_lineage_no_duplicates_is_empty(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64),
                       "text": [f"unique {i}" for i in range(20)]})
    got = dedup_lineage(_mk(df, 3)).to_pandas()
    assert len(got) == 0


def test_dedup_lineage_winners_consistent_with_exact_dedup(ray_session):
    from raysketch.ops.dedup import exact_dedup

    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [f"t{i % 12}" for i in range(40)]})
    lineage = dedup_lineage(_mk(df, 4)).to_pandas()
    kept = exact_dedup(_mk(df, 4)).to_pandas()
    # dropped ∪ kept == all rows; dropped ∩ kept == ∅; winners all kept
    assert set(lineage["dropped_id"]) | set(kept["doc_id"]) == \
        set(df["doc_id"])
    assert not set(lineage["dropped_id"]) & set(kept["doc_id"])
    assert set(lineage["winner_id"]) <= set(kept["doc_id"])


def test_ingest_lifecycle_prunes_and_matches(ray_session, sf_dir):
    """The capstone query's own assert pins files_scanned < files_total;
    here pin that the micro-batch append-log loses nothing: the union
    of the four event_id % 4 batches equals the full table."""
    import duckdb

    from raysketch.queries import QUERIES

    got = QUERIES["ingest_lifecycle"](sf_dir).to_pandas()
    want = duckdb.query(
        f"""SELECT event_type, count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users
            FROM read_parquet('{sf_dir}/events.parquet')
            WHERE user_id BETWEEN 5 AND 50
            GROUP BY event_type ORDER BY event_type""").df()
    assert list(got["n_events"]) == list(want["n_events"])
    assert list(got["n_users"]) == list(want["n_users"])


def test_grouped_median_impute_matches_brute(ray_session):
    from raysketch.ops.stats import grouped_median_impute

    rng = np.random.default_rng(8)
    n = 2000
    g = rng.choice(["a", "b"], n)
    v = rng.integers(1, 5000, n) / 100.0
    miss = rng.random(n) < 0.15
    df = pd.DataFrame({"g": g, "v": v, "m": miss})
    got = grouped_median_impute(_mk(df, 6), "g", "v", "m").to_pandas() \
        .set_index("g")
    for gv in ("a", "b"):
        sel = g == gv
        obs = np.sort(np.floor(v[sel & ~miss] * 100 + 0.5).astype(np.int64))
        med = int(obs[(len(obs) + 1) // 2 - 1])
        nm = int((sel & miss).sum())
        total = int(obs.sum()) + nm * med
        row = got.loc[gv]
        assert int(row["n_rows"]) == int(sel.sum())
        assert int(row["n_imputed"]) == nm
        assert row["imputed_value"] == pytest.approx(med / 100, abs=1e-6)
        assert row["total_value"] == pytest.approx(total / 100, abs=2e-6)
    # a group with nothing observed refuses loudly
    allmiss = pd.DataFrame({"g": ["z"] * 4 + ["a"] * 4,
                            "v": [1.0] * 8,
                            "m": [True] * 4 + [False] * 4})
    with pytest.raises(ValueError, match="no observed"):
        grouped_median_impute(_mk(allmiss, 2), "g", "v", "m")


def test_hard_negatives_matches_brute(ray_session):
    from raysketch.ops.similarity import hard_negatives

    rng = np.random.default_rng(6)
    n, d = 60, 6
    X = rng.normal(size=(n, d))
    labels = rng.integers(0, 3, n).astype(np.int64)
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r.astype(np.float32) for r in X],
        "label": labels})
    got = hard_negatives(_mk(df, 4)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    Xd = X.astype(np.float32).astype(np.float64)
    nrm = np.sqrt((Xd * Xd).sum(axis=1))
    cos = (Xd @ Xd.T) / (nrm[:, None] * nrm[None, :])
    micro = (np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)) \
        .astype(np.int64)
    for i in range(n):
        cand = sorted((-int(micro[i, j]), j) for j in range(n)
                      if labels[j] != labels[i])
        j = cand[0][1]
        row = got.iloc[i]
        assert int(row["neg_id"]) == j
        assert int(row["neg_label"]) == int(labels[j])
        assert row["cos"] == micro[i, j] / 1e6
        assert int(row["neg_label"]) != int(row["label"])
    onelabel = df.assign(label=np.int64(1))
    with pytest.raises(ValueError, match="two labels"):
        hard_negatives(_mk(onelabel, 2))


def test_write_tables_atomic_all_or_nothing(ray_session, tmp_path):
    from raysketch.engine.sinks import (read_back, write_tables_atomic)

    root = str(tmp_path / "multi")
    a = pd.DataFrame({"k": np.arange(6, dtype=np.int64)})
    b = pd.DataFrame({"v": np.arange(3, dtype=np.int64) + 10})
    write_tables_atomic({"a": _mk(a, 2), "b": _mk(b, 1)}, root)
    assert sorted(read_back(root + "/a").to_pandas()["k"]) == list(range(6))
    assert sorted(read_back(root + "/b").to_pandas()["v"]) == [10, 11, 12]
    assert os.path.exists(os.path.join(root, "_SUCCESS"))
    # a failing table leaves NO readable root (all-or-nothing)
    root2 = str(tmp_path / "multi2")

    class Boom:
        def write_parquet(self, path):
            raise RuntimeError("disk full")

    with pytest.raises(RuntimeError):
        write_tables_atomic({"a": _mk(a, 1), "z": Boom()}, root2)
    assert not os.path.exists(root2)
    with pytest.raises(ValueError, match="no tables"):
        write_tables_atomic({}, root2)


def test_salted_attach_route_identity(ray_session):
    """Salted (key, salt) join emits exactly attach_by_key's rows —
    including a HOT key carrying half the fact volume, and unmatched
    fact rows under how='left' (one salt value each: never duplicated,
    never dropped)."""
    from raysketch.ops.join import attach_by_key, salted_attach_by_key

    rng = np.random.default_rng(2)
    n = 5000
    keys = np.where(rng.random(n) < 0.5, 7,
                    rng.integers(0, 40, n)).astype(np.int64)
    fact = pd.DataFrame({"k": keys,
                         "x": np.arange(n, dtype=np.int64)})
    dim = pd.DataFrame({"d": np.arange(35, dtype=np.int64),
                        "v": np.arange(35, dtype=np.int64) * 10})

    def canon(ds):
        df = ds.to_pandas().sort_values(["x"]).reset_index(drop=True)
        return df[sorted(df.columns)]

    for how in ("inner", "left"):
        plain = canon(attach_by_key(_mk(fact, 6), _mk(dim, 2), "k", "d",
                                    ["v"], broadcast_limit_rows=1,
                                    how=how))
        salted = canon(salted_attach_by_key(_mk(fact, 6), _mk(dim, 2),
                                            "k", "d", ["v"], salt=4,
                                            how=how))
        pd.testing.assert_frame_equal(plain, salted)
    with pytest.raises(ValueError, match="salt"):
        salted_attach_by_key(_mk(fact, 2), _mk(dim, 1), "k", "d", ["v"],
                             salt=1)


def test_pruned_reads_refuse_stale_manifests(ray_session, tmp_path):
    """Files added after a zone-map/bloom manifest was built are
    invisible to pruning — a silent-wrongness hazard; both pruned-read
    paths must refuse loudly until the manifest is rebuilt."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raysketch.engine.sinks import (read_bloom_pruned,
                                        read_pruned_range,
                                        write_bloom_manifest,
                                        write_zone_map)

    root = str(tmp_path / "sink")
    os.makedirs(root)
    pq.write_table(pa.table({"k": pa.array([1, 2, 3], pa.int64())}),
                   os.path.join(root, "part-0.parquet"))
    write_zone_map(root, ["k"])
    write_bloom_manifest(root, "k")
    ds, scanned, total = read_pruned_range(root, "k", 2, 3)
    assert scanned == total == 1
    # a late-arriving file makes both manifests stale
    pq.write_table(pa.table({"k": pa.array([99], pa.int64())}),
                   os.path.join(root, "part-1.parquet"))
    with pytest.raises(RuntimeError, match="STALE"):
        read_pruned_range(root, "k", 2, 3)
    with pytest.raises(RuntimeError, match="STALE"):
        read_bloom_pruned(root, "k", [99])
    # rebuilding restores service and sees the new file
    write_zone_map(root, ["k"])
    ds, scanned, total = read_pruned_range(root, "k", 99, 99)
    assert scanned == 1 and total == 2


def test_zone_map_incremental_refresh(ray_session, tmp_path):
    """incremental=True footer-scans only NEW files and unions them in;
    the refreshed manifest prunes correctly and matches a full rebuild."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raysketch.engine.sinks import read_pruned_range, write_zone_map

    root = str(tmp_path / "zsink")
    os.makedirs(root)
    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int64())}),
                   os.path.join(root, "part-0.parquet"))
    write_zone_map(root, ["k"])
    pq.write_table(pa.table({"k": pa.array([50, 60], pa.int64())}),
                   os.path.join(root, "part-1.parquet"))
    write_zone_map(root, ["k"], incremental=True)
    ds, scanned, total = read_pruned_range(root, "k", 55, 100)
    assert (scanned, total) == (1, 2)
    assert sorted(ds.to_pandas()["k"]) == [50, 60]
    # incremental refresh == full rebuild, entry for entry
    inc = pq.read_table(os.path.join(root, "_zonemap.parquet")) \
        .to_pandas()
    write_zone_map(root, ["k"])
    full = pq.read_table(os.path.join(root, "_zonemap.parquet")) \
        .to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(inc.reset_index(drop=True),
                                  full.reset_index(drop=True))
    # vanished files drop out; no-op refresh keeps service
    os.remove(os.path.join(root, "part-0.parquet"))
    write_zone_map(root, ["k"], incremental=True)
    _, scanned, total = read_pruned_range(root, "k", 0, 100)
    assert total == 1
    with pytest.raises(ValueError, match="column set"):
        write_zone_map(root, ["k", "other"], incremental=True)


def test_incremental_neardup_index_probe(ray_session, tmp_path):
    """Planted near-dups across the history/incoming split are found by
    probing the PERSISTED index; unrelated docs are not; the no-match
    batch returns an empty typed table."""
    from raysketch.ops.dedup import (build_neardup_index,
                                     incremental_neardup, jaccard)

    rng = np.random.default_rng(3)
    base = ["".join(rng.choice(list("abcdef "), 300)) for _ in range(20)]
    hist = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64), "text": base})
    inc_texts = [base[4] + " tail", base[9], "completely different zzz"]
    inc = pd.DataFrame({
        "doc_id": np.array([100, 101, 102], np.int64),
        "text": inc_texts})
    root = str(tmp_path / "ndidx")
    build_neardup_index(_mk(hist, 4), root, num_perm=64, bands=16)
    got = incremental_neardup(_mk(inc, 2), _mk(hist, 4), root,
                              threshold=0.5).to_pandas()
    pairs = set(zip(got["new_id"], got["old_id"]))
    assert (100, 4) in pairs and (101, 9) in pairs
    assert not any(n == 102 for n, _ in pairs)
    for _, r in got.iterrows():
        true_j = jaccard(inc_texts[int(r["new_id"]) - 100],
                         base[int(r["old_id"])], 5)
        assert r["jaccard"] == pytest.approx(true_j, abs=1e-6)
    empty = incremental_neardup(
        _mk(pd.DataFrame({"doc_id": np.array([200], np.int64),
                          "text": ["qqq www eee rrr ttt yyy uuu"]}), 1),
        _mk(hist, 4), root, threshold=0.5).to_pandas()
    assert len(empty) == 0 and list(empty.columns) == [
        "new_id", "old_id", "jaccard"]


def test_grouped_spearman_matches_scipy_style_brute(ray_session):
    from raysketch.ops.stats import grouped_spearman

    rng = np.random.default_rng(7)
    n = 3000
    g = rng.choice(["a", "b"], n)
    x = rng.integers(1, 20, n).astype(np.float64)
    # monotone-ish dependence with ties + noise
    y = (x * 3 + rng.integers(0, 25, n)).astype(np.float64) / 100.0
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    got = grouped_spearman(_mk(df, 6), "g", "x", "y",
                           x_scale=1, y_scale=100).to_pandas() \
        .set_index("g")

    def brute_rho(xv, yv):
        def midranks(v):
            order = np.argsort(v, kind="stable")
            r = np.empty(len(v), np.float64)
            sv = v[order]
            i = 0
            while i < len(sv):
                j = i
                while j < len(sv) and sv[j] == sv[i]:
                    j += 1
                r[order[i:j]] = (i + j + 1) / 2
                i = j
            return r
        rx, ry = midranks(xv), midranks(yv)
        return np.corrcoef(rx, ry)[0, 1]

    for gv in ("a", "b"):
        m = g == gv
        assert got.loc[gv, "spearman"] == pytest.approx(
            brute_rho(x[m], np.floor(y[m] * 100 + 0.5)), abs=2e-6)
        assert int(got.loc[gv, "n"]) == int(m.sum())
    # perfect monotone -> rho == 1 exactly
    mono = pd.DataFrame({"g": "m", "x": np.arange(50, dtype=np.float64),
                         "y": np.arange(50, dtype=np.float64) ** 2})
    r = grouped_spearman(_mk(mono, 3), "g", "x", "y").to_pandas()
    assert r["spearman"].iloc[0] == 1.0
    # raised inside a TASK stage -> surfaces as RayTaskError(ValueError)
    with pytest.raises(Exception, match="precision"):
        grouped_spearman(_mk(pd.DataFrame(
            {"g": ["a"], "x": [1.234], "y": [1.0]}), 1), "g", "x", "y")


def test_grouped_kendall_matches_brute(ray_session):
    from raysketch.ops.stats import grouped_kendall

    rng = np.random.default_rng(11)
    n = 800
    g = rng.choice(["a", "b"], n)
    x = rng.integers(1, 12, n).astype(np.float64)
    y = (x * 2 + rng.integers(0, 15, n)).astype(np.float64)
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    got = grouped_kendall(_mk(df, 5), "g", "x", "y").to_pandas() \
        .set_index("g")

    def brute_tau(xv, yv):
        m = len(xv)
        C = D = 0
        for i in range(m):
            for j in range(i + 1, m):
                s = (xv[i] - xv[j]) * (yv[i] - yv[j])
                C += s > 0
                D += s < 0
        tt = m * (m - 1) // 2
        tx = sum(c * (c - 1) // 2
                 for c in pd.Series(xv).value_counts())
        ty = sum(c * (c - 1) // 2
                 for c in pd.Series(yv).value_counts())
        return (C - D) / np.sqrt(float(tt - tx) * float(tt - ty))

    for gv in ("a", "b"):
        m = g == gv
        assert got.loc[gv, "kendall_tau"] == pytest.approx(
            brute_tau(x[m], y[m]), abs=2e-6)
    # perfect monotone -> tau == 1 exactly
    mono = pd.DataFrame({"g": "m", "x": np.arange(30, dtype=np.float64),
                         "y": np.arange(30, dtype=np.float64) * 3})
    r = grouped_kendall(_mk(mono, 2), "g", "x", "y").to_pandas()
    assert r["kendall_tau"].iloc[0] == 1.0
