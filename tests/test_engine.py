"""End-to-end engine tests on Ray (session-scoped ray fixture)."""

import functools
import math
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from raysketch.corpus import (
    documents_to_corpus_batch,
    generate_corpus,
    load_corpus,
)
from raysketch.engine.aggregate import (
    build_partials,
    merge_partials_driver,
    merge_partials_ds,
    sketch_aggregate,
)
from raysketch.engine.pipeline import corpus_profile, default_specs
from raysketch.engine.udaf import SketchSpec
from raysketch.sketches import HyperLogLog, RunningStats, TDigest


@pytest.fixture(scope="module")
def docs_table(sf_dir):
    return pq.read_table(os.path.join(sf_dir, "documents.parquet"))


def test_corpus_mapping_deterministic(docs_table):
    a = documents_to_corpus_batch(docs_table)
    b = documents_to_corpus_batch(docs_table)
    assert a.equals(b)
    assert a.column_names == ["repo", "path", "commit", "lang", "content"]
    assert a.num_rows == docs_table.num_rows


def test_sketch_aggregate_grouped_exact(ray_session, sf_dir, docs_table):
    ds = load_corpus(sf_dir)
    specs = [
        SketchSpec("d_paths", "path", functools.partial(HyperLogLog, p=14)),
        SketchSpec("stats", "path", RunningStats),
    ]

    # RunningStats over a string column counts nothing numeric — use repo
    specs[1] = SketchSpec("stats", "lenproxy", RunningStats)

    # derive a numeric column first
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_len(b: pa.Table) -> pa.Table:
        return b.append_column("lenproxy", pc.utf8_length(b["content"]).cast(pa.float64()))

    derived = ds.map_batches(add_len, batch_format="pyarrow")
    merged = sketch_aggregate(derived, specs, group_key="lang", merge="driver")

    langs = docs_table["lang"].to_pylist()
    texts = docs_table["text"].to_pylist()
    import collections

    per_lang = collections.defaultdict(list)
    for lang, t in zip(langs, texts):
        per_lang[lang].append(len(t))
    for lang, lens in per_lang.items():
        sk = merged[lang]
        # sparse HLL is exact at this scale; paths are unique per doc
        assert sk["d_paths"].estimate() == len(lens)
        assert sk["stats"].count == len(lens)
        assert abs(sk["stats"].mean - np.mean(lens)) < 1e-9


def test_merge_modes_agree(ray_session, sf_dir):
    ds = load_corpus(sf_dir)
    specs = [SketchSpec("d_commits", "commit", functools.partial(HyperLogLog, p=14))]
    a = sketch_aggregate(ds, specs, group_key="lang", merge="driver")
    b = sketch_aggregate(ds, specs, group_key="lang", merge="dataset")
    c = sketch_aggregate(ds, specs, group_key="lang", merge="dataset", salt_fan_in=4)
    assert set(a) == set(b) == set(c)
    for lang in a:
        ea = a[lang]["d_commits"].to_bytes()
        assert ea == b[lang]["d_commits"].to_bytes()
        assert ea == c[lang]["d_commits"].to_bytes()


def test_corpus_profile_schema_and_sanity(ray_session, sf_dir):
    t = corpus_profile(load_corpus(sf_dir), specs=default_specs(bloom_capacity=10_000))
    df = t.to_pandas()
    assert {"lang", "n_files", "distinct_paths", "len_p50", "len_p95"} <= set(df.columns)
    assert (df["n_files"] > 0).all()
    assert (df["len_p50"] <= df["len_p95"]).all()
    assert (df["len_p95"] <= df["len_p99"]).all()
    assert df["n_files"].sum() == 500


def test_generated_corpus_partials_scale(ray_session, tmp_path):
    import ray.data as rd

    t = generate_corpus(5_000, seed=7)
    assert t.num_rows == 5_000
    ds = rd.from_arrow(t)
    specs = [
        SketchSpec("d_content", "content", functools.partial(HyperLogLog, p=14)),
        SketchSpec("len_td", "content_length", functools.partial(TDigest, 200.0)),
    ]
    import pyarrow as pa
    import pyarrow.compute as pc

    derived = ds.map_batches(
        lambda b: b.append_column(
            "content_length", pc.utf8_length(b["content"]).cast(pa.int64())
        ),
        batch_format="pyarrow",
    )
    partials = build_partials(derived, specs, group_key="lang", batch_size=512)
    n_partials = partials.count()
    assert n_partials > 0
    merged = merge_partials_driver(partials)
    langs = {k[0] for k in merged}
    assert "python" in langs
    # exact distinct check vs duckdb-free exact computation
    import collections

    exact = collections.Counter()
    dist = collections.defaultdict(set)
    for lang, content in zip(t["lang"].to_pylist(), t["content"].to_pylist()):
        exact[lang] += 1
        dist[lang].add(content)
    for lang in langs:
        h = HyperLogLog.from_bytes(merged[(lang, "d_content")])
        est = h.estimate()
        true = len(dist[lang])
        assert abs(est - true) / max(true, 1) < 0.05, (lang, est, true)


def test_actor_pool_partial_builder(ray_session, sf_dir):
    """Opt-in PartialBuilder actor pool produces the same partials."""
    import functools

    import ray.data as rd

    from raysketch.engine.aggregate import sketch_aggregate
    from raysketch.engine.udaf import SketchSpec
    from raysketch.sketches import HyperLogLog

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    specs = [SketchSpec("d", "text", functools.partial(HyperLogLog, 14))]
    a = sketch_aggregate(ds, specs, group_key="lang", merge="driver")
    b = sketch_aggregate(ds, specs, group_key="lang", merge="driver",
                         concurrency=(1, 2))
    assert {k: v["d"].estimate() for k, v in a.items()} == \
           {k: v["d"].estimate() for k, v in b.items()}


def test_merge_topologies_agree(ray_session, sf_dir):
    """driver / tree / dataset merges of the same partials must produce
    identical estimates (bit-identical payload folds for CMS/HLL/Bloom)."""
    import functools

    import ray.data as rd

    from raysketch.engine.aggregate import (
        build_partials,
        merge_partials_driver,
        merge_partials_ds,
        merge_partials_tree,
    )
    from raysketch.engine.udaf import SketchSpec
    from raysketch.sketches import SKETCH_KINDS, BloomFilter, CMSketch, HyperLogLog

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text", "source"])
    specs = [
        SketchSpec("h", "text", functools.partial(HyperLogLog, 12)),
        SketchSpec("c", "source", functools.partial(CMSketch, 0.01, 0.1)),
        SketchSpec("b", "source", functools.partial(BloomFilter, 10_000, 0.01)),
    ]
    partials = build_partials(ds, specs, "lang").materialize()
    a = merge_partials_driver(partials)
    b = merge_partials_tree(partials, fan_in_rows=8, max_driver_partials=4)
    out = merge_partials_ds(partials)
    c = {}
    for batch in out.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for g, s, p in zip(batch["group"].to_pylist(), batch["spec"].to_pylist(),
                           batch["payload"].to_pylist()):
            c[(g, s)] = p
    assert set(a) == set(b) == set(c)
    kind_of = {s.name: s.kind for s in specs}
    for key in a:
        cls = SKETCH_KINDS[kind_of[key[1]]]
        sa, sb, sc = (cls.from_bytes(x[key]) for x in (a, b, c))
        if key[1] == "h":
            assert sa.estimate() == sb.estimate() == sc.estimate()
        elif key[1] == "c":
            assert (sa.counts == sb.counts).all() and (sa.counts == sc.counts).all()
        else:
            sa._flush_pending(); sb._flush_pending(); sc._flush_pending()
            assert (sa.bits == sb.bits).all() and (sa.bits == sc.bits).all()


def test_rollup_levels():
    import pandas as pd

    from raysketch.engine.aggregate import rollup_levels

    f = pd.DataFrame({"a": ["x", "x", "y"], "b": ["1", "2", "1"],
                      "n": [1, 2, 4], "mn": [5, 3, 9], "mx": [5, 3, 9]})
    out = rollup_levels(f, ["a", "b"], ["n"], min_cols=["mn"], max_cols=["mx"])
    rows = {(r.a, r.b): (r.n, r.mn, r.mx) for r in out.itertuples()}
    assert rows[("x", "1")] == (1, 5, 5)
    assert rows[("x", "ALL")] == (3, 3, 5)
    assert rows[("y", "ALL")] == (4, 9, 9)
    assert rows[("ALL", "ALL")] == (7, 3, 9)
    assert len(out) == 3 + 2 + 1  # finest + per-a + grand total
    # single-key rollup: finest + grand total
    out1 = rollup_levels(f.groupby("a", as_index=False)["n"].sum(),
                         ["a"], ["n"])
    assert len(out1) == 3 and out1[out1.a == "ALL"]["n"].iloc[0] == 7


def test_cube_levels():
    import pandas as pd

    from raysketch.engine.aggregate import cube_levels

    f = pd.DataFrame({"a": ["x", "x", "y"], "b": ["1", "2", "1"],
                      "n": [1, 2, 4], "mn": [5, 3, 9], "mx": [5, 3, 9]})
    out = cube_levels(f, ["a", "b"], ["n"], min_cols=["mn"], max_cols=["mx"])
    rows = {(r.a, r.b): (r.n, r.mn, r.mx) for r in out.itertuples()}
    assert rows[("x", "1")] == (1, 5, 5)
    assert rows[("x", "ALL")] == (3, 3, 5)
    # the grouping set ROLLUP lacks: per-b with a cubed away
    assert rows[("ALL", "1")] == (5, 5, 9)
    assert rows[("ALL", "2")] == (2, 3, 3)
    assert rows[("ALL", "ALL")] == (7, 3, 9)
    assert len(out) == 3 + 2 + 2 + 1  # finest + per-a + per-b + grand


def test_grouping_sets_levels():
    import pandas as pd
    import pytest

    from raysketch.engine.aggregate import grouping_sets_levels

    f = pd.DataFrame({"a": ["x", "x", "y"], "b": ["1", "2", "1"],
                      "n": [1, 2, 4]})
    out = grouping_sets_levels(f, ["a", "b"],
                               [["a", "b"], ["b"], []], ["n"])
    rows = {(r.a, r.b): r.n for r in out.itertuples()}
    assert rows[("x", "1")] == 1 and rows[("y", "1")] == 4
    assert rows[("ALL", "1")] == 5 and rows[("ALL", "2")] == 2
    assert rows[("ALL", "ALL")] == 7
    assert len(out) == 3 + 2 + 1  # finest + per-b + grand (no per-a set)
    with pytest.raises(ValueError):
        grouping_sets_levels(f, ["a", "b"], [["zz"]], ["n"])


def test_pivot_wide():
    import pandas as pd

    from raysketch.engine.aggregate import pivot_wide

    f = pd.DataFrame({"h": [1, 0, 0, 1], "t": ["a", "a", "b", "zzz"],
                      "n": [5, 3, 4, 9]})
    out = pivot_wide(f, "h", "t", "n", ["a", "b", "c"])
    assert list(out.columns) == ["h", "a", "b", "c"]
    assert out["h"].tolist() == [0, 1]          # sorted row keys
    assert out.loc[0, ["a", "b", "c"]].tolist() == [3, 4, 0]
    assert out.loc[1, ["a", "b", "c"]].tolist() == [5, 0, 0]  # 'zzz' dropped
