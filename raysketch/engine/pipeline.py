"""Flagship pipeline: corpus → derived columns → per-lang sketch profile.

The north-star query set (BASELINE.json): per lang —
distinct repos/paths/commits (HLL), content_length / line_count quantiles
(t-digest + KLL), Welford running stats, token heavy-hitters (CMS), path
membership (Bloom) — all as one streaming pass of per-block partials plus
a KB-sized merge. ``content`` is dropped immediately after derivation so
only narrow columns flow (SURVEY.md §7.3).
"""

from __future__ import annotations

import functools
import math
from typing import Any

import pyarrow as pa

from ..corpus import derive_columns, drop_content, load_corpus
from ..sketches import REQ, BloomFilter, CMSketch, HyperLogLog, KLL, RunningStats, TDigest
from .aggregate import sketch_aggregate
from .udaf import SketchSpec


def default_specs(
    hll_p: int = 14,
    cms_epsilon: float = 1e-4,
    cms_delta: float = 0.01,
    compression: float = 200.0,
    kll_k: int = 200,
    bloom_capacity: int = 1_000_000,
) -> list[SketchSpec]:
    return [
        SketchSpec("distinct_repos", "repo", functools.partial(HyperLogLog, p=hll_p)),
        SketchSpec("distinct_paths", "path", functools.partial(HyperLogLog, p=hll_p)),
        SketchSpec("distinct_commits", "commit", functools.partial(HyperLogLog, p=hll_p)),
        SketchSpec("distinct_contents", "content_sha256", functools.partial(HyperLogLog, p=hll_p)),
        SketchSpec("path_freq", "path", functools.partial(CMSketch, cms_epsilon, cms_delta, fast_hash=True)),
        SketchSpec("len_tdigest", "content_length", functools.partial(TDigest, compression)),
        SketchSpec("len_kll", "content_length", functools.partial(KLL, kll_k)),
        SketchSpec("len_req", "content_length", functools.partial(REQ, 32)),
        SketchSpec("lines_tdigest", "line_count", functools.partial(TDigest, compression)),
        SketchSpec("len_stats", "content_length", RunningStats),
        SketchSpec("path_bloom", "path", functools.partial(BloomFilter, bloom_capacity, 0.01)),
    ]


def corpus_profile(
    corpus_ds,
    group_key: str | None = "lang",
    specs: list[SketchSpec] | None = None,
    merge: str = "auto",
) -> pa.Table:
    """Run the sketch profile over a corpus-shaped Dataset → result table
    (one row per group; every estimate a typed column)."""
    specs = specs or default_specs()
    derived = corpus_ds.map_batches(derive_columns, batch_format="pyarrow").map_batches(
        drop_content, batch_format="pyarrow"
    )
    merged = sketch_aggregate(derived, specs, group_key=group_key, merge=merge)

    rows: list[dict[str, Any]] = []
    for gval in sorted(merged):
        sk = merged[gval]
        stats: RunningStats = sk["len_stats"]
        row: dict[str, Any] = {
            "lang" if group_key == "lang" else (group_key or "group"): gval,
            "n_files": int(stats.count),
            "distinct_repos": float(sk["distinct_repos"].estimate()),
            "distinct_paths": float(sk["distinct_paths"].estimate()),
            "distinct_commits": float(sk["distinct_commits"].estimate()),
            "distinct_contents": float(sk["distinct_contents"].estimate()),
            "dup_pct": 0.0,
            "len_mean": stats.mean,
            "len_sd": stats.sd(),
            "len_p50": sk["len_tdigest"].quantile(0.5),
            "len_p95": sk["len_tdigest"].quantile(0.95),
            "len_p99": sk["len_tdigest"].quantile(0.99),
            "len_p50_kll": sk["len_kll"].quantile(0.5),
            "len_p999": sk["len_req"].quantile(0.999),
            "lines_p50": sk["lines_tdigest"].quantile(0.5),
            "path_total": int(sk["path_freq"].item_count),
            "bloom_fill": sk["path_bloom"].fill_ratio(),
        }
        # duplicate percentage via HLL, the heka_message_monitor.lua:359-410
        # pattern: 100 * (1 - distinct/total)
        if stats.count > 0:
            row["dup_pct"] = max(
                0.0, 100.0 * (1.0 - row["distinct_contents"] / stats.count)
            )
        if math.isnan(row["len_p50"]):
            row["len_p50"] = row["len_p95"] = row["len_p99"] = 0.0
        rows.append(row)
    return pa.Table.from_pylist(rows)


def corpus_profile_from_dir(sf_dir: str, **kwargs) -> pa.Table:
    return corpus_profile(load_corpus(sf_dir), **kwargs)
