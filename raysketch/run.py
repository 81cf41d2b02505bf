"""Job entry point for `ray job submit` — resumable pipelines.

    # flagship sketch build (default)
    ray job submit -- python -m raysketch.run \
        --input /data/corpus --job-id nightly-2026-08-17 \
        --checkpoint-root /data/checkpoints --output /data/results

    # resumable MinHash near-dup pipeline (needs an int64 id column and a
    # text column; the raysketch corpus schema has no integer id, so name
    # yours explicitly)
    ray job submit -- python -m raysketch.run --pipeline dedup \
        --input /data/docs --id-col doc_id --text-col text \
        --job-id dedup-2026-08-17 --checkpoint-root /data/checkpoints

Re-submitting with the SAME --job-id after a kill resumes from the
checkpoint store: finished shards (manifest present + partial parses) are
skipped — for the dedup pipeline, finished global stages (candidates,
verify) are skipped wholesale via their _SUCCESS markers — and because
every kernel is deterministic the resumed run's final results are
bit-identical to an uninterrupted one. Per-partition lineage and metrics
live in `<checkpoint-root>/<job-id>/manifest/*.json`; a p50/p99
partition-wall summary prints at the end (sketch pipeline).

Owns its Ray session (guarded init) — the driver-contract surfaces in
__ray_entry__ never call ray.init; CLI entry points do (see repo README).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet file, directory of shards, or glob")
    ap.add_argument("--job-id", required=True)
    ap.add_argument("--checkpoint-root", default="/tmp/raysketch_checkpoints")
    ap.add_argument("--output", default=None,
                    help="directory for the result parquet (optional)")
    ap.add_argument("--group-key", default="lang")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--max-in-flight", type=int, default=32)
    ap.add_argument("--pipeline",
                    choices=["sketch", "dedup", "pagerank", "shards", "split"],
                    default="sketch",
                    help="sketch = flagship profile build; dedup = resumable "
                         "MinHash near-dup pairs over the corpus text; "
                         "pagerank = resumable iterative PageRank over "
                         "(src, dst) edge shards; shards = resumable "
                         "training-shard emission (per-input-chunk resume)")
    ap.add_argument("--dedup-threshold", type=float, default=0.7)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id",
                    help="int64 id column (validated against the first "
                         "shard's schema before any work is scheduled)")
    ap.add_argument("--src-col", default="src")
    ap.add_argument("--dst-col", default="dst")
    ap.add_argument("--pr-iters", type=int, default=10)
    ap.add_argument("--pr-damping", type=float, default=0.85)
    ap.add_argument("--n-shards", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    try:
        _run(args)
    finally:
        ray.shutdown()


def _derive(t):
    from .corpus import derive_columns, drop_content

    return drop_content(derive_columns(t))


def _run(args: argparse.Namespace) -> None:
    import pyarrow as pa

    from .engine.checkpoint import CheckpointStore, run_with_checkpoint
    from .engine.pipeline import default_specs

    if os.path.isdir(args.input):
        shards = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    else:
        shards = sorted(glob.glob(args.input))
    if not shards:
        raise SystemExit(f"no parquet shards match {args.input!r}")

    if args.pipeline == "dedup":
        _run_dedup(args, shards)
        return
    if args.pipeline == "pagerank":
        _run_pagerank(args, shards)
        return
    if args.pipeline == "shards":
        _run_shards(args, shards)
        return
    if args.pipeline == "split":
        _run_split(args, shards)
        return

    store = CheckpointStore(args.checkpoint_root, args.job_id)
    already = len(store.done_partitions())
    t0 = time.perf_counter()
    merged = run_with_checkpoint(
        shards,
        default_specs(),
        store,
        group_key=args.group_key,
        derive=_derive,
        max_in_flight=args.max_in_flight,
    )
    wall = time.perf_counter() - t0

    rows = []
    for (group, spec), sketch in sorted(merged.items()):
        rows.append({"group": group, "spec": spec, "kind": sketch.kind,
                     "result": json.dumps(sketch.result(), default=float)})
    result = pa.Table.from_pylist(rows)
    if args.output:
        from .engine.sinks import write_table

        write_table(result, os.path.join(args.output, f"{args.job_id}.parquet"))

    print(json.dumps({
        "job_id": args.job_id,
        "shards_total": len(shards),
        "shards_skipped_resume": already,
        "wall_sec": round(wall, 2),
        "result_rows": result.num_rows,
        "partition_metrics": store.metrics_summary(),
    }))


def _run_dedup(args: argparse.Namespace, shards: list[str]) -> None:
    """Resumable MinHash near-dup pairs (ops.dedup stage checkpoints)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .ops.dedup import minhash_dedup_pairs_checkpointed

    # fail fast with a usable message BEFORE scheduling any shard work:
    # the pipeline needs an integer id column, which e.g. the raysketch
    # corpus schema (repo/path/commit/lang/content) does not have
    schema = pq.read_schema(shards[0])
    for col, what in ((args.id_col, "--id-col"), (args.text_col, "--text-col")):
        if col not in schema.names:
            raise SystemExit(
                f"{what}={col!r} not in shard schema {schema.names} "
                f"(first shard: {shards[0]})"
            )
    if not pa.types.is_integer(schema.field(args.id_col).type):
        raise SystemExit(
            f"--id-col={args.id_col!r} must be an integer column, got "
            f"{schema.field(args.id_col).type}"
        )

    t0 = time.perf_counter()
    pairs = minhash_dedup_pairs_checkpointed(
        shards, args.checkpoint_root, args.job_id,
        text_col=args.text_col, id_col=args.id_col,
        threshold=args.dedup_threshold, max_in_flight=args.max_in_flight,
    )
    n = pairs.count()
    wall = time.perf_counter() - t0
    base = os.path.join(args.checkpoint_root, args.job_id)
    print(json.dumps({
        "job_id": args.job_id,
        "pipeline": "dedup",
        "shards_total": len(shards),
        "verified_pairs": int(n),
        "wall_sec": round(wall, 2),
        "pairs_path": os.path.join(base, "stage_verified"),
    }))


def _run_shards(args: argparse.Namespace, shards: list[str]) -> None:
    """Resumable training-shard emission (ops.curate per-chunk resume).

    --output is the layout root (REQUIRED); re-running with the same
    --output skips published chunks. --job-id rides only the summary."""
    import json as _json

    from .ops.curate import write_training_shards_checkpointed

    if not args.output:
        raise SystemExit("--pipeline shards requires --output (layout root)")
    t0 = time.perf_counter()
    stats = write_training_shards_checkpointed(
        shards, args.output, n_shards=args.n_shards,
        id_col=args.id_col, text_col=args.text_col)
    print(_json.dumps({
        "job_id": args.job_id, "pipeline": "shards",
        "wall_sec": round(time.perf_counter() - t0, 2), **stats}))


def _run_split(args: argparse.Namespace, shards: list[str]) -> None:
    """Resumable stratified train/val/test split (ops.sample two-stage
    per-chunk resume: cell-count manifests, then hive split writes).

    --output is the layout root (REQUIRED); --group-key is the stratum
    column. Re-running with the same --output skips published stages."""
    import json as _json

    from .ops.sample import stratified_split_checkpointed

    if not args.output:
        raise SystemExit("--pipeline split requires --output (layout root)")
    if not args.group_key:
        raise SystemExit("--pipeline split requires --group-key (stratum)")
    t0 = time.perf_counter()
    stats = stratified_split_checkpointed(
        shards, args.output, stratum_col=args.group_key,
        id_col=args.id_col)
    print(_json.dumps({
        "job_id": args.job_id, "pipeline": "split",
        "wall_sec": round(time.perf_counter() - t0, 2), **stats}))


def _run_pagerank(args: argparse.Namespace, shards: list[str]) -> None:
    """Resumable iterative PageRank (per-iteration staged rank sinks)."""
    import pyarrow.parquet as pq

    from .ops.graph import pagerank_checkpointed

    schema = pq.read_schema(shards[0])
    for col, what in ((args.src_col, "--src-col"), (args.dst_col, "--dst-col")):
        if col not in schema.names:
            raise SystemExit(
                f"{what}={col!r} not in shard schema {schema.names} "
                f"(first shard: {shards[0]})"
            )

    t0 = time.perf_counter()
    res = pagerank_checkpointed(
        shards, args.checkpoint_root, args.job_id,
        src=args.src_col, dst=args.dst_col,
        damping=args.pr_damping, iters=args.pr_iters,
    )
    n = res["ranks"].count()
    wall = time.perf_counter() - t0
    base = os.path.join(args.checkpoint_root, args.job_id)
    print(json.dumps({
        "job_id": args.job_id,
        "pipeline": "pagerank",
        "shards_total": len(shards),
        "nodes": int(n),
        "iters": args.pr_iters,
        "resumed_from_iter": res["resumed_from_iter"],
        "wall_sec": round(wall, 2),
        "ranks_path": os.path.join(
            base, f"stage_iter_{args.pr_iters - 1:04d}"),
    }))


if __name__ == "__main__":
    main()
