"""Benchmark harness (driver contract).

Default mode: one fresh Ray session (``address="local"``,
``num_cpus=$RAY_GRAFT_CPUS`` default 32), the headline sketch-build
pipeline over a cached deterministic synthetic corpus (BASELINE.json
``input_hint`` shape), plus the per-query suite over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1). Prints ONE JSON line.

``--scaling``: runs the headline pipeline twice in FRESH subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports throughput at
both plus scaling efficiency ``(tp32/tp8)/(32/8)`` (the sandbox stand-in
for the north rule's N vs 4N-node criterion; see BASELINE.md §2).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CORPUS_DIR = os.environ.get("RAYSKETCH_BENCH_CORPUS", "/tmp/raysketch_bench_corpus")
CORPUS_ROWS = int(os.environ.get("RAYSKETCH_BENCH_ROWS", "240000"))
CORPUS_SHARD_ROWS = 3750  # 240k rows -> 64 parquet shards (>= 2 blocks/CPU at 32)

# per-query suite over $GRAFT_SF_DIR: every registered query; names match
# __ray_entry__.queries() so CORRECTNESS_r{N} and BENCH_r{N} line up.
SKIP_QUERIES: set[str] = set()


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )


def _ensure_corpus() -> str:
    from raysketch.corpus import write_bench_corpus

    return write_bench_corpus(CORPUS_DIR, CORPUS_ROWS, seed=42,
                              shard_rows=CORPUS_SHARD_ROWS)


def run_headline(num_cpus: int) -> dict:
    """Flagship sketch-build: corpus -> derive -> per-lang sketch profile.

    A small warm-up pass spins up the Ray worker pool and pays the one-time
    per-worker import cost before the timed run, so the metric measures the
    pipeline, not cluster start-up (a real cluster's workers are long-lived).
    """
    import ray.data as rd

    from raysketch.engine.pipeline import corpus_profile

    path = _ensure_corpus()

    def _warm(batch):
        import pandas  # noqa: F401  (heavy per-worker lazy import)

        import raysketch.engine.udaf  # noqa: F401
        import raysketch.sketches  # noqa: F401

        time.sleep(0.4)  # hold the slot so Ray fans out to all workers
        return batch

    rd.range(num_cpus * 2, override_num_blocks=num_cpus * 2).map_batches(
        _warm, batch_format="pyarrow"
    ).materialize()
    t0 = time.perf_counter()
    ds = rd.read_parquet(path, override_num_blocks=num_cpus * 2)
    result = corpus_profile(ds, group_key="lang")
    elapsed = time.perf_counter() - t0
    n_files = sum(result["n_files"].to_pylist())
    return {
        "seconds": round(elapsed, 3),
        "files": int(n_files),
        "files_per_sec": round(n_files / elapsed, 1),
        "groups": result.num_rows,
        "num_cpus": num_cpus,
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    import __ray_entry__

    out: dict[str, float] = {}
    for name, fn in __ray_entry__.queries().items():
        if name in SKIP_QUERIES:
            continue
        t0 = time.perf_counter()
        fn(sf_dir)
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true",
                    help="internal: headline pipeline only, for scaling subprocesses")
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()

    if args.scaling:
        # fresh process per parallelism level (clean Ray session each)
        runs = {}
        for cpus in (8, 32):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--headline-only", f"--cpus={cpus}"],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            runs[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
        tp8, tp32 = runs[8]["files_per_sec"], runs[32]["files_per_sec"]
        eff = (tp32 / tp8) / (32 / 8)
        print(json.dumps({
            "metric": "scaling_efficiency_8_to_32_cpus",
            "value": round(eff, 3),
            "unit": "ratio",
            "files_per_sec_8cpu": tp8,
            "files_per_sec_32cpu": tp32,
            "seconds_8cpu": runs[8]["seconds"],
            "seconds_32cpu": runs[32]["seconds"],
            "files": runs[32]["files"],
            "pass_ge_0_8": eff >= 0.8,
        }))
        return

    import ray

    _init_ray(args.cpus)
    try:
        headline = run_headline(args.cpus)
        if args.headline_only:
            print(json.dumps(headline))
            return
        queries = run_queries(args.sf_dir)
        total = headline["seconds"] + sum(queries.values())
        print(json.dumps({
            "metric": "bench_total_wall_seconds",
            "value": round(total, 3),
            "unit": "sec",
            "queries": queries,
            "sf": args.sf_dir,
            "num_cpus": args.cpus,
            "headline_files_per_sec": headline["files_per_sec"],
            "headline_seconds": headline["seconds"],
            "headline_files": headline["files"],
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
