"""Checkpoint store: per-partition sketch partials + lineage manifest.

Resumability contract (BASELINE.md §2): a killed run re-submitted with the
same ``job_id`` must skip finished partitions and produce identical final
estimates. The unit of work is one input *shard* (a parquet file); each
finished shard persists

- ``partials/part-<pid>.parquet`` — its serialized (group, spec, payload)
  partial table (KB-sized), written atomically (tmp + rename), and
- ``manifest/<pid>.json`` — lineage + metrics: input file, row count,
  sha256 of the partial payload bytes, wall seconds.

One JSON file per partition (not an appended log) makes concurrent writers
and crash-mid-append safe: a partition is "done" iff its manifest file
exists and its partial file parses. Corrupt/incompatible partials degrade
gracefully to recompute (the reference's deserialize-fallback policy,
library/src/p2.c:205-230 — restore failure re-inits instead of crashing).

The shard loop dispatches raw ``@ray.remote`` tasks rather than one
Dataset pass — deliberate: resume semantics need per-shard outputs and
skip decisions *before* scheduling, which a monolithic map_batches pass
does not expose. Inside each task the work is the same vectorized
per-block partial build the Dataset path uses.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..sketches import SKETCH_KINDS
from .udaf import SketchSpec, partials_for_block


def shard_partition_id(path: str) -> str:
    """Stable partition id: shard basename + a short hash of the full
    path. Same-named shards from different directories (the standard
    sharded layout ``/data/*/part-00000.parquet``) must never collide in
    the checkpoint store — a bare-basename id would skip the second
    shard on resume and race both writers onto one partial file."""
    base = os.path.basename(path)
    if base.endswith(".parquet"):
        base = base[: -len(".parquet")]
    digest = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:8]
    return f"{base}-{digest}"


class CheckpointStore:
    def __init__(self, root: str, job_id: str) -> None:
        self.dir = os.path.join(root, job_id)
        self.partials_dir = os.path.join(self.dir, "partials")
        self.manifest_dir = os.path.join(self.dir, "manifest")
        os.makedirs(self.partials_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- write -------------------------------------------------------------
    def write_partition(
        self, pid: str, partials: pa.Table, meta: dict[str, Any]
    ) -> None:
        final = os.path.join(self.partials_dir, f"part-{pid}.parquet")
        tmp = final + ".tmp"
        pq.write_table(partials, tmp)
        os.replace(tmp, final)  # atomic publish
        digest = hashlib.sha256(b"".join(partials["payload"].to_pylist())).hexdigest()
        from .hashing import HASH_FAMILY

        manifest = {
            "partition_id": pid,
            # the hash backend that produced these partials — resume runs
            # whose backend changed treat this partition as NOT done and
            # recompute it (degrade-gracefully contract), instead of
            # hard-failing in the final fold after all work finished
            "hash_family": HASH_FAMILY,
            # input rows, if the caller provided them; else sum of the first
            # spec's per-group rows (each spec repeats the same row counts)
            "rows": int(pa.compute.sum(partials["rows"]).as_py() or 0)
            // max(1, len(set(partials["spec"].to_pylist()))),
            "n_partials": partials.num_rows,
            "payload_sha256": digest,
            **meta,
        }
        mtmp = os.path.join(self.manifest_dir, f"{pid}.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(self.manifest_dir, f"{pid}.json"))

    # -- read --------------------------------------------------------------
    def done_partitions(self) -> set[str]:
        from .hashing import HASH_FAMILY

        done = set()
        for name in os.listdir(self.manifest_dir):
            if not name.endswith(".json"):
                continue
            pid = name[: -len(".json")]
            path = os.path.join(self.partials_dir, f"part-{pid}.parquet")
            try:
                with open(os.path.join(self.manifest_dir, name)) as f:
                    manifest = json.load(f)
                sch = pq.read_schema(path)
                # schema-incompatible partials (e.g. written by an older
                # engine version without the hash-family column) degrade
                # to recompute HERE, before the skip decision — otherwise
                # the final concat/fold would crash after skipping them
                from .udaf import PARTIAL_SCHEMA

                if set(PARTIAL_SCHEMA.names) - set(sch.names):
                    continue
                # hash-backend drift between submit and resume (e.g. a
                # polars upgrade): hash-fed partials from the old family
                # cannot merge with new ones — recompute, don't hard-fail
                # in the final fold. Manifests predating the hash_family
                # key fall back to the partial's own family column.
                family = manifest.get("hash_family")
                if family is None:
                    fams = set(
                        pq.read_table(path, columns=["family"])["family"].to_pylist()
                    )
                    if fams and fams != {HASH_FAMILY}:
                        continue
                elif family != HASH_FAMILY:
                    continue
            except Exception:
                continue  # degrade gracefully: recompute this partition
            done.add(pid)
        return done

    def load_partials(self) -> pa.Table:
        from .udaf import PARTIAL_SCHEMA

        files = sorted(
            os.path.join(self.partials_dir, n)
            for n in os.listdir(self.partials_dir)
            if n.endswith(".parquet")
        )
        tables = []
        for f in files:
            # stale files from an incompatible engine version are ignored
            # (their partitions were recomputed; see done_partitions)
            if set(PARTIAL_SCHEMA.names) - set(pq.read_schema(f).names):
                continue
            tables.append(pq.read_table(f))
        return pa.concat_tables(tables)

    def manifests(self) -> list[dict[str, Any]]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out

    def metrics_summary(self) -> dict[str, Any]:
        ms = self.manifests()
        if not ms:
            return {"partitions": 0}
        walls = np.array([m.get("wall_sec", 0.0) for m in ms])
        return {
            "partitions": len(ms),
            "rows": int(sum(m["rows"] for m in ms)),
            "wall_p50": float(np.percentile(walls, 50)),
            "wall_p99": float(np.percentile(walls, 99)),
            "wall_max": float(walls.max()),
        }


def _build_shard_partials(
    shard_path: str,
    specs: list[SketchSpec],
    group_key: str | None,
    derive: Any | None,
) -> tuple[pa.Table, int]:
    t = pq.read_table(shard_path)
    if derive is not None:
        t = derive(t)
    return partials_for_block(t, specs, group_key), t.num_rows


def run_with_checkpoint(
    shard_paths: list[str],
    specs: list[SketchSpec],
    store: CheckpointStore,
    group_key: str | None = None,
    derive: Any | None = None,
    max_in_flight: int = 16,
) -> dict[tuple[str, str], Any]:
    """Process shards (skipping finished ones), persist partials + lineage,
    then fold all partials into final sketches ``{(group, spec): sketch}``.

    Deterministic per shard → the resumed run's final estimates are
    bit-identical to an uninterrupted run.
    """
    import ray

    done = store.done_partitions()
    remote_fn = ray.remote(num_cpus=1)(_build_shard_partials)
    pending: dict[Any, tuple[str, str, float]] = {}
    todo = [
        (pid, p)
        for p in shard_paths
        if (pid := shard_partition_id(p)) not in done
    ]
    idx = 0
    while idx < len(todo) or pending:
        while idx < len(todo) and len(pending) < max_in_flight:
            pid, path = todo[idx]
            ref = remote_fn.remote(path, specs, group_key, derive)
            pending[ref] = (pid, path, time.monotonic())
            idx += 1
        ready, _ = ray.wait(list(pending), num_returns=1)
        for ref in ready:
            pid, path, t0 = pending.pop(ref)
            partials, n_rows = ray.get(ref)
            store.write_partition(
                pid,
                partials,
                {"input_file": path, "input_rows": n_rows, "wall_sec": time.monotonic() - t0},
            )

    # final fold over all persisted partials (bulk merge per key)
    from .udaf import check_family, merge_payloads_obj

    table = store.load_partials()
    buckets: dict[tuple[str, str], list[bytes]] = {}
    kinds: dict[tuple[str, str], str] = {}
    families: set[str] = set()
    for row in table.to_pylist():
        key = (row["group"], row["spec"])
        buckets.setdefault(key, []).append(row["payload"])
        kinds[key] = row["kind"]
        families.add(row["family"])
    if families:
        # a resumed run whose hash backend changed (e.g. polars upgraded
        # between submit and resume) must recompute, not silently merge
        check_family(families)
    return {k: merge_payloads_obj(kinds[k], v) for k, v in buckets.items()}
