"""Dead-letter (quarantine) channel: a validation stage that routes
invalid rows to a side parquet sink instead of failing the job or
silently dropping them — the production ingest pattern the reference's
host harness handles with Lua error returns (SURVEY.md §3: luasandbox
aborts the sandbox on error; a distributed engine must instead keep the
good rows flowing and preserve the bad ones for inspection/replay).

Mechanics: the validator is a vectorized per-batch predicate; each map
task writes its batch's invalid rows (plus a ``_reason`` column) to
``quarantine_dir/part-<sha256 of the row ids>.parquet`` — the
content-derived filename makes the side write IDEMPOTENT under Ray task
retries (a re-executed task overwrites the same file rather than
duplicating rows; the at-least-once side channel becomes exactly-once
on read). Valid rows stream on unchanged. ``read_quarantine`` returns a
Dataset over the side files."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def quarantine_invalid(
    ds,
    validator,
    quarantine_dir: str,
    id_col: str,
    reason: str = "validation_failed",
):
    """``validator(batch) -> bool ndarray`` (True = keep). Returns the
    valid-rows Dataset; invalid rows land under ``quarantine_dir``."""
    os.makedirs(quarantine_dir, exist_ok=True)

    def split(batch: pa.Table) -> pa.Table:
        keep = np.asarray(validator(batch), dtype=bool)
        if keep.all():
            return batch
        bad = batch.filter(pa.array(~keep))
        bad = bad.append_column(
            "_reason", pa.array([reason] * bad.num_rows, pa.string())
        )
        ids = bad[id_col].to_pylist()
        digest = hashlib.sha256(
            (",".join(str(i) for i in sorted(ids))).encode()
        ).hexdigest()[:16]
        # per-writer UNIQUE tmp: a speculative re-execution racing the
        # original must not interleave bytes in one tmp file — each
        # writes its own, and the atomic replace publishes a complete
        # file either way (same digest → same final name, last wins)
        import uuid

        tmp = os.path.join(
            quarantine_dir, f".part-{digest}-{os.getpid()}-{uuid.uuid4().hex[:8]}.tmp"
        )
        pq.write_table(bad, tmp)
        os.replace(tmp, os.path.join(quarantine_dir, f"part-{digest}.parquet"))
        return batch.filter(pa.array(keep))

    return ds.map_batches(split, batch_format="pyarrow")


def read_quarantine(quarantine_dir: str):
    """Dataset over the dead-letter rows (empty Dataset if none)."""
    import ray.data as rd

    files = [
        os.path.join(quarantine_dir, f)
        for f in sorted(os.listdir(quarantine_dir))
        if f.endswith(".parquet")
    ] if os.path.isdir(quarantine_dir) else []
    if not files:
        return rd.from_arrow(pa.table({"_reason": pa.array([], pa.string())}))
    return rd.read_parquet(files)
