"""Text sources (CSV / JSONL) — the non-parquet half of the engine's
source surface (SURVEY.md §2.8: the reference library does no I/O; the
luasandbox host feeds it text protocols, which at engine level are
delimited files read by ``ray.data.read_csv`` / ``read_json``).

At corpus scale these readers consume files some upstream system wrote.
For the oracle-gated source queries the engine first WRITES the staging
files itself (``Dataset.write_csv`` / ``write_json``, one part file per
block) and then reads them back, so the gate covers the full
bytes-on-disk round trip: a lossy writer OR reader breaks value parity
with the parquet-derived SQL oracle. Measured fidelity (tests pin it):
CSV round-trips int64/double/string/timestamp[us] bit-exactly; JSON
round-trips int64/double/string but NOT timestamps (epoch-int
resurfacing) — JSONL pipelines must carry integer epochs explicitly.
"""

from __future__ import annotations

import os
import shutil
import uuid


def stage_and_read(ds, fmt: str, root: str = "/tmp/raysketch_sources"):
    """Write ``ds`` as a directory of ``fmt`` part files and return
    ``(read_back_dataset, path)``. The path is unique per invocation
    (uuid — concurrent sessions over the same corpus must not collide);
    the CALLER consumes the returned Dataset fully, then removes the
    directory (``cleanup``)."""
    import ray.data as rd

    if fmt not in ("csv", "jsonl"):
        raise ValueError(f"unknown source format {fmt!r}")
    path = os.path.join(root, f"{fmt}_{os.getpid()}_{uuid.uuid4().hex[:8]}")
    if fmt == "csv":
        ds.write_csv(path)
        return rd.read_csv(path), path
    ds.write_json(path)
    return rd.read_json(path), path


def cleanup(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
