"""Result sinks (SURVEY §2.8): partitioned parquet outputs + read-back.

Query results leave the engine as PARQUET DIRECTORIES, one file per
block (``Dataset.write_parquet``) — never one giant file, so a re-run
can diff/skip finished outputs and downstream consumers read in
parallel. Driver-sized tables (top-k, per-group rollups) write a single
file via the table sink. ``read_back`` returns a Dataset over whatever
either sink wrote — the sink_roundtrip query's ORACLE comparison reads
the written files, closing the write-path loop.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


def write_dataset(ds, path: str, partition_cols: list[str] | None = None) -> str:
    """Distributed sink: one parquet file per block under ``path``
    (overwrite semantics: any previous output at ``path`` is replaced).
    ``partition_cols`` writes hive-style key directories
    (``path/col=value/...``) so a re-run or downstream consumer can skip
    or target finished key ranges."""
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    if partition_cols:
        ds.write_parquet(path, partition_cols=partition_cols)
    else:
        ds.write_parquet(path)
    return path


def write_table(table: pa.Table, path: str) -> str:
    """Driver-sized result sink: a single parquet file (atomic publish)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def read_back(path: str):
    """Dataset over a sink output (directory of part files or one file)."""
    import ray.data as rd

    return rd.read_parquet(path)
