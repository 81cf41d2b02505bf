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
    directory (``cleanup``).

    Formats: ``csv`` / ``jsonl`` (Ray native writers/readers), ``ipc``
    (Arrow IPC/Feather files — full Arrow schema fidelity incl.
    timestamps, one file per block written inside ``map_batches``),
    ``gzip_jsonl`` (the Ray JSON writer's files gzip-compressed in a
    fan-out pass, read back via the reader's gzip stream option — the
    form most JSONL corpora actually arrive in; value fidelity is
    identical to plain ``jsonl`` since the bytes under the codec are)."""
    import ray.data as rd

    if fmt not in ("csv", "jsonl", "ipc", "gzip_jsonl"):
        raise ValueError(f"unknown source format {fmt!r}")
    path = os.path.join(root, f"{fmt}_{os.getpid()}_{uuid.uuid4().hex[:8]}")
    if fmt == "csv":
        ds.write_csv(path)
        return rd.read_csv(path), path
    if fmt == "jsonl":
        ds.write_json(path)
        return rd.read_json(path), path
    if fmt == "ipc":
        os.makedirs(path, exist_ok=True)

        def write_block(b):
            import pyarrow as pa

            f = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
            with pa.OSFile(f, "wb") as sink:
                with pa.ipc.new_file(sink, b.schema) as w:
                    w.write_table(b)
            return pa.table({"path": pa.array([f], pa.string())})

        # consume the writer pass fully (the paths table is tiny)
        ds.map_batches(write_block, batch_format="pyarrow").materialize()
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".arrow"))

        def read_files(batch):
            import pyarrow as pa

            tbls = [pa.ipc.open_file(pa.memory_map(f)).read_all()
                    for f in batch["item"].to_pylist()]
            return pa.concat_tables(tbls)

        back = rd.from_items(
            files, override_num_blocks=min(len(files), 32)
        ).map_batches(read_files, batch_format="pyarrow")
        return back, path
    # gzip_jsonl: stage plain JSONL, compress each part in a fan-out map
    ds.write_json(path)
    plain = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if not f.endswith(".gz"))

    def compress(batch):
        import gzip

        import pyarrow as pa

        out = []
        for f in batch["item"].to_pylist():
            gz = f + ".gz"
            with open(f, "rb") as src, gzip.open(gz, "wb") as dst:
                shutil.copyfileobj(src, dst)
            os.remove(f)
            out.append(gz)
        return pa.table({"path": pa.array(out, pa.string())})

    import ray.data as _rd

    _rd.from_items(plain, override_num_blocks=min(len(plain), 32)) \
        .map_batches(compress, batch_format="pyarrow").materialize()
    gz_files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".gz"))
    back = rd.read_json(
        gz_files, arrow_open_stream_args={"compression": "gzip"})
    return back, path


def cleanup(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


def read_union_by_name(paths: list[str]):
    """One Dataset over several parquet directories/files whose schemas
    EVOLVED — later shards add columns older shards lack (the normal
    life of a long-lived 100-TB sink). Columns are unified BY NAME:
    the union schema is computed from footers only (one driver-side
    ``pq.read_schema`` per file — no data read), each shard group is
    read with its own reader, missing columns materialize as typed
    nulls inside ``map_batches``, and ONE ``union(*rest)`` call stitches
    the groups (chaining ``.union()`` per input builds a deep plan —
    the Ray 2.49 lesson). Same-named columns must agree on type —
    conflicting evolution refuses loudly rather than silently casting."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    if not paths:
        raise ValueError("read_union_by_name: no paths")

    def files_of(p: str) -> list[str]:
        if os.path.isdir(p):
            return sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.endswith(".parquet") and not f.startswith("_"))
        return [p]

    groups = [files_of(p) for p in paths]
    unified: dict[str, pa.DataType] = {}
    group_schemas = []
    for fl in groups:
        if not fl:
            raise FileNotFoundError("read_union_by_name: empty path")
        sch = pq.read_schema(fl[0])
        group_schemas.append(sch)
        for f in sch:
            prev = unified.get(f.name)
            if prev is not None and prev != f.type:
                raise ValueError(
                    f"read_union_by_name: column {f.name!r} evolved "
                    f"incompatibly ({prev} vs {f.type})")
            unified.setdefault(f.name, f.type)
    names = list(unified)
    target = pa.schema([(n, unified[n]) for n in names])

    def align(batch: pa.Table) -> pa.Table:
        cols = []
        for n in names:
            if n in batch.column_names:
                cols.append(batch[n].cast(unified[n]))
            else:
                cols.append(pa.nulls(batch.num_rows, unified[n]))
        return pa.table(dict(zip(names, cols)), schema=target)

    parts = [rd.read_parquet(fl).map_batches(align, batch_format="pyarrow")
             for fl in groups]
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
