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
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

SUCCESS_MARKER = "_SUCCESS"


def write_dataset(ds, path: str, partition_cols: list[str] | None = None) -> str:
    """Distributed sink: one parquet file per block under ``path``
    (overwrite semantics: any previous output at ``path`` is replaced).
    ``partition_cols`` writes hive-style key directories
    (``path/col=value/...``) so a re-run or downstream consumer can skip
    or target finished key ranges.

    Publication is ATOMIC: blocks write into a staging directory next to
    ``path``; only after every block lands is a ``_SUCCESS`` marker
    written and the staging dir renamed into place. A crash mid-write
    leaves a ``.staging-*`` dir that ``read_back`` never sees (and a
    later successful write cleans up); a crash between rmtree and rename
    leaves no ``path`` at all — never a half-written directory that
    parses as complete."""
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    staging = os.path.join(
        parent, f".staging-{os.path.basename(path)}-{uuid.uuid4().hex[:12]}"
    )
    # prune orphans from earlier crashed writes of the SAME target only —
    # match the exact ".staging-<basename>-<12 hex>" shape so a sibling
    # target whose basename extends this one (pairs vs pairs-v2) never
    # has its live staging dir deleted mid-write
    import re

    orphan = re.compile(
        re.escape(f".staging-{os.path.basename(path)}-") + r"[0-9a-f]{12}$"
    )
    for name in os.listdir(parent):
        if orphan.fullmatch(name):
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)
    os.makedirs(staging)
    try:
        if partition_cols:
            ds.write_parquet(staging, partition_cols=partition_cols)
        else:
            ds.write_parquet(staging)
        with open(os.path.join(staging, SUCCESS_MARKER), "w") as f:
            f.write("ok\n")
        shutil.rmtree(path, ignore_errors=True)
        os.rename(staging, path)  # atomic publish (same filesystem)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return path


def write_table(table: pa.Table, path: str) -> str:
    """Driver-sized result sink: a single parquet file (atomic publish)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def read_back(path: str):
    """Dataset over a sink output (directory of part files or one file).

    Directory outputs must carry the ``_SUCCESS`` marker
    :func:`write_dataset` publishes — a directory without it is a
    partial/crashed write and is refused rather than read as complete."""
    import ray.data as rd

    if os.path.isdir(path) and not os.path.exists(
        os.path.join(path, SUCCESS_MARKER)
    ):
        raise FileNotFoundError(
            f"{path}: no {SUCCESS_MARKER} marker — incomplete sink output "
            "(crashed write or a directory not produced by write_dataset)"
        )
    return rd.read_parquet(
        path, file_extensions=["parquet"]
    )


def read_partition(path: str, col: str, value) -> "object":
    """Partition-pruned read of ONE hive key directory of a
    :func:`write_dataset` output written with ``partition_cols=[col]``:
    only ``path/col=value/`` leaves storage — the scale contract for
    resumable/targeted consumption (skip finished partitions, re-read
    one key). The root ``_SUCCESS`` marker is still required, so a
    partial write can never serve a "complete" partition."""
    import ray.data as rd

    from urllib.parse import quote

    if not os.path.exists(os.path.join(path, SUCCESS_MARKER)):
        raise FileNotFoundError(f"{path}: no {SUCCESS_MARKER} marker")
    # the hive writer URL-encodes partition values ('a b' -> 'a%20b');
    # quote to match, else real partitions with spaces/'='/'%' miss
    sub = os.path.join(path, f"{col}={quote(str(value), safe='')}")
    if not os.path.isdir(sub):
        raise FileNotFoundError(f"{sub}: no such partition")
    return rd.read_parquet(sub, file_extensions=["parquet"])


def parquet_files(path: str) -> list[str]:
    """All DATA .parquet leaf files under a sink output (sorted).
    Underscore-prefixed files (_zonemap/_bloommap manifests) are
    metadata, not data — counting or footer-scanning them would
    corrupt compaction accounting and manifest builds."""
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in files
                   if f.endswith(".parquet") and not f.startswith("_"))
    return sorted(out)


def compact_dataset(path: str, out_path: str,
                    target_files: int) -> dict[str, int]:
    """Small-file compaction (the lakehouse OPTIMIZE primitive): read a
    sink output back and rewrite it as ~``target_files`` parquet files,
    preserving every row. A long-running ingest leaves one file per
    block per micro-batch; metadata-bound readers want few large files
    — at warehouse scale run this per partition directory so each
    compaction is an independent, resumable unit.

    Streaming repartition + the atomic staged write (``write_dataset``)
    — a crash mid-compaction leaves the source untouched and no
    readable half-output. Returns ``{"files_before", "files_after",
    "n_rows"}``; content equality is the caller's oracle to check
    (row-level checksums survive because rows are moved, never
    transformed)."""
    if target_files < 1:
        raise ValueError("target_files must be >= 1")
    before = len(parquet_files(path))
    ds = read_back(path).repartition(target_files)
    write_dataset(ds, out_path)
    after = len(parquet_files(out_path))
    n_rows = read_back(out_path).count()
    return {"files_before": before, "files_after": after,
            "n_rows": int(n_rows)}


def write_zone_map(path: str, cols: list[str],
                   incremental: bool = False) -> str:
    """Build a per-FILE zone map — (file, column, vmin, vmax, nulls,
    rows) — for a sink output and publish it atomically as
    ``path/_zonemap.parquet``. The stats come from the parquet FOOTERS
    (row-group statistics the writer already embedded), so building the
    map is metadata-bound: no data pages are read at any corpus size.
    Footer reads fan out as a Ray Data pass over the file list. Columns
    must be numeric/temporal (zone bounds are stored as float64 —
    exact for ints up to 2^53; timestamps use epoch-us).

    ``incremental=True`` footer-scans ONLY files absent from the
    existing manifest and unions them in (entries whose files vanished
    are dropped) — the nightly-append refresh that keeps manifest
    maintenance O(new files) instead of O(all files) at warehouse
    scale. Requires the same ``cols`` as the base build."""
    import pyarrow.parquet as pq
    import ray.data as rd

    files = parquet_files(path)
    if not files:
        raise FileNotFoundError(f"{path}: no parquet files")
    prev = None
    if incremental:
        zpath = os.path.join(path, "_zonemap.parquet")
        if os.path.exists(zpath):
            prev = pq.read_table(zpath).to_pandas()
            if sorted(prev["column"].unique()) != sorted(cols):
                raise ValueError(
                    "write_zone_map(incremental): column set differs "
                    "from the existing manifest — rebuild from scratch")
            rel = {os.path.relpath(f, path) for f in files}
            prev = prev[prev["file"].isin(rel)]  # drop vanished files
            known = set(prev["file"])
            files = [f for f in files
                     if os.path.relpath(f, path) not in known]
            if not files:
                import pandas as _pd

                target = zpath
                tmp = f"{target}.tmp-{os.getpid()}"
                pq.write_table(pa.Table.from_pandas(
                    prev.sort_values(["file", "column"])
                    .reset_index(drop=True), preserve_index=False), tmp)
                os.replace(tmp, target)
                return target

    def footers(batch: "pa.Table") -> "pa.Table":
        import pyarrow.parquet as pq

        out = {"file": [], "column": [], "vmin": [], "vmax": [],
               "nulls": [], "rows": []}
        for f in batch["item"].to_pylist():
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(j).name: j
                   for j in range(md.num_columns)}
            for c in cols:
                if c not in idx:
                    raise KeyError(f"{f}: no column {c!r}")
                vmin = vmax = None
                nulls = 0
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(idx[c]).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"{f}: no statistics for {c!r}")
                    mn, mx = st.min, st.max
                    if hasattr(mn, "timestamp"):  # datetime → epoch-us
                        mn = int(mn.timestamp() * 1e6)
                        mx = int(mx.timestamp() * 1e6)
                    vmin = mn if vmin is None else min(vmin, mn)
                    vmax = mx if vmax is None else max(vmax, mx)
                    nulls += st.null_count or 0
                out["file"].append(os.path.relpath(f, path))
                out["column"].append(c)
                out["vmin"].append(float(vmin))
                out["vmax"].append(float(vmax))
                out["nulls"].append(int(nulls))
                out["rows"].append(int(md.num_rows))
        return pa.table({
            "file": pa.array(out["file"], pa.string()),
            "column": pa.array(out["column"], pa.string()),
            "vmin": pa.array(out["vmin"], pa.float64()),
            "vmax": pa.array(out["vmax"], pa.float64()),
            "nulls": pa.array(out["nulls"], pa.int64()),
            "rows": pa.array(out["rows"], pa.int64())})

    zm = (rd.from_items(files, override_num_blocks=min(len(files), 32))
          .map_batches(footers, batch_format="pyarrow").to_pandas())
    if prev is not None:
        import pandas as _pd

        zm = _pd.concat([prev, zm], ignore_index=True)
    target = os.path.join(path, "_zonemap.parquet")
    tmp = f"{target}.tmp-{os.getpid()}"
    pq.write_table(
        pa.Table.from_pandas(zm.sort_values(["file", "column"])
                             .reset_index(drop=True),
                             preserve_index=False), tmp)
    os.replace(tmp, target)
    return target


def _check_manifest_fresh(path: str, manifest_files, kind: str) -> None:
    """A stale file-skipping manifest is SILENT WRONGNESS: files added
    (or removed) after the manifest was built are invisible to pruning,
    so a point/range read would quietly drop their rows. Refuse loudly
    when the sink's current parquet file set differs from the manifest's
    — the caller rebuilds the manifest (cheap: footers/key column only)."""
    current = {os.path.relpath(f, path) for f in parquet_files(path)}
    known = set(manifest_files)
    if current != known:
        extra = sorted(current - known)[:3]
        gone = sorted(known - current)[:3]
        raise RuntimeError(
            f"{path}: {kind} manifest is STALE (files added {extra} / "
            f"removed {gone}); rebuild it before pruned reads")


def read_pruned_range(path: str, col: str, lo, hi):
    """Zone-map file skipping: a Dataset over ONLY the files whose
    ``[vmin, vmax]`` zone for ``col`` overlaps ``[lo, hi]`` — the
    metadata-only pruning step a warehouse scan runs before touching
    data (zones are necessary, not sufficient: the caller still
    applies the residual row filter). Requires a prior
    :func:`write_zone_map`. Returns ``(dataset_or_None,
    files_scanned, files_total)`` — None when every file prunes."""
    import pyarrow.parquet as pq
    import ray.data as rd

    zpath = os.path.join(path, "_zonemap.parquet")
    if not os.path.exists(zpath):
        raise FileNotFoundError(f"{zpath}: run write_zone_map first")
    zm = pq.read_table(zpath).to_pandas()
    _check_manifest_fresh(path, zm["file"].unique(), "zone-map")
    zm = zm[zm["column"] == col]
    if zm.empty:
        raise KeyError(f"zone map has no column {col!r}")
    keep = zm[(zm["vmax"] >= float(lo)) & (zm["vmin"] <= float(hi))]
    total = len(zm)
    if keep.empty:
        return None, 0, total
    files = [os.path.join(path, f) for f in keep["file"]]
    return rd.read_parquet(files), len(files), total


def write_bloom_manifest(path: str, col: str, fpr: float = 0.01) -> str:
    """Build a per-FILE Bloom-filter manifest over ``col`` for a sink
    output and publish it atomically as ``path/_bloommap.parquet`` —
    the point-lookup complement of :func:`write_zone_map` (zones prune
    RANGES; Blooms prune KEY PROBES even when every file's min/max
    straddles the key). One Ray Data pass fans out over the file list;
    each task reads ONLY the key column of its files and serializes a
    capacity-sized filter (bits, not keys). Probing is one-sided: a
    Bloom hit may be false (the caller keeps its residual filter), a
    miss is certain — pruning never drops a qualifying row."""
    import ray.data as rd

    from ..engine.hashing import hash64_batch
    from ..sketches.bloom import BloomFilter

    files = parquet_files(path)
    if not files:
        raise FileNotFoundError(f"{path}: no parquet files")

    def build(batch: "pa.Table") -> "pa.Table":
        names, payloads, rows = [], [], []
        for f in batch["item"].to_pylist():
            t = pq.read_table(f, columns=[col])
            bf = BloomFilter(capacity=max(t.num_rows, 1), fpr=fpr)
            bf.update_hashes(hash64_batch(t[col]))
            names.append(os.path.relpath(f, path))
            payloads.append(bf.to_bytes())
            rows.append(t.num_rows)
        return pa.table({
            "file": pa.array(names, pa.string()),
            "rows": pa.array(rows, pa.int64()),
            "bloom": pa.array(payloads, pa.binary())})

    man = (rd.from_items(files, override_num_blocks=min(len(files), 32))
           .map_batches(build, batch_format="pyarrow").to_pandas())
    target = os.path.join(path, "_bloommap.parquet")
    tmp = f"{target}.tmp-{os.getpid()}"
    pq.write_table(
        pa.Table.from_pandas(man.sort_values("file").reset_index(drop=True),
                             preserve_index=False), tmp)
    os.replace(tmp, target)
    return target


def read_bloom_pruned(path: str, col: str, keys):
    """Bloom-manifest file skipping: a Dataset over ONLY the files
    whose per-file Bloom filter hits at least one probe key — the
    point-lookup scan that opens a handful of files out of a
    100 TB sink. Requires a prior :func:`write_bloom_manifest` on the
    same column; probe keys hash through the SAME vectorized hash64
    family the build used (normalized via one Arrow array, so list
    and column inputs hash identically). Returns
    ``(dataset_or_None, files_scanned, files_total)``. The caller
    applies the residual ``col IN keys`` row filter — Bloom false
    positives only add files, never rows."""
    import ray.data as rd

    from ..engine.hashing import hash64_batch
    from ..sketches.bloom import BloomFilter

    mpath = os.path.join(path, "_bloommap.parquet")
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"{mpath}: run write_bloom_manifest first")
    man = pq.read_table(mpath)
    _check_manifest_fresh(path, man["file"].to_pylist(), "bloom")
    key_hashes = hash64_batch(pa.array(list(keys)))
    keep = []
    for name, payload in zip(man["file"].to_pylist(),
                             man["bloom"].to_pylist()):
        bf = BloomFilter.from_bytes(payload)
        if bool(bf.contains_hashes(key_hashes).any()):
            keep.append(os.path.join(path, name))
    total = man.num_rows
    if not keep:
        return None, 0, total
    return rd.read_parquet(keep), len(keep), total


def write_version(ds, root: str) -> int:
    """Append one SNAPSHOT VERSION of a dataset under ``root`` — the
    time-travel sink: each call writes a full ``v=N`` directory and
    commits it atomically (stage dir → one ``os.rename`` → ``_SUCCESS``
    marker), so readers never observe a half-written snapshot and a
    crashed write leaves only an ignorable stage dir. Returns the
    committed version number. Version-number races between concurrent
    writers resolve by compare-and-swap: ``os.rename`` onto an existing
    ``v=N`` directory fails atomically (POSIX ENOTEMPTY/EEXIST) and the
    loser retries with the next number — the staged data is written
    ONCE, only the rename retries. The next number is picked from ALL
    ``v=N`` directories present, committed or not: an UNCOMMITTED
    leftover (a writer that crashed between rename and ``_SUCCESS``)
    must be skipped past, not retried forever — readers still ignore it
    via :func:`list_versions`."""
    import uuid as _uuid

    os.makedirs(root, exist_ok=True)
    stage = os.path.join(root, f"_stage-{os.getpid()}-{_uuid.uuid4().hex[:8]}")
    ds.write_parquet(stage)
    while True:
        existing = _all_version_dirs(root)
        ver = (max(existing) + 1) if existing else 1
        final = os.path.join(root, f"v={ver}")
        try:
            os.rename(stage, final)
        except OSError:
            if os.path.isdir(final):  # lost the race: retry next number
                continue
            raise
        break
    with open(os.path.join(final, SUCCESS_MARKER), "w"):
        pass
    return ver


def _all_version_dirs(root: str) -> list[int]:
    """Every ``v=N`` directory under ``root`` — committed or NOT.
    Version-number allocation must see uncommitted leftovers (a writer
    that crashed between rename and ``_SUCCESS``) or it would retry the
    same taken number forever; readers keep using :func:`list_versions`,
    which hides them."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("v=") and os.path.isdir(os.path.join(root, name)):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def list_versions(root: str) -> list[int]:
    """Committed snapshot versions under ``root`` (ascending): ``v=N``
    directories carrying the ``_SUCCESS`` marker; stage dirs and
    partial writes are invisible."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("v=") and os.path.exists(
                os.path.join(root, name, SUCCESS_MARKER)):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def read_version(root: str, version: int | None = None):
    """Dataset over one committed snapshot (default: the LATEST) — the
    time-travel read. Refuses unknown/uncommitted versions loudly."""
    import ray.data as rd

    vers = list_versions(root)
    if not vers:
        raise FileNotFoundError(f"{root}: no committed versions")
    ver = vers[-1] if version is None else version
    if ver not in vers:
        raise FileNotFoundError(
            f"{root}: version {ver} not committed (have {vers})")
    return rd.read_parquet(os.path.join(root, f"v={ver}"),
                           file_extensions=["parquet"])


def recover_tables(root: str, min_age_s: float = 60.0) -> str | None:
    """Recover ``root`` after a writer was HARD-KILLED inside
    :func:`write_tables_atomic`'s two-rename publish window (root
    renamed aside, staging not yet swung in). Preference order: a
    staging dir whose root ``_SUCCESS`` manifest exists is a COMPLETE
    new snapshot — promote the newest one (finishing the publish);
    otherwise restore the newest ``.old-*`` snapshot (rolling back).
    Returns which dir was promoted/restored, or None if ``root``
    already exists or nothing recoverable is found.

    ``min_age_s`` guards against racing a LIVE concurrent publisher
    whose root is legitimately absent for an instant between its two
    renames: only leftovers older than the threshold are touched
    (a live writer's window is micro-seconds; a crashed one's leftovers
    only age). Pass 0 for explicit manual recovery. Concurrent
    publishers to one root remain a single-writer-at-a-time contract,
    as with any directory-swap publish."""
    if os.path.exists(root):
        return None
    parent = os.path.dirname(os.path.abspath(root)) or "."
    base = os.path.basename(root)
    if not os.path.isdir(parent):
        return None
    import time as _time

    now = _time.time()

    def newest(prefix: str, committed_only: bool) -> str | None:
        cands = [os.path.join(parent, d) for d in os.listdir(parent)
                 if d.startswith(prefix)]
        if committed_only:
            cands = [c for c in cands
                     if os.path.exists(os.path.join(c, SUCCESS_MARKER))]
        cands = [c for c in cands
                 if now - os.path.getmtime(c) >= min_age_s]
        return max(cands, key=os.path.getmtime) if cands else None

    pick = newest(f".staging-{base}-", committed_only=True) \
        or newest(f".old-{base}-", committed_only=False)
    if pick is None:
        return None
    os.rename(pick, root)
    return pick


def write_tables_atomic(named_ds: dict, root: str) -> str:
    """CROSS-TABLE atomic publish: write several Datasets as
    ``root/<name>/`` directories that become visible TOGETHER or not at
    all — the multi-table snapshot a warehouse export needs (orders
    without their lineitems is corruption, not a partial result). All
    tables write into one staging root; a single manifest + rename
    publishes them, so a crash anywhere leaves no readable root.
    Readers use :func:`read_back` on ``root/<name>`` (each table dir
    carries its own marker) or check the root manifest."""
    import uuid as _uuid

    if not named_ds:
        raise ValueError("write_tables_atomic: no tables")
    recover_tables(root)  # heal a prior writer's kill window first
    parent = os.path.dirname(os.path.abspath(root)) or "."
    os.makedirs(parent, exist_ok=True)
    staging = os.path.join(
        parent, f".staging-{os.path.basename(root)}-{_uuid.uuid4().hex[:12]}")
    os.makedirs(staging)
    try:
        for name, ds in named_ds.items():
            sub = os.path.join(staging, name)
            ds.write_parquet(sub)
            with open(os.path.join(sub, SUCCESS_MARKER), "w"):
                pass
        with open(os.path.join(staging, SUCCESS_MARKER), "w") as f:
            f.write("\n".join(sorted(named_ds)) + "\n")
        # Publish via two renames: move the previous snapshot ASIDE
        # (rename, not delete), swing staging into place, then drop the
        # old copy. A publish-rename FAILURE restores the old snapshot
        # in-process; a hard kill BETWEEN the two renames leaves root
        # briefly absent with both copies intact on disk —
        # :func:`recover_tables` (also run on the next publish) promotes
        # the committed staging or restores the old snapshot. No window
        # loses both copies.
        old = None
        if os.path.exists(root):
            old = os.path.join(
                parent, f".old-{os.path.basename(root)}-{_uuid.uuid4().hex[:12]}")
            os.rename(root, old)
        try:
            os.rename(staging, root)
        except BaseException:
            if old is not None:
                os.rename(old, root)
            raise
        if old is not None:
            shutil.rmtree(old, ignore_errors=True)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return root
