"""Sketch aggregation specs and the partial-build / merge kernels.

The distributed shape (SURVEY.md §3, §7.3) is the map/combine/finalize of a
mergeable UDAF:

1. **map side** — ``build_partials``: one ``map_batches`` pass over the
   input Dataset with ``batch_size=None`` (whole zero-copy Arrow block per
   call), emitting ONE serialized partial per (block, group, spec). The
   sketch update is vectorized inside the block; the map side is therefore
   also the combiner — per-group row skew never reaches the shuffle, which
   only ever carries ``num_blocks × groups × specs`` KB-sized rows.
2. **reduce side** — ``merge_partials`` (driver tree-merge for small group
   cardinality) or ``merge_partials_ds`` (Dataset groupby merge, with an
   optional salted pre-level for very hot groups).

Partial rows are deterministic per block (fixed hash seeds, derandomized
compaction), so Ray's lineage-based task retry reproduces identical
partials (the reference's restart-safety discipline via serialized state,
lua_binding/cm_sketch.c:166-202, recast for tasks).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pyarrow as pa

from ..sketches import SKETCH_KINDS


@dataclass(frozen=True)
class SketchSpec:
    """One sketch aggregation over one column.

    ``factory`` must be a picklable zero-arg callable returning a fresh
    sketch (e.g. ``functools.partial(HyperLogLog, p=14)``).
    """

    name: str
    column: str
    factory: Callable[[], Any]
    kind: str = field(default="")

    def __post_init__(self) -> None:
        if not self.kind:
            object.__setattr__(self, "kind", self.factory().kind)


PARTIAL_SCHEMA = pa.schema(
    [
        ("group", pa.string()),
        ("spec", pa.string()),
        ("kind", pa.string()),
        ("payload", pa.large_binary()),
        ("rows", pa.int64()),
        # hash backend fingerprint of the building process: merges refuse
        # mismatched families (see engine.hashing.HASH_FAMILY)
        ("family", pa.string()),
    ]
)


def check_family(families) -> str:
    """Raise if partials built under different hash backends would merge."""
    fams = set(families)
    if len(fams) > 1:
        raise ValueError(
            f"refusing to merge sketch partials from mismatched hash "
            f"families {sorted(fams)}: estimates would be silently wrong "
            f"(heterogeneous polars/pandas versions across workers?)"
        )
    return next(iter(fams))


_HASH_FED_KINDS = {"hll", "bloom", "theta", "countsketch", "countingbloom"}  # fed precomputed 64-bit hashes


def partials_for_block(
    batch: pa.Table, specs: list[SketchSpec], group_key: str | None
) -> pa.Table:
    """Build one serialized partial per (group, spec) from one Arrow block.

    Shared work is hoisted to block level: each hash-fed column (HLL/Bloom)
    is hashed ONCE for the whole block, and rows are ordered by group with
    a single stable argsort — per-group updates are then zero-copy slices,
    not one filter scan per group value.
    """
    import pyarrow.compute as pc

    from .hashing import HASH_FAMILY, hash64_batch_aligned

    groups: list[str] = []
    spec_names: list[str] = []
    kinds: list[str] = []
    payloads: list[bytes] = []
    rows: list[int] = []

    if group_key is None:
        bounds = [("", np.arange(batch.num_rows, dtype=np.int64))]
    else:
        enc = pc.dictionary_encode(batch[group_key]).combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        labels = enc.dictionary.to_pylist()
        valid_rows = np.flatnonzero(~np.isnan(codes)) if codes.dtype.kind == "f" \
            else np.arange(codes.size)
        codes_i = codes[valid_rows].astype(np.int64)
        order = np.argsort(codes_i, kind="stable")
        sorted_rows = valid_rows[order]
        sorted_codes = codes_i[order]
        cuts = np.searchsorted(sorted_codes, np.arange(len(labels) + 1))
        bounds = [
            (str(labels[c]), sorted_rows[cuts[c]:cuts[c + 1]])
            for c in range(len(labels))
            if cuts[c + 1] > cuts[c]
        ]

    # hoisted per-block column work
    hashed: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    taken: dict[str, Any] = {}
    for spec in specs:
        if spec.kind in _HASH_FED_KINDS and spec.column not in hashed:
            hashed[spec.column] = hash64_batch_aligned(batch[spec.column])
        elif spec.kind not in _HASH_FED_KINDS and spec.column not in taken:
            taken[spec.column] = batch[spec.column].combine_chunks()

    for gval, idx in bounds:
        for spec in specs:
            sk = spec.factory()
            if spec.kind in _HASH_FED_KINDS:
                h, valid = hashed[spec.column]
                hs = h[idx]
                vs = valid[idx]
                sk.update_hashes(hs if vs.all() else hs[vs])
            else:
                sk.update_batch(taken[spec.column].take(pa.array(idx)))
            groups.append(gval)
            spec_names.append(spec.name)
            kinds.append(spec.kind)
            payloads.append(sk.to_bytes())
            rows.append(int(idx.size))

    return pa.Table.from_arrays(
        [
            pa.array(groups, pa.string()),
            pa.array(spec_names, pa.string()),
            pa.array(kinds, pa.string()),
            pa.array(payloads, pa.large_binary()),
            pa.array(rows, pa.int64()),
            pa.array([HASH_FAMILY] * len(groups), pa.string()),
        ],
        schema=PARTIAL_SCHEMA,
    )


class PartialBuilder:
    """Actor-pool form of the partial-build stage: spec factories unpickle
    and validate ONCE per actor (map_batches class UDF), every batch then
    runs the same vectorized ``partials_for_block``. Use through
    ``build_partials(..., concurrency=...)``."""

    def __init__(self, specs: list[SketchSpec], group_key: str | None) -> None:
        self.specs = specs
        self.group_key = group_key
        for s in specs:
            s.factory()  # fail fast in the actor, not per batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        return partials_for_block(batch, self.specs, self.group_key)


def merge_payloads(kind: str, payloads: list[bytes]) -> bytes:
    """Associative fold of serialized partials of one kind."""
    return merge_payloads_obj(kind, payloads).to_bytes()


def merge_payloads_obj(kind: str, payloads: list[bytes]) -> Any:
    """Fold serialized partials into a decoded sketch; uses the sketch's
    bulk ``merge_many`` fast path when it has one (sparse scatter-adds /
    single recompression instead of pairwise dense merges)."""
    cls = SKETCH_KINDS[kind]
    if hasattr(cls, "merge_many"):
        return cls.merge_many(payloads)
    acc = cls.from_bytes(payloads[0])
    for p in payloads[1:]:
        acc.merge(cls.from_bytes(p))
    return acc


def decode(kind: str, payload: bytes) -> Any:
    return SKETCH_KINDS[kind].from_bytes(payload)
