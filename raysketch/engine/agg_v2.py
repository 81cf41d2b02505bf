"""Ray-Data-native sketch aggregation: AggregateFnV2 adapter.

Exposes every sketch UDAF through the idiomatic Dataset API —

    ds.aggregate(SketchAgg(lambda: HyperLogLog(14), on="path"))
    ds.groupby("lang").aggregate(SketchAgg(..., on="path"))

Ray Data drives the same map/combine/finalize contract the engine's own
``sketch_aggregate`` implements (per-block partial → pairwise combine →
finalize); the accumulator type is the sketch's serialized payload, so
Ray's shuffle of partial states ships the sparse codecs, not Python
objects. Use ``sketch_aggregate`` when you want the tree merge / salted
shuffle / checkpointing; use this adapter when composing with other
native aggregations (Count, Sum, ...) in one ``.aggregate(...)`` call.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor

from ..sketches import SKETCH_KINDS


def _wrap(payload: bytes) -> bytes:
    """Prefix the payload with this process's hash-family tag so partials
    built under different backends refuse to merge (same contract as the
    engine's partial envelope; see engine.hashing.HASH_FAMILY)."""
    from .hashing import HASH_FAMILY

    fam = HASH_FAMILY.encode()
    return len(fam).to_bytes(2, "little") + fam + payload


def _unwrap(buf: bytes) -> tuple[str, bytes]:
    n = int.from_bytes(buf[:2], "little")
    return buf[2:2 + n].decode(), buf[2 + n:]


class SketchAgg(AggregateFnV2):
    """Aggregate a column into a mergeable sketch; the output cell is the
    sketch's ``result()`` dict (set ``raw_bytes=True`` for the serialized
    sketch instead — e.g. to keep merging downstream)."""

    def __init__(
        self,
        factory: Callable[[], Any],
        on: str,
        alias_name: Optional[str] = None,
        raw_bytes: bool = False,
    ):
        self._factory = factory
        self._kind = factory().kind
        self._raw = raw_bytes
        super().__init__(
            alias_name or f"{self._kind}({on})",
            on=on,
            ignore_nulls=True,
            zero_factory=_ZeroPayload(factory),
        )

    def aggregate_block(self, block: Block) -> bytes:
        table = BlockAccessor.for_block(block).to_arrow()
        sk = self._factory()
        sk.update_batch(table[self._target_col_name])
        return _wrap(sk.to_bytes())

    def combine(self, current: bytes, new: bytes) -> bytes:
        from .udaf import check_family, merge_payloads

        fam_a, pay_a = _unwrap(current)
        fam_b, pay_b = _unwrap(new)
        check_family([fam_a, fam_b])
        return _wrap(merge_payloads(self._kind, [pay_a, pay_b]))

    def finalize(self, accumulator: bytes):
        _, payload = _unwrap(accumulator)
        if self._raw:
            return payload
        return SKETCH_KINDS[self._kind].from_bytes(payload).result()


class _ZeroPayload:
    """Picklable zero factory: a fresh empty sketch's payload."""

    def __init__(self, factory: Callable[[], Any]) -> None:
        self._factory = factory

    def __call__(self) -> bytes:
        return _wrap(self._factory().to_bytes())
