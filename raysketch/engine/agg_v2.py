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
        return sk.to_bytes()

    def combine(self, current: bytes, new: bytes) -> bytes:
        from .udaf import merge_payloads

        return merge_payloads(self._kind, [current, new])

    def finalize(self, accumulator: bytes):
        if self._raw:
            return accumulator
        return SKETCH_KINDS[self._kind].from_bytes(accumulator).result()


class _ZeroPayload:
    """Picklable zero factory: a fresh empty sketch's payload."""

    def __init__(self, factory: Callable[[], Any]) -> None:
        self._factory = factory

    def __call__(self) -> bytes:
        return self._factory().to_bytes()
