"""The mergeable-UDAF protocol every sketch implements.

This is the engine's single plugin surface (SURVEY.md §2.8): any object
implementing it plugs into ``raysketch.engine`` grouped/global aggregation.
The contract mirrors the map/combine/finalize shape of a distributed
aggregate:

- ``update_batch(values)`` — absorb a whole Arrow/numpy chunk (map side).
- ``merge(other)`` — associative combine of two partials (reduce side).
- ``to_bytes()/from_bytes()`` — canonical little-endian codec used for the
  partial shuffle, checkpoints and golden-file tests (the reference's
  serialize/deserialize discipline, e.g. library/src/cm_sketch.c:138-184).
- ``result()`` — finalize into a plain-Python summary.

Determinism requirements (retry safety on a real cluster): no wall clock,
no unseeded randomness, fixed hash seeds — a re-executed block must produce
a bit-identical partial.
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class SketchUDAF(Protocol):
    """Protocol for mergeable sketch aggregates."""

    #: short kind tag used in serialized payload envelopes / result tables
    kind: str

    def update_batch(self, values: Any) -> None:  # pragma: no cover - protocol
        ...

    def merge(self, other: "SketchUDAF") -> "SketchUDAF":  # pragma: no cover
        ...

    def to_bytes(self) -> bytes:  # pragma: no cover - protocol
        ...

    def result(self) -> dict[str, Any]:  # pragma: no cover - protocol
        ...


class CodecError(ValueError):
    """Raised when from_bytes sees an incompatible buffer.

    Mirrors the reference's deserialize error taxonomy (bad length / bad
    count / mismatched params — library/src/p2.c:164-244). Engine policy on
    checkpoint restore: catch this and recompute the partition rather than
    abort (the reference's degrade-gracefully choice, lua_binding/
    cm_sketch.c:166-173).
    """
