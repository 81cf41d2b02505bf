"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (nor in raysketch) calls ray.init()/ray.shutdown().

- ``entry()`` — flagship per-lang sketch profile over sf0.001.
- ``queries()`` — every implemented operator/pipeline (SURVEY.md §2 +
  the training-data ops), keyed by name; each callable takes sf_dir.
- ``oracle_sql()`` — DuckDB-equivalent SQL for the exactly-checkable
  subset; sketch/approximate/streaming ops are rows-only by design
  (estimates cannot equal SQL exact answers except where provably exact
  — those, e.g. sparse-mode HLL, ARE oracle-gated).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    from raysketch.engine.pipeline import corpus_profile_from_dir

    return corpus_profile_from_dir("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from raysketch.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from raysketch.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
