"""Heavy hitters: CMS-scored top-k over a key column.

The reference ecosystem's "sparse mode" heavy-hitter tracking with
count-based decay (heka_message_monitor.lua:562-590) recast for batch:
each block emits (a) a CMS partial over ALL its keys and (b) its local
top candidates (2k by in-block count — any global heavy hitter is a local
heavy hitter in at least one block by pigeonhole when candidates ≥ k per
block). The merged CMS then scores the union of candidates and the top-k
by estimate wins (`sort(est desc, key asc).limit(k)` semantics,
deterministic tie-break).

Shuffle volume: one CMS partial + ≤2k candidate rows per block.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches.cms import CMSketch

_UNION_SCHEMA = pa.schema(
    [
        ("part_kind", pa.string()),  # "cand" | "cms"
        ("token", pa.string()),
        ("n", pa.int64()),
        ("payload", pa.large_binary()),
    ]
)


def _block_partials(
    batch: pa.Table, col: str, cand_per_block: int, epsilon: float, delta: float
) -> pa.Table:
    import pyarrow.compute as pc

    vals = batch[col]
    vc = pc.value_counts(vals)
    tokens = vc.field("values").to_pylist()
    counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = [i for i, t in enumerate(tokens) if t is not None]
    tokens = [tokens[i] for i in keep]
    counts = counts[keep]

    cms = CMSketch(epsilon, delta, fast_hash=True)
    cms.update_batch(vals)

    order = np.lexsort((np.array(tokens, dtype=object), -counts))[:cand_per_block]
    cand_tokens = [str(tokens[i]) for i in order]
    cand_counts = counts[order]

    return pa.Table.from_arrays(
        [
            pa.array(["cand"] * len(cand_tokens) + ["cms"], pa.string()),
            pa.array(cand_tokens + [""], pa.string()),
            pa.array(list(cand_counts) + [0], pa.int64()),
            pa.array([b""] * len(cand_tokens) + [cms.to_bytes()], pa.large_binary()),
        ],
        schema=_UNION_SCHEMA,
    )


def cms_topk(
    ds,
    col: str,
    k: int = 20,
    epsilon: float = 1e-4,
    delta: float = 1e-3,
    batch_size: int | None = None,
) -> pa.Table:
    """Top-k values of ``col`` by merged-CMS estimate.

    Returns (token, est) sorted est desc, token asc. Estimates are upper
    bounds within eps*N of truth w.p. 1-delta.
    """
    cand_per_block = max(2 * k, 64)
    partials = ds.select_columns([col]).map_batches(
        functools.partial(
            _block_partials,
            col=col,
            cand_per_block=cand_per_block,
            epsilon=epsilon,
            delta=delta,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    payloads: list[bytes] = []
    cand: set[str] = set()
    for b in partials.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for row in b.to_pylist():
            if row["part_kind"] == "cms":
                payloads.append(row["payload"])
            else:
                cand.add(row["token"])
    # one bulk merge: sparse payloads scatter-add into a single dense
    # accumulator (O(total nnz)), instead of densifying every partial in a
    # pairwise loop (O(partials × width × depth))
    cms = CMSketch.merge_many(payloads) if payloads else None
    if cms is None or not cand:
        return pa.table({"token": pa.array([], pa.string()), "est": pa.array([], pa.int64())})
    tokens = sorted(cand)
    ests = cms.point_query_batch(tokens).astype(np.int64)
    order = np.lexsort((np.array(tokens, dtype=object), -ests))[:k]
    return pa.table(
        {
            "token": pa.array([tokens[i] for i in order], pa.string()),
            "est": pa.array([int(ests[i]) for i in order], pa.int64()),
        }
    )
