"""Sampling operators.

The reference ecosystem samples by message matcher (1% via
``Uuid < '\\003'``, heka_message_monitor.lua:20) — i.e. a DETERMINISTIC
hash-threshold sample, not an RNG one. Same idea here, generalized:

- :func:`hash_sample` — uniform sample WITHOUT replacement of exactly k
  rows: every row gets a deterministic 64-bit key from its id column
  (seeded splitmix remix), the sample is the k smallest keys. Map side
  emits each block's k smallest candidates (narrow), the driver keeps the
  global k — shuffle volume is ``num_blocks × k`` rows regardless of
  input size. Retry-safe: no RNG state, same rows every run.
- :func:`hash_threshold_filter` — the streaming form: keep rows whose key
  is below ``rate * 2^64`` (an expected-rate Bernoulli sample that is
  consistent across runs and across tables sharing the id column).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..engine.hashing import hash64_batch_aligned, splitmix64


def _keys(batch: pa.Table, id_col: str, seed: int) -> np.ndarray:
    """Row-ALIGNED sample keys: one key per batch row (null ids get the max
    key, so they sort last / fail every threshold and are never silently
    swapped for a neighboring row)."""
    h, valid = hash64_batch_aligned(batch[id_col])
    key = splitmix64(h ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    key[~valid] = np.uint64(0xFFFFFFFFFFFFFFFF)
    return key


def hash_sample(ds, k: int, id_col: str, seed: int = 42):
    """Exactly-k deterministic uniform sample (all original columns)."""

    def block_candidates(batch: pa.Table) -> pa.Table:
        key = _keys(batch, id_col, seed)
        kk = min(k, batch.num_rows)
        idx = np.argpartition(key, kk - 1)[:kk] if batch.num_rows > kk else \
            np.arange(batch.num_rows)
        out = batch.take(pa.array(np.sort(idx)))
        return out.append_column("__sample_key", pa.array(key[np.sort(idx)], pa.uint64()))

    cand = ds.map_batches(block_candidates, batch_format="pyarrow")
    merged = pa.concat_tables(
        list(cand.iter_batches(batch_size=65536, batch_format="pyarrow"))
    )
    # canonical output order = ascending sample key: block arrival order
    # varies run to run, the key order never does (keys are unique w.h.p.)
    order = np.argsort(merged["__sample_key"].to_numpy(zero_copy_only=False),
                       kind="stable")[:k]
    return merged.take(pa.array(order)).drop_columns(["__sample_key"])


def hash_threshold_filter(ds, rate: float, id_col: str, seed: int = 42):
    """Expected-``rate`` deterministic Bernoulli sample as a streaming
    filter stage (consistent across runs/tables for the same id)."""
    if not (0.0 < rate <= 1.0):
        raise ValueError("rate must be in (0, 1]")
    threshold = np.uint64(int(rate * float(2**64 - 1)))

    def keep(batch: pa.Table) -> pa.Table:
        key = _keys(batch, id_col, seed)
        return batch.filter(pa.array(key <= threshold))

    return ds.map_batches(keep, batch_format="pyarrow")
