"""Deterministic vectorized hashing for the engine.

- ``hash64_batch`` — 64-bit hashes of a string/bytes/numeric column, used by
  HLL / Bloom / MinHash. Implemented with ``pandas.util.hash_pandas_object``
  (public pandas API: vectorized SipHash-like keyed hash with a FIXED key,
  deterministic across processes and machines — safe for retried Ray tasks,
  unlike Python's per-process-salted ``hash``).
- ``sha256_batch`` — hex sha256 per row (hashlib, C speed). This is the
  end-to-end per-row invariant column mandated by BASELINE.json
  (``content_sha256``).
- ``splitmix64`` — cheap vectorized remix to derive independent hash
  families from one base hash (Steele, Lea, Flood 2014 mixing constants).
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pandas as pd

_HASH_KEY = "raysketch-determin"[:16]  # fixed 16-byte key → stable across runs


def _resolve_hash_family() -> str:
    """Resolve the 64-bit hash backend ONCE per process and name the
    family. Hash-fed partials (HLL/Bloom/MinHash) record this tag, and
    merges refuse mismatched tags: on a heterogeneous cluster (polars
    missing or a different version on some workers) incompatible partials
    would otherwise combine into silently wrong estimates."""
    try:
        import os

        # Belt-and-braces: raysketch/__init__.py sets this before ANY
        # raysketch module can import polars (closing the race where some
        # other module imported polars first); repeated here so importing
        # engine.hashing standalone still caps the pool. The cap is a
        # thread-oversubscription guard only — hash VALUES are identical
        # at any pool width, so a pre-pinned wide pool cannot corrupt
        # results, and cross-process version skew is what HASH_FAMILY
        # envelopes catch.
        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        return f"polars-{pl.__version__}|pandas-{pd.__version__}"
    except Exception:
        return f"pandas-{pd.__version__}"


HASH_FAMILY = _resolve_hash_family()


def _as_series(values: Any) -> pd.Series:
    try:
        import pyarrow as pa

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array):
            return values.to_pandas()
    except ImportError:  # pragma: no cover
        pass
    if isinstance(values, pd.Series):
        return values
    return pd.Series(values)


def _polars_hash(values: Any) -> tuple[np.ndarray, np.ndarray] | None:
    """Vectorized 64-bit hash straight off the Arrow buffers via polars
    (~20 ns/key vs ~850 ns for the pandas object path). Fixed seed →
    deterministic across processes within one polars version. The
    polars-vs-pandas branch is a pure function of (backend availability,
    column TYPE) — never a swallowed runtime error — so every process
    running the same software hashes a given column identically; software
    differences across processes are caught by the HASH_FAMILY tag that
    partial envelopes carry."""
    if not HASH_FAMILY.startswith("polars"):
        return None
    import polars as pl  # thread cap set before first import in _resolve
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    elif not isinstance(values, pa.Array):
        # normalize lists/ndarrays/Series to Arrow FIRST: a python list of
        # strings must hash in the SAME family as an Arrow string column
        # (a Bloom built from a column would otherwise never match probes
        # passed as a list — found by the bloom_membership oracle gate)
        try:
            values = pa.array(values)
        except Exception:
            return None  # unconvertible input shapes take the pandas path
    t = values.type
    if not (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_boolean(t)):
        return None  # nested/binary types take the pandas path by TYPE
    s = pl.from_arrow(values)
    h = s.hash(seed=0).to_numpy().astype(np.uint64, copy=False)
    valid = s.is_not_null().to_numpy()
    return h, valid


def hash64_batch(values: Any) -> np.ndarray:
    """Deterministic uint64 hash of each element (nulls dropped)."""
    fast = _polars_hash(values)
    if fast is not None:
        h, valid = fast
        return h if valid.all() else h[valid]
    s = _as_series(values)
    s = s.dropna()
    if s.empty:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY).to_numpy()


def hash64_batch_aligned(values: Any) -> tuple[np.ndarray, np.ndarray]:
    """Row-aligned variant: (uint64 hashes, valid mask), one entry per input
    row. Lets a caller hash a whole block's column ONCE and slice per group
    instead of re-hashing each group's slice."""
    fast = _polars_hash(values)
    if fast is not None:
        return fast
    s = _as_series(values)
    if s.empty:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=bool)
    valid = s.notna().to_numpy()
    h = pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY).to_numpy()
    return h, valid


def append_coarse_bucket(table, cols, num_buckets: int = 256,
                         name: str = "__cb"):
    """Append an int64 ``hash(cols...) % num_buckets`` column to an Arrow
    table — THE coarse-shuffle key every co-location fold uses (scan /
    setops / funnel / window / topk all shuffle on this shape). One
    definition so a hashing change lands everywhere at once."""
    import pyarrow as pa

    h = None
    for c in cols:
        hc, _ = hash64_batch_aligned(table[c])
        h = hc if h is None else combine_hash64(h, hc)
    return table.append_column(
        name,
        pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64()),
    )


def combine_hash64(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Mix two aligned uint64 hash arrays into one composite-key hash
    (vectorized; replaces the per-row f-string + pandas-object-hash path
    for multi-column shuffle keys — ~40× per key)."""
    with np.errstate(over="ignore"):
        return splitmix64(
            np.asarray(h1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ np.asarray(h2, dtype=np.uint64)
        )


def splitmix64(h: np.ndarray) -> np.ndarray:
    """One splitmix64 finalization round — derives an independent family."""
    z = np.asarray(h, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def sha256_batch(values: Any) -> list[str]:
    """Hex sha256 of each string/bytes element (None → None)."""
    try:
        import pyarrow as pa

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            sha = hashlib.sha256
            return [
                None if v is None
                else sha(v if isinstance(v, bytes) else v.encode("utf-8")).hexdigest()
                for v in values.to_pylist()
            ]
    except ImportError:  # pragma: no cover
        pass
    s = _as_series(values)
    out: list[str | None] = []
    for v in s:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            out.append(None)
            continue
        data = v if isinstance(v, bytes) else str(v).encode("utf-8")
        out.append(hashlib.sha256(data).hexdigest())
    return out
