"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (the part that must survive 100 TB):

- **exact_dedup** — hash-partition on a content hash then keep the
  min-id row per group. The shuffle carries only (hash, id); content
  never moves. ``groupby(hash).map_groups(head)`` over narrow columns.
- **minhash_lsh** — per-batch vectorized shingle→minhash (one
  deterministic 64-bit base hash per shingle remixed into ``num_perm``
  families via splitmix64), banded into ``bands`` keys; candidate pairs
  come from a groupby on (band, band_hash) whose input is one row per
  (doc, band) — #docs × bands narrow rows, never content. Pairs are then
  verified with exact shingle Jaccard (only for candidates).
- **simhash** — 64-bit simhash per doc + Hamming-ball banding (4 tables
  of 16 bits) for near-dup candidates.
- **embedding near-dup** — cosine over normalized vectors; exact
  all-pairs per LSH bucket (random-hyperplane signs), brute force within
  buckets only.
"""

from __future__ import annotations

import itertools
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from ..engine.hashing import hash64_batch, splitmix64


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text", out: str = "content_hash") -> pa.Table:
    from ..engine.hashing import sha256_batch

    return batch.append_column(out, pa.array(sha256_batch(batch[text_col]), pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-``id_col`` row per distinct ``text_col`` value.

    Returns a Dataset of the surviving rows (all original columns).
    Partitioning: one shuffle on the sha256 of content — collision-free in
    practice, so group-by-hash == group-by-content.
    """
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col), batch_format="pyarrow"
    )

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col).head(1).drop(columns=["content_hash"])

    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_set(text: str, k: int) -> np.ndarray:
    """Deterministic 64-bit hashes of the k-char shingles of ``text``."""
    if not text or len(text) < k:
        src = pd.Series([text or ""])
    else:
        src = pd.Series([text[i : i + k] for i in range(len(text) - k + 1)])
    return np.unique(
        pd.util.hash_pandas_object(src, index=False, hash_key="raysketch-determin"[:16]).to_numpy()
    )


def minhash_signature(shingle_hashes: np.ndarray, num_perm: int) -> np.ndarray:
    """num_perm minima over splitmix64-derived hash families (vectorized)."""
    if shingle_hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    h = shingle_hashes.astype(np.uint64)
    sig = np.empty(num_perm, dtype=np.uint64)
    cur = h
    for i in range(num_perm):
        cur = splitmix64(cur)
        sig[i] = cur.min()
    return sig


class MinHasher:
    """Actor-pool stage: text → (doc_id, band, band_hash) rows.

    One output row per (doc, band); the LSH bucket join is a groupby on
    (band, band_hash).
    """

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_perm: int = 128,
        bands: int = 32,
        shingle_k: int = 5,
    ) -> None:
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for did, text in zip(ids, texts):
            sig = minhash_signature(_shingle_set(text or "", self.k), self.num_perm)
            bands = sig.reshape(self.bands, self.rows_per_band)
            bh = pd.util.hash_pandas_object(
                pd.Series([b.tobytes() for b in bands]),
                index=False,
                hash_key="raysketch-determin"[:16],
            ).to_numpy()
            out_id.extend([did] * self.bands)
            out_band.extend(range(self.bands))
            out_hash.extend(int(x) for x in bh)
        return pa.Table.from_arrays(
            [
                pa.array(out_id, pa.int64()),
                pa.array(out_band, pa.int32()),
                pa.array(out_hash, pa.uint64()),
            ],
            names=[self.id_col, "band", "band_hash"],
        )


def lsh_candidate_pairs(band_rows_ds, id_col: str = "doc_id"):
    """(band, band_hash) buckets → unique candidate id pairs (a < b)."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(df[id_col]))
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        combos = list(itertools.combinations(ids, 2))
        return pd.DataFrame(combos, columns=["id_a", "id_b"])

    cand = band_rows_ds.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)

    return cand.groupby(["id_a", "id_b"]).map_groups(dedup_pairs, batch_format="pandas")


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard (the verify step after LSH)."""
    a, b = _shingle_set(text_a, k), _shingle_set(text_b, k)
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b).size
    return inter / (a.size + b.size - inter)


def minhash_dedup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Full near-dup pipeline: minhash → LSH buckets → candidate pairs →
    exact-Jaccard verify (verify joins text back only for candidates via a
    driver-side dict — sound while the candidate set is small; at larger
    scale swap for a bucket-wise join).

    Returns a pandas DataFrame (id_a, id_b, jaccard) of verified pairs.
    """
    kwargs: dict[str, Any] = {"batch_format": "pyarrow"}
    if concurrency:
        kwargs["concurrency"] = concurrency
    hasher = MinHasher(text_col, id_col, num_perm, bands, shingle_k)
    band_rows = ds.select_columns([id_col, text_col]).map_batches(hasher, **kwargs)
    cand = lsh_candidate_pairs(band_rows, id_col).to_pandas()
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})

    cand_set = set(cand["id_a"]) | set(cand["id_b"])
    texts = {}
    for batch in ds.select_columns([id_col, text_col]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            if i in cand_set:
                texts[i] = t
    jac = [
        jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k)
        for a, b in zip(cand["id_a"], cand["id_b"])
    ]
    out = cand.assign(jaccard=jac)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash per doc from word-level hashes (actor-pool stage)."""

    def __init__(self, text_col: str = "text", out_col: str = "simhash") -> None:
        self.text_col, self.out_col = text_col, out_col

    @staticmethod
    def simhash64(words: list[str]) -> int:
        if not words:
            return 0
        h = pd.util.hash_pandas_object(
            pd.Series(words), index=False, hash_key="raysketch-determin"[:16]
        ).to_numpy()
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [
            self.simhash64((t or "").split()) for t in batch[self.text_col].to_pylist()
        ]
        return batch.append_column(self.out_col, pa.array(out, pa.uint64()))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & 1).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> pd.DataFrame:
    """Cosine near-duplicates via random-hyperplane LSH buckets + exact
    cosine within buckets. Bucket key = sign bits of `n_planes`
    projections → 2^n_planes buckets; only same-bucket pairs compared
    (document: misses pairs split by a plane — raise n_planes recall by
    probing multi-bucket at scale)."""

    def to_rows(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((unit.shape[1], n_planes))
        signs = (unit @ planes) > 0
        bucket = (signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
        return pa.Table.from_arrays(
            [
                batch[id_col],
                pa.array(bucket, pa.uint64()),
                pa.array(list(unit), pa.list_(pa.float64())),
            ],
            names=[id_col, "bucket", "unit"],
        )

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        df = df.sort_values(id_col)
        ids = df[id_col].to_numpy()
        U = np.stack(df["unit"].to_numpy())
        sims = U @ U.T
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[mask]], "id_b": ids[ib[mask]], "cosine": sims[ia, ib][mask]}
        )

    out = rows.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas").to_pandas()
    if out.empty:
        # an all-empty Dataset loses its schema on to_pandas
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
