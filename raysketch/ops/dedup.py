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


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", buckets: int = 256):
    """Keep the min-``id_col`` row per distinct ``text_col`` value.

    Returns a Dataset of the surviving rows (all original columns).
    Partitioning: ONE shuffle keyed on a coarse bucket of the content
    sha256 (bounded group count at any scale); each reduce task resolves
    its bucket with a vectorized pandas idxmin per full hash — collision-
    free in practice, so group-by-hash == group-by-content.
    """
    def hash_and_bucket(b: pa.Table) -> pa.Table:
        b = add_content_hash(b, text_col)
        hb = [int(h[:4], 16) % buckets for h in b["content_hash"].to_pylist()]
        return b.append_column("hash_bucket", pa.array(hb, pa.int64()))

    hashed = ds.map_batches(hash_and_bucket, batch_format="pyarrow")

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        winners = df.loc[df.groupby("content_hash", sort=False)[id_col].idxmin()]
        return winners.drop(columns=["content_hash", "hash_bucket"])

    return hashed.groupby("hash_bucket").map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_ROLL_BASE = np.uint64(0x100000001B3)  # FNV-ish odd multiplier


def _batch_shingle_hashes(texts: list, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized k-byte rolling hashes for a whole batch of texts.

    Every doc is followed by k zero pad bytes, so every window of every doc
    — including the all-zero sentinel window an EMPTY doc hashes — stays
    inside its own segment (hashes are position- and batch-independent →
    deterministic under re-batching/retries; a doc's last window covers its
    final byte plus k-1 pad zeros, identical regardless of neighbors).
    Returns (shingle_hashes, doc_offsets) where doc i owns
    hashes[offsets[i]:offsets[i+1]] (>=1 per doc). splitmix64 finalization
    fixes the low-bit bias of the polynomial roll.
    """
    enc = [(t or "").encode("utf-8") for t in texts]
    pad = b"\x00" * k
    blob = pad.join(enc) + pad if enc else pad
    # window count per doc = max(len, 1); doc windows start at its offset
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    counts = np.maximum(lens, 1)
    arr = np.frombuffer(blob, dtype=np.uint8).astype(np.uint64)
    n_win = arr.size - k + 1
    h = np.zeros(n_win, dtype=np.uint64)
    mult = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(k):
            h += arr[j : j + n_win] * mult
            mult *= _ROLL_BASE
    h = splitmix64(h)
    starts = np.concatenate([[0], np.cumsum(lens[:-1] + k)]) if len(enc) else np.zeros(0, np.int64)
    # flatten each doc's window range into one index vector
    offsets = np.concatenate([[0], np.cumsum(counts)])
    idx = np.concatenate([np.arange(s, s + c) for s, c in zip(starts, counts)]) if len(enc) else np.zeros(0, np.int64)
    return h[idx], offsets


def batch_minhash_signatures(texts: list, k: int, num_perm: int) -> np.ndarray:
    """(ndocs, num_perm) MinHash signature matrix, fully vectorized:
    one splitmix64 family pass + one segmented min (reduceat) per
    permutation over the batch's whole shingle stream."""
    sh, offsets = _batch_shingle_hashes(texts, k)
    ndocs = offsets.size - 1
    sig = np.empty((ndocs, num_perm), dtype=np.uint64)
    if ndocs == 0:
        return sig
    seg_starts = offsets[:-1]
    cur = sh
    for p in range(num_perm):
        cur = splitmix64(cur)
        sig[:, p] = np.minimum.reduceat(cur, seg_starts)
    return sig


class MinHasher:
    """Stateless vectorized stage: text → (doc_id, band, band_hash) rows.

    One output row per (doc, band); the LSH bucket join is a groupby on
    (band, band_hash). Content never leaves the stage — the shuffle is
    ndocs x bands narrow integer rows.
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
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        texts = batch[self.text_col].to_pylist()
        sig = batch_minhash_signatures(texts, self.k, self.num_perm)
        ndocs = sig.shape[0]
        # fold each band's rows into one 64-bit bucket key (vectorized)
        sig3 = sig.reshape(ndocs, self.bands, self.rows_per_band)
        bh = np.zeros((ndocs, self.bands), dtype=np.uint64)
        for j in range(self.rows_per_band):
            bh = splitmix64(bh ^ sig3[:, :, j])
        band_idx = np.tile(np.arange(self.bands, dtype=np.int32), ndocs)
        return pa.Table.from_arrays(
            [
                pa.array(np.repeat(ids, self.bands), pa.int64()),
                pa.array(band_idx, pa.int32()),
                pa.array(bh.ravel(), pa.uint64()),
            ],
            names=[self.id_col, "band", "band_hash"],
        )


_COARSE_BUCKETS = 256


def lsh_candidate_pairs(band_rows_ds, id_col: str = "doc_id"):
    """(band, band_hash) buckets → unique candidate id pairs (a < b).

    The shuffle key is a COARSE bucket (band_hash mod 256), not the raw
    bucket: group count stays bounded regardless of corpus size, and each
    reduce task resolves its real buckets with one vectorized pandas
    groupby (per-tiny-bucket map_groups calls would dominate at scale).
    Pair dedup is a second coarse groupby on the pair key.
    """

    def add_coarse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        coarse = pc.cast(
            pc.bit_wise_and(batch["band_hash"], pa.scalar(_COARSE_BUCKETS - 1, pa.uint64())),
            pa.int64(),
        )
        return batch.append_column("coarse", coarse)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        grouped = df.groupby(["band", "band_hash"], sort=False)[id_col]
        for _, ids in grouped:
            if len(ids) < 2:
                continue
            u = np.unique(ids.to_numpy())
            if u.size < 2:
                continue
            ia, ib = np.triu_indices(u.size, k=1)
            out_a.append(u[ia])
            out_b.append(u[ib])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        cand = pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})
        return cand.drop_duplicates()

    cand = band_rows_ds.map_batches(add_coarse, batch_format="pyarrow").groupby(
        "coarse"
    ).map_groups(pairs, batch_format="pandas")

    def pair_coarse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.bit_wise_and(
            pc.bit_wise_xor(
                pc.multiply(batch["id_a"], pa.scalar(2654435761, pa.int64())),
                batch["id_b"],
            ),
            pa.scalar(_COARSE_BUCKETS - 1, pa.int64()),
        )
        return batch.append_column("pc", key)

    return cand.map_batches(pair_coarse, batch_format="pyarrow").groupby("pc").map_groups(
        lambda df: df.drop_duplicates(subset=["id_a", "id_b"]).drop(columns=["pc"]),
        batch_format="pandas",
    )


def shingle_hash_set(text: str, k: int = 5) -> np.ndarray:
    """Unique shingle hashes of one text (same family as the MinHash)."""
    h, _ = _batch_shingle_hashes([text], k)
    return np.unique(h)


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard (the verify step after LSH)."""
    a, b = shingle_hash_set(text_a, k), shingle_hash_set(text_b, k)
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
    """Full near-dup pipeline: one distributed text pass → signatures;
    band rows derived FROM signatures (text hashed once); LSH buckets →
    candidate pairs; candidates pre-filtered by the VECTORIZED
    signature-agreement Jaccard estimate (one (pairs × num_perm) matrix
    compare, no per-pair Python); only survivors get the exact
    shingle-Jaccard verify. Signatures (num_perm·8 B/doc) and survivor
    texts come to the driver — sound while candidates fit memory; at
    corpus scale replace with a bucket-wise join of the same stages.

    Returns a pandas DataFrame (id_a, id_b, jaccard) of verified pairs.
    """
    kwargs: dict[str, Any] = {"batch_format": "pyarrow"}
    if concurrency:
        kwargs["concurrency"] = concurrency
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    def sig_stage(batch: pa.Table) -> pa.Table:
        sig = batch_minhash_signatures(batch[text_col].to_pylist(), shingle_k, num_perm)
        return pa.Table.from_arrays(
            [batch[id_col],
             pa.FixedSizeListArray.from_arrays(pa.array(sig.ravel(), pa.uint64()), num_perm)],
            names=[id_col, "sig"],
        )

    sigs_ds = ds.select_columns([id_col, text_col]).map_batches(sig_stage, **kwargs).materialize()

    def band_stage(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        sig = np.asarray(batch["sig"].to_pylist(), dtype=np.uint64)
        ndocs = sig.shape[0]
        sig3 = sig.reshape(ndocs, bands, rows_per_band)
        bh = np.zeros((ndocs, bands), dtype=np.uint64)
        for j in range(rows_per_band):
            bh = splitmix64(bh ^ sig3[:, :, j])
        return pa.Table.from_arrays(
            [pa.array(np.repeat(ids, bands), pa.int64()),
             pa.array(np.tile(np.arange(bands, dtype=np.int32), ndocs), pa.int32()),
             pa.array(bh.ravel(), pa.uint64())],
            names=[id_col, "band", "band_hash"],
        )

    band_rows = sigs_ds.map_batches(band_stage, batch_format="pyarrow")
    cand = lsh_candidate_pairs(band_rows, id_col).to_pandas()
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})

    # vectorized signature-estimate pre-filter (zero-copy sig matrix)
    sig_ids: list[np.ndarray] = []
    sig_mats: list[np.ndarray] = []
    for batch in sigs_ds.iter_batches(batch_size=16384, batch_format="pyarrow"):
        sig_ids.append(np.asarray(batch[id_col].to_pylist(), dtype=np.int64))
        fsl = batch["sig"].combine_chunks()
        sig_mats.append(
            np.frombuffer(fsl.values.buffers()[1], dtype=np.uint64)[
                : len(fsl) * num_perm
            ].reshape(-1, num_perm)
        )
    all_ids = np.concatenate(sig_ids)
    all_sigs = np.concatenate(sig_mats)
    pos = {int(i): j for j, i in enumerate(all_ids)}
    ca = cand["id_a"].to_numpy(np.int64)
    cb = cand["id_b"].to_numpy(np.int64)
    ia = np.fromiter((pos[a] for a in ca), dtype=np.int64, count=ca.size)
    ib = np.fromiter((pos[b] for b in cb), dtype=np.int64, count=cb.size)
    est = (all_sigs[ia] == all_sigs[ib]).mean(axis=1)
    # 2.5-sigma safety margin below threshold; exact verify decides the rest
    sigma = np.sqrt(threshold * (1 - threshold) / num_perm)
    keep = est >= max(0.0, threshold - 2.5 * sigma)
    cand = cand[keep].reset_index(drop=True)
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})

    # exact shingle-Jaccard verify, parallelized over pair chunks
    import ray

    cand_set = set(cand["id_a"]) | set(cand["id_b"])
    shingles: dict[int, np.ndarray] = {}
    for batch in ds.select_columns([id_col, text_col]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        ids_b = batch[id_col].to_pylist()
        texts_b = batch[text_col].to_pylist()
        wanted = [(i, t) for i, t in zip(ids_b, texts_b) if i in cand_set]
        if not wanted:
            continue
        h, offs = _batch_shingle_hashes([t for _, t in wanted], shingle_k)
        for j, (i, _) in enumerate(wanted):
            shingles[i] = np.unique(h[offs[j]:offs[j + 1]])

    # pack all shingle sets into ONE contiguous array + offsets: ray.put of
    # a single large numpy array is zero-copy shared memory, so every chunk
    # task reads views instead of deserializing a dict of 10^4 small arrays
    sh_ids = sorted(shingles)
    sh_pos = {i: j for j, i in enumerate(sh_ids)}
    sh_offs = np.zeros(len(sh_ids) + 1, dtype=np.int64)
    for j, i in enumerate(sh_ids):
        sh_offs[j + 1] = sh_offs[j] + shingles[i].size
    sh_flat = np.concatenate([shingles[i] for i in sh_ids]) if sh_ids else np.zeros(0, np.uint64)

    @ray.remote(num_cpus=1)
    def verify_chunk(pa_idx, pb_idx, flat, offs) -> np.ndarray:
        jac = np.empty(pa_idx.size)
        for r in range(pa_idx.size):
            a, b = pa_idx[r], pb_idx[r]
            sa = flat[offs[a]:offs[a + 1]]
            sb = flat[offs[b]:offs[b + 1]]
            if sa.size == 0 and sb.size == 0:
                jac[r] = 1.0
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            jac[r] = inter / (sa.size + sb.size - inter)
        return jac

    ca = cand["id_a"].to_numpy(np.int64)
    cb = cand["id_b"].to_numpy(np.int64)
    pa_idx = np.fromiter((sh_pos[a] for a in ca), dtype=np.int64, count=ca.size)
    pb_idx = np.fromiter((sh_pos[b] for b in cb), dtype=np.int64, count=cb.size)
    flat_ref, offs_ref = ray.put(sh_flat), ray.put(sh_offs)
    n_chunks = max(1, min(64, ca.size // 1000))
    bounds = np.linspace(0, ca.size, n_chunks + 1, dtype=np.int64)
    refs = [
        verify_chunk.remote(pa_idx[lo:hi], pb_idx[lo:hi], flat_ref, offs_ref)
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]
    jac = np.concatenate(ray.get(refs)) if refs else np.zeros(0)
    out = cand.assign(jaccard=jac)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash per doc from word-level hashes, vectorized across the
    whole batch: one hash pass over every word + one segmented bit-vote
    (reduceat) per doc."""

    def __init__(self, text_col: str = "text", out_col: str = "simhash") -> None:
        self.text_col, self.out_col = text_col, out_col

    @staticmethod
    def simhash64(words: list[str]) -> int:
        if not words:
            return 0
        return int(SimHasher._batch([words])[0])

    @staticmethod
    def _batch(word_lists: list[list[str]]) -> np.ndarray:
        counts = np.fromiter((len(w) for w in word_lists), dtype=np.int64,
                             count=len(word_lists))
        flat: list[str] = [w for ws in word_lists for w in ws]
        out = np.zeros(len(word_lists), dtype=np.uint64)
        if not flat:
            return out
        h = hash64_batch(pa.array(flat, pa.string()))
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        votes = 2 * bits - 1  # (nwords, 64)
        nonempty = counts > 0
        seg_starts = np.concatenate([[0], np.cumsum(counts)])[:-1][nonempty]
        acc = np.add.reduceat(votes, seg_starts, axis=0)  # (ndocs_nonempty, 64)
        sims = ((acc > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
        out[nonempty] = sims
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        word_lists = [(t or "").split() for t in batch[self.text_col].to_pylist()]
        out = self._batch(word_lists)
        return batch.append_column(self.out_col, pa.array(out, pa.uint64()))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & 1).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_neardup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """SimHash near-dup: 64-bit simhash per doc, 4 tables of 16 bits for
    candidate banding (any pair within Hamming distance 3 shares at least
    one exact 16-bit band), Hamming verify on candidates. Banding rows are
    (doc, table, 16-bit key) — narrow; the verify joins only simhashes.
    """
    kwargs: dict[str, Any] = {"batch_format": "pyarrow"}
    if concurrency:
        kwargs["concurrency"] = concurrency
    sims = ds.select_columns([id_col, text_col]).map_batches(
        SimHasher(text_col), **kwargs
    ).select_columns([id_col, "simhash"]).materialize()

    def band(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        h = np.asarray(batch["simhash"].to_pylist(), dtype=np.uint64)
        tables = np.arange(4, dtype=np.uint64)
        keys = ((h[:, None] >> (tables * np.uint64(16))) & np.uint64(0xFFFF))
        # fold table idx into the key so one groupby covers all 4 tables
        band_key = (keys | (tables << np.uint64(16)))
        return pa.Table.from_arrays(
            [pa.array(np.repeat(ids, 4), pa.int64()),
             pa.array(np.zeros(ids.size * 4, np.int32), pa.int32()),
             pa.array(band_key.ravel(), pa.uint64())],
            names=[id_col, "band", "band_hash"],
        )

    cand = lsh_candidate_pairs(sims.map_batches(band, batch_format="pyarrow"),
                               id_col).to_pandas()
    if cand.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    hashes: dict[int, int] = {}
    for b in sims.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for i, h in zip(b[id_col].to_pylist(), b["simhash"].to_pylist()):
            hashes[i] = h
    ha = np.fromiter((hashes[int(a)] for a in cand["id_a"]), dtype=np.uint64,
                     count=len(cand))
    hb = np.fromiter((hashes[int(b)] for b in cand["id_b"]), dtype=np.uint64,
                     count=len(cand))
    dist = hamming64(ha, hb)
    out = cand.assign(hamming=dist)
    out = out[out["hamming"] <= max_hamming]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def exact_cosine_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.45,
) -> pd.DataFrame:
    """EXACT all-pairs cosine similarity join: one Ray task per block pair
    (upper triangle), each a dense numpy matmul of two normalized blocks.

    This is the raw-task escape hatch (Dataset API has no self-join):
    blocks stay in the object store, tasks read two refs each, and only
    over-threshold pairs come back. O(B²) tasks over B blocks — exact and
    fine up to ~10^6 rows; beyond that use the LSH-bucketed
    ``embedding_neardup_pairs`` recall path.
    """
    import ray

    def normalize(batch: pa.Table) -> pa.Table:
        V = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        U = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pa.table({id_col: batch[id_col],
                         "unit": pa.array(list(U), pa.list_(pa.float64()))})

    refs = ds.map_batches(normalize, batch_format="pyarrow").to_arrow_refs()

    @ray.remote(num_cpus=1)
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pd.DataFrame:
        ia = np.asarray(ta[id_col].to_pylist(), dtype=np.int64)
        ib = np.asarray(tb[id_col].to_pylist(), dtype=np.int64)
        A = np.asarray(ta["unit"].to_pylist(), dtype=np.float64)
        B = np.asarray(tb["unit"].to_pylist(), dtype=np.float64)
        S = A @ B.T
        # threshold on the 6-dp ROUNDED value so boundary pairs agree with
        # an engine that computes the same cosine with different fp order
        Sr = np.floor(np.abs(S) * 1e6 + 0.5) / 1e6 * np.sign(S)
        if same:
            np.fill_diagonal(Sr, -2.0)
            r, c = np.where(np.triu(Sr >= threshold, k=1))
        else:
            r, c = np.where(Sr >= threshold)
        id_a = np.minimum(ia[r], ib[c])
        id_b = np.maximum(ia[r], ib[c])
        return pd.DataFrame({"id_a": id_a, "id_b": id_b,
                             "cosine": Sr[r, c]})

    tasks = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            tasks.append(block_pair.remote(refs[i], refs[j], i == j))
    parts = [p for p in ray.get(tasks) if len(p)]
    if not parts:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

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
