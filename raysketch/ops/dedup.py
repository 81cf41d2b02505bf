"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (the part that must survive 100 TB):

- **exact_dedup** — winner decision on a NARROW (content_hash, id)
  shuffle, output via a native left-semi join — content moves once,
  through a spill-capable join, never through the dedup groupby.
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

import hashlib
import json
import os
import time
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


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                buckets: int = 256, num_partitions: int = 16,
                broadcast_limit: int = 2_000_000):
    """Keep the min-``id_col`` row per distinct ``text_col`` value.

    Returns a Dataset of the surviving rows (all original columns).
    Two-phase plan so CONTENT never rides the dedup shuffle:

    1. winner decision — a NARROW (content_hash, id) projection (content
       dropped in the same fused map that hashes it) shuffles on a coarse
       bucket of the hash; each reduce task resolves its bucket with one
       vectorized pandas idxmin per full sha256 (collision-free in
       practice, so group-by-hash == group-by-content).
    2. output — routed by WINNER-TABLE SIZE: when the surviving-id set
       fits comfortably in memory (≤ ``broadcast_limit`` ids, ~8 B each),
       a broadcast semi-join (``ray.put`` the id set once, vectorized
       ``is_in`` per batch) keeps the big side streaming with NO shuffle
       and no join-actor pool; above the limit, Ray's native partitioned
       LEFT-SEMI hash join — full rows move exactly once, through a
       spill-capable join, only for survivors. (The partitioned join
       spawns aggregator actors per call — measurably the wrong tool
       when the winner side is driver-small.)

    Assumes ``id_col`` values are unique (the corpus contract); with
    duplicate ids the semi join would keep every row sharing a winner id.
    """
    def hash_and_bucket(b: pa.Table) -> pa.Table:
        from ..engine.hashing import hash64_batch_aligned

        b = add_content_hash(b, text_col)
        h, _ = hash64_batch_aligned(b["content_hash"])  # vectorized, no hex parse
        return pa.table({
            "content_hash": b["content_hash"],
            id_col: b[id_col],
            "hash_bucket": pa.array((h % np.uint64(buckets)).astype(np.int64),
                                    pa.int64()),
        })

    narrow = ds.map_batches(hash_and_bucket, batch_format="pyarrow")

    # map-side pre-reduce BEFORE any shuffle: one winner row per
    # (block, content_hash) — min-of-mins associativity makes the global
    # fold correct over these partials, and the shuffle/fold input drops
    # from N rows to <= blocks x distinct-per-block.
    def block_winners(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df.groupby("content_hash", sort=False)[id_col].idxmin()]

    partials = narrow.map_batches(block_winners, batch_format="pandas").materialize()

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        winners = df.loc[df.groupby("content_hash", sort=False)[id_col].idxmin()]
        return winners[[id_col]].rename(columns={id_col: "__win_id"})

    n_partials = partials.count()
    if n_partials == 0:
        return ds  # empty input dedups to itself
    if n_partials <= broadcast_limit:
        # small partial volume: ONE vectorized driver fold replaces the
        # sort shuffle (same size contract as the broadcast output join —
        # the fold input is the narrow winner-partial table, not rows)
        import ray.data as rd

        winners = rd.from_arrow(pa.Table.from_pandas(
            keep_first(partials.to_pandas()), preserve_index=False))
    else:
        winners = partials.groupby("hash_bucket").map_groups(
            keep_first, batch_format="pandas"
        ).materialize()  # narrow ids only; needed twice (count + join side)
    if winners.count() <= broadcast_limit:
        from .join import broadcast_semi_join

        return broadcast_semi_join(ds, winners, big_key=id_col,
                                   small_key="__win_id")
    return ds.join(winners, "left_semi", num_partitions,
                   on=(id_col,), right_on=("__win_id",))


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


def lsh_candidate_pairs(band_rows_ds, id_col: str = "doc_id",
                        dedupe: bool = True):
    """(band, band_hash) buckets → candidate id pairs (a < b).

    The shuffle key is a COARSE bucket (band_hash mod 256), not the raw
    bucket: group count stays bounded regardless of corpus size, and each
    reduce task resolves its real buckets with one vectorized pandas
    groupby (per-tiny-bucket map_groups calls would dominate at scale).

    ``dedupe=True`` adds a second coarse groupby on the pair key to drop
    cross-band duplicates. Verify pipelines pass ``dedupe=False`` and
    dedupe AFTER verification instead (:func:`_dedupe_pairs`): a pair
    colliding in b bands appears ~E[b | ≥1] ≈ 1.3× on average, so
    deduping the RESULT-scale verified set costs a tiny shuffle while
    deduping the candidate set costs a full candidate-volume sort — the
    ~30% duplicated verify work is vectorized and cheaper than the
    shuffle it replaces at every scale measured.
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
    if not dedupe:
        return cand
    return _dedupe_pairs(cand)


def _add_pair_coarse(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    key = pc.bit_wise_and(
        pc.bit_wise_xor(
            pc.multiply(batch["id_a"], pa.scalar(2654435761, pa.int64())),
            batch["id_b"],
        ),
        pa.scalar(_COARSE_BUCKETS - 1, pa.int64()),
    )
    return batch.append_column("pc", key)


def _dedupe_pairs(pairs_ds):
    """Global (id_a, id_b) dedup via one coarse pair-key groupby; keeps
    every non-key column of the first occurrence."""
    return pairs_ds.map_batches(_add_pair_coarse, batch_format="pyarrow").groupby(
        "pc"
    ).map_groups(
        lambda df: df.drop_duplicates(subset=["id_a", "id_b"]).drop(columns=["pc"]),
        batch_format="pandas",
    )


def attach_pair_payloads(pairs_ds, side_ds, num_partitions: int = 8):
    """Distributed gather join: candidate ``(id_a, id_b)`` pairs + a keyed
    payload table ``(join_id, payload)`` → ``(id_a, id_b, payload_a,
    payload_b)``.

    This is the corpus-scale replacement for driver-side verify lookups
    (the round-1 scale blocker): instead of materializing every doc's
    signature/shingle/simhash state in one process, the pairs dataset is
    hash-joined against the payload table twice (once per side) with Ray
    Data's native partitioned hash join — each join partition holds only
    1/``num_partitions`` of the payloads, so per-task state is bounded and
    the whole gather streams. Pairs whose id has no payload row are
    dropped (inner-join semantics). Raise ``num_partitions`` with corpus
    size.
    """
    j1 = pairs_ds.join(side_ds, "inner", num_partitions,
                       on=("id_a",), right_on=("join_id",))
    return j1.join(side_ds, "inner", num_partitions,
                   on=("id_b",), right_on=("join_id",),
                   left_suffix="_a", right_suffix="_b")


def _as_pairs_ds(df: pd.DataFrame):
    """Typed (possibly empty) pandas frame → a one-block Dataset, so every
    pair-producing op returns a Dataset uniformly (empty results keep
    their schema)."""
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


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
):
    """Full near-dup pipeline, driver-unbounded at every stage:

    1. ONE fused text pass: shingle-hash → minhash signature → band rows
       (no materialized signature dataset; band rows are ndocs × bands
       narrow integers).
    2. LSH buckets → candidate pairs (coarse-bucket groupbys).
    3. Candidate docs only (broadcast semi-join on the output-scale id
       set) get a second hash pass emitting a per-doc payload of
       signature + unique shingle set.
    4. ONE bucket-wise gather join (:func:`attach_pair_payloads`) attaches
       both payloads to each pair; the verify batch first applies the
       vectorized signature-agreement estimate filter, then exact shingle
       Jaccard on the survivors — per-doc state never materializes in one
       process.

    Returns a DATASET of verified pairs (id_a, id_b, jaccard) — near-dup
    pairs over 10^9 docs need not be driver-sized, so the result streams:
    sink it with ``engine.sinks.write_dataset`` or ``.to_pandas()`` it at
    sf scale (the query layer's convenience).
    """
    kwargs: dict[str, Any] = {"batch_format": "pyarrow"}
    if concurrency:
        kwargs["concurrency"] = concurrency
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    def band_stage(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        sig = batch_minhash_signatures(batch[text_col].to_pylist(), shingle_k, num_perm)
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

    band_rows = ds.select_columns([id_col, text_col]).map_batches(band_stage, **kwargs)
    # dedupe=False: cross-band duplicate candidates are cheaper to carry
    # through the (vectorized) verify than to sort out of the full
    # candidate stream; the verify stage dedupes at result scale
    cand = lsh_candidate_pairs(band_rows, id_col, dedupe=False).materialize()
    if cand.count() == 0:
        return _as_pairs_ds(_EMPTY_JACCARD_PAIRS())
    return _minhash_verify_candidates(ds, cand, text_col, id_col, threshold,
                                      num_perm, shingle_k)


def _EMPTY_JACCARD_PAIRS() -> pd.DataFrame:
    return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                         "id_b": pd.Series([], dtype="int64"),
                         "jaccard": pd.Series([], dtype="float64")})


_DIRECT_VERIFY_LIMIT = 100_000
_SIG_BROADCAST_BYTES = 256 << 20     # gate on n_docs × num_perm × 8 B
_SHINGLE_BROADCAST_BYTES = 256 << 20


def _lookup_sorted(ids_sorted: np.ndarray, keys: np.ndarray):
    """searchsorted with a membership mask: (positions, found). Broadcast
    gathers must DROP pairs whose id has no payload row — the invariant
    the partitioned-join route gets from inner-join semantics — instead
    of indexing out of range or silently comparing a neighbor's payload."""
    pos = np.searchsorted(ids_sorted, keys)
    inb = pos < ids_sorted.size
    ok = np.zeros(keys.shape, dtype=bool)
    ok[inb] = ids_sorted[pos[inb]] == keys[inb]
    pos[~inb] = 0  # safe placeholder; masked out by callers
    return pos, ok


def _collect_payload_index(payload_ds, key: str = "join_id"):
    """Materialize a (join_id, payload) side into driver arrays for
    broadcast: (sorted ids, one concatenated uint64 buffer, offsets).
    ONLY called behind an explicit size gate — the broadcast analog of
    ``broadcast_lookup_join``'s small-side collect."""
    ids_parts: list[np.ndarray] = []
    pay_parts: list[bytes] = []
    lens: list[int] = []
    for b in payload_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ids_parts.append(np.asarray(b[key].to_pylist(), dtype=np.int64))
        for p in b["payload"].to_pylist():
            pay_parts.append(p)
            lens.append(len(p) // 8)
    ids = (np.concatenate(ids_parts) if ids_parts
           else np.zeros(0, dtype=np.int64))
    vals = np.frombuffer(b"".join(pay_parts), dtype=np.uint64)
    offs = np.concatenate([[0], np.cumsum(np.asarray(lens, dtype=np.int64))])
    order = np.argsort(ids, kind="stable")
    # re-pack values in sorted-id order so offsets stay aligned
    starts, stops = offs[:-1][order], offs[1:][order]
    new_vals = np.concatenate(
        [vals[s:e] for s, e in zip(starts, stops)]) if ids.size else vals
    new_offs = np.concatenate([[0], np.cumsum(stops - starts)])
    return ids[order], new_vals, new_offs


def _minhash_verify_candidates(ds, cand, text_col: str, id_col: str,
                               threshold: float, num_perm: int,
                               shingle_k: int):
    """Stages 3-4 of :func:`minhash_dedup_pairs` (payload gather +
    estimate filter + exact shingle-Jaccard verify) — shared by the
    one-shot pipeline and the checkpointed one, so resume runs verify
    byte-identically. ``cand`` must be materialized and non-empty (it may
    carry cross-band duplicate pairs; the output is deduped).

    Double size routing, coarse to fine:

    - below ``_DIRECT_VERIFY_LIMIT`` candidate pairs the signature
      estimate pre-filter is pure overhead (its only job is to avoid
      shipping shingle sets for pairs that would fail anyway) — go
      straight to the exact verify;
    - each payload gather (signatures for the estimate filter, shingle
      sets for the exact verify) BROADCASTS its side when it fits the
      documented budget (``ray.put`` once, ``searchsorted`` lookup per
      batch — no join actors, the pair stream never shuffles) and falls
      back to the partitioned hash-join gather above it. All routes run
      the same filter/verify kernels, so results are identical.
    """
    import ray

    empty = _EMPTY_JACCARD_PAIRS()

    # payloads only for candidate docs, restricted by a BLOOM of the
    # candidate ids (bits broadcast, never an id set — the driver holds
    # ~1.2 MB/10^6 ids at any pair count). No false negatives, and the
    # ~fpr false-positive docs are harmless: the pair joins simply never
    # probe their payload rows.
    from .join import bloom_semi_join

    def ids_of(b: pa.Table) -> pa.Table:
        return pa.table({"did": pa.concat_arrays(
            [b["id_a"].combine_chunks(), b["id_b"].combine_chunks()])})

    # candidate docs (with text) materialize ONCE at candidate scale; both
    # payload sides derive from this in-memory set
    n_pairs = cand.count()
    docs_needed = bloom_semi_join(
        ds.select_columns([id_col, text_col]),
        cand.map_batches(ids_of, batch_format="pyarrow"),
        big_key=id_col, small_key="did",
        capacity=max(1024, 2 * n_pairs), fpr=0.01,
    ).materialize()
    # join partitions track candidate volume: bounded per-partition state
    # at any corpus size, minimal actor spawn at small sizes
    npart = int(max(8, min(64, n_pairs // 250_000 + 8)))

    n_docs = docs_needed.count()

    if n_pairs <= _DIRECT_VERIFY_LIMIT:
        # small-volume route: exact verify on every candidate — no
        # signature pass, no estimate-filter round
        surv, shingle_docs = cand, docs_needed
    else:
        def sig_payload(batch: pa.Table) -> pa.Table:
            """num_perm×8-byte signature per candidate doc — same hash
            families as band_stage, so the estimate filter sees the
            banding signatures bit-for-bit."""
            sig = batch_minhash_signatures(batch[text_col].to_pylist(),
                                           shingle_k, num_perm)
            return pa.table({
                "join_id": batch[id_col],
                "payload": pa.array(
                    [sig[i].tobytes() for i in range(sig.shape[0])],
                    pa.large_binary()),
            })

        # 2.5-sigma safety margin below threshold; exact verify decides
        # the rest
        sigma = float(np.sqrt(threshold * (1 - threshold) / num_perm))
        cut = max(0.0, threshold - 2.5 * sigma)
        sig_side = docs_needed.map_batches(
            sig_payload, batch_format="pyarrow")

        if n_docs * num_perm * 8 <= _SIG_BROADCAST_BYTES:
            # broadcast the signature matrix (gated on its ACTUAL byte
            # size, n_docs × num_perm × 8 B): the candidate stream
            # est-filters in ONE fused map — no join actors, no pair
            # shuffle
            ids_s, vals, offs = _collect_payload_index(sig_side)
            mat = vals.reshape(-1, num_perm)
            sig_ref = ray.put((ids_s, mat))

            def est_keep_bcast(batch: pa.Table) -> pa.Table:
                ids_sorted, m = ray.get(sig_ref)  # shared-memory read
                a = batch["id_a"].to_numpy(zero_copy_only=False)
                b = batch["id_b"].to_numpy(zero_copy_only=False)
                ia, ok_a = _lookup_sorted(ids_sorted, a)
                ib, ok_b = _lookup_sorted(ids_sorted, b)
                keep = ok_a & ok_b  # id with no payload -> pair dropped,
                est = np.zeros(len(a))  # matching the join route's inner-join
                both = keep.nonzero()[0]
                if both.size:
                    est[both] = (m[ia[both]] == m[ib[both]]).mean(axis=1)
                return batch.filter(pa.array(keep & (est >= cut)))

            surv = cand.map_batches(
                est_keep_bcast, batch_format="pyarrow").materialize()
        else:
            def est_keep(df: pd.DataFrame) -> pd.DataFrame:
                if df.empty:
                    return pd.DataFrame(
                        {"id_a": pd.Series([], dtype="int64"),
                         "id_b": pd.Series([], dtype="int64")})
                A = np.frombuffer(b"".join(df["payload_a"]), np.uint64).reshape(-1, num_perm)
                B = np.frombuffer(b"".join(df["payload_b"]), np.uint64).reshape(-1, num_perm)
                est = (A == B).mean(axis=1)
                return df.loc[est >= cut, ["id_a", "id_b"]]

            surv = attach_pair_payloads(
                cand, sig_side.materialize(), num_partitions=npart
            ).map_batches(est_keep, batch_format="pandas").materialize()
        if surv.count() == 0:
            return _as_pairs_ds(empty)

        # exact shingle-Jaccard verify on the est-survivors only: shingle
        # sets (KBs/doc) ship for survivor docs alone, never per candidate
        shingle_docs = bloom_semi_join(
            docs_needed, surv.map_batches(ids_of, batch_format="pyarrow"),
            big_key=id_col, small_key="did",
            capacity=max(1024, 2 * n_pairs), fpr=0.01,
        )

    def shingle_payload(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        h, offs = _batch_shingle_hashes(texts, shingle_k)
        pay = [np.unique(h[offs[i]:offs[i + 1]]).tobytes() for i in range(len(texts))]
        return pa.table({"join_id": batch[id_col],
                         "payload": pa.array(pay, pa.large_binary())})

    sh_side = shingle_docs.map_batches(shingle_payload, batch_format="pyarrow").materialize()

    def _jaccard_rows(ids_a, ids_b, sets_a, sets_b) -> pd.DataFrame:
        """Batch Jaccard over per-pair UNIQUE hash sets, fully vectorized:
        one lexsort over the batch's whole (pair, value) stream, adjacent
        duplicates = intersections (each side is unique within itself, so
        a value can repeat within a pair only across sides)."""
        npairs = len(ids_a)
        sizes_a = np.fromiter((s.size for s in sets_a), np.int64, npairs)
        sizes_b = np.fromiter((s.size for s in sets_b), np.int64, npairs)
        values = np.concatenate(
            [v for pair in zip(sets_a, sets_b) for v in pair]
        ) if npairs else np.zeros(0, np.uint64)
        segs = np.repeat(
            np.arange(npairs, dtype=np.int64),
            (sizes_a + sizes_b) if npairs else np.zeros(0, np.int64))
        order = np.lexsort((values, segs))
        v, s = values[order], segs[order]
        dup = (v[1:] == v[:-1]) & (s[1:] == s[:-1])
        inter = np.bincount(s[1:][dup], minlength=npairs)
        union = sizes_a + sizes_b - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        out = pd.DataFrame({"id_a": ids_a, "id_b": ids_b, "jaccard": jac})
        return out[out["jaccard"] >= threshold]

    if sh_side.size_bytes() <= _SHINGLE_BROADCAST_BYTES:
        # broadcast the shingle sets (gated by actual byte size): verify
        # is one fused map over the survivor pair stream
        ids_s, vals, offs = _collect_payload_index(sh_side)
        sh_ref = ray.put((ids_s, vals, offs))

        def verify_bcast(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.Table.from_pandas(empty, preserve_index=False)
            ids_sorted, v, o = ray.get(sh_ref)
            a = batch["id_a"].to_numpy(zero_copy_only=False)
            b = batch["id_b"].to_numpy(zero_copy_only=False)
            ia, ok_a = _lookup_sorted(ids_sorted, a)
            ib, ok_b = _lookup_sorted(ids_sorted, b)
            keep = ok_a & ok_b  # missing payload -> pair dropped
            a, b, ia, ib = a[keep], b[keep], ia[keep], ib[keep]
            out = _jaccard_rows(
                a, b,
                [v[o[i]:o[i + 1]] for i in ia],
                [v[o[i]:o[i + 1]] for i in ib])
            return pa.Table.from_pandas(out, preserve_index=False)

        verified = surv.map_batches(verify_bcast, batch_format="pyarrow")
    else:
        def verify(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return empty
            return _jaccard_rows(
                df["id_a"].to_numpy(), df["id_b"].to_numpy(),
                [np.frombuffer(p, np.uint64) for p in df["payload_a"]],
                [np.frombuffer(p, np.uint64) for p in df["payload_b"]])

        verified = attach_pair_payloads(
            surv, sh_side, num_partitions=npart
        ).map_batches(verify, batch_format="pandas")

    # candidates may carry cross-band duplicates (lsh_candidate_pairs
    # dedupe=False); dedup at RESULT scale — a tiny shuffle
    return _dedupe_pairs(verified)


def minhash_dedup_pairs_checkpointed(
    shard_paths: list[str],
    checkpoint_root: str,
    job_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    max_in_flight: int = 16,
    _fail_after: str | None = None,
):
    """Resumable near-dup pipeline with stage-keyed checkpoints (the
    dedup analog of ``engine.checkpoint.run_with_checkpoint``; BASELINE.md
    §2 resumability contract). A killed run re-submitted with the same
    ``job_id`` skips finished work and produces identical final pairs.

    Checkpoint layout under ``checkpoint_root/job_id``:

    - ``stage_bands/part-<pid>.parquet`` + ``manifest/bands-<pid>.json``
      — per input SHARD band rows (deterministic per shard: the minhash
      families are seed-fixed, so a shard's band rows are identical on
      every run). Lineage + metrics (input file, rows, wall seconds) ride
      the manifest; partials publish atomically (tmp + rename).
    - ``stage_candidates/`` / ``stage_verified/`` — the two GLOBAL-
      shuffle stage outputs as ``engine.sinks.write_dataset`` directories
      (atomic ``_SUCCESS`` publish); a stage directory with a marker is
      skipped wholesale on resume. Candidate/verify shuffles are not
      shard-decomposable (any pair may span shards), so stage granularity
      is the honest resume unit for them.

    Returns the verified-pairs DATASET read back from the final stage
    sink. ``_fail_after`` (tests only) raises after the named stage
    commits, simulating a mid-job kill."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq_mod

    from ..engine import sinks

    base = os.path.join(checkpoint_root, job_id)
    bands_dir = os.path.join(base, "stage_bands")
    manifest_dir = os.path.join(base, "manifest")
    cand_dir = os.path.join(base, "stage_candidates")
    ver_dir = os.path.join(base, "stage_verified")
    os.makedirs(bands_dir, exist_ok=True)
    os.makedirs(manifest_dir, exist_ok=True)

    # -- stage A: per-shard band rows (skip finished shards) ---------------
    def shard_done(pid: str) -> bool:
        mpath = os.path.join(manifest_dir, f"bands-{pid}.json")
        ppath = os.path.join(bands_dir, f"part-{pid}.parquet")
        try:
            with open(mpath) as f:
                json.load(f)
            pq_mod.read_schema(ppath)
            return True
        except Exception:
            return False  # degrade gracefully: recompute this shard

    hasher = MinHasher(text_col, id_col, num_perm, bands, shingle_k)
    # path-hashed pids (engine.checkpoint.shard_partition_id): same-named
    # shards from different directories must not collide. NOTE the minhash
    # band families are pure-numpy polynomial hashes (seed-fixed), NOT the
    # polars/pandas hash64 backend — band partials are therefore valid
    # across hash-backend upgrades and need no HASH_FAMILY guard here.
    from ..engine.checkpoint import shard_partition_id

    cur_pids = [shard_partition_id(p) for p in shard_paths]
    inputs_key = hashlib.sha1("\n".join(sorted(cur_pids)).encode()).hexdigest()

    @ray.remote(num_cpus=1)
    def build_shard(pid: str, path: str) -> tuple[str, int, float]:
        t0 = time.monotonic()
        t = pq_mod.read_table(path, columns=[id_col, text_col])
        rows = hasher(t)
        final = os.path.join(bands_dir, f"part-{pid}.parquet")
        tmp = final + ".tmp"
        pq_mod.write_table(rows, tmp)
        os.replace(tmp, final)  # atomic publish
        return pid, t.num_rows, time.monotonic() - t0

    todo = []
    for pid, p in zip(cur_pids, shard_paths):
        if not shard_done(pid):
            todo.append((pid, p))
    pending = {}
    idx = 0
    while idx < len(todo) or pending:
        while idx < len(todo) and len(pending) < max_in_flight:
            pid, path = todo[idx]
            pending[build_shard.remote(pid, path)] = path
            idx += 1
        ready, _ = ray.wait(list(pending), num_returns=1)
        for ref in ready:
            path = pending.pop(ref)
            pid, n_rows, wall = ray.get(ref)
            mtmp = os.path.join(manifest_dir, f"bands-{pid}.json.tmp")
            with open(mtmp, "w") as f:
                json.dump({"stage": "bands", "partition_id": pid,
                           "input_file": path, "rows": int(n_rows),
                           "wall_sec": wall}, f)
            os.replace(mtmp, os.path.join(manifest_dir, f"bands-{pid}.json"))
    if _fail_after == "bands":
        raise RuntimeError("simulated kill after stage bands")

    def _write_stage(pairs_ds, path: str, empty_df: pd.DataFrame) -> None:
        """Sink a stage output atomically; an empty result still publishes
        a typed parquet file so read_back keeps the schema. The stage
        records the SHARD SET it was computed from (inputs_key) so a
        resume whose input glob changed invalidates it instead of
        silently reusing pairs that miss the new shards' docs."""
        m = pairs_ds.materialize()
        if m.count() > 0:
            sinks.write_dataset(m, path)
        else:
            sinks.write_dataset(_as_pairs_ds(empty_df), path)
        with open(os.path.join(path, "STAGE_INPUTS.json"), "w") as f:
            json.dump({"inputs_key": inputs_key,
                       "n_shards": len(cur_pids)}, f)

    def _stage_complete(path: str) -> bool:
        if not os.path.exists(os.path.join(path, sinks.SUCCESS_MARKER)):
            return False
        try:
            with open(os.path.join(path, "STAGE_INPUTS.json")) as f:
                return json.load(f).get("inputs_key") == inputs_key
        except Exception:
            return False  # missing/corrupt stage meta -> recompute stage

    # -- stage B: LSH candidate pairs (global shuffle) ---------------------
    if not _stage_complete(cand_dir):
        # read ONLY the current shards' band files: stale partials from a
        # removed shard must not feed ghost doc ids into the candidates
        band_ds = rd.read_parquet(
            [os.path.join(bands_dir, f"part-{pid}.parquet")
             for pid in cur_pids])
        _write_stage(
            lsh_candidate_pairs(band_ds, id_col, dedupe=False), cand_dir,
            pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64")}))
    if _fail_after == "candidates":
        raise RuntimeError("simulated kill after stage candidates")

    # -- stage C: payload gather + estimate filter + exact verify ----------
    if not _stage_complete(ver_dir):
        cand = sinks.read_back(cand_dir).materialize()
        if cand.count() == 0:
            _write_stage(_as_pairs_ds(_EMPTY_JACCARD_PAIRS()), ver_dir,
                         _EMPTY_JACCARD_PAIRS())
        else:
            docs = rd.read_parquet(shard_paths, columns=[id_col, text_col])
            _write_stage(
                _minhash_verify_candidates(docs, cand, text_col, id_col,
                                           threshold, num_perm, shingle_k),
                ver_dir, _EMPTY_JACCARD_PAIRS())
    return sinks.read_back(ver_dir)


# ---------------------------------------------------------------------------
# near-dup clusters (connected components over the pair graph)
# ---------------------------------------------------------------------------

def neardup_clusters(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                     driver_limit: int = 5_000_000, max_rounds: int = 64):
    """Connected components over a near-dup pair graph → one row per doc
    that appears in at least one pair: ``(doc_id, cluster_id)`` where
    ``cluster_id`` is the MIN doc id in the component (the canonical
    survivor a dedup keep-one-per-cluster pass retains). Docs with no
    near-dups form no row (they are their own cluster trivially).

    Size-routed like every gather in this module:

    - ≤ ``driver_limit`` pairs: union-find on the driver (path-halving);
      near-dup pair sets are sparse by construction at real thresholds,
      so this is the common route and is exact and cheap.
    - above the limit: distributed min-label propagation — each round is
      one coarse groupby folding ``min(label of self, labels of
      neighbors)``; labels only ever DECREASE, so ``sum(label)`` is a
      monotone convergence witness (one tiny aggregate per round, no
      driver-side table compare). Rounds needed = O(component diameter);
      near-dup components are shallow (dup clusters, not paths), and
      ``max_rounds`` guards pathological chains.

    Both routes produce identical labels (route-identity test).
    """
    import ray.data as rd

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "cluster_id": pd.Series([], dtype="int64")})
    pairs_ds = pairs_ds.select_columns([id_a, id_b]).materialize()
    n = pairs_ds.count()
    if n == 0:
        return rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))

    if n <= driver_limit:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for b in pairs_ds.iter_batches(batch_size=65536,
                                       batch_format="pyarrow"):
            for a_, b_ in zip(b[id_a].to_pylist(), b[id_b].to_pylist()):
                ra, rb = find(int(a_)), find(int(b_))
                if ra != rb:  # union by MIN id keeps labels canonical
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
        out = pd.DataFrame(
            {"doc_id": sorted(parent),
             "cluster_id": [find(x) for x in sorted(parent)]}
        ).astype("int64")
        return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))

    # -- distributed route: iterative min-label propagation ----------------
    # Each round is TWO coarse hash(node) groupbys, no joins: bucket fold
    # 1 co-locates every node's current labels WITH its incident edge
    # rows and emits (a) the node's folded min label and (b) one message
    # per edge carrying that label to the neighbor; bucket fold 2 folds
    # messages+labels to the new per-node min. Shuffle volume per round =
    # edges + labels narrow int rows; labels only DECREASE, so
    # ``sum(label)`` is a monotone convergence witness (one tiny
    # aggregate per round). (Dataset.join is avoided deliberately: with
    # near-empty key partitions the partitioned hash join cannot infer
    # the right-side schema.)
    #
    # Rows are (node, kind, val) with NO nulls — kind 0 = label row
    # (val=label), kind 1 = edge row (val=peer). A nullable int64 column
    # would become float64 inside the pandas map_groups batches and
    # silently ROUND ids above 2^53 (hash-derived 64-bit ids), breaking
    # route identity with the driver union-find.
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")

    def seed_and_edges(b: pa.Table) -> pa.Table:
        a = b[id_a].combine_chunks()
        c = b[id_b].combine_chunks()
        both = pa.concat_arrays([a, c])
        n2 = len(both)
        return pa.table({
            "node": pa.concat_arrays([both, both]),
            "kind": pa.array(np.repeat(np.array([0, 1], np.int8), n2),
                             pa.int8()),
            "val": pa.concat_arrays([both, pa.concat_arrays([c, a])]),
        })

    def node_coarse(b: pa.Table) -> pa.Table:
        v = b["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            k = splitmix64(v) % np.uint64(_COARSE_BUCKETS)
        return b.append_column("nc", pa.array(k.astype(np.int64), pa.int64()))

    def fold_and_message(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["nc"])
        lab = df[df["kind"] == 0].groupby("node", sort=False)["val"] \
            .min().reset_index()
        ed = df[df["kind"] == 1][["node", "val"]].rename(columns={"val": "peer"})
        msg = ed.merge(lab, on="node", how="inner")  # vectorized per bucket
        out = pd.concat(
            [lab[["node", "val"]],
             pd.DataFrame({"node": msg["peer"].to_numpy(np.int64),
                           "val": msg["val"].to_numpy(np.int64)})],
            ignore_index=True)
        return out.astype({"node": "int64", "val": "int64"})

    def min_fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=["nc"]).groupby("node", sort=False)["val"] \
            .min().reset_index()
        return out.astype({"node": "int64", "val": "int64"})

    edges_keyed = pairs_ds.map_batches(
        seed_and_edges, batch_format="pyarrow"
    ).map_batches(node_coarse, batch_format="pyarrow").materialize()

    def edge_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.equal(b["kind"], pa.scalar(1, pa.int8())))

    state = edges_keyed
    labels = None
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        folded = state.groupby("nc").map_groups(
            fold_and_message, batch_format="pandas"
        ).map_batches(node_coarse, batch_format="pyarrow")
        labels = folded.groupby("nc").map_groups(
            min_fold, batch_format="pandas").materialize()
        cur_sum = labels.sum("val")
        if cur_sum == prev_sum:  # labels only decrease; fixpoint reached
            converged = True
            break
        prev_sum = cur_sum

        # next round's state: folded labels + the static edge rows
        def as_state(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": b["node"],
                "kind": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
                "val": b["val"],
            })

        state = labels.map_batches(as_state, batch_format="pyarrow").union(
            edges_keyed.map_batches(edge_rows, batch_format="pyarrow")
            .drop_columns(["nc"])
        ).map_batches(node_coarse, batch_format="pyarrow")

    if not converged:
        # returning a partially-propagated labeling would be silently
        # WRONG (labels not yet component minima) — fail loudly instead
        raise RuntimeError(
            f"neardup_clusters: no fixpoint after {max_rounds} rounds "
            "(component diameter exceeds max_rounds); raise max_rounds"
        )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["node"], "cluster_id": b["val"]})

    return labels.map_batches(finish, batch_format="pyarrow")


def neardup_filter(ds, clusters_ds, id_col: str = "doc_id",
                   broadcast_limit: int = 50_000_000):
    """Keep-one-per-cluster corpus filter: drop every doc whose cluster
    label is NOT itself (the canonical min-id survivor stays; docs in no
    cluster are untouched). The loser-id set is at most the clustered-doc
    count — near-dup losers are sparse at real thresholds — so it
    broadcasts (anti semi-join, big side streams, no shuffle) under the
    documented limit and falls back to Ray's partitioned LEFT-ANTI hash
    join above it (every corpus row must be checked against the loser
    set either way, so there is no Bloom shortcut: a Bloom "maybe"
    cannot drop a row from an ANTI join without an exact verify)."""
    import pyarrow.compute as pc

    from .join import broadcast_semi_join

    def losers(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["doc_id"], b["cluster_id"])
        return pa.table({"__loser": b.filter(keep)["doc_id"]})

    loser_ds = clusters_ds.map_batches(losers, batch_format="pyarrow").materialize()
    n_losers = loser_ds.count()
    if n_losers <= broadcast_limit:
        return broadcast_semi_join(ds, loser_ds, big_key=id_col,
                                   small_key="__loser", anti=True)
    npart = int(max(8, min(64, n_losers // 10_000_000 + 8)))
    return ds.join(loser_ds, "left_anti", npart,
                   on=(id_col,), right_on=("__loser",))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash per doc from word-level hashes, vectorized across the
    whole batch: one hash pass over every word + one segmented bit-vote
    (reduceat) per doc.

    ``hasher="hash64"`` (default) uses the engine's fast vectorized hash;
    ``hasher="sha256"`` derives the word hash from the first 16 hex chars
    of sha256(word) — slower, but cross-engine reproducible, so a SQL
    oracle can recompute the identical simhash (the hash_sample
    precedent)."""

    def __init__(self, text_col: str = "text", out_col: str = "simhash",
                 hasher: str = "hash64") -> None:
        if hasher not in ("hash64", "sha256"):
            raise ValueError("hasher must be 'hash64' or 'sha256'")
        self.text_col, self.out_col, self.hasher = text_col, out_col, hasher

    @staticmethod
    def simhash64(words: list[str]) -> int:
        if not words:
            return 0
        return int(SimHasher._batch([words])[0])

    @staticmethod
    def _batch(word_lists: list[list[str]], hasher: str = "hash64") -> np.ndarray:
        counts = np.fromiter((len(w) for w in word_lists), dtype=np.int64,
                             count=len(word_lists))
        flat: list[str] = [w for ws in word_lists for w in ws]
        out = np.zeros(len(word_lists), dtype=np.uint64)
        if not flat:
            return out
        if hasher == "sha256":
            sha = hashlib.sha256
            h = np.fromiter(
                (int(sha(w.encode("utf-8")).hexdigest()[:16], 16)
                 for w in flat),
                dtype=np.uint64, count=len(flat))
        else:
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
        out = self._batch(word_lists, self.hasher)
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
    hasher: str = "hash64",
):
    """SimHash near-dup: 64-bit simhash per doc, 4 tables of 16 bits for
    candidate banding — by pigeonhole, any pair within Hamming distance 3
    shares at least one EXACT 16-bit band, so recall is total (not
    probabilistic) at max_hamming <= 3. The per-doc state is just 8
    bytes, so each banding row CARRIES the full simhash and the Hamming
    verify runs vectorized inside the bucket fold -- no gather join, no
    driver dict, and only verified (near-dup) pairs ever leave a bucket.
    One coarse groupby for the buckets + one for cross-band pair dedup;
    driver-unbounded at corpus scale.

    Returns a DATASET of (id_a, id_b, hamming) pairs — sink or
    ``.to_pandas()`` at the caller's scale. ``hasher="sha256"`` keys the
    simhash so a SQL oracle reproduces the whole pipeline.
    """
    kwargs: dict[str, Any] = {"batch_format": "pyarrow"}
    if concurrency:
        kwargs["concurrency"] = concurrency
    sims = ds.select_columns([id_col, text_col]).map_batches(
        SimHasher(text_col, hasher=hasher), **kwargs
    ).select_columns([id_col, "simhash"])

    def band(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        h = np.asarray(batch["simhash"].to_pylist(), dtype=np.uint64)
        tables = np.arange(4, dtype=np.uint64)
        keys = ((h[:, None] >> (tables * np.uint64(16))) & np.uint64(0xFFFF))
        # fold table idx into the key so one groupby covers all 4 tables
        band_key = (keys | (tables << np.uint64(16)))
        return pa.Table.from_arrays(
            [pa.array(np.repeat(ids, 4), pa.int64()),
             pa.array(band_key.ravel(), pa.uint64()),
             pa.array(np.repeat(h, 4), pa.uint64())],
            names=[id_col, "band_hash", "simhash"],
        )

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "hamming": pd.Series([], dtype="int64")})
    band_rows = sims.map_batches(band, batch_format="pyarrow")

    def add_coarse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        coarse = pc.cast(
            pc.bit_wise_and(batch["band_hash"],
                            pa.scalar(_COARSE_BUCKETS - 1, pa.uint64())),
            pa.int64(),
        )
        return batch.append_column("coarse", coarse)

    def verified_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        for _, sub in df.groupby("band_hash", sort=False):
            u = sub.drop_duplicates(id_col)
            ids = u[id_col].to_numpy(np.int64)
            if ids.size < 2:
                continue
            hs = u["simhash"].to_numpy().astype(np.uint64)
            ia, ib = np.triu_indices(ids.size, k=1)
            ham = hamming64(hs[ia], hs[ib])
            keep = ham <= max_hamming
            out_a.append(np.minimum(ids[ia[keep]], ids[ib[keep]]))
            out_b.append(np.maximum(ids[ia[keep]], ids[ib[keep]]))
            out_h.append(ham[keep])
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_h)}).drop_duplicates(
            ["id_a", "id_b"])

    cand = band_rows.map_batches(add_coarse, batch_format="pyarrow").groupby(
        "coarse"
    ).map_groups(lambda df: verified_pairs(df.drop(columns=["coarse"])),
                 batch_format="pandas")

    def pair_coarse(batch: pa.Table) -> pa.Table:
        ia = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ib = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            key = splitmix64(ia * np.uint64(0x9E3779B97F4A7C15) ^ ib)
        return batch.append_column(
            "pc", pa.array((key % np.uint64(_COARSE_BUCKETS)).astype(np.int64),
                           pa.int64())
        )

    def dedupe_fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["id_a", "id_b"]).drop(columns=["pc"])
        return out.assign(hamming=out["hamming"].astype("int64"))

    return cand.map_batches(pair_coarse, batch_format="pyarrow").groupby(
        "pc"
    ).map_groups(dedupe_fold, batch_format="pandas")


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

def embedding_neardup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    lsh_threshold: float = 0.8,
):
    """Cosine near-dup join, routed by OUTPUT DENSITY. Returns a DATASET
    of (id_a, id_b, cosine) pairs on both routes.

    - ``threshold >= lsh_threshold`` (sparse-output regime, the real
      near-dup setting): the OR-amplified LSH path — sublinear candidate
      generation, exact verify, no all-pairs stage; this is the 10^9-row
      route.
    - lower thresholds sit inside the bulk of the pairwise-similarity
      distribution, where the ANSWER itself is Θ(n²) pairs — no correct
      algorithm beats quadratic work there (LSH banding degenerates to
      emitting every pair), so the exact block-pair join is the right
      tool and is used directly (documented ≤10^6-row escape hatch).

    Boundary recall: the LSH route's miss probability is highest for
    pairs sitting exactly AT the routing boundary — p_miss ≈ 0.13 at
    cosine 0.80 with the default tables, falling to ≈3e-5 by 0.98 (see
    :func:`embedding_neardup_lsh`). The default ``threshold`` therefore
    sits well above ``lsh_threshold`` (0.95, p_miss ≈ 5e-3 at the
    threshold itself and ~0 for the near-1.0 cosines true duplicates
    have); callers pinning ``threshold == lsh_threshold`` accept the
    worst-case boundary recall or should pass a lower ``lsh_threshold``
    to shift the routing point.
    """
    if threshold >= lsh_threshold:
        return embedding_neardup_lsh(ds, vec_col, id_col, threshold)
    return _as_pairs_ds(exact_cosine_pairs(ds, vec_col, id_col, threshold))


def embedding_neardup_lsh(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_tables: int = 24,
    planes_per_table: int = 16,
    seed: int = 42,
):
    """Cosine near-dup via OR-amplified random-hyperplane LSH + exact
    verify — the corpus-scale route of ``embedding_neardup`` for
    SPARSE-OUTPUT thresholds (no O(B²) block-pair stage anywhere).

    Each vector gets ``n_tables`` band keys, one per table of
    ``planes_per_table`` sign bits; any pair agreeing on ALL bits of at
    least one table becomes a candidate (``lsh_candidate_pairs`` — the
    same machinery as MinHash banding). Candidates then get an EXACT
    cosine verify via the partitioned gather join, so precision is exact.
    A pair at angle θ is missed only if every table splits it:
    p_miss = (1 − (1 − θ/π)^r)^L — with the defaults (r=16, L=24),
    ≈3e-5 at cosine 0.98 and ≈0.13 at exactly 0.9, i.e. recall is total
    for true near-duplicates and degrades only inside the θ-gap (the
    standard LSH contract; planted-dup recall gate in tests). r=16 keeps
    2^16 buckets per table so candidate volume tracks the true pair
    count, not n²/buckets. Cosines are rounded half-away at 6 dp before
    thresholding, matching ``exact_cosine_pairs`` / the SQL oracle.
    """

    def band_stage(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        V = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        U = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        rng = np.random.default_rng(seed)  # planes fixed by (seed, dim)
        planes = rng.standard_normal((U.shape[1], n_tables * planes_per_table))
        bits = ((U @ planes) > 0).astype(np.uint64)
        bits = bits.reshape(-1, n_tables, planes_per_table)
        keys = (bits << np.arange(planes_per_table, dtype=np.uint64)).sum(axis=2)
        return pa.Table.from_arrays(
            [pa.array(np.repeat(ids, n_tables), pa.int64()),
             pa.array(np.tile(np.arange(n_tables, dtype=np.int32), ids.size), pa.int32()),
             pa.array(keys.ravel(), pa.uint64())],
            names=[id_col, "band", "band_hash"],
        )

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "cosine": pd.Series([], dtype="float64")})
    band_rows = ds.select_columns([id_col, vec_col]).map_batches(
        band_stage, batch_format="pyarrow")
    cand = lsh_candidate_pairs(band_rows, id_col, dedupe=False).materialize()
    if cand.count() == 0:
        return _as_pairs_ds(empty)

    import ray

    from .join import bloom_semi_join

    def ids_of(b: pa.Table) -> pa.Table:
        return pa.table({"did": pa.concat_arrays(
            [b["id_a"].combine_chunks(), b["id_b"].combine_chunks()])})

    vecs_needed = bloom_semi_join(
        ds.select_columns([id_col, vec_col]),
        cand.map_batches(ids_of, batch_format="pyarrow"),
        big_key=id_col, small_key="did",
        capacity=max(1024, 2 * cand.count()), fpr=0.01,
    )

    def unit_payload(batch: pa.Table) -> pa.Table:
        V = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        U = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pa.table({"join_id": batch[id_col],
                         "payload": pa.array([U[i].tobytes() for i in range(U.shape[0])],
                                             pa.large_binary())})

    side = vecs_needed.map_batches(unit_payload, batch_format="pyarrow").materialize()
    npart = int(max(8, min(64, cand.count() // 250_000 + 8)))

    def _cosine_keep(df: pd.DataFrame, A: np.ndarray, B: np.ndarray) -> pd.DataFrame:
        S = np.einsum("ij,ij->i", A, B)
        # 6-dp half-away rounding before thresholding (exact_cosine_pairs)
        Sr = np.floor(np.abs(S) * 1e6 + 0.5) / 1e6 * np.sign(S)
        out = df.assign(cosine=Sr)
        return out[out["cosine"] >= threshold]

    if side.size_bytes() <= _SHINGLE_BROADCAST_BYTES:
        # broadcast the unit vectors (gated by byte size): verify is one
        # fused map over the candidate stream — no join actors
        ids_s, vals, offs = _collect_payload_index(side)
        dim = int(offs[1] - offs[0]) if ids_s.size else 1
        mat = vals.view(np.float64).reshape(-1, dim)
        ref = ray.put((ids_s, mat))

        def verify_bcast(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.Table.from_pandas(empty, preserve_index=False)
            ids_sorted, m = ray.get(ref)
            a = batch["id_a"].to_numpy(zero_copy_only=False)
            b = batch["id_b"].to_numpy(zero_copy_only=False)
            ia, ok_a = _lookup_sorted(ids_sorted, a)
            ib, ok_b = _lookup_sorted(ids_sorted, b)
            keep = ok_a & ok_b  # missing payload -> pair dropped
            a, b, ia, ib = a[keep], b[keep], ia[keep], ib[keep]
            df = pd.DataFrame({"id_a": a, "id_b": b})
            out = _cosine_keep(df, m[ia], m[ib])
            return pa.Table.from_pandas(out, preserve_index=False)

        verified = cand.map_batches(verify_bcast, batch_format="pyarrow")
    else:
        def verify(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return empty
            A = np.frombuffer(b"".join(df["payload_a"]), np.float64).reshape(len(df), -1)
            B = np.frombuffer(b"".join(df["payload_b"]), np.float64).reshape(len(df), -1)
            return _cosine_keep(df[["id_a", "id_b"]], A, B)

        verified = attach_pair_payloads(cand, side, num_partitions=npart).map_batches(
            verify, batch_format="pandas"
        )
    # cross-band duplicate candidates dedup at result scale
    return _dedupe_pairs(verified)


def embedding_neardup_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
):
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

    # Dataset out (pandas conversion is the caller's choice, like every
    # other pair-producing op in this module)
    return rows.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# incremental dedup against a persisted content-hash index
# ---------------------------------------------------------------------------

def build_dedup_index(ds, index_root: str, text_col: str = "text") -> str:
    """Persist the corpus content-hash index: the DISTINCT sha256 hex of
    every ``text_col`` value, written as partitioned parquet with the
    engine's atomic ``_SUCCESS`` publish (``engine/sinks.write_dataset``).
    sha256 keeps the index collision-free at any corpus size (hash
    equality == content equality — the exact_dedup contract), so later
    shards can dedup against the INDEX without re-reading the corpus.

    Plan: hash + project in one fused map (content never leaves the
    read stage), per-block unique, one coarse hash(h) fold for the
    global distinct, then the sink. Index volume is distinct docs × 64
    bytes."""
    from ..engine.hashing import append_coarse_bucket
    from ..engine.sinks import write_dataset

    def hashes(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h = add_content_hash(b, text_col)["content_hash"]
        return pa.table({"content_hash": pc.unique(h.combine_chunks())})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["content_hash"])

    distinct = (ds.map_batches(hashes, batch_format="pyarrow")
                .map_batches(lambda b: append_coarse_bucket(
                    b, ["content_hash"], 256, "__b"),
                    batch_format="pyarrow")
                .groupby("__b")
                .map_groups(lambda df: fold(df.drop(columns="__b")),
                            batch_format="pandas"))
    return write_dataset(distinct, index_root)


def incremental_dedup(incoming_ds, index_root: str, text_col: str = "text",
                      id_col: str = "doc_id",
                      broadcast_limit: int = 2_000_000,
                      index_broadcast_limit: int | None = None):
    """Dedup an INCOMING shard against a persisted corpus index
    (:func:`build_dedup_index`) — the production ingestion pattern: new
    data arrives continuously; the corpus itself is never re-read.

    Two stages, both size-routed:

    1. index probe — drop incoming rows whose content hash is already
       in the index: broadcast anti-join (``ray.put`` the hash set,
       one vectorized ``is_in`` per batch) while the index fits under
       ``broadcast_limit`` rows; the partitioned hash-bucket anti-join
       above it (no driver gather — the 100-TB route).
    2. within-shard dedup — :func:`exact_dedup` keeps the min-id row
       per surviving text (new duplicates of each other).

    Returns the surviving incoming rows (original columns) as a
    Dataset. The caller appends the survivors' hashes to the index for
    the next shard (see ``queries.q_incremental_dedup`` — union +
    rewrite through the same atomic sink)."""
    from ..engine.sinks import read_back
    from .join import broadcast_semi_join, partitioned_semi_join

    idx = read_back(index_root)
    hashed = incoming_ds.map_batches(
        lambda b: add_content_hash(b, text_col), batch_format="pyarrow")
    if index_broadcast_limit is None:
        index_broadcast_limit = broadcast_limit
    if idx.count() <= index_broadcast_limit:
        fresh = broadcast_semi_join(hashed, idx, "content_hash",
                                    anti=True)
    else:
        fresh = partitioned_semi_join(hashed, idx, "content_hash",
                                      anti=True)
    cols = [c for c in incoming_ds.schema().names]
    return exact_dedup(fresh.select_columns(cols),  # exact_dedup rehashes
                       text_col=text_col, id_col=id_col,
                       broadcast_limit=broadcast_limit)


# ---------------------------------------------------------------------------
# edit-distance fuzzy dedup
# ---------------------------------------------------------------------------

_TEXT_BROADCAST_BYTES = 256 << 20


def batch_levenshtein(texts_a: list, texts_b: list) -> np.ndarray:
    """Exact Levenshtein distance for a BATCH of string pairs, vectorized
    across pairs via anti-diagonal dynamic programming: diagonal d of
    every pair's DP matrix is computed in one numpy step from diagonals
    d-1/d-2 (deletion/insertion from d-1, substitution from d-2 with the
    equality costs gathered as a reversed slice), so the Python loop is
    O(max_len_a + max_len_b) per batch — never per pair, never per cell.
    Cells outside a shorter pair's matrix hold garbage but can never flow
    into valid cells (a valid cell's three parents are valid); each
    pair's answer is captured when d reaches len_a+len_b.

    Operates on UTF-8 BYTES — identical to character-level distance on
    ASCII corpora (the DuckDB ``levenshtein`` replay contract; the bench
    corpus is pure ASCII)."""
    P = len(texts_a)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    enc_a = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in texts_a]
    enc_b = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in texts_b]
    la = np.array([e.size for e in enc_a], dtype=np.int64)
    lb = np.array([e.size for e in enc_b], dtype=np.int64)
    M, N = int(la.max()), int(lb.max())
    A = np.zeros((P, max(M, 1)), dtype=np.int16)
    # pad B with -1 (≠ any byte and ≠ A's 0-pad); width M+N so the
    # reversed diagonal slices never truncate
    B = np.full((P, M + N + 1), -1, dtype=np.int16)
    for p in range(P):
        A[p, : la[p]] = enc_a[p]
        B[p, : lb[p]] = enc_b[p]
    BIG = np.int32(1 << 29)
    total = la + lb
    ans = np.zeros(P, dtype=np.int64)
    prev2 = np.full((P, M + 1), BIG, np.int32)  # diagonal d-2
    prev = np.full((P, M + 1), BIG, np.int32)   # diagonal d-1
    prev2[:, 0] = 0                             # d=0: cell (0,0)
    prev[:, 0] = 1                              # d=1: cell (0,1)
    if M >= 1:
        prev[:, 1] = 1                          # d=1: cell (1,0)
    ans[total == 1] = 1
    for d in range(2, M + N + 1):
        cur = np.full((P, M + 1), BIG, np.int32)
        cur[:, 0] = d                           # boundary cell (0, d)
        if d <= M:
            cur[:, d] = d                       # boundary cell (d, 0)
        i1 = min(M, d - 1)
        if i1 >= 1:
            dele = prev[:, 0:i1] + 1            # from (i-1, j)
            ins = prev[:, 1:i1 + 1] + 1         # from (i, j-1)
            # substitution cost: A[i-1] vs B[d-i-1] for i = 1..i1 — the
            # B side is a reversed contiguous slice
            b_sl = B[:, d - 1 - i1:d - 1][:, ::-1]
            sub = prev2[:, 0:i1] + (A[:, 0:i1] != b_sl)
            cur[:, 1:i1 + 1] = np.minimum(np.minimum(dele, ins), sub)
        hit = total == d
        if hit.any():
            ans[hit] = cur[hit, la[hit]]
        prev2, prev = prev, cur
    return ans


def fuzzy_dedup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_floor: float = 0.5,
    min_edit_sim: float = 0.9,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
):
    """Edit-distance fuzzy dedup: MinHash/LSH candidates verified by
    exact shingle Jaccard (≥ ``jaccard_floor`` — :func:`minhash_dedup_pairs`,
    whose oracle proves LSH recall at this floor), then refined by EXACT
    Levenshtein distance: a pair survives iff
    ``1 - lev/max(len_a, len_b) >= min_edit_sim`` (the CCNet/Gopher-style
    "same doc modulo small edits" rule that token-set Jaccard alone
    cannot express — transpositions and reorderings keep Jaccard high
    but blow up edit distance).

    The text gather onto the verified-pair stream is SIZE-ROUTED like
    every near-dup verify in this module: the candidate-doc payload side
    broadcasts under ``_TEXT_BROADCAST_BYTES`` (``ray.put`` once,
    searchsorted lookup per batch), else it rides the partitioned hash
    join (:func:`attach_pair_payloads`). Both routes run
    :func:`batch_levenshtein`, so results are identical.

    Returns a Dataset of (id_a, id_b, lev int64, edit_sim round6)."""
    import ray

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "lev": pd.Series([], dtype="int64"),
                          "edit_sim": pd.Series([], dtype="float64")})
    pairs = minhash_dedup_pairs(
        ds, text_col, id_col, threshold=jaccard_floor,
        num_perm=num_perm, bands=bands, shingle_k=shingle_k).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return _as_pairs_ds(empty)

    from .join import bloom_semi_join

    def ids_of(b: pa.Table) -> pa.Table:
        return pa.table({"did": pa.concat_arrays(
            [b["id_a"].combine_chunks(), b["id_b"].combine_chunks()])})

    docs_needed = bloom_semi_join(
        ds.select_columns([id_col, text_col]),
        pairs.map_batches(ids_of, batch_format="pyarrow"),
        big_key=id_col, small_key="did",
        capacity=max(1024, 2 * n_pairs), fpr=0.01,
    ).materialize()

    def _verify_rows(ids_a, ids_b, ta: list, tb: list) -> pd.DataFrame:
        la = np.fromiter((len(t) for t in ta), np.int64, len(ta))
        lb = np.fromiter((len(t) for t in tb), np.int64, len(tb))
        mx = np.maximum(la, lb)
        # two DP-free prunes, both DECISION-IDENTICAL to the full DP:
        # lev >= |la-lb| always, so a pair whose length gap alone sinks
        # it below min_edit_sim is dropped without DP; equal texts are
        # lev 0 without DP (the dominant case in record linkage).
        gap_ok = 1.0 - np.abs(la - lb) / np.maximum(mx, 1) >= min_edit_sim
        eq = np.fromiter((a == b for a, b in zip(ta, tb)),
                         np.bool_, len(ta)) & gap_ok
        need = gap_ok & ~eq
        lev = np.zeros(len(ta), dtype=np.int64)
        if need.any():
            ix = need.nonzero()[0]
            lev[ix] = batch_levenshtein([ta[i] for i in ix],
                                        [tb[i] for i in ix])
        lev[~gap_ok] = mx[~gap_ok]  # pruned pairs: any failing value
        # the UNROUNDED ratio decides the filter — bit-identical to the
        # SQL replay's WHERE (one correctly-rounded double division)
        sim = 1.0 - lev / np.maximum(mx, 1)
        sim[~gap_ok] = -1.0  # force-drop pruned pairs
        out = pd.DataFrame({
            "id_a": np.asarray(ids_a, np.int64),
            "id_b": np.asarray(ids_b, np.int64),
            "lev": lev,
            "edit_sim": np.sign(sim) * np.floor(np.abs(sim) * 1e6 + 0.5) / 1e6,
        })
        return out[sim >= min_edit_sim]

    if docs_needed.size_bytes() <= _TEXT_BROADCAST_BYTES:
        df = docs_needed.to_pandas()
        order = np.argsort(df[id_col].to_numpy(np.int64))
        ref = ray.put((df[id_col].to_numpy(np.int64)[order],
                       df[text_col].to_numpy(object)[order]))

        def verify_bcast(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.Table.from_pandas(empty, preserve_index=False)
            ids_sorted, texts = ray.get(ref)  # shared-memory read
            a = batch["id_a"].to_numpy(zero_copy_only=False)
            b = batch["id_b"].to_numpy(zero_copy_only=False)
            ia, ok_a = _lookup_sorted(ids_sorted, a)
            ib, ok_b = _lookup_sorted(ids_sorted, b)
            keep = ok_a & ok_b  # missing payload -> pair dropped
            a, b, ia, ib = a[keep], b[keep], ia[keep], ib[keep]
            out = _verify_rows(a, b, list(texts[ia]), list(texts[ib]))
            return pa.Table.from_pandas(out, preserve_index=False)

        return pairs.map_batches(verify_bcast, batch_format="pyarrow")

    side = docs_needed.map_batches(
        lambda b: pa.table({"join_id": b[id_col], "payload": b[text_col]}),
        batch_format="pyarrow")
    npart = int(max(8, min(64, n_pairs // 250_000 + 8)))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty
        return _verify_rows(df["id_a"].to_numpy(), df["id_b"].to_numpy(),
                            list(df["payload_a"]), list(df["payload_b"]))

    return attach_pair_payloads(pairs, side, num_partitions=npart) \
        .map_batches(verify, batch_format="pandas")


def fuzzy_join(
    ds_a,
    ds_b,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_floor: float = 0.5,
    min_edit_sim: float = 0.9,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
):
    """Entity resolution / record linkage: match rows of table A to rows
    of table B by text content — LSH candidates → exact shingle Jaccard
    ≥ ``jaccard_floor`` → exact Levenshtein edit-similarity ≥
    ``min_edit_sim``, exactly :func:`fuzzy_dedup_pairs`' rule but
    ACROSS two tables (the dedup machinery is reused wholesale: ids are
    side-encoded as ``2·id + side`` into one union Dataset — ids must
    fit 62 bits — and within-side pairs are dropped after the verify).
    Returns a Dataset of (id_a from A, id_b from B, lev, edit_sim)."""

    def enc(side: int):
        def f(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if ids.size and int(ids.max()) >= (1 << 62):
                raise ValueError("fuzzy_join: ids must fit 62 bits")
            return pa.table({
                id_col: pa.array(ids * 2 + side, pa.int64()),
                text_col: b[text_col]})
        return f

    u = ds_a.select_columns([id_col, text_col]) \
        .map_batches(enc(0), batch_format="pyarrow").union(
            ds_b.select_columns([id_col, text_col])
            .map_batches(enc(1), batch_format="pyarrow"))
    pairs = fuzzy_dedup_pairs(
        u, text_col, id_col, jaccard_floor, min_edit_sim,
        num_perm=num_perm, bands=bands, shingle_k=shingle_k)

    def decode(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False)
        c = b["id_b"].to_numpy(zero_copy_only=False)
        cross = (a % 2) != (c % 2)
        a, c = a[cross], c[cross]
        left = np.where(a % 2 == 0, a, c) // 2
        right = np.where(a % 2 == 0, c, a) // 2
        return pa.table({
            "id_a": pa.array(left, pa.int64()),
            "id_b": pa.array(right, pa.int64()),
            "lev": b["lev"].filter(pa.array(cross)),
            "edit_sim": b["edit_sim"].filter(pa.array(cross)),
        })

    return pairs.map_batches(decode, batch_format="pyarrow")


def quality_keep_filter(ds, clusters_ds, quality_ds,
                        id_col: str = "doc_id",
                        score_col: str = "q_score",
                        num_buckets: int = 64,
                        broadcast_limit: int = 50_000_000,
                        attach_limit_rows: int = 2_000_000):
    """QUALITY-AWARE keep-one-per-cluster: within each near-dup cluster
    keep the member with the highest ROUND6 quality score (ties →
    smallest id) instead of the blunt min-id rule — the resolution
    policy an actual curation pipeline wants (drop the duplicate, keep
    the better-written copy). Rounding before the argmax makes the
    keeper decision identical to a SQL replay that rounds the score
    the same way (the kmeans_assign recipe).

    Plan: scores attach to the (sparse) clustered-doc rows SIZE-ROUTED
    (broadcast under ``attach_limit_rows`` quality rows, partitioned
    hash join above — the quality side is corpus-sized); ONE coarse
    ``hash(cluster)`` fold ranks each cluster and emits its LOSERS
    (all but the keeper — losers are at most the clustered-doc count,
    sparse at real thresholds); the corpus filter is the
    neardup_filter anti semi-join, broadcast under
    ``broadcast_limit``."""
    import numpy as np

    from .join import attach_by_key, broadcast_semi_join

    scored = attach_by_key(clusters_ds, quality_ds, id_col, id_col,
                           [score_col],
                           broadcast_limit_rows=attach_limit_rows)

    def coarse(b: pa.Table) -> pa.Table:
        from ..engine.hashing import append_coarse_bucket

        return append_coarse_bucket(b, ["cluster_id"], num_buckets,
                                    "__qb")

    def losers_fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__qb")
        if df.empty:
            return pd.DataFrame({
                "__loser": pd.Series([], dtype="int64")})
        q = df[score_col].to_numpy(np.float64)
        df = df.assign(__q6=np.sign(q)
                       * np.floor(np.abs(q) * 1e6 + 0.5) / 1e6)
        df = df.sort_values(["cluster_id", "__q6", id_col],
                            ascending=[True, False, True],
                            kind="mergesort")
        lose = df[df.duplicated("cluster_id")]
        return pd.DataFrame({
            "__loser": lose[id_col].to_numpy(np.int64)})

    loser_ds = (scored.map_batches(coarse, batch_format="pyarrow")
                .groupby("__qb")
                .map_groups(losers_fold, batch_format="pandas")
                .materialize())
    n_losers = loser_ds.count()
    if n_losers <= broadcast_limit:
        return broadcast_semi_join(ds, loser_ds, big_key=id_col,
                                   small_key="__loser", anti=True)
    npart = int(max(8, min(64, n_losers // 10_000_000 + 8)))
    return ds.join(loser_ds, "left_anti", npart,
                   on=(id_col,), right_on=("__loser",))


def substring_containment(ds, text_col: str = "text",
                          id_col: str = "doc_id", w: int = 16,
                          num_buckets: int = 256,
                          short_broadcast_limit: int = 1_000_000):
    """Exact substring-containment dedup: every (inner, outer) doc pair
    where ``inner.text`` appears VERBATIM inside ``outer.text`` (inner
    ≠ outer) — the "this doc is a quote/chunk/mirror of that doc"
    screen that Jaccard near-dup misses when the container is much
    longer than the contained.

    FULL-RECALL blocking with one anchor: if inner ⊆ outer then
    inner's first ``w`` BYTES occur at some pure window of outer, so
    candidates = join of each doc's prefix-window hash against every
    doc's distinct w-byte window-hash postings
    (:func:`_batch_shingle_hashes` — the minhash shingle stream at
    k=w; pad-contaminated tail windows can only produce false
    candidates, never lose true ones). One coarse ``hash(window)``
    shuffle forms candidates; the text gather onto the deduped pair
    stream is SIZE-ROUTED exactly like every verify in this module
    (broadcast payload index under ``_TEXT_BROADCAST_BYTES``,
    partitioned hash join above); the verify itself is one vectorized
    elementwise ``np.char.find`` on CHARACTER strings, so byte-level
    blocking artifacts (mid-codepoint matches, hash collisions) are
    filtered and the result equals DuckDB ``position(a IN b) > 0``
    ground truth. Docs shorter than ``w`` cannot anchor a pure prefix
    window; they take a broadcast-contains fallback (gated by
    ``short_broadcast_limit`` — the short side is tiny by
    construction). Returns a Dataset of (inner_id, outer_id)."""
    import ray

    from ..engine.hashing import append_coarse_bucket

    empty = pd.DataFrame({"inner_id": pd.Series([], dtype="int64"),
                          "outer_id": pd.Series([], dtype="int64")})

    def posting_rows(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sh, offs = _batch_shingle_hashes(texts, w)
        doc_of = np.repeat(ids, np.diff(offs))
        df = pd.DataFrame({"h": sh, "oid": doc_of}).drop_duplicates()
        t = pa.table({"h": pa.array(df["h"].to_numpy(np.uint64)),
                      "oid": pa.array(df["oid"].to_numpy(np.int64)),
                      "iid": pa.array(
                          np.full(len(df), -1, dtype=np.int64))})
        # inner anchors: prefix-window hash of every len >= w doc
        lens = np.fromiter(
            (len((t_ or "").encode("utf-8")) for t_ in texts),
            np.int64, len(texts))
        ok = lens >= w
        anchors = pa.table({
            "h": pa.array(sh[offs[:-1]][ok]),
            "oid": pa.array(np.full(int(ok.sum()), -1, dtype=np.int64)),
            "iid": pa.array(ids[ok])})
        both = pa.concat_tables([t, anchors])
        return append_coarse_bucket(both, ["h"], num_buckets, "__hb")

    def cand_fold(df: pd.DataFrame) -> pd.DataFrame:
        inner = df[df["iid"] >= 0][["h", "iid"]]
        outer = df[df["oid"] >= 0][["h", "oid"]]
        if inner.empty or outer.empty:
            return empty
        m = inner.merge(outer, on="h")
        m = m[m["iid"] != m["oid"]].drop_duplicates(["iid", "oid"])
        return pd.DataFrame({"inner_id": m["iid"].to_numpy(np.int64),
                             "outer_id": m["oid"].to_numpy(np.int64)})

    cand = (ds.select_columns([id_col, text_col])
            .map_batches(posting_rows, batch_format="pyarrow")
            .groupby("__hb")
            .map_groups(lambda df: cand_fold(df.drop(columns="__hb")),
                        batch_format="pandas")).materialize()
    results = []
    n_cand = cand.count()
    if n_cand > 0:
        # cross-bucket duplicates (same pair anchored by several
        # prefix-hash collisions are impossible — one anchor per inner
        # — but dedup defensively across buckets anyway)
        from .join import bloom_semi_join

        def ids_of(b: pa.Table) -> pa.Table:
            return pa.table({"did": pa.concat_arrays(
                [b["inner_id"].combine_chunks(),
                 b["outer_id"].combine_chunks()])})

        docs_needed = bloom_semi_join(
            ds.select_columns([id_col, text_col]),
            cand.map_batches(ids_of, batch_format="pyarrow"),
            big_key=id_col, small_key="did",
            capacity=max(1024, 2 * n_cand), fpr=0.01).materialize()

        def _verify(ia, ib, ta, tb) -> pd.DataFrame:
            if len(ia) == 0:
                return empty
            found = np.char.find(np.asarray(tb, dtype=object).astype(str),
                                 np.asarray(ta, dtype=object).astype(str))
            keep = found >= 0
            return pd.DataFrame({
                "inner_id": np.asarray(ia, np.int64)[keep],
                "outer_id": np.asarray(ib, np.int64)[keep]})

        if docs_needed.size_bytes() <= _TEXT_BROADCAST_BYTES:
            dfd = docs_needed.to_pandas()
            order = np.argsort(dfd[id_col].to_numpy(np.int64))
            ref = ray.put((dfd[id_col].to_numpy(np.int64)[order],
                           dfd[text_col].to_numpy(object)[order]))

            def verify_bcast(batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0:
                    return pa.Table.from_pandas(empty,
                                                preserve_index=False)
                ids_sorted, texts = ray.get(ref)
                a = batch["inner_id"].to_numpy(zero_copy_only=False)
                b = batch["outer_id"].to_numpy(zero_copy_only=False)
                ia, ok_a = _lookup_sorted(ids_sorted, a)
                ib, ok_b = _lookup_sorted(ids_sorted, b)
                keep = ok_a & ok_b
                a, b, ia, ib = a[keep], b[keep], ia[keep], ib[keep]
                out = _verify(a, b, list(texts[ia]), list(texts[ib]))
                return pa.Table.from_pandas(out, preserve_index=False)

            results.append(cand.map_batches(verify_bcast,
                                            batch_format="pyarrow"))
        else:
            side = docs_needed.map_batches(
                lambda b: pa.table({"join_id": b[id_col],
                                    "payload": b[text_col]}),
                batch_format="pyarrow")

            def verify_join(df: pd.DataFrame) -> pd.DataFrame:
                if df.empty:
                    return empty
                return _verify(df["id_a"].to_numpy(),
                               df["id_b"].to_numpy(),
                               list(df["payload_a"]),
                               list(df["payload_b"]))

            renamed = cand.map_batches(
                lambda b: pa.table({"id_a": b["inner_id"],
                                    "id_b": b["outer_id"]}),
                batch_format="pyarrow")
            npart = int(max(8, min(64, n_cand // 250_000 + 8)))
            results.append(
                attach_pair_payloads(renamed, side, num_partitions=npart)
                .map_batches(
                    lambda df: verify_join(df).rename(
                        columns={"id_a": "inner_id",
                                 "id_b": "outer_id"}),
                    batch_format="pandas"))

    # short-doc fallback: docs under w bytes can't anchor a window
    def short_rows(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        lens = np.fromiter(
            (len((t_ or "").encode("utf-8")) for t_ in texts),
            np.int64, len(texts))
        ok = lens < w
        return pa.table({
            "sid": pa.array(b[id_col].to_numpy(
                zero_copy_only=False).astype(np.int64)[ok]),
            "stext": pa.array(
                np.asarray(texts, dtype=object)[ok], pa.string())})

    shorts = ds.select_columns([id_col, text_col]) \
        .map_batches(short_rows, batch_format="pyarrow").materialize()
    if shorts.count() > 0:
        if shorts.count() > short_broadcast_limit:
            raise ValueError(
                "substring_containment: short-doc side exceeds the "
                "broadcast gate; lower w or raise the limit")
        sdf = shorts.to_pandas()
        sref = ray.put((sdf["sid"].to_numpy(np.int64),
                        sdf["stext"].to_numpy(object)))

        def probe_shorts(b: pa.Table) -> pa.Table:
            sid, stext = ray.get(sref)
            ids = b[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            texts = np.asarray(b[text_col].to_pylist(), dtype=object)
            outs, inns = [], []
            for j in range(len(sid)):  # short side is tiny by gate
                hit = np.char.find(texts.astype(str),
                                   str(stext[j])) >= 0
                hit &= ids != sid[j]
                outs.append(ids[hit])
                inns.append(np.full(int(hit.sum()), sid[j], np.int64))
            return pa.table({
                "inner_id": pa.array(
                    np.concatenate(inns) if inns
                    else np.zeros(0, np.int64)),
                "outer_id": pa.array(
                    np.concatenate(outs) if outs
                    else np.zeros(0, np.int64))})

        results.append(ds.select_columns([id_col, text_col])
                       .map_batches(probe_shorts, batch_format="pyarrow"))

    if not results:
        return _as_pairs_ds(empty)
    out = results[0]
    if len(results) > 1:
        out = out.union(*results[1:])
    return out


def dedup_lineage(ds, text_col: str = "text", id_col: str = "doc_id",
                  buckets: int = 256):
    """Dedup EXPLAINABILITY: the (dropped_id, winner_id) pair for every
    row exact dedup would remove — the audit trail a compliance/debug
    pass needs ("why is doc X gone, and which copy survived?"), which
    :func:`exact_dedup`'s survivors-only output cannot answer.

    Same narrow exchange as exact_dedup phase 1 — (content_hash, id)
    rows, never content — but WITHOUT the block-winner pre-reduce
    (every loser is an output row, so all ids must reach the fold); one
    coarse hash(content_hash) shuffle, winner = min id per hash in a
    vectorized fold. Returns a Dataset of (dropped_id, winner_id) —
    duplicate-volume sized."""

    def hash_and_bucket(b: pa.Table) -> pa.Table:
        from ..engine.hashing import hash64_batch_aligned

        b = add_content_hash(b, text_col)
        h, _ = hash64_batch_aligned(b["content_hash"])
        return pa.table({
            "content_hash": b["content_hash"],
            id_col: b[id_col],
            "hash_bucket": pa.array(
                (h % np.uint64(buckets)).astype(np.int64), pa.int64())})

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        win = df.groupby("content_hash", sort=False)[id_col] \
            .transform("min")
        out = df[df[id_col] != win]
        return pd.DataFrame({
            "dropped_id": out[id_col].to_numpy(np.int64),
            "winner_id": win[df[id_col] != win].to_numpy(np.int64)})

    return (ds.map_batches(hash_and_bucket, batch_format="pyarrow")
            .groupby("hash_bucket")
            .map_groups(lambda d: losers(d.drop(columns="hash_bucket")),
                        batch_format="pandas"))


def build_neardup_index(ds, index_root: str, text_col: str = "text",
                        id_col: str = "doc_id", num_perm: int = 64,
                        bands: int = 16, shingle_k: int = 5) -> str:
    """Persist the corpus's LSH BAND INDEX — (id, band, band_hash) rows
    as an atomic parquet sink plus a params manifest — so tomorrow's
    incoming batch can be near-dup-checked against ALL history without
    ever re-banding the corpus (the streaming-ingest counterpart of
    :func:`build_dedup_index`'s exact sha256 store)."""
    import json

    from ..engine.sinks import write_dataset

    rows = ds.map_batches(
        MinHasher(text_col, id_col, num_perm, bands, shingle_k),
        batch_format="pyarrow")
    write_dataset(rows, index_root)
    with open(os.path.join(index_root, "_neardup_params.json"), "w") as f:
        json.dump({"num_perm": num_perm, "bands": bands,
                   "shingle_k": shingle_k, "id_col": id_col}, f)
    return index_root


def incremental_neardup(incoming_ds, history_ds, index_root: str,
                        threshold: float = 0.5, text_col: str = "text",
                        id_col: str = "doc_id",
                        new_rows_limit: int = 2_000_000) -> pa.Table:
    """Streaming near-dup check of an INCOMING batch against a persisted
    band index (:func:`build_neardup_index`): the index STREAMS (probed
    block-by-block against the broadcast new-side band rows — incoming
    is the small side by construction, refused above ``new_rows_limit``
    band rows), candidates dedupe, and survivors verify with EXACT
    shingle Jaccard — the same vectorized one-lexsort pass the batch
    pipeline uses, over candidate-volume-bounded text gathers (new side
    is at hand; old side arrives via a broadcast semi-filter on the
    candidate id set). Returns (new_id, old_id, jaccard round6)
    ordered — history is never re-banded and never gathered whole."""
    import json

    import ray

    from ..engine.sinks import read_back

    with open(os.path.join(index_root, "_neardup_params.json")) as f:
        params = json.load(f)
    hasher = MinHasher(text_col, id_col, params["num_perm"],
                       params["bands"], params["shingle_k"])
    k = params["shingle_k"]

    new_rows = incoming_ds.map_batches(hasher, batch_format="pyarrow") \
        .to_pandas()
    if len(new_rows) > new_rows_limit:
        raise ValueError(
            "incremental_neardup: incoming band rows exceed the "
            "broadcast contract — split the batch")
    ref = ray.put(new_rows)

    def probe(b: pa.Table) -> pa.Table:
        nr = ray.get(ref)
        df = b.to_pandas().merge(
            nr, on=["band", "band_hash"], suffixes=("_old", "_new"))
        df = df[[f"{id_col}_new", f"{id_col}_old"]].drop_duplicates()
        return pa.table({
            "new_id": pa.array(df[f"{id_col}_new"].to_numpy(np.int64)),
            "old_id": pa.array(df[f"{id_col}_old"].to_numpy(np.int64))})

    cand = read_back(index_root).map_batches(
        probe, batch_format="pyarrow").to_pandas().drop_duplicates()
    if cand.empty:
        return pa.table({"new_id": pa.array([], pa.int64()),
                         "old_id": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    # candidate-bounded text gathers
    new_texts = incoming_ds.select_columns([id_col, text_col]) \
        .to_pandas().set_index(id_col)[text_col]
    old_idset = ray.put(np.unique(cand["old_id"].to_numpy(np.int64)))

    def keep_old(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(np.isin(ids, ray.get(old_idset))))

    old_texts = history_ds.select_columns([id_col, text_col]) \
        .map_batches(keep_old, batch_format="pyarrow") \
        .to_pandas().set_index(id_col)[text_col]

    # signature-agreement estimate filter BEFORE exact verify (the
    # batch pipeline's decision-safe cut: threshold − 2.5σ under the
    # 64-perm binomial — band collisions on similar prefixes can leave
    # 50× more candidates than true pairs; measured 61s → ~8s at sf0.1)
    num_perm = params["num_perm"]
    sigma = float(np.sqrt(threshold * (1 - threshold) / num_perm))
    cut = max(0.0, threshold - 2.5 * sigma)
    uniq_new = cand["new_id"].unique()
    uniq_old = cand["old_id"].unique()
    sig_new = dict(zip(uniq_new, batch_minhash_signatures(
        [new_texts.loc[i] for i in uniq_new], k, num_perm)))
    sig_old = dict(zip(uniq_old, batch_minhash_signatures(
        [old_texts.loc[i] for i in uniq_old], k, num_perm)))
    A = np.stack([sig_new[i] for i in cand["new_id"]])
    B = np.stack([sig_old[i] for i in cand["old_id"]])
    cand = cand[(A == B).mean(axis=1) >= cut]
    if cand.empty:
        return pa.table({"new_id": pa.array([], pa.int64()),
                         "old_id": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    sets_new = {i: shingle_hash_set(new_texts.loc[i], k)
                for i in cand["new_id"].unique()}
    sets_old = {i: shingle_hash_set(old_texts.loc[i], k)
                for i in cand["old_id"].unique()}
    ids_n = cand["new_id"].to_numpy(np.int64)
    ids_o = cand["old_id"].to_numpy(np.int64)
    sa = [sets_new[i] for i in ids_n]
    sb = [sets_old[i] for i in ids_o]
    npairs = len(ids_n)
    sizes_a = np.fromiter((s.size for s in sa), np.int64, npairs)
    sizes_b = np.fromiter((s.size for s in sb), np.int64, npairs)
    values = np.concatenate(
        [v for pair in zip(sa, sb) for v in pair]) \
        if npairs else np.zeros(0, np.uint64)
    segs = np.repeat(np.arange(npairs, dtype=np.int64),
                     sizes_a + sizes_b)
    order = np.lexsort((values, segs))
    v, s = values[order], segs[order]
    dup = (v[1:] == v[:-1]) & (s[1:] == s[:-1])
    inter = np.bincount(s[1:][dup], minlength=npairs)
    union = sizes_a + sizes_b - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    keep = jac >= threshold
    out = pd.DataFrame({
        "new_id": ids_n[keep], "old_id": ids_o[keep],
        "jaccard": np.sign(jac[keep])
        * np.floor(np.abs(jac[keep]) * 1e6 + 0.5) / 1e6}) \
        .sort_values(["new_id", "old_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
