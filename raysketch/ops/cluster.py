"""Distributed k-means over an embedding column — the clustering-based
curation step of a training-data pipeline (cluster-balanced sampling,
topic discovery, IVF coarse quantizers at corpus scale; the driver-side
trainer in ops/similarity.py handles only sample-sized inputs).

Everything here is deterministic end to end:

- :func:`kmeans_seeds` — the k corpus vectors with the smallest
  :func:`seed_key32` value (a Knuth-multiplicative + murmur-finalizer
  integer mix, ties by id). VECTORIZED — one numpy pass per block,
  ~30× faster than the round-3 per-row ``hashlib.sha256`` rule — and
  still exactly SQL-replayable: every op is *, %, //, xor on
  non-negative BIGINT/HUGEINT, so DuckDB
  ``ORDER BY skey, id LIMIT k`` picks the same rows (the fingerprints
  HUGEINT-arithmetic oracle recipe, queries.py). Distributed: per-block
  k smallest candidates, driver folds blocks × k tiny rows.
- :func:`kmeans_assign` — one assignment pass: unit-normalize each batch
  (float64), one matmul against the broadcast centroid matrix, argmax on
  the ROUND6 cosine with smallest-centroid-id tiebreak. Rounding before
  the argmax makes the decision identical to a SQL replay that rounds
  ``list_cosine_similarity`` the same way (the embedding_neardup parity
  recipe) even though the two sides order the float ops differently.
- :func:`kmeans_fit` — Lloyd iterations, each ONE streaming pass: the
  centroid matrix is broadcast (``ray.put``), every block emits
  per-cluster partial (count, sum-vector, min-id) rows — k rows per
  block, never raw vectors — and a tiny ``groupby(cluster)`` fold
  re-averages. Partial sums within a cluster are added in min-id order,
  so the float fold is run-to-run deterministic for a fixed block
  structure. Empty clusters keep their previous centroid (the classic
  Lloyd convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def seed_key32(ids: np.ndarray) -> np.ndarray:
    """Deterministic 32-bit spreading key for seed selection over
    non-negative int64 ids: Knuth multiplicative hash + the standard
    murmur-style finalizer, all in uint64 ops (one vectorized pass).
    Exactly replayable in DuckDB integer arithmetic::

        CAST(xor(h2, h2 // 65536) AS BIGINT) with
        h2 = (xor(h1, h1 // 65536) * 73244475) % 4294967296,
        h1 = (CAST(id AS HUGEINT) * 2654435761) % 4294967296

    (``// 65536`` == ``>> 16`` for non-negative values; the HUGEINT
    cast keeps ids up to 2^63 exact — parity is test-pinned)."""
    h = (np.asarray(ids).astype(np.uint64) * np.uint64(2654435761)) \
        & np.uint64(0xFFFFFFFF)
    h = ((h ^ (h >> np.uint64(16))) * np.uint64(0x45D9F3B)) \
        & np.uint64(0xFFFFFFFF)
    return (h ^ (h >> np.uint64(16))).astype(np.int64)


def _round6(a: np.ndarray) -> np.ndarray:
    return np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6


def kmeans_seeds(ds, k: int, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Return (seed_ids int64[k], seed_vecs float64[k, d]) — the k corpus
    rows with smallest (seed_key32(id), id); one vectorized numpy pass
    per block (the round-3 per-row sha256 loop is gone)."""

    def candidates(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hx = seed_key32(ids)
        top = np.lexsort((ids, hx))[:k]
        # slice the k candidate rows at the Arrow level FIRST — a
        # to_pylist of the whole block's vectors just to keep k rows
        # would cost per-row Python objects across the entire corpus
        vecs = b[vec_col].take(pa.array(top, pa.int64()))
        V = np.asarray(vecs.to_pylist(), dtype=np.float64)
        return pa.table({
            "__hx": pa.array(hx[top], pa.int64()),
            id_col: pa.array(ids[top], pa.int64()),
            "__vec": pa.array(list(V), pa.list_(pa.float64())),
        })

    cand = (
        ds.select_columns([id_col, vec_col])
        .map_batches(candidates, batch_format="pyarrow")
        .to_pandas()
    )
    cand = cand.sort_values(["__hx", id_col], kind="mergesort").head(k)
    seed_ids = cand[id_col].to_numpy(np.int64)
    seed_vecs = np.stack(cand["__vec"].to_numpy()).astype(np.float64)
    return seed_ids, seed_vecs


class _Assign:
    """Stateless batch fn over a broadcast (ids, unit centroid matrix)."""

    def __init__(self, ref, vec_col: str, id_col: str) -> None:
        self.ref, self.vec_col, self.id_col = ref, vec_col, id_col

    def __call__(self, b: pa.Table) -> pa.Table:
        import ray

        cent_ids, C = ray.get(self.ref)
        V = _unit(np.asarray(b[self.vec_col].to_pylist(), dtype=np.float64))
        sims = _round6(V @ C.T)  # decision on the rounded value
        # argmax with smallest-centroid-id tiebreak: centroid columns are
        # already in ascending id order, and np.argmax takes the first max
        order = np.argsort(cent_ids, kind="stable")
        best = np.argmax(sims[:, order], axis=1)
        return pa.table({
            self.id_col: b[self.id_col],
            "cluster_id": pa.array(cent_ids[order][best], pa.int64()),
            "cosine": pa.array(sims[np.arange(len(best)), order[best]],
                               pa.float64()),
        })


def kmeans_assign(ds, cent_ids, cent_vecs, vec_col="embedding", id_col="vec_id"):
    """One assignment pass; returns a Dataset (id, cluster_id, cosine)."""
    import ray

    ref = ray.put((np.asarray(cent_ids, dtype=np.int64),
                   _unit(np.asarray(cent_vecs, dtype=np.float64))))
    return ds.select_columns([id_col, vec_col]).map_batches(
        _Assign(ref, vec_col, id_col), batch_format="pyarrow"
    )


def kmeans_fit(
    ds,
    init_ids,
    init_vecs,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 10,
    tol: float = 1e-6,
    driver_reduce_limit: int = 4_000_000,
):
    """Distributed Lloyd iterations from the given centroids; returns
    (cent_ids, centroids, n_iters_run). ``ds`` should be materialized by
    the caller when it is the product of an upstream pipeline (each
    iteration re-consumes it).

    The per-iteration reduce is SIZE-ROUTED: the partial stream is
    ``blocks × k`` rows of d floats, and when that fits
    ``driver_reduce_limit`` floats the fold runs driver-side (a Ray
    shuffle per iteration costs ~1s of pure scheduling at small scale);
    above the limit a ``groupby(cluster)`` dataset fold keeps the reduce
    distributed. Both folds sum in min-id order — bit-identical
    centroids either way (route identity is test-pinned)."""
    import ray

    cent_ids = np.asarray(init_ids, dtype=np.int64)
    order = np.argsort(cent_ids, kind="stable")
    cent_ids = cent_ids[order]
    C = _unit(np.asarray(init_vecs, dtype=np.float64))[order]
    kk = len(cent_ids)
    dim = C.shape[1]
    try:
        nblocks = ds.num_blocks()
    except Exception:
        nblocks = None
    driver_reduce = (
        nblocks is not None and nblocks * kk * dim <= driver_reduce_limit
    )

    for it in range(iters):
        ref = ray.put((cent_ids, C))

        def partial(b: pa.Table) -> pa.Table:
            cids, Cm = ray.get(ref)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            V = _unit(np.asarray(b[vec_col].to_pylist(), dtype=np.float64))
            best = np.argmax(_round6(V @ Cm.T), axis=1)
            rows_c, rows_n, rows_s, rows_m = [], [], [], []
            for j in np.unique(best):
                m = best == j
                rows_c.append(int(j))
                rows_n.append(int(m.sum()))
                rows_s.append(V[m].sum(axis=0))
                rows_m.append(int(ids[m].min()))
            return pa.table({
                "cluster": pa.array(rows_c, pa.int64()),
                "n": pa.array(rows_n, pa.int64()),
                "s": pa.array([r.tolist() for r in rows_s],
                              pa.list_(pa.float64())),
                "min_id": pa.array(rows_m, pa.int64()),
            })

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values("min_id", kind="mergesort")  # deterministic sum order
            s = np.stack(df["s"].to_numpy()).sum(axis=0)
            return pd.DataFrame({
                "cluster": [int(df["cluster"].iloc[0])],
                "n": [int(df["n"].sum())],
                "s": [s.tolist()],
            })

        partials = ds.map_batches(partial, batch_format="pyarrow")
        if driver_reduce:
            pdf = partials.to_pandas()
            folded = pd.concat(
                [fold(g) for _, g in pdf.groupby("cluster", sort=True)],
                ignore_index=True,
            ) if len(pdf) else pdf
        else:
            folded = (
                partials.groupby("cluster")
                .map_groups(fold, batch_format="pandas")
                .to_pandas()
            )
        newC = C.copy()
        for _, r in folded.iterrows():
            if r["n"] > 0:
                newC[int(r["cluster"])] = np.asarray(r["s"]) / r["n"]
        newC = _unit(newC)
        delta = float(np.abs(newC - C).max())
        C = newC
        if delta < tol:
            return cent_ids, C, it + 1
    return cent_ids, C, iters


def feature_hashing(ds, features, n_dims: int = 32,
                    id_col: str = "doc_id"):
    """The hashing trick (Weinberger et al. 2009): project arbitrary
    categorical features into a fixed ``n_dims``-dimensional signed
    count vector without a vocabulary pass — the feature-engineering
    step a training pipeline runs before model input at corpus scale
    (no global dictionary to build, ship, or grow).

    ``features`` maps feature NAME → a callable(batch: pa.Table) →
    numpy object array of string values; each row contributes the
    token ``"<name>=<value>"``. For every token,
    ``h = uint64(first 16 hex chars of sha256(token))``, landing in
    ``dim = h % n_dims`` with ``sign = 1 − 2·((h // n_dims) % 2)``
    (sign bits independent of the dim bits) — both replayable in SQL
    (DuckDB ``sha256`` + HUGEINT arithmetic), so the oracle gates the
    whole projection.

    Pure per-block streaming: hashes are computed once per DISTINCT
    token in the block (feature domains are tiny relative to rows)
    and mapped vectorized; emits aggregated (id, dim, weight) rows,
    weight = signed collision count. No shuffle at any corpus size."""
    import hashlib

    if n_dims < 1:
        raise ValueError("n_dims must be >= 1")
    names = sorted(features)

    def project(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        frames = []
        for name in names:
            vals = features[name](b)
            toks = np.asarray([f"{name}={v}" for v in vals], dtype=object)
            uniq, inv = np.unique(toks, return_inverse=True)
            h = np.asarray([
                int(hashlib.sha256(t.encode()).hexdigest()[:16], 16)
                for t in uniq], dtype=np.uint64)
            dim = (h % np.uint64(n_dims)).astype(np.int64)
            sign = 1 - 2 * ((h // np.uint64(n_dims)) % np.uint64(2)) \
                .astype(np.int64)
            frames.append(pd.DataFrame({
                id_col: ids, "dim": dim[inv], "w": sign[inv]}))
        out = pd.concat(frames, ignore_index=True) \
            .groupby([id_col, "dim"], as_index=False)["w"].sum()
        return pa.table({
            id_col: pa.array(out[id_col].to_numpy(np.int64)),
            "dim": pa.array(out["dim"].to_numpy(np.int64)),
            "weight": pa.array(out["w"].to_numpy(np.int64))})

    return ds.map_batches(project, batch_format="pyarrow")


def kcenter_select(ds, k: int, vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   driver_value_limit: int = 2_000_000) -> pa.Table:
    """Greedy k-center (Gonzalez) coreset selection over the embedding
    column — the diversity-first subset rule coreset curation uses
    ("pick the point farthest from everything picked so far"). Cosine
    geometry: the next center is the point with the SMALLEST maximum
    round6 cosine similarity to the selected set (ties → smallest id);
    the seed is the smallest id. Rounding before the argmin makes every
    selection decision identical to a SQL replay that rounds
    ``list_cosine_similarity`` the same way (the kmeans_assign recipe),
    so the whole greedy trajectory is bit-replayable.

    Each of the k−1 rounds is ONE streaming pass: the selected unit
    vectors broadcast via ``ray.put`` (k×d floats), every block emits
    its single best candidate row (max-sim, id, vector), and the
    driver folds blocks-many rows — raw vectors never gather. Returns
    (step, id, max_sim): max_sim is the candidate's similarity ceiling
    at selection time (1.0 for the seed by convention), the decreasing
    coverage-radius curve.

    SIZE-ROUTED (the `_DRIVER_FOLD_LIMIT` discipline, budgeted in
    matrix VALUES since vectors are wide): at or under
    ``driver_value_limit`` total floats (rows × dim) the whole greedy
    loop runs once on the driver against the gathered unit matrix —
    k sequential streaming passes over a small table are pure
    per-round pipeline fixed cost (measured 6.8 s → <1 s at 500×64).
    Above the limit, the streaming route runs with the projected
    input pinned in the object store once."""
    import ray

    if k < 1:
        raise ValueError("k must be >= 1")

    proj = ds.select_columns([id_col, vec_col]).materialize()
    n_rows = proj.count()
    if n_rows == 0:
        raise ValueError("kcenter_select: empty input")
    dim = len(proj.take(1)[0][vec_col])
    if n_rows * dim <= driver_value_limit:
        ids_c, vec_c = [], []
        for b in proj.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
            ids_c.append(b[id_col].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
            vec_c.append(np.asarray(b[vec_col].to_pylist(),
                                    dtype=np.float64))
        ids = np.concatenate(ids_c)
        order = np.argsort(ids)
        ids, V = ids[order], _unit(np.concatenate(vec_c)[order])
        sel = [0]  # ids ascending: index 0 is the min-id seed
        steps, out_ids, sims = [0], [int(ids[0])], [1.0]
        for s in range(1, min(k, len(ids))):
            ms = _round6(V @ V[sel].T).max(axis=1)
            j = int(np.lexsort((ids, ms))[0])
            sel.append(j)
            steps.append(s)
            out_ids.append(int(ids[j]))
            sims.append(float(ms[j]))
        return pa.table({
            "step": pa.array(steps, pa.int64()),
            id_col: pa.array(out_ids, pa.int64()),
            "max_sim": pa.array(sims, pa.float64())})
    ds = proj

    def seed_block(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        j = int(np.argmin(ids))
        v = np.asarray(b[vec_col][j : j + 1].to_pylist(),
                       dtype=np.float64)
        return pa.table({
            id_col: pa.array(ids[j : j + 1]),
            "__vec": pa.array(list(v), pa.list_(pa.float64()))})

    cand = ds.select_columns([id_col, vec_col]) \
        .map_batches(seed_block, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(id_col).head(1)
    sel_ids = [int(cand[id_col].iloc[0])]
    sel_vecs = [np.asarray(cand["__vec"].iloc[0], dtype=np.float64)]
    out_steps, out_ids, out_sims = [0], [sel_ids[0]], [1.0]

    for step in range(1, k):
        C = _unit(np.stack(sel_vecs))
        ref = ray.put(C)

        def best_block(b: pa.Table, ref=ref) -> pa.Table:
            import ray as _ray

            Cm = _ray.get(ref)
            ids = b[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            V = _unit(np.asarray(b[vec_col].to_pylist(),
                                 dtype=np.float64))
            ms = _round6(V @ Cm.T).max(axis=1)
            j = int(np.lexsort((ids, ms))[0])  # min sim, then min id
            raw = np.asarray(b[vec_col][j].as_py(), dtype=np.float64)
            return pa.table({
                "__ms": pa.array(ms[j : j + 1], pa.float64()),
                id_col: pa.array(ids[j : j + 1]),
                "__vec": pa.array([raw], pa.list_(pa.float64()))})

        parts = ds.select_columns([id_col, vec_col]) \
            .map_batches(best_block, batch_format="pyarrow").to_pandas()
        parts = parts.sort_values(["__ms", id_col],
                                  kind="mergesort").head(1)
        nid = int(parts[id_col].iloc[0])
        sel_ids.append(nid)
        sel_vecs.append(np.asarray(parts["__vec"].iloc[0],
                                   dtype=np.float64))
        out_steps.append(step)
        out_ids.append(nid)
        out_sims.append(float(parts["__ms"].iloc[0]))

    return pa.table({
        "step": pa.array(out_steps, pa.int64()),
        id_col: pa.array(out_ids, pa.int64()),
        "max_sim": pa.array(out_sims, pa.float64())})
