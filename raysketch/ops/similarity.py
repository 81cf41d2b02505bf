"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one float64 matmul
  against it and emits only its per-batch top-k candidates; a final
  tiny reduce keeps the global top-k per query. Shuffle volume is
  ``num_blocks × queries × k`` rows — independent of corpus size.
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane bucket
  signatures on both corpus and queries; each query searches only its
  bucket (+ optional multi-probe neighbors at Hamming distance 1).
  Approximate: documents the recall/probe trade-off instead of scanning
  everything.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class _BatchTopK:
    """Actor-pool stage: one matmul per batch vs the broadcast queries."""

    def __init__(self, queries_ref, vec_col: str, id_col: str, k: int) -> None:
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.q_ids, self.Q = q  # (nq,), (nq, d) normalized float64
        self.vec_col, self.id_col, self.k = vec_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        V = _normalize(np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float64))
        sims = self.Q @ V.T  # (nq, nb)
        k = min(self.k, V.shape[0])
        out_q, out_n, out_s = [], [], []
        # per-query partial top-k (argpartition then exact sort of k items)
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        for qi in range(self.Q.shape[0]):
            cols = part[qi]
            out_q.extend([int(self.q_ids[qi])] * k)
            out_n.extend(ids[cols].tolist())
            out_s.extend(sims[qi, cols].tolist())
        return pa.Table.from_arrays(
            [
                pa.array(out_q, pa.int64()),
                pa.array(out_n, pa.int64()),
                pa.array(out_s, pa.float64()),
            ],
            names=["query_id", "neighbor_id", "cosine"],
        )


def _final_topk(k: int, exclude_self: bool):
    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            df = df[df["query_id"] != df["neighbor_id"]]
        df = df.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(k)
        df = df.assign(rank=np.arange(1, len(df) + 1, dtype=np.int64))
        return df

    return fold


def brute_force_topk(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    concurrency: int | None = None,
):
    """Exact cosine top-k of every query against the full Dataset.

    Returns a Dataset (query_id, neighbor_id, cosine, rank) with
    deterministic tie-breaking (score desc, neighbor_id asc).
    """
    import ray

    Q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), Q))
    kwargs = {"batch_format": "pyarrow"}
    if concurrency:
        kwargs["concurrency"] = concurrency
        kwargs["fn_constructor_kwargs"] = {
            "queries_ref": ref, "vec_col": vec_col, "id_col": id_col,
            # fetch one extra so excluding self still leaves k
            "k": k + (1 if exclude_self else 0),
        }
        candidates = ds.select_columns([id_col, vec_col]).map_batches(
            _BatchTopK, **kwargs
        )
    else:
        stage = _BatchTopK(ref, vec_col, id_col, k + (1 if exclude_self else 0))
        candidates = ds.select_columns([id_col, vec_col]).map_batches(
            stage.__call__, batch_format="pyarrow"
        )
    return candidates.groupby("query_id").map_groups(
        _final_topk(k, exclude_self), batch_format="pandas"
    )


def _kmeans(X: np.ndarray, k: int, iters: int = 12, seed: int = 42) -> np.ndarray:
    """Plain deterministic Lloyd's k-means on normalized vectors (numpy)."""
    rng = np.random.default_rng(seed)
    C = X[rng.choice(X.shape[0], size=min(k, X.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on unit vectors
        newC = np.zeros_like(C)
        for j in range(C.shape[0]):
            members = X[assign == j]
            newC[j] = members.mean(axis=0) if members.size else C[j]
        newC = _normalize(newC)
        if np.allclose(newC, C, atol=1e-9):
            break
        C = newC
    return C


def _train_coarse_quantizer(ds, vec_col: str, n_cells: int,
                            train_sample: int, seed: int) -> np.ndarray:
    """Train the IVF coarse quantizer on a bounded streaming sample
    (one pass, no shuffle) — shared by :func:`ivf_topk` and
    :func:`_ivf_screen_candidates`. May return FEWER than ``n_cells``
    centroids when the sample is small (callers must clamp n_probe to
    ``C.shape[0]``)."""
    sample: list[np.ndarray] = []
    seen = 0
    for b in ds.select_columns([vec_col]).iter_batches(
            batch_size=4096, batch_format="pyarrow"):
        sample.append(np.asarray(b[vec_col].to_pylist(), np.float64))
        seen += sample[-1].shape[0]
        if seen >= train_sample:
            break
    return _kmeans(_normalize(np.concatenate(sample)[:train_sample]),
                   n_cells, seed=seed)


def ivf_topk(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    train_sample: int = 4096,
    seed: int = 42,
    exclude_self: bool = True,
):
    """IVF approximate top-k: a coarse k-means quantizer (trained on a
    driver-side sample, broadcast once) splits the corpus into cells; each
    query scans only its ``n_probe`` nearest cells. Per-query work is
    ~``n_probe/n_cells`` of the corpus; recall rises with ``n_probe``
    (``n_probe=n_cells`` degenerates to exact brute force).
    """
    import ray

    Q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)

    C = _train_coarse_quantizer(ds, vec_col, n_cells, train_sample, seed)

    # queries per cell (n_probe nearest centroids each), broadcast
    q_cells = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]
    cell_to_q: dict[int, list[int]] = {}
    for qi in range(Q.shape[0]):
        for c in q_cells[qi]:
            cell_to_q.setdefault(int(c), []).append(qi)
    ref = ray.put((qids, Q, C, cell_to_q))

    def tag(batch: pa.Table) -> pa.Table:
        V = _normalize(np.asarray(batch[vec_col].to_pylist(), dtype=np.float64))
        cell = np.argmax(V @ C.T, axis=1).astype(np.int64)
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(cell, pa.int64()),
             pa.array(list(V), pa.list_(pa.float64()))],
            names=[id_col, "cell", "unit"],
        )

    tagged = ds.select_columns([id_col, vec_col]).map_batches(tag, batch_format="pyarrow")

    def search_cell(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        q_ids_all, Qm, _, c2q = _ray.get(ref)
        probes = c2q.get(int(df["cell"].iloc[0]), [])
        if not probes:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        V = np.stack(df["unit"].to_numpy())
        ids = df[id_col].to_numpy()
        sims = Qm[probes] @ V.T
        kk = min(k + 1, V.shape[0])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = []
        for row_i, qi in enumerate(probes):
            for c in part[row_i]:
                rows.append((int(q_ids_all[qi]), int(ids[c]), float(sims[row_i, c])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    candidates = tagged.groupby("cell").map_groups(search_cell, batch_format="pandas")
    return candidates.groupby("query_id").map_groups(
        _final_topk(k, exclude_self), batch_format="pandas"
    )


def lsh_bucketed_topk(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    multiprobe: bool = True,
    seed: int = 42,
    exclude_self: bool = True,
):
    """Approximate top-k: corpus rows keyed by hyperplane-sign bucket;
    each query scans its own bucket and (multiprobe) all Hamming-1
    neighbors. Scale path: per-bucket work is corpus/2^n_planes rows."""
    import ray

    Q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    dim = Q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    def q_buckets(vec: np.ndarray) -> np.ndarray:
        base = int(((vec @ planes > 0).astype(np.uint64)
                    << np.arange(n_planes, dtype=np.uint64)).sum())
        if not multiprobe:
            return np.array([base], dtype=np.uint64)
        return np.array([base] + [base ^ (1 << i) for i in range(n_planes)],
                        dtype=np.uint64)

    # queries per bucket (small driver-side index), broadcast
    bucket_to_q: dict[int, list[int]] = {}
    for qi in range(Q.shape[0]):
        for b in q_buckets(Q[qi]):
            bucket_to_q.setdefault(int(b), []).append(qi)
    ref = ray.put((qids, Q, bucket_to_q))

    def tag(batch: pa.Table) -> pa.Table:
        V = _normalize(np.asarray(batch[vec_col].to_pylist(), dtype=np.float64))
        signs = (V @ planes) > 0
        bucket = (signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(bucket, pa.uint64()),
             pa.array(list(V), pa.list_(pa.float64()))],
            names=[id_col, "bucket", "unit"],
        )

    tagged = ds.select_columns([id_col, vec_col]).map_batches(tag, batch_format="pyarrow")

    def search_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        q_ids_all, Qm, b2q = _ray.get(ref)
        b = int(df["bucket"].iloc[0])
        probes = b2q.get(b, [])
        if not probes:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        V = np.stack(df["unit"].to_numpy())
        ids = df[id_col].to_numpy()
        sims = Qm[probes] @ V.T
        kk = min(k + 1, V.shape[0])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = []
        for row_i, qi in enumerate(probes):
            for c in part[row_i]:
                rows.append((int(q_ids_all[qi]), int(ids[c]), float(sims[row_i, c])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    candidates = tagged.groupby("bucket").map_groups(search_bucket, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["neighbor_id"])
        if exclude_self:
            df = df[df["query_id"] != df["neighbor_id"]]
        df = df.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        return df.assign(rank=np.arange(1, len(df) + 1, dtype=np.int64))

    return candidates.groupby("query_id").map_groups(fold, batch_format="pandas")


# ---------------------------------------------------------------------------
# distributed covariance / PCA over the embedding column
# ---------------------------------------------------------------------------

def covariance(ds, col: str = "embedding"):
    """EXACT population mean and covariance of a ``list<float>`` column in
    one distributed pass: each block reduces to a single
    ``(n, Σx, Σxxᵀ)`` partial (one numpy matmul — d and d² floats per
    BLOCK, never per row), the driver folds blocks × 1 rows, and
    ``C = Σxxᵀ/n − μμᵀ``. Shuffle-free; at 100 TB the fold input is
    blocks × (d²+d) doubles. Returns ``(n, mean[d], cov[d, d])``."""
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        V = np.asarray(b[col].to_pylist(), dtype=np.float64)
        if V.size == 0:
            # Ray 2.49 can hand an empty block; np.asarray([]) is 1-D so
            # sum(axis=0) would scalar-collapse and break the list schema
            return pa.table({
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.list_(pa.float64())),
                "xx": pa.array([], pa.list_(pa.float64())),
            })
        return pa.table({
            "n": pa.array([V.shape[0]], pa.int64()),
            "s": pa.array([V.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "xx": pa.array([(V.T @ V).ravel().tolist()],
                           pa.list_(pa.float64())),
        })

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    # an empty Dataset's to_pandas drops columns entirely (Ray 2.49)
    if len(parts) == 0 or int(parts["n"].sum()) == 0:
        raise ValueError("covariance: empty input")
    n = int(parts["n"].sum())
    s = np.stack(parts["s"].to_numpy()).sum(axis=0)
    d = s.size
    xx = np.stack(parts["xx"].to_numpy()).sum(axis=0).reshape(d, d)
    mean = s / n
    cov = xx / n - np.outer(mean, mean)
    return n, mean, cov


def pca(ds, col: str = "embedding", k: int = 8):
    """Distributed PCA: exact covariance (one pass, above) + driver
    ``eigh`` on the d×d matrix. Components are sign-canonicalized (the
    largest-|entry| coordinate is made positive) so results are
    deterministic across LAPACK builds. Returns ``(mean[d],
    components[k, d] row-major by descending eigenvalue, eigvals[k])``."""
    n, mean, cov = covariance(ds, col)
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T               # (k, d)
    flips = np.sign(comps[np.arange(len(order)),
                          np.abs(comps).argmax(axis=1)])
    comps = comps * flips[:, None]
    return mean, comps, w[order]


def pca_project(ds, mean: np.ndarray, components: np.ndarray,
                col: str = "embedding", out_prefix: str = "pc"):
    """Project every vector onto the fitted components — one centered
    matmul per block via a broadcast of ``(mean, components)``; appends
    ``pc1..pck`` float64 columns and drops the embedding column."""
    import pyarrow as pa
    import ray

    ref = ray.put((np.asarray(mean, dtype=np.float64),
                   np.asarray(components, dtype=np.float64)))

    def project(b: pa.Table) -> pa.Table:
        mu, W = ray.get(ref)
        V = np.asarray(b[col].to_pylist(), dtype=np.float64)
        P = (V - mu) @ W.T
        out = b.drop_columns([col])
        for j in range(W.shape[0]):
            out = out.append_column(f"{out_prefix}{j + 1}",
                                    pa.array(P[:, j], pa.float64()))
        return out

    return ds.map_batches(project, batch_format="pyarrow")


def centroid_cosines(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                     label_col: str = "label"):
    """Per-vector ROUND6 cosine similarity to its own label's centroid —
    the embedding-space outlier / mislabel signal of a curation
    pipeline (low cosine = far from the class mean).

    Two shuffle-free passes:

    1. Centroids: each block reduces to one (label, n, Σx) partial (a
       vectorized per-label column sum — labels × d values per block);
       the driver folds blocks × labels tiny rows and broadcasts the
       label-indexed centroid matrix via ``ray.put`` (labels × d — a
       model-sized side at any corpus size).
    2. Scoring: each block computes ``cos = (x·c) / (√(x·x)·√(c·c))``
       with ONE vectorized gather + row-wise product against the
       broadcast matrix; centroid coordinates are ``s/n`` computed
       BEFORE the dot product, the exact expression the SQL oracle
       replays. Degenerate zero vectors/centroids score 0.0 on both
       sides.

    Returns a Dataset of (id_col, label_col, cos) with ``cos`` round6
    float64."""
    import ray

    def part(b: pa.Table) -> pa.Table:
        V = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        lab = np.asarray(b[label_col].to_pylist(), dtype=np.int64)
        if V.size == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64()))})
        order = np.argsort(lab, kind="stable")
        labs, starts = np.unique(lab[order], return_index=True)
        sums = np.add.reduceat(V[order], starts, axis=0)
        counts = np.diff(np.append(starts, len(lab)))
        return pa.table({
            "label": pa.array(labs, pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
            "s": pa.array([r.tolist() for r in sums],
                          pa.list_(pa.float64()))})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if parts.empty:
        raise ValueError("centroid_cosines: empty input")
    g = parts.groupby("label")
    labels = np.asarray(sorted(g.groups), dtype=np.int64)
    cent = np.stack([
        np.stack(g.get_group(l)["s"].to_numpy()).sum(axis=0)
        / float(g.get_group(l)["n"].sum()) for l in labels])
    cc = (cent * cent).sum(axis=1)  # (labels,)
    ref = ray.put((labels, cent, cc))

    def score(b: pa.Table) -> pa.Table:
        labels_, cent_, cc_ = ray.get(ref)
        V = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        lab = np.asarray(b[label_col].to_pylist(), dtype=np.int64)
        idx = np.searchsorted(labels_, lab)
        C = cent_[idx]
        xc = (V * C).sum(axis=1)
        xx = (V * V).sum(axis=1)
        ccv = cc_[idx]
        ok = (xx > 0) & (ccv > 0)
        cos = np.where(ok, xc / (np.sqrt(xx) * np.sqrt(ccv)), 0.0)
        cos = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
        return pa.table({
            id_col: b[id_col],
            label_col: pa.array(lab, pa.int64()),
            "cos": pa.array(cos, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def ridge_probe(ds, x_col: str = "embedding", y_col: str = "label",
                lam: float = 1e-3) -> pa.Table:
    """Closed-form ridge linear probe on an embedding column — the
    standard "train a linear classifier on frozen features" evaluation,
    with NO iterative training: one distributed pass reduces each block
    to ``(n, XᵀX, XᵀY, class counts)`` partials (two numpy matmuls per
    block — d² + d·k floats per BLOCK, never per row), the driver folds
    them in a deterministic order and solves the one-vs-rest normal
    equations ``(XᵀX + λnI) W = XᵀY``; a second broadcast-scoring pass
    (W via ``ray.put``, argmax per batch) reduces to the per-(label,
    predicted) confusion counts. Both passes stream; nothing
    row-shaped ever reaches the driver. Returns (label, pred, n)
    ordered — train-set confusion of the probe."""
    import pyarrow.compute as pc
    import ray

    classes_df = ds.select_columns([y_col]).map_batches(
        lambda b: pa.table({"y": pc.unique(b[y_col]).cast(pa.int64())}),
        batch_format="pyarrow").to_pandas()
    classes = np.sort(classes_df["y"].unique()).astype(np.int64)
    k = len(classes)
    cindex = {int(c): i for i, c in enumerate(classes)}

    def partial(b: pa.Table) -> pa.Table:
        X = np.asarray(b[x_col].to_pylist(), dtype=np.float64)
        if X.size == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "xtx": pa.array([], pa.list_(pa.float64())),
                             "xty": pa.array([], pa.list_(pa.float64()))})
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        Y = np.zeros((len(y), k))
        Y[np.arange(len(y)), [cindex[int(v)] for v in y]] = 1.0
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "xtx": pa.array([(X.T @ X).ravel().tolist()],
                            pa.list_(pa.float64())),
            "xty": pa.array([(X.T @ Y).ravel().tolist()],
                            pa.list_(pa.float64()))})

    parts = ds.select_columns([x_col, y_col]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    if parts.empty or int(parts["n"].sum()) == 0:
        raise ValueError("ridge_probe: empty input")
    # fold in a deterministic order: block completion order varies
    # run-to-run and float sums are order-sensitive at the last bit —
    # an argmax near-tie must not flip between runs
    parts = parts.sort_values("n", kind="stable").reset_index(drop=True)
    order = np.lexsort((
        [bytes(np.asarray(v, np.float64)) for v in parts["xtx"]],
        parts["n"].to_numpy()))
    n = int(parts["n"].sum())
    d = int(np.sqrt(len(parts["xtx"].iloc[0])))
    XtX = np.zeros((d, d))
    XtY = np.zeros((d, k))
    for i in order:
        XtX += np.asarray(parts["xtx"].iloc[i]).reshape(d, d)
        XtY += np.asarray(parts["xty"].iloc[i]).reshape(d, k)
    W = np.linalg.solve(XtX + lam * n * np.eye(d), XtY)
    w_ref = ray.put((W, classes))

    def score(b: pa.Table) -> pa.Table:
        W, classes = ray.get(w_ref)  # shared-memory read
        X = np.asarray(b[x_col].to_pylist(), dtype=np.float64)
        if X.size == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "pred": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pred = classes[np.argmax(X @ W, axis=1)]
        df = pd.DataFrame({"label": y, "pred": pred,
                           "n": np.ones(len(y), dtype=np.int64)})
        out = df.groupby(["label", "pred"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    conf = ds.select_columns([x_col, y_col]).map_batches(
        score, batch_format="pyarrow").to_pandas()
    conf = conf.groupby(["label", "pred"], as_index=False)["n"].sum() \
        .sort_values(["label", "pred"]).reset_index(drop=True)
    return pa.table({
        "label": pa.array(conf["label"].astype("int64")),
        "pred": pa.array(conf["pred"].astype("int64")),
        "n": pa.array(conf["n"].astype("int64"))})


def embedding_quantization(ds, vec_col: str = "embedding",
                           label_col: str = "label",
                           levels: int = 256) -> pa.Table:
    """Int8-style scalar quantization audit over the embedding column:
    per-dimension min/max (one exact fold) define the codebook; every
    value quantizes to ``floor((v−min)·(levels−1)/range + 0.5)`` and the
    per-label reconstruction error reports what the compression costs —
    the decision pass before shipping quantized vectors to an ANN
    index at 100 TB (4× smaller, how much recall risk). EXACT on both
    sides: inputs are float32 (exact in float64), min/max folds are
    order-free, the quantize expression is evaluated with the same
    shape in DuckDB (identical IEEE doubles → identical codes), and
    per-element |v − recon| rounds half-away to integer micro-units
    before the order-free int64 sum. Returns one row per label:
    (label, n_vecs, n_vals, err_micro).

    Plan: pass 1 per-block (dim, min, max) partials → a dim-sized
    driver fold broadcast back; pass 2 per-block quantize + per-label
    error partials. Raw vectors never gather."""
    import ray

    if levels < 2:
        raise ValueError("levels must be >= 2")

    def minmax(b: pa.Table) -> pa.Table:
        V = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        if V.size == 0:
            return pa.table({"j": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({
            "j": pa.array(np.arange(V.shape[1], dtype=np.int64)),
            "mn": pa.array(V.min(axis=0)),
            "mx": pa.array(V.max(axis=0))})

    parts = ds.select_columns([vec_col]) \
        .map_batches(minmax, batch_format="pyarrow").to_pandas()
    if parts.empty:
        raise ValueError("embedding_quantization: empty input")
    stats = parts.groupby("j").agg(mn=("mn", "min"), mx=("mx", "max"))
    mn = stats["mn"].to_numpy(np.float64)
    mx = stats["mx"].to_numpy(np.float64)
    rng = mx - mn
    if (rng == 0).any():
        raise ValueError("embedding_quantization: constant dimension")
    ref = ray.put((mn, rng))
    q = float(levels - 1)

    def err_partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        mn_, rng_ = _ray.get(ref)
        V = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        lab = b[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if V.size == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64()),
                             "n_vals": pa.array([], pa.int64()),
                             "err_micro": pa.array([], pa.int64())})
        code = np.floor((V - mn_) * q / rng_ + 0.5)
        recon = mn_ + code * rng_ / q
        err = np.abs(V - recon)
        micro = np.floor(err * 1e6 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "label": lab,
            "n_vecs": np.ones(len(lab), np.int64),
            "n_vals": np.full(len(lab), V.shape[1], np.int64),
            "err_micro": micro.sum(axis=1)})
        out = df.groupby("label", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (ds.select_columns([vec_col, label_col])
           .map_batches(err_partial, batch_format="pyarrow")
           .to_pandas().groupby("label", as_index=False).sum()
           .sort_values("label").reset_index(drop=True))
    return pa.table({
        "label": pa.array(agg["label"].to_numpy(np.int64)),
        "n_vecs": pa.array(agg["n_vecs"].to_numpy(np.int64)),
        "n_vals": pa.array(agg["n_vals"].to_numpy(np.int64)),
        "err_micro": pa.array(agg["err_micro"].to_numpy(np.int64))})


_KEY_MAX = np.iinfo(np.int64).max


def _ivf_screen_candidates(mat, id_col: str, vec_col: str,
                           label_col: str | None, k: int, exclude: str,
                           n_cells: int = 16, n_probe: int = 4,
                           train_sample: int = 4096, seed: int = 42,
                           n_rows: int | None = None,
                           dim: int | None = None):
    """Shared IVF-bucketed candidate machinery for the corpus-vs-itself
    similarity screens ABOVE the broadcast budget: a coarse k-means
    quantizer (trained on a bounded sample, broadcast once) assigns
    every row a HOME cell; each row also probes its ``n_probe`` nearest
    cells as a query. One shuffle co-locates members and probes per
    cell (each vector ships ``n_probe`` times — the home cell carries
    one row tagged both member and probe); the per-cell search is the
    same composite-key matmul as the broadcast route ((round6 cosine
    DESC, id ASC) — ids must fit 33 bits), with the probe side chunked
    so the dense slabs stay bounded regardless of cell size. Home
    cells are DISJOINT, so per-query candidates never duplicate across
    cells and the global fold is a pure k-smallest-key merge.
    ``n_cells`` auto-grows so one cell's member matrix stays within a
    fixed value budget (k-means imbalance makes this approximate; the
    probe-side chunking bounds the slabs exactly either way).

    ``exclude``: ``"self"`` (knn/mutual) or ``"same_label"`` (hard
    negatives). Approximate when ``n_probe < n_cells`` — a true
    neighbor outside the probed cells is missed (recall rises with
    n_probe; ``n_probe == n_cells`` is exact by construction). Returns
    a Dataset of (qid[, qlabel][, nbr_label], key) candidates; the
    neighbor id and round6-cosine micros are recoverable from ``key``.
    """
    import ray

    from ..engine.hashing import append_coarse_bucket

    with_label = label_col is not None
    # grow the cell count so one cell's member side stays ~bounded
    # (16M values ≈ 128MB float64 per search task). n_probe grows
    # PROPORTIONALLY: the caller's coverage fraction — and in
    # particular the n_probe == n_cells exactness contract the
    # knn_label_noise_ivf oracle gate relies on — must survive the
    # auto-grow (callers pass n_rows/dim when they already know them).
    if n_rows is None:
        n_rows = mat.count()
    if dim is None:
        dim = len(mat.take(1)[0][vec_col])
    grown = max(n_cells, int(np.ceil(n_rows * dim / 16_000_000)))
    if grown > n_cells:
        n_probe = min(grown, int(np.ceil(n_probe * grown / n_cells)))
        n_cells = grown
    C = _train_coarse_quantizer(mat, vec_col, n_cells, train_sample, seed)
    # the sample can be smaller than n_cells: clamp probes to the
    # centroids that actually exist
    n_probe = min(n_probe, n_cells, C.shape[0])
    cref = ray.put(C)

    def _list_col(X: np.ndarray, rep: np.ndarray) -> pa.Array:
        # repeated list<float64> column straight from the matrix — no
        # per-row Python list loop
        d = X.shape[1]
        offsets = np.arange(0, (len(rep) + 1) * d, d, dtype=np.int32)
        return pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(X[rep].ravel(), pa.float64()))

    def expand(b: pa.Table) -> pa.Table:
        Cm = ray.get(cref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.size and (ids.max() >= (1 << 33) or ids.min() < 0):
            raise ValueError("ivf screen: ids must fit 33 bits "
                             "(composite rank key)")
        X = np.asarray([np.asarray(v, np.float64)
                        for v in b[vec_col].to_pylist()])
        nrm = np.sqrt((X * X).sum(axis=1))
        sims = (X / np.maximum(nrm, 1e-12)[:, None]) @ Cm.T
        probes = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int64)
        home = probes[:, 0]  # argmax == first of the sorted probes
        nb = len(ids)
        # role bitmask per (row, cell): 1=member (home), 2=probe; the
        # home cell carries ONE row with role 3, so each vector ships
        # n_probe times (not 1+n_probe)
        cells = np.concatenate([home] + [probes[:, j]
                                         for j in range(1, n_probe)])
        roles = np.concatenate([np.full(nb, 3, np.int64),
                                np.full(nb * (n_probe - 1), 2, np.int64)])
        rep = np.tile(np.arange(nb), n_probe)
        cols = {"cell": pa.array(cells), "role": pa.array(roles),
                "id": pa.array(ids[rep]),
                "v": _list_col(X, rep),
                "nrm": pa.array(nrm[rep], pa.float64())}
        if with_label:
            lab = b[label_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cols["label"] = pa.array(lab[rep])
        return pa.table(cols)

    def search(df: pd.DataFrame) -> pd.DataFrame:
        M = df[(df["role"].to_numpy() & 1) == 1]
        P = df[(df["role"].to_numpy() & 2) == 2]
        empty_cols = {"qid": pd.Series([], dtype="int64"),
                      "key": pd.Series([], dtype="int64")}
        if with_label:
            empty_cols["qlabel"] = pd.Series([], dtype="int64")
            empty_cols["nbr_label"] = pd.Series([], dtype="int64")
        if M.empty or P.empty:
            return pd.DataFrame(empty_cols)
        Mv = np.stack([np.asarray(v, np.float64) for v in M["v"]])
        mid = M["id"].to_numpy(np.int64)
        mn = M["nrm"].to_numpy(np.float64)
        mlab = M["label"].to_numpy(np.int64) if with_label else None
        pid_all = P["id"].to_numpy(np.int64)
        pn_all = P["nrm"].to_numpy(np.float64)
        plab_all = P["label"].to_numpy(np.int64) if with_label else None
        Pv_all = np.stack([np.asarray(v, np.float64) for v in P["v"]])
        # chunk the probe side so the dense cos/key slabs stay bounded
        # (~32M cells) no matter how big the cell is — the member side
        # is the IVF contract (≈ n/n_cells rows; pick n_cells to match)
        chunk = max(1, (32 << 20) // max(len(mid), 1))
        outs = []
        for s in range(0, len(pid_all), chunk):
            pid = pid_all[s:s + chunk]
            Pv = Pv_all[s:s + chunk]
            pn = pn_all[s:s + chunk]
            cos = (Pv @ Mv.T) / (pn[:, None] * mn[None, :])
            micro = (np.sign(cos)
                     * np.floor(np.abs(cos) * 1e6 + 0.5)).astype(np.int64)
            key = (1_000_000 - micro) * np.int64(1 << 33) + mid[None, :]
            if exclude == "self":
                bad = pid[:, None] == mid[None, :]
            else:
                bad = plab_all[s:s + chunk][:, None] == mlab[None, :]
            key = np.where(bad, _KEY_MAX, key)
            kk = min(k, key.shape[1])
            if kk < key.shape[1]:
                part = np.argpartition(key, kk - 1, axis=1)[:, :kk]
            else:
                part = np.tile(np.arange(key.shape[1]), (len(pid), 1))
            qi = np.repeat(np.arange(len(pid)), part.shape[1])
            ks = key[qi, part.ravel()]
            keep = ks != _KEY_MAX
            out = {"qid": pid[qi][keep], "key": ks[keep]}
            if with_label:
                out["qlabel"] = plab_all[s:s + chunk][qi][keep]
                out["nbr_label"] = mlab[part.ravel()][keep]
            outs.append(pd.DataFrame(out))
        return pd.concat(outs, ignore_index=True)

    cand = (mat.map_batches(expand, batch_format="pyarrow")
            .groupby("cell")
            .map_groups(search, batch_format="pandas"))
    return cand.map_batches(
        lambda b: append_coarse_bucket(b, ["qid"], 64, "__qb"),
        batch_format="pyarrow")


def _topk_fold(k: int):
    """Per-query k-smallest-key merge for IVF screen candidates."""
    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__qb").sort_values(["qid", "key"],
                                                 kind="stable")
        return df.groupby("qid", sort=False).head(k)
    return fold


def knn_label_noise(ds, k: int = 5, id_col: str = "vec_id",
                    vec_col: str = "embedding", label_col: str = "label",
                    broadcast_budget: int = 50_000_000,
                    n_cells: int = 16, n_probe: int = 4):
    """Label-noise screen via k-NN disagreement — the training-data QA
    pass that flags rows whose ``k`` nearest neighbors (ROUND6 cosine,
    id tie-break — the kmeans_assign decision rule, so DuckDB replays
    every ranking) mostly carry a DIFFERENT label. Likely-mislabeled
    rows poison classifier heads; this surfaces them before training.

    SIZE-ROUTED on rows × dim (the kcenter VALUE-budget rule — vectors
    are wide): under ``broadcast_budget`` the (id, vector, label)
    corpus is broadcast ONCE (``ray.put``) and every block does one
    float64 matmul against it — O(n²·d) flops spread across blocks,
    shuffle-free. ABOVE the budget it routes through the IVF-bucketed
    screen (:func:`_ivf_screen_candidates`): same composite decision
    key, one cell shuffle instead of a corpus broadcast; approximate
    when ``n_probe < n_cells`` (exact by construction at
    ``n_probe == n_cells``). Returns a Dataset of
    (id, label, n_same, noisy) with ``noisy = (2·n_same < k)``."""
    import ray

    mat = ds.select_columns([id_col, vec_col, label_col]).materialize()
    n = mat.count()
    if n <= k:
        raise ValueError("knn_label_noise: need more rows than k")
    dim = len(mat.take(1)[0][vec_col])
    if n * dim > broadcast_budget:
        cand = _ivf_screen_candidates(mat, id_col, vec_col, label_col,
                                      k, "self", n_cells, n_probe,
                                      n_rows=n, dim=dim)
        fold_k = _topk_fold(k)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            top = fold_k(df)
            top = top.assign(same=(top["nbr_label"]
                                   == top["qlabel"]).astype(np.int64))
            out = top.groupby("qid", sort=False).agg(
                qlabel=("qlabel", "first"),
                n_same=("same", "sum")).reset_index()
            return pd.DataFrame({
                id_col: out["qid"].to_numpy(np.int64),
                label_col: out["qlabel"].to_numpy(np.int64),
                "n_same": out["n_same"].to_numpy(np.int64),
                "noisy": (2 * out["n_same"].to_numpy(np.int64) < k)
                .astype(np.int64)})

        return cand.groupby("__qb").map_groups(finalize,
                                               batch_format="pandas")
    df = mat.to_pandas()
    X = np.asarray([np.asarray(v, np.float64) for v in df[vec_col]])
    order = np.argsort(df[id_col].to_numpy(np.int64), kind="stable")
    ids = df[id_col].to_numpy(np.int64)[order]
    labels = df[label_col].to_numpy(np.int64)[order]
    X = X[order]
    if ids.max() >= (1 << 33) or ids.min() < 0:
        raise ValueError("knn_label_noise: ids must fit 33 bits "
                         "(composite rank key)")
    norms = np.sqrt((X * X).sum(axis=1))
    ref = ray.put((ids, labels, X, norms))

    def score(b: pa.Table) -> pa.Table:
        r_ids, r_labels, R, r_norms = ray.get(ref)
        bid = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        Xb = np.asarray([np.asarray(v, np.float64) for v in
                         b[vec_col].to_pylist()])
        bl = b[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = np.sqrt((Xb * Xb).sum(axis=1))
        cos = (Xb @ R.T) / (nb[:, None] * r_norms[None, :])
        micro = (np.sign(cos)
                 * np.floor(np.abs(cos) * 1e6 + 0.5)).astype(np.int64)
        # composite ascending key: (-cos6, neighbor_id); self excluded
        key = (1_000_000 - micro) * np.int64(1 << 33) + r_ids[None, :]
        self_mask = bid[:, None] == r_ids[None, :]
        key = np.where(self_mask, np.iinfo(np.int64).max, key)
        part = np.argpartition(key, k - 1, axis=1)[:, :k]
        nbr_labels = r_labels[part]
        n_same = (nbr_labels == bl[:, None]).sum(axis=1).astype(np.int64)
        return pa.table({
            id_col: pa.array(bid),
            label_col: pa.array(bl),
            "n_same": pa.array(n_same),
            "noisy": pa.array((2 * n_same < k).astype(np.int64))})

    return mat.map_batches(score, batch_format="pyarrow")


# per-row best-match rows at/below this fold on the driver; above it
# the mutuality resolve runs as a distributed hash(min(src,dst)) bucket
# fold (module-level so a route-identity test can monkeypatch)
_MUTUAL_DRIVER_LIMIT = 5_000_000


def _mutual_resolve(best_ds) -> pa.Table:
    """SIZE-ROUTED mutuality resolve over a Dataset of per-row best
    matches (src, dst, micro): below ``_MUTUAL_DRIVER_LIMIT`` rows the
    driver searchsorted (:func:`_mutual_fold`); above it one coarse
    ``hash(min(src, dst))`` shuffle — a mutual pair's two rows share
    ``min(src, dst)``, so each bucket resolves its own pairs with the
    same searchsorted and only the (small) mutual-pair result leaves
    the workers. Both routes are exact and identical."""
    from ..engine.hashing import append_coarse_bucket

    best_ds = best_ds.materialize()
    if best_ds.count() <= _MUTUAL_DRIVER_LIMIT:
        bm = best_ds.to_pandas().sort_values("src") \
            .reset_index(drop=True)
        return _mutual_fold(bm)

    def tag(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        t = pa.table({"mn": pa.array(np.minimum(src, dst)),
                      "src": b["src"], "dst": b["dst"],
                      "micro": b["micro"]})
        return append_coarse_bucket(t, ["mn"], 256, "__mb")

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        out = _mutual_fold(df.sort_values("src")
                           .reset_index(drop=True)).to_pandas()
        return out

    parts = (best_ds.map_batches(tag, batch_format="pyarrow")
             .groupby("__mb")
             .map_groups(lambda d: resolve(d.drop(columns=["__mb", "mn"])),
                         batch_format="pandas")
             .to_pandas())
    if parts.empty:  # empty Ray results lose schema: rebuild typed
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    parts = parts.sort_values("a").reset_index(drop=True)
    return pa.Table.from_pandas(
        parts.astype({"a": "int64", "b": "int64", "cos": "float64"}),
        preserve_index=False)


def _mutual_fold(bm: pd.DataFrame) -> pa.Table:
    """Driver mutuality resolve over the node-sized per-row best-match
    stream (src sorted, one row per id): keep (a, b) where each is the
    other's top-1 and a < b."""
    src = bm["src"].to_numpy(np.int64)
    dst = bm["dst"].to_numpy(np.int64)
    mic = bm["micro"].to_numpy(np.int64)
    pos = np.searchsorted(src, dst)
    pos = np.minimum(pos, len(src) - 1)
    mutual = (src[pos] == dst) & (dst[pos] == src) & (src < dst)
    return pa.table({
        "a": pa.array(src[mutual]),
        "b": pa.array(dst[mutual]),
        "cos": pa.array(mic[mutual].astype(np.float64) / 1e6,
                        pa.float64())})


def mutual_best_match(ds, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      broadcast_budget: int = 50_000_000,
                      n_cells: int = 16, n_probe: int = 4) -> pa.Table:
    """Reciprocal best match (mutual nearest neighbors): the pairs
    (a, b) where b is a's cosine top-1 AND a is b's — the
    high-precision alignment/dedup primitive (bitext mining, record
    linkage seeds) that one-directional top-1 cannot give. Ranking is
    (round6 cosine DESC, id ASC) — knn_label_noise's SQL-replayable
    decision rule; the same broadcast-matmul contract applies. Returns
    (a, b, cos) with a < b, ordered by a. SIZE-ROUTED twice, like
    :func:`knn_label_noise`: above ``broadcast_budget`` the per-row
    best match comes from the IVF-bucketed screen (approximate when
    ``n_probe < n_cells``), and the mutuality resolve itself routes
    through :func:`_mutual_resolve` — a driver searchsorted below
    ``_MUTUAL_DRIVER_LIMIT`` best rows, one ``hash(min(src, dst))``
    bucket fold above it (a mutual pair's two rows co-locate by
    construction), so neither side ever gathers a corpus-sized stream
    to the driver."""
    import ray

    mat = ds.select_columns([id_col, vec_col]).materialize()
    n = mat.count()
    if n < 2:
        raise ValueError("mutual_best_match: need >= 2 rows")
    dim = len(mat.take(1)[0][vec_col])
    if n * dim > broadcast_budget:
        cand = _ivf_screen_candidates(mat, id_col, vec_col, None,
                                      1, "self", n_cells, n_probe,
                                      n_rows=n, dim=dim)
        fold1 = _topk_fold(1)

        def decode_best(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy(zero_copy_only=False)
            return pa.table({
                "src": b["qid"],
                "dst": pa.array(key & ((np.int64(1) << 33) - 1)),
                "micro": pa.array(1_000_000 - (key >> 33))})

        best = cand.groupby("__qb").map_groups(
            fold1, batch_format="pandas").map_batches(
            decode_best, batch_format="pyarrow")
        return _mutual_resolve(best)
    df = mat.to_pandas()
    X = np.asarray([np.asarray(v, np.float64) for v in df[vec_col]])
    order = np.argsort(df[id_col].to_numpy(np.int64), kind="stable")
    ids = df[id_col].to_numpy(np.int64)[order]
    if ids.max() >= (1 << 33) or ids.min() < 0:
        raise ValueError("mutual_best_match: ids must fit 33 bits")
    X = X[order]
    norms = np.sqrt((X * X).sum(axis=1))
    ref = ray.put((ids, X, norms))

    def best(b: pa.Table) -> pa.Table:
        r_ids, R, r_norms = ray.get(ref)
        bid = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        Xb = np.asarray([np.asarray(v, np.float64) for v in
                         b[vec_col].to_pylist()])
        nb = np.sqrt((Xb * Xb).sum(axis=1))
        cos = (Xb @ R.T) / (nb[:, None] * r_norms[None, :])
        micro = (np.sign(cos)
                 * np.floor(np.abs(cos) * 1e6 + 0.5)).astype(np.int64)
        key = (1_000_000 - micro) * np.int64(1 << 33) + r_ids[None, :]
        key = np.where(bid[:, None] == r_ids[None, :],
                       np.iinfo(np.int64).max, key)
        j = np.argmin(key, axis=1)
        rows = np.arange(len(bid))
        return pa.table({
            "src": pa.array(bid),
            "dst": pa.array(r_ids[j]),
            "micro": pa.array(micro[rows, j])})

    return _mutual_resolve(mat.map_batches(best, batch_format="pyarrow"))


def hard_negatives(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label",
                   broadcast_budget: int = 50_000_000,
                   n_cells: int = 16, n_probe: int = 4):
    """Hard-negative mining for contrastive training: for every vector,
    its most similar neighbor with a DIFFERENT label — the pairs that
    teach a model the decision boundary (random negatives are too easy;
    same-label neighbors are positives). Ranking is (round6 cosine
    DESC, id ASC) — the SQL-replayable decision rule — and the same
    size-route as :func:`knn_label_noise` applies (above
    ``broadcast_budget`` the IVF-bucketed screen excludes SAME-label
    members per cell; a row whose probed cells hold no other label is
    dropped — approximate, recall rises with ``n_probe``); the
    per-row output is node-sized. Returns a Dataset of
    (id, label, neg_id, neg_label, cos)."""
    import ray

    mat = ds.select_columns([id_col, vec_col, label_col]).materialize()
    n = mat.count()
    if len(mat.unique(label_col)) < 2:
        raise ValueError("hard_negatives: need at least two labels")
    dim = len(mat.take(1)[0][vec_col])
    if n * dim > broadcast_budget:
        cand = _ivf_screen_candidates(mat, id_col, vec_col, label_col,
                                      1, "same_label", n_cells, n_probe,
                                      n_rows=n, dim=dim)
        fold1 = _topk_fold(1)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            top = fold1(df)
            key = top["key"].to_numpy(np.int64)
            return pd.DataFrame({
                id_col: top["qid"].to_numpy(np.int64),
                label_col: top["qlabel"].to_numpy(np.int64),
                "neg_id": key & ((np.int64(1) << 33) - 1),
                "neg_label": top["nbr_label"].to_numpy(np.int64),
                "cos": (1_000_000 - (key >> 33)).astype(np.float64)
                / 1e6})

        return cand.groupby("__qb").map_groups(finalize,
                                               batch_format="pandas")
    df = mat.to_pandas()
    X = np.asarray([np.asarray(v, np.float64) for v in df[vec_col]])
    order = np.argsort(df[id_col].to_numpy(np.int64), kind="stable")
    ids = df[id_col].to_numpy(np.int64)[order]
    if ids.max() >= (1 << 33) or ids.min() < 0:
        raise ValueError("hard_negatives: ids must fit 33 bits")
    labels = df[label_col].to_numpy(np.int64)[order]
    X = X[order]
    norms = np.sqrt((X * X).sum(axis=1))
    ref = ray.put((ids, labels, X, norms))

    def mine(b: pa.Table) -> pa.Table:
        r_ids, r_labels, R, r_norms = ray.get(ref)
        bid = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bl = b[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        Xb = np.asarray([np.asarray(v, np.float64) for v in
                         b[vec_col].to_pylist()])
        nb = np.sqrt((Xb * Xb).sum(axis=1))
        cos = (Xb @ R.T) / (nb[:, None] * r_norms[None, :])
        micro = (np.sign(cos)
                 * np.floor(np.abs(cos) * 1e6 + 0.5)).astype(np.int64)
        key = (1_000_000 - micro) * np.int64(1 << 33) + r_ids[None, :]
        same = bl[:, None] == r_labels[None, :]  # positives excluded
        key = np.where(same, np.iinfo(np.int64).max, key)
        j = np.argmin(key, axis=1)
        rows = np.arange(len(bid))
        return pa.table({
            id_col: pa.array(bid),
            label_col: pa.array(bl),
            "neg_id": pa.array(r_ids[j]),
            "neg_label": pa.array(r_labels[j]),
            "cos": pa.array(micro[rows, j].astype(np.float64) / 1e6,
                            pa.float64())})

    return mat.map_batches(mine, batch_format="pyarrow")
