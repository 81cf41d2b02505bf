"""The source-code corpus: schema, derivation, and deterministic datagen.

BASELINE.json ``input_hint`` mandates the input table shape
``(repo:string, path:string, commit:string, lang:string, content:string)``
with derived per-row columns ``content_sha256`` (the end-to-end invariant),
``content_length`` and ``line_count``.

Two sources of corpus data, both deterministic:

- :func:`corpus_from_documents` — maps the driver's ``documents`` test
  table into corpus shape 1:1 (doc_id-keyed, so every derived value has a
  DuckDB-SQL oracle over ``documents``).
- :func:`generate_corpus` — seeded synthetic corpus at arbitrary scale for
  bench (FIXTURES.md F1): Zipf-skewed repo sizes, skewed lang mix,
  log-normal content length, duplicate contents injected at a known rate.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

_LANG_EXT = {
    "python": "py", "javascript": "js", "java": "java", "go": "go",
    "c": "c", "cpp": "cc", "rust": "rs", "ruby": "rb", "php": "php",
    "shell": "sh", "html": "html", "sql": "sql",
}


def documents_to_corpus_batch(batch: pa.Table) -> pa.Table:
    """Vectorized documents→corpus mapping (1:1 per doc_id, deterministic).

    repo: source plus a sqrt-bucketed doc index — repo r_k owns ~2k+1 docs,
    a built-in size-skew fixture. commit: 40 hex chars of sha256(doc_id).
    """
    doc_id = batch["doc_id"].to_numpy()
    source = batch["source"].to_pylist()
    lang = batch["lang"].to_pylist()
    text = batch["text"]
    repo_bucket = np.floor(np.sqrt(doc_id)).astype(np.int64)
    repo = pa.array([f"{s}/r{b}" for s, b in zip(source, repo_bucket)], pa.string())
    path = pa.array(
        [f"src/{l}/doc_{i}.{_LANG_EXT.get(l, 'txt')}" for l, i in zip(lang, doc_id)],
        pa.string(),
    )
    commit = pa.array(
        [hashlib.sha256(str(i).encode()).hexdigest()[:40] for i in doc_id], pa.string()
    )
    return pa.Table.from_arrays(
        [repo, path, commit, batch["lang"], text.cast(pa.large_string())],
        names=CORPUS_COLUMNS,
    )


def load_corpus(sf_dir: str, **read_kwargs):
    """documents.parquet → corpus-shaped Dataset (streaming map_batches)."""
    import ray.data as rd

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), **read_kwargs)
    return docs.map_batches(documents_to_corpus_batch, batch_format="pyarrow")


def derive_columns(batch: pa.Table) -> pa.Table:
    """Add content_sha256 / content_length / line_count (vectorized where
    Arrow has kernels; sha256 via hashlib at C speed)."""
    from .engine.hashing import sha256_batch

    content = batch["content"]
    sha = pa.array(sha256_batch(content), pa.string())
    length = pc.utf8_length(content).cast(pa.int64())
    # line_count = 1 + number of newlines
    nl = pc.count_substring(content, "\n").cast(pa.int64())
    lines = pc.add(nl, pa.scalar(1, pa.int64()))
    batch = batch.append_column("content_sha256", sha)
    batch = batch.append_column("content_length", length)
    batch = batch.append_column("line_count", lines)
    return batch


def drop_content(batch: pa.Table) -> pa.Table:
    """Narrow the stream once derived columns exist (SURVEY.md §7.3: keep
    shuffled data narrow — content can be MBs per row)."""
    return batch.drop_columns(["content"])


# ---------------------------------------------------------------------------
# Synthetic corpus generator (bench / scale tests; FIXTURES.md F1)
# ---------------------------------------------------------------------------

_LANGS = list(_LANG_EXT)
# heavily skewed lang mix: 40% python, long tail (the salted-shuffle fixture)
_LANG_P = np.array([0.40, 0.18, 0.10, 0.08, 0.06, 0.05, 0.04, 0.03, 0.02, 0.02, 0.01, 0.01])

_WORDS = (
    "def class import return for while if else elif try except lambda yield "
    "async await with open read write batch table row column index hash join "
    "merge sort filter map reduce group agg scan seek flush commit rollback "
    "int float str bytes list dict set tuple none true false self cls args"
).split()


def generate_corpus(
    n_rows: int, seed: int = 42, n_repos: int | None = None, dup_rate: float = 0.05
) -> pa.Table:
    """Deterministic synthetic corpus. Zipf-ish repo sizes, log-normal
    content length, ``dup_rate`` of rows duplicating an earlier content
    (the dedup / distinct-count fixture)."""
    rng = np.random.default_rng(seed)
    n_repos = n_repos or max(10, n_rows // 200)
    # Zipf-skewed repo assignment
    ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    repo_idx = rng.choice(n_repos, size=n_rows, p=probs)
    lang_idx = rng.choice(len(_LANGS), size=n_rows, p=_LANG_P)
    lengths = np.clip(rng.lognormal(5.0, 1.0, n_rows), 20, 20_000).astype(np.int64)

    words = np.array(_WORDS)
    word_picks = rng.integers(0, len(words), size=int(lengths.sum() // 5) + n_rows)
    # build contents by slicing a shared word stream (vectorized-ish)
    joined = " ".join(words[word_picks])
    contents: list[str] = []
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    for i in range(n_rows):
        contents.append(joined[offsets[i] % len(joined): offsets[i] % len(joined) + lengths[i]])
    # inject exact duplicates at a known rate
    dup_mask = rng.random(n_rows) < dup_rate
    dup_src = rng.integers(0, n_rows, size=n_rows)
    for i in np.nonzero(dup_mask)[0]:
        if dup_src[i] < i:
            contents[i] = contents[dup_src[i]]

    langs = [_LANGS[i] for i in lang_idx]
    repos = [f"org{i % 97}/repo{i}" for i in repo_idx]
    paths = [
        f"src/m{rng_i % 13}/f_{rng_i}.{_LANG_EXT[l]}"
        for rng_i, l in zip(rng.integers(0, 1 << 30, n_rows), langs)
    ]
    commits = [
        hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()[:40] for i in range(n_rows)
    ]
    return pa.Table.from_arrays(
        [
            pa.array(repos, pa.string()),
            pa.array(paths, pa.string()),
            pa.array(commits, pa.string()),
            pa.array(langs, pa.string()),
            pa.array(contents, pa.large_string()),
        ],
        names=CORPUS_COLUMNS,
    )


def _write_shard(args: tuple[str, int, int, int]) -> None:
    import pyarrow.parquet as pq

    path, shard, rows, seed = args
    t = generate_corpus(rows, seed=seed + shard)
    pq.write_table(t, os.path.join(path, f"part-{shard:05d}.parquet"))


def write_bench_corpus(path: str, n_rows: int, seed: int = 42, shard_rows: int = 37_500) -> str:
    """Materialize a sharded corpus parquet dir (one file per shard so reads
    parallelize); shards generate in parallel across local cores; cached —
    skip if the layout already exists."""
    from concurrent.futures import ProcessPoolExecutor

    marker = os.path.join(path, f"_DONE_{n_rows}_{seed}")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    jobs = []
    for shard, lo in enumerate(range(0, n_rows, shard_rows)):
        jobs.append((path, shard, min(shard_rows, n_rows - lo), seed))
    workers = min(32, os.cpu_count() or 4, len(jobs))
    with ProcessPoolExecutor(max_workers=workers) as ex:
        list(ex.map(_write_shard, jobs, chunksize=4))
    with open(marker, "w") as f:
        f.write("ok")
    return path
