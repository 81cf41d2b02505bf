"""Round-4 seventh-session wave 6: cdc_chunks (content-defined
chunking) — the ab_srm_check query is pure composition of seed_key32 +
counting, oracle-gated in test_oracle_parity."""

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.curate import cdc_chunks
from raysketch.ops.text import _FP_BASE


def _mk(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


def _brute_chunks(text: str, window=8, mask=63):
    b = text.encode()
    cuts = [0]
    pows = [1]
    for _ in range(window - 1):
        pows.append((pows[-1] * int(_FP_BASE)) % (1 << 64))
    pows = pows[::-1]
    for end in range(window, len(b) + 1):
        h = sum(b[end - window + k] * pows[k]
                for k in range(window)) % (1 << 64)
        if h % (mask + 1) == 0:
            cuts.append(end)
    if cuts[-1] != len(b):
        cuts.append(len(b))
    return [b[cuts[i]:cuts[i + 1]] for i in range(len(cuts) - 1)]


def test_cdc_chunks_matches_brute(ray_session):
    rng = np.random.default_rng(2)
    alpha = list("abcdefgh ")
    texts = ["".join(rng.choice(alpha, rng.integers(5, 300)))
             for _ in range(60)]
    texts[10] = texts[40]  # exact duplicate doc: chunks fully shared
    df = pd.DataFrame({"source": ["s1" if i % 2 else "s2"
                                  for i in range(60)],
                       "text": texts})
    got = cdc_chunks(_mk(df, 5), "source", "text").to_pandas() \
        .set_index("source")
    for src in ("s1", "s2"):
        all_chunks = []
        for t, s in zip(texts, df["source"]):
            if s == src:
                all_chunks.extend(_brute_chunks(t))
        distinct = set(all_chunks)
        assert int(got.loc[src, "n_chunks"]) == len(all_chunks)
        assert int(got.loc[src, "n_bytes"]) == sum(map(len, all_chunks))
        assert int(got.loc[src, "n_distinct"]) == len(distinct)
        assert int(got.loc[src, "distinct_bytes"]) == \
            sum(map(len, distinct))
        ratio = sum(map(len, distinct)) / sum(map(len, all_chunks))
        assert got.loc[src, "dedup_ratio"] == \
            np.floor(ratio * 1e6 + 0.5) / 1e6


def test_cdc_chunks_content_defined_shift_invariance(ray_session):
    # THE property fixed-window chunking lacks: a prefix insertion only
    # disturbs chunks up to the first boundary — shared tail chunks
    # still dedup across the two docs
    rng = np.random.default_rng(4)
    body = "".join(rng.choice(list("abcdefgh "), 4000))
    df = pd.DataFrame({"source": ["s", "s"],
                       "text": [body, "XYZ " + body]})
    got = cdc_chunks(_mk(df, 2), "source", "text").to_pandas().iloc[0]
    # shared content must collapse: distinct bytes well under total
    assert got["distinct_bytes"] < 0.62 * got["n_bytes"]
    ca = _brute_chunks(body)
    cb = _brute_chunks("XYZ " + body)
    shared = set(ca) & set(cb)
    assert len(shared) >= 0.8 * min(len(ca), len(cb)) - 2


def test_cdc_chunks_block_invariant_and_validates(ray_session):
    df = pd.DataFrame({"source": ["a"] * 30,
                       "text": [f"doc {i} " * (i + 1) for i in range(30)]})
    a = cdc_chunks(_mk(df, 1)).to_pandas()
    b = cdc_chunks(_mk(df, 7)).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="window"):
        cdc_chunks(_mk(df, 1), window=1)


def test_cdc_transfer_estimate_matches_brute(ray_session):
    from raysketch.ops.curate import cdc_transfer_estimate

    rng = np.random.default_rng(9)
    alpha = list("abcdefgh ")
    old_texts = ["".join(rng.choice(alpha, rng.integers(60, 400)))
                 for _ in range(40)]
    new_texts = ["EDIT " + t if i % 3 == 0 else t
                 for i, t in enumerate(old_texts)]
    import ray.data as rd
    old = rd.from_pandas(pd.DataFrame(
        {"source": "s", "text": old_texts})).repartition(4)
    new = rd.from_pandas(pd.DataFrame(
        {"source": "s", "text": new_texts})).repartition(4)
    got = cdc_transfer_estimate(old, new).to_pandas().iloc[0]
    ocs = {c for t in old_texts for c in _brute_chunks(t)}
    ncs = {c for t in new_texts for c in _brute_chunks(t)}
    xfer = ncs - ocs
    reuse = ncs & ocs
    assert int(got["n_new_chunks"]) == len(ncs)
    assert int(got["transfer_chunks"]) == len(xfer)
    assert int(got["transfer_bytes"]) == sum(map(len, xfer))
    assert int(got["reuse_bytes"]) == sum(map(len, reuse))
    # the point of CDC: 1/3 of docs edited but most bytes reuse
    assert got["reuse_ratio"] > 0.7
