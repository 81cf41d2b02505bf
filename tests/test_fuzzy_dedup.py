"""ops/dedup.batch_levenshtein + fuzzy_dedup_pairs — brute-force DP
parity, boundary cases, and broadcast≡partitioned route identity."""

import random

import numpy as np
import pandas as pd
import pytest

import raysketch.ops.dedup as dd
from raysketch.ops.dedup import batch_levenshtein, fuzzy_dedup_pairs


def _brute(a: str, b: str) -> int:
    a, b = a.encode(), b.encode()
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            t = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = t
    return dp[n]


def test_batch_levenshtein_matches_brute():
    rng = random.Random(3)
    pairs = []
    for _ in range(400):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 45)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 45)))
        pairs.append((a, b))
    pairs += [("", ""), ("abc", ""), ("", "xyz"), ("same", "same"),
              ("kitten", "sitting"), ("flaw", "lawn")]
    got = batch_levenshtein([p[0] for p in pairs], [p[1] for p in pairs])
    want = np.array([_brute(a, b) for a, b in pairs])
    assert (got == want).all()


def test_batch_levenshtein_empty_batch():
    assert batch_levenshtein([], []).shape == (0,)


def _corpus():
    rng = random.Random(11)
    base = ["".join(rng.choice("abcdefgh ") for _ in range(120))
            for _ in range(30)]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        if i % 3 == 0:  # planted near-dup: 3 substitutions
            mut = list(t)
            for pos in (5, 40, 90):
                mut[pos] = "z"
            rows.append((2 * i + 1, "".join(mut)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _run(df):
    import ray.data as rd

    out = fuzzy_dedup_pairs(rd.from_pandas(df).repartition(4)).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def test_fuzzy_dedup_finds_planted_pairs(ray_session):
    df = _corpus()
    out = _run(df)
    planted = {(2 * i, 2 * i + 1) for i in range(30) if i % 3 == 0}
    got = set(zip(out["id_a"], out["id_b"]))
    assert planted <= got
    assert (out["lev"] <= 12).all()  # 3 substitutions (byte-exact: == 3)
    assert (out["edit_sim"] >= 0.9).all()


def test_fuzzy_dedup_routes_identical(ray_session, monkeypatch):
    df = _corpus()
    a = _run(df)
    monkeypatch.setattr(dd, "_TEXT_BROADCAST_BYTES", 0)
    b = _run(df)
    pd.testing.assert_frame_equal(a, b)


def test_fuzzy_dedup_empty(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": pd.Series([1, 2], dtype="int64"),
                       "text": ["entirely different alpha",
                                "nothing shared beta gamma"]})
    out = fuzzy_dedup_pairs(rd.from_pandas(df))
    assert out.count() == 0
    # schema survives on the Dataset (to_pandas() of an all-empty
    # Dataset drops columns — Ray 2.49; _pairs_df rebuilds at the
    # query layer)
    assert out.schema().names == ["id_a", "id_b", "lev", "edit_sim"]


def test_fuzzy_join_matches_and_sides(ray_session):
    import ray.data as rd

    from raysketch.ops.dedup import fuzzy_join

    df = _corpus()
    # B = A with ids offset and 3 substitutions applied to every 4th row
    b = df.copy()
    mut = b.index % 4 == 0
    b.loc[mut, "text"] = b.loc[mut, "text"].map(
        lambda t: t[:5] + "z" + t[6:])
    out = fuzzy_join(rd.from_pandas(df).repartition(3),
                     rd.from_pandas(b).repartition(3)).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    got = set(zip(out["id_a"], out["id_b"]))
    # every row must at least match itself across tables
    assert {(i, i) for i in df["doc_id"]} <= got
    self_rows = out[out["id_a"] == out["id_b"]]
    assert ((self_rows["lev"] == 0) | (self_rows["lev"] == 1)).all()
    # no within-side pairs leak: id_a values exist in A, id_b in B
    assert set(out["id_a"]) <= set(df["doc_id"])
    assert set(out["id_b"]) <= set(b["doc_id"])


def test_fuzzy_join_rejects_wide_ids(ray_session):
    import ray.data as rd

    from raysketch.ops.dedup import fuzzy_join

    df = pd.DataFrame({"doc_id": [1 << 62], "text": ["abcdef" * 10]})
    with pytest.raises(Exception, match="62 bits"):
        fuzzy_join(rd.from_pandas(df), rd.from_pandas(df)).to_pandas()
