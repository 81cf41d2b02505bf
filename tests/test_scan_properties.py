"""Hypothesis property tests for the PURE scan folds (no Ray): the
running fold's algebraic invariants and the block-split consistency the
sorted route's prefix-offset stitching relies on."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from raysketch.ops.scan import _fold_frame


def _frames(min_rows=0, max_rows=60):
    return st.lists(
        st.tuples(
            st.integers(0, 4),          # key
            st.integers(-1000, 1000),   # order value (ties allowed)
            st.integers(-500, 500),     # value
        ),
        min_size=min_rows,
        max_size=max_rows,
    )


def _df(rows):
    return pd.DataFrame(
        {
            "k": np.array([r[0] for r in rows], dtype=np.int64),
            "o": np.array([r[1] for r in rows], dtype=np.int64),
            "uid": np.arange(len(rows), dtype=np.int64),
            "v": np.array([r[2] for r in rows], dtype=np.int64),
        }
    )


@settings(max_examples=60, deadline=None)
@given(_frames())
def test_fold_invariants(rows):
    df = _df(rows)
    out = _fold_frame(df, "k", ["o", "uid"], "v")
    assert len(out) == len(df)
    for _, g in out.groupby("k"):
        # seq is 1..n in sorted order; running ends at the key's total
        assert g["seq"].tolist() == list(range(1, len(g) + 1))
        assert g["running"].iloc[-1] == g["v"].sum()
        # running increments by exactly v at every row
        inc = g["running"].to_numpy() - np.concatenate(
            [[0], g["running"].to_numpy()[:-1]]
        )
        assert (inc == g["v"].to_numpy()).all()
        # delta: -1 first, then the (o) diffs of the sorted sequence
        assert g["delta"].iloc[0] == -1
        o = g["o"].to_numpy()
        assert (g["delta"].to_numpy()[1:] == o[1:] - o[:-1]).all()


@settings(max_examples=60, deadline=None)
@given(_frames(min_rows=1), st.integers(1, 59))
def test_fold_is_row_permutation_invariant(rows, seed):
    """The fold sorts internally: any input permutation folds identically."""
    df = _df(rows)
    rng = np.random.default_rng(seed)
    shuffled = df.iloc[rng.permutation(len(df))].reset_index(drop=True)
    a = (
        _fold_frame(df, "k", ["o", "uid"], "v")
        .sort_values(["k", "seq"]).reset_index(drop=True)
    )
    b = (
        _fold_frame(shuffled, "k", ["o", "uid"], "v")
        .sort_values(["k", "seq"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


@settings(max_examples=60, deadline=None)
@given(_frames(min_rows=2), st.integers(1, 58))
def test_split_then_stitch_equals_whole(rows, cut_seed):
    """The sorted-route algebra: folding a sorted prefix and suffix
    separately, then offsetting the suffix by the prefix's per-key
    (count, sum, last order) — must equal folding the whole."""
    df = _df(rows).sort_values(["k", "o", "uid"]).reset_index(drop=True)
    cut = 1 + cut_seed % (len(df) - 1) if len(df) > 1 else 1
    whole = _fold_frame(df, "k", ["o", "uid"], "v").reset_index(drop=True)

    pre = _fold_frame(df.iloc[:cut], "k", ["o", "uid"], "v")
    suf = _fold_frame(df.iloc[cut:], "k", ["o", "uid"], "v").reset_index(drop=True)
    tail = pre.groupby("k").agg(n=("seq", "max"), s=("v", "sum"),
                                last_o=("o", "max"))
    for k, r in tail.iterrows():
        m = (suf["k"] == k).to_numpy()
        if not m.any():
            continue
        suf.loc[m, "seq"] += int(r.n)
        suf.loc[m, "running"] += int(r.s)
        first = int(np.flatnonzero(m)[0])
        suf.iat[first, suf.columns.get_loc("delta")] = int(
            suf.iloc[first]["o"]
        ) - int(r.last_o)
    stitched = pd.concat([pre, suf], ignore_index=True).sort_values(
        ["k", "seq"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        stitched, whole.sort_values(["k", "seq"]).reset_index(drop=True)
    )
