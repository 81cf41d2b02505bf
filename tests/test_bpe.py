"""BPE trainer/encoder (ops/bpe.py): textbook-reference golden (an
independent Counter-based implementation of the published algorithm),
determinism across block layouts, and encode invariants. The two
queries are rows-only by design (iterative argmax / greedy apply are
not SQL-expressible) — this file is their gate."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from raysketch.ops.bpe import END, bpe_train, _encode_word


def _reference_bpe(word_freq: dict[str, int], n_merges: int):
    """Independent textbook implementation (dict/Counter based — a
    different code path from ops/bpe.py's list-mutation trainer)."""
    vocab = {tuple(list(w) + [END]): n for w, n in word_freq.items()}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((rank, a, b, a + b, cnt))
        new_vocab = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return pd.DataFrame(merges, columns=["rank", "left", "right",
                                         "merged", "pair_count"])


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_trainer_matches_reference_implementation():
    wc = pd.DataFrame({"word": list(SENNRICH), "n": list(SENNRICH.values())})
    got = bpe_train(wc, n_merges=10)
    want = _reference_bpe(SENNRICH, 10)
    pd.testing.assert_frame_equal(got, want)
    # the classic first merge on this corpus: (e, s) with count 9
    assert tuple(got.iloc[0][["left", "right", "pair_count"]]) == ("e", "s", 9)


def test_trainer_stops_when_no_pair_repeats():
    wc = pd.DataFrame({"word": ["ab"], "n": [1]})
    got = bpe_train(wc, n_merges=50)
    assert len(got) == 0  # every pair occurs once — nothing to merge


def test_encode_invariants():
    wc = pd.DataFrame({"word": list(SENNRICH), "n": list(SENNRICH.values())})
    merges = bpe_train(wc, n_merges=6)
    rank_of = {(l, r): int(k) for k, l, r in
               zip(merges["rank"], merges["left"], merges["right"])}
    for w in list(SENNRICH) + ["lowest", "newer", "wide"]:
        toks = _encode_word(w, rank_of)
        assert "".join(toks) == w + END  # merges only concatenate
        assert len(toks) <= len(w) + 1
    # zero merges -> chars + END
    assert _encode_word("low", {}) == ["l", "o", "w", END]


@pytest.mark.usefixtures("ray_session")
def test_distributed_word_counts_and_full_pipeline_block_invariance():
    import ray.data as rd

    from raysketch.ops.bpe import bpe_encode, word_counts

    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
             + ["low newest widest lower"])
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ref = None
    for npart in (1, 4, 8):
        ds = rd.from_pandas(df).repartition(npart)
        wc = word_counts(ds).to_pandas().sort_values("word") \
            .reset_index(drop=True)
        assert dict(zip(wc["word"], wc["n"])) == {
            "low": 6, "lower": 3, "newest": 7, "widest": 4}
        merges = bpe_train(wc, n_merges=8)
        enc = bpe_encode(ds, merges).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert enc["n_words"].tolist() == [1] * 16 + [4]
        if ref is None:
            ref = (merges, enc)
        else:
            pd.testing.assert_frame_equal(merges, ref[0])
            pd.testing.assert_frame_equal(enc, ref[1])
    # more merges never increase a doc's token count
    few = bpe_encode(rd.from_pandas(df), bpe_train(wc, n_merges=2)) \
        .to_pandas().sort_values("doc_id")["n_bpe_tokens"].to_numpy()
    many = ref[1].sort_values("doc_id")["n_bpe_tokens"].to_numpy()
    assert (many <= few).all()
