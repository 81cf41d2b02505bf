"""Text-analysis operators for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` transforms; the stateful ones
(compiled regexes, stopword tables) are callable classes → Ray actor pools
(setup once per actor in ``__init__``, per-batch work in ``__call__``).

Operators:
- :class:`TokenCounter` — exact per-doc token counts (whitespace and a
  BPE-ish word/punct regex).
- :class:`LangId` — n-gram/stopword heuristic language ID (en/de/es/fr +
  CJK ratio for zh — the languages of the test corpus).
- :class:`QualityScorer` — length / punctuation / stopword / repetition
  ratios (the standard pretraining-quality heuristics).
- :func:`fingerprint_batch` — 64-bit rolling-hash document fingerprint
  (Rabin–Karp over a sliding byte window, min-sampled), the cheap
  containment fingerprint.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu", "den"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "es", "por"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "dans", "pour"},
}


class TokenCounter:
    """Exact token counting — whitespace tokens and word-ish (BPE-style
    pre-tokenization) tokens per document."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        # GPT-2-ish pre-tokenizer shape: word chars | single non-space symbol
        self.word_re = re.compile(r"\w+|[^\w\s]", re.UNICODE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ws = np.fromiter(
            (len(t.split()) if t else 0 for t in texts), dtype=np.int64, count=len(texts)
        )
        bpe = np.fromiter(
            (len(self.word_re.findall(t)) if t else 0 for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        batch = batch.append_column("n_tokens_ws", pa.array(ws, pa.int64()))
        batch = batch.append_column("n_tokens_re", pa.array(bpe, pa.int64()))
        return batch


class LangId:
    """Heuristic language ID: stopword hit-rates per language + CJK
    character ratio. Deterministic; ties broken by fixed language order."""

    LANGS = ("en", "de", "es", "fr")

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred") -> None:
        self.text_col = text_col
        self.out_col = out_col
        self.word_re = re.compile(r"[a-zA-Zàâäéèêëïîôöùûüñáíóúß]+")
        self.cjk_re = re.compile(r"[一-鿿぀-ヿ]")

    def classify(self, text: str) -> str:
        if not text:
            return "und"
        if len(self.cjk_re.findall(text)) / max(len(text), 1) > 0.05:
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und"
        best_lang, best = "und", 0.0
        for lang in self.LANGS:
            sw = _STOPWORDS[lang]
            score = sum(w in sw for w in words) / len(words)
            if score > best:
                best_lang, best = lang, score
        return best_lang if best > 0.0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.out_col, pa.array(preds, pa.string()))


class QualityScorer:
    """Pretraining quality heuristics per document (all vectorized pandas
    string kernels): char/word counts, punctuation & digit & whitespace
    ratios, stopword ratio, mean word length, max line length, and a
    composite [0,1] score."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.stop = frozenset().union(*_STOPWORDS.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[self.text_col].to_pylist(), dtype="object").fillna("")
        n_chars = s.str.len().to_numpy(np.float64)
        words = s.str.split()
        n_words = words.str.len().fillna(0).to_numpy(np.float64)
        punct = s.str.count(r"[^\w\s]").to_numpy(np.float64)
        digits = s.str.count(r"\d").to_numpy(np.float64)
        # vectorized per-word passes: ONE explode over the batch's whole
        # word stream, then index-grouped sums (no per-doc python lambdas)
        ex = words.explode().dropna()
        if len(ex):
            hit = ex.str.lower().isin(self.stop)
            stop_sum = hit.groupby(level=0).sum()
            wlen_sum = ex.str.len().groupby(level=0).sum()
            stop_hits = stop_sum.reindex(s.index, fill_value=0).to_numpy(np.float64)
            total_wlen = wlen_sum.reindex(s.index, fill_value=0).to_numpy(np.float64)
        else:
            stop_hits = np.zeros(len(s))
            total_wlen = np.zeros(len(s))
        mean_wlen = np.divide(total_wlen, np.maximum(n_words, 1))
        safe_chars = np.maximum(n_chars, 1)
        punct_ratio = punct / safe_chars
        digit_ratio = digits / safe_chars
        stop_ratio = stop_hits / np.maximum(n_words, 1)
        # composite: reward stopwords & sane word length, punish symbol soup
        score = np.clip(
            0.5 * np.clip(stop_ratio * 3, 0, 1)
            + 0.3 * np.clip(1 - np.abs(mean_wlen - 5) / 5, 0, 1)
            + 0.2 * np.clip(1 - punct_ratio * 4, 0, 1),
            0.0,
            1.0,
        )
        for name, arr, typ in [
            ("q_n_words", n_words, pa.int64()),
            ("q_punct_ratio", punct_ratio, pa.float64()),
            ("q_digit_ratio", digit_ratio, pa.float64()),
            ("q_stop_ratio", stop_ratio, pa.float64()),
            ("q_mean_word_len", mean_wlen, pa.float64()),
            ("q_score", score, pa.float64()),
        ]:
            col = arr.astype(np.int64) if typ == pa.int64() else arr
            batch = batch.append_column(name, pa.array(col, typ))
        return batch


_FP_BASE = np.uint64(1099511628211)  # FNV prime as the rolling base


def fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 16, keep: int = 8
) -> pa.Table:
    """Rabin–Karp rolling-hash fingerprints: hash every `window`-byte
    sliding window, keep the `keep` smallest hashes (min-sampling → a
    containment-comparable fingerprint), plus their min as a single
    ``fingerprint`` column. Deterministic."""
    fps: list[list[int]] = []
    mins: list[int] = []
    for t in batch[text_col].to_pylist():
        data = (t or "").encode("utf-8")
        if len(data) < window:
            h = np.uint64(0)
            for b in data:
                h = h * _FP_BASE + np.uint64(b)
            fps.append([int(h)])
            mins.append(int(h))
            continue
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            # vectorized rolling hash: h[i] = sum(base^(w-1-j) * byte[i+j])
            pows = _FP_BASE ** np.arange(window - 1, -1, -1, dtype=np.uint64)
            n = len(arr) - window + 1
            # stride trick windows × pows
            win = np.lib.stride_tricks.sliding_window_view(arr, window)
            hashes = (win * pows).sum(axis=1)
        smallest = np.sort(np.unique(hashes))[:keep]
        fps.append([int(x) for x in smallest])
        mins.append(int(smallest[0]))
    batch = batch.append_column(
        "fingerprints", pa.array(fps, pa.list_(pa.uint64()))
    )
    return batch.append_column("fingerprint", pa.array(mins, pa.uint64()))
