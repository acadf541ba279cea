"""Text-analysis operators for training-data pipelines (task brief §text):
language-ID (n-gram heuristic), quality scoring, token counting,
document fingerprinting (rolling hash). All vectorized or
batch-memoized inside ``map_batches``; stateful pieces (compiled
regexes, profile tables) live in actor ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# -------------------------------------------------------------- token counts
_TOKEN_RE = re.compile(r"\s+")
# BPE-ish word/number/punct splitter (public GPT-2 style pattern, simplified)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds ``n_tokens`` (whitespace tokens) and ``n_bpe_tokens``
    (regex word/number/punct pieces)."""
    texts = batch.column(text_col).to_pylist()
    n_ws = [len([t for t in _TOKEN_RE.split(s or "") if t]) for s in texts]
    n_bpe = [len(_BPE_RE.findall(s or "")) for s in texts]
    return batch.append_column("n_tokens", pa.array(n_ws, pa.int64())).append_column(
        "n_bpe_tokens", pa.array(n_bpe, pa.int64())
    )


# ------------------------------------------------------------- quality score
class QualityStage:
    """Per-document quality heuristics: length, punctuation/digit/space
    ratios, mean word length, stopword ratio. Regexes compiled once per
    actor."""

    STOPWORDS = frozenset(
        "the a an and or of to in is are was were be been it this that with for on as at by".split()
    )

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[a-zA-Z]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        n_chars = pc.utf8_length(col)
        texts = col.to_pylist()
        punct, digit, stop, mwl = [], [], [], []
        for s in texts:
            s = s or ""
            n = max(len(s), 1)
            punct.append(sum(1 for ch in s if not ch.isalnum() and not ch.isspace()) / n)
            digit.append(sum(1 for ch in s if ch.isdigit()) / n)
            words = s.lower().split()
            stop.append(sum(1 for w in words if w in self.STOPWORDS) / max(len(words), 1))
            mwl.append(sum(len(w) for w in words) / max(len(words), 1))
        return (
            batch.append_column("q_n_chars", pc.cast(n_chars, pa.int64()))
            .append_column("q_punct_ratio", pa.array(punct, pa.float64()))
            .append_column("q_digit_ratio", pa.array(digit, pa.float64()))
            .append_column("q_stopword_ratio", pa.array(stop, pa.float64()))
            .append_column("q_mean_word_len", pa.array(mwl, pa.float64()))
        )


# ------------------------------------------------------------------- lang id
class LangIdStage:
    """Character-n-gram heuristic language ID. Profiles are tiny
    hand-built trigram sets per language (built once per actor); score =
    profile-hit ratio; ties → 'und'. A real model (fastText etc.) slots
    into ``__init__`` unchanged — the Ray plumbing is the point."""

    PROFILES = {
        "en": " th|the|he |ing|and| of|ion| to|ed |is ",
        "de": "der|ein|ich|sch|und|die| de|en |ung|cht",
        "fr": " de|es |le |ent|que| le|la |ion|re | la",
        "es": " de|os |de |la | la|que|el |ión|ar | el",
        "zh": "的|一|是|了|我|不|人|在|他|有",
    }

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {k: v.split("|") for k, v in self.PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        langs, scores = [], []
        for s in texts:
            s = (s or "").lower()
            best, best_score = "und", 0.0
            for lang, grams in self.profiles.items():
                hits = sum(s.count(g) for g in grams)
                score = hits / max(len(s), 1)
                if score > best_score:
                    best, best_score = lang, score
            langs.append(best)
            scores.append(best_score)
        return batch.append_column("lang_pred", pa.array(langs, pa.string())).append_column(
            "lang_score", pa.array(scores, pa.float64())
        )


# -------------------------------------------------------------- fingerprints
_FP_BASE = np.uint64(1099511628211)


_FP_POWERS: dict[int, np.ndarray] = {}


def _fp_powers(window: int) -> np.ndarray:
    """B^(w-1), B^(w-2), …, B^0 (uint64 wraparound), cached per window."""
    pw = _FP_POWERS.get(window)
    if pw is None:
        pw = np.ones(window, dtype=np.uint64)
        for j in range(window - 2, -1, -1):
            pw[j] = pw[j + 1] * _FP_BASE
        _FP_POWERS[window] = pw
    return pw


def fingerprint_batch(batch: pa.Table, text_col: str = "text", window: int = 16) -> pa.Table:
    """64-bit document fingerprint: min of rolling polynomial hashes over
    byte windows (a winnowing-style content fingerprint — robust to
    doc-level reordering of large blocks, cheap to compare).

    Fully vectorized: every window hash of a doc is one strided
    (L-w+1, w) × (w,) product-sum in uint64 (wraps mod 2^64 natively) —
    no per-byte Python."""
    from numpy.lib.stride_tricks import sliding_window_view

    pw = _fp_powers(window)
    texts = batch.column(text_col).to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, s in enumerate(texts):
        data = (s or "").encode("utf-8")
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        if len(data) < window:
            h = np.uint64(14695981039346656037)
            for v in arr:  # < window bytes — bounded tiny loop
                h = (h ^ v) * _FP_BASE
            out[i] = h
            continue
        wins = sliding_window_view(arr, window)
        h = (wins * pw[None, :]).sum(axis=1, dtype=np.uint64)
        out[i] = h.min()
    return batch.append_column("fingerprint", pa.array(out.view(np.int64), pa.int64()))
