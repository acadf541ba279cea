"""Bit-exactness tests for the vectorized text kernels (VERDICT r04
wrongs #1/#3): the flat LUT lang-ID and the flat rolling-hash
fingerprint must reproduce the original per-row loops exactly — both
feed SQL-oracled driver queries (``langid_docs``, ``fingerprint_docs``)
whose value hashes pin these semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from raydedup.stages.text import (
    _FP_BASE,
    LangIdStage,
    _fp_powers,
    fingerprint_batch,
    token_count_batch,
)


def _ref_langid(st: LangIdStage, texts):
    """The original per-row loop (kept verbatim as the oracle)."""
    langs, scores = [], []
    for s in texts:
        s = (s or "").lower()
        best, best_score = "und", 0.0
        for lang, grams in st.profiles.items():
            hits = sum(s.count(g) for g in grams)
            score = hits / max(len(s), 1)
            if score > best_score:
                best, best_score = lang, score
        langs.append(best)
        scores.append(best_score)
    return langs, scores


def _ref_fingerprint(texts, window=16):
    """The original per-row loop (kept verbatim as the oracle)."""
    from numpy.lib.stride_tricks import sliding_window_view

    pw = _fp_powers(window)
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, s in enumerate(texts):
        data = (s or "").encode("utf-8")
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        if len(data) < window:
            h = np.uint64(14695981039346656037)
            with np.errstate(over="ignore"):
                for v in arr:
                    h = (h ^ v) * _FP_BASE
            out[i] = h
            continue
        wins = sliding_window_view(arr, window)
        out[i] = (wins * pw[None, :]).sum(axis=1, dtype=np.uint64).min()
    return out.view(np.int64)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    en = "the quick brown fox jumps and of to in is that with for ion ed".split()
    de = "der die das und ich nicht sch ein mit sich auf für ung recht".split()
    zh = list("的一是了我不人在他有这个上们来到时大地为")
    docs = []
    for i in range(1500):
        k = i % 4
        if k == 0:
            docs.append(" ".join(rng.choice(en, rng.integers(0, 60))))
        elif k == 1:
            docs.append(" ".join(rng.choice(de, rng.integers(1, 40))))
        elif k == 2:
            docs.append("".join(rng.choice(zh, rng.integers(0, 30))))
        else:
            docs.append("".join(chr(c) for c in rng.integers(33, 1200, rng.integers(0, 25))))
    # boundary shapes: empties, nulls, exactly window±1, query-gram "ión"
    docs += ["", " ", "a", None, "x" * 15, "y" * 16, "z" * 17, "ión ión", "Hello WORLD " * 3]
    return docs


def test_langid_bit_exact(corpus):
    st = LangIdStage()
    assert not st.slow, "default profiles must be 100% fast-path"
    out = st(pa.table({"text": pa.array(corpus, pa.string())}))
    langs, scores = _ref_langid(st, corpus)
    assert out.column("lang_pred").to_pylist() == langs
    assert np.array_equal(np.array(out.column("lang_score").to_pylist()), np.array(scores))


def test_langid_slow_path_grams(corpus):
    """Self-overlapping grams (period < len) and 3-byte-key collisions
    must demote to the count_substring path and still score exactly."""
    st = LangIdStage()
    st.profiles = {
        "aa": ["aba"],  # period 2 → sliding ≠ str.count → slow path
        "pre": ["the", "thes"],  # key collision ("the" prefixes "thes")
        "en": [" th", "ing"],
    }
    st._compile()
    assert len(st.slow) == 3  # aba + both colliding grams
    docs = ["ababa theses thesis thing", "aba aba", "", None, "thes the th"]
    out = st(pa.table({"text": pa.array(docs, pa.string())}))
    langs, scores = _ref_langid(st, docs)
    assert out.column("lang_pred").to_pylist() == langs
    assert np.array_equal(np.array(out.column("lang_score").to_pylist()), np.array(scores))


def test_fingerprint_bit_exact(corpus):
    out = fingerprint_batch(pa.table({"text": pa.array(corpus, pa.string())}))
    assert np.array_equal(
        out.column("fingerprint").to_numpy(), _ref_fingerprint(corpus)
    )


@pytest.mark.parametrize("window", [1, 3, 12, 16, 17])
def test_fingerprint_windows(corpus, window):
    """The log-doubling window-hash build must stay exact for power-of-2
    AND mixed-bit window widths (binary block decomposition)."""
    docs = corpus[:200] + ["q" * window, "r" * (window + 1)]
    out = fingerprint_batch(pa.table({"text": pa.array(docs, pa.string())}), window=window)
    assert np.array_equal(
        out.column("fingerprint").to_numpy(), _ref_fingerprint(docs, window=window)
    )


def test_token_counts_still_exact(corpus):
    """Guard the neighboring kernel against regressions from this file's
    edits: whitespace/BPE-ish token counts == the regex definitions."""
    import re

    # the engine's token definition is RE2's \s (ASCII, no \v) — the
    # same one the DuckDB oracle uses; \v never appears in this corpus
    ws = re.compile(r"[^ \t\n\f\r]+")
    bpe = re.compile(r"[A-Za-z]+|[0-9]+|[^ \t\n\f\rA-Za-z0-9]+")
    out = token_count_batch(pa.table({"text": pa.array(corpus, pa.string())}))
    for s, nt, nb in zip(
        corpus, out.column("n_tokens").to_pylist(), out.column("n_bpe_tokens").to_pylist()
    ):
        s = s or ""
        assert nt == len(ws.findall(s))
        assert nb == len(bpe.findall(s))


def _ref_repetition(texts):
    """Brute-force Gopher repetition signals (Counter-based oracle)."""
    from collections import Counter

    rows = []
    for s in texts:
        w = (s or "").split()
        grams = [(w[i], w[i + 1]) for i in range(len(w) - 1)]
        rows.append(
            (
                len(w),
                max(Counter(w).values()) if w else 0,
                len(grams),
                len(set(grams)),
            )
        )
    return rows


def test_repetition_signals_exact(corpus):
    from raydedup.stages.text import repetition_batch

    docs = corpus + ["a a a b b c", "one", "two two", "x y x y x y", "  padded  "]
    out = repetition_batch(pa.table({"text": pa.array(docs, pa.string())}))
    got = list(
        zip(
            out.column("n_words").to_pylist(),
            out.column("max_word_n").to_pylist(),
            out.column("n_2gram").to_pylist(),
            out.column("n_2gram_distinct").to_pylist(),
        )
    )
    assert got == _ref_repetition(docs)


def test_repetition_empty_batch():
    from raydedup.stages.text import repetition_batch

    out = repetition_batch(pa.table({"text": pa.array([], pa.string())}))
    assert len(out) == 0 and out.column("n_words").type == pa.int64()
