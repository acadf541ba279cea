"""Suffix-array exact-substring duplicate detection.

Absent from the reference (SURVEY.md §2.5); the north rule adds it for
captions that are verbatim slices of other captions.

Kernel: O(n log² n) prefix-doubling suffix array (numpy ``lexsort``)
over the concatenated caption corpus with doc separators, plus binary
pattern search — standard Manber–Myers construction.

Distributed shape (stages/dedup.py wires it up): a query caption that is
contained in a container caption must share its leading ``window``-token
anchor with one of the container's token windows, so grouping by anchor
hash co-locates every (contained, container) candidate; within a group
the suffix array (large groups) or direct find (small groups) verifies
containment. Captions shorter than ``window`` tokens are collected and
broadcast (tiny by construction) — no candidate is lost.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array (values ≥ 0) by prefix doubling."""
    s = np.asarray(s, dtype=np.int64)
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = s.copy()
    sa = np.argsort(rank, kind="stable")
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        sa = np.lexsort((key2, rank))
        tmp[sa[0]] = 0
        prev = sa[:-1]
        cur = sa[1:]
        newgrp = (rank[cur] != rank[prev]) | (key2[cur] != key2[prev])
        tmp[cur] = np.cumsum(newgrp)
        rank, tmp = tmp, rank
        if rank[sa[-1]] == n - 1:
            return sa
        k *= 2


class GeneralizedSuffixArray:
    """Suffix array over concatenated docs (separator 0) with doc lookup."""

    def __init__(self, docs: list[np.ndarray]):
        parts = []
        starts = []
        pos = 0
        for d in docs:
            starts.append(pos)
            parts.append(d)
            parts.append(np.array([0], dtype=np.int64))  # separator < all symbols
            pos += len(d) + 1
        self.text = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        self.starts = np.array(starts, dtype=np.int64)
        self.ends = self.starts + np.array([len(d) for d in docs], dtype=np.int64)
        self.sa = suffix_array(self.text)

    def _cmp_at(self, suf: int, pat: np.ndarray) -> int:
        """-1/0/+1: compare pattern against suffix prefix."""
        m = len(pat)
        seg = self.text[suf : suf + m]
        if len(seg) < m:
            pad = np.full(m, -1, dtype=np.int64)
            pad[: len(seg)] = seg
            seg = pad
        neq = np.nonzero(seg != pat)[0]
        if len(neq) == 0:
            return 0
        i = neq[0]
        return -1 if seg[i] < pat[i] else 1

    def find_docs(self, pat: np.ndarray) -> set[int]:
        """Doc indices whose body contains ``pat`` (never across the
        separator — pat has no zeros)."""
        n = len(self.sa)
        lo, hi = 0, n
        while lo < hi:  # first suffix with prefix >= pat
            mid = (lo + hi) // 2
            if self._cmp_at(self.sa[mid], pat) < 0:
                lo = mid + 1
            else:
                hi = mid
        out = set()
        m = len(pat)
        i = lo
        while i < n:
            suf = self.sa[i]
            if self._cmp_at(suf, pat) != 0:
                break
            di = int(np.searchsorted(self.starts, suf, side="right") - 1)
            if suf + m <= self.ends[di]:
                out.add(di)
            i += 1
        return out


def tokens_to_symbols(tokens: list[str], sym: dict[str, int]) -> np.ndarray:
    """Map tokens to positive int symbols via a shared growing dict."""
    out = np.empty(len(tokens), dtype=np.int64)
    for i, t in enumerate(tokens):
        v = sym.get(t)
        if v is None:
            v = len(sym) + 1  # 0 reserved for the separator
            sym[t] = v
        out[i] = v
    return out


def anchor_hash(tokens: list[str]) -> int:
    """64-bit hash of a token window (the group-by key)."""
    return struct.unpack("<Q", hashlib.sha1(" ".join(tokens).encode("utf-8")).digest()[:8])[0]


def containment_pairs_in_group(
    queries: list[tuple[str, str]],
    containers: list[tuple[str, str]],
    sa_threshold: int = 64,
) -> list[tuple[str, str]]:
    """Exact containment check within one anchor group.

    queries/containers: (id, caption) lists. Returns (contained_id,
    container_id) pairs with *strict* containment (query shorter).
    Uses the generalized suffix array when the group is large, direct
    token-boundary string find otherwise.
    """
    out = []
    if not queries or not containers:
        return out
    if len(queries) * len(containers) > sa_threshold:
        sym: dict[str, int] = {}
        docs = [tokens_to_symbols(c.split(), sym) for _, c in containers]
        gsa = GeneralizedSuffixArray(docs)
        for qid, qcap in queries:
            pat = tokens_to_symbols(qcap.split(), sym)
            for di in gsa.find_docs(pat):
                cid, ccap = containers[di]
                if cid != qid and len(qcap) < len(ccap):
                    out.append((qid, cid))
    else:
        for qid, qcap in queries:
            needle = f" {qcap} "
            for cid, ccap in containers:
                if cid != qid and len(qcap) < len(ccap) and needle in f" {ccap} ":
                    out.append((qid, cid))
    return out


_W_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_W_FNV_PRIME = np.uint64(0x100000001B3)
# polynomial rolling-hash base (odd → invertible mod 2^64, so substring
# hashes decompose through a prefix array — the window anchors keep the
# FNV fold, which is cheaper but not decomposable)
_POLY_B = np.uint64(0x100000001B3)
_POLY_B_INV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


_TOKEN_SEED = 0x5EED


def flat_token_hashes64(tokens) -> np.ndarray:
    """64-bit per-token hashes, ONE vectorized call for a whole flat
    token list (polars xxhash64; internal-only — the substring oracle
    constrains final pairs, not hash values, so any collision-resistant
    64-bit function works). Callers hash all tokens of a batch/block in
    one call and slice per doc — per-token Python hashing was the
    substring stage's hottest loop. Accepts a Python list OR a pyarrow
    string Array (zero-copy into polars)."""
    if len(tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    try:
        import polars as pl

        if isinstance(tokens, list):
            s = pl.Series(tokens, dtype=pl.Utf8)
        else:  # pyarrow Array / ChunkedArray, zero-copy
            s = pl.from_arrow(tokens)
        return s.hash(seed=_TOKEN_SEED).to_numpy().astype(np.uint64)
    except ImportError:  # pragma: no cover - polars is baked into the env
        if not isinstance(tokens, list):
            tokens = tokens.to_pylist()
        return np.fromiter(
            (struct.unpack("<Q", hashlib.sha1(t.encode("utf-8")).digest()[:8])[0] for t in tokens),
            dtype=np.uint64,
            count=len(tokens),
        )


def split_ws_tokens(col) -> tuple[np.ndarray, "object"]:
    """Whitespace tokenization of a string column with Python
    ``str.split()`` parity, fully in Arrow kernels: returns
    ``(per-row token counts int64, flat token StringArray)``.

    ``pc.utf8_split_whitespace`` collapses INTERNAL whitespace runs like
    Python but emits empty tokens at string edges (`` a b `` →
    ``['', 'a', 'b', '']``); those empties are filtered here with one
    vectorized pass so the non-empty tokens match ``str.split()``
    exactly. Null rows count 0 tokens."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.utf8_split_whitespace(col)
    lens = (
        pc.fill_null(pc.list_value_length(toks), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(toks)  # null rows contribute no tokens
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    emp = pc.equal(flat, "").to_numpy(zero_copy_only=False)
    if emp.any():
        off = np.concatenate(([0], np.cumsum(lens)[:-1]))
        cs = np.concatenate(([0], np.cumsum(emp)))
        lens = lens - (cs[off + lens] - cs[off])
        flat = flat.filter(pa.array(~emp))
    return lens, flat


def poly_powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(B^k, B^-k) for k in [0, n], uint64 wraparound — cumprod wraps."""
    b = np.full(n + 1, _POLY_B, dtype=np.uint64)
    b[0] = 1
    binv = np.full(n + 1, _POLY_B_INV, dtype=np.uint64)
    binv[0] = 1
    return np.cumprod(b), np.cumprod(binv)


def poly_hash_all(hv: np.ndarray, bpow: np.ndarray) -> np.uint64:
    """H(0, n) = Σ hv[k]·B^(n-1-k) mod 2^64 — the whole-sequence hash."""
    n = len(hv)
    if n == 0:
        return np.uint64(0)
    return np.uint64((hv * bpow[n - 1 :: -1][:n]).sum(dtype=np.uint64))


def poly_prefix_sums(hv: np.ndarray, binv_pow: np.ndarray) -> np.ndarray:
    """S[j] = Σ_{k<j} hv[k]·B^-k; any substring hash is then
    H(i, j) = (S[j] - S[i]) · B^(j-1) — one gather + multiply."""
    s = np.zeros(len(hv) + 1, dtype=np.uint64)
    np.cumsum(hv * binv_pow[: len(hv)], out=s[1:])
    return s


def flat_ngram_hashes64(col, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row word n-gram window hashes over LOWERCASED whitespace
    tokens, fully vectorized: returns ``(per-row n-gram counts int64,
    flat uint64 window-hash array)``. The window hash is the
    position-independent polynomial combination of per-token xxhash64
    values — set-equivalent to hashing the space-joined shingle string
    (modulo 64-bit collisions), which is all the n-gram Jaccard
    pipeline needs (its DuckDB oracle constrains the verified pair set,
    not hash values). Replaces the per-doc Python shingle loop that was
    the pipeline's hottest kernel."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens, flat = split_ws_tokens(pc.utf8_lower(col))
    cnt = np.maximum(lens - (n - 1), 0)
    total = int(cnt.sum())
    if total == 0:
        return cnt, np.empty(0, np.uint64)
    hv = flat_token_hashes64(flat)
    bpow, binv = poly_powers(len(hv))
    s = poly_prefix_sums(hv, binv)
    off = np.cumsum(lens) - lens
    # ragged arange: global window-start index for every (row, window)
    starts = np.repeat(off, cnt) + (
        np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    )
    # H(i, i+n) = (S[i+n] - S[i]) · B^(i+n-1): windows never cross row
    # boundaries because starts stay within [off, off+len-n]
    w = (s[starts + n] - s[starts]) * bpow[starts + n - 1]
    return cnt, w


def unique_per_row(cnt: np.ndarray, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deduplicate a ragged uint64 array within each row: returns
    ``(per-row distinct counts, flat values sorted ascending within each
    row)`` — one global lexsort instead of a per-row ``np.unique``."""
    if len(h) == 0:
        return np.zeros(len(cnt), dtype=np.int64), h
    rid = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    order = np.lexsort((h, rid))
    hs, rs = h[order], rid[order]
    keep = np.ones(len(hs), dtype=bool)
    keep[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
    return np.bincount(rs[keep], minlength=len(cnt)).astype(np.int64), hs[keep]
