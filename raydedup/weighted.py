"""Weighted MinHash (Ioffe consistent sampling) — batched.

Same math and seed-derived sampling matrices as the reference
(``datasketch/weighted_minhash.py:114-159``): ``rs, cs ~ Gamma(2,1)``,
``betas ~ U(0,1)`` from ``np.random.RandomState(seed)`` in that draw
order, all float32;

    t   = ⌊ln v / r + β⌋
    ln a = ln c − r(t − β) − r
    k   = argmin ln a   →  hash sample = (k, t_k)

Jaccard estimate = fraction of equal (k, t) pairs
(``weighted_minhash.py:44-60``). The per-document computation is one
(S, dim) matrix op; the batch API loops documents (each already
vectorized). Bit-exact with the reference's ``minhash`` (the canonical
per-document method — the reference's own ``minhash_many`` warns it
yields different values, ``weighted_minhash.py:167-169``).
"""

from __future__ import annotations

import numpy as np


class WeightedMinHashGenerator:
    def __init__(self, dim: int, sample_size: int = 128, seed: int = 1):
        self.dim = dim
        self.sample_size = sample_size
        self.seed = seed
        gen = np.random.RandomState(seed=seed)
        self.rs = gen.gamma(2, 1, (sample_size, dim)).astype(np.float32)
        self.ln_cs = np.log(gen.gamma(2, 1, (sample_size, dim))).astype(np.float32)
        self.betas = gen.uniform(0, 1, (sample_size, dim)).astype(np.float32)

    def minhash(self, v: np.ndarray) -> np.ndarray:
        """One weighted Jaccard vector → (sample_size, 2) int array of
        (k, t) pairs."""
        v = np.asarray(v, dtype=np.float32).copy()
        if v.shape != (self.dim,):
            raise ValueError(f"expected vector of dim {self.dim}")
        vzero = v == 0
        if vzero.all():
            raise ValueError("Input is all zeros")
        v[vzero] = np.nan
        vlog = np.log(v)
        t = np.floor(vlog / self.rs + self.betas)
        ln_y = (t - self.betas) * self.rs
        ln_a = self.ln_cs - ln_y - self.rs
        k = np.nanargmin(ln_a, axis=1)
        rows = np.arange(self.sample_size)
        out = np.zeros((self.sample_size, 2), dtype=int)
        out[:, 0] = k
        out[:, 1] = t[rows, k].astype(int)
        return out

    def minhash_batch(self, X: np.ndarray) -> list:
        """(N, dim) matrix → list of (sample_size, 2) arrays (None for
        all-zero rows)."""
        out = []
        for row in np.asarray(X, dtype=np.float32):
            if (row == 0).all():
                out.append(None)
            else:
                out.append(self.minhash(row))
        return out


def weighted_jaccard_estimate(a: np.ndarray, b: np.ndarray) -> float:
    """Fraction of equal (k, t) samples (``weighted_minhash.py:44-60``)."""
    eq = (a[:, 0] == b[:, 0]) & (a[:, 1] == b[:, 1])
    return float(np.count_nonzero(eq)) / float(len(a))


# ------------------------------------------------------------- b-bit minhash
def bbit_compress(sig: np.ndarray, b: int = 1) -> np.ndarray:
    """Keep the lowest ``b`` bits of each hash value (reference
    ``b_bit_minhash.py:38-39``); uint32 output, uint8 when b ≤ 8."""
    if not 0 <= b <= 32:
        raise ValueError("b must be in [0, 32]")
    mask = np.uint64((1 << b) - 1)
    out = np.bitwise_and(np.asarray(sig, dtype=np.uint64), mask)
    return out.astype(np.uint8 if b <= 8 else np.uint32)


def _bbit_slot_size(b: int) -> int:
    """Smallest power-of-two slot width ≥ b (reference
    ``b_bit_minhash.py:147-159``) — slots never straddle block edges."""
    for s in (1, 2, 4, 8, 16, 32):
        if b <= s:
            return s
    raise ValueError("b must be ≤ 32")


def bbit_pack(hv: np.ndarray, b: int) -> np.ndarray:
    """Pack b-bit hash values into uint64 blocks with the reference's
    wire layout (``b_bit_minhash.py:78-101``): ``n = 64/slot`` values
    per block, value ``j`` at shift ``(n-1-j)·slot`` (big-endian within
    the block). Vectorized — no per-value Python loop. This is the
    memory win: 128 1-bit slots pack to two uint64 words."""
    slot = _bbit_slot_size(b)
    n = 64 // slot
    hv = np.asarray(hv, dtype=np.uint64)
    pad = (-len(hv)) % n
    if pad:
        hv = np.concatenate([hv, np.zeros(pad, dtype=np.uint64)])
    shifts = ((n - 1 - np.arange(n, dtype=np.uint64)) * np.uint64(slot))[None, :]
    return np.bitwise_or.reduce(hv.reshape(-1, n) << shifts, axis=1)


def bbit_unpack(blocks: np.ndarray, num_perm: int, b: int) -> np.ndarray:
    """Inverse of :func:`bbit_pack` (reference ``__setstate__``,
    ``b_bit_minhash.py:103-125``); returns uint32[num_perm]."""
    slot = _bbit_slot_size(b)
    n = 64 // slot
    blocks = np.asarray(blocks, dtype=np.uint64)
    shifts = ((n - 1 - np.arange(n, dtype=np.uint64)) * np.uint64(slot))[None, :]
    mask = np.uint64((1 << slot) - 1)
    vals = ((blocks[:, None] >> shifts) & mask).reshape(-1)
    return vals[:num_perm].astype(np.uint32)


def _calc_a(r: float, b: int) -> float:
    if r == 0.0:
        return 1.0 / (1 << b)
    return r * (1 - r) ** (2**b - 1) / (1 - (1 - r) ** (2 * b))


def bbit_jaccard(hv1: np.ndarray, hv2: np.ndarray, b: int = 1, r1: float = 0.0, r2: float = 0.0):
    """Bias-corrected Jaccard from b-bit signatures
    (``b_bit_minhash.py:54-72``): ``(raw − C1) / (1 − C2)``."""
    raw = np.mean(hv1 == hv2, axis=-1)
    a1, a2 = _calc_a(r1, b), _calc_a(r2, b)
    if r1 == 0.0 and r2 == 0.0:
        c1, c2 = a1, a2
    else:
        div = 1 / (r1 + r2)
        c1 = (a1 * r2 + a2 * r1) * div
        c2 = (a1 * r1 + a2 * r2) * div
    return (raw - c1) / (1 - c2)
