"""Token hashing, shingling and permutation generation.

Bit-exact contracts with the reference (cited for parity checking, not
copied — the math is standard universal hashing):

- ``sha1_hash32`` / ``sha1_hash64``: first 4/8 bytes of SHA1,
  little-endian unsigned (reference ``datasketch/hashfunc.py:5-28``).
- ``generate_permutations``: per-permutation ``(a, b)`` pairs drawn
  interleaved from ``np.random.RandomState(seed)`` with
  ``a ~ randint(1, p)``, ``b ~ randint(0, p)``, ``p = 2^61 - 1``
  (reference ``datasketch/minhash.py:170-184``). The interleaved draw
  order matters for bit-exactness and is reproduced here.

Shingling is user-land in the reference (callers feed token bytes to
``MinHash.update``); we standardize two shingle functions so the Ray
pipeline and the conformance harness feed *identical* token sets to
both engines.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MERSENNE_PRIME = np.uint64((1 << 61) - 1)
MAX_HASH = np.uint64((1 << 32) - 1)


def sha1_hash32(data: bytes) -> int:
    """First 4 bytes of SHA1 as little-endian uint32."""
    return struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0]


def sha1_hash64(data: bytes) -> int:
    """First 8 bytes of SHA1 as little-endian uint64."""
    return struct.unpack("<Q", hashlib.sha1(data).digest()[:8])[0]


def md5_hash64(data: bytes) -> int:
    """Bytes 8..16 of MD5 as little-endian uint64 — identical to
    DuckDB's ``md5_number_lower``, so sketches built with this hashfunc
    are SQL-reproducible (custom hashfuncs are a first-class reference
    feature, ``datasketch/hashfunc.py``)."""
    return struct.unpack("<Q", hashlib.md5(data).digest()[8:16])[0]


def md5_hash32(data: bytes) -> int:
    """Low 32 bits of :func:`md5_hash64` (DuckDB:
    ``md5_number_lower(x) & 4294967295``)."""
    return struct.unpack("<I", hashlib.md5(data).digest()[8:12])[0]


HASH32_FUNCS = {"sha1": sha1_hash32, "md5": md5_hash32}
HASH64_FUNCS = {"sha1": sha1_hash64, "md5": md5_hash64}


def hash_tokens32(tokens, memo: dict | None = None, hashfunc: str = "sha1") -> np.ndarray:
    """Hash an iterable of token ``bytes`` to a uint64 array of 32-bit
    hash values (``sha1`` default for reference bit-parity; ``md5`` is
    DuckDB-reproducible for oracled queries).

    The digest itself cannot be vectorized with numpy, so the hot-path
    trick is memoization: within a batch (and across batches inside one
    actor) most shingles repeat, and each unique shingle is hashed
    exactly once.

    Args:
        tokens: iterable of bytes.
        memo: optional persistent dict (token -> int) owned by the
            calling actor; amortizes hashing across batches. Use one
            memo per hashfunc.
    """
    if memo is None:
        memo = {}
    out = np.empty(len(tokens), dtype=np.uint64)
    fn = HASH32_FUNCS[hashfunc]
    for i, tok in enumerate(tokens):
        h = memo.get(tok)
        if h is None:
            h = fn(tok)
            memo[tok] = h
        out[i] = h
    return out


def hash_bytes64(tokens, memo: dict | None = None) -> np.ndarray:
    """SHA1-64 (little-endian first 8 bytes) of an iterable of bytes,
    memoized — the shared shingle-hash for the AllPairs/containment
    operators (CMS ordering, prefix anchors and set blobs must agree)."""
    if memo is None:
        memo = {}
    out = np.empty(len(tokens), dtype=np.uint64)
    _sha1 = hashlib.sha1
    _unpack = struct.unpack
    for i, tok in enumerate(tokens):
        h = memo.get(tok)
        if h is None:
            h = _unpack("<Q", _sha1(tok).digest()[:8])[0]
            memo[tok] = h
        out[i] = h
    return out


def hash_strings32_arrow(arr, memo: dict | None = None, hashfunc: str = "sha1") -> np.ndarray:
    """:func:`hash_tokens32` for a pyarrow string Array: the Python
    digest loop runs over the batch's UNIQUE strings only
    (``pc.unique``); repeats map through one vectorized ``index_in`` +
    numpy take. The memo stays keyed by UTF-8 bytes, shared with the
    list-based path. The SHA1-per-unique-token contract (reference
    ``datasketch/hashfunc.py:5-15``) is untouched — only the repeat
    lookups are vectorized."""
    import pyarrow.compute as pc

    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    if memo is None:
        memo = {}
    uniq = pc.unique(arr)
    vals = np.empty(len(uniq), dtype=np.uint64)
    fn = HASH32_FUNCS[hashfunc]
    get = memo.get
    for i, t in enumerate(uniq.to_pylist()):
        tb = t.encode("utf-8")
        h = get(tb)
        if h is None:
            h = fn(tb)
            memo[tb] = h
        vals[i] = h
    code = pc.index_in(arr, value_set=uniq).to_numpy(zero_copy_only=False)
    return vals[code.astype(np.int64)]


def generate_permutations(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Seed-derived universal-hash parameters ``(a, b)``, each
    ``uint64[num_perm]``, identical to the reference's draw order
    (``datasketch/minhash.py:170-184``): for each permutation the pair
    is drawn consecutively, ``a`` in ``[1, p)``, ``b`` in ``[0, p)``.

    Cheap (microseconds) and deterministic — every actor recomputes
    these in ``__init__`` instead of shipping them.
    """
    gen = np.random.RandomState(seed)
    a = np.empty(num_perm, dtype=np.uint64)
    b = np.empty(num_perm, dtype=np.uint64)
    p = int(MERSENNE_PRIME)
    for i in range(num_perm):
        a[i] = gen.randint(1, p, dtype=np.uint64)
        b[i] = gen.randint(0, p, dtype=np.uint64)
    return a, b


def char_shingles(text: str, k: int = 3, lower: bool = True) -> set[bytes]:
    """Character k-shingles as utf-8 bytes (the reference docs' standard
    preprocessing, e.g. ``docs/lsh.rst`` 20-Newsgroups 3-shingles)."""
    if lower:
        text = text.lower()
    if len(text) < k:
        return {text.encode("utf-8")} if text else set()
    return {text[i : i + k].encode("utf-8") for i in range(len(text) - k + 1)}


def word_ngram_shingles(text: str, n: int = 3, lower: bool = True) -> set[bytes]:
    """Word n-gram shingles (space-joined, utf-8). ``n=1`` is a plain
    token set (the reference examples' style, ``examples/lsh_examples.py``).

    Docs with fewer than ``n`` words yield an EMPTY set — matching the
    SQL oracle semantics (generate_series over len-n+1 produces nothing)
    so a pair of identical short docs is not a Jaccard-1 pair on one
    engine only."""
    if lower:
        text = text.lower()
    words = text.split()
    if len(words) < n:
        return set()
    return {" ".join(words[i : i + n]).encode("utf-8") for i in range(len(words) - n + 1)}
