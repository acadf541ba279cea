"""Banded LSH as a groupby shuffle: band explode → bucket groupby → pairs.

The reference's ``MinHashLSH.insert`` appends keys into ``b`` mutable
hash tables (``datasketch/lsh.py:326-347``) and ``query`` unions bucket
members (``lsh.py:370-432``). Here the "index" is a table: each row
explodes into ``b`` slim ``(bucket, id)`` rows, a single
``groupby(bucket)`` shuffle co-locates each LSH bucket, and pair
emission inside ``map_groups`` replaces query-time lookups.

Scale design:
- the exploded table carries ONLY ``(bucket: uint64, id)`` — the band's
  r×8-byte key is mixed down to one 64-bit value with a vectorized
  FNV-style fold (band_idx is mixed in so distinct bands never share a
  bucket). A 64-bit collision adds a false candidate pair with
  probability ~(n·b)²/2⁶⁴ — swallowed by the verification stage.
- skew: buckets larger than ``bucket_cap`` emit a star (min-id to each
  member) instead of all O(m²) pairs — the connected-components result
  is identical because every bucket is one clique either way; run
  exact pre-collapse (dedup.exact stage) first so only genuinely hot
  near-dup floods hit the cap. ``bucket_stats`` is the reference's
  ``get_counts`` (``lsh.py:560-589``) re-expressed for monitoring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_BAND_SALT = np.uint64(0x9E3779B97F4A7C15)


def fold_band_buckets(sig: np.ndarray, b: int, r: int) -> np.ndarray:
    """(n, ≥b*r) uint64 signatures → (n*b,) uint64 bucket ids (row-major:
    row0 band0..b-1, row1 ...). Pure numpy column-fold, no byte keys."""
    n = sig.shape[0]
    vals = np.ascontiguousarray(sig[:, : b * r], dtype=np.uint64).reshape(n * b, r)
    h = np.full(n * b, _FNV_OFFSET, dtype=np.uint64)
    for j in range(r):
        h ^= vals[:, j]
        h *= _FNV_PRIME
    band_idx = np.tile(np.arange(b, dtype=np.uint64), n)
    h ^= band_idx * _BAND_SALT
    h *= _FNV_PRIME
    return h


def explode_minhash_bands(batch: pa.Table, b: int, r: int, id_col: str, num_perm: int = 128) -> pa.Table:
    """map_batches fn: signature table → slim (id, bucket) band table."""
    from raydedup.schema import sig_to_numpy

    sig = sig_to_numpy(batch.column("minhash"), num_perm)
    buckets = fold_band_buckets(sig, b, r)
    ids = batch.column(id_col)
    # repeat each id b times (Arrow take with repeated indices — no python loop)
    idx = np.repeat(np.arange(len(batch), dtype=np.int64), b)
    return pa.table({id_col: ids.take(pa.array(idx)), "bucket": pa.array(buckets, pa.uint64())})


def explode_simhash_bands(batch: pa.Table, num_bands: int, id_col: str, simhash_col: str = "simhash") -> pa.Table:
    """map_batches fn: 64-bit simhash → (id, bucket) rows, one per
    bit-band (pigeonhole: Hamming ≤ num_bands-1 ⇒ ≥1 shared band)."""
    from raydedup.simhash import hamming_band_keys

    words = batch.column(simhash_col).to_numpy(zero_copy_only=False)
    band_idx, vals = hamming_band_keys(words, num_bands=num_bands)
    # mix (band_idx, val) into a single bucket id; salt differently from
    # minhash bands so the two candidate spaces never collide
    h = (vals + np.uint64(0xABCDEF0123456789)) * _FNV_PRIME
    h ^= (band_idx.astype(np.uint64) + np.uint64(17)) * _BAND_SALT
    h *= _FNV_PRIME
    ids = batch.column(id_col)
    idx = np.repeat(np.arange(len(batch), dtype=np.int64), num_bands)
    return pa.table({id_col: ids.take(pa.array(idx)), "bucket": pa.array(h, pa.uint64())})


def make_pair_emitter(id_col: str, bucket_cap: int = 512):
    """map_groups fn over the bucket groupby: emit candidate pairs
    (id_a < id_b). Buckets above ``bucket_cap`` emit a star from the min
    id (component-equivalent; see module docstring)."""

    def emit(group: pa.Table) -> pa.Table:
        typ = group.column(id_col).type
        ids = sorted(set(group.column(id_col).to_pylist()))
        m = len(ids)
        if m < 2:
            return pa.table({"id_a": pa.array([], typ), "id_b": pa.array([], typ)})
        if m <= bucket_cap:
            a = []
            bb = []
            for i in range(m - 1):
                a.extend([ids[i]] * (m - 1 - i))
                bb.extend(ids[i + 1 :])
        else:
            a = [ids[0]] * (m - 1)
            bb = ids[1:]
        return pa.table({"id_a": pa.array(a, typ), "id_b": pa.array(bb, typ)})

    return emit


def candidate_pairs(band_ds, id_col: str, bucket_cap: int = 512):
    """bucket groupby → pair emission → global pair dedupe.

    Two shuffles: (1) on ``bucket`` (the LSH join key), (2) on the pair
    itself to drop duplicates from multi-band collisions (the
    reference's query-side set-union, ``lsh.py:423-432``)."""
    from ray.data.aggregate import Count

    pairs = band_ds.groupby("bucket").map_groups(
        make_pair_emitter(id_col, bucket_cap), batch_format="pyarrow"
    )
    return (
        pairs.groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["id_a", "id_b"])
    )


def bucket_stats(band_ds):
    """Bucket-size histogram — the skew detector (reference
    ``get_counts``, ``lsh.py:560-589``)."""
    from ray.data.aggregate import Count

    return band_ds.groupby("bucket").aggregate(Count(alias_name="size"))
