"""Verification stages: Jaccard post-filter and per-row image invariants.

The reference returns LSH candidates unfiltered and tells users to
post-filter with ``MinHash.jaccard`` (``datasketch/lsh.py:376-378``).
Here that's a first-class stage: candidate pairs are hash-joined back to
the signature table (ids only — image bytes never transit, SURVEY.md
§7.5) and the vectorized slot-equality estimate prunes false positives.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.minhash import jaccard_estimate
from raydedup.schema import sig_to_numpy


def _attach_side(pairs_ds, slim, side: str, num_partitions: int, out_prefix: str = "minhash"):
    """Reduce-side join on the engine's own bucket-shuffle primitive:
    union pair rows (tag 0) with signature rows (tag 1) keyed on one pair
    side, hash-partition, and within each key run hand the (single)
    signature blob to every pair row. (``Dataset.join`` exists but
    chaining two joins is broken in ray 2.49 — the second join loses the
    left key; this path also reuses the one shuffle machinery we already
    trust at scale.)"""
    from raydedup.stages.grouped import map_key_runs

    other = "id_b" if side == "id_a" else "id_a"
    out_col = f"{out_prefix}_a" if side == "id_a" else f"{out_prefix}_b"
    schema = pairs_ds.schema()
    carry = [c for c in schema.names if c not in ("id_a", "id_b")]
    carry_types = {c: schema.base_schema.field(c).type for c in carry}

    def tag_pairs(batch: pa.Table) -> pa.Table:
        cols = {
            "key": batch.column(side),
            "other": batch.column(other),
            "blob": pa.array([None] * len(batch), pa.binary()),
            "tag": pa.array(np.zeros(len(batch), dtype=np.int8)),
        }
        for c in carry:
            cols[f"c_{c}"] = batch.column(c)
        return pa.table(cols)

    def tag_sigs(batch: pa.Table) -> pa.Table:
        cols = {
            "key": batch.column("image_key"),
            "other": pa.array([None] * len(batch), batch.column("image_key").type),
            "blob": batch.column("sigblob"),
            "tag": pa.array(np.ones(len(batch), dtype=np.int8)),
        }
        for c in carry:
            cols[f"c_{c}"] = pa.array([None] * len(batch), carry_types[c])
        return pa.table(cols)

    tagged = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow").union(
        slim.map_batches(tag_sigs, batch_format="pyarrow")
    )

    def emit(block: pa.Table, starts, ends) -> pa.Table:
        # vectorized (r04, same gather as dedup._pair_set_verify's
        # attach): find each run's signature row, broadcast its position
        # to the run's pair rows, then Arrow takes — no per-row Python
        tags = block.column("tag").to_numpy(zero_copy_only=False)
        starts = np.asarray(starts, np.int64)
        ends = np.asarray(ends, np.int64)
        sig_rows = np.flatnonzero(tags == 1)
        if len(sig_rows) == 0:
            blob_pos = np.full(len(starts), -1, np.int64)
        else:
            fi = np.searchsorted(sig_rows, starts)
            pos = sig_rows[np.minimum(fi, len(sig_rows) - 1)]
            blob_pos = np.where((fi < len(sig_rows)) & (pos < ends), pos, -1)
        pair_rows = np.flatnonzero(tags == 0)
        run_of = np.searchsorted(starts, pair_rows, side="right") - 1
        keep = blob_pos[run_of] >= 0
        pr = pa.array(pair_rows[keep])
        bp = pa.array(blob_pos[run_of[keep]])
        cols = {
            side: block.column("key").take(pr),
            other: block.column("other").take(pr),
            out_col: block.column("blob").take(bp),
        }
        for c in carry:
            cols[c] = block.column(f"c_{c}").take(pr)
        return pa.table(cols)

    return map_key_runs(tagged, "key", emit, num_partitions)


def attach_signatures(pairs_ds, sig_ds, id_col: str, num_partitions: int = 16):
    """pairs (id_a, id_b) → adds packed ``minhash_a`` / ``minhash_b``
    binary columns via two reduce-side joins against the signature
    table. Only ids + 1 KB blobs transit the shuffle."""

    def pack(batch: pa.Table) -> pa.Table:
        # uint32 blobs: slot values are < 2^32, so the joined blob ships
        # half the bytes (jaccard_filter compares equality — width-safe)
        sig = np.ascontiguousarray(sig_to_numpy(batch.column("minhash")).astype(np.uint32))
        buf = sig.tobytes()
        w = sig.shape[1] * 4
        blobs = [buf[i * w : (i + 1) * w] for i in range(sig.shape[0])]
        return pa.table(
            {"image_key": batch.column(id_col), "sigblob": pa.array(blobs, pa.binary())}
        )

    slim = sig_ds.select_columns([id_col, "minhash"]).map_batches(pack, batch_format="pyarrow")
    a = _attach_side(pairs_ds, slim, "id_a", num_partitions)
    return _attach_side(a, slim, "id_b", num_partitions)


def jaccard_filter(pairs_with_sigs, threshold: float, num_perm: int = 128, keep_estimate: bool = True):
    """Vectorized slot-equality estimate per pair; keep ≥ threshold."""

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            out = batch.select(["id_a", "id_b"])
            return out.append_column("jaccard", pa.array([], pa.float64())) if keep_estimate else out
        sa = np.frombuffer(b"".join(batch.column("minhash_a").to_pylist()), dtype=np.uint32).reshape(-1, num_perm)
        sb = np.frombuffer(b"".join(batch.column("minhash_b").to_pylist()), dtype=np.uint32).reshape(-1, num_perm)
        est = jaccard_estimate(sa, sb)
        keep = est >= threshold
        out = batch.select(["id_a", "id_b"]).filter(pa.array(keep))
        if keep_estimate:
            out = out.append_column("jaccard", pa.array(est[keep], pa.float64()))
        return out

    return pairs_with_sigs.map_batches(fn, batch_format="pyarrow")


def verify_pairs(pairs_ds, sig_ds, id_col: str, threshold: float, num_perm: int = 128, num_partitions: int = 16):
    """Full verification: join signatures, filter by estimated Jaccard."""
    return jaccard_filter(
        attach_signatures(pairs_ds, sig_ds, id_col, num_partitions), threshold, num_perm
    )


class DecodeInvariantStage:
    """Actor-pool stage checking the per-row image invariant
    (BASELINE.json input_hint): decode the payload and report PSNR vs a
    deterministically regenerated reference buffer (lossless fmts must
    be bit-exact → PSNR inf; lossy must be ≥ min_psnr_db).

    Emits (image_id, fmt, psnr_db, ok) — a metrics table, not a filter.
    """

    def __init__(self, min_psnr_db: float = 40.0):
        self.min_psnr_db = min_psnr_db

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raydedup.media import decode_image, psnr

        ids = batch.column("image_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        refs = batch.column("ref_pixels").to_pylist() if "ref_pixels" in batch.column_names else None
        out_psnr, ok = [], []
        for i in range(len(ids)):
            img = decode_image(blobs[i], ws[i], hs[i], fmts[i])
            if refs is not None:
                ref = np.frombuffer(refs[i], dtype=np.uint8).reshape(hs[i], ws[i], 3)
                p = psnr(img, ref)
            else:
                p = float("inf")  # decode succeeded; no reference buffer provided
            out_psnr.append(p)
            ok.append(p >= self.min_psnr_db)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "fmt": pa.array(fmts, pa.string()),
                "psnr_db": pa.array(out_psnr, pa.float64()),
                "ok": pa.array(ok, pa.bool_()),
            }
        )
