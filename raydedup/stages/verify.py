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


def attach_signatures(pairs_ds, sig_ds, id_col: str, num_partitions: int = 16):
    """pairs (id_a, id_b) ⋈ signatures on both sides → adds
    ``minhash_a`` / ``minhash_b`` columns (hash-partitioned joins)."""
    slim = sig_ds.select_columns([id_col, "minhash"])
    a = pairs_ds.join(
        slim, join_type="inner", num_partitions=num_partitions, on=("id_a",), right_on=(id_col,), right_suffix="_a"
    )
    a = a.map_batches(
        lambda t: t.rename_columns(
            {c: ("minhash_a" if c == "minhash" else c) for c in t.column_names}
        ),
        batch_format="pyarrow",
    )
    b = a.join(
        slim, join_type="inner", num_partitions=num_partitions, on=("id_b",), right_on=(id_col,), right_suffix="_b"
    )
    return b.map_batches(
        lambda t: t.rename_columns(
            {c: ("minhash_b" if c == "minhash" else c) for c in t.column_names}
        ),
        batch_format="pyarrow",
    )


def jaccard_filter(pairs_with_sigs, threshold: float, num_perm: int = 128, keep_estimate: bool = True):
    """Vectorized slot-equality estimate per pair; keep ≥ threshold."""

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            out = batch.select(["id_a", "id_b"])
            return out.append_column("jaccard", pa.array([], pa.float64())) if keep_estimate else out
        sa = sig_to_numpy(batch.column("minhash_a"), num_perm)
        sb = sig_to_numpy(batch.column("minhash_b"), num_perm)
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
