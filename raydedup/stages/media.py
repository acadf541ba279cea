"""Multimodal (image) actor-pool stages: decode, feature-extract, resize.

Images are opaque ``binary`` payloads with typed metadata (w, h, fmt).
Each stage is a callable class for ``map_batches(Cls, concurrency=N,
batch_size=B)`` — small batches because payloads are wide (the brief's
memory-aware rule). The raw/png codecs are real (raydedup.media /
raydedup.png); other codecs raise ``NotImplementedError`` — a
clearly-marked stub where this environment lacks image libraries, with
the Ray-side plumbing (schema, actor signature, output layout) real and
tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.media import box_downsample, decode_image, phash64


class DecodeFeaturesStage:
    """Decode each payload and emit compact per-image features:
    (image_id, phash_check:int64, mean_r/g/b:float64, decode_ok:bool).
    Never re-emits the pixels — features leave, bytes stay."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        ph, means, ok = [], [], []
        for i in range(len(ids)):
            try:
                img = decode_image(blobs[i], ws[i], hs[i], fmts[i])
                ph.append(phash64(img))
                means.append(img.reshape(-1, 3).mean(axis=0))
                ok.append(True)
            except NotImplementedError:
                if self.strict:
                    raise
                ph.append(0)
                means.append(np.zeros(3))
                ok.append(False)
        means = np.asarray(means, dtype=np.float64)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "phash_check": pa.array(ph, pa.int64()),
                "mean_r": pa.array(means[:, 0], pa.float64()),
                "mean_g": pa.array(means[:, 1], pa.float64()),
                "mean_b": pa.array(means[:, 2], pa.float64()),
                "decode_ok": pa.array(ok, pa.bool_()),
            }
        )


class ResizeStage:
    """Box-downsample every image to (out, out) grayscale uint8 and emit
    as fixed-size binary — the thumbnail/embedding-input path."""

    def __init__(self, out: int = 8):
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        thumbs = []
        for i in range(len(ids)):
            img = decode_image(blobs[i], ws[i], hs[i], fmts[i])
            t = np.clip(box_downsample(img, self.out), 0, 255).astype(np.uint8)
            thumbs.append(t.tobytes())
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "thumb": pa.array(thumbs, pa.binary()),
                "thumb_w": pa.array([self.out] * len(ids), pa.int32()),
                "thumb_h": pa.array([self.out] * len(ids), pa.int32()),
            }
        )
