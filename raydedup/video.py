"""Video column primitives: MJPEG stream split / encode / frame decode.

MJPEG ("motion JPEG") is the simplest real compressed-video layout —
a stream of concatenated baseline JPEG images — used by HTTP camera
streams and as the MJPG fourcc payload inside AVI. Reusing the
from-scratch JFIF codec (:mod:`raydedup.jpeg`) makes the video frame
-sampling stage a genuinely lossy compressed path (per-frame PSNR
≥ 40 dB invariant), closing the last "compressed video" env-stub
from the round-3 review.

``split_mjpeg`` walks JPEG marker segments by their declared lengths
(entropy-coded scan data byte-stuffs 0xFF00 and restart markers
0xFFD0–D7, so the next true marker is unambiguous) — no fragile
"search for FFD9" heuristics, and frame boundaries are exact even if
marker-like bytes appear inside segment payloads.
"""

from __future__ import annotations

import numpy as np

from raydedup.jpeg import decode_jpeg_rgb8, encode_jpeg_rgb8

_STANDALONE = frozenset(
    [0xD8, 0xD9, 0x01] + list(range(0xD0, 0xD8))  # SOI, EOI, TEM, RSTn
)


def _frame_end(buf: bytes, start: int) -> int:
    """Return the index one past the EOI of the JPEG frame starting at
    ``start`` (which must point at an SOI marker)."""
    n = len(buf)
    if start + 2 > n or buf[start] != 0xFF or buf[start + 1] != 0xD8:
        raise ValueError(f"no SOI at offset {start}")
    pos = start + 2
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError(f"marker desync at offset {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            return pos + 2
        if marker in _STANDALONE:
            pos += 2
            continue
        if pos + 4 > n:
            break
        seg_len = (buf[pos + 2] << 8) | buf[pos + 3]
        pos += 2 + seg_len
        if marker == 0xDA:  # SOS: skip entropy-coded data to next true marker
            while pos + 1 < n:
                if buf[pos] == 0xFF and buf[pos + 1] != 0x00 and not (
                    0xD0 <= buf[pos + 1] <= 0xD7
                ):
                    break
                pos += 1
    raise ValueError("truncated JPEG frame (no EOI)")


def split_mjpeg(data: bytes) -> list[bytes]:
    """Split a concatenated-JPEG (MJPEG) stream into per-frame bytes."""
    frames: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        end = _frame_end(data, pos)
        frames.append(data[pos:end])
        pos = end
    return frames


def mjpeg_frame_offsets(data: bytes) -> np.ndarray:
    """(start, end) byte offsets per frame — lets a sampler skip the
    bytes of unsampled frames without materializing them."""
    offsets = []
    pos = 0
    while pos < len(data):
        end = _frame_end(data, pos)
        offsets.append((pos, end))
        pos = end
    return np.asarray(offsets, dtype=np.int64).reshape(-1, 2)


def encode_mjpeg(frames: list[np.ndarray], quality: int = 90) -> bytes:
    """Encode a list of (h, w, 3) uint8 frames as an MJPEG stream."""
    return b"".join(encode_jpeg_rgb8(f, quality=quality, subsample="444") for f in frames)


def decode_mjpeg_frame(data: bytes) -> np.ndarray:
    """Decode one frame's bytes to (h, w, 3) uint8."""
    return decode_jpeg_rgb8(data)
