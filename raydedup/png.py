"""Minimal pure-Python PNG codec (RGB8, filter 0) — no PIL/cv2 in env.

Real enough to exercise the decode path end-to-end: encodes the synth
generator's pixel buffers to spec-compliant PNG (zlib + chunk CRCs),
and decodes them back. Only supports what the generator emits
(color type 2, bit depth 8, filter 0 per scanline) — anything else
raises, by design (SURVEY.md §7.5: multimodal decode is stubbed where
the env lacks codecs, but the plumbing is real and tested).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png_rgb8(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (filter 0 rows, one IDAT)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png_rgb8 expects (h, w, 3) uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png_rgb8(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Supports only the subset this module
    encodes (RGB8, non-interlaced, filter 0)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError("only RGB8 non-interlaced supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if (raw[:, 0] != 0).any():
        raise NotImplementedError("only filter 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()
