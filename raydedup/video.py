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


# ------------------------------------------------------------------ AVI
# Minimal RIFF/AVI container around the MJPG fourcc — the form real
# crawl MJPEG almost always arrives in. Layout per the public
# AVI RIFF form: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
# LIST('movi' 00dc...) idx1). Only what a frame sampler needs is
# parsed: the video stream's frame chunks (by id), dimensions and
# frame rate; audio streams ('##wb') are skipped.

import struct as _struct


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 25, quality: int = 90) -> bytes:
    """Encode frames as an MJPG-in-AVI file (one video stream, idx1
    index). Frames must share (h, w)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg_rgb8(f, quality=quality, subsample="444") for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + _struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(four: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", four + body)

    maxb = max(len(p) for p in payloads)
    avih = _struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, maxb * fps, 0, 0x10,  # usec/frame, byte rate, pad, HASINDEX
        len(payloads), 0, 1, maxb, w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + _struct.pack(
        "<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, fps, 0, len(payloads), maxb, 0xFFFFFFFF & -1, 0, 0, 0, w, h
    )
    # BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = _struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per chunk, offsets relative to the start of 'movi'
    idx = bytearray()
    off = 4  # after the 'movi' fourcc
    for p in payloads:
        idx += b"00dc" + _struct.pack("<III", 0x10, off, len(p))  # AVIIF_KEYFRAME
        off += 8 + len(p) + (len(p) & 1)
    body = hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"AVI " + body


def parse_avi_mjpeg(data: bytes) -> tuple[list[bytes], int, int, int]:
    """RIFF/AVI walk → (mjpeg frame payloads, w, h, fps). Only the
    FIRST vids/MJPG stream's '##dc' chunks are collected; the movi
    walk uses declared chunk sizes (no scanning). Raises on non-AVI
    and on a video fourcc this environment has no codec for."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = fps = 0
    vid_stream = None
    fourcc = None
    frames: list[bytes] = []
    n_streams = 0

    def walk(pos: int, end: int):
        nonlocal w, h, fps, vid_stream, fourcc, n_streams
        while pos + 8 <= end:
            cid, csz = _struct.unpack_from("<4sI", data, pos)
            body_start = pos + 8
            body_end = min(body_start + csz, end)
            if cid == b"LIST":
                four = data[body_start : body_start + 4]
                if four in (b"hdrl", b"strl", b"movi"):
                    walk(body_start + 4, body_end)
            elif cid == b"strh":
                typ = data[body_start : body_start + 4]
                if typ == b"vids" and vid_stream is None:
                    vid_stream = n_streams
                    fourcc = data[body_start + 4 : body_start + 8]
                    scale, rate = _struct.unpack_from("<II", data, body_start + 20)
                    fps = rate // scale if scale else 0
                n_streams += 1
            elif cid == b"avih":
                w, h = _struct.unpack_from("<II", data, body_start + 32)
            elif vid_stream is not None and cid[:2] == b"%02d" % vid_stream and cid[2:4] in (b"dc", b"db"):
                frames.append(data[body_start:body_end])
            pos = body_start + csz + (csz & 1)

    walk(12, len(data))
    if vid_stream is None:
        raise ValueError("AVI has no video stream")
    if fourcc not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(f"AVI video fourcc {fourcc!r} not supported")
    return frames, int(w), int(h), int(fps)
