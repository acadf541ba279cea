"""Pure-numpy GIF (GIF87a/GIF89a) codec — no PIL in this environment.

Web corpora are full of GIFs, and animated GIFs are the one "video"
format an image crawl actually contains; this closes that gap the way
:mod:`raydedup.png` and :mod:`raydedup.jpeg` closed theirs — a
from-scratch implementation of the public wire format (the GIF89a
specification: LZW with variable code widths and deferred clear,
interlacing, local/global color tables, graphic-control extensions
with transparency and disposal methods 0-3), not a port of any
library.

- :func:`decode_gif` returns the fully *composited* RGB frames of an
  animation (each frame rendered onto the logical screen per its
  predecessor's disposal method), so downstream frame sampling sees
  what a viewer sees, not raw sub-rectangles.
- :func:`encode_gif_rgb8` writes single images or animations. The
  palette is exact when the frames use <= 256 unique colors
  (lossless round-trip, asserted in tests); otherwise a documented
  3-3-2 uniform quantization applies. With ``optimize=True`` (the
  real-world encoder practice) each animation frame after the first
  is cropped to the bounding box of changed pixels and unchanged
  pixels inside it become transparent — which also exercises the
  decoder's transparency/compositing path in round-trip tests.

Per-code LZW loops are Python over a byte-at-a-time bit cursor — GIF
payloads on the media path are small (the brief's memory-aware rule
keeps image batches narrow), and codes, unlike pixels, number ~10x
fewer than bytes.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODES = 4096  # 12-bit LZW ceiling per the GIF spec


# ----------------------------------------------------------------- LZW
def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW (LSB-first variable-width codes) -> ``n_pixels``
    palette indices."""
    clear = 1 << mcs
    eoi = clear + 1
    buf = 0
    nbuf = 0
    ip = 0
    nd = len(data)
    out = bytearray()
    # table entries as bytes; index = code
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbuf < width:
            if ip >= nd:
                raise ValueError("truncated GIF LZW stream")
            buf |= data[ip] << nbuf
            ip += 1
            nbuf += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbuf -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _MAX_CODES:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < _MAX_CODES:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        prev = entry
        # decoder grows width when its table fills the current range
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """Palette indices -> GIF-variant LZW bytes (leading clear code,
    width grows one code *ahead* of the decoder's table, clear emitted
    when the 12-bit table fills)."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbuf = 0

    def emit(code: int, w: int) -> None:
        nonlocal buf, nbuf
        buf |= code << nbuf
        nbuf += w
        while nbuf >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbuf -= 8

    width = mcs + 1
    emit(clear, width)
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    seq = indices.astype(np.int64, copy=False)
    cur = int(seq[0])
    for b in seq[1:]:
        b = int(b)
        nc = table.get((cur, b))
        if nc is not None:
            cur = nc
            continue
        emit(cur, width)
        table[(cur, b)] = next_code
        next_code += 1
        # the decoder adds this entry one code later, so the encoder
        # widens when next_code-1 crosses the current range
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == _MAX_CODES:
            emit(clear, width)
            table = {}
            next_code = eoi + 1
            width = mcs + 1
        cur = b
    emit(cur, width)
    emit(eoi, width)
    if nbuf:
        out.append(buf & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- helpers
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row indices in GIF interlace transmission order."""
    return np.concatenate([np.arange(start, h, step) for start, step in _INTERLACE_PASSES])


def _subblocks(payload: bytes) -> bytes:
    """Split payload into <=255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


# -------------------------------------------------------------- decode
def decode_gif(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of fully composited (screen_h, screen_w, 3)
    uint8 RGB frames, honoring transparency and disposal methods
    0/1 (leave), 2 (restore background) and 3 (restore previous)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    packed, bg_idx = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg_rgb = gct[bg_idx] if gct is not None and bg_idx < len(gct) else np.zeros(3, np.uint8)

    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).astype(np.uint8)
    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                gpacked = payload[0]
                disposal = (gpacked >> 2) & 0x07
                transparent = payload[3] if gpacked & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, iw, ih = struct.unpack("<HHHH", data[pos : pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("GIF image with no color table")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(lzw, mcs, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrived in pass order
            rows = np.empty((ih, iw), dtype=np.uint8)
            rows[_interlace_order(ih)] = idx
            idx = rows
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + ih, left : left + iw]
        rgb = lct[np.minimum(idx, len(lct) - 1)]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore the frame's region to background
            canvas[top : top + ih, left : left + iw] = bg_rgb
        elif disposal == 3 and saved is not None:
            canvas = saved
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif_rgb8(data: bytes) -> np.ndarray:
    """First composited frame — the still-image view of a GIF."""
    return decode_gif(data)[0]


def gif_frame_count(data: bytes) -> int:
    """Count image blocks with a marker walk — no LZW work."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    count = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        ipacked = data[pos + 8]
        pos += 9
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        pos += 1  # min code size
        while data[pos]:
            pos += 1 + data[pos]
        pos += 1
        count += 1
    return count


# -------------------------------------------------------------- encode
def _quantize(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """Map frames to one shared palette: exact when <= 256 unique
    colors, else 3-3-2 uniform quantization (documented lossy
    fallback). Returns (palette (n,3) uint8, per-frame index arrays)."""
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    packed = (
        stacked[:, 0].astype(np.uint32) << 16
        | stacked[:, 1].astype(np.uint32) << 8
        | stacked[:, 2].astype(np.uint32)
    )
    uniq = np.unique(packed)
    if len(uniq) <= 256:
        palette = np.stack([(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF], axis=1).astype(np.uint8)
        idx_flat = np.searchsorted(uniq, packed).astype(np.uint8)
    else:
        # 3-3-2: cell centers as palette entries
        cells = np.arange(256, dtype=np.uint32)
        palette = np.stack(
            [
                ((cells >> 5) & 0x07) * 32 + 16,
                ((cells >> 2) & 0x07) * 32 + 16,
                (cells & 0x03) * 64 + 32,
            ],
            axis=1,
        ).astype(np.uint8)
        idx_flat = (
            (stacked[:, 0] >> 5).astype(np.uint8) << 5
            | (stacked[:, 1] >> 5).astype(np.uint8) << 2
            | (stacked[:, 2] >> 6).astype(np.uint8)
        )
    indices = []
    start = 0
    for f in frames:
        n = f.shape[0] * f.shape[1]
        indices.append(idx_flat[start : start + n].reshape(f.shape[:2]))
        start += n
    return palette, indices


def encode_gif_rgb8(
    frames: np.ndarray | list[np.ndarray],
    delay_cs: int = 4,
    loop: int = 0,
    interlace: bool = False,
    optimize: bool = True,
) -> bytes:
    """(h, w, 3) uint8 frame(s) -> GIF89a bytes. Animations get a
    NETSCAPE2.0 loop block and per-frame graphic-control extensions;
    with ``optimize`` each later frame is cropped to its changed-pixel
    bounding box with unchanged pixels transparent (disposal 1)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = list(frames)
    if not frames or any(f.ndim != 3 or f.shape[2] != 3 or f.dtype != np.uint8 for f in frames):
        raise ValueError("encode_gif_rgb8 expects (h, w, 3) uint8 frames")
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all GIF frames must share one shape")
    h, w = frames[0].shape[:2]
    palette, indices = _quantize(frames)
    n_colors = len(palette)
    # padded table size 2^(p+1); a spare slot doubles as transparent index
    need = n_colors + (1 if len(frames) > 1 and optimize else 0)
    p = 0
    while (2 << p) < need and p < 7:
        p += 1
    table_n = 2 << p
    transparent = n_colors if (len(frames) > 1 and optimize and n_colors < table_n) else -1
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[:n_colors] = palette
    mcs = max(2, p + 1)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (7 << 4) | p, 0, 0])  # GCT flag, 8-bit res, bg=0
    out += pal.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"

    prev_idx = None
    for fi, idx in enumerate(indices):
        left = top = 0
        ih, iw = h, w
        region = idx
        use_transp = False
        if fi > 0 and transparent >= 0:
            diff = idx != prev_idx
            ys, xs = np.nonzero(diff)
            if len(ys) == 0:
                top = left = 0
                ih = iw = 1
                region = np.full((1, 1), transparent, dtype=np.int32)
                use_transp = True
            else:
                top, left = int(ys.min()), int(xs.min())
                ih, iw = int(ys.max()) - top + 1, int(xs.max()) - left + 1
                region = idx[top : top + ih, left : left + iw].astype(np.int32).copy()
                keep = diff[top : top + ih, left : left + iw]
                region[~keep] = transparent
                use_transp = True
        if len(frames) > 1:
            gpacked = (1 << 2) | (1 if use_transp else 0)  # disposal 1: leave
            out += b"\x21\xf9\x04" + bytes([gpacked]) + struct.pack("<H", delay_cs)
            out += bytes([transparent if use_transp else 0, 0])
        ipacked = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHH", left, top, iw, ih) + bytes([ipacked])
        rows = np.asarray(region)
        if interlace:
            rows = rows[_interlace_order(ih)]
        out += bytes([mcs])
        out += _subblocks(_lzw_encode(rows.reshape(-1), mcs))
        prev_idx = idx
    out += b"\x3b"
    return bytes(out)
