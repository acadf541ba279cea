"""Pure-numpy BMP (Windows DIB) codec — no PIL/cv2 in env.

Decoder covers the web-relevant BITMAPINFOHEADER forms: 1/4/8-bit
palette, 24-bit BGR and 32-bit BGRX uncompressed (BI_RGB), plus BI_RLE8
run-length for 8-bit, bottom-up and top-down (negative height) rasters,
4-byte row stride padding. 32-bit "alpha" is padding per the classic
header and is ignored; BITFIELDS/RLE4 and V4/V5 extensions raise
``NotImplementedError`` (clearly-marked, like every other codec gap in
this environment). Output is (h, w, 3) uint8 RGB.

Encoder writes 24-bit BI_RGB, or an 8-bit palette image (optionally
RLE8-compressed) when the image has ≤256 distinct colors — so the
module's own round trips pin the palette and RLE8 decode paths.

Written from the public format layout (Windows GDI documentation);
structure-only, no library code.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp_rgb8(data: bytes) -> np.ndarray:
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER not supported")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    (clr_used,) = struct.unpack("<I", data[46:50])
    if w <= 0 or h_raw == 0:
        raise ValueError("bad BMP dimensions")
    top_down = h_raw < 0
    h = abs(h_raw)
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP not supported")
    if comp not in (0, 1) or (comp == 1 and bpp != 8):
        raise NotImplementedError(f"BMP compression {comp} not supported")

    pal = None
    if bpp <= 8:
        n = clr_used or (1 << bpp)
        pal_raw = np.frombuffer(
            data, np.uint8, count=4 * n, offset=14 + hdr_size
        ).reshape(n, 4)
        pal = np.zeros((256, 3), np.uint8)
        pal[:n] = pal_raw[:, [2, 1, 0]]  # BGRX → RGB

    if comp == 1:  # BI_RLE8
        idx = _decode_rle8(data[pix_off:], w, h)
    else:
        stride = ((w * bpp + 31) // 32) * 4
        raw = np.frombuffer(data, np.uint8, count=stride * h, offset=pix_off).reshape(
            h, stride
        )
        if bpp == 24:
            px = raw[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
        elif bpp == 32:
            px = raw[:, : w * 4].reshape(h, w, 4)[..., [2, 1, 0]]
        else:
            bits = np.unpackbits(raw, axis=1)
            if bpp == 1:
                idx = bits[:, :w]
            elif bpp == 4:
                nyb = bits.reshape(h, -1, 4)
                idx = (nyb * np.array([8, 4, 2, 1])).sum(axis=2)[:, :w]
            else:  # 8
                idx = raw[:, :w]
            px = pal[idx]
        out = px if bpp > 8 else px
        return np.ascontiguousarray(out if top_down else out[::-1]).astype(np.uint8)

    px = pal[idx]
    return np.ascontiguousarray(px if top_down else px[::-1]).astype(np.uint8)


def _decode_rle8(s: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8: (count, value) runs; escapes 0,0=EOL 0,1=EOD 0,2=delta
    0,n>=3=absolute (padded to even)."""
    out = np.zeros((h, w), np.uint8)
    x = y = i = 0
    while i + 1 < len(s):
        c, v = s[i], s[i + 1]
        i += 2
        if c > 0:
            out[y, x : x + c] = v
            x += c
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of data
            break
        elif v == 2:  # delta
            x += s[i]
            y += s[i + 1]
            i += 2
        else:  # absolute run
            out[y, x : x + v] = np.frombuffer(s, np.uint8, count=v, offset=i)
            x += v
            i += v + (v & 1)
    return out


def encode_bmp_rgb8(pixels: np.ndarray, *, rle: bool = False) -> bytes:
    """(h, w, 3) uint8 → BMP bytes. ≤256 distinct colors → 8-bit
    palette (RLE8-compressed when ``rle=True``), else 24-bit BI_RGB.
    Bottom-up, classic 40-byte header. Lossless."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp_rgb8 expects (h, w, 3) uint8")
    flat = np.ascontiguousarray(pixels.reshape(-1, 3))
    colors, inv = np.unique(
        flat.view(np.dtype((np.void, 3))).ravel(), return_inverse=True
    )
    if len(colors) <= 256:
        pal_rgb = colors.view(np.uint8).reshape(-1, 3)
        idx = inv.reshape(h, w).astype(np.uint8)[::-1]  # bottom-up
        pal = np.zeros((len(pal_rgb), 4), np.uint8)
        pal[:, :3] = pal_rgb[:, ::-1]  # RGB → BGRX
        if rle:
            body = _encode_rle8(idx)
            comp = 1
        else:
            stride = ((w + 3) // 4) * 4
            rows = np.zeros((h, stride), np.uint8)
            rows[:, :w] = idx
            body = rows.tobytes()
            comp = 0
        pix_off = 14 + 40 + 4 * len(pal)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, comp, len(body), 2835, 2835, len(pal), 0
        )
        head = struct.pack("<2sIHHI", b"BM", pix_off + len(body), 0, 0, pix_off)
        return head + info + pal.tobytes() + body
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return head + info + body


def _encode_rle8(idx: np.ndarray) -> bytes:
    """Greedy BI_RLE8: maximal runs per row, EOL after each, EOD last."""
    out = bytearray()
    h, w = idx.shape
    for y in range(h):
        row = idx[y]
        x = 0
        while x < w:
            v = row[x]
            n = 1
            while x + n < w and n < 255 and row[x + n] == v:
                n += 1
            out += bytes((n, int(v)))
            x += n
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of data
    return bytes(out)
