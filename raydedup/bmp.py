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


# ------------------------------------------------------------------ ICO
# Windows icon container (favicon.ico — ubiquitous in a web crawl).
# ICONDIR + ICONDIRENTRY[count]; each payload is either a PNG stream
# (modern form) or a BITMAPINFOHEADER DIB with doubled height (XOR
# pixels + 1-bit AND transparency mask) and NO file header. Decode
# picks the largest image; 32-bit entries carry real per-pixel alpha
# (unlike plain BMP) and composite over white like every alpha path
# in this package; the AND mask punches out fully-transparent pixels.


def decode_ico_rgb8(data: bytes) -> np.ndarray:
    if len(data) < 6 or data[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO")
    (count,) = struct.unpack("<H", data[4:6])
    if count == 0:
        raise ValueError("empty ICO")
    best = None
    for i in range(count):
        e = data[6 + 16 * i : 22 + 16 * i]
        w, h = e[0] or 256, e[1] or 256
        size, off = struct.unpack("<II", e[8:16])
        if best is None or w * h > best[0]:
            best = (w * h, w, h, data[off : off + size])
    _, w, h, payload = best
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from raydedup.png import decode_png_rgb8

        return decode_png_rgb8(payload)
    # DIB form: reparse as a BMP by synthesizing the file header and
    # halving the doubled height, then apply alpha/AND-mask over white
    (hdr_size,) = struct.unpack("<I", payload[:4])
    dw, dh2 = struct.unpack("<ii", payload[4:12])
    bpp = struct.unpack("<H", payload[14:16])[0]
    dh = dh2 // 2
    (clr_used,) = struct.unpack("<I", payload[32:36])
    pal_n = (clr_used or (1 << bpp)) if bpp <= 8 else 0
    pix_off = 14 + hdr_size + 4 * pal_n
    fixed = bytearray(payload)
    struct.pack_into("<i", fixed, 8, dh)  # un-double the height
    head = struct.pack("<2sIHHI", b"BM", 14 + len(fixed), 0, 0, pix_off)
    xor_stride = ((dw * bpp + 31) // 32) * 4
    xor_end = (pix_off - 14) + xor_stride * dh
    rgb = decode_bmp_rgb8(head + bytes(fixed[:xor_end]))
    # alpha: 32-bit entries carry a real alpha byte
    if bpp == 32:
        raw = np.frombuffer(payload, np.uint8, count=xor_stride * dh,
                            offset=pix_off - 14).reshape(dh, xor_stride)
        a = raw[:, : dw * 4].reshape(dh, dw, 4)[::-1, :, 3].astype(np.float64) / 255.0
        rgb = np.clip(
            np.rint(rgb * a[..., None] + 255.0 * (1 - a[..., None])), 0, 255
        ).astype(np.uint8)
    else:
        # 1-bit AND mask follows the XOR image (rows padded to 32 bits)
        and_stride = ((dw + 31) // 32) * 4
        off = pix_off - 14 + xor_stride * dh
        if off + and_stride * dh <= len(payload):
            mask = np.frombuffer(payload, np.uint8, count=and_stride * dh,
                                 offset=off).reshape(dh, and_stride)
            bits = np.unpackbits(mask, axis=1)[:, :dw][::-1]  # bottom-up
            rgb = np.where(bits[..., None] == 1, np.uint8(255), rgb)
    return rgb


def encode_ico_rgb8(pixels: np.ndarray, *, png: bool = True) -> bytes:
    """(h, w, 3) uint8 (h, w ≤ 256) → single-image ICO; payload is a
    PNG stream (modern form) or a 32-bit DIB with opaque alpha and an
    empty AND mask. Lossless either way."""
    h, w, _ = pixels.shape
    if h > 256 or w > 256:
        raise ValueError("ICO images are at most 256x256")
    if png:
        from raydedup.png import encode_png_rgb8

        payload = encode_png_rgb8(pixels)
        bpp = 32
    else:
        bgra = np.zeros((h, w, 4), np.uint8)
        bgra[..., :3] = pixels[::-1, :, ::-1]  # bottom-up BGR
        bgra[..., 3] = 255
        and_stride = ((w + 31) // 32) * 4
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0,
            h * w * 4 + and_stride * h, 0, 0, 0, 0,
        )
        payload = info + bgra.tobytes() + b"\x00" * (and_stride * h)
        bpp = 32
    entry = struct.pack(
        "<BBBBHHII", w & 0xFF, h & 0xFF, 0, 0, 1, bpp, len(payload), 22
    )
    return b"\x00\x00\x01\x00\x01\x00" + entry + payload
