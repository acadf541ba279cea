"""Pure-numpy Truevision TGA codec — no PIL in env.

TGA turns up in game-asset and graphics training corpora. Decoder
covers the common forms: image types 1 (palette), 2 (truecolor), 3
(grayscale) and their RLE variants 9/10/11; pixel depths 8 (gray or
palette index), 16 (ARRRRRGG GGGBBBBB, 5-5-5 + attribute bit), 24
(BGR) and 32 (BGRA — alpha composited over white like every alpha
path in this package); bottom-up and top-origin rasters (descriptor
bit 5); image-ID fields skipped. Encoder writes 24-bit truecolor
(type 2, or RLE type 10) bottom-up. Written from the public
Truevision TGA 2.0 specification; structure only.
"""

from __future__ import annotations

import struct

import numpy as np


def _rle_expand(s: bytes, bpp: int, n_px: int) -> np.ndarray:
    """TGA RLE: packet header bit7 = run (count = low7+1, one pixel
    follows) else literal (count pixels follow)."""
    out = np.empty(n_px * bpp, np.uint8)
    i = pos = 0
    while pos < n_px * bpp and i < len(s):
        head = s[i]
        i += 1
        cnt = (head & 0x7F) + 1
        if head & 0x80:  # run
            px = np.frombuffer(s, np.uint8, count=bpp, offset=i)
            i += bpp
            out[pos : pos + cnt * bpp] = np.tile(px, cnt)[: n_px * bpp - pos]
        else:  # literal
            take = cnt * bpp
            out[pos : pos + take] = np.frombuffer(s, np.uint8, count=take, offset=i)[
                : n_px * bpp - pos
            ]
            i += take
        pos += cnt * bpp
    return out[: n_px * bpp]


def decode_tga_rgb8(data: bytes) -> np.ndarray:
    if len(data) < 18:
        raise ValueError("not a TGA")
    (
        id_len,
        cmap_type,
        img_type,
        cmap_first,
        cmap_len,
        cmap_bits,
        _xo,
        _yo,
        w,
        h,
        depth,
        desc,
    ) = struct.unpack("<BBBHHBHHHHBB", data[:18])
    if img_type not in (1, 2, 3, 9, 10, 11) or w == 0 or h == 0:
        raise ValueError(f"unsupported TGA image type {img_type}")
    rle = img_type >= 9
    kind = img_type - 8 if rle else img_type
    pos = 18 + id_len

    pal = None
    if cmap_type == 1:
        entry_bytes = (cmap_bits + 7) // 8
        raw = np.frombuffer(data, np.uint8, count=cmap_len * entry_bytes, offset=pos)
        pos += cmap_len * entry_bytes
        ent = raw.reshape(cmap_len, entry_bytes)
        pal = np.zeros((cmap_first + cmap_len, 3), np.uint8)
        if entry_bytes in (3, 4):
            pal[cmap_first:] = ent[:, [2, 1, 0]]  # BGR(A) → RGB
        elif entry_bytes == 2:
            v = ent[:, 0].astype(np.uint16) | (ent[:, 1].astype(np.uint16) << 8)
            pal[cmap_first:, 0] = ((v >> 10) & 31) * 255 // 31
            pal[cmap_first:, 1] = ((v >> 5) & 31) * 255 // 31
            pal[cmap_first:, 2] = (v & 31) * 255 // 31
        else:
            raise NotImplementedError(f"TGA colormap entry size {cmap_bits}")

    bpp = (depth + 7) // 8
    if rle:
        raw = _rle_expand(data[pos:], bpp, w * h)
    else:
        raw = np.frombuffer(data, np.uint8, count=w * h * bpp, offset=pos)
    px = raw.reshape(h, w, bpp)

    if kind == 1:  # palette
        if pal is None or bpp != 1:
            raise NotImplementedError("TGA palette form not supported")
        rgb = pal[px[..., 0]]
    elif kind == 3:  # grayscale
        if bpp != 1:
            raise NotImplementedError("TGA 16-bit grayscale not supported")
        rgb = np.repeat(px, 3, axis=2)
    elif bpp == 3:
        rgb = px[..., [2, 1, 0]]
    elif bpp == 4:
        a = px[..., 3:4].astype(np.float64) / 255.0
        bgr = px[..., :3].astype(np.float64)
        rgb = np.clip(
            np.rint(bgr[..., ::-1] * a + 255.0 * (1 - a)), 0, 255
        ).astype(np.uint8)
    elif bpp == 2:  # 5-5-5 + attribute
        v = px[..., 0].astype(np.uint16) | (px[..., 1].astype(np.uint16) << 8)
        rgb = np.stack(
            [
                ((v >> 10) & 31) * 255 // 31,
                ((v >> 5) & 31) * 255 // 31,
                (v & 31) * 255 // 31,
            ],
            axis=-1,
        ).astype(np.uint8)
    else:
        raise NotImplementedError(f"TGA depth {depth} for type {img_type}")
    if not desc & 0x20:  # bit 5 clear → bottom-up origin
        rgb = rgb[::-1]
    if desc & 0x10:  # right origin (rare)
        rgb = rgb[:, ::-1]
    return np.ascontiguousarray(rgb)


def encode_tga_rgb8(pixels: np.ndarray, *, rle: bool = False) -> bytes:
    """(h, w, 3) uint8 → 24-bit truecolor TGA (type 2, or RLE type 10),
    bottom-up. Lossless."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_tga_rgb8 expects (h, w, 3) uint8")
    head = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 10 if rle else 2, 0, 0, 0, 0, 0, w, h, 24, 0
    )
    bgr = pixels[::-1, :, ::-1]  # bottom-up BGR
    if not rle:
        return head + np.ascontiguousarray(bgr).tobytes()
    flat = bgr.reshape(h * w, 3)
    out = bytearray()
    # per-row greedy runs (RLE packets must not span rows per spec 2.0)
    for y in range(h):
        row = flat[y * w : (y + 1) * w]
        x = 0
        while x < w:
            n = 1
            while x + n < w and n < 128 and (row[x + n] == row[x]).all():
                n += 1
            if n >= 2:
                out.append(0x80 | (n - 1))
                out += row[x].tobytes()
                x += n
                continue
            j = x + 1
            while j < w and j - x < 128:
                if j + 1 < w and (row[j] == row[j + 1]).all():
                    break
                j += 1
            out.append(j - x - 1)
            out += row[x:j].tobytes()
            x = j
    return head + bytes(out)
