"""Pure-numpy PNG codec — no PIL/cv2 in env.

Full spec-exact decoder (PNG spec / RFC 2083, ISO 15948): all five
scanline filters (None/Sub/Up/Average/Paeth), color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), bit depths 1/2/4/8/16,
multi-IDAT streams, tRNS transparency, and Adam7 interlacing. Output is
always (h, w, 3) uint8 like every other codec here: 16-bit samples take
the high byte, sub-8-bit gray scales to full range, and alpha
composites over a white background (deterministic — the phash a dedup
pipeline stores must not depend on the viewer's backdrop).

Encoder upgrades over the round-1 filter-0 writer: per-row adaptive
filtering (the spec's minimum-sum-of-absolute-differences heuristic,
computed fully vectorized for all candidate filters at once), automatic
downcoding to grayscale (all channels equal) or palette (≤256 distinct
colors, sub-byte packing at ≤16), and optional Adam7 interlacing — so
the module's own round trips pin the decoder's gray/palette/interlace
paths, not just RGB8/filter-0. By default the encoder chooses among
filters {0, 1, 2}, whose unfiltering is fully vectorizable (Sub is a
mod-256 cumsum per byte lane, Up a row add); Average/Paeth decode
correctly but serially per pixel, so they are only *emitted* under
``filters="all"``.

Like the JPEG/GIF/FLAC/WebP modules this is written from the public
spec, not ported; decoder/encoder self-consistency plus hand-built
spec-literal streams (each filter type, each depth, interlace) are what
the tests verify — no external PNG files exist in this environment.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass layout: (xstart, ystart, xstep, ystep)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)

# samples per pixel for each color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


# ------------------------------------------------------------ filters
def _unfilter(raw: np.ndarray, w: int, h: int, bpp: int, rowbytes: int) -> np.ndarray:
    """Undo per-row filtering. ``raw`` is (h, 1 + rowbytes) uint8 with the
    filter byte leading each row; returns (h, rowbytes) reconstructed."""
    out = np.zeros((h, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.uint8)
    for y in range(h):
        f = int(raw[y, 0])
        row = raw[y, 1:].copy()
        if f == 0:
            rec = row
        elif f == 1:  # Sub — mod-256 cumsum per byte lane
            g = row[: (rowbytes // bpp) * bpp].reshape(-1, bpp)
            np.cumsum(g, axis=0, dtype=np.uint8, out=g)
            rec = row
        elif f == 2:  # Up
            rec = row + prev  # uint8 wraps mod 256, as the spec requires
        elif f == 3:  # Average — serial in the left neighbor
            rec = row
            up = prev.astype(np.uint16)
            for i in range(rowbytes):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(row[i]) + ((left + int(up[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth — serial in the left neighbor
            rec = row
            for i in range(rowbytes):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                rec[i] = (int(row[i]) + pr) & 0xFF
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = rec
        prev = out[y]
    return out


def _filter_rows(img: np.ndarray, bpp: int, filters: str) -> bytes:
    """Forward-filter (h, rowbytes) with the spec's min-sum-of-abs
    heuristic, vectorized across the whole image per candidate filter.
    Forward filtering references the *original* previous row (identical
    to the reconstructed row), so every candidate is computable without
    a serial scan."""
    h, rowbytes = img.shape
    if h == 0:
        return b""
    s = img.astype(np.int16)
    left = np.zeros_like(s)
    left[:, bpp:] = s[:, :-bpp]
    up = np.zeros_like(s)
    up[1:] = s[:-1]
    cand = [img, (s - left).astype(np.uint8), (s - up).astype(np.uint8)]
    if filters == "all":
        upleft = np.zeros_like(s)
        upleft[1:, bpp:] = s[:-1, :-bpp]
        cand.append((s - ((left + up) >> 1)).astype(np.uint8))
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        cand.append((s - pred).astype(np.uint8))
    # signed-magnitude cost, per the spec's heuristic
    costs = np.stack(
        [np.abs(c.astype(np.int8).astype(np.int32)).sum(axis=1) for c in cand]
    )
    pick = np.argmin(costs, axis=0)
    out = np.empty((h, 1 + rowbytes), dtype=np.uint8)
    out[:, 0] = pick
    stacked = np.stack(cand)  # (nf, h, rowbytes)
    out[:, 1:] = stacked[pick, np.arange(h)]
    return out.tobytes()


# ------------------------------------------------------------ decode
def _expand_bits(row: np.ndarray, depth: int, n: int) -> np.ndarray:
    """Unpack one row of packed sub-byte samples to ``n`` ints."""
    bits = np.unpackbits(row)
    vals = bits.reshape(-1, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    return (vals * weights).sum(axis=1)[:n]


def _samples_to_rgb(
    px: np.ndarray, ctype: int, depth: int, plte: np.ndarray | None, trns: bytes | None
) -> np.ndarray:
    """(h, w, channels) int samples → (h, w, 3) uint8, compositing any
    alpha over white."""
    maxv = (1 << depth) - 1
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        rgb = plte[px[..., 0]]
        if trns:
            a = np.ones(256, dtype=np.float32)
            t = np.frombuffer(trns, dtype=np.uint8)
            a[: len(t)] = t.astype(np.float32) / 255.0
            alpha = a[px[..., 0]][..., None]
            rgb = (rgb * alpha + 255.0 * (1 - alpha)).round().astype(np.uint8)
        return rgb
    if depth == 16:
        px = px >> 8
        maxv = 255
    if ctype == 0:
        g = px[..., 0]
        if maxv != 255:
            g = (g * 255 + maxv // 2) // maxv
        return np.repeat(g[..., None], 3, axis=2).astype(np.uint8)
    if ctype == 2:
        return px.astype(np.uint8)
    if ctype == 4:
        g = np.repeat(px[..., :1], 3, axis=2).astype(np.float32)
        a = px[..., 1:2].astype(np.float32) / 255.0
        return (g * a + 255.0 * (1 - a)).round().astype(np.uint8)
    if ctype == 6:
        a = px[..., 3:4].astype(np.float32) / 255.0
        rgb = px[..., :3].astype(np.float32)
        return (rgb * a + 255.0 * (1 - a)).round().astype(np.uint8)
    raise ValueError(f"bad color type {ctype}")


def _decode_subimage(
    raw: bytes, pos: int, w: int, h: int, depth: int, channels: int
) -> tuple[np.ndarray, int]:
    """Unfilter one (sub-)image from the decompressed stream; returns
    (h, w, channels) int samples and the new stream offset."""
    if w == 0 or h == 0:
        return np.zeros((h, w, channels), dtype=np.int64), pos
    bits_per_px = depth * channels
    rowbytes = (w * bits_per_px + 7) // 8
    bpp = max(1, bits_per_px // 8)
    need = h * (1 + rowbytes)
    buf = np.frombuffer(raw, dtype=np.uint8, count=need, offset=pos).reshape(
        h, 1 + rowbytes
    )
    rec = _unfilter(buf, w, h, bpp, rowbytes)
    if depth == 8:
        px = rec.reshape(h, w, channels).astype(np.int64)
    elif depth == 16:
        px = (
            rec.reshape(h, w, channels, 2).astype(np.int64)[..., 0] * 256
            + rec.reshape(h, w, channels, 2).astype(np.int64)[..., 1]
        )
    else:
        px = np.stack([_expand_bits(rec[y], depth, w) for y in range(h)]).reshape(
            h, w, 1
        )
    return px, pos + need


def decode_png_rgb8(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 (alpha composited over white)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = depth = ctype = interlace = None
    plte: np.ndarray | None = None
    trns: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if comp != 0 or filt != 0:
                raise ValueError("bad IHDR compression/filter method")
            if ctype not in _CHANNELS:
                raise ValueError(f"bad color type {ctype}")
            if depth not in (1, 2, 4, 8, 16) or (
                ctype in (2, 4, 6) and depth < 8
            ) or (ctype == 3 and depth == 16):
                raise ValueError(f"bad bit depth {depth} for color type {ctype}")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3).copy()
            plte = np.vstack([plte, np.zeros((256 - len(plte), 3), np.uint8)])
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    channels = _CHANNELS[ctype]
    if not interlace:
        px, _ = _decode_subimage(raw, 0, w, h, depth, channels)
    else:
        px = np.zeros((h, w, channels), dtype=np.int64)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            sub, off = _decode_subimage(raw, off, pw, ph, depth, channels)
            px[y0::dy, x0::dx] = sub
    return _samples_to_rgb(px, ctype, depth, plte, trns)


# ------------------------------------------------------------ encode
def _pack_bits(vals: np.ndarray, depth: int) -> np.ndarray:
    """Pack one row of ints (< 2**depth) into PNG's MSB-first bytes."""
    n = len(vals)
    bits = (
        (vals[:, None] >> np.arange(depth - 1, -1, -1)) & 1
    ).astype(np.uint8).reshape(-1)
    return np.packbits(bits)  # packbits zero-pads the final byte, per spec


def encode_png_rgb8(
    pixels: np.ndarray, *, interlace: bool = False, optimize: bool = True,
    filters: str = "fast",
) -> bytes:
    """(h, w, 3) uint8 → PNG bytes.

    ``optimize=True`` downcodes to grayscale or palette when lossless,
    and picks a per-row filter by the spec's min-sum heuristic
    (``filters="fast"`` considers 0/1/2 whose unfiltering is fully
    vectorized; ``"all"`` adds Average/Paeth, ``"none"`` forces filter
    0). ``interlace=True`` writes Adam7. All modes are lossless."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png_rgb8 expects (h, w, 3) uint8")

    ctype, depth, plte_chunk = 2, 8, b""
    img = pixels
    if optimize and h * w > 0:
        if np.array_equal(pixels[..., 0], pixels[..., 1]) and np.array_equal(
            pixels[..., 0], pixels[..., 2]
        ):
            ctype, img = 0, pixels[..., :1]
        else:
            flat = np.ascontiguousarray(pixels.reshape(-1, 3))
            colors, inv = np.unique(
                flat.view(np.dtype((np.void, 3))).ravel(), return_inverse=True
            )
            if len(colors) <= 256:
                ctype = 3
                pal = colors.view(np.uint8).reshape(-1, 3)
                plte_chunk = _chunk(b"PLTE", pal.tobytes())
                img = inv.reshape(h, w, 1).astype(np.uint8)
                depth = 1 if len(colors) <= 2 else 2 if len(colors) <= 4 else (
                    4 if len(colors) <= 16 else 8
                )

    def sub_rows(sub: np.ndarray) -> bytes:
        sh, sw = sub.shape[:2]
        if sh == 0 or sw == 0:
            return b""
        if depth == 8:
            rows = sub.reshape(sh, -1)
            bpp = sub.shape[2]
        else:
            rows = np.stack(
                [_pack_bits(sub[y, :, 0].astype(np.int64), depth) for y in range(sh)]
            )
            bpp = 1
        if filters == "none" or not optimize:
            out = np.empty((sh, 1 + rows.shape[1]), dtype=np.uint8)
            out[:, 0] = 0
            out[:, 1:] = rows
            return out.tobytes()
        return _filter_rows(np.ascontiguousarray(rows), bpp, filters)

    if not interlace:
        body = sub_rows(img)
    else:
        body = b"".join(
            sub_rows(np.ascontiguousarray(img[y0::dy, x0::dx]))
            for x0, y0, dx, dy in _ADAM7
        )
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1 if interlace else 0)
    idat = zlib.compress(body, 6)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + plte_chunk
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
