"""Pure-numpy baseline TIFF 6.0 codec — no PIL/libtiff in env.

Decoder: both byte orders (II/MM), IFD0 tag walk (the same TIFF
structure the EXIF parser in :mod:`raydedup.jpeg` reads), stripped
chunky rasters with Compression 1 (none), 5 (LZW, with the spec's
MSB-first codes and early code-width change), and 32773 (PackBits);
PhotometricInterpretation 0/1 (gray, either polarity), 2 (RGB) and 3
(palette via ColorMap's 16-bit channels); Predictor 2 (horizontal
differencing); SamplesPerPixel 1/3/4 (a 4th unassociated-alpha sample
composites over white, matching the PNG decoder's convention);
BitsPerSample 8 (plus 1-bit bilevel for photometric 0/1). Tiled,
planar, 16-bit-per-sample and JPEG-in-TIFF forms raise
``NotImplementedError``. Output is (h, w, 3) uint8 RGB.

Encoder: chunky RGB-8 strips with Compression none/LZW/PackBits and
optional horizontal-differencing predictor, multiple strips
(RowsPerStrip) so the strip walk is exercised. Lossless round trips
pin the decoder paths; TIFF-LZW's early-change quirk is additionally
pinned by a hand-built stream in the tests.

Written from the public TIFF 6.0 specification (Adobe, 1992);
structure only, no library code. The LZW here is the TIFF variant —
MSB-first bit packing and +1 early code-width bump — distinct from the
GIF variant in :mod:`raydedup.gif` (LSB-first, no early change).
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids
_WIDTH, _LENGTH, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PREDICTOR, _COLORMAP, _PLANAR = 317, 320, 284

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_tag_values(data: bytes, fmt: str, typ: int, cnt: int, raw: bytes) -> list[int]:
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return []
    total = size * cnt
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(fmt + "I", raw)
        buf = data[off : off + total]
    code = {1: "B", 3: "H", 4: "I"}.get(typ)
    if code is None:
        return []
    return list(struct.unpack(fmt + code * cnt, buf))


# ------------------------------------------------------------ LZW (TIFF variant)
def _lzw_decode(s: bytes, expected: int) -> bytes:
    """TIFF LZW: MSB-first codes, Clear=256, EOI=257, first code after
    table build is 258; code width bumps at 511/1023/2047 (early
    change — one code earlier than the GIF variant)."""
    bits = np.unpackbits(np.frombuffer(s, np.uint8))
    out = bytearray()
    pos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    n = len(bits)
    while pos + width <= n and len(out) < expected:
        code = int(bits[pos : pos + width].dot(1 << np.arange(width - 1, -1, -1)))
        pos += width
        if code == 256:
            reset()
            continue
        if code == 257:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        # early change: width grows when the NEXT code would not fit
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode(s: bytes) -> bytes:
    """Greedy TIFF-LZW with a dict table; emits Clear first and on
    table overflow at 4094, EOI last. Early-change code widths."""
    out_bits: list[int] = []

    def emit(code: int, width: int):
        for k in range(width - 1, -1, -1):
            out_bits.append((code >> k) & 1)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(256, width)
    cur = b""
    for byte in s:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) and width < 12:
            width += 1
        if nxt >= 4094:  # spec-recommended reset point
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
        # the decoder bumps width when the next code wouldn't fit —
        # mirror that so EOI is read at the decoder's width
        if nxt + 1 >= (1 << width) and width < 12:
            width += 1
    emit(257, width)
    arr = np.array(out_bits, np.uint8)
    return np.packbits(arr).tobytes()


# ------------------------------------------------------------ PackBits
def _packbits_decode(s: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s) and len(out) < expected:
        n = s[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += s[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([s[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(s: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(s)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and s[j] == s[i]:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i), s[i]])
            i = j
            continue
        # literal: until a run of >=3 starts (2-byte runs aren't worth
        # breaking a literal for) or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and s[j] == s[j + 1] == s[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + s[i:j]
        i = j
    return bytes(out)


# ------------------------------------------------------------ decode
def decode_tiff_rgb8(data: bytes) -> np.ndarray:
    if data[:2] == b"II":
        fmt = "<"
    elif data[:2] == b"MM":
        fmt = ">"
    else:
        raise ValueError("not a TIFF")
    if struct.unpack(fmt + "H", data[2:4])[0] != 42:
        raise ValueError("bad TIFF magic")
    (ifd,) = struct.unpack(fmt + "I", data[4:8])
    (nent,) = struct.unpack(fmt + "H", data[ifd : ifd + 2])
    tags: dict[int, list[int]] = {}
    for i in range(nent):
        e = data[ifd + 2 + 12 * i : ifd + 14 + 12 * i]
        tag, typ, cnt = struct.unpack(fmt + "HHI", e[:8])
        tags[tag] = _read_tag_values(data, fmt, typ, cnt, e[8:12])

    def one(tag, default=None):
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(_WIDTH), one(_LENGTH)
    comp = one(_COMP, 1)
    photo = one(_PHOTO)
    spp = one(_SPP, 1)
    bits = tags.get(_BITS, [1 if photo in (0, 1) and _BITS not in tags else 8])
    pred = one(_PREDICTOR, 1)
    if one(_PLANAR, 1) != 1:
        raise NotImplementedError("planar TIFF not supported")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp} not supported")
    if any(b not in (1, 8) for b in bits) or (bits[0] == 1 and spp != 1):
        raise NotImplementedError(f"BitsPerSample {bits} not supported")

    offs = tags.get(_STRIP_OFF, [])
    cnts = tags.get(_STRIP_CNT, [])
    rps = one(_ROWS_PER_STRIP, h)
    if not offs:
        raise ValueError("TIFF missing strip offsets")
    if not cnts:
        cnts = [len(data) - offs[0]]

    rowbytes = (w * spp * bits[0] + 7) // 8
    raw = bytearray()
    for si, (o, c) in enumerate(zip(offs, cnts)):
        nrows = min(rps, h - si * rps)
        expected = rowbytes * nrows
        chunk = data[o : o + c]
        if comp == 5:
            raw += _lzw_decode(chunk, expected)
        elif comp == 32773:
            raw += _packbits_decode(chunk, expected)
        else:
            raw += chunk[:expected]
    buf = np.frombuffer(bytes(raw), np.uint8, count=rowbytes * h).reshape(h, rowbytes)

    if bits[0] == 1:
        px = np.unpackbits(buf, axis=1)[:, :w].astype(np.uint8) * 255
        if photo == 0:  # WhiteIsZero
            px = 255 - px
        return np.repeat(px[..., None], 3, axis=2)

    px = buf[:, : w * spp].reshape(h, w, spp).astype(np.uint8)
    if pred == 2:
        px = np.cumsum(px, axis=1, dtype=np.uint8)  # undo horizontal differencing
    if photo == 3:
        cmap = tags.get(_COLORMAP)
        if not cmap:
            raise ValueError("palette TIFF missing ColorMap")
        ncol = len(cmap) // 3
        pal = (np.array(cmap, np.uint32).reshape(3, ncol).T >> 8).astype(np.uint8)
        return pal[px[..., 0]]
    if photo in (0, 1):
        g = px[..., 0]
        if photo == 0:
            g = 255 - g
        return np.repeat(g[..., None], 3, axis=2)
    if photo != 2:
        raise NotImplementedError(f"photometric {photo} not supported")
    if spp == 4:  # unassociated alpha → composite over white
        a = px[..., 3:4].astype(np.float64) / 255.0
        rgb = px[..., :3].astype(np.float64)
        return np.clip(np.rint(rgb * a + 255.0 * (1 - a)), 0, 255).astype(np.uint8)
    return np.ascontiguousarray(px[..., :3])


# ------------------------------------------------------------ encode
def encode_tiff_rgb8(
    pixels: np.ndarray,
    *,
    compression: str = "lzw",
    predictor: bool = True,
    rows_per_strip: int = 64,
) -> bytes:
    """(h, w, 3) uint8 → little-endian baseline TIFF, chunky RGB strips."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_tiff_rgb8 expects (h, w, 3) uint8")
    comp = {"none": 1, "lzw": 5, "packbits": 32773}.get(compression)
    if comp is None:
        raise ValueError(f"compression {compression!r}")
    src = pixels
    if predictor:
        d = src.astype(np.int16)
        d[:, 1:] -= src[:, :-1].astype(np.int16)
        src = d.astype(np.uint8)

    strips: list[bytes] = []
    for y0 in range(0, h, rows_per_strip):
        chunk = src[y0 : y0 + rows_per_strip].tobytes()
        if comp == 5:
            strips.append(_lzw_encode(chunk))
        elif comp == 32773:
            strips.append(_packbits_encode(chunk))
        else:
            strips.append(chunk)

    nstrips = len(strips)
    ntags = 10
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * ntags + 4  # after IFD

    # out-of-line arrays: bits-per-sample (3 SHORTs), strip offsets/counts
    bits_off = data_off
    extra = struct.pack("<HHH", 8, 8, 8)
    off_arr_off = bits_off + len(extra)
    need_arrays = nstrips > 1
    if need_arrays:
        cnt_arr_off = off_arr_off + 4 * nstrips
        strips_start = cnt_arr_off + 4 * nstrips
    else:
        strips_start = off_arr_off

    offsets = []
    p = strips_start
    for s in strips:
        offsets.append(p)
        p += len(s)

    def entry(tag, typ, cnt, val_or_off, inline_vals=None):
        raw = (
            struct.pack("<" + {3: "H", 4: "I"}[typ] * cnt, *inline_vals)
            if inline_vals is not None
            else struct.pack("<I", val_or_off)
        )
        return struct.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\x00")

    entries = [
        entry(_WIDTH, 4, 1, 0, [w]),
        entry(_LENGTH, 4, 1, 0, [h]),
        entry(_BITS, 3, 3, bits_off),
        entry(_COMP, 3, 1, 0, [comp]),
        entry(_PHOTO, 3, 1, 0, [2]),
        entry(
            _STRIP_OFF, 4, nstrips, off_arr_off
        ) if need_arrays else entry(_STRIP_OFF, 4, 1, 0, [offsets[0]]),
        entry(_SPP, 3, 1, 0, [3]),
        entry(_ROWS_PER_STRIP, 4, 1, 0, [rows_per_strip]),
        entry(
            _STRIP_CNT, 4, nstrips, cnt_arr_off
        ) if need_arrays else entry(_STRIP_CNT, 4, 1, 0, [len(strips[0])]),
        entry(_PREDICTOR, 3, 1, 0, [2 if predictor else 1]),
    ]
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])  # spec: ascending

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", ntags) + b"".join(entries) + struct.pack("<I", 0)
    out += extra
    if need_arrays:
        out += struct.pack("<" + "I" * nstrips, *offsets)
        out += struct.pack("<" + "I" * nstrips, *(len(s) for s in strips))
    for s in strips:
        out += s
    return bytes(out)
