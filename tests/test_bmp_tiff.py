"""BMP and baseline-TIFF codec conformance: lossless round trips
through every encoder mode plus hand-built spec-literal streams for
decoder-only paths (1/4/32-bit BMP, top-down, RLE8 escapes; TIFF gray
both polarities, bilevel, palette, RGBA, big-endian) and a hand-packed
TIFF-LZW wire pin (so a matched encoder/decoder bug can't hide).
Pure kernel tests — no Ray."""

import struct

import numpy as np
import pytest

from raydedup.bmp import decode_bmp_rgb8, encode_bmp_rgb8
from raydedup.media import decode_image
from raydedup.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff_rgb8,
    encode_tiff_rgb8,
)


def _corpus():
    rng = np.random.default_rng(21)
    return {
        "noise": rng.integers(0, 256, (70, 45, 3), np.uint8),  # >256 colors, 2 strips
        "grad": np.cumsum(rng.integers(-2, 3, (30, 50, 3)), axis=1).astype(np.uint8),
        "flat": np.full((10, 10, 3), 200, np.uint8),
        "tiny": rng.integers(0, 256, (1, 1, 3), np.uint8),
        "runs": np.repeat(
            rng.integers(0, 4, (6, 8, 1)).astype(np.uint8) * 80, 4, axis=1
        )
        * np.ones((1, 1, 3), np.uint8),
    }


# ------------------------------------------------------------------ BMP
def test_bmp_round_trips():
    for name, im in _corpus().items():
        for rle in (False, True):
            out = decode_bmp_rgb8(encode_bmp_rgb8(im, rle=rle))
            assert np.array_equal(out, im), (name, rle)
    # decode_image dispatch
    im = _corpus()["grad"]
    assert np.array_equal(
        decode_image(encode_bmp_rgb8(im), im.shape[1], im.shape[0], "bmp"), im
    )


def _bmp(w, h, bpp, body, pal=b"", comp=0, clr=0):
    pix_off = 14 + 40 + len(pal)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp, len(body), 0, 0, clr, 0)
    head = struct.pack("<2sIHHI", b"BM", pix_off + len(body), 0, 0, pix_off)
    return head + info + pal + body


def test_bmp_handbuilt_low_bpp_and_topdown():
    # 1-bit, 2 colors, width 10 (stride pads to 4 bytes), bottom-up
    pal = bytes([0, 0, 255, 0]) + bytes([0, 255, 0, 0])  # BGRX: red, green
    rows = []
    for y in range(2):
        bits = np.zeros(32, np.uint8)
        bits[:10] = (np.arange(10) + y) % 2
        rows.append(np.packbits(bits).tobytes())
    out = decode_bmp_rgb8(_bmp(10, 2, 1, b"".join(rows), pal))
    assert out.shape == (2, 10, 3)
    # bottom-up: first body row (bits 0,1,0,...) is the BOTTOM image row
    assert np.array_equal(out[1, 0], [255, 0, 0]) and np.array_equal(out[1, 1], [0, 255, 0])
    assert np.array_equal(out[0, 0], [0, 255, 0]) and np.array_equal(out[0, 1], [255, 0, 0])

    # 4-bit: nibbles, 3 px wide; top-down via negative height
    pal4 = b"".join(bytes([i * 16, i * 8, i * 4, 0]) for i in range(16))
    body = bytes([0x12, 0x30]) + b"\x00\x00"  # px 1,2,3 then pad
    info = struct.pack("<IiiHHIIiiII", 40, 3, -1, 1, 4, 0, len(body), 0, 0, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pal4) + len(body), 0, 0, 14 + 40 + len(pal4))
    out = decode_bmp_rgb8(head + info + pal4 + body)
    assert out.shape == (1, 3, 3)
    assert np.array_equal(out[0, 0], [4, 8, 16])  # palette idx 1 BGRX→RGB
    assert np.array_equal(out[0, 2], [12, 24, 48])

    # 32-bit BGRX: padding byte ignored
    body = bytes([10, 20, 30, 99, 40, 50, 60, 99])
    out = decode_bmp_rgb8(_bmp(2, -1, 32, body))
    assert np.array_equal(out[0, 0], [30, 20, 10])
    assert np.array_equal(out[0, 1], [60, 50, 40])


def test_bmp_rle8_escapes():
    # hand-built RLE8: run, absolute block (odd → padded), delta, EOL, EOD
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
    body = (
        b"\x03\x07"          # 7 7 7
        + b"\x00\x03\x01\x02\x03\x00"  # absolute: 1 2 3 (+pad)
        + b"\x00\x02\x02\x00"  # delta +2 x (stay on row)
        + b"\x01\x09"          # 9
        + b"\x00\x00"          # EOL
        + b"\x02\x05"          # next row: 5 5
        + b"\x00\x01"          # EOD
    )
    out = decode_bmp_rgb8(_bmp(9, -2, 8, body, pal, comp=1, clr=256))
    row0 = out[0, :, 0].tolist()
    assert row0 == [7, 7, 7, 1, 2, 3, 0, 0, 9]
    assert out[1, :2, 0].tolist() == [5, 5] and (out[1, 2:, 0] == 0).all()


def test_bmp_rejects():
    with pytest.raises(ValueError):
        decode_bmp_rgb8(b"XX" + b"\x00" * 60)
    im = _corpus()["tiny"]
    data = bytearray(encode_bmp_rgb8(im))
    data[30] = 3  # BI_BITFIELDS
    with pytest.raises(NotImplementedError):
        decode_bmp_rgb8(bytes(data))


# ------------------------------------------------------------------ TIFF
def test_tiff_round_trips_all_modes():
    for name, im in _corpus().items():
        for comp in ("none", "lzw", "packbits"):
            for pred in (False, True):
                out = decode_tiff_rgb8(
                    encode_tiff_rgb8(im, compression=comp, predictor=pred)
                )
                assert np.array_equal(out, im), (name, comp, pred)
    im = _corpus()["grad"]
    assert np.array_equal(
        decode_image(encode_tiff_rgb8(im), im.shape[1], im.shape[0], "tiff"), im
    )


def test_tiff_lzw_table_reset_and_packbits_kernels():
    rng = np.random.default_rng(5)
    big = (rng.integers(0, 4, 180000).astype(np.uint8) * 60).tobytes()  # forces 4094 reset
    assert _lzw_decode(_lzw_encode(big), len(big)) == big
    for blob in (rng.integers(0, 256, 5000).astype(np.uint8).tobytes(), b"a" * 10000):
        assert _lzw_decode(_lzw_encode(blob), len(blob)) == blob
        assert _packbits_decode(_packbits_encode(blob), len(blob)) == blob


def test_tiff_lzw_wire_pin():
    """Hand-packed stream: [Clear, 0x00, 258, EOI] at 9 bits MSB-first
    = 80 00 20 50 10 — pins the TIFF-LZW wire format absolutely, so a
    matched encoder/decoder deviation cannot hide."""
    expect = bytes([0x80, 0x00, 0x20, 0x50, 0x10])
    assert _lzw_encode(b"\x00\x00\x00") == expect
    assert _lzw_decode(expect, 3) == b"\x00\x00\x00"


def _tiff_ifd(tags, data_blobs, big=False):
    """Assemble a minimal TIFF: tags = [(tag, typ, cnt, inline_vals or
    (b'blob', None))]; out-of-line blobs appended after the IFD."""
    fmt = ">" if big else "<"
    n = len(tags)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    out_entries = b""
    blobs = b""
    for tag, typ, cnt, vals in sorted(tags, key=lambda t: t[0]):
        code = {1: "B", 3: "H", 4: "I"}[typ]
        raw = struct.pack(fmt + code * cnt, *vals)
        if len(raw) <= 4:
            ent = struct.pack(fmt + "HHI", tag, typ, cnt) + raw.ljust(4, b"\x00")
        else:
            ent = struct.pack(fmt + "HHI", tag, typ, cnt) + struct.pack(
                fmt + "I", data_off + len(blobs)
            )
            blobs += raw
        out_entries += ent
    body_off = data_off + len(blobs)
    head = (b"MM" if big else b"II") + struct.pack(fmt + "HI", 42, ifd_off)
    return head + struct.pack(fmt + "H", n) + out_entries + struct.pack(fmt + "I", 0) + blobs + data_blobs, body_off


def test_tiff_handbuilt_gray_palette_rgba_bigendian():
    # 8-bit gray BlackIsZero (photo 1) and WhiteIsZero (photo 0)
    g = np.array([[0, 128, 255]], np.uint8)
    for photo, expect in ((1, [0, 128, 255]), (0, [255, 127, 0])):
        body = g.tobytes()
        data, off = _tiff_ifd(
            [
                (256, 4, 1, [3]),
                (257, 4, 1, [1]),
                (258, 3, 1, [8]),
                (259, 3, 1, [1]),
                (262, 3, 1, [photo]),
                (273, 4, 1, [0]),
                (277, 3, 1, [1]),
                (279, 4, 1, [len(body)]),
            ],
            body,
        )
        data = data.replace(struct.pack("<HHI", 273, 4, 1) + struct.pack("<I", 0),
                            struct.pack("<HHI", 273, 4, 1) + struct.pack("<I", off))
        out = decode_tiff_rgb8(data)
        assert out.shape == (1, 3, 3)
        assert out[0, :, 0].tolist() == expect

    # 1-bit bilevel, photo 0 (white-is-zero): bits 1,0,1 → 0,255,0
    body = np.packbits(np.array([1, 0, 1], np.uint8)).tobytes()
    data, off = _tiff_ifd(
        [
            (256, 4, 1, [3]),
            (257, 4, 1, [1]),
            (259, 3, 1, [1]),
            (262, 3, 1, [0]),
            (273, 4, 1, [0]),
            (279, 4, 1, [len(body)]),
        ],
        body,
    )
    data = data.replace(struct.pack("<HHI", 273, 4, 1) + struct.pack("<I", 0),
                        struct.pack("<HHI", 273, 4, 1) + struct.pack("<I", off))
    out = decode_tiff_rgb8(data)
    assert out[0, :, 0].tolist() == [0, 255, 0]

    # palette: ColorMap is 3×N 16-bit planes (high byte is the value)
    body = bytes([0, 1])
    cmap = [0x1100, 0x2200] + [0x3300, 0x4400] + [0x5500, 0x6600]  # R plane, G, B
    data, off = _tiff_ifd(
        [
            (256, 4, 1, [2]),
            (257, 4, 1, [1]),
            (258, 3, 1, [8]),
            (259, 3, 1, [1]),
            (262, 3, 1, [3]),
            (273, 4, 1, [0]),
            (279, 4, 1, [len(body)]),
            (320, 3, 6, cmap),
        ],
        body,
    )
    data = data.replace(struct.pack("<HHI", 273, 4, 1) + struct.pack("<I", 0),
                        struct.pack("<HHI", 273, 4, 1) + struct.pack("<I", off))
    out = decode_tiff_rgb8(data)
    assert np.array_equal(out[0, 0], [0x11, 0x33, 0x55])
    assert np.array_equal(out[0, 1], [0x22, 0x44, 0x66])

    # RGBA composites over white
    body = bytes([200, 100, 50, 255, 200, 100, 50, 128])
    data, off = _tiff_ifd(
        [
            (256, 4, 1, [2]),
            (257, 4, 1, [1]),
            (258, 3, 4, [8, 8, 8, 8]),
            (259, 3, 1, [1]),
            (262, 3, 1, [2]),
            (273, 4, 1, [0]),
            (277, 3, 1, [4]),
            (279, 4, 1, [len(body)]),
        ],
        body,
    )
    data = data.replace(struct.pack("<HHI", 273, 4, 1) + struct.pack("<I", 0),
                        struct.pack("<HHI", 273, 4, 1) + struct.pack("<I", off))
    out = decode_tiff_rgb8(data)
    assert np.array_equal(out[0, 0], [200, 100, 50])
    a = 128 / 255
    exp = np.round(np.array([200, 100, 50]) * a + 255 * (1 - a)).astype(np.uint8)
    assert np.array_equal(out[0, 1], exp)

    # big-endian (MM) RGB
    body = bytes([1, 2, 3, 4, 5, 6])
    data, off = _tiff_ifd(
        [
            (256, 4, 1, [2]),
            (257, 4, 1, [1]),
            (258, 3, 3, [8, 8, 8]),
            (259, 3, 1, [1]),
            (262, 3, 1, [2]),
            (273, 4, 1, [0]),
            (277, 3, 1, [3]),
            (279, 4, 1, [len(body)]),
        ],
        body,
        big=True,
    )
    data = data.replace(struct.pack(">HHI", 273, 4, 1) + struct.pack(">I", 0),
                        struct.pack(">HHI", 273, 4, 1) + struct.pack(">I", off))
    out = decode_tiff_rgb8(data)
    assert np.array_equal(out[0, 0], [1, 2, 3]) and np.array_equal(out[0, 1], [4, 5, 6])


def test_tiff_rejects():
    with pytest.raises(ValueError):
        decode_tiff_rgb8(b"ZZ\x2a\x00")
    im = _corpus()["tiny"]
    data = bytearray(encode_tiff_rgb8(im, compression="none"))
    # flip Compression (259) value to 7 (JPEG-in-TIFF)
    i = data.find(struct.pack("<HHI", 259, 3, 1))
    data[i + 8] = 7
    with pytest.raises(NotImplementedError):
        decode_tiff_rgb8(bytes(data))


# ------------------------------------------------------------------ ICO
def test_ico_round_trips_and_largest_entry():
    from raydedup.bmp import decode_ico_rgb8, encode_ico_rgb8

    rng = np.random.default_rng(31)
    for shape in ((16, 16, 3), (32, 24, 3), (48, 48, 3)):
        im = rng.integers(0, 256, shape, np.uint8)
        for png in (True, False):
            assert np.array_equal(decode_ico_rgb8(encode_ico_rgb8(im, png=png)), im)
    # decode_image dispatch
    im = rng.integers(0, 256, (16, 16, 3), np.uint8)
    assert np.array_equal(decode_image(encode_ico_rgb8(im), 16, 16, "ico"), im)
    # multi-entry: decoder must pick the largest image
    small = rng.integers(0, 256, (8, 8, 3), np.uint8)
    big = rng.integers(0, 256, (32, 32, 3), np.uint8)
    p_small = encode_ico_rgb8(small)[6 + 16 :]
    p_big = encode_ico_rgb8(big)[6 + 16 :]
    off0 = 6 + 32
    e0 = struct.pack("<BBBBHHII", 8, 8, 0, 0, 1, 32, len(p_small), off0)
    e1 = struct.pack("<BBBBHHII", 32, 32, 0, 0, 1, 32, len(p_big), off0 + len(p_small))
    multi = b"\x00\x00\x01\x00\x02\x00" + e0 + e1 + p_small + p_big
    assert np.array_equal(decode_ico_rgb8(multi), big)


def test_ico_and_mask_punches_transparency():
    """Hand-built 2×1 24-bit DIB icon whose AND mask marks pixel 0
    transparent → white, pixel 1 opaque → its color."""
    from raydedup.bmp import decode_ico_rgb8

    w, h = 2, 1
    xor_stride = ((w * 24 + 31) // 32) * 4
    and_stride = ((w + 31) // 32) * 4
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h * 2, 1, 24, 0, xor_stride * h + and_stride * h,
        0, 0, 0, 0,
    )
    xor_row = bytes([30, 20, 10, 60, 50, 40]) + b"\x00\x00"  # BGR ×2 + pad
    and_row = bytes([0b10000000, 0, 0, 0])  # px0 transparent
    payload = info + xor_row + and_row
    entry = struct.pack("<BBBBHHII", w, h, 0, 0, 1, 24, len(payload), 22)
    ico = b"\x00\x00\x01\x00\x01\x00" + entry + payload
    out = decode_ico_rgb8(ico)
    assert np.array_equal(out[0, 0], [255, 255, 255])
    assert np.array_equal(out[0, 1], [40, 50, 60])


# ------------------------------------------------------------------ TGA
def test_tga_round_trips_and_handbuilt_forms():
    from raydedup.tga import decode_tga_rgb8, encode_tga_rgb8

    rng = np.random.default_rng(41)
    for shape in ((13, 17, 3), (1, 1, 3), (30, 4, 3)):
        for rle in (False, True):
            im = rng.integers(0, 256, shape, np.uint8)
            assert np.array_equal(
                decode_tga_rgb8(encode_tga_rgb8(im, rle=rle)), im
            ), (shape, rle)
    # runs-heavy image: RLE must actually compress
    im = np.repeat(
        rng.integers(0, 4, (8, 5, 1)).astype(np.uint8) * 70, 6, axis=1
    ) * np.ones((1, 1, 3), np.uint8)
    a = encode_tga_rgb8(im, rle=True)
    assert np.array_equal(decode_tga_rgb8(a), im)
    assert len(a) < len(encode_tga_rgb8(im))
    # decode_image dispatch
    im = rng.integers(0, 256, (6, 9, 3), np.uint8)
    assert np.array_equal(decode_image(encode_tga_rgb8(im), 9, 6, "tga"), im)
    # 16-bit 5-5-5, top-origin
    v = (31 << 10) | 15
    head = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 1, 1, 16, 0x20)
    out = decode_tga_rgb8(head + struct.pack("<H", v))
    assert out[0, 0].tolist() == [255, 0, 15 * 255 // 31]
    # 8-bit palette bottom-up
    pal = bytes([0, 0, 255, 0, 255, 0])  # BGR entries: red, green
    head = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 2, 24, 0, 0, 1, 2, 8, 0)
    out = decode_tga_rgb8(head + pal + bytes([0, 1]))
    assert np.array_equal(out[1, 0], [255, 0, 0])
    assert np.array_equal(out[0, 0], [0, 255, 0])
    # 32-bit BGRA composites over white
    head = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 1, 1, 32, 0x20)
    out = decode_tga_rgb8(head + bytes([50, 100, 200, 128]))
    a = 128 / 255
    exp = np.round(np.array([200, 100, 50]) * a + 255 * (1 - a)).astype(np.uint8)
    assert np.array_equal(out[0, 0], exp)
    # grayscale
    head = struct.pack("<BBBHHBHHHHBB", 0, 0, 3, 0, 0, 0, 0, 0, 2, 1, 8, 0x20)
    out = decode_tga_rgb8(head + bytes([7, 200]))
    assert np.array_equal(out[0, 0], [7, 7, 7])
    assert np.array_equal(out[0, 1], [200, 200, 200])
    with pytest.raises(ValueError):
        decode_tga_rgb8(b"\x00" * 10)
