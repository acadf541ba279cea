"""PNG codec conformance: round trips through every encoder mode plus
hand-built spec-literal streams for the decoder-only paths (16-bit,
alpha compositing, tRNS, sub-byte gray, explicit Average/Paeth rows).
No Ray needed — pure kernel tests."""

import struct
import zlib

import numpy as np
import pytest

from raydedup.png import _SIG, _chunk, decode_png_rgb8, encode_png_rgb8


def _make(w, h, depth, ctype, body, extra=b"", interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(body))
        + _chunk(b"IEND", b"")
    )


def _corpus():
    rng = np.random.default_rng(3)
    grad = np.repeat(
        np.repeat((np.arange(16, dtype=np.uint8) * 16)[None, :, None], 3, 2), 9, 0
    ).reshape(9, 16, 3)
    return {
        "noise": rng.integers(0, 256, (37, 23, 3), np.uint8),
        "grad": grad,
        "gray": np.repeat(rng.integers(0, 256, (11, 13, 1), np.uint8), 3, 2),
        "two": np.where(rng.random((8, 8, 1)) < 0.5, np.uint8(0), np.uint8(255))
        * np.ones((1, 1, 3), np.uint8),
        "tiny": rng.integers(0, 256, (1, 1, 3), np.uint8),
    }


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("filters", ["fast", "all", "none"])
def test_round_trip_all_modes(interlace, filters):
    for name, im in _corpus().items():
        data = encode_png_rgb8(im, interlace=interlace, filters=filters)
        assert np.array_equal(decode_png_rgb8(data), im), (name, interlace, filters)


def test_round_trip_unoptimized_and_downcoding_shrinks():
    for name, im in _corpus().items():
        plain = encode_png_rgb8(im, optimize=False)
        assert np.array_equal(decode_png_rgb8(plain), im), name
    # gray and palette downcoding must actually shrink the file ("two"
    # is excluded: at 8×8 the zlib/chunk overhead swamps the saving)
    c = _corpus()
    for name in ("grad", "gray"):
        assert len(encode_png_rgb8(c[name])) < len(
            encode_png_rgb8(c[name], optimize=False)
        ), name


def test_adaptive_filters_actually_fire():
    # smooth content under filters="all" must use a non-zero filter on
    # some row; this pins the encoder's filter-selection path
    ramp = np.repeat(
        np.repeat(np.arange(64, dtype=np.uint8)[None, :, None] * 4, 3, 2), 16, 0
    ).reshape(16, 64, 3)
    ramp += np.arange(16, dtype=np.uint8)[:, None, None]
    rgb = ramp.copy()
    rgb[..., 1] ^= 0x55  # defeat grayscale downcoding
    # defeat palette downcoding too (>256 distinct colors) so the body
    # stays 3-channel RGB and the row parse below holds
    rgb[..., 2] = (np.arange(64, dtype=np.uint8)[None, :] * 2) + (
        np.arange(16, dtype=np.uint8)[:, None] * 5
    )
    data = encode_png_rgb8(rgb, filters="all")
    # parse the single IDAT back out and look at the filter bytes
    pos, idat = 8, b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(16, 1 + 64 * 3)
    assert (raw[:, 0] != 0).any()
    assert np.array_equal(decode_png_rgb8(data), rgb)


def test_decode_16bit_takes_high_byte():
    rng = np.random.default_rng(5)
    px16 = rng.integers(0, 65536, (4, 5, 3)).astype(">u2")
    rows = b"".join(b"\x00" + px16[y].tobytes() for y in range(4))
    out = decode_png_rgb8(_make(5, 4, 16, 2, rows))
    assert np.array_equal(out, (px16 >> 8).astype(np.uint8))


def test_decode_alpha_composites_over_white():
    rgba = np.zeros((1, 2, 4), np.uint8)
    rgba[0, 0] = [200, 100, 50, 255]
    rgba[0, 1] = [200, 100, 50, 128]
    out = decode_png_rgb8(_make(2, 1, 8, 6, b"\x00" + rgba.tobytes()))
    assert np.array_equal(out[0, 0], [200, 100, 50])
    a = 128 / 255
    exp = np.round(np.array([200, 100, 50]) * a + 255 * (1 - a)).astype(np.uint8)
    assert np.array_equal(out[0, 1], exp)
    # gray + alpha
    ga = np.array([[[100, 0], [100, 255]]], np.uint8)
    out = decode_png_rgb8(_make(2, 1, 8, 4, b"\x00" + ga.tobytes()))
    assert np.array_equal(out[0, 0], [255, 255, 255])
    assert np.array_equal(out[0, 1], [100, 100, 100])


def test_decode_palette_trns_and_subbyte_gray():
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 0, 255])) + _chunk(
        b"tRNS", bytes([0])
    )
    out = decode_png_rgb8(_make(2, 1, 8, 3, b"\x00" + bytes([0, 1]), extra=plte))
    assert np.array_equal(out[0, 0], [255, 255, 255])  # transparent → white
    assert np.array_equal(out[0, 1], [0, 0, 255])
    # depth-2 gray scales 0..3 → 0,85,170,255
    bits = np.packbits(np.array([0, 0, 0, 1, 1, 0, 1, 1], np.uint8)).tobytes()
    out = decode_png_rgb8(_make(4, 1, 2, 0, b"\x00" + bits))
    assert [int(out[0, i, 0]) for i in range(4)] == [0, 85, 170, 255]


def test_decode_handbuilt_average_and_paeth_rows():
    img = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]], np.uint8
    )
    r0 = img[0].reshape(-1).astype(int)
    r1 = img[1].reshape(-1).astype(int)
    f0 = [3]
    for i in range(6):
        left = r0[i - 3] if i >= 3 else 0
        f0.append((r0[i] - left // 2) & 255)
    f1 = [4]
    for i in range(6):
        a = r1[i - 3] if i >= 3 else 0
        b, c = r0[i], (r0[i - 3] if i >= 3 else 0)
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        f1.append((r1[i] - pr) & 255)
    out = decode_png_rgb8(_make(2, 2, 8, 2, bytes(f0) + bytes(f1)))
    assert np.array_equal(out, img)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png_rgb8(b"not a png at all")
    with pytest.raises(ValueError):
        decode_png_rgb8(_SIG + _chunk(b"IEND", b""))  # no IHDR
