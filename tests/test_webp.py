"""WebP-lossless (VP8L) codec conformance: lossless round trips across
every encoder path, hand-built streams for the decoder-only transforms
(color transform, meta prefix groups, far distances), and the
decode_image integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from raydedup.webp import (
    _BitWriterLSB,
    _DIST_MAP,
    _emit_entropy_image,
    _emit_main,
    _color_transform_pass,
    _plane_to_distance,
    decode_webp_rgb8,
    encode_webp_rgb8,
)


def _roundtrip(img, **kw):
    data = encode_webp_rgb8(img, **kw)
    out = decode_webp_rgb8(data)
    assert out.shape == img.shape
    assert np.array_equal(out, img)
    return data


def test_webp_palette_paths():
    rng = np.random.default_rng(4)
    # 2 colors -> 8 px/byte bundling
    img = np.zeros((20, 30, 3), np.uint8)
    img[5:15, 10:20] = 255
    _roundtrip(img)
    # 4 colors -> 4 px/byte
    img = np.zeros((16, 16, 3), np.uint8)
    for k in range(4):
        img[k * 4 : (k + 1) * 4] = [k * 60, 255 - k * 60, k * 20]
    _roundtrip(img)
    # 15 colors -> 2 px/byte; odd width exercises partial bundles
    img = np.zeros((9, 41, 3), np.uint8)
    for k in range(15):
        img[:, k * 2 : (k + 1) * 2] = [k * 17, (k * 31) % 256, k]
    _roundtrip(img)
    # 200 colors -> unbundled palette
    vals = rng.integers(0, 256, (200, 3)).astype(np.uint8)
    img = vals[rng.integers(0, 200, (25, 25))]
    _roundtrip(img)


def test_webp_literal_and_predictor_paths():
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (31, 29, 3), dtype=np.uint8)
    _roundtrip(noise)
    _roundtrip(noise, lz77=False, cache_bits=0)
    yy, xx = np.mgrid[0:40, 0:50]
    grad = np.stack([(yy * 2 + xx) % 256, (xx * 3) % 256, (yy + xx * 2) % 256], axis=-1).astype(np.uint8)
    assert len(np.unique(grad.reshape(-1, 3), axis=0)) > 256  # literal path
    with_pred = _roundtrip(grad, use_predictor=True)
    without = _roundtrip(grad, use_predictor=False)
    assert len(with_pred) < len(without)  # the predictor must pay
    _roundtrip(np.array([[[7, 8, 9]]], np.uint8))  # 1x1


def test_webp_color_cache():
    # >256 distinct colors (forces the literal path) with heavy reuse:
    # the cache must both fire and stay bit-consistent
    rng = np.random.default_rng(6)
    vals = rng.integers(0, 256, (300, 3)).astype(np.uint8)
    img = vals[rng.integers(0, 300, (40, 40))]
    with_cache = _roundtrip(img, cache_bits=8, lz77=False)
    without = _roundtrip(img, cache_bits=0, lz77=False)
    assert len(with_cache) < len(without)


def test_webp_distance_map():
    # the first entries of the spec's 2D offset table, and the
    # plus-code region past it
    assert _DIST_MAP[0] == (0, 1)
    assert _DIST_MAP[1] == (1, 0)
    assert _DIST_MAP[2] == (1, 1)
    assert _DIST_MAP[3] == (-1, 1)
    assert len(_DIST_MAP) == 120
    assert _plane_to_distance(121, 50) == 1
    assert _plane_to_distance(1, 50) == 50  # (0, 1) one row up
    assert _plane_to_distance(2, 50) == 1  # (1, 0) previous pixel
    assert _plane_to_distance(4, 50) == 49  # (-1, 1)


def _wrap_riff(bw: _BitWriterLSB) -> bytes:
    payload = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_webp_color_transform_decode():
    """The encoder never emits COLOR_TRANSFORM; build one by hand with
    a nontrivial element and check the decoder inverts it exactly."""
    rng = np.random.default_rng(7)
    h, w = 12, 18
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    px = np.zeros((h, w, 4), np.uint8)
    px[..., 0] = 255
    px[..., 1:] = rgb
    g2r, g2b, r2b = 64, 200, 17  # int8 semantics: 200 is negative
    size_bits = 3  # 8x8 blocks -> 3x2 element subimage (all same element)
    elems = np.zeros((-(-h // 8), -(-w // 8), 3), np.int64)
    elems[..., 0] = g2r
    elems[..., 1] = g2b
    elems[..., 2] = r2b
    fwd = _color_transform_pass(px, elems, size_bits, forward=True)

    bw = _BitWriterLSB()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # a transform follows
    bw.write(1, 2)  # COLOR_TRANSFORM
    bw.write(size_bits - 2, 3)
    sub = np.zeros((elems.shape[0], elems.shape[1], 4), np.uint8)
    sub[..., 0] = 255
    sub[..., 1] = r2b  # red channel holds red_to_blue
    sub[..., 2] = g2b  # green holds green_to_blue
    sub[..., 3] = g2r  # blue holds green_to_red
    _emit_entropy_image(bw, sub, cache_bits=0, lz77=False)
    bw.write(0, 1)  # end of transforms
    _emit_main(bw, fwd, cache_bits=0, lz77=True)
    out = decode_webp_rgb8(_wrap_riff(bw))
    assert np.array_equal(out, rgb)


def test_webp_meta_prefix_groups_decode():
    """Hand-built two-group meta-prefix stream: left half of the image
    coded by group 0, right half by group 1."""
    from raydedup.webp import _GREEN_BASE, _write_prefix_code

    h, w = 4, 16
    meta_bits = 3  # 8-pixel blocks -> meta image 2 x 1
    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    px = np.zeros((h, w, 4), np.uint8)
    px[..., 0] = 255
    px[..., 1:] = rgb

    bw = _BitWriterLSB()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix codes present
    bw.write(meta_bits - 2, 3)
    meta = np.zeros((1, 2, 4), np.uint8)
    meta[0, 1, 2] = 1  # green of block 1 -> group 1
    _emit_entropy_image(bw, meta, cache_bits=0, lz77=False)
    # per-group channel histograms (literals only)
    flat = px.reshape(h, w, 4)
    groups = [flat[:, :8].reshape(-1, 4), flat[:, 8:].reshape(-1, 4)]
    tables = []
    for gpx in groups:
        fg = np.zeros(_GREEN_BASE, np.int64)
        fr = np.zeros(256, np.int64)
        fb = np.zeros(256, np.int64)
        fa = np.zeros(256, np.int64)
        fd = np.zeros(40, np.int64)
        for a, r, g, b in gpx.astype(int):
            fg[g] += 1
            fr[r] += 1
            fb[b] += 1
            fa[a] += 1
        tables.append(
            tuple(_write_prefix_code(bw, f) for f in (fg, fr, fb, fa, fd))
        )
    for y in range(h):
        for x in range(w):
            cg, cr, cb, ca, _ = tables[0 if x < 8 else 1]
            a, r, g, b = (int(v) for v in px[y, x])
            bw.write(int(cg[g, 0]), int(cg[g, 1]))
            bw.write(int(cr[r, 0]), int(cr[r, 1]))
            bw.write(int(cb[b, 0]), int(cb[b, 1]))
            bw.write(int(ca[a, 0]), int(ca[a, 1]))
    out = decode_webp_rgb8(_wrap_riff(bw))
    assert np.array_equal(out, rgb)


def test_webp_bad_inputs():
    with pytest.raises(ValueError):
        decode_webp_rgb8(b"xxxx" + b"\x00" * 30)
    with pytest.raises(NotImplementedError):
        # lossy VP8 chunk: clearly-marked env stub
        decode_webp_rgb8(b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12)
    with pytest.raises(ValueError):
        encode_webp_rgb8(np.zeros((4, 4, 3), np.int32))


def test_decode_image_webp_fmt():
    from raydedup.media import decode_image

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (14, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_webp_rgb8(img), 11, 14, "webp"), img)


def test_webp_stress_random_geometries():
    """Seeded sweep over 60 shape × content-class combinations (noise /
    small-palette / gradient / constant, dims 1..69 including 1-pixel
    edges) — every stream must round-trip bit-exactly."""
    rng = np.random.default_rng(99)
    for trial in range(60):
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        kind = trial % 4
        if kind == 0:
            im = rng.integers(0, 256, (h, w, 3), np.uint8)
        elif kind == 1:
            im = (
                rng.integers(0, int(rng.integers(2, 20)), (h, w, 1)) * 13 % 256
            ).astype(np.uint8) * np.ones((1, 1, 3), np.uint8)
        elif kind == 2:
            im = np.clip(
                np.cumsum(rng.integers(-3, 4, (h, w, 3)), axis=1), 0, 255
            ).astype(np.uint8)
        else:
            im = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
        out = decode_webp_rgb8(encode_webp_rgb8(im))
        assert np.array_equal(out, im), (trial, h, w, kind)
