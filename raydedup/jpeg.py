"""Pure-numpy JPEG (JFIF) codec — no PIL/cv2/libjpeg in env.

Closes the last multimodal env-stub: a 100-TB image corpus is mostly
JPEG, and the per-row decode invariant (PSNR >= 40 dB for lossy
formats) needs a real lossy codec to mean anything. Like
:mod:`raydedup.png`, this is a from-scratch implementation of the
public wire format (ITU-T T.81 DCT modes), not a port of any library:

- encoder: RGB -> BT.601 YCbCr, optional 4:2:0 mean-pool subsampling,
  8x8 forward DCT as one ``einsum`` over all blocks, Annex-K
  quantization scaled by the IJG quality formula, zigzag, DC
  prediction, and canonical Huffman entropy coding with a vectorized
  bit packer (no per-bit Python loop). ``progressive=True`` emits an
  SOF2 stream instead (Annex G.1 spectral-selection +
  successive-approximation procedures, libjpeg's public default
  10-scan script, per-scan optimal Huffman tables per Annex K.2).
- decoder: marker parser (DQT/DHT/SOF0/SOF1/SOF2/SOS, restart markers
  in the entropy stream), Huffman decode via a 16-bit peek table (one
  dict hit per *symbol*, not per bit), the Annex G.2 progressive scan
  procedures (DC/AC first + refinement, EOB runs, correction bits),
  then vectorized dequantize + inverse zigzag + IDCT over all blocks
  and ``np.repeat`` chroma upsampling.

Supported: SOF0/SOF1 baseline sequential and SOF2 progressive, 8-bit,
1 or 3 components, sampling factors 1x1 (4:4:4) or 2x2-luma (4:2:0).
Arithmetic coding, hierarchical mode and 12-bit inputs raise
``NotImplementedError`` — the same clearly-marked env-gate contract
as the PNG codec (SURVEY.md §7.5). Both encode modes quantize
identically, so baseline and progressive streams decode to identical
pixels (asserted in tests/test_media.py); round-trip PSNR ~= 46 dB at
quality 90, 4:4:4 on the synth corpus.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- tables
# ITU-T T.81 Annex K.1 example quantization tables (public spec).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """Flat (64,) index into a row-major 8x8 block, in zigzag order,
    built from the rule (anti-diagonals, alternating direction) rather
    than a copied literal."""
    order = []
    for d in range(15):
        rng = range(d, -1, -1) if d % 2 == 0 else range(d + 1)
        for i in rng:
            j = d - i
            if i < 8 and j < 8:
                order.append(i * 8 + j)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()  # block.flat[ZIGZAG] -> zigzag vector
UNZIGZAG = np.argsort(ZIGZAG)  # zz[UNZIGZAG] -> row-major block

# DCT-II orthonormal basis: dct = C @ block @ C.T
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.where(
    _k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) DCT coefficients, all blocks at once."""
    return np.einsum("ij,njk,lk->nil", _C, blocks, _C, optimize=True)


def _idct(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _C, coefs, _C, optimize=True)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg's public formula)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# ------------------------------------------------------ canonical Huffman
def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _PeekTable:
    """16-bit-peek Huffman decoder table: one lookup per symbol. Codes
    are <= 16 bits, so every 16-bit window whose prefix is a given code
    maps to (symbol, code length)."""

    __slots__ = ("sym", "ln")

    def __init__(self, bits: list[int], vals: list[int]):
        self.sym = np.zeros(1 << 16, dtype=np.int16)
        self.ln = np.zeros(1 << 16, dtype=np.uint8)
        for symbol, (code, length) in _build_codes(bits, vals).items():
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            self.sym[lo:hi] = symbol
            self.ln[lo:hi] = length


def _magnitude_category(v: np.ndarray) -> np.ndarray:
    """JPEG 'size' of each value: number of bits in |v| (0 for 0)."""
    out = np.zeros(v.shape, dtype=np.int32)
    a = np.abs(v)
    nz = a > 0
    out[nz] = np.floor(np.log2(a[nz])).astype(np.int32) + 1
    return out


class _BitWriter:
    """Vectorized MSB-first bit packer: tokens are (value, nbits)
    pairs; bytes come out in one unpackbits/packbits pass."""

    def __init__(self):
        self.vals: list[np.ndarray] = []
        self.lens: list[np.ndarray] = []

    def write(self, vals: np.ndarray, lens: np.ndarray) -> None:
        keep = lens > 0
        self.vals.append(np.asarray(vals, dtype=np.int64)[keep])
        self.lens.append(np.asarray(lens, dtype=np.int64)[keep])

    def tobytes(self) -> bytes:
        if not self.vals:
            return b""
        vals = np.concatenate(self.vals)
        lens = np.concatenate(self.lens)
        total = int(lens.sum())
        # each token expands to its bits MSB-first: bit b of token t is
        # (vals[t] >> (lens[t]-1-b)) & 1 for b in [0, lens[t])
        tok = np.repeat(np.arange(len(vals)), lens)
        ends = np.cumsum(lens)
        pos_in_tok = np.arange(total) - (ends - lens)[tok]
        shifts = (lens[tok] - 1 - pos_in_tok).astype(np.int64)
        bits = ((vals[tok] >> shifts) & 1).astype(np.uint8)
        pad = (-total) % 8
        if pad:
            bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])  # 1-fill per spec
        raw = np.packbits(bits)
        # byte stuffing: 0xFF -> 0xFF 0x00
        ff = np.flatnonzero(raw == 0xFF)
        if len(ff) == 0:
            return raw.tobytes()
        out = np.zeros(len(raw) + len(ff), dtype=np.uint8)
        # each byte shifts right by the number of 0xFFs strictly before
        # it; the stuffed 0x00 lands in the zero-initialized gap
        idx = np.arange(len(raw)) + np.searchsorted(ff, np.arange(len(raw)))
        out[idx] = raw
        return out.tobytes()


def _encode_block(zz, dc_diff, dc_codes, ac_codes, writer) -> None:
    toks_v: list[int] = []
    toks_l: list[int] = []
    # DC
    size = int(_magnitude_category(np.array([dc_diff]))[0])
    code, ln = dc_codes[size]
    toks_v.append(code)
    toks_l.append(ln)
    if size:
        mag = dc_diff if dc_diff >= 0 else dc_diff + (1 << size) - 1
        toks_v.append(mag)
        toks_l.append(size)
    # AC: run-length of zeros + (run, size) symbols
    ac = zz[1:]
    nz = np.flatnonzero(ac)
    prev = -1
    for i in nz:
        run = i - prev - 1
        prev = i
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            toks_v.append(code)
            toks_l.append(ln)
            run -= 16
        v = int(ac[i])
        size = int(_magnitude_category(np.array([v]))[0])
        code, ln = ac_codes[(run << 4) | size]
        toks_v.append(code)
        toks_l.append(ln)
        mag = v if v >= 0 else v + (1 << size) - 1
        toks_v.append(mag)
        toks_l.append(size)
    if prev != 62:  # EOB
        code, ln = ac_codes[0x00]
        toks_v.append(code)
        toks_l.append(ln)
    writer.write(np.array(toks_v, dtype=np.int64), np.array(toks_l, dtype=np.int64))


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (H//8 * W//8, 8, 8), row-major block order. H, W must
    already be padded to multiples of 8."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """BT.601 full-range (JFIF) RGB -> YCbCr, float64 in [0,255]."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _exif_app1(orientation: int) -> bytes:
    """Minimal Exif APP1 segment: little-endian TIFF header + IFD0 with
    the single Orientation tag (0x0112, SHORT). Exif 2.x layout."""
    if not 1 <= orientation <= 8:
        raise ValueError(f"bad EXIF orientation {orientation}")
    tiff = (
        b"II"
        + struct.pack("<H", 42)
        + struct.pack("<I", 8)  # IFD0 right after the 8-byte header
        + struct.pack("<H", 1)  # one entry
        + struct.pack("<HHI", 0x0112, 3, 1)
        + struct.pack("<HH", orientation, 0)  # SHORT left-justified in the value field
        + struct.pack("<I", 0)  # no next IFD
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload


def exif_orientation(data: bytes) -> int:
    """Return the EXIF Orientation (1-8) from a JPEG's APP1 segment, or
    1 (upright) when absent or malformed. Walks markers up to SOS only
    — APPn segments precede entropy data per JFIF/Exif."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return 1
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return 1
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # entropy data / end: no APP1 coming
            return 1
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker != 0xE1 or not seg.startswith(b"Exif\x00\x00"):
            continue
        tiff = seg[6:]
        try:
            if tiff[:2] == b"II":
                fmt = "<"
            elif tiff[:2] == b"MM":
                fmt = ">"
            else:
                return 1
            if struct.unpack(fmt + "H", tiff[2:4])[0] != 42:
                return 1
            (ifd,) = struct.unpack(fmt + "I", tiff[4:8])
            (n,) = struct.unpack(fmt + "H", tiff[ifd : ifd + 2])
            for i in range(n):
                e = tiff[ifd + 2 + 12 * i : ifd + 14 + 12 * i]
                tag, typ, cnt = struct.unpack(fmt + "HHI", e[:8])
                if tag == 0x0112 and typ == 3 and cnt == 1:
                    (val,) = struct.unpack(fmt + "H", e[8:10])
                    return val if 1 <= val <= 8 else 1
        except (struct.error, IndexError):
            return 1
        return 1
    return 1


def encode_jpeg_rgb8(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    progressive: bool = False,
    orientation: int | None = None,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 -> JFIF bytes.

    ``orientation`` (1-8) writes a minimal Exif APP1 Orientation tag —
    the stored raster is ``pixels`` as given; a consumer that honors
    EXIF (``raydedup.media.decode_image`` does) re-orients on decode.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs (baseline only) — the resync points real camera JPEGs carry,
    which also let a decoder parallelize across intervals.

    subsample: "444" (1x1 all components) or "420" (2x2 luma; chroma
    mean-pooled to half resolution each axis).

    progressive=True emits an SOF2 stream (libjpeg-style 10-scan
    script: DC first + refinement, per-component spectral AC bands
    with EOB runs, two successive-approximation AC refinement levels
    for luma) with per-scan optimal Huffman tables built by the T.81
    Annex K.2 procedure — the Annex K example tables lack the EOBn
    symbols progressive scans need. Both modes quantize identically,
    so the two streams decode to identical pixels."""
    gray = pixels.ndim == 2 or (pixels.ndim == 3 and pixels.shape[2] == 1)
    if pixels.dtype != np.uint8 or (
        not gray and (pixels.ndim != 3 or pixels.shape[2] != 3)
    ):
        raise ValueError("encode_jpeg_rgb8 expects (h, w, 3) or (h, w[, 1]) uint8")
    if subsample not in ("444", "420"):
        raise NotImplementedError(f"subsample {subsample!r}: only 444/420")
    h, w = pixels.shape[:2]
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if gray:
        # single-component stream: the luma plane IS the sample data
        # (no color transform), baseline only — the progressive scan
        # script is the 3-component libjpeg layout
        if progressive:
            raise NotImplementedError("progressive grayscale not supported")
        samp = [(1, 1)]
        planes = [pixels.reshape(h, w).astype(np.float64)]
    elif subsample == "444":
        ycc = rgb_to_ycbcr(pixels)
        samp = [(1, 1), (1, 1), (1, 1)]
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        ycc = rgb_to_ycbcr(pixels)
        samp = [(2, 2), (1, 1), (1, 1)]
        yp = ycc[..., 0]
        # mean-pool chroma over 2x2 (pad odd dims first)
        cb = _pad_to(ycc[..., 1], 2)
        cr = _pad_to(ycc[..., 2], 2)
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [yp, cb, cr]

    # per-component quantized zigzag blocks
    comp_zz: list[np.ndarray] = []
    comp_bw: list[tuple[int, int]] = []  # blocks-per-row/col for MCU walk
    for ci, plane in enumerate(planes):
        q = qy if ci == 0 else qc
        padded = _pad_to(plane, 8)
        blocks = _to_blocks(padded - 128.0)
        coefs = _fdct(blocks)
        zz = np.round(coefs.reshape(-1, 64)[:, ZIGZAG] / q.reshape(-1)[ZIGZAG]).astype(np.int32)
        comp_zz.append(zz)
        comp_bw.append((padded.shape[1] // 8, padded.shape[0] // 8))

    if progressive:
        if restart_interval:
            raise NotImplementedError("restart markers: baseline encoder only")
        stream = _assemble_progressive(comp_zz, comp_bw, samp, qy, qc, h, w)
        if orientation is not None:
            # both assemblers start SOI (2) + APP0 (18); APP1 goes next
            stream = stream[:20] + _exif_app1(orientation) + stream[20:]
        return stream

    dc_y = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    ncomp = len(planes)
    writer = _BitWriter()
    entropy_parts: list[bytes] = []

    def maybe_restart(m: int, preds: list[int]) -> None:
        # close the current interval: byte-align (tobytes 1-pads),
        # emit the cycling RSTn marker, reset DC predictions
        nonlocal writer
        if restart_interval and m and m % restart_interval == 0:
            entropy_parts.append(writer.tobytes())
            entropy_parts.append(
                bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            )
            writer = _BitWriter()
            for i in range(len(preds)):
                preds[i] = 0

    if ncomp == 1 or subsample == "444":
        # interleaved MCU = one block per component; all planes share
        # block geometry, so walk block index order with per-component
        # DC prediction (a 1-component scan is the same walk)
        n = comp_zz[0].shape[0]
        preds = [0] * ncomp
        for b in range(n):
            maybe_restart(b, preds)
            for ci in range(ncomp):
                zz = comp_zz[ci][b]
                dc_codes = dc_y if ci == 0 else dc_c
                ac_codes = ac_y if ci == 0 else ac_c
                _encode_block(zz, int(zz[0]) - preds[ci], dc_codes, ac_codes, writer)
                preds[ci] = int(zz[0])
    else:
        # MCU = 4 luma blocks (2x2) + 1 cb + 1 cr
        ybw, ybh = comp_bw[0]
        # pad luma block grid to even so MCUs tile fully
        mcu_w = (ybw + 1) // 2
        mcu_h = (ybh + 1) // 2
        preds = [0, 0, 0]
        for my in range(mcu_h):
            for mx in range(mcu_w):
                maybe_restart(my * mcu_w + mx, preds)
                for dy in range(2):
                    for dx in range(2):
                        by = min(my * 2 + dy, ybh - 1)
                        bx = min(mx * 2 + dx, ybw - 1)
                        zz = comp_zz[0][by * ybw + bx]
                        _encode_block(zz, int(zz[0]) - preds[0], dc_y, ac_y, writer)
                        preds[0] = int(zz[0])
                for ci in (1, 2):
                    cbw, cbh = comp_bw[ci]
                    by = min(my, cbh - 1)
                    bx = min(mx, cbw - 1)
                    zz = comp_zz[ci][by * cbw + bx]
                    _encode_block(zz, int(zz[0]) - preds[ci], dc_c, ac_c, writer)
                    preds[ci] = int(zz[0])
    entropy = b"".join(entropy_parts) + writer.tobytes()

    # ------------------------------------------------------------ markers
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    qtabs = ((0, qy), (1, qc)) if ncomp == 3 else ((0, qy),)
    for tid, q in qtabs:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8))
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = (samp[ci][0] << 4) | samp[ci][1]
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    htabs = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if ncomp == 3:
        htabs += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in htabs:
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    if orientation is not None:
        return bytes(out[:20]) + _exif_app1(orientation) + bytes(out[20:])
    return bytes(out)


# ------------------------------------------------------------------ decode
class _BitReader:
    """MSB-first reader over the destuffed entropy segment, with a
    16-bit peek for table-driven Huffman."""

    __slots__ = ("bits", "pos", "n")

    def __init__(self, data: np.ndarray):
        self.bits = np.unpackbits(data)
        # pad the tail so 16-bit peeks never run off the end
        self.bits = np.concatenate([self.bits, np.ones(16, dtype=np.uint8)])
        self.pos = 0
        self.n = len(self.bits)

    def peek16(self) -> int:
        b = self.bits[self.pos : self.pos + 16]
        return int(b.dot(1 << np.arange(15, -1, -1)))

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        b = self.bits[self.pos : self.pos + n]
        self.pos += n
        return int(b.dot(1 << np.arange(n - 1, -1, -1)))


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a magnitude-coded value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _entropy_segment(buf: np.ndarray, start: int) -> tuple[np.ndarray, int]:
    """Extract one scan's entropy-coded bytes starting at ``start``:
    destuffs 0xFF00, strips in-stream RSTn markers, and returns the
    position of the terminating marker's 0xFF."""
    seg = buf[start:]
    ff = seg == 0xFF
    nxt = np.zeros_like(ff)
    nxt[:-1] = seg[1:] != 0x00
    end_candidates = np.flatnonzero(ff & nxt)
    end = len(seg)
    for e in end_candidates:
        m = int(seg[e + 1]) if e + 1 < len(seg) else 0xD9
        if 0xD0 <= m <= 0xD7:
            continue  # restart marker, stays inside the stream
        end = e
        break
    raw = seg[:end]
    # destuff: drop 0x00 after 0xFF, drop RSTn pairs
    keep = np.ones(len(raw), dtype=bool)
    ffpos = np.flatnonzero(raw == 0xFF)
    for f in ffpos:
        if f + 1 < len(raw):
            m = int(raw[f + 1])
            if m == 0x00:
                keep[f + 1] = False
            elif 0xD0 <= m <= 0xD7:
                keep[f] = False
                keep[f + 1] = False
    return raw[keep], start + end


def _decode_scan_sequential(reader, scan, htables, planes, mcus_x, mcus_y, restart_interval):
    """Baseline sequential scan: DC diff + full AC per block, MCU
    interleaved (the original decode path, unchanged semantics)."""
    scan_comps = scan["comps"]
    preds = [0] * len(scan_comps)
    n_mcu = mcus_x * mcus_y
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            # restart: byte-align and reset DC predictions (markers were
            # already stripped from the stream)
            reader.pos = (reader.pos + 7) & ~7
            preds = [0] * len(scan_comps)
        my, mx = divmod(mi, mcus_x)
        for ci, c in enumerate(scan_comps):
            dc_tbl = htables[0x00 | c["td"]]
            ac_tbl = htables[0x10 | c["ta"]]
            bw = mcus_x * c["h"]
            for dy in range(c["v"]):
                for dx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    # DC
                    p16 = reader.peek16()
                    size = int(dc_tbl.sym[p16])
                    reader.pos += int(dc_tbl.ln[p16])
                    if size:
                        preds[ci] += _extend(reader.read(size), size)
                    zz[0] = preds[ci]
                    # AC
                    k = 1
                    while k < 64:
                        p16 = reader.peek16()
                        rs = int(ac_tbl.sym[p16])
                        reader.pos += int(ac_tbl.ln[p16])
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        size = rs & 0xF
                        if k > 63:
                            break
                        zz[k] = _extend(reader.read(size), size)
                        k += 1
                    by = my * c["v"] + dy
                    bx = mx * c["h"] + dx
                    planes[c["pi"]][by * bw + bx] = zz


def _scan_units(scan, mcus_x, mcus_y, w, h, hmax, vmax):
    """Block walk of one scan: yields (comp, plane_index) in coded
    order. Interleaved scans walk MCUs; a single-component scan walks
    the component's own block raster (T.81 A.2.2 non-interleaved
    dimensions), indexed into the MCU-padded plane."""
    scan_comps = scan["comps"]
    if len(scan_comps) > 1:
        for mi in range(mcus_x * mcus_y):
            my, mx = divmod(mi, mcus_x)
            for c in scan_comps:
                bw = mcus_x * c["h"]
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        yield c, (my * c["v"] + dy) * bw + (mx * c["h"] + dx)
    else:
        c = scan_comps[0]
        cw = -(-(w * c["h"]) // hmax)  # component samples (ceil)
        ch = -(-(h * c["v"]) // vmax)
        bw_scan = -(-cw // 8)
        bh_scan = -(-ch // 8)
        bw = mcus_x * c["h"]  # padded plane stride
        for by in range(bh_scan):
            for bx in range(bw_scan):
                yield c, by * bw + bx


def _decode_scan_progressive(reader, scan, htables, planes, mcus_x, mcus_y, w, h, hmax, vmax, restart_interval):
    """One progressive (SOF2) scan — T.81 G.2 decoding procedures:
    DC first / DC refinement / AC first (with EOB runs) / AC
    refinement (correction bits). Accumulates into the zigzag-order
    coefficient planes shared with the sequential path."""
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    scan_comps = scan["comps"]
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive scan mixes DC and AC bands")
    if not is_dc and len(scan_comps) != 1:
        raise ValueError("progressive AC scans must be non-interleaved")

    preds = {c["pi"]: 0 for c in scan_comps}
    eobrun = 0
    units = list(_scan_units(scan, mcus_x, mcus_y, w, h, hmax, vmax))
    # restart interval counts MCUs (interleaved) or blocks (single comp)
    if len(scan_comps) > 1:
        units_per_int = restart_interval * sum(c["h"] * c["v"] for c in scan_comps)
    else:
        units_per_int = restart_interval
    done = 0
    for c, bi in units:
        if units_per_int and done and done % units_per_int == 0:
            reader.pos = (reader.pos + 7) & ~7
            preds = {cc["pi"]: 0 for cc in scan_comps}
            eobrun = 0
        done += 1
        zz = planes[c["pi"]][bi]
        if is_dc:
            if ah == 0:  # DC first: diff-coded (dc >> al)
                dc_tbl = htables[0x00 | c["td"]]
                p16 = reader.peek16()
                size = int(dc_tbl.sym[p16])
                reader.pos += int(dc_tbl.ln[p16])
                if size:
                    preds[c["pi"]] += _extend(reader.read(size), size)
                zz[0] = preds[c["pi"]] << al
            else:  # DC refinement: one raw bit per block
                if reader.read(1):
                    zz[0] = int(zz[0]) | (1 << al)
            continue
        ac_tbl = htables[0x10 | c["ta"]]
        p1 = 1 << al
        if ah == 0:  # AC first (G.1.2.2): band values at precision al
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                p16 = reader.peek16()
                rs = int(ac_tbl.sym[p16])
                reader.pos += int(ac_tbl.ln[p16])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:  # EOBn: run of (1<<r)+bits all-zero bands
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    break
                zz[k] = _extend(reader.read(s), s) << al
                k += 1
        else:  # AC refinement (G.1.2.3): ±1 placements + correction bits
            m1 = -p1
            k = ss
            if eobrun == 0:
                while k <= se:
                    p16 = reader.peek16()
                    rs = int(ac_tbl.sym[p16])
                    reader.pos += int(ac_tbl.ln[p16])
                    r, s = rs >> 4, rs & 0xF
                    newval = 0
                    if s == 0:
                        if r != 15:  # EOBn: rest of band is correction-only
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read(r)
                            break
                    else:  # s == 1: a newly nonzero ±(1<<al)
                        newval = p1 if reader.read(1) else m1
                    # advance r zero-history positions (16 for ZRL),
                    # appending correction bits at nonzero-history ones
                    while k <= se:
                        cur = int(zz[k])
                        if cur != 0:
                            if reader.read(1) and (cur & p1) == 0:
                                zz[k] = cur + (p1 if cur > 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        zz[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:  # EOB span still carries correction bits
                    cur = int(zz[k])
                    if cur != 0:
                        if reader.read(1) and (cur & p1) == 0:
                            zz[k] = cur + (p1 if cur > 0 else m1)
                    k += 1
                eobrun -= 1


def decode_jpeg_rgb8(data: bytes) -> np.ndarray:
    """JFIF bytes -> (h, w, 3) uint8 RGB (or (h, w, 1) for
    single-component streams). Baseline sequential (SOF0) and
    progressive (SOF2, spectral selection + successive approximation,
    EOB runs, DC/AC refinement) are both supported; arithmetic coding,
    hierarchical and 12-bit modes raise ``NotImplementedError``."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, _PeekTable] = {}
    comps: list[dict] = []
    h = w = None
    restart_interval = 0
    progressive = False
    scans: list[dict] = []

    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = int(buf[pos + 1])
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", buf[pos : pos + 2].tobytes())
        seg = buf[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = seg[p + 1 : p + 65].astype(np.int32)
                tbl = np.empty(64, dtype=np.int32)
                tbl[ZIGZAG] = zz
                qtables[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tcth = int(seg[p])
                bits = [int(x) for x in seg[p + 1 : p + 17]]
                nv = sum(bits)
                vals = [int(x) for x in seg[p + 17 : p + 17 + nv]]
                htables[tcth] = _PeekTable(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5].tobytes())
            nc = int(seg[5])
            comps = []
            for ci in range(nc):
                cid, hv, tq = int(seg[6 + ci * 3]), int(seg[7 + ci * 3]), int(seg[8 + ci * 3])
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq, "pi": ci})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only sequential (SOF0/1) and progressive (SOF2) DCT supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2].tobytes())
        elif marker == 0xDA:  # SOS
            ns = int(seg[0])
            scan_comps = []
            for si in range(ns):
                cs, tdta = int(seg[1 + si * 2]), int(seg[2 + si * 2])
                comp = next(c for c in comps if c["id"] == cs)
                scan_comps.append({**comp, "td": tdta >> 4, "ta": tdta & 0xF})
            ss, se, ahal = int(seg[1 + ns * 2]), int(seg[2 + ns * 2]), int(seg[3 + ns * 2])
            entropy, pos = _entropy_segment(buf, pos + seglen)
            scans.append(
                {
                    "comps": scan_comps,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0xF,
                    "entropy": entropy,
                    "htables": dict(htables),  # tables as of this scan
                    "dri": restart_interval,
                }
            )
            continue
        pos += seglen

    if not scans or h is None:
        raise ValueError("truncated JPEG: no scan found")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors > 2 not supported")
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component coefficient planes (zigzag order, MCU-padded)
    planes = [
        np.zeros((mcus_y * c["v"] * mcus_x * c["h"], 64), dtype=np.int32) for c in comps
    ]
    if progressive:
        for scan in scans:
            reader = _BitReader(scan["entropy"])
            _decode_scan_progressive(
                reader, scan, scan["htables"], planes, mcus_x, mcus_y, w, h, hmax, vmax, scan["dri"]
            )
        out_comps = comps
    else:
        scan = scans[0]
        reader = _BitReader(scan["entropy"])
        _decode_scan_sequential(
            reader, scan, scan["htables"], planes, mcus_x, mcus_y, scan["dri"]
        )
        out_comps = scan["comps"]

    # dequantize + IDCT per component, then upsample and stack
    out_planes = []
    for c in out_comps:
        q = qtables[c["tq"]]
        pl = planes[c["pi"]]
        coefs = np.zeros((len(pl), 64), dtype=np.float64)
        coefs[:, ZIGZAG] = pl * q[ZIGZAG]
        blocks = _idct(coefs.reshape(-1, 8, 8)) + 128.0
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        plane = (
            blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU-padded resolution
        ry = vmax // c["v"]
        rx = hmax // c["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        out_planes.append(plane[:h, :w])
    ycc = np.stack(out_planes, axis=-1)
    if ycc.shape[-1] == 1:
        return np.clip(ycc, 0, 255).astype(np.uint8)
    return ycbcr_to_rgb(ycc)


# ------------------------------------------------------ progressive encode
# T.81 Annex G.1 encoding procedures (spectral selection + successive
# approximation) with per-scan optimal Huffman tables per Annex K.2.
# The decoder above (G.2) is the round-trip counterpart; libjpeg's
# public default scan script is used so real-world SOF2 layouts are
# exercised. No library code involved: everything below is written
# from the spec figures (K.1-K.4, G.4-G.7).


def _opt_table(counts: np.ndarray) -> tuple[list[int], list[int]]:
    """Symbol frequencies -> (BITS[1..16], HUFFVAL) via T.81 Annex K.2:
    pairwise least-frequency merges tracking code sizes (Figure K.1),
    length limiting to 16 bits (Figure K.3), and HUFFVAL ordered by
    code size then value (Figure K.4). Index 256 is the reserved
    symbol that keeps the all-ones code unused; ties pick the largest
    index so the reserved symbol sinks to the longest code."""
    freq = np.zeros(257, dtype=np.int64)
    freq[: len(counts)] = counts
    freq[256] = 1
    codesize = np.zeros(257, dtype=np.int64)
    others = np.full(257, -1, dtype=np.int64)
    while True:
        nzi = np.flatnonzero(freq > 0)
        if len(nzi) < 2:
            break
        # sort by (frequency asc, index desc): order[0]/order[1] are
        # the two least-frequent trees
        order = nzi[np.lexsort((-nzi, freq[nzi]))]
        v1, v2 = int(order[0]), int(order[1])
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = int(others[v1])
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = int(others[v2])
            codesize[v2] += 1
    bits = np.zeros(64, dtype=np.int64)
    for v in range(257):
        if codesize[v]:
            bits[codesize[v]] += 1
    # Figure K.3: fold lengths > 16 back by moving a shorter-code pair
    for i in range(63, 16, -1):
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved symbol (always the longest code)
    pairs = sorted((int(codesize[v]), v) for v in range(256) if codesize[v] > 0)
    return [int(b) for b in bits[1:17]], [v for _, v in pairs]


class _ScanTokens:
    """Token list for one scan: Huffman symbols (counted per table id
    so per-scan optimal tables can be built after the gather pass) and
    raw appended bits. ``encode`` maps symbols through the built codes
    and packs everything with the vectorized :class:`_BitWriter`."""

    __slots__ = ("toks", "counts")

    def __init__(self):
        self.toks: list[tuple] = []  # (1, table_id, symbol) | (0, value, nbits)
        self.counts: dict[int, np.ndarray] = {}

    def sym(self, tbl: int, s: int) -> None:
        self.toks.append((1, tbl, s))
        c = self.counts.get(tbl)
        if c is None:
            c = self.counts[tbl] = np.zeros(256, dtype=np.int64)
        c[s] += 1

    def bits(self, v: int, n: int) -> None:
        if n:
            self.toks.append((0, int(v) & ((1 << n) - 1), n))

    def encode(self, codes_by_tbl: dict[int, dict[int, tuple[int, int]]]) -> bytes:
        vals = np.empty(len(self.toks), dtype=np.int64)
        lens = np.empty(len(self.toks), dtype=np.int64)
        for i, t in enumerate(self.toks):
            if t[0]:
                vals[i], lens[i] = codes_by_tbl[t[1]][t[2]]
            else:
                vals[i], lens[i] = t[1], t[2]
        writer = _BitWriter()
        writer.write(vals, lens)
        return writer.tobytes()


def _mcu_dc_walk(comp_bw, samp):
    """Interleaved MCU walk for DC scans: yields (component index,
    block index into that component's encoder-order block array), edge
    blocks clamped into the MCU padding exactly like the baseline
    encoder, matching the decoder's MCU grid."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    ybw, ybh = comp_bw[0]
    mcus_x = -(-ybw // hmax)
    mcus_y = -(-ybh // vmax)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                cbw, cbh = comp_bw[ci]
                for dy in range(sv):
                    for dx in range(sh):
                        by = min(my * sv + dy, cbh - 1)
                        bx = min(mx * sh + dx, cbw - 1)
                        yield ci, by * cbw + bx


def _enc_dc_first(comp_zz, comp_bw, samp, al, ts) -> None:
    """G.1.2.1: diff-coded DC at point transform ``>> al`` (arithmetic
    shift), interleaved, DC table 0 for luma / 1 for chroma."""
    preds = [0] * len(samp)
    for ci, bi in _mcu_dc_walk(comp_bw, samp):
        v = int(comp_zz[ci][bi, 0]) >> al
        diff = v - preds[ci]
        preds[ci] = v
        size = abs(diff).bit_length()
        ts.sym(0x00 if ci == 0 else 0x01, size)
        if size:
            ts.bits(diff if diff >= 0 else diff + (1 << size) - 1, size)


def _enc_dc_refine(comp_zz, comp_bw, samp, al, ts) -> None:
    """DC successive-approximation refinement: one raw bit per block
    in MCU order (no Huffman table)."""
    for ci, bi in _mcu_dc_walk(comp_bw, samp):
        ts.bits((int(comp_zz[ci][bi, 0]) >> al) & 1, 1)


_MAX_EOBRUN = 0x7FFF  # EOB14 ceiling: (1 << 14) + 14 extension bits


def _enc_ac_first(zzs, ss, se, al, ts, tbl=0x10) -> None:
    """G.1.2.2: first scan of an AC band at point transform al —
    zero runs, (run, size) symbols with sign-magnitude shifted
    values, and EOBn runs across all-zero bands."""
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            ts.sym(tbl, n << 4)
            ts.bits(eobrun - (1 << n), n)
            eobrun = 0

    for zz in zzs:
        band = zz[ss : se + 1].astype(np.int64)
        t = np.abs(band) >> al
        nz = np.flatnonzero(t)
        if len(nz) == 0:
            eobrun += 1
            if eobrun == _MAX_EOBRUN:
                flush()
            continue
        flush()
        prev = -1
        for i in nz:
            run = int(i) - prev - 1
            prev = int(i)
            while run > 15:
                ts.sym(tbl, 0xF0)
                run -= 16
            m = int(t[i])
            size = m.bit_length()
            ts.sym(tbl, (run << 4) | size)
            v = m if band[i] >= 0 else -m
            ts.bits(v if v >= 0 else v + (1 << size) - 1, size)
        if prev != se - ss:
            eobrun += 1
            if eobrun == _MAX_EOBRUN:
                flush()
    flush()


def _enc_ac_refine(zzs, ss, se, al, ts, tbl=0x10) -> None:
    """G.1.2.3: AC refinement — newly-significant coefficients code
    (run, 1) + sign where the run counts zero-history positions;
    already-nonzero coefficients append correction bits after the
    next emitted symbol; trailing spans fold into an EOB run whose
    buffered correction bits flush with the EOBn symbol. Mirrors the
    spec's Figure G.7 buffering (and libjpeg's public jcphuff
    semantics, including the ZRL-not-past-EOB rule)."""
    eobrun = 0
    run_bits: list[int] = []

    def flush():
        nonlocal eobrun, run_bits
        if eobrun:
            n = eobrun.bit_length() - 1
            ts.sym(tbl, n << 4)
            ts.bits(eobrun - (1 << n), n)
            for b in run_bits:
                ts.bits(b, 1)
            eobrun = 0
            run_bits = []

    for zz in zzs:
        band = zz[ss : se + 1].astype(np.int64)
        t = np.abs(band) >> al
        ones = np.flatnonzero(t == 1)
        eob = int(ones[-1]) if len(ones) else -1  # last newly-significant pos
        r = 0
        br: list[int] = []  # correction bits since the last symbol
        for k in range(len(band)):
            tk = int(t[k])
            if tk == 0:
                r += 1
                continue
            # ZRLs are only emitted before the last new coefficient;
            # past it the run folds into the EOB run
            while r > 15 and k <= eob:
                flush()
                ts.sym(tbl, 0xF0)
                r -= 16
                for b in br:
                    ts.bits(b, 1)
                br = []
            if tk > 1:  # history-nonzero: correction bit only
                br.append(tk & 1)
                continue
            flush()
            ts.sym(tbl, (r << 4) | 1)
            ts.bits(1 if band[k] >= 0 else 0, 1)
            for b in br:
                ts.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            run_bits.extend(br)
            # libjpeg's MAX_CORR_BITS bound keeps the buffer finite
            if eobrun == _MAX_EOBRUN or len(run_bits) > 937:
                flush()
    flush()


# libjpeg's public default progressive scan script for 3 components:
# (kind, component, Ss, Se, Ah, Al)
_PROG_SCRIPT = (
    ("dc_first", None, 0, 0, 0, 1),
    ("ac_first", 0, 1, 5, 0, 2),
    ("ac_first", 2, 1, 63, 0, 1),
    ("ac_first", 1, 1, 63, 0, 1),
    ("ac_first", 0, 6, 63, 0, 2),
    ("ac_refine", 0, 1, 63, 2, 1),
    ("dc_refine", None, 0, 0, 1, 0),
    ("ac_refine", 2, 1, 63, 1, 0),
    ("ac_refine", 1, 1, 63, 1, 0),
    ("ac_refine", 0, 1, 63, 1, 0),
)


def _assemble_progressive(comp_zz, comp_bw, samp, qy, qc, h, w) -> bytes:
    """Quantized zigzag blocks -> complete SOF2 JFIF stream. Each scan
    gathers its tokens, builds per-scan optimal Huffman tables (the
    Annex K example tables lack the EOBn symbols progressive scans
    need), and emits DHT + SOS + entropy data; table slots are reused
    across scans, which the decoder snapshots per scan."""
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        hv = (samp[ci][0] << 4) | samp[ci][1]
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof

    for kind, ci, ss, se, ah, al in _PROG_SCRIPT:
        ts = _ScanTokens()
        if kind == "dc_first":
            _enc_dc_first(comp_zz, comp_bw, samp, al, ts)
        elif kind == "dc_refine":
            _enc_dc_refine(comp_zz, comp_bw, samp, al, ts)
        elif kind == "ac_first":
            _enc_ac_first(comp_zz[ci], ss, se, al, ts)
        else:
            _enc_ac_refine(comp_zz[ci], ss, se, al, ts)
        codes: dict[int, dict[int, tuple[int, int]]] = {}
        for tbl in sorted(ts.counts):
            bits, vals = _opt_table(ts.counts[tbl])
            payload = bytes([tbl]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
            codes[tbl] = _build_codes(bits, vals)
        if ci is None:  # interleaved DC scan over all components
            sos = bytes([3])
            for c in range(3):
                sos += bytes([c + 1, 0x00 if c == 0 else 0x10])
        else:
            sos = bytes([1, ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += ts.encode(codes)
    out += b"\xff\xd9"
    return bytes(out)
