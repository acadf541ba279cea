"""Pure-numpy WebP-lossless (VP8L) codec — no libwebp/PIL in env.

WebP is the remaining mainstream *image* format a web crawl contains
that this environment can genuinely build from scratch: the lossless
variant (VP8L) is a fully published bitstream (the WebP Lossless
Bitstream Specification / RFC 9649) with no patent-encumbered DSP —
prefix coding, LZ77 over pixels, a color cache, and four reversible
transforms. Lossy WebP (VP8 intra coding) stays an env-gated stub in
:func:`raydedup.media.decode_image`-adjacent paths, like h264.

- decoder: RIFF/VP8L parsing, simple and normal prefix codes (the
  DEFLATE-style code-length coding with 16/17/18 repeats and the
  VP8L symbol-count shortcut), meta-prefix groups, color cache,
  LZ77 backward references with the two-dimensional distance map,
  and the inverse transforms: PREDICTOR (all 14 modes),
  COLOR_TRANSFORM, SUBTRACT_GREEN and COLOR_INDEXING (including
  sub-byte pixel bundling for palettes <= 16).
- encoder: chooses COLOR_INDEXING for <= 256 distinct colors (with
  pixel bundling when the palette allows) and SUBTRACT_GREEN (+
  optionally a per-block PREDICTOR transform) otherwise; emits
  greedy LZ77 runs (distance 1 / one row up), color-cache hits, and
  per-channel canonical prefix codes built by the same
  merge-and-length-limit procedure the JPEG encoder uses (Annex
  K.2 shape, 15-bit cap). Everything round-trips bit-exactly —
  lossless — which is how the tests pin both directions.

All structure follows the public spec; like the JPEG/GIF/FLAC
modules this is written from the spec figures, not ported. The
two-dimensional distance table is generated from the spec's rule
(offsets ordered by x²+y², nearer rows first, positive x before
negative); self-consistency between this encoder and decoder is
what the tests verify — no external WebP files exist in this
environment to cross-check against, the same limitation every other
codec here documents.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ bit io
class _BitReaderLSB:
    """LSB-first reader (VP8L convention) with a 15-bit peek."""

    __slots__ = ("data", "ip", "buf", "nbuf")

    def __init__(self, data: bytes):
        self.data = data
        self.ip = 0
        self.buf = 0
        self.nbuf = 0

    def _fill(self, need: int) -> None:
        while self.nbuf < need:
            b = self.data[self.ip] if self.ip < len(self.data) else 0
            self.ip += 1
            self.buf |= b << self.nbuf
            self.nbuf += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.nbuf -= n
        return v

    def peek15(self) -> int:
        self._fill(15)
        return self.buf & 0x7FFF

    def skip(self, n: int) -> None:
        self.buf >>= n
        self.nbuf -= n


class _BitWriterLSB:
    __slots__ = ("out", "buf", "nbuf")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbuf = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.buf |= (v & ((1 << n) - 1)) << self.nbuf
        self.nbuf += n
        while self.nbuf >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbuf -= 8

    def tobytes(self) -> bytes:
        if self.nbuf:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.nbuf = 0
        return bytes(self.out)


def _reverse_bits(v: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


# ----------------------------------------------------- canonical codes
_MAX_CODE_LEN = 15


def _limited_code_lengths(freqs: np.ndarray, maxlen: int = _MAX_CODE_LEN) -> np.ndarray:
    """Frequencies -> per-symbol code lengths, length-limited: the
    pairwise-merge procedure with the JPEG Annex-K.3-style fold for
    over-long codes (same algorithm family libwebp/zlib use)."""
    n = len(freqs)
    freq = freqs.astype(np.int64).copy()
    nz = np.flatnonzero(freq)
    lengths = np.zeros(n, dtype=np.int64)
    if len(nz) == 0:
        return lengths
    if len(nz) == 1:
        lengths[nz[0]] = 1
        return lengths
    codesize = np.zeros(n, dtype=np.int64)
    others = np.full(n, -1, dtype=np.int64)
    work = freq.copy()
    while True:
        live = np.flatnonzero(work > 0)
        if len(live) < 2:
            break
        order = live[np.lexsort((-live, work[live]))]
        v1, v2 = int(order[0]), int(order[1])
        work[v1] += work[v2]
        work[v2] = 0
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
    for s in codesize[codesize > 0]:
        bits[min(int(s), 63)] += 1
    for i in range(63, maxlen, -1):
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    # reassign limited lengths to symbols ordered by original depth
    order = sorted((int(codesize[s]), s) for s in range(n) if codesize[s] > 0)
    li = 1
    for cs, sym in order:
        while bits[li] == 0:
            li += 1
        lengths[sym] = li
        bits[li] -= 1
    return lengths


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Code lengths -> canonical code values (MSB-first ints), the
    RFC-1951 assignment the VP8L spec uses."""
    maxlen = int(lengths.max()) if len(lengths) else 0
    codes = np.zeros(len(lengths), dtype=np.int64)
    code = 0
    for ln in range(1, maxlen + 1):
        for s in np.flatnonzero(lengths == ln):
            codes[s] = code
            code += 1
        code <<= 1
    return codes


class _DecTable:
    """15-bit LSB-peek decode table: index by the next 15 stream bits,
    get (symbol, length). Single-symbol codes decode with 0 bits."""

    __slots__ = ("sym", "ln", "single")

    def __init__(self, lengths: np.ndarray):
        nz = np.flatnonzero(lengths)
        if len(nz) == 1:
            self.single = int(nz[0])
            self.sym = self.ln = None
            return
        self.single = None
        self.sym = np.zeros(1 << _MAX_CODE_LEN, dtype=np.int32)
        self.ln = np.zeros(1 << _MAX_CODE_LEN, dtype=np.uint8)
        codes = _canonical_codes(lengths)
        for s in nz:
            L = int(lengths[s])
            r = _reverse_bits(int(codes[s]), L)
            self.sym[r :: 1 << L] = s
            self.ln[r :: 1 << L] = L

    def read(self, br: _BitReaderLSB) -> int:
        if self.single is not None:
            return self.single
        idx = br.peek15()
        br.skip(int(self.ln[idx]))
        return int(self.sym[idx])


# -------------------------------------------- prefix-code (de)serialization
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: _BitReaderLSB, alphabet: int) -> _DecTable:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        lengths = np.zeros(alphabet, dtype=np.int64)
        s0 = br.read(8 if first_8bit else 1)
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            lengths[s1] = 1
        else:
            return _DecTable(lengths)  # single symbol: zero-bit code
        return _DecTable(lengths)
    num_clc = br.read(4) + 4
    clc = np.zeros(19, dtype=np.int64)
    for i in range(num_clc):
        clc[_CLC_ORDER[i]] = br.read(3)
    clc_table = _DecTable(clc)
    if br.read(1):  # limited symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = np.zeros(alphabet, dtype=np.int64)
    prev = 8
    symbol = 0
    while symbol < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = clc_table.read(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            lengths[symbol : symbol + rep] = prev
            symbol += rep
        elif s == 17:
            symbol += 3 + br.read(3)
        else:
            symbol += 11 + br.read(7)
    return _DecTable(lengths)


def _write_prefix_code(bw: _BitWriterLSB, freqs: np.ndarray) -> np.ndarray:
    """Emit the prefix-code header for ``freqs`` and return per-symbol
    (code, length) for the payload pass. Uses the simple form when it
    fits, else normal code-length coding."""
    nz = np.flatnonzero(freqs)
    if len(nz) == 0:  # code never used: 1-symbol simple code for 0
        bw.write(1, 1)
        bw.write(0, 1)  # one symbol
        bw.write(0, 1)  # 1-bit symbol field
        bw.write(0, 1)
        out = np.zeros((len(freqs), 2), dtype=np.int64)
        return out
    if len(nz) <= 2 and nz.max() < 256:
        bw.write(1, 1)
        bw.write(len(nz) - 1, 1)
        s0 = int(nz[0])
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        out = np.zeros((len(freqs), 2), dtype=np.int64)
        if len(nz) == 2:
            bw.write(int(nz[1]), 8)
            out[nz[0]] = (0, 1)
            out[nz[1]] = (1, 1)
        else:
            out[s0] = (0, 0)  # zero-bit single-symbol code
        return out
    lengths = _limited_code_lengths(freqs)
    if len(np.flatnonzero(lengths)) == 1:
        # single used symbol >= 256 (e.g. a lone length code): pad
        # with a 1-bit dummy so the canonical code is complete
        lengths[int(np.flatnonzero(lengths)[0])] = 1
        lengths[0] = max(lengths[0], 1)
    # tokenize lengths with 16/17/18 repeats
    toks: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i = 0
    n = len(lengths)
    last = int(np.flatnonzero(lengths)[-1]) + 1
    prev = 8
    while i < last:
        v = int(lengths[i])
        run = 1
        while i + run < last and lengths[i + run] == v:
            run += 1
        if v == 0:
            r = run
            while r >= 11:
                rep = min(r, 138)
                toks.append((18, rep - 11, 7))
                r -= rep
            while r >= 3:
                rep = min(r, 10)
                toks.append((17, rep - 3, 3))
                r -= rep
            for _ in range(r):
                toks.append((0, 0, 0))
        else:
            toks.append((v, 0, 0))
            prev = v
            r = run - 1
            while r >= 3:
                rep = min(r, 6)
                toks.append((16, rep - 3, 2))
                r -= rep
            for _ in range(r):
                toks.append((v, 0, 0))
        i += run
    clc_freq = np.zeros(19, dtype=np.int64)
    for s, _, _ in toks:
        clc_freq[s] += 1
    clc_len = _limited_code_lengths(clc_freq, maxlen=7)
    if len(np.flatnonzero(clc_len)) == 1:
        only = int(np.flatnonzero(clc_len)[0])
        clc_len[only] = 1
        clc_len[0 if only != 0 else 1] = 1
    clc_codes = _canonical_codes(clc_len)
    bw.write(0, 1)  # normal code
    num_clc = 19
    while num_clc > 4 and clc_len[_CLC_ORDER[num_clc - 1]] == 0:
        num_clc -= 1
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(int(clc_len[_CLC_ORDER[i]]), 3)
    # symbol-count shortcut: the decoder reads exactly len(toks) tokens
    # and leaves the (uncoded) tail at zero
    bw.write(1, 1)
    need = max(len(toks) - 2, 0)
    length_nbits = 2
    while (1 << length_nbits) <= need:
        length_nbits += 2
    bw.write((length_nbits - 2) // 2, 3)
    bw.write(need, length_nbits)
    for s, extra, ebits in toks:
        bw.write(_reverse_bits(int(clc_codes[s]), int(clc_len[s])), int(clc_len[s]))
        if ebits:
            bw.write(extra, ebits)
    codes = _canonical_codes(lengths)
    out = np.zeros((len(freqs), 2), dtype=np.int64)
    for s in np.flatnonzero(lengths):
        out[s] = (_reverse_bits(int(codes[s]), int(lengths[s])), int(lengths[s]))
    return out


# --------------------------------------------------- LZ77 value coding
def _lz77_code(v: int) -> tuple[int, int, int]:
    """LZ77 length / distance value -> (prefix symbol, extra, nbits)."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    k = x.bit_length() - 1
    c = 2 * k + (1 if x >= (3 << (k - 1)) else 0)
    ebits = (c - 2) >> 1
    offset = (2 + (c & 1)) << ebits
    return c, x - offset, ebits


def _lz77_value(br: _BitReaderLSB, c: int) -> int:
    if c < 4:
        return c + 1
    ebits = (c - 2) >> 1
    offset = (2 + (c & 1)) << ebits
    return offset + br.read(ebits) + 1


def _distance_map() -> list[tuple[int, int]]:
    """The spec's 120-entry 2D offset table: (dx, dy) ordered by
    squared distance, nearer rows (larger dy? no — smaller radius)
    first; within a radius larger dy first and +dx before -dx."""
    cand = []
    for dy in range(0, 9):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cand.append((dx * dx + dy * dy, -dy, abs(dx), 0 if dx > 0 else 1, dx, dy))
    cand.sort()
    return [(dx, dy) for _, _, _, _, dx, dy in cand[:120]]


_DIST_MAP = _distance_map()


def _plane_to_distance(plane: int, xsize: int) -> int:
    if plane > 120:
        return plane - 120
    dx, dy = _DIST_MAP[plane - 1]
    d = dx + dy * xsize
    return max(d, 1)


# ------------------------------------------------------- predictors
def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) >> 1


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """One pixel's prediction (4-channel int32 arrays a,r,g,b)."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = T.astype(np.int32) + L.astype(np.int32) - TL.astype(np.int32)
        if np.abs(p - L).sum() <= np.abs(p - T).sum():
            return L
        return T
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32), 0, 255)
    # 13: ClampAddSubtractHalf (C-style truncating division)
    a = _avg2(L, T)
    d = a - TL.astype(np.int32)
    half = np.where(d >= 0, d // 2, -((-d) // 2))
    return np.clip(a + half, 0, 255)


def _predictor_pass(px: np.ndarray, modes: np.ndarray, size_bits: int, forward: bool) -> np.ndarray:
    """Apply (forward) or invert the predictor transform. ``px`` is
    (h, w, 4) uint8 in (a, r, g, b) order; sequential by spec (inverse
    prediction consumes reconstructed neighbors)."""
    h, w = px.shape[:2]
    out = px.astype(np.int32).copy()
    src = out if not forward else px.astype(np.int32)
    res = np.empty_like(out) if forward else None
    black = np.array([255, 0, 0, 0], dtype=np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = (src if forward else out)[0, x - 1]
            elif x == 0:
                pred = (src if forward else out)[y - 1, 0]
            else:
                buf = src if forward else out
                L = buf[y, x - 1]
                T = buf[y - 1, x]
                TL = buf[y - 1, x - 1]
                TR = buf[y - 1, x + 1] if x + 1 < w else buf[y, 0]
                mode = int(modes[y >> size_bits, x >> size_bits])
                pred = _predict(mode, L, T, TL, TR)
            if forward:
                res[y, x] = (src[y, x] - pred) & 0xFF
            else:
                out[y, x] = (out[y, x] + pred) & 0xFF
    return (res if forward else out).astype(np.uint8)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8 t * int8 c) >> 5 per the spec."""
    return (t.astype(np.int8).astype(np.int32) * c.astype(np.int8).astype(np.int32)) >> 5


def _color_transform_pass(px: np.ndarray, elems: np.ndarray, size_bits: int, forward: bool) -> np.ndarray:
    """(h, w, 4) a,r,g,b; ``elems`` (bh, bw, 3) = (g2r, g2b, r2b)."""
    h, w = px.shape[:2]
    out = px.astype(np.int32).copy()
    by = np.arange(h) >> size_bits
    bx = np.arange(w) >> size_bits
    g2r = elems[by][:, bx, 0]
    g2b = elems[by][:, bx, 1]
    r2b = elems[by][:, bx, 2]
    g = out[..., 2]  # green is channel 2 in (a, r, g, b)
    if forward:
        # the red->blue delta uses the ORIGINAL red — the inverse
        # reconstructs red first and then applies the same delta
        r_orig = out[..., 1].copy()
        out[..., 1] = (out[..., 1] - _ct_delta(g2r, g)) & 0xFF
        out[..., 3] = (out[..., 3] - _ct_delta(g2b, g) - _ct_delta(r2b, r_orig)) & 0xFF
    else:
        out[..., 1] = (out[..., 1] + _ct_delta(g2r, g)) & 0xFF
        out[..., 3] = (out[..., 3] + _ct_delta(g2b, g) + _ct_delta(r2b, out[..., 1])) & 0xFF
    return out.astype(np.uint8)


# ---------------------------------------------------------- decoding
_GREEN_BASE = 256 + 24


def _decode_entropy_image(br: _BitReaderLSB, w: int, h: int, is_main: bool) -> np.ndarray:
    """One entropy-coded ARGB image -> (h, w, 4) uint8 (a, r, g, b)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid VP8L color-cache size")
    groups = 1
    meta = None
    meta_bits = 0
    if is_main and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-w >> meta_bits) if False else -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = (meta_img[..., 1].astype(np.int32) << 8) | meta_img[..., 2]
        groups = int(meta.max()) + 1
    green_alpha = _GREEN_BASE + ((1 << cache_bits) if cache_bits else 0)
    tables = []
    for _ in range(groups):
        tables.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )
    cache = np.zeros((1 << cache_bits, 4), dtype=np.uint8) if cache_bits else None
    n = w * h
    out = np.zeros((n, 4), dtype=np.uint8)
    pos = 0
    gx = -1
    group = tables[0]
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            g = int(meta[y >> meta_bits, x >> meta_bits])
            if g != gx:
                group = tables[g]
                gx = g
        s = group[0].read(br)
        if s < 256:
            r = group[1].read(br)
            b = group[2].read(br)
            a = group[3].read(br)
            out[pos] = (a, r, s, b)
            if cache is not None:
                px = (a << 24) | (r << 16) | (s << 8) | b
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = out[pos]
            pos += 1
        elif s < _GREEN_BASE:
            length = _lz77_value(br, s - 256)
            dsym = group[4].read(br)
            plane = _lz77_value(br, dsym)
            dist = _plane_to_distance(plane, w)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backref out of range")
            for i in range(length):
                out[pos + i] = out[pos + i - dist]
            if cache is not None:
                for i in range(length):
                    a, r, g, b = (int(v) for v in out[pos + i])
                    px = (a << 24) | (r << 16) | (g << 8) | b
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = out[pos + i]
            pos += length
        else:
            if cache is None:
                raise ValueError("VP8L cache symbol without cache")
            out[pos] = cache[s - _GREEN_BASE]
            pos += 1
    return out.reshape(h, w, 4)


def decode_webp_rgb8(data: bytes) -> np.ndarray:
    """WebP-lossless bytes -> (h, w, 3) uint8 RGB."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    if data[12:16] == b"VP8 ":
        raise NotImplementedError("lossy WebP (VP8 intra DSP) not buildable here")
    if data[12:16] != b"VP8L":
        raise NotImplementedError(f"WebP chunk {data[12:16]!r} unsupported")
    (chunk_len,) = struct.unpack("<I", data[16:20])
    payload = data[20 : 20 + chunk_len]
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReaderLSB(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")

    # transforms (read order; applied in reverse afterwards)
    transforms: list[tuple] = []
    cur_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in (0, 1):  # predictor / color transform
            size_bits = br.read(3) + 2
            bw_ = -(-cur_w // (1 << size_bits))
            bh_ = -(-h // (1 << size_bits))
            sub = _decode_entropy_image(br, bw_, bh_, False)
            transforms.append((ttype, size_bits, sub))
        elif ttype == 2:
            transforms.append((2,))
        else:  # color indexing
            pal_size = br.read(8) + 1
            pal_img = _decode_entropy_image(br, pal_size, 1, False)
            palette = np.cumsum(pal_img[0].astype(np.int64), axis=0).astype(np.uint8)  # delta-coded
            if pal_size <= 2:
                width_bits = 3
            elif pal_size <= 4:
                width_bits = 2
            elif pal_size <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, palette, width_bits, cur_w))
            cur_w = -(-cur_w // (1 << width_bits))

    px = _decode_entropy_image(br, cur_w, h, True)

    for t in reversed(transforms):
        if t[0] == 3:
            _, palette, width_bits, full_w = t
            if width_bits:
                per = 1 << width_bits
                bits = 8 >> width_bits
                g = px[..., 2].astype(np.int32)
                idx = np.zeros((h, px.shape[1] * per), dtype=np.int64)
                for k in range(per):
                    idx[:, k::per] = (g >> (k * bits)) & ((1 << bits) - 1)
                idx = idx[:, :full_w]
            else:
                idx = px[..., 2].astype(np.int64)
            idx = np.minimum(idx, len(palette) - 1)
            px = palette[idx]
        elif t[0] == 2:  # add green back
            p = px.astype(np.int32)
            p[..., 1] = (p[..., 1] + p[..., 2]) & 0xFF
            p[..., 3] = (p[..., 3] + p[..., 2]) & 0xFF
            px = p.astype(np.uint8)
        elif t[0] == 1:  # color transform inverse
            _, size_bits, sub = t
            elems = np.stack([sub[..., 3], sub[..., 2], sub[..., 1]], axis=-1)  # b, g, r channels
            px = _color_transform_pass(px, elems, size_bits, forward=False)
        else:  # predictor inverse
            _, size_bits, sub = t
            modes = sub[..., 2]  # green channel
            px = _predictor_pass(px, modes, size_bits, forward=False)
    return np.stack([px[..., 1], px[..., 2], px[..., 3]], axis=-1)


# ---------------------------------------------------------- encoding
def _emit_entropy_image(
    bw: _BitWriterLSB, px: np.ndarray, cache_bits: int = 0, lz77: bool = True
) -> None:
    """Encode (h, w, 4) (a, r, g, b) pixels as one entropy-coded image
    (single prefix-code group): greedy LZ77 runs at distance 1 and one
    row up, color-cache hits, then per-channel prefix codes."""
    h, w = px.shape[:2]
    flat = px.reshape(-1, 4).astype(np.int64)
    n = len(flat)
    packed = (flat[:, 0] << 24) | (flat[:, 1] << 16) | (flat[:, 2] << 8) | flat[:, 3]
    # token stream: (kind, ...) kind 0=literal(a,r,g,b) 1=(len,plane) 2=cache idx
    toks: list[tuple] = []
    cache = np.full(1 << cache_bits, -1, dtype=np.int64) if cache_bits else None

    def cache_key(v: int) -> int:
        return (0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)

    # precompute run lengths for distance 1 and distance w
    same_prev = np.concatenate([[False], packed[1:] == packed[:-1]])
    same_up = np.zeros(n, dtype=bool)
    if n > w:
        same_up[w:] = packed[w:] == packed[:-w]
    pos = 0
    while pos < n:
        best_len = 0
        best_dist = 0
        if lz77 and pos > 0:
            if same_prev[pos]:
                L = 1
                while pos + L < n and same_prev[pos + L] and L < 4096:
                    L += 1
                if L > best_len:
                    best_len, best_dist = L, 1
            if pos >= w and same_up[pos]:
                L = 1
                while pos + L < n and same_up[pos + L] and L < 4096:
                    L += 1
                if L > best_len:
                    best_len, best_dist = L, w
        if best_len >= 3:
            plane = best_dist + 120
            # prefer a 2D plane code when the distance is in the map
            for i, (dx, dy) in enumerate(_DIST_MAP):
                if dx + dy * w == best_dist:
                    plane = i + 1
                    break
            toks.append((1, best_len, plane))
            if cache is not None:
                for i in range(best_len):
                    v = int(packed[pos + i])
                    cache[cache_key(v)] = v
            pos += best_len
            continue
        v = int(packed[pos])
        if cache is not None:
            k = cache_key(v)
            if cache[k] == v:
                toks.append((2, k))
                pos += 1
                continue
            cache[k] = v
        a, r, g, b = (int(x) for x in flat[pos])
        toks.append((0, a, r, g, b))
        pos += 1

    green_alpha = _GREEN_BASE + ((1 << cache_bits) if cache_bits else 0)
    fg = np.zeros(green_alpha, dtype=np.int64)
    fr = np.zeros(256, dtype=np.int64)
    fb = np.zeros(256, dtype=np.int64)
    fa = np.zeros(256, dtype=np.int64)
    fd = np.zeros(40, dtype=np.int64)
    for t in toks:
        if t[0] == 0:
            fg[t[3]] += 1
            fr[t[2]] += 1
            fb[t[4]] += 1
            fa[t[1]] += 1
        elif t[0] == 1:
            c, _, _ = _lz77_code(t[1])
            fg[256 + c] += 1
            c, _, _ = _lz77_code(t[2])
            fd[c] += 1
        else:
            fg[_GREEN_BASE + t[1]] += 1

    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    # is_main caller writes the meta-huffman bit itself when needed
    cg = _write_prefix_code(bw, fg)
    cr = _write_prefix_code(bw, fr)
    cb = _write_prefix_code(bw, fb)
    ca = _write_prefix_code(bw, fa)
    cd = _write_prefix_code(bw, fd)
    for t in toks:
        if t[0] == 0:
            _, a, r, g, b = t
            bw.write(int(cg[g, 0]), int(cg[g, 1]))
            bw.write(int(cr[r, 0]), int(cr[r, 1]))
            bw.write(int(cb[b, 0]), int(cb[b, 1]))
            bw.write(int(ca[a, 0]), int(ca[a, 1]))
        elif t[0] == 1:
            c, extra, ebits = _lz77_code(t[1])
            s = 256 + c
            bw.write(int(cg[s, 0]), int(cg[s, 1]))
            bw.write(extra, ebits)
            c, extra, ebits = _lz77_code(t[2])
            bw.write(int(cd[c, 0]), int(cd[c, 1]))
            bw.write(extra, ebits)
        else:
            s = _GREEN_BASE + t[1]
            bw.write(int(cg[s, 0]), int(cg[s, 1]))


def encode_webp_rgb8(
    pixels: np.ndarray,
    use_predictor: bool | None = None,
    cache_bits: int = 8,
    lz77: bool = True,
) -> bytes:
    """(h, w, 3) uint8 -> lossless WebP bytes. <= 256 distinct colors
    take the COLOR_INDEXING path (with sub-byte bundling when the
    palette allows); otherwise SUBTRACT_GREEN and, when it helps (or
    ``use_predictor`` forces it), a per-block PREDICTOR transform."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_webp_rgb8 expects (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    if h > 1 << 14 or w > 1 << 14:
        raise ValueError("VP8L dimension cap is 16384")
    px = np.zeros((h, w, 4), dtype=np.uint8)  # (a, r, g, b)
    px[..., 0] = 255
    px[..., 1] = pixels[..., 0]
    px[..., 2] = pixels[..., 1]
    px[..., 3] = pixels[..., 2]

    bw = _BitWriterLSB()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version

    flat = px.reshape(-1, 4).astype(np.int64)
    packed = (flat[:, 0] << 24) | (flat[:, 1] << 16) | (flat[:, 2] << 8) | flat[:, 3]
    uniq = np.unique(packed)
    if len(uniq) <= 256:
        # COLOR_INDEXING transform
        bw.write(1, 1)
        bw.write(3, 2)
        pal_size = len(uniq)
        bw.write(pal_size - 1, 8)
        pal_px = np.zeros((1, pal_size, 4), dtype=np.uint8)
        pal_px[0, :, 0] = (uniq >> 24) & 0xFF
        pal_px[0, :, 1] = (uniq >> 16) & 0xFF
        pal_px[0, :, 2] = (uniq >> 8) & 0xFF
        pal_px[0, :, 3] = uniq & 0xFF
        deltas = np.diff(pal_px[0].astype(np.int64), axis=0, prepend=np.zeros((1, 4), np.int64)) & 0xFF
        _emit_entropy_image(bw, deltas.astype(np.uint8).reshape(1, pal_size, 4), cache_bits=0, lz77=False)
        idx = np.searchsorted(uniq, packed).reshape(h, w)
        if pal_size <= 2:
            width_bits = 3
        elif pal_size <= 4:
            width_bits = 2
        elif pal_size <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits
            bits = 8 >> width_bits
            pw = -(-w // per)
            bundled = np.zeros((h, pw), dtype=np.int64)
            for k in range(per):
                col = idx[:, k::per]
                bundled[:, : col.shape[1]] |= col << (k * bits)
            g = bundled
            cur_w = pw
        else:
            g = idx
            cur_w = w
        main = np.zeros((h, cur_w, 4), dtype=np.uint8)
        main[..., 2] = g.astype(np.uint8)
        bw.write(0, 1)  # end of transforms
        # color cache over index pixels is wasteful; literals + lz77
        _emit_main(bw, main, cache_bits=0, lz77=lz77)
    else:
        # SUBTRACT_GREEN (+ optional predictor)
        work = px
        if use_predictor is None:
            use_predictor = _gradientish(pixels)
        if use_predictor:
            size_bits = 4
            bw_blocks = -(-w // (1 << size_bits))
            bh_blocks = -(-h // (1 << size_bits))
            modes = np.full((bh_blocks, bw_blocks), 2, dtype=np.int64)  # top
            modes[0, :] = 1  # first block row: left
            bw.write(1, 1)
            bw.write(0, 2)  # predictor transform
            bw.write(size_bits - 2, 3)
            sub = np.zeros((bh_blocks, bw_blocks, 4), dtype=np.uint8)
            sub[..., 0] = 255
            sub[..., 2] = modes.astype(np.uint8)
            _emit_entropy_image(bw, sub, cache_bits=0, lz77=False)
            work = _predictor_pass(work, modes, size_bits, forward=True)
        p = work.astype(np.int32)
        p[..., 1] = (p[..., 1] - p[..., 2]) & 0xFF
        p[..., 3] = (p[..., 3] - p[..., 2]) & 0xFF
        work = p.astype(np.uint8)
        bw.write(1, 1)
        bw.write(2, 2)  # subtract green
        bw.write(0, 1)  # end of transforms
        _emit_main(bw, work, cache_bits=cache_bits, lz77=lz77)

    payload = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _emit_main(bw: _BitWriterLSB, px: np.ndarray, cache_bits: int, lz77: bool) -> None:
    """Main image: cache header + meta-huffman bit (off) + payload.
    The meta bit sits between the cache header and the prefix codes,
    so the shared emitter can't write it — wrap instead."""
    tmp = _BitWriterLSB()
    _emit_entropy_image(tmp, px, cache_bits=cache_bits, lz77=lz77)
    # replay: cache header bits first, then inject the meta bit
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta prefix codes
    # re-emit the remainder of tmp after its own cache header
    skip_bits = 5 if cache_bits else 1
    total_bits = len(tmp.out) * 8 + tmp.nbuf
    br = _BitReaderLSB(tmp.tobytes())
    br.read(skip_bits)
    remaining = total_bits - skip_bits
    while remaining >= 24:
        bw.write(br.read(24), 24)
        remaining -= 24
    if remaining:
        bw.write(br.read(remaining), remaining)


def _gradientish(pixels: np.ndarray) -> bool:
    """Cheap heuristic: smooth images benefit from the predictor."""
    g = pixels[..., 1].astype(np.int32)
    if g.shape[0] < 2 or g.shape[1] < 2:
        return False
    dv = np.abs(np.diff(g, axis=0)).mean()
    dh = np.abs(np.diff(g, axis=1)).mean()
    return (dv + dh) / 2 < 24.0
