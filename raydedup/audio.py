"""Audio column primitives: RIFF/WAV container, G.711 µ-law/A-law,
IMA ADPCM — from-scratch, numpy-vectorized where the format allows.

Built purely from the public specs (RIFF/WAVE chunk layout, ITU-T
G.711 companding tables, the IMA/DVI ADPCM step + index tables); no
audio libraries exist in this environment. These close the
"compressed audio codec" env-stub from the round-3 review: the
AudioFeatureStage decodes ``wav`` (PCM8/PCM16/µ-law/A-law/IMA-ADPCM
format tags), raw ``ulaw``/``alaw`` streams and raw ``pcm16`` for
real; anything else still raises the clearly-marked
``NotImplementedError``.

Decode conventions: every decoder returns float64 samples in
[-1, 1); multi-channel WAV is mean-mixed to mono (features are
channel-agnostic). µ-law/A-law decode via 256-entry tables built
from the ITU expansion formulas (bit-exact with the usual reference
tables); encode is the vectorized segment/mantissa compander. IMA
ADPCM is a per-sample state recurrence by construction, so its inner
loop is sequential per spec block (state resets each block header,
so blocks decode independently).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# G.711 µ-law

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def _build_ulaw_decode_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.uint8)
    u = (~codes) & 0xFF
    sign = (u & 0x80) != 0
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    # standard expansion: ((mantissa << 3) + 0x84) << exponent, minus bias
    magnitude = (((mantissa.astype(np.int32) << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
    return np.where(sign, -magnitude, magnitude).astype(np.int16)


_ULAW_DECODE = _build_ulaw_decode_table()


def encode_ulaw(pcm: np.ndarray) -> np.ndarray:
    """Compand int16 PCM to 8-bit µ-law (vectorized)."""
    x = np.asarray(pcm, dtype=np.int32)
    sign = x < 0
    mag = np.where(sign, -x, x)
    mag = np.minimum(mag, _ULAW_CLIP) + _ULAW_BIAS
    # exponent = position of the highest set bit above bit 7
    exponent = np.zeros_like(mag)
    for e in range(7, 0, -1):
        exponent = np.where((mag >> (e + 7)) & 1 != 0, np.maximum(exponent, e), exponent)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    code = (np.where(sign, 0x80, 0) | (exponent << 4) | mantissa).astype(np.uint8)
    return (~code) & 0xFF


def decode_ulaw(data: bytes | np.ndarray) -> np.ndarray:
    """Expand 8-bit µ-law to int16 PCM (table lookup)."""
    codes = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    return _ULAW_DECODE[codes]


# ---------------------------------------------------------------------------
# G.711 A-law


_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def _build_alaw_decode_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.uint8)
    a = codes ^ 0x55
    positive = (a & 0x80) != 0  # sign bit SET means positive in A-law
    exponent = (a >> 4) & 0x07
    mantissa = (a & 0x0F).astype(np.int32)
    mag = np.where(
        exponent == 0,
        (mantissa << 4) + 8,
        ((mantissa << 4) + 0x108) << np.maximum(exponent.astype(np.int32) - 1, 0),
    )
    return np.where(positive, mag, -mag).astype(np.int16)


_ALAW_DECODE = _build_alaw_decode_table()


def encode_alaw(pcm: np.ndarray) -> np.ndarray:
    """Compand int16 PCM to 8-bit A-law (vectorized; 13-bit domain and
    segment ends per the public G.711 reference algorithm)."""
    x13 = np.asarray(pcm, dtype=np.int32) >> 3
    mask = np.where(x13 >= 0, 0xD5, 0x55)
    mag = np.where(x13 >= 0, x13, -x13 - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag, side="left")
    shift = np.where(seg < 2, 1, seg)
    aval = (seg << 4) | ((mag >> shift) & 0x0F)
    code = np.where(seg >= 8, 0x7F, aval) ^ mask
    return code.astype(np.uint8)


def decode_alaw(data: bytes | np.ndarray) -> np.ndarray:
    codes = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    return _ALAW_DECODE[codes]


# ---------------------------------------------------------------------------
# IMA (DVI4) ADPCM — 4-bit, the WAV format-0x11 block layout

_IMA_STEPS = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32,
)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_lanes(nibs: np.ndarray, pred0: np.ndarray, idx0: np.ndarray) -> np.ndarray:
    """Decode L independent ADPCM blocks in lockstep: ``nibs`` is
    (steps, L) uint8 (short lanes zero-padded — callers slice), pred0 /
    idx0 the per-block header state. The recurrence is sequential PER
    SAMPLE but every WAV block restarts its own (predictor, index)
    state, so blocks decode as independent LANES — the Python loop runs
    once per sample POSITION with numpy ops across all blocks of all
    clips in a batch (~47× over the per-sample scalar loop on the
    200-clip feature corpus). Bit-exact with the scalar recurrence
    (same int ops and clamps; round-trip tests unchanged)."""
    steps_n, L = nibs.shape
    out = np.empty((steps_n, L), dtype=np.int16)
    pred = pred0.astype(np.int32).copy()
    idx = idx0.astype(np.int32).copy()
    steps = _IMA_STEPS
    adj = _IMA_INDEX_ADJ
    for i in range(steps_n):
        nib = nibs[i].astype(np.int32)
        step = steps[idx]
        diff = step >> 3
        diff += np.where(nib & 1, step >> 2, 0)
        diff += np.where(nib & 2, step >> 1, 0)
        diff += np.where(nib & 4, step, 0)
        pred = np.where(nib & 8, pred - diff, pred + diff)
        np.clip(pred, -32768, 32767, out=pred)
        idx = np.clip(idx + adj[nib & 7], 0, 88)
        out[i] = pred.astype(np.int16)
    return out


def decode_ima_adpcm_many(streams: list[tuple[bytes, int]]) -> list[np.ndarray]:
    """Decode many mono WAV-layout IMA ADPCM streams at once: every
    block of every stream becomes one lane of :func:`_ima_decode_lanes`
    (`streams` = [(data, block_align), ...])."""
    metas = []  # (stream_idx, pred, idx, nibble array)
    for si, (data, block_align) in enumerate(streams):
        buf = memoryview(data)
        for off in range(0, len(buf) - 3, block_align):
            block = buf[off : off + block_align]
            pred, idx, _ = struct.unpack_from("<hBB", block, 0)
            payload = np.frombuffer(block[4:], dtype=np.uint8)
            nb = np.empty(payload.size * 2, dtype=np.uint8)
            nb[0::2] = payload & 0x0F
            nb[1::2] = payload >> 4
            metas.append((si, pred, idx, nb))
    res: list[list[np.ndarray]] = [[] for _ in streams]
    if metas:
        max_s = max(m[3].size for m in metas)
        nibs = np.zeros((max_s, len(metas)), dtype=np.uint8)
        for k, (_, _, _, nb) in enumerate(metas):
            nibs[: nb.size, k] = nb
        out = _ima_decode_lanes(
            nibs,
            np.array([m[1] for m in metas], np.int32),
            np.array([m[2] for m in metas], np.int32),
        )
        for k, (si, pred, _, nb) in enumerate(metas):
            res[si].append(np.concatenate([[np.int16(pred)], out[: nb.size, k]]))
    return [
        np.concatenate(r) if r else np.empty(0, dtype=np.int16) for r in res
    ]


def _ima_encode_block(pcm: np.ndarray, index: int) -> tuple[bytes, int]:
    """Encode one mono block: 4-byte header (predictor, index) + nibbles.
    Returns (block bytes, final index) so blocks chain the step index."""
    pred = int(pcm[0])
    idx = int(index)
    header = struct.pack("<hBB", pred, idx, 0)
    nibbles = []
    for s in pcm[1:]:
        step = int(_IMA_STEPS[idx])
        delta = int(s) - pred
        nib = 0
        if delta < 0:
            nib = 8
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        # reconstruct exactly as the decoder will
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[nib & 7])))
        nibbles.append(nib)
    if len(nibbles) % 2:
        nibbles.append(0)
    packed = bytes(
        (nibbles[i] & 0x0F) | ((nibbles[i + 1] & 0x0F) << 4)
        for i in range(0, len(nibbles), 2)
    )
    return header + packed, idx


def _split_stereo_adpcm(data: bytes, block_align: int) -> tuple[bytes, bytes, int]:
    """De-interleave a stereo WAV IMA ADPCM stream into two synthetic
    MONO streams (+ their mono block_align) so both ride the
    lane-vectorized decoder unchanged. WAV stereo layout (RIFF spec):
    per block, one 4-byte header per channel (L then R), then the data
    in 4-byte groups alternating L/R — each group holds 8 consecutive
    nibbles of ITS channel."""
    if block_align < 16 or block_align % 8:
        raise ValueError(f"stereo IMA ADPCM block_align {block_align} invalid")
    mono_balign = 4 + (block_align - 8) // 2
    nblk = len(data) // block_align
    outs: list[list[bytes]] = [[], []]
    if nblk:
        blk = np.frombuffer(data, np.uint8, count=nblk * block_align).reshape(
            nblk, block_align
        )
        groups = blk[:, 8:].reshape(nblk, -1, 2, 4)  # (blk, pair, chan, 4B)
        for c in (0, 1):
            mono = np.concatenate(
                [blk[:, 4 * c : 4 * c + 4], groups[:, :, c, :].reshape(nblk, -1)],
                axis=1,
            )
            outs[c].append(mono.tobytes())
    tail = data[nblk * block_align :]
    if len(tail) >= 8:  # partial final block: split what's there
        td = np.frombuffer(tail, np.uint8)
        pairs = (len(td) - 8) // 8
        g = td[8 : 8 + pairs * 8].reshape(pairs, 2, 4)
        rem = td[8 + pairs * 8 :]  # a lone 4-byte group belongs to L
        outs[0].append(td[0:4].tobytes() + g[:, 0, :].tobytes() + rem[: len(rem) // 4 * 4].tobytes())
        outs[1].append(td[4:8].tobytes() + g[:, 1, :].tobytes())
    return b"".join(outs[0]), b"".join(outs[1]), mono_balign


def decode_ima_adpcm(data: bytes, block_align: int, channels: int = 1) -> np.ndarray:
    """Decode a WAV-layout IMA ADPCM stream. Mono returns the samples;
    stereo de-interleaves the per-block 4-byte channel groups into two
    synthetic mono streams (:func:`_split_stereo_adpcm`), decodes both
    through the same lane-vectorized recurrence, and returns standard
    interleaved [L0, R0, L1, R1, …] int16 PCM (callers downmix like any
    multi-channel PCM)."""
    if channels == 1:
        return decode_ima_adpcm_many([(data, block_align)])[0]
    if channels != 2:
        raise NotImplementedError("IMA ADPCM: only mono/stereo streams supported")
    ld, rd, mb = _split_stereo_adpcm(data, block_align)
    left, right = decode_ima_adpcm_many([(ld, mb), (rd, mb)])
    n = min(len(left), len(right))
    return np.stack([left[:n], right[:n]], axis=1).ravel()


def encode_ima_adpcm(pcm: np.ndarray, block_align: int = 1024) -> bytes:
    """Encode mono int16 PCM to WAV-layout IMA ADPCM blocks."""
    pcm = np.asarray(pcm, dtype=np.int16)
    samples_per_block = (block_align - 4) * 2 + 1
    out = []
    idx = 0
    for off in range(0, len(pcm), samples_per_block):
        chunk = pcm[off : off + samples_per_block]
        if len(chunk) < samples_per_block:
            chunk = np.concatenate([chunk, np.zeros(samples_per_block - len(chunk), dtype=np.int16)])
        block, idx = _ima_encode_block(chunk, idx)
        out.append(block)
    return b"".join(out)


def encode_ima_adpcm_stereo(pcm_lr: np.ndarray, block_align: int = 1024) -> bytes:
    """Encode (n, 2) int16 PCM to stereo WAV-layout IMA ADPCM: each
    channel encodes independently (chained step index, same scalar
    reference as mono), then blocks interleave as L-header, R-header,
    alternating 4-byte data groups — the layout
    :func:`_split_stereo_adpcm` inverts."""
    pcm_lr = np.asarray(pcm_lr, dtype=np.int16)
    if pcm_lr.ndim != 2 or pcm_lr.shape[1] != 2:
        raise ValueError("encode_ima_adpcm_stereo expects shape (n, 2)")
    if block_align < 16 or block_align % 8:
        raise ValueError(f"stereo IMA ADPCM block_align {block_align} invalid")
    mono_balign = 4 + (block_align - 8) // 2
    samples_per_block = (mono_balign - 4) * 2 + 1
    out = []
    idx = [0, 0]
    for off in range(0, len(pcm_lr), samples_per_block):
        parts = []
        for c in (0, 1):
            chunk = pcm_lr[off : off + samples_per_block, c]
            if len(chunk) < samples_per_block:
                chunk = np.concatenate(
                    [chunk, np.zeros(samples_per_block - len(chunk), dtype=np.int16)]
                )
            block, idx[c] = _ima_encode_block(chunk, idx[c])
            parts.append(block)
        hl, hr = parts[0][:4], parts[1][:4]
        gl = np.frombuffer(parts[0][4:], np.uint8).reshape(-1, 4)
        gr = np.frombuffer(parts[1][4:], np.uint8).reshape(-1, 4)
        inter = np.stack([gl, gr], axis=1).reshape(-1)
        out.append(hl + hr + inter.tobytes())
    return b"".join(out)


# ---------------------------------------------------------------------------
# RIFF/WAVE container

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_IMA_ADPCM = 0x0011


def _parse_wav(data: bytes) -> tuple[int, int, int, int, int, bytes]:
    """RIFF/WAVE container walk → (tag, channels, rate, balign, bits,
    raw data-chunk bytes). Chunks by declared size (fmt anywhere before
    data, unknown chunks skipped, word-aligned)."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid, csz = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            tag, channels, rate, _brate, balign, bits = struct.unpack_from("<HHIIHH", body, 0)
            fmt = (tag, channels, rate, balign, bits)
        elif cid == b"data":
            raw = body
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAVE payload missing fmt/data chunk")
    tag, channels, rate, balign, bits = fmt
    return tag, channels, rate, balign, bits, raw


def _decode_wav_parsed(tag, channels, rate, balign, bits, raw) -> tuple[np.ndarray, int]:
    if tag == WAVE_FORMAT_PCM and bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif tag == WAVE_FORMAT_PCM and bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif tag == WAVE_FORMAT_MULAW:
        x = decode_ulaw(raw).astype(np.float64) / 32768.0
    elif tag == WAVE_FORMAT_ALAW:
        x = decode_alaw(raw).astype(np.float64) / 32768.0
    elif tag == WAVE_FORMAT_IMA_ADPCM:
        # mono → samples; stereo → interleaved LRLR…, downmixed below
        # like any multi-channel PCM
        x = decode_ima_adpcm(raw, balign, channels).astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(f"WAVE format tag 0x{tag:04x} not supported")
    if channels > 1:
        n = (len(x) // channels) * channels
        x = x[:n].reshape(-1, channels).mean(axis=1)
    return x, rate


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE payload → (mono float64 samples in [-1, 1),
    sample_rate), handling PCM8/PCM16, A-law, µ-law and mono/stereo
    IMA ADPCM format tags (stereo downmixes like multi-channel PCM)."""
    return _decode_wav_parsed(*_parse_wav(data))


def decode_wav_batch(datas: list[bytes]) -> list:
    """Decode many WAVE payloads, batching every IMA ADPCM stream
    (stereo split into L/R lanes) through the lane-vectorized
    recurrence (:func:`_ima_decode_lanes`)
    — the sequential per-sample loop runs once per sample POSITION for
    the whole batch instead of once per sample per clip. Returns one
    entry per payload: ``(samples, rate)`` on success or the caught
    ``Exception`` instance (callers decide strictness per row)."""
    out: list = [None] * len(datas)
    parsed: dict[int, tuple] = {}
    for i, d in enumerate(datas):
        try:
            parsed[i] = _parse_wav(d)
        except Exception as e:  # malformed container: per-row verdict
            out[i] = e
    # every ADPCM stream in the batch — stereo split into two mono
    # streams (L, R) — decodes as lanes of ONE recurrence run
    streams: list[tuple[bytes, int]] = []
    owners: list[tuple[int, int]] = []  # (item idx, channel)
    for i, p in parsed.items():
        if p[0] != WAVE_FORMAT_IMA_ADPCM or p[1] not in (1, 2):
            continue
        try:
            if p[1] == 1:
                streams.append((p[5], p[3]))
                owners.append((i, 0))
            else:
                ld, rd, mb = _split_stereo_adpcm(p[5], p[3])
                streams += [(ld, mb), (rd, mb)]
                owners += [(i, 0), (i, 1)]
        except Exception as e:  # malformed block layout: per-row verdict
            out[i] = e
    if streams:
        dec = decode_ima_adpcm_many(streams)
        chans: dict[int, list[np.ndarray]] = {}
        for (i, c), x in zip(owners, dec):
            chans.setdefault(i, []).append(x)
        for i, xs in chans.items():
            if len(xs) == 1:
                x = xs[0].astype(np.float64) / 32768.0
            else:
                n = min(len(xs[0]), len(xs[1]))
                x = (
                    xs[0][:n].astype(np.float64) + xs[1][:n].astype(np.float64)
                ) / 2.0 / 32768.0  # downmix == _decode_wav_parsed's mean
            out[i] = (x, parsed[i][2])
    for i, p in parsed.items():
        if out[i] is None:
            try:
                out[i] = _decode_wav_parsed(*p)
            except Exception as e:
                out[i] = e
    return out


def _wav_container(tag: int, channels: int, rate: int, bits: int, balign: int, payload: bytes) -> bytes:
    brate = rate * balign if tag == WAVE_FORMAT_IMA_ADPCM else rate * channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", tag, channels, rate, brate, balign, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_pcm16(pcm: np.ndarray, rate: int) -> bytes:
    pcm = np.asarray(pcm, dtype="<i2")
    return _wav_container(WAVE_FORMAT_PCM, 1, rate, 16, 2, pcm.tobytes())


def encode_wav_ulaw(pcm: np.ndarray, rate: int) -> bytes:
    return _wav_container(WAVE_FORMAT_MULAW, 1, rate, 8, 1, encode_ulaw(pcm).tobytes())


def encode_wav_alaw(pcm: np.ndarray, rate: int) -> bytes:
    return _wav_container(WAVE_FORMAT_ALAW, 1, rate, 8, 1, encode_alaw(pcm).tobytes())


def encode_wav_adpcm(pcm: np.ndarray, rate: int, block_align: int = 1024) -> bytes:
    payload = encode_ima_adpcm(pcm, block_align)
    return _wav_container(WAVE_FORMAT_IMA_ADPCM, 1, rate, 4, block_align, payload)


def encode_wav_adpcm_stereo(pcm_lr: np.ndarray, rate: int, block_align: int = 1024) -> bytes:
    payload = encode_ima_adpcm_stereo(pcm_lr, block_align)
    return _wav_container(WAVE_FORMAT_IMA_ADPCM, 2, rate, 4, block_align, payload)


# --------------------------------------------------------------- AIFF
def _ext80_encode(rate: float) -> bytes:
    """IEEE 754 80-bit extended float, the AIFF COMM sampleRate type:
    1 sign bit, 15-bit exponent (bias 16383), 64-bit mantissa with an
    EXPLICIT integer bit. Positive rates only (sample rates)."""
    if rate <= 0:
        raise ValueError("sample rate must be positive")
    import math

    m, e = math.frexp(rate)  # rate = m * 2**e, m in [0.5, 1)
    exp = e - 1 + 16383
    mant = int(m * (1 << 64))  # top bit set because m >= 0.5
    return struct.pack(">H", exp) + struct.pack(">Q", mant)


def _ext80_decode(b: bytes) -> float:
    (exp,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if exp & 0x8000 else 1.0
    exp &= 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def encode_aiff_pcm16(pcm: np.ndarray, rate: int) -> bytes:
    """Mono 16-bit AIFF (big-endian IFF FORM/AIFF with COMM + SSND)."""
    pcm = np.asarray(pcm, dtype=np.int16)
    comm = struct.pack(">hIh", 1, len(pcm), 16) + _ext80_encode(float(rate))
    ssnd = struct.pack(">II", 0, 0) + pcm.astype(">i2").tobytes()
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        chunks += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


def decode_aiff(data: bytes) -> tuple[np.ndarray, int]:
    """AIFF → (mono float64 samples in [-1, 1), rate). 8/16-bit PCM;
    multi-channel is mean-mixed to mono like the WAV path."""
    if len(data) < 12 or data[:4] != b"FORM" or data[8:12] != b"AIFF":
        raise ValueError("not an AIFF payload")
    pos = 12
    comm = ssnd = None
    while pos + 8 <= len(data):
        cid, csz = struct.unpack_from(">4sI", data, pos)
        body = data[pos + 8 : pos + 8 + csz]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + csz + (csz & 1)
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    channels, nframes, bits = struct.unpack(">hIh", comm[:8])
    rate = int(round(_ext80_decode(comm[8:18])))
    off, _blk = struct.unpack(">II", ssnd[:8])
    raw = ssnd[8 + off :]
    if bits == 16:
        x = np.frombuffer(raw, dtype=">i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = np.frombuffer(raw, dtype=np.int8).astype(np.float64) / 128.0
    else:
        raise NotImplementedError(f"AIFF {bits}-bit PCM not supported")
    if channels > 1:
        n = (len(x) // channels) * channels
        x = x[:n].reshape(-1, channels).mean(axis=1)
    return x, rate


# ----------------------------------------------------------------- AU
_AU_ULAW, _AU_PCM8, _AU_PCM16 = 1, 2, 3


def encode_au_ulaw(pcm: np.ndarray, rate: int) -> bytes:
    """Sun/NeXT .au: big-endian header, µ-law payload (encoding 1)."""
    payload = encode_ulaw(pcm).tobytes()
    head = b".snd" + struct.pack(">IIIII", 24, len(payload), _AU_ULAW, rate, 1)
    return head + payload


def encode_au_pcm16(pcm: np.ndarray, rate: int) -> bytes:
    payload = np.asarray(pcm, dtype=">i2").tobytes()
    head = b".snd" + struct.pack(">IIIII", 24, len(payload), _AU_PCM16, rate, 1)
    return head + payload


def decode_au(data: bytes) -> tuple[np.ndarray, int]:
    """Sun/NeXT .au → (mono float64 in [-1, 1), rate). Encodings 1
    (µ-law), 2 (linear PCM8) and 3 (linear PCM16 BE); variable data
    offset honored; multi-channel mean-mixed."""
    if len(data) < 24 or data[:4] != b".snd":
        raise ValueError("not an AU payload")
    off, size, enc, rate, channels = struct.unpack(">IIIII", data[4:24])
    end = len(data) if size in (0, 0xFFFFFFFF) else min(len(data), off + size)
    raw = data[off:end]
    if enc == _AU_ULAW:
        x = decode_ulaw(raw).astype(np.float64) / 32768.0
    elif enc == _AU_PCM8:
        x = np.frombuffer(raw, dtype=np.int8).astype(np.float64) / 128.0
    elif enc == _AU_PCM16:
        x = np.frombuffer(raw, dtype=">i2").astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(f"AU encoding {enc} not supported")
    if channels > 1:
        n = (len(x) // channels) * channels
        x = x[:n].reshape(-1, channels).mean(axis=1)
    return x, rate
