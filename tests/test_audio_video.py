"""From-scratch audio (RIFF/WAV, G.711, IMA ADPCM) and video (MJPEG)
codecs + their actor-pool stages. These close the compressed audio /
video env-stubs: the feature and frame-sampling stages now decode
real compressed payloads (reference parity target: the multimodal
decode invariant from the task brief — PSNR ≥ 40 dB for lossy image
paths, bounded SNR for companded audio)."""

import numpy as np
import pyarrow as pa
import pytest


def _tone(n=16000, rate=16000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = (
        9000 * np.sin(2 * np.pi * 440 * t / rate)
        + 4000 * np.sin(2 * np.pi * 97 * t / rate)
        + rng.normal(0, 300, n)
    )
    return x.astype(np.int16)


def _snr_db(ref, dec):
    ref = np.asarray(ref, dtype=np.float64)
    dec = np.asarray(dec, dtype=np.float64)[: len(ref)]
    return 10 * np.log10(np.sum(ref**2) / max(np.sum((ref - dec) ** 2), 1e-9))


def test_g711_spec_anchors_and_idempotence():
    """Decode tables match the published G.711 expansion values at the
    corner codes, and decode∘encode is the identity on every decoded
    codeword (the compander fixpoint property) for all 256 codes."""
    from raydedup import audio

    # µ-law: 0xFF (and 0x7F) are ±0; 0x80/0x00 are the ±32124 extremes
    assert audio._ULAW_DECODE[0xFF] == 0 and audio._ULAW_DECODE[0x7F] == 0
    assert audio._ULAW_DECODE[0x80] == 32124 and audio._ULAW_DECODE[0x00] == -32124
    # A-law: 0xD5/0x55 are ±8 (smallest magnitudes); extremes ±32256
    assert audio._ALAW_DECODE[0xD5] == 8 and audio._ALAW_DECODE[0x55] == -8
    assert audio._ALAW_DECODE.max() == 32256 and audio._ALAW_DECODE.min() == -32256
    for enc, table in (
        (audio.encode_ulaw, audio._ULAW_DECODE),
        (audio.encode_alaw, audio._ALAW_DECODE),
    ):
        dec = table.astype(np.int16)
        again = table[enc(dec)]
        assert np.array_equal(again, dec)


def test_g711_and_adpcm_snr():
    from raydedup import audio

    pcm = _tone()
    assert _snr_db(pcm, audio.decode_ulaw(audio.encode_ulaw(pcm))) > 35.0
    assert _snr_db(pcm, audio.decode_alaw(audio.encode_alaw(pcm))) > 35.0
    blob = audio.encode_ima_adpcm(pcm, block_align=1024)
    assert len(blob) < 0.27 * 2 * len(pcm)  # ~4:1 vs PCM16
    assert _snr_db(pcm, audio.decode_ima_adpcm(blob, 1024)) > 25.0


def test_decode_wav_batch_matches_scalar():
    """The lane-vectorized batch path must be BIT-EXACT with per-payload
    decode_wav for every format tag (the ADPCM lanes recurrence mirrors
    the scalar ops), and malformed payloads come back as in-band
    exception entries without failing the batch."""
    from raydedup import audio

    pcm = _tone()
    payloads = [
        audio.encode_wav_pcm16(pcm, 16000),
        audio.encode_wav_ulaw(pcm, 8000),
        audio.encode_wav_alaw(pcm, 8000),
        audio.encode_wav_adpcm(pcm, 16000, block_align=256),
        audio.encode_wav_adpcm(pcm[: len(pcm) // 3], 16000, block_align=1024),
    ]
    got = audio.decode_wav_batch(payloads + [b"not a wav"])
    for d, g in zip(payloads, got):
        x, rate = audio.decode_wav(d)
        assert np.array_equal(g[0], x) and g[1] == rate
    assert isinstance(got[-1], Exception)


def test_wav_container_all_format_tags():
    from raydedup import audio

    pcm = _tone()
    bars = {"pcm16": 90.0, "ulaw": 35.0, "alaw": 35.0, "adpcm": 25.0}
    encoders = {
        "pcm16": audio.encode_wav_pcm16,
        "ulaw": audio.encode_wav_ulaw,
        "alaw": audio.encode_wav_alaw,
        "adpcm": audio.encode_wav_adpcm,
    }
    for name, enc in encoders.items():
        x, rate = audio.decode_wav(enc(pcm, 16000))
        assert rate == 16000
        assert _snr_db(pcm / 32768.0, x) > bars[name], name


def test_wav_chunk_walk_and_stereo_mix():
    """The RIFF walker must skip unknown chunks (by declared size, with
    word alignment) and mean-mix multi-channel data to mono."""
    import struct

    from raydedup import audio

    pcm = _tone(n=1000)
    blob = audio.encode_wav_pcm16(pcm, 8000)
    # splice an odd-sized unknown chunk between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = blob[:12] + junk + blob[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    x, rate = audio.decode_wav(spliced)
    assert rate == 8000 and len(x) == len(pcm)
    assert _snr_db(pcm / 32768.0, x) > 90.0

    # stereo: L = tone, R = -tone ⇒ mono mix ≈ 0
    stereo = np.empty(2 * len(pcm), dtype=np.int16)
    stereo[0::2] = pcm
    stereo[1::2] = -pcm
    payload = stereo.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    x, _ = audio.decode_wav(wav)
    assert np.abs(x).max() <= 1.0 / 32768.0 + 1e-12


def _smooth_frames(n, w=48, h=32, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        y, x = np.mgrid[0:h, 0:w]
        base = 128 + 60 * np.sin(x / 7.0 + i * 0.5) + 50 * np.cos(y / 5.0 - i * 0.3)
        f = np.stack([base, np.roll(base, i, axis=1), base[::-1]], axis=-1)
        out.append(np.clip(f + rng.normal(0, 2, f.shape), 0, 255).astype(np.uint8))
    return out


def test_mjpeg_split_roundtrip_psnr():
    from raydedup.media import psnr
    from raydedup.video import (
        decode_mjpeg_frame,
        encode_mjpeg,
        mjpeg_frame_offsets,
        split_mjpeg,
    )

    frames = _smooth_frames(7)
    blob = encode_mjpeg(frames, quality=90)
    parts = split_mjpeg(blob)
    assert len(parts) == 7 and b"".join(parts) == blob
    offs = mjpeg_frame_offsets(blob)
    assert [blob[a:b] for a, b in offs] == parts
    for f, part in zip(frames, parts):
        dec = decode_mjpeg_frame(part)
        assert dec.shape == f.shape
        assert psnr(f, dec) >= 40.0  # the brief's lossy invariant

    with pytest.raises(ValueError):
        split_mjpeg(blob[:-1])  # truncated EOI must not silently pass


def test_audio_feature_stage_compressed_codecs(ray_session):
    """The audio actor-pool stage decodes wav (ADPCM tag) and raw ulaw
    payloads for real — matching features with the pcm16 path."""
    import ray.data as rd

    from raydedup import audio
    from raydedup.stages.media import AudioFeatureStage

    pcm = _tone()
    t = pa.table(
        {
            "audio_id": pa.array(["pcm", "wav", "ulaw"], pa.string()),
            "bytes": pa.array(
                [
                    pcm.tobytes(),
                    audio.encode_wav_adpcm(pcm, 16000),
                    audio.encode_ulaw(pcm).tobytes(),
                ],
                pa.binary(),
            ),
            "sample_rate": pa.array([16000] * 3, pa.int32()),
            "n_samples": pa.array([len(pcm)] * 3, pa.int32()),
            "codec": pa.array(["pcm16", "wav", "ulaw"], pa.string()),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            AudioFeatureStage,
            batch_format="pyarrow",
            batch_size=16,
            concurrency=(1, 2),
            num_cpus=1,
        )
        .take_all()
    )
    by_id = {r["audio_id"]: r for r in out}
    assert all(r["decode_ok"] for r in out)
    ref_rms = by_id["pcm"]["rms"]
    assert abs(by_id["wav"]["rms"] - ref_rms) < 0.02 * ref_rms
    assert abs(by_id["ulaw"]["rms"] - ref_rms) < 0.02 * ref_rms


def test_frame_sample_stage_mjpeg(ray_session):
    """mjpeg payloads flat-map into decoded raw-RGB frame rows with the
    same layout as rawvideo; per-frame PSNR meets the lossy bar."""
    import ray.data as rd

    from raydedup.media import psnr
    from raydedup.stages.media import FrameSampleStage
    from raydedup.video import encode_mjpeg

    frames = _smooth_frames(25)
    blob = encode_mjpeg(frames, quality=90)
    t = pa.table(
        {
            "video_id": pa.array(["m0"], pa.string()),
            "bytes": pa.array([blob], pa.binary()),
            "w": pa.array([48], pa.int32()),
            "h": pa.array([32], pa.int32()),
            "n_frames": pa.array([25], pa.int32()),
            "codec": pa.array(["mjpeg"], pa.string()),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs=dict(every_n=10, max_frames=4),
            batch_format="pyarrow",
            batch_size=8,
            concurrency=(1, 2),
            num_cpus=1,
        )
        .take_all()
    )
    assert [r["frame_idx"] for r in out] == [0, 10, 20]
    for r in out:
        assert (r["w"], r["h"]) == (48, 32)
        dec = np.frombuffer(r["frame_bytes"], dtype=np.uint8).reshape(32, 48, 3)
        assert psnr(frames[r["frame_idx"]], dec) >= 40.0


def test_aiff_and_au_round_trips():
    """AIFF (big-endian IFF, 80-bit extended sample rate) and Sun/NeXT
    AU containers: lossless PCM16 round trips; AU µ-law matches the
    raw µ-law kernel; ext80 is exact for every standard rate."""
    import numpy as np

    from raydedup.audio import (
        _ext80_decode,
        _ext80_encode,
        decode_aiff,
        decode_au,
        decode_ulaw,
        encode_aiff_pcm16,
        encode_au_pcm16,
        encode_au_ulaw,
        encode_ulaw,
    )

    for r in (8000, 11025, 16000, 22050, 44100, 48000, 96000):
        assert _ext80_decode(_ext80_encode(float(r))) == float(r)
    rng = np.random.default_rng(3)
    pcm = rng.integers(-20000, 20000, 4321).astype(np.int16)
    x, r = decode_aiff(encode_aiff_pcm16(pcm, 16000))
    assert r == 16000 and np.array_equal(x, pcm.astype(np.float64) / 32768.0)
    x, r = decode_au(encode_au_pcm16(pcm, 44100))
    assert r == 44100 and np.array_equal(x, pcm.astype(np.float64) / 32768.0)
    x, r = decode_au(encode_au_ulaw(pcm, 8000))
    ref = decode_ulaw(encode_ulaw(pcm).tobytes()).astype(np.float64) / 32768.0
    assert r == 8000 and np.array_equal(x, ref)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_aiff(b"FORM\x00\x00\x00\x04WAVE")
    with _pytest.raises(ValueError):
        decode_au(b"nots" + b"\x00" * 24)


def test_avi_mjpeg_container():
    """RIFF/AVI container walk: chunked MJPG frames come back exactly
    (no marker scanning), header dims/fps parse, and non-MJPG video
    fourccs raise the env-stub error."""
    import numpy as np
    import pytest as _pytest

    from raydedup.media import psnr
    from raydedup.video import (
        decode_mjpeg_frame,
        encode_avi_mjpeg,
        parse_avi_mjpeg,
    )

    rng = np.random.default_rng(7)
    frames = [
        np.clip(np.cumsum(rng.integers(-2, 3, (24, 32, 3)), axis=1), 0, 255).astype(
            np.uint8
        )
        for _ in range(6)
    ]
    avi = encode_avi_mjpeg(frames, fps=10, quality=90)
    fs, w, h, fps = parse_avi_mjpeg(avi)
    assert (len(fs), w, h, fps) == (6, 32, 24, 10)
    for payload, orig in zip(fs, frames):
        assert psnr(decode_mjpeg_frame(payload), orig) > 40.0
    with _pytest.raises(ValueError):
        parse_avi_mjpeg(b"RIFF\x00\x00\x00\x04WAVE")
    bad = avi.replace(b"MJPG", b"H264", 1)  # strh fourcc
    with _pytest.raises(NotImplementedError):
        parse_avi_mjpeg(bad)


def test_frame_stage_handles_avi(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydedup.media import phash64
    from raydedup.stages.media import FrameSampleStage
    from raydedup.synth import make_videos_table

    table = make_videos_table(n=8)
    codecs = table.column("codec").to_pylist()
    assert "avi" in codecs  # the cycle must include the container path
    out = rd.from_arrow(table).map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"every_n": 5, "max_frames": 4, "strict": True},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=(1, 2),
        num_cpus=1,
    ).take_all()
    stored = {
        vid: ph
        for vid, ph in zip(
            table.column("video_id").to_pylist(),
            table.column("frame_phashes").to_pylist(),
        )
    }
    per_vid: dict = {}
    for row in out:
        w, h = row["w"], row["h"]
        px = np.frombuffer(row["frame_bytes"], np.uint8).reshape(h, w, 3)
        per_vid.setdefault(row["video_id"], []).append(phash64(px))
    for vid, phs in per_vid.items():
        assert phs == stored[vid][: len(phs)], vid


def _scalar_ima_decode(data: bytes, block_align: int) -> np.ndarray:
    """Per-sample scalar IMA ADPCM reference (mono layout)."""
    import struct

    from raydedup.audio import _IMA_INDEX_ADJ, _IMA_STEPS

    out = []
    for off in range(0, len(data) - 3, block_align):
        block = data[off : off + block_align]
        pred, idx, _ = struct.unpack_from("<hBB", block, 0)
        out.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = int(_IMA_STEPS[idx])
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
                out.append(pred)
    return np.array(out, dtype=np.int16)


def test_stereo_adpcm_roundtrip_bit_exact():
    """Stereo WAV IMA ADPCM: the de-interleave + lane decode must be
    bit-exact with decoding each channel's blocks by the scalar
    reference recurrence, and the downmixed decode_wav output must be
    the exact mean of the per-channel decodes."""
    from raydedup import audio

    n = 5000
    t = np.arange(n)
    left = (12000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    right = (9000 * np.sin(2 * np.pi * 660 * t / 16000 + 0.7)).astype(np.int16)
    pcm = np.stack([left, right], axis=1)
    for balign in (256, 1024):
        blob = audio.encode_ima_adpcm_stereo(pcm, block_align=balign)
        assert len(blob) % balign == 0
        # channel split == scalar per-channel decode
        ld, rd, mb = audio._split_stereo_adpcm(blob, balign)
        gl, gr = audio.decode_ima_adpcm_many([(ld, mb), (rd, mb)])
        assert np.array_equal(gl, _scalar_ima_decode(ld, mb))
        assert np.array_equal(gr, _scalar_ima_decode(rd, mb))
        # interleaved public API
        inter = audio.decode_ima_adpcm(blob, balign, channels=2)
        assert np.array_equal(inter[0::2], gl) and np.array_equal(inter[1::2], gr)
        # lossy round-trip fidelity per channel
        assert _snr_db(left / 32768.0, gl / 32768.0) > 25.0
        assert _snr_db(right / 32768.0, gr / 32768.0) > 25.0
        # container path downmixes exactly like multi-channel PCM
        x, rate = audio.decode_wav(audio.encode_wav_adpcm_stereo(pcm, 16000, balign))
        want = (gl.astype(np.float64) + gr.astype(np.float64)) / 2.0 / 32768.0
        assert rate == 16000 and np.allclose(x, want[: len(x)], atol=0, rtol=0)


def test_stereo_adpcm_batch_matches_scalar():
    """decode_wav_batch lane-batches stereo streams (two lanes per clip)
    bit-exactly vs per-payload decode_wav, mixed with mono payloads."""
    from raydedup import audio

    pcm = _tone()
    lr = np.stack([pcm, pcm[::-1].copy()], axis=1)
    payloads = [
        audio.encode_wav_adpcm_stereo(lr, 16000, block_align=256),
        audio.encode_wav_adpcm(pcm, 16000, block_align=1024),
        audio.encode_wav_adpcm_stereo(lr[: len(lr) // 3], 16000, block_align=1024),
        audio.encode_wav_pcm16(pcm, 16000),
    ]
    got = audio.decode_wav_batch(payloads)
    for d, g in zip(payloads, got):
        x, rate = audio.decode_wav(d)
        assert np.array_equal(g[0], x) and g[1] == rate
