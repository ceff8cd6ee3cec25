"""Stdlib PCM WAV decode (functions/audio.py) and its wiring into
audio_features: WAVs BUILT with the stdlib wave module decode for
real (rate/frames/rms), non-RIFF bytes keep the documented fake, and
corrupt RIFF rows degrade to zeros instead of failing the job."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
import pytest

from umls2rdf_spark.functions.audio import decode_wav


def _make_wav(rate=8000, nch=1, bits=16, seconds=0.05, freq=440.0):
    n = int(rate * seconds)
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(nch)
    w.setsampwidth(bits // 8)
    w.setframerate(rate)
    amp = (1 << (bits - 1)) - 1
    frames = bytearray()
    for i in range(n):
        v = int(amp * math.sin(2 * math.pi * freq * i / rate))
        for _ in range(nch):
            if bits == 8:
                frames += bytes([v + 128])  # 8-bit WAV is unsigned
            else:
                frames += int(v).to_bytes(bits // 8, "little", signed=True)
    w.writeframes(bytes(frames))
    w.close()
    return buf.getvalue(), n


def test_decode_wav_sine_rms():
    """A full-scale sine has rms 1/sqrt(2); the decoder must land on
    it for 16-bit mono, stereo, and 8-bit variants."""
    for nch, bits in [(1, 16), (2, 16), (1, 8)]:
        b, n = _make_wav(nch=nch, bits=bits)
        rate, frames, rms = decode_wav(b)
        assert rate == 8000 and frames == n
        assert abs(rms - 1 / math.sqrt(2)) < 0.02, (nch, bits, rms)


def test_decode_wav_float32():
    """IEEE-float WAV via a hand-built RIFF (wave can't write it)."""
    samples = np.sin(np.linspace(0, 20 * np.pi, 400)).astype("<f4")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    b = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, frames, rms = decode_wav(b)
    assert rate == 16000 and frames == 400
    assert abs(rms - float(np.sqrt((samples.astype(float) ** 2).mean()))) < 1e-9


def test_decode_wav_rejections():
    with pytest.raises(NotImplementedError, match="RIFF"):
        decode_wav(b"not audio at all")
    b, _ = _make_wav()
    with pytest.raises(ValueError):
        decode_wav(b[:16])  # RIFF header but no fmt/data


def test_audio_features_real_wav_decode(spark):
    """audio_features uses the stdlib path for RIFF bytes: real
    rate/frames/rms; corrupt RIFF degrades to zeros; non-RIFF keeps
    the deterministic fake (non-zero hash-derived values)."""
    from umls2rdf_spark.operators.multimodal import audio_features

    good, n = _make_wav(rate=8000, bits=16)
    rows = [
        (1, good, ("audio/wav", "t")),
        (2, b"RIFF\x10\x00\x00\x00WAVEjunk", ("audio/wav", "t")),
        (3, b"OGGSnotawav", ("audio/ogg", "t")),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, content binary, "
        "meta struct<mime:string,source:string>",
    )
    out = {r["media_id"]: r for r in audio_features(df).collect()}
    assert out[1]["sample_rate"] == 8000
    assert out[1]["n_samples"] == n
    assert abs(out[1]["rms"] - 1 / math.sqrt(2)) < 0.02
    assert out[2]["sample_rate"] == 0 and out[2]["n_samples"] == 0
    assert out[3]["sample_rate"] in (8000, 16000, 22050, 44100)
