"""Pure-stdlib PCM WAV decode for the multimodal audio operators —
the audio counterpart of functions/png.py + functions/jpeg.py: the
dominant simple format decodes for REAL in dependency-less
containers; everything else keeps the explicit fallback contract.

Supports integer PCM (8/16/24/32-bit) and IEEE float (32/64-bit)
RIFF/WAVE via the stdlib ``wave`` module where possible and a direct
RIFF parse for the float formats ``wave`` rejects. Returns
(sample_rate, n_samples, rms) with rms normalized to [0, 1]
full-scale — deterministic integer/float math, no resampling.

No Spark imports; register_pickle_by_value'd by callers
(operators/pq.py pattern)."""

from __future__ import annotations


def decode_wav(b: bytes):
    """WAV bytes → (sample_rate, n_samples, rms). ``n_samples`` is
    per-channel frame count; ``rms`` pools all channels, full-scale
    normalized. Raises NotImplementedError for non-RIFF bytes or
    unsupported codecs; ValueError for truncated/corrupt streams."""
    import struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            "stdlib codec supports RIFF/WAVE audio bytes only "
            "(install soundfile for other formats)"
        )
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            code, nch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            # WAVE_FORMAT_EXTENSIBLE: real code in the GUID prefix
            if code == 0xFFFE and len(body) >= 26:
                (code,) = struct.unpack("<H", body[24:26])
            fmt = (code, nch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    code, nch, rate, bits = fmt
    if nch == 0 or rate == 0:
        raise ValueError("WAV with zero channels or rate")
    if code == 1:  # integer PCM
        if bits == 8:
            arr = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                - 128.0
            ) / 128.0
        elif bits == 16:
            arr = (
                np.frombuffer(
                    data[: len(data) // 2 * 2], dtype="<i2"
                ).astype(np.float64)
                / 32768.0
            )
        elif bits == 24:
            raw = np.frombuffer(
                data[: len(data) // 3 * 3], dtype=np.uint8
            ).reshape(-1, 3).astype(np.int64)
            v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            v = np.where(v >= (1 << 23), v - (1 << 24), v)
            arr = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            arr = (
                np.frombuffer(
                    data[: len(data) // 4 * 4], dtype="<i4"
                ).astype(np.float64)
                / float(1 << 31)
            )
        else:
            raise NotImplementedError(
                f"stdlib codec: {bits}-bit integer PCM not supported"
            )
    elif code == 3:  # IEEE float
        if bits == 32:
            arr = np.frombuffer(
                data[: len(data) // 4 * 4], dtype="<f4"
            ).astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(
                data[: len(data) // 8 * 8], dtype="<f8"
            ).astype(np.float64)
        else:
            raise NotImplementedError(
                f"stdlib codec: {bits}-bit float PCM not supported"
            )
    else:
        raise NotImplementedError(
            f"stdlib codec: WAV format code {code} not supported "
            "(integer/float PCM only — no ADPCM/mp3-in-wav)"
        )
    n_frames = arr.shape[0] // nch
    arr = arr[: n_frames * nch]
    rms = float(np.sqrt((arr ** 2).mean())) if arr.size else 0.0
    return int(rate), int(n_frames), rms
