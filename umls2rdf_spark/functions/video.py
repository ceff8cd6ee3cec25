"""Pure-stdlib MJPEG-AVI frame access for the multimodal operators —
the video counterpart of functions/png.py / jpeg.py / audio.py: the
simplest real container+codec combination (RIFF AVI holding one JPEG
per frame) parses and decodes for REAL in dependency-less containers,
so frame sampling and per-frame features run on actual pixel data;
every other container keeps the explicit contract
(``NotImplementedError`` with a clear message).

The parser walks RIFF chunks recursively (LIST nesting, word
alignment) and collects compressed-video chunks (``##dc``/``##db``)
in stream order — it deliberately needs no index (`idx1`) and no
header interpretation, so truncated-but-playable files still yield
their frames. Frame bytes are decoded by functions/jpeg.py.

No Spark imports; register_pickle_by_value'd by callers."""

from __future__ import annotations


def mjpeg_frames(b: bytes) -> list[bytes]:
    """AVI bytes → list of per-frame JPEG byte strings, in stream
    order. Raises NotImplementedError for non-AVI bytes; tolerates
    missing index/trailing truncation (frames found so far are
    returned only if the RIFF structure stays well-formed)."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError(
            "stdlib codec supports RIFF/AVI (MJPEG) video bytes only "
            "(inject a decoder module for other containers)"
        )
    frames: list[bytes] = []

    def walk(data: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if cid in (b"RIFF", b"LIST"):
                walk(data, body_start + 4, body_end)  # skip form type
            elif (
                len(cid) == 4
                and cid[:2].isdigit()
                and cid[2:4] in (b"dc", b"db")
            ):
                frames.append(data[body_start:body_end])
            pos = body_start + size + (size & 1)  # word-aligned

    walk(b, 12, len(b))
    return frames


def sample_mjpeg_frames(
    b: bytes, max_frames: int = 8
) -> list[tuple[int, bytes]]:
    """Evenly-spaced frame sample: up to ``max_frames`` (frame_idx,
    jpeg_bytes) pairs via the floor map idx = (i * n) // k — the
    deterministic stand-in for PTS-based sampling."""
    fr = mjpeg_frames(b)
    n = len(fr)
    if n == 0:
        return []
    k = min(max_frames, n)
    seen: list[tuple[int, bytes]] = []
    last = -1
    for i in range(k):
        idx = (i * n) // k
        if idx == last:
            continue
        seen.append((idx, fr[idx]))
        last = idx
    return seen


def encode_mjpeg_avi(jpeg_frames: list[bytes]) -> bytes:
    """Minimal MJPEG AVI writer (movi list of 00dc chunks + a
    skeletal hdrl) — enough structure for this parser AND for the
    format's RIFF rules, so tests can build real videos from
    functions/jpeg.py frames without any media library."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    avih = chunk(b"avih", struct.pack("<14I", 33333, 0, 0, 0,
                                      len(jpeg_frames), 0, 1, 0, 8, 8,
                                      0, 0, 0, 0))
    hdrl = lst(b"hdrl", avih)
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
