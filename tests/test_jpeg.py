"""Stdlib baseline JPEG codec (functions/jpeg.py) + its wiring into
the media operators: real decode of stdlib-BUILT JPEGs (no imaging
library anywhere), aHash stability across PNG/JPEG encodings of the
same image, progressive rejection, and the resize path."""

from __future__ import annotations

import numpy as np
import pytest

from tests.test_streaming_multimodal import make_png
from umls2rdf_spark.functions.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _gradient(h=32, w=64):
    return np.tile((np.arange(w) * 4 % 256).astype(np.uint8), (h, 1))


def test_roundtrip_within_quant_error():
    rng = np.random.default_rng(11)
    for shape in [(8, 8), (16, 24), (10, 13), (40, 56)]:
        img = rng.integers(0, 256, shape).astype(np.float64)
        for _ in range(3):  # smooth: JPEG is built for low-frequency
            img = (
                np.roll(img, 1, 0) + np.roll(img, -1, 0)
                + np.roll(img, 1, 1) + np.roll(img, -1, 1) + img
            ) / 5
        img = img.astype(np.uint8)
        dec = decode_jpeg_gray(encode_jpeg_gray(img))
        assert dec.shape == shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 25


def test_encode_decode_deterministic():
    img = _gradient()
    b1, b2 = encode_jpeg_gray(img), encode_jpeg_gray(img)
    assert b1 == b2
    assert (decode_jpeg_gray(b1) == decode_jpeg_gray(b2)).all()


def test_non_jpeg_and_progressive_raise():
    with pytest.raises(NotImplementedError, match="not a JPEG"):
        decode_jpeg_gray(b"plainly not an image")
    # minimal stream whose first frame marker is SOF2 (progressive)
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2" + (11).to_bytes(2, "big")
        + bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg_gray(sof2)


def test_truncated_stream_is_value_error_not_hang():
    img = _gradient(16, 16)
    b = encode_jpeg_gray(img)
    with pytest.raises(ValueError):
        decode_jpeg_gray(b[: len(b) // 2])


def test_ahash_stable_across_png_and_jpeg(spark):
    """The same strongly-banded image encoded as PNG and as JPEG
    must produce the SAME perceptual hash — cell means differ only
    by quantization noise, far inside the aHash threshold."""
    from umls2rdf_spark.operators.imagededup import image_ahash

    img = _gradient(32, 64)
    rows = [
        (1, make_png([list(r) for r in img]), ("image/png", "t")),
        (2, encode_jpeg_gray(img), ("image/jpeg", "t")),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, content binary, "
        "meta struct<mime:string,source:string>",
    )
    out = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert out[1] == out[2]


def test_resize_jpeg_input_stdlib(spark):
    """JPEG input through the stdlib resize path: luma-decoded,
    nearest-neighbor resized, re-encoded as grayscale PNG of the
    requested dimensions."""
    from umls2rdf_spark.functions.png import decode_png
    from umls2rdf_spark.operators.multimodal import resize_images

    img = _gradient(24, 24)
    df = spark.createDataFrame(
        [(5, encode_jpeg_gray(img), ("image/jpeg", "t"))],
        "media_id long, content binary, "
        "meta struct<mime:string,source:string>",
    )
    out = resize_images(df, 8, 6, image_module=None).collect()[0]
    w, h, ch, raw = decode_png(bytes(out["content"]))
    assert (w, h, ch) == (8, 6, 1)


def test_mixed_corpus_near_dup_groups(spark):
    """PNG and JPEG encodings of the same image group together in
    image_near_dup_groups — the mixed-format web-crawl shape."""
    from umls2rdf_spark.operators.imagededup import image_near_dup_groups

    a = _gradient(32, 64)
    b = (np.flip(a, 1) // 2).astype(np.uint8)  # a different image
    rows = [
        (1, make_png([list(r) for r in a]), ("image/png", "t")),
        (2, encode_jpeg_gray(a), ("image/jpeg", "t")),
        (3, encode_jpeg_gray(b), ("image/jpeg", "t")),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, content binary, "
        "meta struct<mime:string,source:string>",
    )
    groups = {
        r["media_id"]: r["group_id"]
        for r in image_near_dup_groups(df, max_hamming=3).collect()
    }
    assert groups[1] == groups[2]
    assert groups[3] != groups[1]


def test_decoders_fail_cleanly_on_fuzzed_bytes():
    """Corrupt media must raise a normal exception promptly (which
    PERMISSIVE quarantines) — never hang, loop, or kill the process.
    Deterministic corpus: truncations + byte-flips of real encodes,
    plus md5-derived pseudo-random blobs with valid magics."""
    import hashlib

    import numpy as np

    from umls2rdf_spark.functions.audio import decode_wav
    from umls2rdf_spark.functions.jpeg import decode_jpeg_gray
    from umls2rdf_spark.functions.png import decode_png
    from umls2rdf_spark.functions.video import mjpeg_frames

    img = _gradient(16, 16)
    good_jpeg = encode_jpeg_gray(img)
    good_png = make_png([[(x * 16) % 256 for x in range(16)]] * 16)

    def rand(n, tag):
        out = b""
        i = 0
        while len(out) < n:
            out += hashlib.md5(f"{tag}-{i}".encode()).digest()
            i += 1
        return out[:n]

    cases = []
    for good in (good_jpeg, good_png):
        for cut in (1, len(good) // 3, len(good) - 2):
            cases.append(good[:cut])
        flipped = bytearray(good)
        for pos in (len(good) // 2, len(good) // 2 + 1, -3):
            flipped[pos] ^= 0xFF
        cases.append(bytes(flipped))
    cases += [
        b"",
        rand(64, "a"),
        b"\xff\xd8\xff\xe0" + rand(200, "jpg"),
        b"\x89PNG\r\n\x1a\n" + rand(200, "png"),
        b"RIFF" + rand(120, "avi"),
        b"RIFF\x10\x00\x00\x00WAVE" + rand(64, "wav"),
    ]
    decoders = [decode_jpeg_gray, decode_png, decode_wav,
                mjpeg_frames]
    for blob in cases:
        for dec in decoders:
            try:
                out = dec(blob)
                # a lucky parse is fine — it must only return a
                # well-formed value, not garbage types
                assert out is not None
                if isinstance(out, np.ndarray):
                    assert out.dtype == np.uint8
            except Exception as e:  # noqa: BLE001 — the contract
                assert not isinstance(e, (MemoryError, SystemError)), (
                    dec.__name__, type(e).__name__
                )
