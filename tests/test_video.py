"""MJPEG-AVI video path: real RIFF parse + per-frame JPEG decode
(functions/video.py + multimodal.video_frame_features) and
frame-hash video near-dup (video_near_dup_pairs) — videos BUILT from
our own JPEG encoder, no media library anywhere."""

from __future__ import annotations

import numpy as np
import pytest

from umls2rdf_spark.functions.jpeg import encode_jpeg_gray
from umls2rdf_spark.functions.video import (
    encode_mjpeg_avi,
    mjpeg_frames,
    sample_mjpeg_frames,
)


def _img(seed: int, h=16, w=24):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w)).astype(np.float64)
    for _ in range(2):  # smooth: stable under JPEG quantization
        img = (
            np.roll(img, 1, 0) + np.roll(img, -1, 0)
            + np.roll(img, 1, 1) + np.roll(img, -1, 1) + img
        ) / 5
    return img.astype(np.uint8)


def _avi(seeds):
    return encode_mjpeg_avi([encode_jpeg_gray(_img(s)) for s in seeds])


def test_riff_roundtrip_and_sampling():
    frames = [encode_jpeg_gray(_img(s)) for s in range(5)]
    b = encode_mjpeg_avi(frames)
    assert mjpeg_frames(b) == frames
    sampled = sample_mjpeg_frames(b, max_frames=3)
    assert [i for i, _ in sampled] == [0, 1, 3]
    assert sample_mjpeg_frames(b, max_frames=99) == list(enumerate(frames))
    with pytest.raises(NotImplementedError, match="AVI"):
        mjpeg_frames(b"MP4 box soup")


def test_video_frame_features_real_decode(spark):
    df = spark.createDataFrame(
        [(1, _avi([0, 4, 8]), ("video/avi", "t"))],
        "media_id long, content binary, "
        "meta struct<mime:string,source:string>",
    )
    from umls2rdf_spark.operators.multimodal import video_frame_features

    rows = video_frame_features(df, max_frames=8).collect()
    assert len(rows) == 3
    for r in rows:
        assert (r["width"], r["height"]) == (24, 16)
        assert 0 <= r["ahash"] < (1 << 63)
        assert 0.0 <= r["mean_luma"] <= 255.0
    # deterministic
    again = video_frame_features(df, max_frames=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_video_frame_features_permissive(spark):
    from umls2rdf_spark.operators.multimodal import video_frame_features

    df = spark.createDataFrame(
        [
            (1, _avi([0, 2]), ("video/avi", "t")),
            (2, b"not a video", ("video/mp4", "t")),
        ],
        "media_id long, content binary, "
        "meta struct<mime:string,source:string>",
    )
    rows = video_frame_features(df, mode="PERMISSIVE").collect()
    good = [r for r in rows if r["media_id"] == 1]
    bad = [r for r in rows if r["media_id"] == 2]
    assert len(good) == 2 and all(r["_corrupt_record"] is None for r in good)
    assert len(bad) == 1 and bad[0]["frame_idx"] == -1
    assert "AVI" in bad[0]["_corrupt_record"]
    with pytest.raises(Exception):
        video_frame_features(df, mode="FAILFAST").collect()


def test_video_near_dup_pairs(spark):
    """Two videos sharing 2 of 3 frames pair up; an unrelated video
    pairs with neither."""
    from umls2rdf_spark.operators.multimodal import video_near_dup_pairs

    shared = [0, 4]
    rows = [
        (1, _avi(shared + [8]), ("video/avi", "t")),
        (2, _avi(shared + [12]), ("video/avi", "t")),
        (3, _avi([1, 5, 9]), ("video/avi", "t")),  # shifted variants
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, content binary, "
        "meta struct<mime:string,source:string>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in video_near_dup_pairs(
            df, max_hamming=0, min_shared=2
        ).collect()
    }
    assert got.get((1, 2), 0) >= 2
    assert all(3 not in k for k in got)
