"""Multimodal column operators: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the actual media
decoding is stubbed — the image/audio libraries are not in this
container, so decode either uses PIL/soundfile when importable or a
clearly-marked deterministic fake derived from the bytes (so tests
are reproducible). At 100 TB the pattern is: binary column stays
columnar in parquet, decode runs Arrow-batched on executors, outputs
are fixed-width feature columns — never collect bytes to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from umls2rdf_spark.functions import audio as _audio
from umls2rdf_spark.functions import jpeg as _jpeg
from umls2rdf_spark.functions import png as _png
from umls2rdf_spark.functions import video as _video
from umls2rdf_spark.operators.spread import spread_small_input
from umls2rdf_spark.sources.text import CORRUPT_COL

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sha1 string, width int, height int, "
    "mean_luma double"
)


def _try_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except Exception:
        return None


def image_features(
    df: DataFrame, batch_hint: int = 1024, image_module=None
) -> DataFrame:
    """Decode + feature-extract an image binary column via mapInPandas.

    With PIL present (or a PIL-compatible ``image_module`` injected —
    ``.open(buf)`` → object with ``.size`` and ``.convert('L')``):
    real decode (width/height/mean luminance). Without either (this
    container): a deterministic fake — dimensions and luma derived
    from the content hash — keeping schema, batching and determinism
    identical so the full pipeline is testable.
    """
    df = spread_small_input(df, "media_id")

    def extract(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        if image_module is not None:
            Image = image_module
        else:
            try:
                from PIL import Image
            except Exception:
                Image = None

        for pdf in batches:
            ids, nbytes, shas, ws, hs, lumas = [], [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                sha = hashlib.sha1(b).hexdigest()
                if Image is not None:
                    import io

                    try:
                        img = Image.open(io.BytesIO(b))
                        w, h = img.size
                        arr = np.asarray(img.convert("L"), dtype=np.float64)
                        luma = float(arr.mean()) if arr.size else 0.0
                    except Exception:
                        w = h = 0
                        luma = 0.0
                else:
                    # deterministic fake decode (STUB): dims/luma from
                    # the content hash so tests are reproducible
                    w = int(sha[:4], 16) % 1920 + 1
                    h = int(sha[4:8], 16) % 1080 + 1
                    luma = (int(sha[8:12], 16) % 2551) / 10.0
                ids.append(mid)
                nbytes.append(len(b))
                shas.append(sha)
                ws.append(w)
                hs.append(h)
                lumas.append(luma)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "sha1": shas,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
            )

    return df.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    fmt: str = "PNG",
    image_module=None,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Decode → resize → re-encode an image binary column, Arrow-
    batched via mapInPandas. Uses PIL imported ON THE WORKER when
    available; without it, the shared pure-stdlib PNG codec
    (functions/png.py: zlib inflate → de-filter → numpy
    nearest-neighbor index map → filter-0 deflate)
    handles 8-bit grayscale/RGB PNGs, so the real resize path runs
    even in PIL-less containers. Bytes that are not a supported PNG
    raise ``NotImplementedError`` at plan-execution time with a clear
    message (never silently fakes a resize — unlike feature
    extraction, the output here IS the decoded media).

    ``image_module`` injects a PIL-compatible shim (``.open(buf)`` →
    object with ``.resize((w,h))`` and ``.save(buf, format=...)``) so
    the full Spark path — Arrow in, resize loop, binary column out —
    is unit-testable against any decoder.

    Nearest-neighbor mapping (stdlib path): source index =
    ``(dst_index * src_len) // dst_len`` — the floor map, exact in
    integers, deterministic everywhere.

    ``mode="PERMISSIVE"`` (D5 reader contract): an undecodable blob
    becomes a row with ``content`` null and the error in
    ``_corrupt_record`` instead of failing the job — the media
    output itself is the deliverable, so corrupt rows are KEPT for
    quarantine, never silently dropped.
    """
    if mode not in ("FAILFAST", "PERMISSIVE"):
        raise ValueError(f"mode must be FAILFAST or PERMISSIVE: {mode}")
    permissive = mode == "PERMISSIVE"
    corrupt_col = CORRUPT_COL
    df = spread_small_input(df, "media_id")

    def resize(batches):
        import io

        import pandas as pd

        def stdlib_resize(b: bytes) -> bytes:
            import numpy as np

            if fmt.upper() != "PNG":
                raise NotImplementedError(
                    "stdlib resize path re-encodes PNG only"
                )
            if len(b) >= 2 and b[0] == 0xFF and b[1] == 0xD8:
                # baseline JPEG input: decode the LUMA plane
                # (functions/jpeg.py) and re-encode as grayscale PNG
                # — the stdlib fallback trades chroma for coverage
                # of the dominant web format; inject a PIL-compatible
                # image_module for full-color JPEG resizes
                gray = _jpeg.decode_jpeg_gray(b)
                h, w = gray.shape
                ys = (np.arange(height) * h) // max(height, 1)
                xs = (np.arange(width) * w) // max(width, 1)
                res = gray[ys][:, xs]
                return _png.encode_png(
                    width, height, 1, res.tobytes()
                )
            w, h, ch, raw = _png.decode_png(b)
            arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)
            ys = (np.arange(height) * h) // max(height, 1)
            xs = (np.arange(width) * w) // max(width, 1)
            res = arr[ys][:, xs]
            return _png.encode_png(width, height, ch, res.tobytes())

        Image = image_module
        if Image is None:
            try:
                from PIL import Image  # type: ignore[no-redef]
            except Exception:
                Image = None
        def one(b: bytes) -> bytes:
            if Image is None:
                return stdlib_resize(b)
            img = Image.open(io.BytesIO(b))
            resized = img.resize((width, height))
            buf = io.BytesIO()
            resized.save(buf, format=fmt)
            return buf.getvalue()

        for pdf in batches:
            ids, blobs, errs = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                if permissive:
                    try:
                        blob, err = one(b), None
                    except Exception as e:
                        blob, err = None, f"{type(e).__name__}: {e}"
                else:
                    blob, err = one(b), None
                ids.append(mid)
                blobs.append(blob)
                errs.append(err)
            out = {
                "media_id": pd.Series(ids, dtype="int64"),
                "content": blobs,
            }
            if permissive:
                out[corrupt_col] = pd.Series(errs, dtype="object")
            yield pd.DataFrame(out)

    # the shared stdlib codec (functions/png.py) is shipped BY VALUE
    # around the call — workers need neither PIL nor the repo on
    # sys.path (operators/pq.py pattern; registration must wrap the
    # mapInPandas call because UDFs pickle at plan construction)
    from pyspark import cloudpickle

    out_schema = "media_id long, content binary"
    if permissive:
        out_schema += f", {corrupt_col} string"
    cloudpickle.register_pickle_by_value(_png)
    cloudpickle.register_pickle_by_value(_jpeg)
    try:
        return df.mapInPandas(resize, schema=out_schema)
    finally:
        cloudpickle.unregister_pickle_by_value(_jpeg)
        cloudpickle.unregister_pickle_by_value(_png)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sha1 string, sample_rate int, "
    "n_samples long, rms double"
)


def audio_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract an audio binary column via
    mapInPandas — the audio counterpart of image_features.

    Decode ladder: soundfile when importable (any libsndfile
    format) → the pure-stdlib PCM WAV parser (functions/audio.py —
    integer 8/16/24/32-bit and IEEE-float RIFF/WAVE decode for REAL
    in dependency-less containers) → for non-WAV bytes without
    soundfile, a deterministic content-hash fake (STUB, documented)
    so the pipeline shape stays testable.
    """
    df = spread_small_input(df, "media_id")

    def extract(batches):
        import hashlib
        import io

        import numpy as np
        import pandas as pd

        try:
            import soundfile
        except Exception:
            soundfile = None

        for pdf in batches:
            ids, nbytes, shas, rates, nsamps, rmss = [], [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                sha = hashlib.sha1(b).hexdigest()
                if soundfile is not None:
                    try:
                        data, rate = soundfile.read(io.BytesIO(b))
                        arr = np.asarray(data, dtype=np.float64)
                        ns = int(arr.shape[0])
                        rms = (
                            float(np.sqrt((arr**2).mean()))
                            if arr.size
                            else 0.0
                        )
                    except Exception:
                        rate, ns, rms = 0, 0, 0.0
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    # real stdlib PCM WAV decode; corrupt RIFF rows
                    # degrade to zeros (data, not job death)
                    try:
                        rate, ns, rms = _audio.decode_wav(b)
                    except Exception:
                        rate, ns, rms = 0, 0, 0.0
                else:
                    # deterministic fake decode (STUB): rate/samples/
                    # rms from the content hash, reproducible in tests
                    rate = [8000, 16000, 22050, 44100][int(sha[:2], 16) % 4]
                    ns = int(sha[2:8], 16) % 1_000_000
                    rms = (int(sha[8:12], 16) % 10_000) / 10_000.0
                ids.append(mid)
                nbytes.append(len(b))
                shas.append(sha)
                rates.append(rate)
                nsamps.append(ns)
                rmss.append(rms)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "sha1": shas,
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(nsamps, dtype="int64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(_audio)
    try:
        return df.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)
    finally:
        cloudpickle.unregister_pickle_by_value(_audio)


def frame_sample(
    df: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling stub: emits one row per sampled 'frame'
    (fixed-stride byte offsets — a real decoder would use PTS). Shows
    the 1→N explode shape for frame extraction with bounded fan-out."""
    df = spread_small_input(df, "media_id")

    def sample(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "offset": [], "frame_sha1": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                n = min(max_frames, max(1, len(b) // every_n_bytes))
                for i in range(n):
                    off = i * every_n_bytes
                    chunk = b[off : off + every_n_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["offset"].append(off)
                    out["frame_sha1"].append(hashlib.sha1(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "offset": pd.Series(out["offset"], dtype="int64"),
                    "frame_sha1": out["frame_sha1"],
                }
            )

    return df.mapInPandas(
        sample,
        schema="media_id long, frame_idx int, offset long, frame_sha1 string",
    )


VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, "
    "mean_luma double, ahash long"
)


def video_frame_features(
    df: DataFrame,
    max_frames: int = 8,
    mode: str = "FAILFAST",
) -> DataFrame:
    """REAL per-frame features for MJPEG-AVI video binaries — the
    upgrade of the byte-stride :func:`frame_sample` stub for the one
    container+codec pair the stdlib codecs can fully decode: RIFF
    parse (functions/video.py) → evenly-spaced frame sample → each
    frame's luma plane via the baseline JPEG decoder → (width,
    height, mean luma, 8x8 aHash) per sampled frame. One input row
    fans out to ≤ ``max_frames`` rows.

    ``mode`` follows the media-family contract: FAILFAST raises on
    the first undecodable video/frame; PERMISSIVE emits a single
    quarantine row per bad video (frame_idx -1, null features,
    ``_corrupt_record`` reason) and keeps the job alive.
    """
    from umls2rdf_spark.operators.imagededup import _ahash_int
    from umls2rdf_spark.operators.spread import spread_small_input

    if mode not in ("FAILFAST", "PERMISSIVE"):
        raise ValueError(f"mode must be FAILFAST or PERMISSIVE: {mode}")
    permissive = mode == "PERMISSIVE"
    corrupt_col = CORRUPT_COL
    df = spread_small_input(df.select("media_id", "content"), "media_id")

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [], "frame_idx": [], "width": [],
                "height": [], "mean_luma": [], "ahash": [],
            }
            errs = []

            def emit(mid, idx, w, h, luma, ah, err=None):
                out["media_id"].append(mid)
                out["frame_idx"].append(idx)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(luma)
                out["ahash"].append(ah)
                errs.append(err)

            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                try:
                    for idx, fb in _video.sample_mjpeg_frames(
                        b, max_frames
                    ):
                        gray = _jpeg.decode_jpeg_gray(fb)
                        emit(
                            mid, idx, gray.shape[1], gray.shape[0],
                            float(gray.mean()), _ahash_int(gray),
                        )
                except Exception as e:
                    if not permissive:
                        raise
                    emit(mid, -1, None, None, None, None,
                         f"{type(e).__name__}: {e}")
            frame = pd.DataFrame(
                {
                    "media_id": pd.Series(
                        out["media_id"], dtype="int64"
                    ),
                    "frame_idx": pd.Series(
                        out["frame_idx"], dtype="int32"
                    ),
                    "width": pd.Series(out["width"], dtype="Int32"),
                    "height": pd.Series(out["height"], dtype="Int32"),
                    "mean_luma": pd.Series(
                        out["mean_luma"], dtype="float64"
                    ),
                    "ahash": pd.Series(out["ahash"], dtype="Int64"),
                }
            )
            if permissive:
                frame[corrupt_col] = pd.Series(errs, dtype="object")
            yield frame

    from pyspark import cloudpickle

    import umls2rdf_spark.operators.imagededup as _idmod

    schema = VIDEO_FRAME_SCHEMA
    if permissive:
        schema += f", {corrupt_col} string"
    for m in (_video, _jpeg, _png, _idmod):
        cloudpickle.register_pickle_by_value(m)
    try:
        return df.mapInPandas(extract, schema=schema)
    finally:
        for m in (_idmod, _png, _jpeg, _video):
            cloudpickle.unregister_pickle_by_value(m)


def video_near_dup_pairs(
    df: DataFrame,
    max_frames: int = 8,
    max_hamming: int = 3,
    bands: int = 4,
    min_shared: int = 2,
    mode: str = "FAILFAST",
) -> DataFrame:
    """(id_a < id_b, n_shared) video pairs sharing >= ``min_shared``
    near-duplicate sampled frames — frame aHashes from
    :func:`video_frame_features` fed through the SAME banded Hamming
    machinery as the image family (imagededup.hamming_near_dup_pairs:
    complete for hamming <= bands-1, skew-valved), then rolled up per
    video pair. Frame node ids pack (media_id, frame_idx) as
    ``media_id << 32 | frame_idx``: frame_idx is int32 by schema (so
    always < 2^32; any frame count a real container can index is
    representable — not just the first 2^20), and reconstruction
    uses ARITHMETIC shiftright, which sign-extends and therefore
    recovers negative media ids exactly where a truncating div would
    not. Contract: media_id must fit in 32 bits (|id| < 2^31) so the
    pack cannot overflow int64."""
    from umls2rdf_spark.operators.imagededup import hamming_near_dup_pairs

    frames = video_frame_features(df, max_frames=max_frames, mode=mode)
    if mode == "PERMISSIVE":
        frames = frames.where(F.col(CORRUPT_COL).isNull())
    nodes = frames.select(
        (
            F.shiftleft(F.col("media_id").cast("bigint"), 32)
            + F.col("frame_idx").cast("bigint")
        ).alias("fid"),
        F.col("ahash").cast("bigint").alias("ahash"),
    )
    pairs = hamming_near_dup_pairs(
        nodes, "fid", "ahash", max_hamming=max_hamming, bands=bands
    )
    va = F.shiftright(F.col("id_a"), 32)
    vb = F.shiftright(F.col("id_b"), 32)
    return (
        pairs.select(
            F.least(va, vb).alias("id_a"),
            F.greatest(va, vb).alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
