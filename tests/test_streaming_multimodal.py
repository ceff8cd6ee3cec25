"""Tests for the Structured Streaming plans and multimodal stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from umls2rdf_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    frame_sample,
    image_features,
)
from umls2rdf_spark.plans.analytics_extra import events_windowed
from umls2rdf_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    user_event_counts_stateful,
    windowed_counts,
)


def test_streaming_windowed_counts_matches_batch(spark):
    stream = read_events_stream(spark, SF_DIR)
    assert stream.isStreaming
    result = run_to_memory(
        windowed_counts(stream), "windowed_counts_test", spark
    )
    got = {
        (str(r["bucket"]), r["event_type"]): (r["n"], r["total_value"])
        for r in result.collect()
    }
    expected = {
        (str(r["bucket"]), r["event_type"]): (r["n"], r["total_value"])
        for r in events_windowed(spark, SF_DIR).collect()
    }
    assert got == expected


def test_stateful_user_counts(spark):
    stream = read_events_stream(spark, SF_DIR)
    q = (
        user_event_counts_stateful(stream)
        .writeStream.format("memory")
        .queryName("stateful_counts_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: r["n_events"]
        for r in spark.table("stateful_counts_test").collect()
    }
    from umls2rdf_spark.sources.parquet import load_table

    expected = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, b"\x89PNG fake image bytes " * 50, ("image/png", "unit")),
        (2, b"RIFF fake wav bytes " * 400, ("audio/wav", "unit")),
        (3, b"", ("image/png", "unit")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_stub(spark, media_df):
    feats = {r["media_id"]: r for r in image_features(media_df).collect()}
    assert set(feats) == {1, 2, 3}
    assert feats[1]["n_bytes"] == len(b"\x89PNG fake image bytes " * 50)
    assert feats[3]["n_bytes"] == 0
    # deterministic: same input bytes → same fake dimensions
    again = {r["media_id"]: r for r in image_features(media_df).collect()}
    assert feats[1]["width"] == again[1]["width"]
    assert feats[1]["mean_luma"] == again[1]["mean_luma"]
    assert 1 <= feats[1]["width"] <= 1920


def make_png(pixels: list[list[int]]) -> bytes:
    """A genuinely valid grayscale 8-bit PNG from stdlib zlib+struct —
    real IHDR/IDAT/IEND chunks, CRCs, filter-0 scanlines — so the real
    decode branch has ground-truth bytes without PIL installed."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_image_features_real_decode_branch(spark):
    """The real-decode branch of image_features, driven through Spark
    with an injected PIL-compatible module that actually parses the
    PNG (IHDR dims, zlib-inflated unfiltered scanlines) — width/height
    /luma assertions against ground truth, no monkeypatching."""
    import hashlib

    pixels = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
    png = make_png(pixels)
    rows = [(7, png, ("image/png", "unit"))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    class MiniImage:
        def __init__(self, b: bytes):
            import struct
            import zlib

            assert b[:8] == b"\x89PNG\r\n\x1a\n"
            pos, idat, w, h = 8, b"", None, None
            while pos < len(b):
                (length,) = struct.unpack(">I", b[pos:pos + 4])
                typ = b[pos + 4:pos + 8]
                data = b[pos + 8:pos + 8 + length]
                if typ == b"IHDR":
                    w, h = struct.unpack(">II", data[:8])
                elif typ == b"IDAT":
                    idat += data
                pos += 12 + length
            raw = zlib.decompress(idat)
            stride = w + 1
            self.size = (w, h)
            self._rows = [
                list(raw[r * stride + 1:(r + 1) * stride]) for r in range(h)
            ]

        def convert(self, mode: str):
            import numpy as np

            return np.array(self._rows, dtype=np.uint8)

    class MiniPNG:
        @staticmethod
        def open(buf):
            return MiniImage(buf.read())

    got = image_features(df, image_module=MiniPNG).collect()
    assert len(got) == 1
    r = got[0]
    assert r["width"] == 4
    assert r["height"] == 3
    assert r["mean_luma"] == sum(range(12)) / 12.0
    assert r["sha1"] == hashlib.sha1(png).hexdigest()
    assert r["n_bytes"] == len(png)


def test_frame_sample_stub(spark, media_df):
    frames = frame_sample(media_df, every_n_bytes=1024, max_frames=4)
    rows = frames.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    # 8000-byte audio blob → capped at 4 frames; tiny blobs → 1 frame
    assert len(by_media[2]) == 4
    assert len(by_media[3]) == 1
    assert [r["frame_idx"] for r in sorted(by_media[2], key=lambda x: x["frame_idx"])] == [0, 1, 2, 3]


def test_streaming_dedup(spark):
    from umls2rdf_spark.streaming.events import streaming_dedup

    stream = read_events_stream(spark, SF_DIR)
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("stream_dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("stream_dedup_test")
    from umls2rdf_spark.sources.parquet import load_table

    n_src = load_table(spark, SF_DIR, "events").count()
    assert got.count() == n_src  # source has unique event_ids
    assert got.select("event_id").distinct().count() == n_src


def test_resize_images_with_shim(spark, media_df):
    """The real resize path (decode → resize → re-encode, Arrow both
    ways) driven through Spark with a PIL-compatible shim — the
    classes are defined in-function so cloudpickle ships them by
    value to the workers."""

    class FakeImg:
        def __init__(self, b):
            self.b = b

        def resize(self, size):
            self.size = size
            return self

        def save(self, buf, format):
            tag = f"RESIZED:{format}:{self.size[0]}x{self.size[1]}:"
            buf.write(tag.encode() + self.b[:8])

    class FakeImageModule:
        @staticmethod
        def open(bio):
            return FakeImg(bio.read())

    from umls2rdf_spark.operators.multimodal import resize_images

    out = resize_images(media_df, 64, 32, image_module=FakeImageModule)
    rows = {r["media_id"]: bytes(r["content"]) for r in out.collect()}
    assert len(rows) == media_df.count()
    for mid, blob in rows.items():
        assert blob.startswith(b"RESIZED:PNG:64x32:"), (mid, blob)


def test_resize_images_stdlib_png(spark):
    """Without PIL or a shim, resize_images runs the pure-stdlib PNG
    path: zlib inflate → de-filter → nearest-neighbor index map →
    filter-0 re-encode, all inside the Spark task. Ground truth: the
    floor map src=(dst*len)//dst_len over a known gradient."""
    pixels = [[0, 10, 20, 30], [40, 50, 60, 70], [80, 90, 100, 110]]
    png = make_png(pixels)
    rows = [(11, png, ("image/png", "unit"))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    from umls2rdf_spark.operators.multimodal import resize_images

    out = {
        r["media_id"]: bytes(r["content"])
        for r in resize_images(df, 2, 2).collect()
    }
    assert set(out) == {11}
    # decode the emitted PNG with the same stdlib parsing the feature
    # test uses: IHDR dims + inflated filter-0 scanlines
    import struct
    import zlib

    b = out[11]
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w, h = 8, b"", None, None
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos:pos + 4])
        typ = b[pos + 4:pos + 8]
        if typ == b"IHDR":
            w, h = struct.unpack(">II", b[pos + 8:pos + 16])
        elif typ == b"IDAT":
            idat += b[pos + 8:pos + 8 + length]
        pos += 12 + length
    assert (w, h) == (2, 2)
    raw = zlib.decompress(idat)
    got = [list(raw[r * 3 + 1:(r + 1) * 3]) for r in range(2)]
    # ys = (0*3)//2, (1*3)//2 = rows 0,1; xs = (0*4)//2,(1*4)//2 = 0,2
    assert got == [[0, 20], [40, 60]]


def test_resize_images_non_png_raises_without_pil(spark, media_df):
    """Bytes that are not a supported PNG must surface
    NotImplementedError from the stdlib path, never a silently faked
    resize (media_df's blobs are not valid PNGs)."""
    import pytest

    from umls2rdf_spark.operators.multimodal import _try_pil, resize_images

    if _try_pil() is not None:
        pytest.skip("PIL present in this environment")
    out = resize_images(media_df, 8, 8)
    with pytest.raises(Exception, match="NotImplementedError|PNG"):
        out.collect()


def test_audio_features_stub(spark, media_df):
    from umls2rdf_spark.operators.multimodal import audio_features

    feats = {r["media_id"]: r for r in audio_features(media_df).collect()}
    assert set(feats) == {1, 2, 3}
    assert feats[2]["n_bytes"] == len(b"RIFF fake wav bytes " * 400)
    assert feats[2]["sample_rate"] in (8000, 16000, 22050, 44100)
    assert 0.0 <= feats[2]["rms"] <= 1.0
    # deterministic fake: same bytes → same features
    again = {r["media_id"]: r for r in audio_features(media_df).collect()}
    assert feats[2]["sample_rate"] == again[2]["sample_rate"]
    assert feats[2]["rms"] == again[2]["rms"]


def test_streaming_enrichment_matches_batch(spark):
    """Stream-static broadcast enrichment + windowed agg must equal
    the same computation done in batch."""
    from umls2rdf_spark.sources.parquet import load_table
    from umls2rdf_spark.streaming.events import (
        enriched_windowed_value,
        read_events_stream,
        run_to_memory,
    )

    customers = load_table(spark, SF_DIR, "customer")
    stream = read_events_stream(spark, SF_DIR)
    got = {
        (r["bucket"], r["c_mktsegment"]): (r["n"], r["total_value"])
        for r in run_to_memory(
            enriched_windowed_value(stream, customers),
            "enriched_test",
            spark,
        ).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    expected = {
        (r["bucket"], r["c_mktsegment"]): (r["n"], r["total_value"])
        for r in (
            ev.join(F.broadcast(dim), "user_id")
            .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(10,2)"))
                .cast("double")
                .alias("total_value"),
            )
            .select(
                F.col("w.start").alias("bucket"), "c_mktsegment", "n",
                "total_value",
            )
            .collect()
        )
    }
    assert got == expected
    assert len(got) > 0


def test_foreach_batch_parquet_sink(spark, tmp_path):
    from umls2rdf_spark.sources.parquet import load_table
    from umls2rdf_spark.streaming.events import (
        make_idempotent_batch_writer,
        read_events_stream,
        run_foreach_batch_to_parquet,
    )

    stream = read_events_stream(spark, SF_DIR).select(
        "event_id", "user_id", "event_type"
    )
    out = str(tmp_path / "sink")
    run_foreach_batch_to_parquet(
        stream, out, str(tmp_path / "ckpt")
    )
    sunk = spark.read.parquet(out)
    ev = load_table(spark, SF_DIR, "events")
    assert sunk.count() == ev.count()
    assert sunk.select(F.sum("event_id")).collect()[0][0] == \
        ev.select(F.sum("event_id")).collect()[0][0]

    # at-least-once replay: re-delivering an already-written batch id
    # (restart after write, before checkpoint commit) must not
    # duplicate rows — the epoch-keyed overwrite rewrites in place
    ids = sorted(
        r["batch_id"] for r in sunk.select("batch_id").distinct().collect()
    )
    writer = make_idempotent_batch_writer(out)
    # materialize before the overwrite — a lazy self-read would race
    # the delete; a real replay re-delivers the source micro-batch
    replayed_rows = spark.read.parquet(f"{out}/batch_id={ids[0]}").collect()
    writer(spark.createDataFrame(replayed_rows), ids[0])
    assert spark.read.parquet(out).count() == ev.count()


def test_streaming_dedup_with_duplicates_matches_batch(spark, tmp_path):
    """streaming_dedup over an at-least-once (duplicated) source must
    equal the batch twin's dropDuplicates on the same input — the
    oracle for the streaming dedup state logic."""
    import duckdb

    from umls2rdf_spark.streaming.events import (
        EVENTS_STREAM_SCHEMA,
        dedup_events_batch,
        streaming_dedup,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.schema(EVENTS_STREAM_SCHEMA).parquet(
        f"{SF_DIR}/events.parquet"
    )
    dup_dir = str(tmp_path / "dupsrc")
    # every 20th event delivered twice; one file -> one micro-batch,
    # so no row is watermark-late and the dedup applies to all of it
    raw.union(raw.where(F.col("event_id") % 20 == 0)).coalesce(1) \
        .write.parquet(dup_dir)

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .load(dup_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("stream_dedup_dup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("stream_dedup_dup_test")

    batch_src = (
        spark.read.schema(EVENTS_STREAM_SCHEMA)
        .parquet(dup_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    twin = dedup_events_batch(batch_src)
    assert got.count() == twin.count()
    g = {r["event_id"] for r in got.select("event_id").collect()}
    t = {r["event_id"] for r in twin.select("event_id").collect()}
    assert g == t

    # independent oracle: DuckDB distinct ids over the same files
    con = duckdb.connect()
    oracle = {
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT event_id FROM '{dup_dir}/*.parquet'"
        ).fetchall()
    }
    con.close()
    assert g == oracle


def test_streaming_corpus_ingest_matches_batch(spark):
    """The stateless corpus-intake stages (scrub + fused features +
    quality gate) must produce EXACTLY the batch result when run as a
    stream — same operators, append mode, no state store."""
    from umls2rdf_spark.streaming.events import (
        corpus_ingest_stream,
        read_documents_stream,
        run_append_to_memory,
    )

    stream = read_documents_stream(spark, SF_DIR)
    assert stream.isStreaming
    got = {
        r["doc_id"]: (r["pred_lang"], r["n_tokens"], round(r["quality"], 9))
        for r in run_append_to_memory(
            corpus_ingest_stream(stream), "corpus_ingest_test", spark
        ).collect()
    }
    batch_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = {
        r["doc_id"]: (r["pred_lang"], r["n_tokens"], round(r["quality"], 9))
        for r in corpus_ingest_stream(batch_docs).collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_bloom_gated_ingest_matches_batch(spark):
    """Intake with the bloom decontamination gate: the stream-static
    broadcast bitmap probe is stateless, so the streamed result must
    equal the batch twin — and the gate's flag set must equal the
    relational count==k decontaminate_bloom form it replaces."""
    from pyspark.sql import functions as F

    from umls2rdf_spark.operators.corpus import (
        bloom_bitmap,
        bloom_positions,
        decontaminate_bloom,
    )
    from umls2rdf_spark.streaming.events import (
        corpus_ingest_stream,
        read_documents_stream,
        run_append_to_memory,
    )

    batch_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = batch_docs.where(F.col("doc_id") % 17 == 0)
    corp = batch_docs.where(F.col("doc_id") % 17 != 0)
    pos = bloom_positions(
        bench, "doc_id", "text", shingle_n=4
    ).persist()
    bitmap = bloom_bitmap(pos).persist()
    bitmap.count()

    stream = read_documents_stream(spark, SF_DIR).where(
        F.col("doc_id") % 17 != 0
    )
    got = {
        r["doc_id"]
        for r in run_append_to_memory(
            corpus_ingest_stream(stream, bloom=bitmap),
            "bloom_ingest_test",
            spark,
        ).collect()
    }
    expected = {
        r["doc_id"]
        for r in corpus_ingest_stream(corp, bloom=bitmap).collect()
    }
    assert got == expected and len(got) > 0

    # the bitmap gate drops exactly the relational form's flag set
    ungated = {
        r["doc_id"] for r in corpus_ingest_stream(corp).collect()
    }
    flagged = {
        r.doc_id
        for r in decontaminate_bloom(
            corp, pos, "doc_id", "text", shingle_n=4
        ).collect()
    }
    assert ungated - got == flagged & ungated
    pos.unpersist()
    bitmap.unpersist()


def test_stream_stream_interval_join_matches_batch(spark):
    """Stream-STREAM interval join (click→purchase attribution): the
    streaming pair set must equal the identical expressions run in
    batch — same function, streaming vs batch sources, which oracles
    the two-sided watermark/state logic."""
    from umls2rdf_spark.sources.parquet import load_table
    from umls2rdf_spark.streaming.events import (
        click_purchase_attribution,
        read_events_stream,
        run_append_to_memory,
    )

    def sides(df):
        return (
            df.where(F.col("event_type") == "click"),
            df.where(F.col("event_type") == "purchase"),
        )

    s_clicks, s_purch = sides(read_events_stream(spark, SF_DIR))
    got = sorted(
        map(
            tuple,
            run_append_to_memory(
                click_purchase_attribution(s_clicks, s_purch),
                "attribution_test",
                spark,
            ).collect(),
        )
    )
    b_clicks, b_purch = sides(load_table(spark, SF_DIR, "events"))
    expected = sorted(
        map(tuple, click_purchase_attribution(b_clicks, b_purch).collect())
    )
    assert got == expected
    assert len(got) > 0


def test_attribution_batch_twin_matches_duckdb_oracle(spark, duck):
    """The attribution join's batch twin vs an ANSI interval-join
    oracle — engine-independent evidence for the pair semantics the
    stream-stream equivalence test relies on."""
    from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle
    from umls2rdf_spark.sources.parquet import load_table
    from umls2rdf_spark.streaming.events import click_purchase_attribution

    ev = load_table(spark, SF_DIR_ORACLE, "events")
    got = click_purchase_attribution(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    )
    sql = """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id, p.ts AS purchase_ts, c.ts AS click_ts, p.value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    """
    assert_matches_oracle(got, duck, sql)


def test_streaming_incremental_dedupe_matches_batch(spark, tmp_path):
    """The streamed shard admitted against a static fingerprint index
    must equal the batch incremental_dedupe — same base collisions
    dropped, one survivor per new text."""
    from umls2rdf_spark.operators.dedup import incremental_dedupe
    from umls2rdf_spark.sources.parquet import load_table
    from umls2rdf_spark.streaming.events import (
        run_append_to_memory,
        streaming_incremental_dedupe,
    )

    docs = load_table(spark, SF_DIR, "documents")
    base = docs.where(F.col("doc_id") % 2 == 0)
    idx = base.select(F.md5(F.col("text")).alias("text_hash"))
    shard = docs.where(F.col("doc_id") % 2 == 1).unionByName(
        base.withColumn("doc_id", F.col("doc_id") + 100000)
    )
    shard_dir = str(tmp_path / "shard")
    shard.coalesce(1).write.parquet(shard_dir)

    stream = (
        spark.readStream.schema(docs.schema).format("parquet")
        .load(shard_dir)
    )
    got = run_append_to_memory(
        streaming_incremental_dedupe(stream, idx),
        "inc_dedupe_test",
        spark,
    )
    want = incremental_dedupe(
        spark.read.parquet(shard_dir), idx, "doc_id", "text",
        base_is_fingerprints=True,
    )
    # batch keeps min-id per text; the corpus has no duplicate texts
    # within the odd shard, so first-arrival == min-id here
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() > 0


def _sessions_of(df):
    return (
        df.groupBy(
            "user_id", F.session_window(F.col("ts"), "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n"
        )
    )


def test_sessionize_stateful_event_time_timeout(spark, tmp_path):
    """Custom stateful sessionization with EVENT-TIME TIMEOUTS: two
    time-split files drained as two micro-batches. One user is
    removed from the late file, so their open state can ONLY close
    via the hasTimedOut branch when batch 2's watermark passes.
    Emissions must be exact built-in session_window sessions
    (nothing spurious), every session old enough relative to the
    batch-2 watermark must be present (completeness), and the
    early-only user's final session must be among them (the timeout
    branch demonstrably fired)."""
    import pandas as pd

    from umls2rdf_spark.sources.parquet import load_table
    from umls2rdf_spark.streaming.events import sessionize_stateful

    ev = load_table(spark, SF_DIR, "events")
    split_ts = ev.selectExpr(
        "percentile_approx(CAST(ts AS DOUBLE), 0.5) AS m"
    ).collect()[0]["m"]
    lone_user = ev.agg(F.min("user_id").alias("u")).collect()[0]["u"]
    early = ev.where(F.col("ts").cast("double") <= split_ts)
    late = ev.where(
        (F.col("ts").cast("double") > split_ts)
        & (F.col("user_id") != lone_user)
    )
    src = str(tmp_path / "stream_src")
    early.coalesce(1).write.parquet(f"{src}/f=1")
    late.coalesce(1).write.parquet(f"{src}/f=2")

    stream = (
        spark.readStream.schema(early.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f=*")
    )
    q = (
        sessionize_stateful(stream, gap="30 minutes", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("sessionize_stateful_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.table("sessionize_stateful_test").collect()
    }

    batch = [
        (r["user_id"], str(r["session_start"]), r["n"],
         r["session_start"])
        for r in _sessions_of(early.unionByName(late)).collect()
    ]
    batch_set = {(u, s, n) for u, s, n, _ in batch}
    # 1) nothing spurious
    assert got <= batch_set, got - batch_set

    # 2) completeness under the batch-2 watermark (conservative: a
    # session STARTING >1 day before the watermark has certainly
    # closed before it — gaps cap sessions well under a day)
    max_early = pd.Timestamp(
        early.agg(F.max("ts").alias("m")).collect()[0]["m"]
    )
    wm2 = max_early - pd.Timedelta("2 hours")
    must_emit = {
        (u, s, n)
        for u, s, n, start in batch
        if pd.Timestamp(start) < wm2 - pd.Timedelta("1 day")
    }
    assert must_emit, "test data should contain old sessions"
    missing = must_emit - got
    assert not missing, f"{len(missing)} watermark-closed sessions missing"

    # 3) the timeout branch fired: the lone user's FINAL session has
    # no later event anywhere in the stream to roll it — only
    # state.hasTimedOut can have emitted it
    lone_final = max(
        (s for u, s, n, _ in batch if u == lone_user), default=None
    )
    assert lone_final is not None
    assert any(
        u == lone_user and s == lone_final for u, s, n in got
    ), "lone user's final session was not emitted by the timeout"


def test_sessionize_stateful_out_of_order_backfill(spark, tmp_path):
    """An in-watermark out-of-order event from a LATER micro-batch
    must bridge two buffered sessions into one — the case a naive
    emit-on-rollover sessionizer gets wrong (it would emit two
    sessions and miscount). Three single-file batches: batch 1 gives
    user 1 two provisional sessions (10:00, 10:50); batch 2 delivers
    a late 10:25 event (>= the 10:00 watermark) that bridges them;
    batch 3 only advances the watermark so the merged session times
    out and emits."""
    from datetime import datetime

    from umls2rdf_spark.streaming.events import sessionize_stateful

    def ev(uid, hh, mm):
        return (uid, datetime(2024, 1, 1, hh, mm))

    schema = "user_id long, ts timestamp"
    f1 = spark.createDataFrame(
        [ev(1, 10, 0), ev(1, 10, 50), ev(9, 12, 0)], schema
    )
    f2 = spark.createDataFrame([ev(1, 10, 25), ev(9, 14, 0)], schema)
    f3 = spark.createDataFrame([ev(9, 23, 0)], schema)
    src = str(tmp_path / "ooo_src")
    for i, f in enumerate([f1, f2, f3], 1):
        f.coalesce(1).write.parquet(f"{src}/f={i}")

    stream = (
        spark.readStream.schema(f1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f=*")
    )
    q = (
        sessionize_stateful(stream, gap="30 minutes", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("sessionize_ooo_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.table("sessionize_ooo_test").collect()
    }
    # the bridged session: one emission, start 10:00, THREE events
    user1 = {(s, n) for u, s, n in got if u == 1}
    assert user1 == {("2024-01-01 10:00:00", 3)}, got


def test_left_outer_interval_join_watermark_withholding(spark):
    """LEFT-OUTER stream-stream interval join: every matched pair is
    emitted (append, exactly once), and a NULL row is emitted for
    exactly the purchases whose no-match status the click watermark
    has PROVEN — purchase_ts < max(click_ts) - watermark_delay (no
    future click can satisfy click_ts <= purchase_ts once the click
    watermark passes it). The batch twin keeps every unmatched
    purchase; the drained stream must equal the twin filtered to
    that provable set — the exact withholding semantics a user has
    to reason about when choosing outer interval joins."""
    import datetime

    from umls2rdf_spark.sources.parquet import load_table
    from umls2rdf_spark.streaming.events import (
        click_purchase_attribution,
        read_events_stream,
        run_append_to_memory,
    )

    def sides(df):
        return (
            df.where(F.col("event_type") == "click"),
            df.where(F.col("event_type") == "purchase"),
        )

    s_clicks, s_purch = sides(read_events_stream(spark, SF_DIR))
    got = run_append_to_memory(
        click_purchase_attribution(s_clicks, s_purch, how="leftOuter"),
        "attr_outer_test",
        spark,
    ).collect()
    ev = load_table(spark, SF_DIR, "events")
    b_clicks, b_purch = sides(ev)
    batch = click_purchase_attribution(
        b_clicks, b_purch, how="leftOuter"
    ).collect()

    g_matched = sorted(tuple(r) for r in got if r.click_id is not None)
    b_matched = sorted(tuple(r) for r in batch if r.click_id is not None)
    assert g_matched == b_matched and len(g_matched) > 0

    max_click = max(
        r.ts
        for r in ev.where(F.col("event_type") == "click").collect()
    )
    cutoff = max_click - datetime.timedelta(hours=2)
    g_null = sorted(
        (r.purchase_id, r.purchase_ts)
        for r in got
        if r.click_id is None
    )
    b_null_provable = sorted(
        (r.purchase_id, r.purchase_ts)
        for r in batch
        if r.click_id is None and r.purchase_ts < cutoff
    )
    assert g_null == b_null_provable and len(g_null) > 0
    # and some purchases ARE withheld on this data — the relationship
    # being pinned is a strict subset, not accidental equality
    b_null_all = [r for r in batch if r.click_id is None]
    assert len(b_null_all) > len(g_null)
