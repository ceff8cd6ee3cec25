"""Structured Streaming over the events table.

Batch twins live in plans/analytics_extra.py (events_windowed,
sessionize) — same logical semantics, so the batch oracle checks also
validate the streaming transformations. Streams read the same parquet
with ``readStream`` + an explicit schema; watermarks bound state for
late data; ``Trigger.AvailableNow`` drains everything for tests.

Scale: windowed counts keep one state row per (window, event_type) —
bounded by the watermark horizon; the stateful session counter keeps
one state row per user and emits deltas per micro-batch.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of events parquet, normalizing ``ts`` to a
    microsecond TimestampType exactly like sources/parquet.load_table
    (the driver testdata has shipped both TIMESTAMP(NANOS) and naive
    timestamp[us] across rounds). The physical ts type is probed from
    a batch schema read (footer-only, no data scan); the file-stream
    source requires a directory, so we scan ``sf_dir`` with a glob
    filter."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    batch_ts = dict(spark.read.parquet(path).dtypes).get("ts")
    # Declare the stream schema from what the batch read actually
    # reports: bigint (TIMESTAMP(NANOS) under nanosAsLong), naive
    # timestamp_ntz, or tz-adjusted timestamp. Substituting NTZ for a
    # tz-adjusted file would error or SHIFT values — pass plain
    # TimestampType through unchanged instead.
    if batch_ts == "bigint":
        ts_field = T.StructField("ts", T.LongType())
    elif batch_ts == "timestamp_ntz":
        ts_field = T.StructField("ts", T.TimestampNTZType())
    else:
        ts_field = T.StructField("ts", T.TimestampType())
    schema = T.StructType(
        [f if f.name != "ts" else ts_field
         for f in EVENTS_STREAM_SCHEMA.fields]
    )
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if batch_ts == "bigint":
        return stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    if batch_ts == "timestamp_ntz":
        return stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of analytics_extra.events_windowed: tumbling
    window counts + exact decimal value sums, late data bounded by the
    watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(10,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket"), "event_type", "n", "total_value"
        )
    )


def user_event_counts_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count maintained in GroupState across micro-batches
    (the 'custom stateful operator' surface of the engine)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id long, n_events long"
    state_schema = "n long"

    def update(key, pdfs, state):
        import pandas as pd

        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
        (prev,) = state.get if state.exists else (0,)
        total = prev + n_new
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessionization as a CUSTOM stateful operator with
    EVENT-TIME TIMEOUTS — the stateful pattern the rest of the block
    does not exercise: state that must close itself WITHOUT a new
    record arriving.

    Correct watermark semantics (the part a naive
    emit-on-gap-rollover version gets wrong): sessions are BUFFERED
    in state — a list of disjoint (start, last, n) intervals per
    user — and emitted only once the watermark passes last + gap,
    because an in-watermark out-of-order event from a later
    micro-batch may still extend, backfill, or BRIDGE buffered
    sessions (two sessions merging when a late event lands between
    them). Each batch inserts its events as singleton intervals and
    re-coalesces the sorted list (exactly the built-in
    session_window merge rule: adjacent intervals within ``gap``
    fuse); rows older than the current watermark are dropped (the
    allowed-lateness contract). State size is bounded by the users
    active within the watermark+gap horizon, not the stream length.

    Emission: any buffered session with last + gap < watermark can
    never change again (future rows are >= watermark) — emitted and
    evicted, either when a batch touches the group or via the
    event-time timeout at last + gap when no row ever arrives
    again. The equivalence test proves emissions are exactly the
    built-in session_window sessions closed before the final
    watermark, including a cross-batch out-of-order case.

    Emits (user_id, session_start, n_events); append mode.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id long, session_start timestamp, n_events long"
    state_schema = "starts array<long>, lasts array<long>, ns array<long>"

    def update(key, pdfs, state):
        import pandas as pd

        gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            starts, lasts, ns = state.get
            intervals = [list(t) for t in zip(starts, lasts, ns)]
        else:
            intervals = []
        if not state.hasTimedOut:
            parts = [pdf["ts"] for pdf in pdfs if len(pdf)]
            if parts:
                ser = pd.to_datetime(pd.concat(parts))
                if getattr(ser.dt, "tz", None) is not None:
                    ser = ser.dt.tz_localize(None)
                # normalize to ns first (pandas 2.x may carry a
                # non-ns unit; pandas 1.x is always ns and lacks
                # as_unit / the datetime64[us] astype), then int64
                # ns // 1000 → µs on both major versions
                if hasattr(ser.dt, "as_unit"):
                    ser = ser.dt.as_unit("ns")
                for v in ser.astype("int64") // 1000:
                    t = int(v)
                    if t >= wm_us:  # beyond-lateness rows are dropped
                        intervals.append([t, t, 1])
        if intervals:
            intervals.sort()
            merged = [intervals[0]]
            for st, la, n in intervals[1:]:
                if st - merged[-1][1] <= gap_us:
                    merged[-1][1] = max(merged[-1][1], la)
                    merged[-1][2] += n
                else:
                    merged.append([st, la, n])
        else:
            merged = []
        closed = [iv for iv in merged if iv[1] + gap_us < wm_us]
        open_ = [iv for iv in merged if iv[1] + gap_us >= wm_us]
        if open_:
            state.update(
                (
                    [iv[0] for iv in open_],
                    [iv[1] for iv in open_],
                    [iv[2] for iv in open_],
                )
            )
            # fire just after the earliest possible close (epoch ms,
            # strictly past the current watermark by construction)
            state.setTimeoutTimestamp(
                min(iv[1] + gap_us for iv in open_) // 1000 + 1
            )
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [
                        pd.Timestamp(iv[0], unit="us") for iv in closed
                    ],
                    "n_events": [iv[2] for iv in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_to_memory(
    stream_df: DataFrame, query_name: str, spark: SparkSession
) -> DataFrame:
    """Drain a (complete-mode-capable) streaming aggregation into an
    in-memory table with AvailableNow and return the result — the
    test/validation harness for streaming plans."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark on the
    event id — the streaming twin of the batch dedup operators; state
    per id is evicted once the watermark passes, so memory is bounded
    by the dedup horizon instead of the stream length."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def dedup_events_batch(events: DataFrame) -> DataFrame:
    """Batch twin of streaming_dedup: one surviving row per event_id.
    Within the watermark horizon the streaming form applies exactly
    these semantics, so an equivalence test between the two (same
    duplicated input) is the oracle for the streaming dedup state
    logic."""
    return events.dropDuplicates(["event_id"])


def enriched_windowed_value(
    events: DataFrame,
    customers: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment: broadcast-join the event stream
    against the customer dim, then windowed per-segment aggregation —
    the standard streaming feature-pipeline shape. The static side is
    re-resolved per micro-batch and broadcast to the stream; state
    stays bounded by (window, segment) under the watermark."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("c_mktsegment"))
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
    )


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-STREAM interval join — the attribution shape: every
    (purchase, click) pair by the same user where the click precedes
    the purchase by at most ``max_gap``.

    Both inputs may be streaming. Each side carries its own watermark
    and the join condition bounds event time in BOTH directions
    (click_ts <= purchase_ts <= click_ts + gap), which is what lets
    the state store evict: a buffered click older than
    watermark + max_gap can never match a future purchase and is
    dropped, so state is bounded by the time horizon, not the stream
    length. Inner interval joins run in append mode — each matched
    pair is emitted exactly once.

    The same function applied to batch frames is its own batch twin
    (the expressions are identical; only the source differs), which
    is how the equivalence test oracles the streaming state logic.

    ``how="leftOuter"`` keeps UNATTRIBUTED purchases (null click
    columns) — the "conversion without a tracked click" shape. In
    streaming, an outer null row is emitted only once the CLICK
    side's watermark has passed the purchase's event time (no future
    click can satisfy click_ts <= purchase_ts), so the drained
    stream yields every matched pair but only the null rows whose
    no-match status the watermark has proven; the batch twin keeps
    them all. tests/test_streaming_multimodal.py pins exactly that
    relationship.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    p = purchases.select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        "value",
    )
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")
        ),
        how,
    ).select(
        "purchase_id", "click_id", "user_id", "purchase_ts", "click_ts",
        "value",
    )


def make_idempotent_batch_writer(out_dir: str):
    """foreachBatch writer that overwrites a ``batch_id=N``
    subdirectory per epoch. foreachBatch is at-least-once: after a
    restart that wrote a batch but crashed before the checkpoint
    committed, the SAME batch id is replayed — a blind append would
    duplicate its rows, the keyed overwrite rewrites the same
    directory instead. Readers get exactly-once by reading ``out_dir``
    (batch_id becomes a partition column)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return write_batch


def run_foreach_batch_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """foreachBatch sink: write each micro-batch to a parquet
    directory — the pattern for sinks Structured Streaming lacks
    natively (JDBC upserts, multi-table writes). AvailableNow drains
    the source; exactly-once for readers comes from the checkpointed
    batch id keying an idempotent per-epoch overwrite
    (:func:`make_idempotent_batch_writer`)."""
    q = (
        stream_df.writeStream.foreachBatch(
            make_idempotent_batch_writer(out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ── streaming corpus ingestion (stateless LLM-prep stages) ─────────
def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table — the continuous-
    ingestion shape for a training-data pipeline (new corpus shards
    landing in a directory). Schema is pinned from a batch read; a
    production reader would declare it from the catalog."""
    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    # the file-stream source requires a directory: scan sf_dir with a
    # glob filter (same workaround as read_events_stream)
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def corpus_ingest_stream(
    docs: DataFrame,
    bloom: DataFrame | None = None,
    bloom_shingle_n: int = 4,
    bloom_m_bits: int = 1 << 20,
    bloom_k: int = 3,
) -> DataFrame:
    """Streaming corpus intake: PII scrub + fused per-doc features,
    keeping docs above a minimal quality bar — optionally dropping
    benchmark-contaminated docs against a ``bloom`` bitmap
    (:func:`~umls2rdf_spark.operators.corpus.bloom_bitmap`, one
    broadcast 128 KB row) BEFORE they ever land in the corpus.

    Every stage is a stateless column map (regexp chain, one
    tokenization, ratio arithmetic; the bloom check is k hash+bit
    probes per distinct shingle after a stream-static broadcast
    cross join), so the EXACT batch operators run unchanged under
    Structured Streaming — no watermark, no state store;
    per-microbatch cost is the same scan-speed codegen as the batch
    path. The relational count==k decontamination form needs an
    aggregation a stream cannot run in append mode — the bitmap form
    is the stream-legal equivalent (flag-identical, pinned by test).
    Stateful corpus stages (dedup, packing) stay in the batch layer
    over the ingested table — they need global order or cross-shard
    joins that a stream cannot see.

    The bloom gate runs on the RAW text, before scrubbing — the
    benchmark index was built from raw benchmark text, and scrub
    placeholders would perturb the n-grams being probed.
    """
    from umls2rdf_spark.operators.corpus import bloom_contaminated
    from umls2rdf_spark.operators.textstats import scrub_text, text_features

    if bloom is not None:
        docs = (
            docs.crossJoin(F.broadcast(bloom))
            .where(
                ~bloom_contaminated(
                    "text", "bloom",
                    shingle_n=bloom_shingle_n,
                    m_bits=bloom_m_bits,
                    k=bloom_k,
                )
            )
            .drop("bloom")
        )
    clean = scrub_text(docs, "text")
    feats = text_features(clean, "doc_id", "text")
    return feats.where(
        (F.col("n_tokens") >= 3)
        & (F.col("quality") > 0.3)
        & (F.col("punct_ratio") < 0.5)
    )


def run_append_to_memory(
    stream_df: DataFrame, query_name: str, spark: SparkSession
) -> DataFrame:
    """AvailableNow drain for STATELESS streams (append mode — no
    aggregation state, rows pass through per microbatch)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def streaming_incremental_dedupe(
    docs_stream: DataFrame,
    base_fingerprints: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin of operators.dedup.incremental_dedupe: admit a
    live document feed against the standing corpus's fingerprint
    index.

    Two stages, both streaming-native: a stream-static LEFT ANTI join
    drops documents whose md5 fingerprint already exists in the base
    index (the static side re-resolves per micro-batch, so a
    concurrently-growing index is picked up on the next batch), then
    ``dropDuplicates`` on the fingerprint removes repeats WITHIN the
    stream (state grows with distinct new fingerprints — bound it
    with a watermarked variant when the feed is unbounded).

    The batch twin is incremental_dedupe(base_is_fingerprints=True)
    up to its min-id representative rule: a stream keeps the FIRST
    arrival instead (arrival order is the stream's notion of
    priority), so the equivalence test feeds ids in order.
    """
    fp = docs_stream.withColumn("__fp", F.md5(F.col(text_col)))
    fresh = fp.join(
        base_fingerprints.select(F.col("text_hash").alias("__fp")),
        "__fp",
        "left_anti",
    )
    return fresh.dropDuplicates(["__fp"]).drop("__fp")


def read_standing_state(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a standing-state table, returning None ONLY when the path
    does not exist yet (first batch) or exists but holds no data files
    (a checkpoint-created empty directory). Any OTHER failure — a
    transient storage error, a permissions blip, a corrupt footer —
    propagates and FAILS the micro-batch so the checkpoint retries it.
    Swallowing those would silently dedupe the batch against nothing
    and admit every near-duplicate (fail-open corruption)."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        probe = getattr(
            e, "getCondition", getattr(e, "getErrorClass", lambda: None)
        )
        err = probe() or ""
        msg = str(e)
        if (
            "PATH_NOT_FOUND" in err
            or "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            or "UNABLE_TO_INFER_SCHEMA" in err
            or "Unable to infer schema" in msg
        ):
            return None
        raise


def minhash_epoch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 8,
    shingle_n: int = 3,
    rows_per_band: int = 1,
    min_jaccard: float | None = 0.5,
) -> DataFrame:
    """ONE epoch of the continuous near-dup intake: dedupe the batch
    against the standing corpus/index (own epoch partitions excluded
    — replay-idempotent), overwrite this epoch's ``corpus`` and
    ``index`` partitions, return the admitted rows. Factored out of
    the intake loop so the composed crawl intake
    (streaming/crawl.py) runs the identical admission inside its
    single foreachBatch."""
    from umls2rdf_spark.operators.dedup import (
        band_signatures,
        incremental_minhash_dedupe,
        minhash_signatures_mapside,
    )

    corpus_dir = f"{state_dir}/corpus"
    index_dir = f"{state_dir}/index"
    spark = batch_df.sparkSession
    empty = batch_df.limit(0)
    base_raw = read_standing_state(spark, corpus_dir)
    if base_raw is None:  # first batch: no standing state yet
        base, index = empty, None
    else:
        base = base_raw.where(
            F.col("batch_id") != batch_id
        ).drop("batch_id")
        index_raw = read_standing_state(spark, index_dir)
        index = (
            index_raw.where(F.col("batch_id") != batch_id)
            .drop("batch_id")
            if index_raw is not None
            else None
        )
    admitted = incremental_minhash_dedupe(
        batch_df, base, id_col, text_col,
        num_perm=num_perm, shingle_n=shingle_n,
        rows_per_band=rows_per_band, min_jaccard=min_jaccard,
        base_index=index,
    )
    admitted.write.mode("overwrite").parquet(
        f"{corpus_dir}/batch_id={batch_id}"
    )
    out = spark.read.parquet(f"{corpus_dir}/batch_id={batch_id}")
    sigs = minhash_signatures_mapside(
        out, id_col, text_col,
        num_perm=num_perm, shingle_n=shingle_n,
    )
    band_signatures(sigs, id_col, rows_per_band).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/batch_id={batch_id}")
    return out


def run_incremental_minhash_ingest(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 8,
    shingle_n: int = 3,
    rows_per_band: int = 1,
    min_jaccard: float | None = 0.5,
) -> None:
    """The complete continuous NEAR-dup intake loop, streaming form of
    operators.dedup.incremental_minhash_dedupe: each micro-batch is
    deduped against the standing corpus, and the admitted documents
    GROW the standing state for the next batch.

    Standing state (both plain parquet tables a batch consumer can
    read at any time):

    - ``{state_dir}/corpus`` — admitted documents,
    - ``{state_dir}/index``  — their band-signature index, built with
      the map-side signature path (zero-shuffle projection).

    Cross-batch near-dup semantics come from the index growth, not
    from stream state — no watermark or state store; the multi-stage
    dedup (banding joins, Jaccard verify) runs as a BATCH plan inside
    foreachBatch, the standard shape for per-batch logic Structured
    Streaming's operator set cannot express. Writes are keyed by the
    checkpointed batch id (``batch_id=N`` subdirs, same idempotent
    pattern as :func:`make_idempotent_batch_writer`): an at-least-once
    replay overwrites its own epoch instead of double-admitting, and
    a replayed epoch sees the same standing state because its own
    prior partial writes are excluded from the base (filtered out by
    batch id) before deduping.
    """
    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        minhash_epoch(
            batch_df, batch_id, state_dir, id_col, text_col,
            num_perm, shingle_n, rows_per_band, min_jaccard,
        )

    q = (
        docs_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
