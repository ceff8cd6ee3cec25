"""Continuous CDC chunk-store intake (streaming/cdc.py): a single
epoch equals the batch operator exactly, contiguous-range multi-epoch
streaming equals batch over the whole corpus EXACTLY (keep-first is
prefix-stable), cross-epoch dedup fires, and replays are no-ops."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from umls2rdf_spark.operators.cdc import cdc_dedup_stats
from umls2rdf_spark.sources.parquet import load_table
from umls2rdf_spark.streaming.cdc import (
    cdc_epoch,
    read_stats,
    run_cdc_intake,
)

SF_DIR = "/root/testdata/sf0.001"


def _stream(spark, src_dir):
    schema = spark.read.parquet(f"{src_dir}/part0.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src_dir)
    )


def _write_parts(spark, tmp_path, frames):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    for p, f in enumerate(frames):
        pq.write_table(
            pa.Table.from_pandas(f.toPandas(), preserve_index=False),
            str(src / f"part{p}.parquet"),
        )
    return str(src)


def _stats_map(rows):
    return {
        r["doc_id"]: (r["n_chunks"], r["n_dup"], r["dup_chars"])
        for r in rows
    }


def test_single_epoch_equals_batch(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    )
    src = _write_parts(spark, tmp_path, [docs])
    state = str(tmp_path / "state")
    run_cdc_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "doc_id", "text",
    )
    got = _stats_map(read_stats(spark, state).collect())
    want = _stats_map(
        cdc_dedup_stats(docs, "doc_id", "text").collect()
    )
    assert got == want
    assert sum(v[1] for v in got.values()) > 0


def test_contiguous_epochs_equal_batch_exactly(spark, tmp_path):
    """Arrival order == corpus order -> the streamed union IS the
    batch result, not an approximation (prefix stability)."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    )
    n = docs.count()
    a, b = n // 3, 2 * n // 3
    parts = [
        docs.where(F.col("doc_id") < a),
        docs.where((F.col("doc_id") >= a) & (F.col("doc_id") < b)),
        docs.where(F.col("doc_id") >= b),
    ]
    src = _write_parts(spark, tmp_path, parts)
    state = str(tmp_path / "state")
    run_cdc_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "doc_id", "text",
    )
    got = _stats_map(read_stats(spark, state).collect())
    want = _stats_map(
        cdc_dedup_stats(docs, "doc_id", "text").collect()
    )
    assert got == want
    # and dedup genuinely crossed an epoch boundary: some doc in a
    # later epoch has dups the epoch alone would not produce
    later = [
        d for d, v in got.items()
        if d >= a and v[1] > 0
    ]
    assert later


def test_cross_epoch_duplicate_fully_dedups(spark, tmp_path):
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon " * 6
    )
    e0 = spark.createDataFrame(
        [(0, base)], "doc_id bigint, text string"
    )
    e1 = spark.createDataFrame(
        [(1, base)], "doc_id bigint, text string"
    )
    src = _write_parts(spark, tmp_path, [e0, e1])
    state = str(tmp_path / "state")
    run_cdc_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "doc_id", "text",
    )
    got = _stats_map(read_stats(spark, state).collect())
    # the epoch-1 copy dedups ALL its chunks against the epoch-0 store
    assert got[1][1] == got[1][0] > 0


def test_replay_is_noop(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).where(F.col("doc_id") < 50)
    state = str(tmp_path / "state")
    first = _stats_map(
        cdc_epoch(docs, 0, state, "doc_id", "text").collect()
    )
    idx0 = spark.read.parquet(f"{state}/chunkidx").count()
    replay = _stats_map(
        cdc_epoch(docs, 0, state, "doc_id", "text").collect()
    )
    assert replay == first
    assert spark.read.parquet(f"{state}/chunkidx").count() == idx0
