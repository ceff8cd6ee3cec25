"""Continuous lexical decontamination (streaming/decontam.py):
single epoch == batch operator exactly, multi-epoch UNION == batch
on the union (decontamination commutes with epoch boundaries — the
stronger contract the stateless-per-doc shape buys), replay is a
no-op, and a missing benchmark index fails the batch instead of
fail-open-admitting everything."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from umls2rdf_spark.operators.corpus import decontaminate_lexical
from umls2rdf_spark.sources.parquet import load_table
from umls2rdf_spark.streaming.decontam import (
    decontam_epoch,
    run_decontam_intake,
    stage_benchmark,
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


def _bench(docs):
    return docs.where(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(
            F.slice(
                F.split(F.col("text"), " "),
                1,
                F.greatest(
                    F.lit(3),
                    F.expr(
                        "CAST((size(split(text, ' ')) * 3) div 5"
                        " AS INT)"
                    ),
                ),
            ),
            " ",
        ).alias("text"),
    )


def _rows(df):
    return sorted(
        (
            r["doc_id"],
            r["max_jaccard"],
            r["max_bench_containment"],
            r["keep"],
        )
        for r in df.collect()
    )


def test_multi_epoch_union_equals_batch(spark, tmp_path):
    """Three epochs streamed one file per trigger: the union of
    verdict partitions equals batch decontaminate_lexical over the
    union of epochs row for row (and therefore any single epoch
    equals the batch operator on that epoch — same property)."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    )
    bench = _bench(docs)
    state = str(tmp_path / "state")
    stage_benchmark(bench, state, "bench_id", "text")
    epochs = [
        docs.where(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    src = _write_parts(spark, tmp_path, epochs)
    run_decontam_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "doc_id", "text",
    )
    got = _rows(spark.read.parquet(f"{state}/verdicts"))
    want = _rows(
        decontaminate_lexical(
            docs, bench, "doc_id", "text", "bench_id", "text"
        )
    )
    assert got == want and len(got) > 0
    assert any(not k for (_, _, _, k) in got)  # the gate bites


def test_replay_is_noop(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).where(F.col("doc_id") < 200)
    bench = _bench(docs)
    state = str(tmp_path / "state")
    stage_benchmark(bench, state, "bench_id", "text")
    first = _rows(decontam_epoch(docs, 0, state, "doc_id", "text"))
    replay = _rows(decontam_epoch(docs, 0, state, "doc_id", "text"))
    assert first == replay
    # and the partition holds exactly one epoch's verdicts
    assert _rows(spark.read.parquet(f"{state}/verdicts")) == [
        r for r in first
    ]


def test_missing_benchmark_index_fails_closed(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).limit(10)
    with pytest.raises(Exception, match="benchidx|PATH_NOT_FOUND"):
        decontam_epoch(
            docs, 0, str(tmp_path / "nostate"), "doc_id", "text"
        )
