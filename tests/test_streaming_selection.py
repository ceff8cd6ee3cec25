"""Continuous calibrated/budgeted selection (streaming/selection.py):
the streamed multi-epoch CDF must equal the single-shot batch CDF of
the same corpus EXACTLY, admission must re-calibrate old documents
against the moved CDF, replays must be no-ops, and the budgeted face
must match the batch sampler run on the batch-calibrated set."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from umls2rdf_spark.operators.selection import (
    score_percentile,
    weighted_sample,
)
from umls2rdf_spark.sources.parquet import load_table
from umls2rdf_spark.streaming.selection import (
    budgeted_admit,
    calibrated_admit,
    read_score_dim,
    run_calibration_maintenance,
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


def _split_corpus(spark, tmp_path, parts=3):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    )
    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    for p in range(parts):
        pdf = docs.where(F.col("doc_id") % parts == p).toPandas()
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            str(src / f"part{p}.parquet"),
        )
    return docs, str(src)


def test_streamed_cdf_equals_batch_percentiles(spark, tmp_path):
    docs, src = _split_corpus(spark, tmp_path)
    state = str(tmp_path / "state")
    run_calibration_maintenance(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        score_col="n_chars",
    )
    epochs = (
        spark.read.parquet(f"{state}/cdf")
        .select("batch_id").distinct().count()
    )
    assert epochs >= 2

    dim = read_score_dim(spark, state, "n_chars")
    # admitting at floor 0 = pure calibration: must equal the batch
    # operator applied to everything ingested so far
    got = sorted(
        map(
            tuple,
            calibrated_admit(docs, dim, "n_chars", "source", 0).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            score_percentile(docs, "doc_id", "n_chars", "source").collect(),
        )
    )
    assert got == want


def test_admission_recalibrates_as_cdf_moves(spark, tmp_path):
    """Stream half the corpus, admit; stream the rest, admit again:
    a document's percentile under the FULL CDF differs from its
    half-corpus percentile (the CDF moved), and the standing view
    reflects the move — the semantic a fixed threshold can't give."""
    docs, src = _split_corpus(spark, tmp_path, parts=2)
    half = docs.where(F.col("doc_id") % 2 == 0)
    state = str(tmp_path / "state")

    import pyarrow.parquet as pq
    import pyarrow as pa

    src1 = tmp_path / "s1"
    os.makedirs(src1, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(
            half.toPandas(), preserve_index=False
        ),
        str(src1 / "part0.parquet"),
    )
    run_calibration_maintenance(
        _stream(spark, str(src1)), state, str(tmp_path / "c1"),
        score_col="n_chars",
    )
    dim1 = read_score_dim(spark, state, "n_chars")
    first = {
        r["doc_id"]: r["pct_ppm"]
        for r in calibrated_admit(
            half, dim1, "n_chars", "source", 0
        ).collect()
    }
    # equal to the batch operator on the half corpus
    want1 = {
        r["doc_id"]: r["pct_ppm"]
        for r in score_percentile(
            half, "doc_id", "n_chars", "source"
        ).collect()
    }
    assert first == want1

    # second epoch: a deliberately LOW-scoring cohort arrives (same
    # sources, n_chars below every existing value), so every old
    # document's strictly-below percentile must RISE
    low = half.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "source",
        (F.col("n_chars") % 3 - 3).alias("n_chars"),
    )
    pq.write_table(
        pa.Table.from_pandas(low.toPandas(), preserve_index=False),
        str(src1 / "part1.parquet"),
    )
    run_calibration_maintenance(
        _stream(spark, str(src1)), state, str(tmp_path / "c1"),
        score_col="n_chars",
    )
    dim2 = read_score_dim(spark, state, "n_chars")
    second = {
        r["doc_id"]: r["pct_ppm"]
        for r in calibrated_admit(
            half, dim2, "n_chars", "source", 0
        ).collect()
    }
    want2 = {
        r["doc_id"]: r["pct_ppm"]
        for r in score_percentile(
            half.unionByName(low), "doc_id", "n_chars", "source"
        ).collect()
        if r["doc_id"] < 1_000_000
    }
    assert second == want2
    assert second != first  # the CDF actually moved
    assert all(second[d] >= first[d] for d in first)


def test_replay_is_noop(spark, tmp_path):
    """Re-writing the same batch_id partition (an at-least-once
    replay) leaves the standing CDF unchanged."""
    docs, src = _split_corpus(spark, tmp_path)
    state = str(tmp_path / "state")
    run_calibration_maintenance(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        score_col="n_chars",
    )
    dim_before = sorted(
        map(tuple, read_score_dim(spark, state, "n_chars").collect())
    )
    # simulate the replay of epoch 0: same partial, same partition
    from umls2rdf_spark.operators.selection import score_counts

    batch0 = docs.where(F.col("doc_id") % 3 == 0)
    score_counts(batch0, "n_chars", "source").write.mode(
        "overwrite"
    ).parquet(f"{state}/cdf/batch_id=0")
    dim_after = sorted(
        map(tuple, read_score_dim(spark, state, "n_chars").collect())
    )
    assert dim_before == dim_after


def test_budgeted_admit_matches_batch_sampler(spark, tmp_path):
    docs, src = _split_corpus(spark, tmp_path)
    state = str(tmp_path / "state")
    run_calibration_maintenance(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        score_col="n_chars",
    )
    dim = read_score_dim(spark, state, "n_chars")
    got = sorted(
        r["doc_id"]
        for r in budgeted_admit(
            docs, dim, "doc_id", "n_chars", "source",
            min_pct_ppm=250_000, k=50, seed=7,
        ).collect()
    )
    # batch twin: percentile -> threshold -> identical sampler
    admitted = (
        score_percentile(docs, "doc_id", "n_chars", "source")
        .where(F.col("pct_ppm") >= 250_000)
        .withColumn("__w", F.col("pct_ppm") + F.lit(1))
    )
    want = sorted(
        r["doc_id"]
        for r in weighted_sample(
            admitted, "doc_id", "__w", 50, seed=7
        ).collect()
    )
    assert got == want and 0 < len(got) <= 50


def test_read_before_first_batch_is_none(spark, tmp_path):
    assert (
        read_score_dim(spark, str(tmp_path / "nope"), "n_chars") is None
    )
