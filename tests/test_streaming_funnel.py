"""Continuous funnel intake (streaming/funnel.py): single epoch
equals the batch operator, time-ordered multi-epoch equals batch
over the union EXACTLY, cross-epoch conversions complete, and
replays are no-ops."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from umls2rdf_spark.operators.funnel import funnel_counts
from umls2rdf_spark.sources.parquet import load_table
from umls2rdf_spark.streaming.funnel import (
    funnel_epoch,
    read_funnel_counts,
    run_funnel_intake,
)

SF_DIR = "/root/testdata/sf0.001"
STEPS = ["signup", "click", "purchase"]


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


def _counts(rows):
    return {r["step"]: r["n_users"] for r in rows}


def test_single_epoch_equals_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    )
    src = _write_parts(spark, tmp_path, [ev])
    state = str(tmp_path / "state")
    run_funnel_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "user_id", "event_type", "ts", STEPS,
    )
    got = _counts(read_funnel_counts(spark, state, STEPS).collect())
    want = _counts(
        funnel_counts(ev, "user_id", "event_type", "ts", STEPS).collect()
    )
    assert got == want and got[1] > 0


def test_time_ordered_epochs_equal_batch_exactly(spark, tmp_path):
    """Split the real events at ts terciles — the watermark contract
    (per-user time-ordered arrival) holds globally, so streamed ==
    batch exactly."""
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    )
    us = ev.withColumn("__us", F.unix_micros("ts"))
    t1, t2 = us.approxQuantile("__us", [1 / 3, 2 / 3], 0.0)
    parts = [
        us.where(F.col("__us") <= t1).drop("__us"),
        us.where((F.col("__us") > t1) & (F.col("__us") <= t2)).drop(
            "__us"
        ),
        us.where(F.col("__us") > t2).drop("__us"),
    ]
    src = _write_parts(spark, tmp_path, parts)
    state = str(tmp_path / "state")
    run_funnel_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "user_id", "event_type", "ts", STEPS,
    )
    got = _counts(read_funnel_counts(spark, state, STEPS).collect())
    want = _counts(
        funnel_counts(ev, "user_id", "event_type", "ts", STEPS).collect()
    )
    assert got == want


def test_cross_epoch_conversion_completes(spark, tmp_path):
    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    mk = lambda rows: spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )
    parts = [
        mk([(1, "signup", t(1))]),
        mk([(1, "click", t(2))]),
        mk([(1, "purchase", t(3))]),
    ]
    src = _write_parts(spark, tmp_path, parts)
    state = str(tmp_path / "state")
    run_funnel_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "user_id", "event_type", "ts", STEPS,
    )
    got = _counts(read_funnel_counts(spark, state, STEPS).collect())
    assert got == {1: 1, 2: 1, 3: 1}


def test_replay_is_noop(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    ).where(F.col("user_id") < 50)
    state = str(tmp_path / "state")
    first = _counts(
        funnel_epoch(
            ev, 0, state, "user_id", "event_type", "ts", STEPS
        ).collect()
    )
    replay = _counts(
        funnel_epoch(
            ev, 0, state, "user_id", "event_type", "ts", STEPS
        ).collect()
    )
    assert replay == first
