"""Continuous trend maintenance (streaming/trend.py): streamed
state == batch grouped_trend over the union EXACTLY at any split
(sufficient statistics are additive — order-insensitive), and
replay is a no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from umls2rdf_spark.operators.regression import grouped_trend
from umls2rdf_spark.sources.parquet import load_table
from umls2rdf_spark.streaming.trend import (
    read_trend,
    run_trend_maintenance,
    trend_stats_epoch,
)

SF_DIR = "/root/testdata/sf0.001"
_ANCHOR = 1_704_067_200


def _x():
    return F.unix_timestamp("ts").cast("bigint") - _ANCHOR


def _y():
    return F.floor(F.col("value") * 1_000_000)


def _stream(spark, src_dir):
    schema = spark.read.parquet(f"{src_dir}/part0.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src_dir)
    )


def _write_parts(spark, tmp_path, frames):
    """Write each frame as one parquet file via Spark (a pandas
    round-trip would turn the timestamp column into int64 nanos and
    break the stream schema)."""
    import glob
    import shutil

    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    for p, f in enumerate(frames):
        stage = str(tmp_path / f"stage{p}")
        f.coalesce(1).write.mode("overwrite").parquet(stage)
        (data_file,) = glob.glob(f"{stage}/part-*.parquet")
        shutil.move(data_file, str(src / f"part{p}.parquet"))
    return str(src)


def _slopes(rows):
    return {r["event_type"]: tuple(r)[1:] for r in rows}


def test_streamed_equals_batch_any_split(spark, tmp_path):
    """Non-time-ordered 3-way split: the epoch-summed statistics
    are order-insensitive, so streamed == batch exactly."""
    ev = load_table(spark, SF_DIR, "events")
    parts = [ev.where(F.col("event_id") % 3 == p) for p in range(3)]
    src = _write_parts(spark, tmp_path, parts)
    state = str(tmp_path / "state")
    run_trend_maintenance(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "event_type", _x, _y,
    )
    got = _slopes(read_trend(spark, state, "event_type").collect())
    want = _slopes(
        grouped_trend(ev, "event_type", _x(), _y()).collect()
    )
    assert got == want
    assert any(v[1] is not None and v[1] != 0 for v in got.values())


def test_replay_is_noop(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    state = str(tmp_path / "state")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    trend_stats_epoch(a, 0, state, "event_type", _x(), _y())
    trend_stats_epoch(b, 1, state, "event_type", _x(), _y())
    before = _slopes(read_trend(spark, state, "event_type").collect())
    trend_stats_epoch(b, 1, state, "event_type", _x(), _y())
    assert (
        _slopes(read_trend(spark, state, "event_type").collect())
        == before
    )
    # and the merged state matches the full batch answer
    assert before == _slopes(
        grouped_trend(ev, "event_type", _x(), _y()).collect()
    )
