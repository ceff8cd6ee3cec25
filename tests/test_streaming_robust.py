"""Continuous MAD maintenance (streaming/robust.py): streamed state
== batch operator over the union EXACTLY at any split (value counts
are additive — no order sensitivity), replay is a no-op, and
compaction changes nothing a reader sees."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from umls2rdf_spark.operators.robust import mad_outlier_summary
from umls2rdf_spark.sources.parquet import load_table
from umls2rdf_spark.streaming.robust import (
    compact_value_state,
    read_mad_summary,
    run_mad_maintenance,
    value_counts_epoch,
)

SF_DIR = "/root/testdata/sf0.001"


def _vq():
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


def _summary(rows):
    return {r["event_type"]: tuple(r)[1:] for r in rows}


def test_streamed_equals_batch_any_split(spark, tmp_path):
    """Arbitrary (non-time-ordered!) 3-way split: merged counts are
    order-insensitive, so streamed == batch exactly."""
    ev = load_table(spark, SF_DIR, "events")
    parts = [ev.where(F.col("event_id") % 3 == p) for p in range(3)]
    src = _write_parts(spark, tmp_path, parts)
    state = str(tmp_path / "state")
    run_mad_maintenance(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "event_type", _vq,
    )
    got = _summary(
        read_mad_summary(spark, state, "event_type", k=3).collect()
    )
    want = _summary(
        mad_outlier_summary(ev, "event_type", _vq(), k=3).collect()
    )
    assert got == want and sum(v[3] for v in got.values()) > 0


def test_replay_is_noop_and_compaction_invisible(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    state = str(tmp_path / "state")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    value_counts_epoch(a, 0, state, "event_type", _vq())
    value_counts_epoch(b, 1, state, "event_type", _vq())
    before = _summary(
        read_mad_summary(spark, state, "event_type").collect()
    )
    # replay epoch 1: overwrite with identical content -> no change
    value_counts_epoch(b, 1, state, "event_type", _vq())
    assert _summary(
        read_mad_summary(spark, state, "event_type").collect()
    ) == before
    compact_value_state(spark, state)
    assert _summary(
        read_mad_summary(spark, state, "event_type").collect()
    ) == before


def test_replay_after_compaction_does_not_double_count(spark, tmp_path):
    """The round-8 advice hazard: an epoch whose partial was written
    but whose checkpoint never committed gets REPLAYED after a
    compaction that already absorbed it. The base manifest's
    folded_through makes the reader ignore the replayed partition,
    so the read stays exactly the batch answer."""
    ev = load_table(spark, SF_DIR, "events")
    state = str(tmp_path / "state")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    value_counts_epoch(a, 0, state, "event_type", _vq())
    value_counts_epoch(b, 1, state, "event_type", _vq())
    want = _summary(
        mad_outlier_summary(ev, "event_type", _vq()).collect()
    )
    compact_value_state(spark, state)
    # epoch 1 wrote its partial but its checkpoint never committed:
    # the restarted stream replays it (identical content — the
    # availableNow file-source contract) AFTER the compaction
    value_counts_epoch(b, 1, state, "event_type", _vq())
    assert _summary(
        read_mad_summary(spark, state, "event_type").collect()
    ) == want
    # a second compaction re-folds without loss, and a replay of the
    # newest folded epoch is again invisible
    compact_value_state(spark, state)
    value_counts_epoch(b, 1, state, "event_type", _vq())
    assert _summary(
        read_mad_summary(spark, state, "event_type").collect()
    ) == want


def test_new_epoch_after_compaction_counted_once(spark, tmp_path):
    """Post-compaction epochs extend the state exactly once: base
    (epochs 0..1) + fresh epoch 2 == batch over the 3-way union."""
    ev = load_table(spark, SF_DIR, "events")
    state = str(tmp_path / "state")
    parts = [ev.where(F.col("event_id") % 3 == p) for p in range(3)]
    value_counts_epoch(parts[0], 0, state, "event_type", _vq())
    value_counts_epoch(parts[1], 1, state, "event_type", _vq())
    compact_value_state(spark, state)
    value_counts_epoch(parts[2], 2, state, "event_type", _vq())
    got = _summary(
        read_mad_summary(spark, state, "event_type").collect()
    )
    want = _summary(
        mad_outlier_summary(ev, "event_type", _vq()).collect()
    )
    assert got == want


def test_torn_newest_epoch_heals_after_compaction(spark, tmp_path):
    """The newest raw epoch is NEVER folded: a torn partial write
    (crash mid-epoch) therefore cannot be frozen into the base —
    the eventual replay's full overwrite is what readers sum."""
    ev = load_table(spark, SF_DIR, "events")
    state = str(tmp_path / "state")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    value_counts_epoch(a, 0, state, "event_type", _vq())
    # epoch 1 lands TORN: only half its rows made it to disk
    value_counts_epoch(
        b.where(F.col("event_id") % 4 == 1), 1, state,
        "event_type", _vq(),
    )
    compact_value_state(spark, state)  # folds through epoch 0 only
    # restart: the stream replays epoch 1 with its FULL content
    value_counts_epoch(b, 1, state, "event_type", _vq())
    got = _summary(
        read_mad_summary(spark, state, "event_type").collect()
    )
    want = _summary(
        mad_outlier_summary(ev, "event_type", _vq()).collect()
    )
    assert got == want


def test_compaction_gc_bounds_state(spark, tmp_path):
    """Repeated compaction keeps disk state bounded: absorbed epochs
    and superseded bases are deleted with one generation of grace,
    and reads stay exact throughout."""
    import os
    import re

    ev = load_table(spark, SF_DIR, "events")
    state = str(tmp_path / "state")
    parts = [ev.where(F.col("event_id") % 5 == p) for p in range(5)]
    want = _summary(
        mad_outlier_summary(ev, "event_type", _vq()).collect()
    )
    for e, p in enumerate(parts):
        value_counts_epoch(p, e, state, "event_type", _vq())
        compact_value_state(spark, state)
    got = _summary(
        read_mad_summary(spark, state, "event_type").collect()
    )
    assert got == want
    # bases: at most the newest + one generation of grace
    bases = [
        f for f in os.listdir(state)
        if re.fullmatch(r"valcounts_base_v\d+\.json", f)
    ]
    assert len(bases) <= 2
    # absorbed epochs beyond the grace window are gone
    epochs = [
        int(d.split("=")[1])
        for d in os.listdir(f"{state}/valcounts")
        if d.startswith("batch_id=")
    ]
    # last base folded through epoch 2 (newest=4 stays raw, 3 was
    # the previous fold boundary... grace keeps one generation)
    assert min(epochs) >= 2 and 4 in epochs
