"""Continuous robust statistics: keep per-group median/MAD outlier
summaries live over an event stream — the monitoring face of
operators/robust.py (B45), for the alerting case ("value outliers
per event type, updated as epochs land") where recomputing from raw
history every epoch is the thing being avoided.

The enabling observation is the same MERGE law the sketch intakes
lean on (streaming/sketches.py): robust.py computes EVERY statistic
from the ``(group, value, count)`` frame, and value counts are
additive across epochs. So:

- each micro-batch writes its OWN batch-local counts frame under a
  ``batch_id=N`` partition (idempotent overwrite — an at-least-once
  replay rewrites the same epoch instead of double-counting);
- the standing counts are the sum-on-read reduction over epochs —
  a groupBy over epochs · |distinct quantized values| rows, never
  over raw events;
- median, MAD and the Hampel outlier count are recomputed from the
  standing counts at read time (:func:`read_mad_summary`) — EXACTLY
  equal to the batch operator over the union of all epochs, at any
  epoch boundary, with no order sensitivity at all (addition is
  commutative; pinned by test).

Standing state is bounded by the distinct quantized value domain
per group (the B21 counting-quantile argument), NOT the event
count; :func:`compact_value_state` folds epoch history into one
partition when epochs accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umls2rdf_spark.streaming.events import read_standing_state


def value_counts_epoch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    grp_col: str,
    val_expr,
) -> None:
    """ONE epoch: overwrite the epoch's (g, v, cnt) partial."""
    counts = (
        batch_df.select(
            F.col(grp_col).alias("g"),
            val_expr.cast("bigint").alias("v"),
        )
        .where(F.col("v").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    counts.write.mode("overwrite").parquet(
        f"{state_dir}/valcounts/batch_id={batch_id}"
    )


def read_value_counts(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Standing (g, v, cnt): the sum-on-read merge of all epochs."""
    raw = read_standing_state(spark, f"{state_dir}/valcounts")
    if raw is None:
        raise ValueError("read_value_counts: no state written yet")
    return raw.groupBy("g", "v").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def read_mad_summary(
    spark: SparkSession, state_dir: str, grp_col: str, k: int = 3
) -> DataFrame:
    """Current (grp, n, med_q, mad_q, n_outliers) from the standing
    counts — the batch mad_outlier_summary recomputed over merged
    state (identical machinery: quantile_from_counts over the
    summed frame)."""
    from umls2rdf_spark.operators.robust import quantile_from_counts

    counts = read_value_counts(spark, state_dir)
    counts.persist()
    med = quantile_from_counts(
        counts, ["g"], "v", "cnt", 500_000, "med_q"
    )
    devc = (
        counts.join(med, "g")
        .select(
            "g", F.abs(F.col("v") - F.col("med_q")).alias("dv"), "cnt"
        )
        .groupBy("g", "dv")
        .agg(F.sum("cnt").alias("cnt"))
    )
    devc.persist()
    mad = quantile_from_counts(
        devc, ["g"], "dv", "cnt", 500_000, "mad_q"
    )
    summary = (
        devc.join(mad, "g")
        .groupBy("g")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.max("mad_q").cast("bigint").alias("mad_q"),
            F.sum(
                F.when(
                    F.col("dv") > F.lit(k) * F.col("mad_q"),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )
    return summary.join(med, "g").select(
        F.col("g").alias(grp_col),
        "n",
        F.col("med_q").cast("bigint").alias("med_q"),
        "mad_q",
        "n_outliers",
    )


def compact_value_state(spark: SparkSession, state_dir: str) -> None:
    """Fold epoch history into a single partition (cnt sums are the
    whole state — compaction changes nothing a reader sees)."""
    merged = read_value_counts(spark, state_dir)
    tmp = f"{state_dir}/valcounts_compact"
    merged.write.mode("overwrite").parquet(f"{tmp}/batch_id=0")
    import shutil

    shutil.rmtree(f"{state_dir}/valcounts")
    shutil.move(tmp, f"{state_dir}/valcounts")


def run_mad_maintenance(
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    grp_col: str,
    val_expr_builder,
) -> None:
    """Drive the stream to completion (availableNow), maintaining the
    per-epoch value-count partials. ``val_expr_builder`` is a
    zero-arg callable returning the quantized value Column (a
    callable because Columns must be built against the batch's
    lineage inside foreachBatch)."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        value_counts_epoch(
            batch_df, batch_id, state_dir, grp_col, val_expr_builder()
        )

    q = (
        events_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
