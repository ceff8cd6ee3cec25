"""Continuous trend monitoring: keep per-group OLS slopes live over
an event stream — the streaming face of operators/regression.py
(B51), for the alerting loop ("is the metric drifting per segment,
updated as epochs land") without re-scanning raw history.

The enabling law is the same additivity the MAD/sketch intakes lean
on (streaming/robust.py, streaming/sketches.py): grouped_trend
computes EVERYTHING from five sufficient statistics (n, Σx, Σy,
Σxy, Σxx), and sums are additive across epochs. So:

- each micro-batch writes its OWN per-group partial-sums row set
  under a ``batch_id=N`` partition (idempotent overwrite — an
  at-least-once replay rewrites the same epoch, never
  double-counts);
- the standing statistics are the sum-on-read reduction over
  epochs — |groups| x epochs rows, never raw events;
- the slope is recomputed from the merged statistics at read time,
  EXACTLY equal to the batch operator over the union of all epochs
  at any epoch boundary (addition is commutative — order-
  insensitive by construction, pinned by test).

Partials are stored as DECIMAL(38,0) (parquet decimal) — the same
magnitude valve as the batch operator, stated there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umls2rdf_spark.operators.regression import DEC
from umls2rdf_spark.streaming.events import read_standing_state


def trend_stats_epoch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    grp_col: str,
    x_expr,
    y_expr,
) -> None:
    """ONE epoch: overwrite the epoch's per-group sufficient-
    statistic partials."""
    from umls2rdf_spark.operators.regression import trend_stats

    pairs = batch_df.select(
        F.col(grp_col).alias("g"),
        x_expr.cast("bigint").alias("x"),
        y_expr.cast("bigint").alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    stats = trend_stats(pairs, "g")
    stats.write.mode("overwrite").parquet(
        f"{state_dir}/trendstats/batch_id={batch_id}"
    )


def read_trend(
    spark: SparkSession,
    state_dir: str,
    grp_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """Current (grp, n, slope_q, degenerate) from the standing
    statistics — the batch operator's final division over the
    epoch-summed frame (identical expressions, so the two faces
    cannot drift)."""
    raw = read_standing_state(spark, f"{state_dir}/trendstats")
    if raw is None:
        raise ValueError("read_trend: no state written yet")
    from umls2rdf_spark.operators.regression import slope_from_stats

    merged = raw.groupBy("g").agg(
        *[
            F.sum(F.col(c).cast(DEC)).alias(c)
            for c in ("n", "sx", "sy", "sxy", "sxx")
        ]
    )
    return slope_from_stats(merged, grp_col, scale)


def run_trend_maintenance(
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    grp_col: str,
    x_expr_builder,
    y_expr_builder,
) -> None:
    """Drive the stream to completion (availableNow), maintaining
    per-epoch sufficient-statistic partials. The expr builders are
    zero-arg callables returning Columns (built inside foreachBatch
    against the batch's lineage)."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        trend_stats_epoch(
            batch_df,
            batch_id,
            state_dir,
            grp_col,
            x_expr_builder(),
            y_expr_builder(),
        )

    q = (
        events_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
