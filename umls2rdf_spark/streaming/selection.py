"""Continuous calibrated + budgeted selection: keep the per-source
score CDF (operators/selection.py score_percentile, C57) up to date
over a document stream, so a corpus that is still arriving always
has a current "top p% of EACH source" admitted view and a
budget-k weighted sample of it.

Same architecture as the dataset-card loop (streaming/reporting.py)
and the sketch loop (streaming/sketches.py), leaning on ADDITIVITY:
the CDF's sufficient statistic is the (source, score, cnt) counts
frame — bounded by |sources| × |score classes| (the repo's
distinct-count-value argument), int64, and additive — so

- each micro-batch writes ITS OWN counts partial under a
  ``batch_id=N`` partition (idempotent overwrite: an at-least-once
  foreachBatch replay rewrites the same epoch, never double-counts);
- the standing calibration dim is ``score_percentile_dim`` over the
  merged partials — a window over ≤ epochs × |sources| × |classes|
  tiny rows, never over the data — and equals the single-shot batch
  CDF of everything ingested so far (pinned end-to-end by test);
- ADMISSION is a definition over (docs-so-far, standing dim), not
  state: ``calibrated_admit`` joins the broadcast dim back to any
  document frame and thresholds on the exact within-source
  percentile; ``budgeted_admit`` then runs the deterministic
  systematic weighted sampler (C56) over the admitted set with
  percentile-proportional weights. Re-running admission after new
  epochs RE-CALIBRATES old documents against the moved CDF — the
  semantic a fixed-threshold filter cannot provide.

100 TB: per-batch cost is one map-side-combined groupBy of the
batch; standing state is rows, not data; admission is one broadcast
join + (for the budgeted face) the sampler's bounded-bucket pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from umls2rdf_spark.operators.selection import (
    score_counts,
    score_percentile_dim,
    weighted_sample,
)
from umls2rdf_spark.streaming.events import read_standing_state


def run_calibration_maintenance(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    score_col: str,
    group_col: str = "source",
) -> None:
    """Drive the stream to completion (availableNow), maintaining the
    ``{state_dir}/cdf`` batch-partitioned counts-partial table."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        score_counts(batch_df, score_col, group_col).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/cdf/batch_id={batch_id}")

    q = (
        docs_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_score_dim(
    spark: SparkSession,
    state_dir: str,
    score_col: str,
    group_col: str = "source",
) -> DataFrame | None:
    """The standing calibration dim (group, score, pct_ppm) over all
    ingested epochs — None before the first batch lands; fail-closed
    on any non-missing-path read error (events.read_standing_state)."""
    raw = read_standing_state(spark, f"{state_dir}/cdf")
    if raw is None:
        return None
    return score_percentile_dim(
        raw.drop("batch_id"), score_col, group_col
    )


def calibrated_admit(
    docs: DataFrame,
    dim: DataFrame,
    score_col: str,
    group_col: str,
    min_pct_ppm: int,
) -> DataFrame:
    """Admit documents at or above ``min_pct_ppm`` within their OWN
    source under the standing CDF: one broadcast join, the
    score_percentile contract (score_col must be non-null; scores
    absent from the dim — impossible when docs ⊆ ingested corpus —
    would drop, the inner-join fail-closed default).

    Output: the input columns + ``pct_ppm``."""
    return (
        docs.join(F.broadcast(dim), [group_col, score_col])
        .where(F.col("pct_ppm") >= min_pct_ppm)
        .select(*docs.columns, "pct_ppm")
    )


def budgeted_admit(
    docs: DataFrame,
    dim: DataFrame,
    id_col: str,
    score_col: str,
    group_col: str,
    min_pct_ppm: int,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """The budgeted face: calibrate, admit, then select ~``k`` rows
    by the deterministic systematic sampler with inclusion
    probability ∝ (pct_ppm + 1) — better-calibrated documents more
    likely, the group minimum (pct 0) still eligible. Deterministic
    in (seed, ids): replaying after new epochs yields the sample the
    NEW CDF implies, not an accumulation artifact.

    Output: the admitted input columns + ``pct_ppm``."""
    admitted = calibrated_admit(
        docs, dim, score_col, group_col, min_pct_ppm
    ).withColumn("__w", F.col("pct_ppm") + F.lit(1))
    return weighted_sample(admitted, id_col, "__w", k, seed=seed).drop(
        "__w"
    )
