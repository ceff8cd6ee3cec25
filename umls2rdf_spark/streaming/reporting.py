"""Continuous dataset-card maintenance: keep the per-source quality
report (operators/reporting.py, C50) up to date over a document
stream — live PII-density / repetition statistics for a corpus that
is still arriving, at O(|sources| × epochs) standing state.

Same architecture as the sketch maintenance loop
(streaming/sketches.py), leaning on ADDITIVITY instead of sketch
merge laws: every column of ``quality_report_partial`` is an int64
SUM, so

- each micro-batch writes ITS OWN partial report under a
  ``batch_id=N`` partition (idempotent overwrite — an at-least-once
  foreachBatch replay rewrites the same epoch instead of
  double-counting);
- the standing report is ``finalize_quality_report`` over all
  epochs — a groupBy over ≤ epochs × |sources| tiny rows, never
  over the data — and equals the single-shot batch report of
  everything ingested so far (pinned end-to-end by test);
- the one non-additive column (the DIV average) is computed at READ
  time from the merged sums, which is exactly why the partial
  excludes it.

No watermark, no state store: plain parquet any batch consumer can
read or merge across pipelines. 100 TB: per-batch cost is one fused
scan of the batch (the C50 single-scan builders); standing state is
rows, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from umls2rdf_spark.operators.reporting import (
    finalize_quality_report,
    quality_report_partial,
)
from umls2rdf_spark.streaming.events import read_standing_state


def run_quality_report_maintenance(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> None:
    """Drive the stream to completion (availableNow), maintaining
    the ``{state_dir}/qr`` batch-partitioned partial-report table."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        quality_report_partial(
            batch_df, id_col, text_col, domain_col
        ).write.mode("overwrite").parquet(
            f"{state_dir}/qr/batch_id={batch_id}"
        )

    q = (
        docs_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_quality_report(
    spark: SparkSession, state_dir: str, domain_col: str = "source"
) -> DataFrame | None:
    """The standing report: merged partials + the finalized DIV
    average (None before the first batch lands; fail-closed on any
    non-missing-path read error — events.read_standing_state)."""
    raw = read_standing_state(spark, f"{state_dir}/qr")
    if raw is None:
        return None
    return finalize_quality_report(
        raw.drop("batch_id"), domain_col
    )
