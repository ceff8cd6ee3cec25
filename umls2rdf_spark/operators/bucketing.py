"""Bucketed-table utilities: pre-partitioned storage for co-located,
shuffle-free joins.

The §6 scale claim made executable: two fact tables bucketed on the
same join key join with ZERO exchanges (asserted in
tests/test_plan_shapes.py). At 100 TB this converts the dominant
orders⋈lineitem / atoms⋈rels shuffles into local merge joins paid
once at write time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as an external bucketed (and optionally
    bucket-sorted) table — Spark records bucketing metadata in the
    catalog so downstream joins on ``bucket_cols`` skip the
    exchange."""
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def drop_table(spark: SparkSession, table_name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
