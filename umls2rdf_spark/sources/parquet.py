"""Parquet source: the primary columnar input.

Keep reads lazy and declarative — no schema inference passes, no
caching by default — so Catalyst pushes filters and prunes columns
into the scan (verify with .explain(): PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umls2rdf_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table from ``{sf_dir}/{name}.parquet``.

    Timestamp normalization: driver-generated parquet has varied
    across rounds (TIMESTAMP(NANOS); naive timestamp[us], which Spark
    4 reads as TIMESTAMP_NTZ). Normalize every variant to a plain
    microsecond TimestampType so downstream operators (unix_micros,
    window(), session_window) see one type. The NTZ->TIMESTAMP cast is
    wall-clock-preserving in the session zone, which is exactly how
    DuckDB reads the same naive parquet values, so oracles stay
    comparable under any session timezone.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz_cols = [
        f.name for f in df.schema.fields
        if f.dataType.typeName() == "timestamp_ntz"
    ]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load several tables; also registers each as a temp view so the
    same plans can be written in SQL."""
    out: dict[str, DataFrame] = {}
    for name in names or TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
