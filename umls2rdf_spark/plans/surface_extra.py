"""Remaining relational surface: anti-joins, set operations, distinct
aggregates, engine-neutral histograms, exact percentiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umls2rdf_spark.sources.parquet import load_table


# ── NOT EXISTS anti-join ────────────────────────────────────────────
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no urgent orders — left_anti join."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


# ── set operations ──────────────────────────────────────────────────
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1996 INTERSECT 1998, minus 1995 buyers —
    intersect/except composition."""
    orders = load_table(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        return orders.where(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        ).select(F.col("o_custkey").alias("custkey")).distinct()

    return active(1996).intersect(active(1998)).exceptAll(active(1995))


SET_OPS_SQL = """
WITH y96 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate < TIMESTAMP '1997-01-01'),
y98 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'),
y95 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01')
SELECT custkey FROM y96 INTERSECT SELECT custkey FROM y98
EXCEPT SELECT custkey FROM y95
"""


# ── distinct aggregates ─────────────────────────────────────────────
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_AGG_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ── histogram (engine-neutral integer bucketing) ────────────────────
def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o_totalprice histogram in 50k-wide buckets: bucket index is
    exact integer math (floor division of a 2-decimal fixed-point),
    so edges are engine-independent."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    bucket = F.floor(cents / F.lit(5_000_000)).cast("bigint")
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("bucket")
    )


HISTOGRAM_SQL = """
SELECT CAST(floor(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  / 5000000) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
ORDER BY 1
"""


# ── exact percentiles ───────────────────────────────────────────────
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median/p90 of quantity per returnflag —
    Spark percentile() and DuckDB quantile_cont() share the linear
    interpolation definition; inputs are exact 2-decimal values."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile(F.col("l_quantity"), F.lit(0.5)).alias("median_qty"),
            F.percentile(F.col("l_quantity"), F.lit(0.9)).alias("p90_qty"),
        )
        .orderBy("l_returnflag")
    )


PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = {
    "anti_join": anti_join,
    "set_ops": set_ops,
    "distinct_agg": distinct_agg,
    "histogram": histogram,
    "percentiles": percentiles,
}

ORACLES = {
    "anti_join": ANTI_JOIN_SQL,
    "set_ops": SET_OPS_SQL,
    "distinct_agg": DISTINCT_AGG_SQL,
    "histogram": HISTOGRAM_SQL,
    "percentiles": PERCENTILES_SQL,
}
