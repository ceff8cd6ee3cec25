"""Remaining relational surface: set operations + anti-join,
engine-neutral histograms with distinct aggregates, exact percentiles.

The driver's correctness harness checks the FIRST 50 ``queries()``
entries, so sibling capabilities are demonstrated in one composed
plan each (set_ops = intersect/exceptAll/left_anti; histogram =
integer bucketing + multi-column COUNT DISTINCT) rather than one
query per capability — every SURVEY §2 row keeps a driver-verified
demo without exceeding the harness budget."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from umls2rdf_spark.sources.parquet import load_table


# ── set operations + NOT EXISTS anti-join ───────────────────────────
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1996 INTERSECT 1998, minus 1995 buyers,
    who additionally have no urgent order — intersect / exceptAll /
    left_semi / left_anti in one plan (SURVEY B17 + B18).

    At scale: the year-slice legs are distinct custkey sets (small
    relative to orders), so INTERSECT/EXCEPT shuffle only key columns;
    the final semi/anti joins stream the customer dim once.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def active(year: int) -> DataFrame:
        return orders.where(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
        ).select(F.col("o_custkey").alias("custkey")).distinct()

    keep = active(1996).intersect(active(1998)).exceptAll(active(1995))
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(keep, cust.c_custkey == keep.custkey, "left_semi")
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


SET_OPS_SQL = """
WITH y96 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate < TIMESTAMP '1997-01-01'),
y98 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'),
y95 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'),
keep AS (
  SELECT custkey FROM y96 INTERSECT SELECT custkey FROM y98
  EXCEPT SELECT custkey FROM y95)
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT custkey FROM keep)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


# ── histogram + distinct aggregates + exact percentiles ─────────────
def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o_totalprice histogram in 50k-wide buckets with per-bucket
    COUNT(DISTINCT ...) on two columns and exact interpolated
    median/p90 price (SURVEY B19 + B20 + B21).

    Bucket index is exact integer math (floor division of a 2-decimal
    fixed-point), so edges are engine-independent; the multi-distinct
    agg exercises Spark's expand-based distinct aggregation; Spark
    percentile() and DuckDB quantile_cont() share the linear
    interpolation definition over exact 2-decimal inputs.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    bucket = F.floor(cents / F.lit(5_000_000)).cast("bigint")

    base = (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct("o_orderpriority").alias("n_prios"),
        )
    )

    # Counting-based exact quantile: Spark's percentile() buffers every
    # group value in executor memory (OOM on a billion-row bucket); over
    # a 2-decimal fixed-point domain the same exact interpolated result
    # comes from per-VALUE counts — bounded by the 5M-cent bucket width,
    # not the row count, at any data scale.
    counts = (
        orders.select(bucket.alias("bucket"), cents.alias("cents"))
        .groupBy("bucket", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_ord = Window.partitionBy("bucket").orderBy("cents")
    w_all = Window.partitionBy("bucket")
    e = counts.select(
        "bucket",
        "cents",
        F.sum("cnt").over(w_ord).alias("cum"),
        (F.sum("cnt").over(w_ord) - F.col("cnt")).alias("prev"),
        F.sum("cnt").over(w_all).alias("n"),
    )

    aggs, posts = [], []
    for p, out in ((0.5, "median_price"), (0.9, "p90_price")):
        # 0-indexed fractional rank h = (n-1)*p; the sorted value at
        # position i is the cents row whose cumulative range covers i.
        h = (F.col("n") - 1).cast("double") * F.lit(p)
        lo, hi = F.floor(h), F.ceil(h)
        tag = out.split("_")[0]
        aggs += [
            F.max(h).alias(f"h_{tag}"),
            F.max(
                F.when((F.col("prev") <= lo) & (lo < F.col("cum")), F.col("cents"))
            ).alias(f"vlo_{tag}"),
            F.max(
                F.when((F.col("prev") <= hi) & (hi < F.col("cum")), F.col("cents"))
            ).alias(f"vhi_{tag}"),
        ]
        hc = F.col(f"h_{tag}")
        # exact double prices: cents<=10^12 is double-exact and /100.0
        # is correctly rounded, so this equals double(decimal(12,2))
        plo = F.col(f"vlo_{tag}").cast("double") / F.lit(100.0)
        phi = F.col(f"vhi_{tag}").cast("double") / F.lit(100.0)
        # weighted interpolation form shared by Spark percentile() and
        # DuckDB quantile_cont: (ceil-h)*lower + (h-floor)*higher
        posts.append(
            F.when(F.floor(hc) == F.ceil(hc), plo)
            .otherwise(
                (F.ceil(hc).cast("double") - hc) * plo
                + (hc - F.floor(hc).cast("double")) * phi
            )
            .alias(out)
        )

    quant = e.groupBy("bucket").agg(*aggs).select("bucket", *posts)
    return base.join(quant, "bucket").orderBy("bucket")


HISTOGRAM_SQL = """
SELECT CAST(floor(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                  / 5000000) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(DISTINCT o_orderpriority) AS n_prios,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS median_price,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) AS p90_price
FROM orders
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "set_ops": set_ops,
    "histogram": histogram,
}

ORACLES = {
    "set_ops": SET_OPS_SQL,
    "histogram": HISTOGRAM_SQL,
}
