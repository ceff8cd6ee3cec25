"""Additional engine-surface queries: simple filter-agg, conditional
aggregation, disjunctive join predicates, rollup grouping sets, and
recursive transitive closure (iterative-doubling vs WITH RECURSIVE
oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umls2rdf_spark.operators.hierarchy import transitive_closure
from umls2rdf_spark.sources.parquet import load_table


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(10,2)")


# ── q6 forecasting revenue change (filter-only agg) ─────────────────
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
              * CAST(l_discount AS DECIMAL(10,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24
"""


# ── q10 returned items (join + agg + top-k) ─────────────────────────
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    one = F.lit(1).cast("decimal(10,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ── q12-shape: conditional counts by category ───────────────────────
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ── q14-shape: promo revenue ratio (conditional agg ratio) ──────────
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    one = F.lit(1).cast("decimal(10,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(10,2)")
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(10,2))
                      * (CAST(1 AS DECIMAL(10,2))
                         - CAST(l_discount AS DECIMAL(10,2)))
                 ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
              * (CAST(1 AS DECIMAL(10,2))
                 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# ── q19-shape: disjunctive join predicates ──────────────────────────
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(10,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
            & (F.col("p_size") <= 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
            & (F.col("p_size") <= 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
            & (F.col("p_size") <= 15)
        )
    )
    return joined.where(cond).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                * (CAST(1 AS DECIMAL(10,2))
                   - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
"""


# ── grouping sets (ROLLUP ∪ CUBE in one Expand plan) ────────────────
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS over (region, nation) covering all four
    CUBE combinations — the general machinery ROLLUP and CUBE are
    sugar for (SURVEY B14 + B14b) — with ``grouping_id`` to
    disambiguate super-aggregate rows from data NULLs.

    One Expand + one hash aggregate: at 100 TB the fact is read and
    shuffled once for all four grouping sets, not once per set.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.groupingSets(
            [["r_name", "n_name"], ["r_name"], ["n_name"], []],
            "r_name",
            "n_name",
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .orderBy("gid", "r_name", "n_name")
    )


GROUPING_SETS_SQL = """
SELECT r_name, n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(10,2))) AS DOUBLE)
         AS total_acctbal,
       CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), (n_name), ())
ORDER BY gid, r_name, n_name
"""


# ── transitive closure (iterative doubling vs WITH RECURSIVE) ───────
def closure_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor closure of the synthetic orderkey 10-ary tree
    (parent = child div 10) — ~5 levels deep at sf0.01, exercising
    the log-depth iterative-doubling join loop."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    keys = orders.select(F.col("o_orderkey").alias("k")).distinct()
    parents = keys.select(F.col("k").alias("pk"))
    edges = (
        keys.withColumn("parent_k", F.expr("k div 10"))
        .join(parents, F.col("parent_k") == F.col("pk"), "left_semi")
        .where(F.col("parent_k") != F.col("k"))
        .select(F.col("k").alias("child"), F.col("parent_k").alias("parent"))
    )
    return transitive_closure(edges)


CLOSURE_SQL = """
WITH RECURSIVE keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
edges AS (
  SELECT c.k AS child, c.k // 10 AS parent
  FROM keys c
  WHERE c.k // 10 <> c.k
    AND EXISTS (SELECT 1 FROM keys p WHERE p.k = c.k // 10)),
closure AS (
  SELECT child, parent AS ancestor FROM edges
  UNION
  SELECT c.child, e.parent AS ancestor
  FROM closure c JOIN edges e ON c.ancestor = e.child)
SELECT child, ancestor FROM closure
"""


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q12_priority_lines": q12_priority_lines,
    "q14_promo_effect": q14_promo_effect,
    "q19_disjunctive": q19_disjunctive,
    "grouping_sets": grouping_sets_agg,
    "transitive_closure": closure_demo,
}

ORACLES = {
    "q6_forecast_revenue": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_priority_lines": Q12_SQL,
    "q14_promo_effect": Q14_SQL,
    "q19_disjunctive": Q19_SQL,
    "grouping_sets": GROUPING_SETS_SQL,
    "transitive_closure": CLOSURE_SQL,
}


# ── salted aggregation (skew path; identical results to plain agg) ──
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the (6-key, heavily skewed)
    returnflag/linestatus space — bit-identical to the plain groupBy,
    demonstrated through the same oracle gate."""
    from umls2rdf_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        partial_aggs=[
            F.sum(_dec("l_quantity")).alias("pq"),
            F.count(F.lit(1)).alias("pn"),
        ],
        merge_aggs=[
            F.sum("pq").cast("double").alias("sum_qty"),
            F.sum("pn").cast("bigint").alias("n_rows"),
        ],
        salt_on="l_orderkey",
    )
    return out.orderBy("l_returnflag", "l_linestatus")


SKEW_SALTED_AGG_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

QUERIES["skew_salted_agg"] = skew_salted_agg
ORACLES["skew_salted_agg"] = SKEW_SALTED_AGG_SQL




# ── tests-only surface: correlated scalar subquery + semi-join agg ──
# The 50-key driver cap is full; these two classic shapes are
# oracle-tested in tests/test_tpch.py instead (same compare harness).


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery: lineitems whose
    quantity is below 20% of their part's average quantity, for a
    brand/size slice of parts.

    Spark-first decorrelation: ONE lineitem pass. The filtered part
    slice broadcasts into the join, and the per-part average becomes
    a window over the joined frame — not a second scan of lineitem
    (the naive correlated rewrite computes the aggregate in a
    separate subquery scan and joins it back; the window form reads
    the fact table once and shuffles only the brand-slice rows).

    Exactness: ``qty < 0.2*avg(qty)`` is evaluated as
    ``qty*5*count < sum(decimal qty)`` — a float average's summation
    order differs between engines, and a boundary row flipping on
    the last ulp would break the oracle hash; the multiplied-out
    decimal/integer form is exact everywhere.
    """
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") < 15)
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(
        F.broadcast(part.select("p_partkey")),
        li["l_partkey"] == part["p_partkey"],
    )
    w = Window.partitionBy("l_partkey")
    dq = _dec("l_quantity")
    return (
        joined.withColumn("sum_qty", F.sum(dq).over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .where(dq * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) / 7.0 AS DOUBLE)
       AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#4' AND p_size < 15
  AND CAST(l_quantity AS DECIMAL(10,2)) * 5
      * (SELECT COUNT(*) FROM lineitem l2
         WHERE l2.l_partkey = p_partkey)
      < (SELECT SUM(CAST(l_quantity AS DECIMAL(10,2)))
         FROM lineitem l3 WHERE l3.l_partkey = p_partkey)
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — semi-join against a grouped HAVING set:
    customers with orders whose total quantity exceeds a threshold.

    The qualifying-order set (groupBy + having, tiny output) inner-
    joins back — effectively a semi-join that also carries the
    aggregate; orders/customer join afterwards so the wide join only
    sees qualifying rows. Deterministic LIMIT: ordered by
    (o_totalprice DESC, o_orderkey) on both sides.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .where(F.col("sum_qty") > 200)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            (_dec("o_totalprice").cast("double")).alias("total_price"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("total_price").desc(), F.col("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, o_custkey, o_orderkey, o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(10,2)) AS DOUBLE)
           AS total_price,
       CAST(sq AS DOUBLE) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(10,2))) AS sq
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(10,2))) > 200) b
  ON o_orderkey = b.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 100
"""


TESTS_ONLY_QUERIES = {
    "q17_small_quantity": q17_small_quantity,
    "q18_large_orders": q18_large_orders,
}
TESTS_ONLY_ORACLES = {
    "q17_small_quantity": Q17_SQL,
    "q18_large_orders": Q18_SQL,
}
