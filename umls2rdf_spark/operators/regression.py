"""Grouped OLS trend detection: the least-squares slope of
(y over x) per group, computed ENTIRELY from one map-side-combined
aggregation of five sufficient statistics — the monitoring question
"is this metric drifting UP or DOWN, and how fast, per segment"
(value trend per event type, document-length trend per source,
quality-score trend per crawl snapshot) answered with a number
instead of C70's scalar alarm.

slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²), the one-pass normal-
equation form — every sufficient statistic is an associative SUM,
so a 100 TB group costs one partial-aggregated scan and the final
division happens on a |groups|-row frame. No window, no sort, no
second pass.

Engine-exactness (the drift.py/C70 discipline): sums run in
DECIMAL(38,0) (Spark) / HUGEINT (DuckDB); the slope is quantized by
sign-split magnitude division — ``sign(num) · ((|num| · scale) div
den)`` — so only NONNEGATIVE integral divisions happen and Spark's
``div`` and DuckDB's ``//`` cannot disagree on rounding direction
(negative-dividend truncation semantics never enter). Degenerate
groups (all x equal → den = 0) yield slope NULL, loudly not zero.

Magnitude valve, stated: the products must hold in DECIMAL(38,0) —
``n · Σ|xy| · scale < 10^38``. Callers re-origin x against a FIXED
epoch anchor (a constant, no data-dependent pass) to keep x small;
out of range FAILS CLOSED (ANSI decimal overflow raises — the C70
contract).

Reference parity: none; analytics/monitoring extension
(SURVEY §2 B51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,0)"


def grouped_trend(
    df: DataFrame,
    grp_col: str,
    x_expr,
    y_expr,
    scale: int = 10**6,
) -> DataFrame:
    """(grp, n, slope_q, degenerate): per-group OLS slope of
    ``y_expr`` over ``x_expr`` (both already-quantized bigint
    Columns; NULL pairs dropped loudly), sign-split-quantized to
    integer units of 1/``scale``. ``degenerate`` marks groups with
    zero x-variance (all x equal — n·Σxx − Σx² = 0, a quantity that
    can exceed int64 and therefore is not emitted raw); their slope
    is NULL, loudly not zero."""
    pairs = df.select(
        F.col(grp_col).alias("g"),
        x_expr.cast("bigint").alias("x"),
        y_expr.cast("bigint").alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    return slope_from_stats(
        trend_stats(pairs, "g"), grp_col, scale
    )


def trend_stats(pairs: DataFrame, grp_col: str) -> DataFrame:
    """The five sufficient statistics per group over a (grp, x, y)
    frame — shared by the batch operator and the streaming per-epoch
    partial writer (streaming/trend.py), whose standing state is the
    epoch-sum of exactly these columns."""
    xd = F.col("x").cast(DEC)
    yd = F.col("y").cast(DEC)
    return pairs.groupBy(F.col(grp_col).alias("g")).agg(
        F.count(F.lit(1)).cast(DEC).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )


def slope_from_stats(
    stats: DataFrame, grp_col: str, scale: int
) -> DataFrame:
    """The final division over a (g, n, sx, sy, sxy, sxx) frame —
    shared by the batch operator and the streaming sum-on-read face
    so the two can never drift (the robust.py round-8 lesson)."""
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    mag = F.expr(
        f"(abs(__num) * CAST({scale} AS {DEC})) div __den"
    )
    signed = F.when(F.col("__num") < 0, -mag).otherwise(mag)
    return (
        stats.select(
            F.col("g").alias(grp_col),
            F.col("n").cast("bigint").alias("n"),
            num.alias("__num"),
            den.alias("__den"),
        )
        .select(
            grp_col,
            "n",
            F.when(F.col("__den") == 0, F.lit(None))
            .otherwise(signed)
            .cast("bigint")
            .alias("slope_q"),
            (F.col("__den") == 0).alias("degenerate"),
        )
    )


def grouped_trend_sql(
    src_sql: str,
    grp_col: str,
    x_sql: str,
    y_sql: str,
    scale: int = 10**6,
) -> str:
    """DuckDB twin — HUGEINT sums, the same sign-split nonnegative
    integral division."""
    return f"""
WITH __pairs AS (
  SELECT {grp_col} AS g,
         CAST({x_sql} AS BIGINT) AS x, CAST({y_sql} AS BIGINT) AS y
  FROM ({src_sql}) AS __src
  WHERE {x_sql} IS NOT NULL AND {y_sql} IS NOT NULL),
__stats AS (
  SELECT g,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM __pairs GROUP BY 1),
__nd AS (
  SELECT g, n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
  FROM __stats)
SELECT g AS {grp_col}, CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN den = 0 THEN NULL
            WHEN num < 0
              THEN -((abs(num) * CAST({scale} AS HUGEINT)) // den)
            ELSE (num * CAST({scale} AS HUGEINT)) // den
            END AS BIGINT) AS slope_q,
       den = 0 AS degenerate
FROM __nd
"""
