"""Pareto-frontier (skyline) selection: the rows no other row
dominates on a (maximize, minimize) objective pair — multi-objective
data selection without a made-up scalarization ("longest docs with
the least repetition", "highest quality at the fewest tokens": any
weighted sum picks ONE tradeoff; the skyline returns every
undominated tradeoff and lets the curator choose).

Dominance (2-D, integer objectives): s dominates r iff
``s.hi >= r.hi`` and ``s.lo <= r.lo`` with at least one strict.

Spark-first two-stage shape — the window form of the classic
sort-scan, made scalable by a pre-prune:

1. **Local fronts**: partition rows by an engine-neutral hash shard
   and compute each shard's skyline with one window pass. Dominance
   is transitive, so every GLOBAL skyline row is also a LOCAL
   skyline row — pruning to local fronts loses nothing (the
   classic distributed-skyline argument), and the corpus-sized sort
   happens only WITHIN shards (parallel, bounded).
2. **Global front**: the same window pass over the pruned union —
   a frame of Σ|local fronts| rows, typically orders of magnitude
   below the corpus (a shard's front over iid objectives is
   O(log n) expected).

The window pass itself: order by ``hi`` ASC; over INTEGER order
keys a RANGE frame of ``[1 FOLLOWING, UNBOUNDED]`` is exactly "all
rows with strictly larger hi", so ``min(lo)`` over it answers
strict-hi dominance, and ``min(lo)`` over the CURRENT RANGE (peer
rows, same hi) answers the equal-hi/strictly-smaller-lo case —
no self-join, no cross product, two frame aggregates per stage.
Duplicate (hi, lo) points all survive — neither strictly dominates
its twin under the definition above; callers wanting one id per
frontier POINT dedupe on (hi, lo) downstream.

Reference parity: none; LLM-pipeline / analytics extension
(SURVEY §2 C74).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import (
    stable_hash40,
    stable_hash40_sql,
)


def _front(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """One skyline pass: drop rows dominated WITHIN each partition
    (no partition cols = the global pass)."""
    base = (
        Window.partitionBy(*part_cols) if part_cols else Window.partitionBy()
    )
    strictly_hi = base.orderBy(F.col("hi").asc()).rangeBetween(
        1, Window.unboundedFollowing
    )
    peers = base.orderBy(F.col("hi").asc()).rangeBetween(0, 0)
    w = df.select(
        "*",
        F.min("lo").over(strictly_hi).alias("__m_hi"),
        F.min("lo").over(peers).alias("__m_eq"),
    )
    dominated = (
        F.col("__m_hi").isNotNull() & (F.col("__m_hi") <= F.col("lo"))
    ) | (F.col("__m_eq") < F.col("lo"))
    return w.where(~dominated).drop("__m_hi", "__m_eq")


def pareto_front(
    df: DataFrame,
    id_col: str,
    hi_expr,
    lo_expr,
    shards: int = 64,
) -> DataFrame:
    """(id, hi, lo): the undominated rows for (maximize ``hi_expr``,
    minimize ``lo_expr``), both cast to bigint (integer order keys
    make the RANGE frames exact). NULL objectives are dropped
    loudly by contract (a NULL can neither dominate nor be ranked —
    the selection.py weight discipline)."""
    if shards < 1:
        raise ValueError("pareto_front: shards must be >= 1")
    pts = df.select(
        F.col(id_col).alias("id"),
        hi_expr.cast("bigint").alias("hi"),
        lo_expr.cast("bigint").alias("lo"),
    ).where(F.col("hi").isNotNull() & F.col("lo").isNotNull())
    shard = (stable_hash40(F.col("id").cast("string")) % shards).alias(
        "__s"
    )
    local = _front(pts.select("*", shard), ["__s"]).drop("__s")
    return _front(local, []).select(
        F.col("id").alias(id_col), "hi", "lo"
    )


def pareto_front_sql(
    src_sql: str,
    id_col: str,
    hi_sql: str,
    lo_sql: str,
    shards: int = 64,
) -> str:
    """DuckDB twin of :func:`pareto_front` — same shard hash, same
    two window passes with the same integer RANGE frames."""
    h = stable_hash40_sql("CAST(id AS VARCHAR)")

    def stage(src: str, part: str) -> str:
        over = (
            f"PARTITION BY {part} " if part else ""
        ) + "ORDER BY hi ASC"
        return f"""
SELECT id, hi, lo{', ' + part if part else ''} FROM (
  SELECT *,
    MIN(lo) OVER ({over}
      RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS m_hi,
    MIN(lo) OVER ({over}
      RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS m_eq
  FROM ({src}) AS __in) AS __w
WHERE NOT ((m_hi IS NOT NULL AND m_hi <= lo) OR m_eq < lo)"""

    pts = f"""
SELECT {id_col} AS id, CAST({hi_sql} AS BIGINT) AS hi,
       CAST({lo_sql} AS BIGINT) AS lo,
       ({h}) % {shards} AS __s
FROM ({src_sql}) AS __src
WHERE {hi_sql} IS NOT NULL AND {lo_sql} IS NOT NULL"""
    local = stage(pts, "__s")
    glob = stage(local, "")
    return f"SELECT id AS {id_col}, hi, lo FROM ({glob}) AS __fin"
