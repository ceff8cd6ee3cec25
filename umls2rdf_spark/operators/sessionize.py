"""Event-stream operators: gap sessionization and as-of joins.

Both are window-function shapes: one shuffle on the entity key, then
ordered in-partition computation — no driver-side iteration. The
batch forms here share semantics with the Structured Streaming
variants in umls2rdf_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak: str,
    gap: str = "30 minutes",
    gap_micros: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event exceeds ``gap_micros``. Returns input + session_id
    (per-key ordinal)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    new_sess = F.when(
        prev_ts.isNull() | (gap_us > gap_micros), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak: str,
    gap_micros: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Sessions per key — the aggregate view of sessionize."""
    sess = sessionize(
        df, key_col, ts_col, order_tiebreak, gap_micros=gap_micros
    )
    return sess.groupBy(key_col).agg(
        F.max("session_id").cast("bigint").alias("n_sessions")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
) -> DataFrame:
    """For each left row (unique ``left_id``), the most recent right
    row with right_ts <= left_ts on the same key.

    Implemented as range-join + per-left-row top-1 window — the
    declarative form Catalyst can optimize; at scale, pre-bucket both
    sides on the key so the range join is co-partitioned.
    """
    cond = (left[left_key] == right[right_key]) & (
        right[right_ts] <= left[left_ts]
    )
    joined = left.join(right, cond, "inner")
    w = Window.partitionBy(left[left_id]).orderBy(
        right[right_ts].desc(), right[right_tiebreak].asc()
    )
    return joined.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    ).drop("__rn")
