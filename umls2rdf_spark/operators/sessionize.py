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


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    right_cols: list[str],
) -> DataFrame:
    """Scale path for the as-of join: cogroup both sides on the key
    (one shuffle each) and run pandas merge_asof per key group — no
    range-join pair explosion, so cost is O(n log n) per key instead
    of O(left×right).

    Tie semantics match asof_join/the SQL oracle: latest right_ts,
    then LOWEST right_tiebreak (achieved by sorting the right side by
    (ts asc, tiebreak desc) — merge_asof takes the last match).

    Output: all left columns + the requested right columns.
    """
    import pandas as pd

    left_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields
    )
    right_schema = {f.name: f for f in right.schema.fields}
    right_fields = ", ".join(
        f"{c} {right_schema[c].dataType.simpleString()}" for c in right_cols
    )
    out_schema = f"{left_fields}, {right_fields}"
    l_ts, r_ts, r_tb = left_ts, right_ts, right_tiebreak
    l_cols = [f.name for f in left.schema.fields]
    r_cols = list(right_cols)

    def merge(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=l_cols + r_cols)
        if len(rpdf) == 0:
            return pd.DataFrame(columns=l_cols + r_cols)
        ls = lpdf.sort_values(l_ts, kind="mergesort")
        rs = rpdf.sort_values(
            [r_ts, r_tb], ascending=[True, False], kind="mergesort"
        )
        merged = pd.merge_asof(
            ls, rs[[r_ts, r_tb] + [c for c in r_cols if c not in (r_ts, r_tb)]],
            left_on=l_ts, right_on=r_ts, direction="backward",
        )
        merged = merged.dropna(subset=[r_ts])
        return merged[l_cols + r_cols]

    return (
        left.groupBy(left_key)
        .cogroup(right.groupBy(right_key))
        .applyInPandas(merge, schema=out_schema)
    )
