"""Table profiling: per-column statistics in one scan (the
ANALYZE-style pass a catalog/CBO or a data-quality gate needs).

One job computes every column's row/null/distinct/min/max stats —
a naive per-column loop costs |columns| full scans, which at 100 TB
is |columns| hours. Distinct counts default to HyperLogLog-backed
``approx_count_distinct`` (mergeable constant-size sketch state,
single aggregation pass); ``exact=True`` switches to COUNT(DISTINCT)
— Spark plans the multi-distinct case via Expand (one duplicated
pass per distinct column), which is the right trade only when exact
NDV is required, so the default stays approximate at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# DataType.typeName() spellings (not SQL names: LongType -> "long")
_ATOMIC = {
    "string", "integer", "long", "short", "byte", "double", "float",
    "boolean", "date", "timestamp", "timestamp_ntz", "decimal",
}


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
    relative_sd: float = 0.05,
) -> DataFrame:
    """Profile ``columns`` (default: every atomic column) in ONE
    aggregation pass.

    Output (long form, one row per column):
    (column, n_rows, n_nulls, n_distinct, min_value, max_value) —
    min/max stringified so heterogeneous column types share a schema.
    ``n_distinct`` counts non-null values; approximate by default
    (``relative_sd`` = HLL precision), exact via COUNT(DISTINCT) when
    ``exact=True``.
    """
    if columns is None:
        columns = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName().split("(")[0] in _ATOMIC
        ]
    if not columns:
        raise ValueError("no atomic columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls")
        )
        if exact:
            aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__ndv"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c), relative_sd).alias(
                    f"{c}__ndv"
                )
            )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(entries).alias("s")).select("s.*")
