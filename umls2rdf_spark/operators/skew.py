"""Skew-handling utilities: salted aggregation and salted joins.

AQE's skew-join splitting covers sort-merge joins at runtime, but two
shapes still need explicit salting at 100 TB:

- a groupBy where one key holds a huge share of rows (a viral
  duplicate cluster in LSH, a hot SAB in MRCONSO): salting splits the
  hot key across ``salt_factor`` reducers, then a second tiny
  aggregation merges the partials;
- a shuffle join against a dim too big to broadcast where one key is
  hot: the fact side salts, the dim side explodes to every salt.

Both helpers keep results bit-identical to the unsalted plan (the
re-aggregation merges exact partials).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    salt_factor: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation with a salt on the group key.

    ``partial_aggs`` run per (key, salt); ``merge_aggs`` combine the
    partials per key (e.g. partial ``sum(x) as s`` then merge
    ``sum(s) as total``). The salt is derived from a high-cardinality
    column (``salt_on``) when given — deterministic, replayable — else
    from ``spark_partition_id()``.
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_factor))
        if salt_on
        else F.pmod(F.spark_partition_id(), F.lit(salt_factor))
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*group_cols).agg(*merge_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: the fact side gets a random-ish salt
    (derived from all its columns via xxhash64 — deterministic), the
    dim side is exploded to all ``salt_factor`` salts, and the join
    key becomes (key, salt) — hot keys spread over ``salt_factor``
    tasks instead of one straggler."""
    fact_salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_factor)),
    )
    dim_exploded = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])),
    )
    out = fact_salted.join(dim_exploded, on=[on, "__salt"], how=how)
    return out.drop("__salt")
