"""Dense global id assignment without a global sort.

``zipWithIndex``/``row_number() OVER ()`` both funnel the corpus
through one task (RDD analysis pass / SinglePartition window) — the
classic driver-shaped bottleneck when you need to number 10^11 rows.
This is the same two-level cumulative-sum shape as
corpus.pack_sequences: number WITHIN hash shards, then lift with
per-shard offsets (a shards-row broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import stable_hash40


def assign_stable_ids(
    df: DataFrame,
    key_cols: list[str],
    id_name: str = "stable_id",
    shards: int = 1024,
) -> DataFrame:
    """Assign each row a dense 0..n-1 bigint id equal to its rank in
    the global ``(shard, *key_cols)`` order, where shard =
    stable_hash40(all keys, unit-separator-joined) mod ``shards``.
    Hashing the FULL composite key keeps shards balanced even when
    the first key is low-cardinality (a category/lang column leading
    a composite key would otherwise collapse every row into a few
    shards and turn the per-shard row_number into a corpus sort).

    DETERMINISTIC and partition/order-invariant: the id depends only
    on the key data, never on placement — rerunning on a repartitioned
    or re-ordered copy yields identical ids (``monotonically_
    increasing_id`` does not survive either). Requires ``key_cols``
    to be unique per row (ties would make ranks nondeterministic).

    Shape: one shuffle to the shard partition for the within-shard
    ``row_number``, a shards-row aggregate for the offsets, broadcast
    back. The offsets window runs over ``shards`` rows, not data. The
    offsets branch re-reads ``df`` (a map-side-combined count per
    shard — no window recompute); persist upstream first if ``df`` is
    itself an expensive pipeline rather than a table scan.
    """
    shard = F.pmod(
        stable_hash40(
            F.concat_ws(
                "\x1f", *[F.col(c).cast("string") for c in key_cols]
            )
        ),
        F.lit(shards),
    )
    base = df.withColumn("__shard", shard)
    w = Window.partitionBy("__shard").orderBy(
        *[F.col(c) for c in key_cols]
    )
    local = base.withColumn("__local", F.row_number().over(w))
    totals = base.groupBy("__shard").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_sh = Window.orderBy("__shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__shard",
        F.coalesce(F.sum("__cnt").over(w_sh), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__shard")
        .withColumn(
            id_name,
            (F.col("__off") + F.col("__local") - 1).cast("bigint"),
        )
        .drop("__shard", "__local", "__off")
    )
