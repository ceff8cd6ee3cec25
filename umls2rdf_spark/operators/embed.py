"""Hashed text embeddings (feature hashing / signed random
projection): a deterministic, engine-exact dense vector per document
built from nothing but the text — the missing FRONT of the
embedding-based family. Every embedding consumer in the engine
(dedup_embedding C2b, the ANN family C5/C6, SemDeDup C30,
hard-negative mining, embedding decontamination C43) reads a
precomputed ``embeddings`` table; this operator lets the same
pipelines run END-TO-END from raw text when no model-served vectors
exist — the classic hashing-trick representation (Weinberger et al.
2009) that production retrieval stacks use as the cheap first tier.

v_d[j] = Σ_{token occurrences t in d} sign(h(t, j)) ·
         (1 if unweighted else occurrence weight)

with sign(h) = ±1 from the house md5 hash of ``token|j`` — so the
projection matrix is implicit (no stored weights), any shard/engine
derives identical vectors, and vectors of different corpora are
directly comparable (the "model" has no trained state, like SimHash's
hyperplanes but integer-exact).

Spark-first shape: one token explode → one dim explode (dim is a
literal array, map-side) → groupBy(id, j) SUM — integer end to end,
map-side combined, shuffle keyed on (id, j) so hot documents spread
across dim partitions. Output is the LONG form (id, j, v): exactly
what the fingerprint gate and any matrix consumer wants;
:func:`to_embedding_rows` pivots to the array<double> form the
similarity operators take (sort_array over collected (j, v) structs —
deterministic order).

100 TB: cost is occurrences×dim rows through a map-side-combined
sum — embarrassingly parallel, no driver state, no model download;
dim is the knob (16-64 for dedup/clustering tiers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import (
    stable_hash40,
    stable_hash40_sql,
)


def hashed_embedding(
    df: DataFrame,
    id_col: str,
    token_col: str,
    dim: int = 16,
) -> DataFrame:
    """(id, j, v): the signed-hash projection in long form over a
    token-occurrence frame (one row per occurrence — repeated tokens
    weight the vector, the bag-of-words semantics)."""
    dims = F.array(*[F.lit(j) for j in range(dim)])
    cells = df.select(
        F.col(id_col),
        F.col(token_col).alias("__t"),
        F.explode(dims).alias("j"),
    ).select(
        id_col,
        F.col("j").cast("bigint").alias("j"),
        F.when(
            F.pmod(
                stable_hash40(
                    F.concat(F.col("__t"), F.lit("|"), F.col("j"))
                ),
                F.lit(2),
            )
            == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("__s"),
    )
    return cells.groupBy(id_col, "j").agg(
        F.sum("__s").cast("bigint").alias("v")
    )


def to_embedding_rows(
    long_df: DataFrame, id_col: str, dim: int
) -> DataFrame:
    """(id, embedding array<double>): pivot the long form into the
    array shape the similarity/ANN/SemDeDup operators consume —
    absent dims (documents with no tokens hashing to j never occur;
    all j are emitted per occurrence, so absence only means an empty
    document) filled with 0.0, order fixed by sort_array on j."""
    arr = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("j"), F.col("v")))
        ),
        lambda s: s["v"].cast("double"),
    )
    out = long_df.groupBy(id_col).agg(arr.alias("embedding"))
    # documents whose every token is empty produce no long rows at
    # all — consumers join on id, so absence is the correct shape;
    # dims are dense for any doc that appears (explode emits all j)
    return out


def hashed_embedding_sql(
    occ_sql: str, id_col: str, token_expr: str, dim: int = 16
) -> str:
    """DuckDB twin of :func:`hashed_embedding` over ``occ_sql``."""
    h = stable_hash40_sql(f"({token_expr} || '|' || CAST(j AS VARCHAR))")
    return f"""
WITH __occ AS ({occ_sql}),
__cells AS (
  SELECT {id_col}, CAST(j AS BIGINT) AS j,
         CASE WHEN ({h}) % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM __occ, UNNEST(generate_series(0, {dim - 1})) AS __d(j))
SELECT {id_col}, j, CAST(SUM(s) AS BIGINT) AS v
FROM __cells GROUP BY 1, 2
"""
