"""Rank fusion for hybrid retrieval: reciprocal-rank fusion (RRF,
Cormack et al. 2009) over any set of per-query ranked lists — the
standard combiner when a corpus is searched through MORE THAN ONE
scorer (dense embedding similarity + lexical BM25 is the hybrid-
search shape every retrieval-augmented pipeline runs; metric
variants like cosine-vs-L2 disagree on unnormalized vectors for the
same reason). RRF needs only RANKS, not comparable scores, which is
exactly why it is the default fusion: BM25 scores and cosines live
on incomparable scales.

Engine-exact scoring: the textbook 1/(k + rank) is a float; here
each contribution is the integer quotient ``scale div (k + rank)``
(scale = 10^9), summed in int64 — order-independent, identical in
both engines, and monotone-equivalent to the float form for any
rank spread the quotient resolves (ranks differing by 1 at k=60
differ by >250k quanta at 10^9 — quantization never reorders until
ranks are in the hundreds of thousands, which a fused top-k never
sees). Ties break on item id.

At 100 TB: the inputs are ALREADY top-k frames (|queries| x k rows
each — the constituent retrievers did the data-sized work under
their own scale arguments); fusion is a union + one
map-side-combined groupBy + one WindowGroupLimit-pruned rank over
per-query groups of <= lists*k rows. The fusion stage is never the
bottleneck, by construction.

Also here: :func:`l2_topk`, the exact squared-Euclidean twin of
similarity.cosine_topk (dist2 = |q|^2 + |c|^2 − 2<q,c> over the
quantized int vectors — PURE int64, no sqrt needed for ranking), the
second metric the fusion demo combines.

Reference parity: none (no retrieval surface in the reference);
LLM-pipeline extension (SURVEY §2 C71).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_SCALE = 10**9


def l2_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int = 64,
    impl: str = "kernel",
    max_bucket: int | None = None,
) -> DataFrame:
    """Exact top-k squared-L2 neighbors per query: (query_id,
    neighbor_id, rank, dist2) — rank by (dist2 ASC, neighbor ASC),
    dist2 exact int64 on the quantized vectors.

    ``impl="kernel"`` (default) runs the single-bucket vectorized
    kernel (every dist2 term exact int64 — |q|^2 + |c|^2 - 2<q,c>
    as one matmul; guide §4.2), same reasoning and valve as
    similarity.cosine_topk; ``impl="sql"`` keeps the broadcast-
    the-queries / one-corpus-pass pure-SQL baseline. Equality is
    pinned by test."""
    from umls2rdf_spark.operators.similarity import (
        _bucketed_role_topk,
        _dot_expr,
        _with_qvec,
    )

    if impl == "kernel":
        import numpy as np

        def assign(q, probes):
            return np.zeros((q.shape[0], probes), dtype=np.int64)

        return _bucketed_role_topk(
            vectors, queries, id_col, vec_col, None,
            k=k, nprobe=1, assign_fn=assign, max_bucket=max_bucket,
            metric="l2",
        )

    corpus = _with_qvec(vectors, id_col, vec_col, dim).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("c_vec"),
        F.col("norm2").alias("c_norm2"),
    )
    qs = _with_qvec(queries, id_col, vec_col, dim).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_vec"),
        F.col("norm2").alias("q_norm2"),
    )
    scored = corpus.join(
        F.broadcast(qs),
        F.col("query_id") != F.col("neighbor_id"),
        "inner",
    ).select(
        "query_id",
        "neighbor_id",
        (
            F.col("q_norm2")
            + F.col("c_norm2")
            - F.lit(2) * _dot_expr("q_vec", "c_vec", dim)
        )
        .cast("bigint")
        .alias("dist2"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist2")
    )


def rrf_fuse(
    lists: dict[str, DataFrame],
    k_rrf: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Fuse named ranked lists — each a (query_id, neighbor_id,
    rank) frame (extra columns ignored) — into (query_id,
    neighbor_id, n_lists, rrf_q, fused_rank): ``rrf_q`` = Σ over
    lists of ``RRF_SCALE div (k_rrf + rank)``, ``n_lists`` = how
    many lists surfaced the item, top ``topk`` per query by
    (rrf_q DESC, neighbor_id ASC)."""
    if not lists:
        raise ValueError("rrf_fuse: need at least one ranked list")
    if k_rrf < 1:
        raise ValueError("rrf_fuse: k_rrf must be >= 1")
    parts = [
        df.select(
            "query_id",
            "neighbor_id",
            F.expr(f"{RRF_SCALE} div ({k_rrf} + rank)")
            .cast("bigint")
            .alias("__contrib"),
        )
        for df in lists.values()
    ]
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = allc.groupBy("query_id", "neighbor_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.sum("__contrib").cast("bigint").alias("rrf_q"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            "n_lists",
            "rrf_q",
            "fused_rank",
        )
    )


def rrf_fuse_sql(
    list_sqls: dict[str, str],
    k_rrf: int = 60,
    topk: int = 10,
) -> str:
    """DuckDB twin of :func:`rrf_fuse` — each value in ``list_sqls``
    must select (query_id, neighbor_id, rank)."""
    unions = "\nUNION ALL\n".join(
        f"SELECT query_id, neighbor_id, "
        f"CAST({RRF_SCALE} // ({k_rrf} + rank) AS BIGINT) AS contrib "
        f"FROM ({sql}) AS __list_{name}"
        for name, sql in list_sqls.items()
    )
    return f"""
WITH __contribs AS ({unions}),
__fused AS (
  SELECT query_id, neighbor_id,
         CAST(COUNT(*) AS BIGINT) AS n_lists,
         CAST(SUM(contrib) AS BIGINT) AS rrf_q
  FROM __contribs GROUP BY 1, 2)
SELECT query_id, neighbor_id, n_lists, rrf_q,
       CAST(fused_rank AS INTEGER) AS fused_rank
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY rrf_q DESC, neighbor_id) AS fused_rank
      FROM __fused) AS __ranked
WHERE fused_rank <= {topk}
"""
