"""Similarity search over embedding columns.

Brute-force cosine top-k is the exactness baseline: broadcast the
(small) query set, one pass over the corpus, per-query top-k via
window — never a global sort. The LSH variant buckets vectors by
random-hyperplane sign bits so candidate generation is a bucket-local
join — the 100 TB path where brute force against every corpus vector
is off the table.

Determinism: all dot products/norms are exact integer sums over
quantized components (functions/vectors.py), so rankings are
reproducible across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from umls2rdf_spark.functions.vectors import explode_components, norm2_by_id


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, cos_sim) with cos_sim
    rounded to 6 dp; ties broken by neighbor id.
    """
    corpus = explode_components(vectors, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "pos", F.col("comp").alias("c_comp")
    )
    qcomp = explode_components(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), "pos", F.col("comp").alias("q_comp")
    )
    corpus_norms = norm2_by_id(
        explode_components(vectors, id_col, vec_col), id_col
    ).select(F.col(id_col).alias("neighbor_id"), F.col("norm2").alias("c_norm2"))
    query_norms = norm2_by_id(
        explode_components(queries, id_col, vec_col), id_col
    ).select(F.col(id_col).alias("query_id"), F.col("norm2").alias("q_norm2"))

    dots = (
        corpus.join(F.broadcast(qcomp), "pos")
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("c_comp") * F.col("q_comp")).alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(query_norms), "query_id")
        .join(corpus_norms, "neighbor_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("dot").cast("double")
                / F.sqrt((F.col("q_norm2") * F.col("c_norm2")).cast("double"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.col("cos").alias("cos_sim"),
        )
    )


def hyperplane_bucket_expr(dim: int, planes: int):
    """Deterministic pseudo-random hyperplanes: component j of plane i
    is ((i*2654435761 + j*40503) mod 1009) - 504 (integer, engine-
    neutral). Returns a closure building the bucket id column from the
    long (pos, comp) form via conditional sums."""
    def coeff(i: int, j: int) -> int:
        return (i * 2654435761 + j * 40503) % 1009 - 504

    return coeff


def lsh_bucket_ids(
    vectors: DataFrame, id_col: str, vec_col: str, planes: int = 4, dim: int = 64
) -> DataFrame:
    """(id, bucket): sign-bit bucket from ``planes`` fixed hyperplanes.

    One narrow pass per vector (no shuffle at all — the dot products
    against constant hyperplanes are a map-side transform over the
    quantized array).
    """
    coeff = hyperplane_bucket_expr(dim, planes)
    comps = explode_components(vectors, id_col, vec_col)
    dot_exprs = [
        F.sum(
            F.col("comp")
            * F.element_at(
                F.array(*[F.lit(coeff(i, j)) for j in range(dim)]),
                (F.col("pos") + 1).cast("int"),
            )
        ).alias(f"d{i}")
        for i in range(planes)
    ]
    dots = comps.groupBy(id_col).agg(*dot_exprs)
    bucket = None
    for i in range(planes):
        bit = F.when(F.col(f"d{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return dots.select(F.col(id_col), bucket.alias("bucket"))


def lsh_cosine_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    planes: int = 4,
) -> DataFrame:
    """Approximate top-k: brute force restricted to same-bucket pairs.

    The bucket join replaces the all-pairs product with ~2^planes
    bucket-local joins — the scale path for corpus-vs-corpus search.
    """
    buckets = lsh_bucket_ids(vectors, id_col, vec_col, planes)
    comps = explode_components(vectors, id_col, vec_col).join(
        buckets, id_col
    )
    norms = norm2_by_id(
        explode_components(vectors, id_col, vec_col), id_col
    )
    a = comps.select(
        F.col("bucket"), F.col(id_col).alias("query_id"), "pos",
        F.col("comp").alias("q_comp"),
    )
    b = comps.select(
        F.col("bucket"), F.col(id_col).alias("neighbor_id"), "pos",
        F.col("comp").alias("c_comp"),
    )
    dots = (
        a.join(b, ["bucket", "pos"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("q_comp") * F.col("c_comp")).alias("dot"))
    )
    qn = norms.select(F.col(id_col).alias("query_id"), F.col("norm2").alias("qn"))
    cn = norms.select(
        F.col(id_col).alias("neighbor_id"), F.col("norm2").alias("cn")
    )
    scored = (
        dots.join(qn, "query_id")
        .join(cn, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("dot").cast("double")
                / F.sqrt((F.col("qn") * F.col("cn")).cast("double"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            F.col("cos").alias("cos_sim"),
        )
    )
