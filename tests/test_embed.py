"""C49 hashed text embeddings (operators/embed.py): oracle parity,
determinism, sign balance, and the end-to-end contract — the hashed
vectors feed the existing similarity family directly from raw text."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle
from umls2rdf_spark.operators.embed import (
    hashed_embedding,
    hashed_embedding_sql,
    to_embedding_rows,
)
from umls2rdf_spark.plans.completion import (
    _EMB_DIM,
    _OCC_ID_SQL,
    _token_occ_id_frame,
)
from umls2rdf_spark.sources.parquet import load_table

SF_ORACLE = "/root/testdata/sf0.01"


def test_hashed_embedding_matches_oracle(spark, duck):
    occ = _token_occ_id_frame(load_table(spark, SF_ORACLE, "documents"))
    got = hashed_embedding(occ, "doc_id", "token", dim=_EMB_DIM)
    assert_matches_oracle(
        got,
        duck,
        hashed_embedding_sql(_OCC_ID_SQL, "doc_id", "token", _EMB_DIM),
    )


def test_vectors_are_partitioning_invariant_and_dense(spark):
    occ = _token_occ_id_frame(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    a = hashed_embedding(occ, "doc_id", "token", dim=8)
    b = hashed_embedding(
        occ.repartition(17, "token"), "doc_id", "token", dim=8
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )
    # every appearing doc has ALL dims (explode emits each j)
    per_doc = a.groupBy("doc_id").count().select("count").distinct()
    assert [r["count"] for r in per_doc.collect()] == [8]


def test_sign_balance(spark):
    # ~half the (token, j) cells hash to +1 — the projection is not
    # degenerate (a bias would collapse cosine geometry)
    toks = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), F.col("id")).alias("token"),
    )
    lng = hashed_embedding(toks, "doc_id", "token", dim=4)
    pos = lng.where(F.col("v") > 0).count()
    assert abs(pos - 4000) < 400  # 8000 cells, each ±1


def test_end_to_end_feeds_similarity_family(spark):
    # text -> hashed vectors -> exact cosine top-k: a doc's nearest
    # neighbor under the hashed embedding is its exact duplicate
    from umls2rdf_spark.operators.similarity import cosine_topk

    dim = 16
    rows = [
        (0, "spark shuffles data across the cluster"),
        (1, "spark shuffles data across the cluster"),  # dup of 0
        (2, "ducks prefer ponds with quiet reeds"),
        (3, "ducks prefer ponds with quiet reeds"),  # dup of 2
        (4, "completely different orthogonal subject matter"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    occ = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(split(lower(text), '[^a-z0-9]+'), "
                "x -> x <> '')"
            )
        ).alias("token"),
    )
    vecs = to_embedding_rows(
        hashed_embedding(occ, "doc_id", "token", dim=dim),
        "doc_id",
        dim,
    ).withColumnRenamed("doc_id", "vec_id")
    top = cosine_topk(
        vecs, vecs.where(F.col("vec_id").isin(0, 2)),
        "vec_id", "embedding", k=2, dim=dim,
    )
    best = {
        r.query_id: (r.neighbor_id, r.cos_sim)
        for r in top.where(F.col("rank") == 1).collect()
    }  # cosine_topk excludes self; the exact dup is rank 1, cos 1.0
    assert best == {0: (1, 1.0), 2: (3, 1.0)}
