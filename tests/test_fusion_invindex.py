"""C71 RRF rank fusion / C72 inverted-index boolean retrieval:
hand-built semantics, validation, and DuckDB twin parity at sf0.01
(the driver sections reuse these exact code paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle
from umls2rdf_spark.operators.fusion import (
    RRF_SCALE,
    l2_topk,
    rrf_fuse,
    rrf_fuse_sql,
)
from umls2rdf_spark.operators.invindex import (
    boolean_query,
    boolean_query_sql,
    build_postings,
    postings_sql,
    postings_stats,
)

SF_ORACLE = "/root/testdata/sf0.01"


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id bigint, neighbor_id bigint, rank int"
    )


def test_rrf_hand_scores(spark):
    """Exact integer contributions: item 7 ranked 1st+2nd beats
    item 8 ranked 2nd+1st only via the id tie-break (symmetric
    ranks, equal scores)."""
    a = _ranked(spark, [(1, 7, 1), (1, 8, 2)])
    b = _ranked(spark, [(1, 8, 1), (1, 7, 2)])
    got = {
        r.neighbor_id: (r.n_lists, r.rrf_q, r.fused_rank)
        for r in rrf_fuse({"a": a, "b": b}, k_rrf=60).collect()
    }
    s = RRF_SCALE // 61 + RRF_SCALE // 62
    assert got == {7: (2, s, 1), 8: (2, s, 2)}


def test_rrf_single_list_membership_wins(spark):
    """An item surfaced by BOTH lists at middling ranks outscores a
    top-1 from a single list — the consensus property RRF exists
    for (1/61 < 1/63 + 1/64)."""
    a = _ranked(spark, [(1, 10, 1), (1, 20, 3)])
    b = _ranked(spark, [(1, 20, 4), (1, 30, 1)])
    rows = rrf_fuse({"a": a, "b": b}, k_rrf=60).collect()
    top = min(rows, key=lambda r: r.fused_rank)
    assert top.neighbor_id == 20 and top.n_lists == 2


def test_rrf_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse({})
    with pytest.raises(ValueError, match="k_rrf"):
        rrf_fuse({"a": _ranked(spark, [(1, 2, 1)])}, k_rrf=0)


def test_metrics_genuinely_disagree(spark):
    """Cosine and L2 rank the unnormalized embeddings differently
    for at least one query — the fusion demo is fusing real
    disagreement, not two copies of one list."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 10)
    from umls2rdf_spark.operators.similarity import cosine_topk

    cos = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(emb, qs, "vec_id", "embedding", k=5).collect()
    }
    l2 = {
        (r.query_id, r.rank): r.neighbor_id
        for r in l2_topk(emb, qs, "vec_id", "embedding", k=5).collect()
    }
    assert cos != l2


def test_fused_oracle_parity(spark, duck):
    from umls2rdf_spark.operators.similarity import cosine_topk
    from umls2rdf_spark.plans.completion import (
        _RRF_K,
        _RRF_KRRF,
        _RRF_QUERIES,
        _RRF_TOPK,
        _vec_lists_sql,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < _RRF_QUERIES)
    fused = rrf_fuse(
        {
            "cos": cosine_topk(emb, qs, "vec_id", "embedding", k=_RRF_K),
            "l2": l2_topk(emb, qs, "vec_id", "embedding", k=_RRF_K),
        },
        k_rrf=_RRF_KRRF,
        topk=_RRF_TOPK,
    )
    assert_matches_oracle(
        fused,
        duck,
        rrf_fuse_sql(
            dict(zip(("cos", "l2"), _vec_lists_sql())),
            k_rrf=_RRF_KRRF,
            topk=_RRF_TOPK,
        ),
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_boolean_query_hand_semantics(spark):
    """must = conjunction, must_not = veto, should = rank signal
    (0 allowed); tokens repeated within a doc count once."""
    p = build_postings(
        _docs(
            spark,
            [
                (1, "fast query engine, query planner"),
                (2, "query window sort"),
                (3, "query window customer"),
                (4, "window only"),
            ],
        ),
        "doc_id",
        "text",
    )
    got = {
        r.doc_id: r.n_should
        for r in boolean_query(
            p,
            must=["query", "window"],
            should=["sort", "planner", "engine"],
            must_not=["customer"],
        ).collect()
    }
    # 1 lacks 'window'; 3 vetoed; 4 lacks 'query'
    assert got == {2: 1}
    # conjunction-as-counting is safe against in-doc repeats
    stats = {
        r.token: r.doc_freq for r in postings_stats(p).collect()
    }
    assert stats["query"] == 3  # doc 1 counted once despite 2 uses


def test_boolean_query_validation(spark):
    p = build_postings(_docs(spark, [(1, "a b")]), "doc_id", "text")
    with pytest.raises(ValueError, match="must term"):
        boolean_query(p, must=[])
    with pytest.raises(ValueError, match="both must"):
        boolean_query(p, must=["a"], must_not=["a"])


def test_boolean_query_oracle_parity(spark, duck):
    from umls2rdf_spark.plans.completion import (
        _BQ_MUST,
        _BQ_NOT,
        _BQ_SHOULD,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = boolean_query(
        build_postings(docs, "doc_id", "text"),
        must=_BQ_MUST,
        should=_BQ_SHOULD,
        must_not=_BQ_NOT,
    )
    assert_matches_oracle(
        got,
        duck,
        boolean_query_sql(
            postings_sql("SELECT * FROM documents", "doc_id", "text"),
            _BQ_MUST,
            _BQ_SHOULD,
            _BQ_NOT,
        ),
    )


def test_exact_topk_kernel_impls_equal_sql(spark):
    """round 9: cosine_topk / l2_topk default to the single-bucket
    vectorized kernel; rows, ranks, and score values (bit-level)
    must equal the pure-SQL broadcast baseline, with and without
    the completeness-preserving max_bucket valve."""
    from tests.conftest import SF_DIR
    from umls2rdf_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 12)
    cos_sql = sorted(
        map(tuple, cosine_topk(
            emb, qs, "vec_id", "embedding", k=4, impl="sql"
        ).collect())
    )
    assert cos_sql
    assert cos_sql == sorted(
        map(tuple, cosine_topk(emb, qs, "vec_id", "embedding", k=4).collect())
    )
    assert cos_sql == sorted(
        map(tuple, cosine_topk(
            emb, qs, "vec_id", "embedding", k=4, max_bucket=50
        ).collect())
    )
    l2_sql = sorted(
        map(tuple, l2_topk(
            emb, qs, "vec_id", "embedding", k=4, impl="sql"
        ).collect())
    )
    assert l2_sql
    assert l2_sql == sorted(
        map(tuple, l2_topk(emb, qs, "vec_id", "embedding", k=4).collect())
    )
    assert l2_sql == sorted(
        map(tuple, l2_topk(
            emb, qs, "vec_id", "embedding", k=4, max_bucket=50
        ).collect())
    )
