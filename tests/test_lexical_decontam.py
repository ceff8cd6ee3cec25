"""Fuzzy lexical benchmark decontamination (SURVEY §2 C60) — exact
Python replica, oracle parity, the asymmetric containment catch,
banded-candidate soundness, and the empty-benchmark fail-open pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle
from umls2rdf_spark.operators.corpus import (
    decontaminate_lexical,
    decontaminate_lexical_sql,
    lexical_decontam_candidates,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog every day"),
    (2, "the quick brown fox jumps over the lazy cat every day"),
    # doc 3 CONTAINS bench item 20 verbatim inside a long document:
    # jaccard is low (short bench vs long doc) but bench-containment
    # is 1.0 — the asymmetric leak a jaccard threshold ships
    (3, "prologue text here and then what is the capital of france "
        "answer paris plus a very long tail of unrelated filler "
        "words that dilute the jaccard far below any threshold"),
    (4, "completely unrelated content about database engines"),
]
BENCH = [
    (10, "the quick brown fox jumps over the lazy dog every day"),
    (20, "what is the capital of france answer paris"),
]


def _shingles(text: str, n: int = 3) -> set:
    t = [w for w in text.split(" ") if w != ""]
    return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}


def _replica(corpus, bench, mj=0.5, mbc=0.8):
    out = {}
    for cid, ct in corpus:
        cs = _shingles(ct)
        best_j, best_bc = None, None
        for _bid, bt in bench:
            bs = _shingles(bt)
            inter = len(cs & bs)
            if inter == 0:
                continue
            j = inter / (len(cs) + len(bs) - inter)
            bc = inter / len(bs)
            best_j = j if best_j is None else max(best_j, j)
            best_bc = bc if best_bc is None else max(best_bc, bc)
        keep = (best_j is None or best_j < mj) and (
            best_bc is None or best_bc < mbc
        )
        out[cid] = (best_j, best_bc, keep)
    return out


def _frames(spark):
    c = spark.createDataFrame(CORPUS, "doc_id int, text string")
    b = spark.createDataFrame(BENCH, "bench_id int, text string")
    return c, b


def test_matches_python_replica(spark):
    c, b = _frames(spark)
    got = {
        r["doc_id"]: (
            r["max_jaccard"],
            r["max_bench_containment"],
            r["keep"],
        )
        for r in decontaminate_lexical(
            c, b, "doc_id", "text", "bench_id", "text"
        ).collect()
    }
    assert got == _replica(CORPUS, BENCH)


def test_containment_catches_embedded_benchmark(spark):
    """Doc 3: jaccard far below 0.5, bench-containment exactly 1.0 —
    flagged. Doc 1: exact duplicate of bench 10 — jaccard 1.0,
    flagged. Doc 2: near-dup (one word) — flagged by jaccard.
    Doc 4: no overlap — kept with NULL maxes."""
    c, b = _frames(spark)
    rows = {
        r["doc_id"]: r
        for r in decontaminate_lexical(
            c, b, "doc_id", "text", "bench_id", "text"
        ).collect()
    }
    assert rows[3]["max_jaccard"] < 0.5
    assert rows[3]["max_bench_containment"] == 1.0
    assert rows[3]["keep"] is False
    assert rows[1]["max_jaccard"] == 1.0 and rows[1]["keep"] is False
    assert rows[2]["keep"] is False
    assert rows[4]["max_jaccard"] is None and rows[4]["keep"] is True


def test_empty_benchmark_keeps_everything(spark):
    c, _ = _frames(spark)
    b = c.where(F.lit(False)).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    out = decontaminate_lexical(
        c, b, "doc_id", "text", "bench_id", "text"
    ).collect()
    assert len(out) == len(CORPUS)
    assert all(r["keep"] is True for r in out)
    assert all(r["max_jaccard"] is None for r in out)


def test_banded_candidates_are_sound(spark):
    """Scale path: restricting the verify to minhash-band candidates
    can only UNDER-flag (fail-open), and every score it does emit
    equals the exact path's score for that doc."""
    c, b = _frames(spark)
    cand = lexical_decontam_candidates(
        c, b, "doc_id", "text", "bench_id", "text"
    )
    banded = {
        r["doc_id"]: r
        for r in decontaminate_lexical(
            c, b, "doc_id", "text", "bench_id", "text",
            candidates=cand,
        ).collect()
    }
    exact = {
        r["doc_id"]: r
        for r in decontaminate_lexical(
            c, b, "doc_id", "text", "bench_id", "text"
        ).collect()
    }
    assert set(banded) == set(exact)
    for did, brow in banded.items():
        if brow["keep"] is False:
            assert exact[did]["keep"] is False
        if brow["max_jaccard"] is not None:
            # a banded pair is a real pair: scores match exactly
            assert brow["max_jaccard"] <= (exact[did]["max_jaccard"] or 0)


def test_matches_oracle(spark, duck):
    """Both engines over the sf0.01 documents table with a seeded
    benchmark (every 17th doc's 3/5-word prefix — high containment
    for the source doc, partial jaccard for its near-dups)."""
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(
            F.slice(
                F.split(F.col("text"), " "),
                1,
                F.greatest(
                    F.lit(3),
                    F.expr(
                        "CAST((size(split(text, ' ')) * 3) div 5"
                        " AS INT)"
                    ),
                ),
            ),
            " ",
        ).alias("text"),
    )
    bench_sql = """
SELECT doc_id AS bench_id,
       array_to_string(list_slice(string_split(text, ' '), 1,
         greatest(3, CAST((len(string_split(text, ' ')) * 3) // 5
                          AS INT))), ' ') AS text
FROM documents WHERE doc_id % 17 = 0"""
    assert_matches_oracle(
        decontaminate_lexical(
            docs, bench, "doc_id", "text", "bench_id", "text"
        ),
        duck,
        decontaminate_lexical_sql(
            "SELECT * FROM documents",
            bench_sql,
            "doc_id",
            "text",
            "bench_id",
            "text",
        ),
    )


def test_bench_max_df_is_fail_open_only(spark):
    """The hot-shingle valve can only LOWER scores (drop flags),
    never raise them: with an aggressive cap every flag that
    survives was already a flag without the cap, and verbatim
    duplicates (whose overlap includes rare shingles) stay caught."""
    c, b = _frames(spark)
    # duplicate bench rows so every shingle of bench 10 has df >= 2
    b2 = b.union(
        b.select((F.col("bench_id") + 100).alias("bench_id"), "text")
    )
    uncapped = {
        r["doc_id"]: r
        for r in decontaminate_lexical(
            c, b2, "doc_id", "text", "bench_id", "text"
        ).collect()
    }
    capped = {
        r["doc_id"]: r
        for r in decontaminate_lexical(
            c, b2, "doc_id", "text", "bench_id", "text",
            bench_max_df=1,
        ).collect()
    }
    for did, row in capped.items():
        if row["keep"] is False:
            assert uncapped[did]["keep"] is False
        got = row["max_jaccard"] or 0.0
        ref = uncapped[did]["max_jaccard"] or 0.0
        assert got <= ref + 1e-12
    # cap high enough to be a no-op -> identical output
    nocap = {
        r["doc_id"]: (
            r["max_jaccard"], r["max_bench_containment"], r["keep"]
        )
        for r in decontaminate_lexical(
            c, b2, "doc_id", "text", "bench_id", "text",
            bench_max_df=10**6,
        ).collect()
    }
    assert nocap == {
        k: (
            v["max_jaccard"], v["max_bench_containment"], v["keep"]
        )
        for k, v in uncapped.items()
    }


def test_bench_max_df_matches_oracle(spark, duck):
    """The valve's DuckDB twin: identical flags and scores under an
    aggressive cap at sf0.01."""
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    assert_matches_oracle(
        decontaminate_lexical(
            docs, bench, "doc_id", "text", "bench_id", "text",
            bench_max_df=2,
        ),
        duck,
        decontaminate_lexical_sql(
            "SELECT * FROM documents",
            "SELECT doc_id AS bench_id, text FROM documents"
            " WHERE doc_id % 17 = 0",
            "doc_id",
            "text",
            "bench_id",
            "text",
            bench_max_df=2,
        ),
    )
