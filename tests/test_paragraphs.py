"""C64 cross-document paragraph dedup: keep-first semantics, every
input doc present, idempotence, the POS_BITS valve, and oracle
parity on the driver demo's seeded corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umls2rdf_spark.operators.paragraphs import (
    dedup_paragraphs,
    dedup_paragraphs_sql,
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = dedup_paragraphs(df, "doc_id", "text", **kw).collect()
    return {r.doc_id: (r.text_clean, r.n_paras, r.n_kept) for r in out}


def test_keep_first_semantics(spark):
    got = _run(
        spark,
        [
            (0, "boiler\nzero only\nboiler"),
            (1, "one only\nboiler"),
            (2, ""),
        ],
    )
    # first occurrence (doc 0, pos 0) survives; later copies stripped
    assert got[0] == ("boiler\nzero only", 3, 2)
    assert got[1] == ("one only", 2, 1)
    # empty doc still gets a row
    assert got[2] == ("", 0, 0)


def test_idempotent(spark):
    rows = [
        (0, "a common one\nunique zero"),
        (1, "a common one\nunique one\na common one"),
    ]
    once = _run(spark, rows)
    again = _run(
        spark, [(k, v[0]) for k, v in sorted(once.items())]
    )
    assert {k: v[0] for k, v in once.items()} == {
        k: v[0] for k, v in again.items()
    }
    # second pass removes nothing
    assert all(v[1] == v[2] for v in again.values())


def test_pos_bits_valve(spark):
    from umls2rdf_spark.operators.paragraphs import POS_BITS

    big = "\n".join(f"p{i} xxxx" for i in range((1 << POS_BITS) + 1))
    df = spark.createDataFrame([(0, big)], "doc_id bigint, text string")
    with pytest.raises(Exception, match="dedup_paragraphs"):
        dedup_paragraphs(df, "doc_id", "text").collect()


def test_demo_matches_oracle(spark, duck):
    from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle
    from umls2rdf_spark.plans.completion import (
        _PARA_MIN_CHARS,
        _para_seeded_frame,
        _paragraph_dedup_sql,
    )
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = dedup_paragraphs(
        _para_seeded_frame(docs),
        "doc_id",
        "ptext",
        min_chars=_PARA_MIN_CHARS,
    )
    assert_matches_oracle(got, duck, _paragraph_dedup_sql())
    # the seeded boilerplate survives in exactly one document
    pdf = got.toPandas()
    n_boiler = pdf["text_clean"].str.contains("COOKIE BANNER").sum()
    assert n_boiler == 1
    # and real dedup happened beyond the seed
    assert (pdf["n_kept"] < pdf["n_paras"]).sum() > 1
