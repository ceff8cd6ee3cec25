"""C66 content-defined chunking dedup: lossless reconstruction,
shift-resistance (the property fixed-size blocking lacks),
keep-first accounting, the POS_BITS valve, and exact oracle parity
on the real corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umls2rdf_spark.operators.cdc import (
    cdc_chunk_occurrences,
    cdc_dedup_stats,
    cdc_dedup_stats_sql,
)
from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_reconstruction_lossless(spark):
    """Chunks concatenated in pos order are exactly the text —
    boundaries partition the character range."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    occ = cdc_chunk_occurrences(docs, "doc_id", "text")
    rec = occ.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("rt")
    )
    bad = (
        rec.join(docs, "doc_id")
        .where(F.col("rt") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_shift_resistance(spark):
    """Prepending a small edit to a copy re-chunks only the head:
    the copy's tail chunks dedup against the original (the property
    that fixed-size blocks lose — every block would re-align)."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
        "psi omega " * 8
    )
    out = {
        r.doc_id: (r.n_chunks, r.n_dup, r.dup_chars)
        for r in cdc_dedup_stats(
            _docs(spark, [(0, base), (1, "EDIT! " + base)]),
            "doc_id",
            "text",
        ).collect()
    }
    n1, d1, _ = out[1]
    # the shifted copy still dedups the vast majority of its chunks
    assert d1 >= n1 - 3
    # and the original (first in corpus order) keeps its self-repeats
    assert out[0][0] > 0


def test_within_doc_repeats_count_as_dup(spark):
    """Keep-first is corpus-order global: a chunk repeated WITHIN one
    document dedups against its own earlier occurrence."""
    blk = "zz content defined chunk body text zz " * 6
    out = cdc_dedup_stats(
        _docs(spark, [(7, blk + "MIDDLE-UNIQUE-SPAN " + blk)]),
        "doc_id",
        "text",
    ).collect()[0]
    assert out.n_dup > 0
    assert out.dup_chars > 0


def test_empty_and_short_texts(spark):
    out = {
        r.doc_id: (r.n_chunks, r.n_dup, r.dup_chars)
        for r in cdc_dedup_stats(
            _docs(spark, [(0, ""), (1, "tiny"), (2, "x" * 11)]),
            "doc_id",
            "text",
        ).collect()
    }
    assert out[0] == (0, 0, 0)  # empty text -> zero row, not a crash
    assert out[1] == (1, 0, 0)  # below window width -> one chunk
    assert out[2][0] >= 1


def test_pos_bits_valve(spark):
    """A document with more than 2^pos_bits chunks fails CLOSED.

    Exercised at pos_bits=8 (same code path as the 2^20 production
    default — the cap is a parameter precisely so the valve is
    testable without building a megabyte of interpreted-eval HOF
    chunks, which costs O(doc·window) and ran for MINUTES)."""
    # divisor=1 cuts at every candidate position -> ~n chunks
    big = "a" * ((1 << 8) + 40)
    with pytest.raises(Exception, match="cdc_dedup_stats"):
        cdc_dedup_stats(
            _docs(spark, [(0, big)]), "doc_id", "text",
            divisor=1, pos_bits=8,
        ).collect()
    # just under the cap sails through
    ok = "a" * ((1 << 8) - 40)
    rows = cdc_dedup_stats(
        _docs(spark, [(0, ok)]), "doc_id", "text",
        divisor=1, pos_bits=8,
    ).collect()
    assert rows and rows[0]["n_chunks"] > 0


def test_oracle_parity_real_corpus(spark):
    from tests.conftest import make_duck

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in cdc_dedup_stats(docs, "doc_id", "text").collect()
    )
    con = make_duck(SF_DIR)
    try:
        want = sorted(
            tuple(r)
            for r in con.execute(cdc_dedup_stats_sql()).fetchall()
        )
    finally:
        con.close()
    assert got == want
    # and the section genuinely exercises dedup on the real corpus
    assert sum(r[2] for r in got) > 0
