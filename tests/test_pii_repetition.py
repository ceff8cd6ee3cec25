"""C44 PII scrubbing (operators/pii.py) and C45 within-doc
repetition signals (operators/repetition.py): oracle parity, rule
pins, order-dependence, and the zero-shuffle plan contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle
from umls2rdf_spark.operators.pii import PII_STAGES, pii_scrub, pii_scrub_sql
from umls2rdf_spark.operators.repetition import (
    TOP_BIGRAM_MAX_PPM,
    doc_repetition,
    doc_repetition_sql,
)
from umls2rdf_spark.plans.completion import (
    _PII_PAGES_SQL,
    _pii_pages_frame,
)
from umls2rdf_spark.sources.parquet import load_table

SF_ORACLE = "/root/testdata/sf0.01"


# ── oracle parity (the driver's bar, full output not fingerprints) ──
def test_pii_scrub_matches_oracle(spark, duck):
    got = pii_scrub(
        _pii_pages_frame(load_table(spark, SF_ORACLE, "documents")),
        "doc_id",
        "text",
    )
    assert_matches_oracle(
        got, duck, pii_scrub_sql(_PII_PAGES_SQL, "doc_id", "text")
    )


def test_doc_repetition_matches_oracle(spark, duck):
    got = doc_repetition(
        load_table(spark, SF_ORACLE, "documents"), "doc_id", "text"
    )
    assert_matches_oracle(
        got,
        duck,
        doc_repetition_sql(
            "SELECT doc_id, text FROM documents", "doc_id", "text"
        ),
    )


# ── PII rule pins ────────────────────────────────────────────────────
def _scrub_one(spark, text: str):
    df = spark.createDataFrame([(1, text)], "id bigint, text string")
    return pii_scrub(df, "id", "text").collect()[0]


def test_pii_all_four_categories_hit_and_redact(spark):
    row = _scrub_one(
        spark,
        "mail user12@ex5.org from 10.12.3.84 ssn 123-45-6789 "
        "call (555) 210-0012 end",
    )
    assert row.clean == (
        "mail <EMAIL> from <IP> ssn <SSN> call <PHONE> end"
    )
    assert (row.n_email, row.n_ipv4, row.n_ssn, row.n_phone) == (
        1, 1, 1, 1,
    )


def test_pii_dates_versions_prices_untouched(spark):
    text = "released 2026-08-15 v1.2.3 price 1,000.00 qty 123456"
    row = _scrub_one(spark, text)
    assert row.clean == text
    assert (row.n_email, row.n_ipv4, row.n_ssn, row.n_phone) == (
        0, 0, 0, 0,
    )


def test_pii_sequential_order_prevents_double_count(spark):
    # a dotted quad's first three octets WOULD match the phone
    # pattern — the ipv4 stage must consume it first; an address's
    # digits must be gone before the phone stage runs
    row = _scrub_one(spark, "ip 192.168.101.425 and a1.2b3@d-x.io")
    assert row.n_ipv4 == 1 and row.n_phone == 0 and row.n_email == 1
    assert "192" not in row.clean


def test_pii_placeholders_are_inert(spark):
    # pre-existing placeholders (or a prior pass's output) gain
    # nothing new — scrubbing is idempotent on its own output
    first = _scrub_one(
        spark, "mail user12@ex5.org from 10.12.3.84 end"
    )
    second = _scrub_one(spark, first.clean)
    assert second.clean == first.clean
    assert (second.n_email, second.n_ipv4) == (0, 0)


def test_pii_stage_constants_shape():
    # order is load-bearing (module contract): email, ipv4, ssn,
    # phone — and every placeholder is digit-free and @-free
    assert [s[0] for s in PII_STAGES] == [
        "email", "ipv4", "ssn", "phone",
    ]
    for _, _, rep in PII_STAGES:
        assert not any(ch.isdigit() for ch in rep) and "@" not in rep


# ── repetition rule pins ─────────────────────────────────────────────
def _rep_rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id bigint, text string"
    )
    return {
        r.id: r for r in doc_repetition(df, "id", "text").collect()
    }


def test_doc_repetition_known_values(spark):
    rows = _rep_rows(spark, ["a a a b"])
    r = rows[0]
    assert r.n_tokens == 4 and r.n_distinct_tokens == 2
    assert r.dup_token_frac_q == 750000  # the three a's
    assert r.n_bigrams == 3 and r.top_bigram_n == 2  # "a a" twice
    assert r.top_bigram_frac_q == 666666
    assert r.passes is False


def test_doc_repetition_diverse_doc_passes(spark):
    # 12 distinct tokens -> 11 unique bigrams -> top frac 1/11 ppm
    text = " ".join(f"w{i}" for i in range(12))
    r = _rep_rows(spark, [text])[0]
    assert r.n_distinct_tokens == 12 and r.top_bigram_n == 1
    assert r.top_bigram_frac_q == 1_000_000 // 11
    assert r.top_bigram_frac_q <= TOP_BIGRAM_MAX_PPM
    assert r.passes is True and r.dup_token_frac_q == 0


def test_doc_repetition_degenerate_docs_fail_closed(spark):
    rows = _rep_rows(spark, ["!!! ???", "single"])
    empty, single = rows[0], rows[1]
    assert empty.n_tokens == 0 and empty.n_bigrams == 0
    assert empty.dup_token_frac_q is None
    assert empty.top_bigram_frac_q is None
    assert empty.passes is False
    assert single.n_tokens == 1 and single.n_bigrams == 0
    assert single.passes is False


# ── plan contracts: both are pure maps — zero Exchange ───────────────
def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_pii_scrub_plan_has_zero_exchange(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    plan = _plan(spark, pii_scrub(docs, "doc_id", "text"))
    assert "Exchange" not in plan


def test_doc_repetition_plan_has_zero_exchange(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    plan = _plan(spark, doc_repetition(docs, "doc_id", "text"))
    assert "Exchange" not in plan
    # and it prunes to exactly the two columns it needs
    assert "n_chars" not in plan.split("ReadSchema")[-1]


# ── C50: fused per-source quality report ─────────────────────────────
def test_quality_report_matches_oracle(spark, duck):
    from umls2rdf_spark.operators.reporting import (
        quality_report,
        quality_report_sql,
    )
    from umls2rdf_spark.plans.completion import (
        _PII_PAGES_SQL,
        _pii_pages_frame,
    )

    got = quality_report(
        _pii_pages_frame(load_table(spark, SF_ORACLE, "documents")),
        "doc_id", "text", "source",
    )
    assert_matches_oracle(
        got,
        duck,
        quality_report_sql(_PII_PAGES_SQL, "doc_id", "text", "source"),
    )


def test_quality_report_is_single_scan(spark):
    from umls2rdf_spark.operators.reporting import quality_report

    docs = load_table(spark, SF_ORACLE, "documents")
    plan = _plan(spark, quality_report(docs, "doc_id", "text", "source"))
    # the fusion claim: ONE parquet scan feeds both signal families
    # (formatted mode prints each node twice: tree + detail)
    assert plan.count("Scan parquet") == 2


def test_quality_report_agrees_with_per_doc_operators(spark):
    from umls2rdf_spark.operators.reporting import quality_report

    rows = [
        (0, "a", "x y z mail bob@ex.org"),
        (1, "a", "w w w w"),
        (2, "b", "!!!"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    rep = {
        r.source: r
        for r in quality_report(df, "doc_id", "text", "source").collect()
    }
    a, b = rep["a"], rep["b"]
    assert (a.n_docs, a.pii_docs, a.sum_pii) == (2, 1, 1)
    # doc 1 is "w w w w": top bigram "w w" 3/3 -> 1e6 ppm, fails;
    # doc 0 tokenizes to 7 tokens (the email splits to bob ex org)
    # -> 6 unique bigrams -> 166666 ppm -> passes the 0.18 gate
    assert a.bigram_docs == 2
    assert a.avg_top_bigram_ppm == (166666 + 1000000) // 2
    assert a.rep_pass_docs == 1
    # source b: no tokens at all -> no bigram docs, NULL average
    assert (b.n_docs, b.bigram_docs, b.avg_top_bigram_ppm) == (
        1, 0, None,
    )


# ── C55 per-source diversity report ─────────────────────────────────
def test_diversity_report_matches_oracle(spark, duck):
    from tests.conftest import SF_DIR_ORACLE
    from umls2rdf_spark.operators.reporting import (
        diversity_report,
        diversity_report_sql,
    )
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = diversity_report(docs, "doc_id", "text", "source")
    assert_matches_oracle(
        got,
        duck,
        diversity_report_sql(
            "SELECT * FROM documents", "doc_id", "text", "source"
        ),
    )


def test_diversity_report_flags_template_farm(spark):
    """A source whose docs are mutually identical scores a LOWER
    cross-doc TTR than one with distinct docs — the signal within-doc
    repetition (C45) cannot see (each doc alone is clean)."""
    from umls2rdf_spark.operators.reporting import diversity_report

    farm = [(i, "exactly the same template text here", "farm")
            for i in range(10)]
    varied = [(100 + i, f"unique words number{i} alpha{i} beta{i} gamma{i}", "varied")
              for i in range(10)]
    df = spark.createDataFrame(
        farm + varied, "doc_id long, text string, source string"
    )
    out = {r.source: r for r in
           diversity_report(df, "doc_id", "text", "source").collect()}
    assert out["farm"].tok_ttr_ppm < out["varied"].tok_ttr_ppm
    assert out["farm"].big_ttr_ppm < out["varied"].big_ttr_ppm
    assert out["farm"].n_docs == 10 and out["varied"].n_docs == 10


def test_diversity_report_empty_source_null_ttr(spark):
    from umls2rdf_spark.operators.reporting import diversity_report

    df = spark.createDataFrame(
        [(1, "", "empty"), (2, "one", "single")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in
           diversity_report(df, "doc_id", "text", "source").collect()}
    assert out["empty"].tok_occ == 0 and out["empty"].tok_ttr_ppm is None
    # a one-token doc has tokens but no bigrams
    assert out["single"].tok_occ == 1 and out["single"].big_ttr_ppm is None
    assert out["empty"].n_docs == 1


def test_diversity_report_null_text_engine_parity(spark, duck):
    """NULL text (common in crawl tables) must keep its 'doc' marker in
    BOTH engines: n_docs counts the doc, token/bigram counts see zero
    occurrences. Regression pin for the r6 ADVICE divergence (the Spark
    doc marker used to ride a concat() that went NULL with the token
    array, so explode() dropped the row while the SQL twin kept it)."""
    from umls2rdf_spark.operators.reporting import (
        diversity_report,
        diversity_report_sql,
    )

    df = spark.createDataFrame(
        [
            (1, None, "crawl"),
            (2, "alpha beta alpha", "crawl"),
            (3, None, "nulls_only"),
        ],
        "doc_id long, text string, source string",
    )
    got = diversity_report(df, "doc_id", "text", "source")
    out = {r.source: r for r in got.collect()}
    assert out["crawl"].n_docs == 2 and out["crawl"].tok_occ == 3
    assert out["nulls_only"].n_docs == 1 and out["nulls_only"].tok_occ == 0
    assert out["nulls_only"].tok_ttr_ppm is None
    inline = (
        "SELECT * FROM (VALUES (1, CAST(NULL AS VARCHAR), 'crawl'), "
        "(2, 'alpha beta alpha', 'crawl'), "
        "(3, CAST(NULL AS VARCHAR), 'nulls_only')) "
        "AS v(doc_id, text, source)"
    )
    assert_matches_oracle(
        got, duck, diversity_report_sql(inline, "doc_id", "text", "source")
    )
