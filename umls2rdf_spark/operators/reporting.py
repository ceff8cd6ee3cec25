"""Per-source dataset-card statistics in ONE corpus scan: the
release-time quality report every published dataset ships (docs per
source, PII density, repetition profile) — and the demonstration
that the engine's per-document signal operators fuse: because
`pii_count_columns` (operators/pii.py) and `repetition_struct_expr`
(operators/repetition.py) are zero-shuffle Column/expr builders, the
whole report is one Project over the scan followed by one
map-side-combined groupBy(|sources| groups). Running the operators
separately would scan the corpus once per signal; fused, 100 TB is
read exactly once.

Everything is int64 (counts, ppm sums, DIV averages) — the engine's
engine-exact float discipline — so the DuckDB twin (a JOIN of the
generated PII/repetition twins, value-equal though not single-scan;
the ORACLE need not be fast, only right) matches bit-for-bit.

Output per source: n_docs, pii_docs (≥1 redaction), sum_pii (total
redactions), rep_pass_docs (Gopher top-bigram gate), bigram_docs
(docs long enough to have bigrams), avg_top_bigram_ppm (int64 DIV
over bigram_docs; NULL when a source has none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from umls2rdf_spark.operators.pii import pii_count_columns, pii_scrub_sql
from umls2rdf_spark.operators.repetition import (
    doc_repetition_sql,
    repetition_struct_expr,
)


def quality_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
) -> DataFrame:
    counts, _scrubbed = pii_count_columns(text_col)
    per_row = df.select(
        F.col(domain_col),
        F.expr(repetition_struct_expr(text_col)).alias("__r"),
        *counts,
    ).select(
        domain_col,
        (
            F.col("n_email") + F.col("n_ipv4")
            + F.col("n_ssn") + F.col("n_phone")
        ).alias("__pii"),
        F.col("__r.top_bigram_frac_q").alias("__topbg"),
        F.col("__r.passes").alias("__passes"),
    )
    agg = per_row.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("__pii") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("pii_docs"),
        F.sum("__pii").cast("bigint").alias("sum_pii"),
        F.sum(F.when(F.col("__passes"), 1).otherwise(0))
        .cast("bigint")
        .alias("rep_pass_docs"),
        F.sum(
            F.when(F.col("__topbg").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("bigram_docs"),
        F.sum(F.coalesce(F.col("__topbg"), F.lit(0)))
        .cast("bigint")
        .alias("__sum_topbg"),
    )
    return agg.select(
        domain_col,
        "n_docs",
        "pii_docs",
        "sum_pii",
        "rep_pass_docs",
        "bigram_docs",
        F.when(
            F.col("bigram_docs") > 0,
            F.expr("__sum_topbg DIV bigram_docs"),
        )
        .cast("bigint")
        .alias("avg_top_bigram_ppm"),
    )


def quality_report_sql(
    table_sql: str,
    id_col: str,
    text_expr: str,
    domain_col: str,
) -> str:
    """DuckDB twin: JOIN of the generated PII and repetition twins
    over the same source, aggregated identically (int64 // for the
    average)."""
    pii = pii_scrub_sql(table_sql, id_col, text_expr)
    rep = doc_repetition_sql(table_sql, id_col, text_expr)
    return f"""
WITH __src AS ({table_sql}),
__pii AS (
  SELECT {id_col},
         n_email + n_ipv4 + n_ssn + n_phone AS pii_total
  FROM ({pii}) AS __p),
__rep AS (
  SELECT {id_col}, top_bigram_frac_q, passes
  FROM ({rep}) AS __q),
__j AS (
  SELECT s.{domain_col} AS {domain_col}, p.pii_total,
         r.top_bigram_frac_q, r.passes
  FROM __src s
  JOIN __pii p USING ({id_col})
  JOIN __rep r USING ({id_col}))
SELECT {domain_col},
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN pii_total > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS pii_docs,
       CAST(SUM(pii_total) AS BIGINT) AS sum_pii,
       CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT)
         AS rep_pass_docs,
       CAST(SUM(CASE WHEN top_bigram_frac_q IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS bigram_docs,
       CAST(CASE WHEN SUM(CASE WHEN top_bigram_frac_q IS NOT NULL
                     THEN 1 ELSE 0 END) > 0
            THEN SUM(COALESCE(top_bigram_frac_q, 0))
                 // SUM(CASE WHEN top_bigram_frac_q IS NOT NULL
                        THEN 1 ELSE 0 END)
            END AS BIGINT) AS avg_top_bigram_ppm
FROM __j GROUP BY {domain_col}
"""
