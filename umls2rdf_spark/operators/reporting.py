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


def quality_report_partial(
    df: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
) -> DataFrame:
    """The report's MERGEABLE state: every column is an int64 SUM
    (the DIV average is deliberately absent — it finalizes on read),
    so partials from shards / micro-batches / other clusters merge
    by groupBy(domain).sum(*) exactly. This is what the streaming
    maintenance loop (streaming/reporting.py) writes per epoch.

    Output per domain: n_docs, pii_docs, sum_pii, rep_pass_docs,
    bigram_docs, sum_topbg_q.
    """
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
    return per_row.groupBy(domain_col).agg(
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
        .alias("sum_topbg_q"),
    )


def finalize_quality_report(
    partials: DataFrame, domain_col: str
) -> DataFrame:
    """Merge partial report rows (groupBy(domain).sum — exact, by
    int64 additivity) and compute the one non-additive column, the
    DIV average. finalize(partial(corpus)) == quality_report(corpus)
    row for row; finalize over UNION of shard partials equals the
    whole-corpus report (pinned by the streaming test)."""
    merged = partials.groupBy(domain_col).agg(
        *[
            F.sum(c).cast("bigint").alias(c)
            for c in (
                "n_docs", "pii_docs", "sum_pii",
                "rep_pass_docs", "bigram_docs", "sum_topbg_q",
            )
        ]
    )
    return merged.select(
        domain_col,
        "n_docs",
        "pii_docs",
        "sum_pii",
        "rep_pass_docs",
        "bigram_docs",
        F.when(
            F.col("bigram_docs") > 0,
            F.expr("sum_topbg_q DIV bigram_docs"),
        )
        .cast("bigint")
        .alias("avg_top_bigram_ppm"),
    )


def quality_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
) -> DataFrame:
    return finalize_quality_report(
        quality_report_partial(df, id_col, text_col, domain_col),
        domain_col,
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


def diversity_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
) -> DataFrame:
    """Per-source CROSS-document n-gram diversity — the dataset-card
    column :func:`quality_report` lacks and the within-doc signals
    (repetition.py, C45) cannot see: a source whose documents are
    individually clean but mutually near-identical (template farms,
    mirrored docs) shows a LOW distinct/total n-gram ratio only when
    counted across the source. Self-BLEU-style corpus diversity,
    reduced to exact type-token ratios.

    One corpus scan, one explode: unigrams, bigrams and a per-doc
    marker ride a single concatenated struct stream (kind, gram), so
    the 100 TB cost is one tokenize pass + one (source, kind, gram)
    map-side-combined groupBy + one |sources|-scale rollup. The
    (source, gram) key spreads hot sources across reducers; ratios
    are int64 ppm floor-divisions.

    Output per source: n_docs, tok_occ, tok_distinct, tok_ttr_ppm,
    big_occ, big_distinct, big_ttr_ppm (NULL ttr when a source has
    no occurrences of that kind).
    """
    # COALESCE to array(): a NULL text column must not lose the 'doc'
    # marker — without it the concat() below returns NULL, explode()
    # drops the row, and n_docs undercounts vs the SQL twin (which
    # emits the doc row unconditionally).  Crawl tables have NULL text.
    toks = (
        f"coalesce(filter(split(lower({text_col}), '[^a-z0-9]+'),"
        " t -> t <> ''), array())"
    )
    stream = (
        f"transform(array({toks}), t -> concat("
        "transform(t, x -> struct('tok' AS kind, x AS gram)), "
        "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t)-2), "
        "i -> struct('big' AS kind, concat(t[i], ' ', t[i+1]) AS gram)) "
        "ELSE array() END, "
        f"array(struct('doc' AS kind, CAST({id_col} AS STRING) AS gram))"
        "))[0]"
    )
    occ = df.select(
        F.col(source_col).alias("source"),
        F.explode(F.expr(stream)).alias("g"),
    ).select("source", F.col("g.kind").alias("kind"), F.col("g.gram").alias("gram"))
    per_gram = occ.groupBy("source", "kind", "gram").agg(
        F.count(F.lit(1)).alias("n")
    )
    rolled = per_gram.groupBy("source").agg(
        F.sum(F.when(F.col("kind") == "doc", 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs"),
        F.sum(F.when(F.col("kind") == "tok", F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("tok_occ"),
        F.sum(F.when(F.col("kind") == "tok", 1).otherwise(0))
        .cast("bigint")
        .alias("tok_distinct"),
        F.sum(F.when(F.col("kind") == "big", F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("big_occ"),
        F.sum(F.when(F.col("kind") == "big", 1).otherwise(0))
        .cast("bigint")
        .alias("big_distinct"),
    )
    return rolled.select(
        "source",
        "n_docs",
        "tok_occ",
        "tok_distinct",
        F.when(
            F.col("tok_occ") > 0,
            F.expr("tok_distinct * 1000000 div tok_occ"),
        ).alias("tok_ttr_ppm"),
        "big_occ",
        "big_distinct",
        F.when(
            F.col("big_occ") > 0,
            F.expr("big_distinct * 1000000 div big_occ"),
        ).alias("big_ttr_ppm"),
    )


def diversity_report_sql(
    table_sql: str,
    id_col: str,
    text_col: str,
    source_col: str,
) -> str:
    """DuckDB twin of :func:`diversity_report` — three UNION ALL
    occurrence streams instead of the fused struct stream (the
    oracle need not be single-scan, only value-equal)."""
    # COALESCE mirrors the Spark side: NULL text keeps its doc row and
    # contributes zero token/bigram occurrences in both engines.
    toks = (
        f"coalesce(list_filter(string_split_regex(lower({text_col}), "
        f"'[^a-z0-9]+'), t -> t <> ''), [])"
    )
    return f"""
WITH __src AS (SELECT * FROM ({table_sql}) AS __d),
__tokarr AS (
  SELECT {source_col} AS source, {id_col} AS id, {toks} AS t
  FROM __src),
__occ AS (
  SELECT source, 'tok' AS kind, u.g AS gram
  FROM __tokarr, UNNEST(t) AS u(g)
  UNION ALL
  SELECT source, 'big' AS kind, t[i] || ' ' || t[i+1] AS gram
  FROM (SELECT source, t,
               unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
        FROM __tokarr) AS __b
  UNION ALL
  SELECT source, 'doc' AS kind, CAST(id AS VARCHAR) AS gram
  FROM __tokarr),
__per AS (
  SELECT source, kind, gram, COUNT(*) AS n
  FROM __occ GROUP BY 1, 2, 3),
__roll AS (
  SELECT source,
         CAST(SUM(CASE WHEN kind = 'doc' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs,
         CAST(SUM(CASE WHEN kind = 'tok' THEN n ELSE 0 END) AS BIGINT)
           AS tok_occ,
         CAST(SUM(CASE WHEN kind = 'tok' THEN 1 ELSE 0 END) AS BIGINT)
           AS tok_distinct,
         CAST(SUM(CASE WHEN kind = 'big' THEN n ELSE 0 END) AS BIGINT)
           AS big_occ,
         CAST(SUM(CASE WHEN kind = 'big' THEN 1 ELSE 0 END) AS BIGINT)
           AS big_distinct
  FROM __per GROUP BY 1)
SELECT source, n_docs, tok_occ, tok_distinct,
       CASE WHEN tok_occ > 0
            THEN tok_distinct * 1000000 // tok_occ END AS tok_ttr_ppm,
       big_occ, big_distinct,
       CASE WHEN big_occ > 0
            THEN big_distinct * 1000000 // big_occ END AS big_ttr_ppm
FROM __roll
"""
