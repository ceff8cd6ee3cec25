"""Driver demos for the web-curation operators (SURVEY §2 C37/C38):
FineWeb-style per-domain caps and DSIR hashed-n-gram importance
weights, each with a generated DuckDB oracle.

The ``source`` column of the documents table stands in for the URL
host: at crawl scale the curation step is "drop blocklisted hosts,
keep at most N pages per host, reweight toward a reference corpus" —
the same plan shapes apply whether the key is a host, a bucket of a
URL hash, or a data-source tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umls2rdf_spark.operators.webcurate import (
    cap_per_domain,
    cap_per_domain_sql,
    dsir_bucket_weights,
    dsir_score,
    dsir_sql,
)
from umls2rdf_spark.sources.parquet import load_table

_CAP = 5
_BLOCKLIST = ["src3", "src7"]
_DSIR_TARGET_SQL = "lang = 'en'"


def domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C37: blocklist + deterministic hash-rank cap of 5 docs per
    source. WindowGroupLimit(Partial) prunes each map task to <= cap
    rows per domain before the shuffle (pinned in
    tests/test_webcurate.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return cap_per_domain(
        docs, "doc_id", "source", cap=_CAP, blocklist=_BLOCKLIST
    )


DOMAIN_CAP_SQL = cap_per_domain_sql(
    "doc_id", "source", "documents", cap=_CAP, blocklist=_BLOCKLIST
)


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C38: DSIR importance weights — train 256 hashed-unigram bucket
    log-ratios (target = lang='en' slice vs the raw corpus) in one
    conditional-agg pass, score every document through the broadcast
    bucket dim. Model state is 256 rows at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    wts = dsir_bucket_weights(docs, "text", F.col("lang") == "en")
    return dsir_score(docs, wts, "doc_id", "text")


DSIR_SQL = dsir_sql("doc_id", "text", _DSIR_TARGET_SQL, "documents")


QUERIES = {
    "domain_cap": domain_cap,
    "dsir_weights": dsir_weights,
}

ORACLES = {
    "domain_cap": DOMAIN_CAP_SQL,
    "dsir_weights": DSIR_SQL,
}
