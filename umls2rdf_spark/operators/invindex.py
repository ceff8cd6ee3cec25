"""Inverted index build + boolean retrieval: the posting-list core
of a search engine (Lucene's data structure, re-expressed
relationally) — the repo's retrieval family scores free-text
(tfidf/bm25 C21/C22) and vectors (C5/C6); this adds the third leg,
EXACT boolean matching (must / should / must-not), which is also
the filtered-retrieval primitive hybrid search runs before ranking
("only docs mentioning X and Y, never Z, ranked by how many of
these optional terms they mention").

Relational form — a posting list IS the (token, doc_id) frame:

- build: one scan, explode distinct in-row tokens (in-row
  ``array_distinct`` BEFORE the explode, so a token repeated 1000x
  in one doc ships once), groupBy token for df stats. Exactly the
  frequent_tokens/diversity shuffle shape: partitions by token,
  map-side combined.
- query: must = semi-join postings to the term set, group by doc,
  ``COUNT(*) == |must|`` (conjunction as counting — no N-way
  self-join chain, ONE shuffle regardless of term count); must_not
  = anti-join on the same frame; should = the same counting join
  kept as a rank signal. Terms are broadcast literals — the corpus
  never moves for the term side.

At 100 TB the postings frame is the corpus's distinct (token, doc)
incidence — large, but it is built ONCE (write through D11's
bucketed layout on token and every later query's semi-join plans
zero Exchange on the postings side), and each query touches only
the matched terms' partitions (predicate pushdown on token).

Reference parity: none; LLM-pipeline / search extension
(SURVEY §2 C72).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = "[^a-z0-9]+"


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_RE),
        lambda t: t != "",
    )


def build_postings(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(token, doc_id) distinct incidence — one scan, in-row
    dedup before the explode (a doc's repeated tokens never
    shuffle twice)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_tokens(text_col))).alias("token"),
    )


def postings_stats(postings: DataFrame) -> DataFrame:
    """(token, doc_freq): the per-term document frequencies — the
    index's dictionary stats (what an optimizer orders conjunctive
    term lookups by)."""
    return postings.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("doc_freq")
    )


def boolean_query(
    postings: DataFrame,
    must: list[str],
    should: list[str] | None = None,
    must_not: list[str] | None = None,
) -> DataFrame:
    """(doc_id, n_should): docs containing EVERY ``must`` term and
    NO ``must_not`` term, with the count of matched ``should``
    terms as the rank signal (0 when none match — a doc that
    satisfies the conjunction is kept either way).

    Conjunction-as-counting: postings are DISTINCT per (token,
    doc), so ``COUNT(*) == |must|`` over the must-matched postings
    is exactly "contains all" — one shuffle for any term count.
    """
    if not must:
        raise ValueError("boolean_query: need at least one must term")
    # dedupe (order-preserving): postings are DISTINCT per (token,
    # doc), so a repeated must term would make COUNT(*)==len(must)
    # silently unsatisfiable for every document
    must = list(dict.fromkeys(must))
    should = list(dict.fromkeys(should or []))
    must_not = list(dict.fromkeys(must_not or []))
    overlap = set(must) & set(must_not)
    if overlap:
        raise ValueError(
            f"boolean_query: terms both must and must_not: {overlap}"
        )
    matched = (
        postings.where(F.col("token").isin(must))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__n_must"))
        .where(F.col("__n_must") == len(must))
        .select("doc_id")
    )
    if must_not:
        matched = matched.join(
            postings.where(F.col("token").isin(must_not)).select(
                "doc_id"
            ),
            "doc_id",
            "left_anti",
        )
    if should:
        s = (
            postings.where(F.col("token").isin(should))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_should"))
        )
        return matched.join(s, "doc_id", "left").select(
            "doc_id",
            F.coalesce("n_should", F.lit(0))
            .cast("bigint")
            .alias("n_should"),
        )
    return matched.select(
        "doc_id", F.lit(0).cast("bigint").alias("n_should")
    )


def _terms_sql(terms: list[str]) -> str:
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"({quoted})"


def postings_sql(src_sql: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`build_postings`."""
    return f"""
SELECT {id_col} AS doc_id, UNNEST(list_distinct(list_filter(
         string_split_regex(lower({text_col}), '{_TOKEN_RE}'),
         x -> x <> ''))) AS token
FROM ({src_sql}) AS __docs
"""


def boolean_query_sql(
    postings_sql_str: str,
    must: list[str],
    should: list[str] | None = None,
    must_not: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`boolean_query` over a postings SELECT."""
    must = list(dict.fromkeys(must))
    should = list(dict.fromkeys(should or []))
    must_not = list(dict.fromkeys(must_not or []))
    not_clause = (
        f"""AND doc_id NOT IN (
      SELECT doc_id FROM __p WHERE token IN {_terms_sql(must_not)})"""
        if must_not
        else ""
    )
    if should:
        tail = f"""
SELECT m.doc_id,
       CAST(COALESCE(s.n_should, 0) AS BIGINT) AS n_should
FROM __must m LEFT JOIN (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_should
  FROM __p WHERE token IN {_terms_sql(should)} GROUP BY 1) s
ON m.doc_id = s.doc_id"""
    else:
        tail = (
            "\nSELECT doc_id, CAST(0 AS BIGINT) AS n_should "
            "FROM __must"
        )
    return f"""
WITH __p AS MATERIALIZED ({postings_sql_str}),
__must AS (
  SELECT doc_id FROM __p
  WHERE token IN {_terms_sql(must)}
  GROUP BY doc_id
  HAVING COUNT(*) = {len(must)} {not_clause})
{tail}
"""
