"""Within-document repetition signals (Gopher §A1, Rae et al. 2021):
the fraction of a document occupied by its most-repeated n-gram, and
how much of it is repeated tokens at all — the standard gate against
keyword-stuffed / template / spun pages that per-CORPUS dedup and the
composite quality gate (textstats.gopher_quality) don't see, because
the repetition is inside one row.

Relation to ``textstats.repetition_ratio`` (C16): that emits the
single duplicate-n-gram RATIO (distinct vs total via
``array_distinct``); this operator needs per-group SIZES (which
n-gram dominates, how many tokens sit in repeated groups) that
``array_distinct`` cannot expose — hence the sorted-run-length
construction below, same zero-shuffle class, strictly more signal.

Spark-first shape — and the reason this module exists as its own
operator: within-doc statistics need NO shuffle. Instead of the
explode → groupBy(doc, ngram) → window chain (which ships every
n-gram occurrence through a shuffle keyed on doc_id), each document
sorts ITS OWN n-gram array in-row (``array_sort``) and reads group
sizes off the sorted array as run lengths: change-point indices →
boundary diffs → runs. Everything is built-in higher-order functions
(``transform`` / ``filter`` / ``aggregate``) over bound lambda
variables, so the whole operator compiles to ONE Project over the
scan — per-row cost O(L log L), cluster cost embarrassingly parallel,
zero Exchange at any scale (plan-pinned by tests).

The DuckDB twin (:func:`doc_repetition_sql`) is generated from the
same tokenizer constant and the same run-length construction
(1-based ``list_*`` forms of the 0-based Spark exprs), so every
per-document value is verified, not spot-checked.

Output per document:
- ``n_tokens``, ``n_distinct_tokens``;
- ``dup_token_frac_q`` — fraction of tokens belonging to a token
  that occurs ≥ 2× in the doc (int64 ppm; NULL when no tokens);
- ``n_bigrams``, ``top_bigram_n``;
- ``top_bigram_frac_q`` — share of the most frequent bigram among
  all bigram occurrences (int64 ppm; NULL when < 2 tokens);
- ``passes`` — token-count adaptation of Gopher's "fraction of
  characters in the most common 2-gram ≤ 0.18" rule (documented
  variant: occurrence count, not characters). Documents too short to
  have a bigram fail closed. ``dup_token_frac_q`` is reported, not
  gated — natural text repeats stopwords heavily, so it is a
  downstream-tunable signal, not a fixed rule.

All fractions are floor-divided in int64 (ppm), never floats — the
engine's engine-exact discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: shared tokenizer (textstats.py's corpus tokenizer): lowercase,
#: split on non-alphanumeric runs, drop empties.
TOKEN_SPLIT = "[^a-z0-9]+"

#: Gopher top-2-gram threshold, ppm (≤ 0.18 passes).
TOP_BIGRAM_MAX_PPM = 180_000


def _runs_expr(v: str) -> str:
    """Run lengths of equal adjacent elements in the SORTED bound
    array variable ``v`` (0-based Spark SQL): change-point indices →
    [0, changes…, n] boundaries → adjacent diffs. Empty array yields
    [0] (filtered out by consumers via ``r > 0``)."""
    bounds = (
        f"concat(array(0), CASE WHEN size({v}) >= 2 THEN "
        f"filter(sequence(1, size({v}) - 1), i -> {v}[i] != {v}[i-1]) "
        f"ELSE array() END, array(size({v})))"
    )
    return (
        f"transform(array({bounds}), b -> "
        f"transform(sequence(0, size(b) - 2), j -> b[j+1] - b[j]))[0]"
    )


def repetition_struct_expr(text_col: str) -> str:
    """Public expr-level form (returns the SQL expression string for
    the full signal struct) so single-scan selects elsewhere
    (operators/reporting.py) can fuse the repetition pass with their
    own columns."""
    return _struct_expr(text_col)


def _struct_expr(text_col: str) -> str:
    toks = (
        f"filter(split(lower({text_col}), '{TOKEN_SPLIT}'), "
        "x -> x <> '')"
    )
    bigrams = (
        "CASE WHEN size(t) >= 2 THEN "
        "array_sort(transform(sequence(0, size(t) - 2), "
        "i -> concat(t[i], ' ', t[i+1]))) ELSE array() END"
    )
    return f"""
transform(array({toks}), t ->
 transform(array(array_sort(t)), u ->
  transform(array({bigrams}), s ->
   transform(array({_runs_expr('u')}), ru ->
    transform(array({_runs_expr('s')}), rs ->
     struct(
       CAST(size(t) AS BIGINT) AS n_tokens,
       CAST(size(filter(ru, r -> r > 0)) AS BIGINT)
         AS n_distinct_tokens,
       CASE WHEN size(t) > 0 THEN
         CAST(aggregate(ru, 0,
              (a, x) -> a + CASE WHEN x >= 2 THEN x ELSE 0 END)
              AS BIGINT) * 1000000 DIV CAST(size(t) AS BIGINT)
       END AS dup_token_frac_q,
       CAST(size(s) AS BIGINT) AS n_bigrams,
       CAST(array_max(rs) AS BIGINT) AS top_bigram_n,
       CASE WHEN size(s) > 0 THEN
         CAST(array_max(rs) AS BIGINT) * 1000000
           DIV CAST(size(s) AS BIGINT)
       END AS top_bigram_frac_q,
       CASE WHEN size(s) > 0 THEN
         CAST(array_max(rs) AS BIGINT) * 1000000
           DIV CAST(size(s) AS BIGINT) <= {TOP_BIGRAM_MAX_PPM}
       ELSE false END AS passes
     ))[0])[0])[0])[0])[0]
"""


def doc_repetition(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document repetition signals in one zero-shuffle Project —
    see the module docstring for the column contract."""
    return df.select(
        F.col(id_col), F.expr(_struct_expr(text_col)).alias("__r")
    ).select(id_col, "__r.*")


def doc_repetition_sql(
    table_sql: str, id_col: str, text_expr: str
) -> str:
    """DuckDB twin: the same tokenizer, the same run-length
    construction in 1-based ``list_*`` form, the same int64 ppm
    floor-divisions."""

    def runs(v: str) -> str:
        bounds = (
            f"([0] || list_transform(list_filter("
            f"generate_series(2, len({v})), i -> {v}[i] <> {v}[i-1]), "
            f"i -> i - 1) || [len({v})])"
        )
        return (
            f"list_transform(generate_series(1, len({bounds}) - 1), "
            f"j -> ({bounds})[j+1] - ({bounds})[j])"
        )

    return f"""
WITH __tok AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_expr}),
                     '{TOKEN_SPLIT}'), x -> x <> '') AS t
  FROM ({table_sql}) AS __rep_src
), __arr AS (
  SELECT {id_col}, t, list_sort(t) AS u,
         list_sort(CASE WHEN len(t) >= 2 THEN
             list_transform(generate_series(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i+1])
           ELSE [] END) AS s
  FROM __tok
), __runs AS (
  SELECT {id_col}, t, s, {runs('u')} AS ru, {runs('s')} AS rs
  FROM __arr
)
SELECT {id_col},
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(ru, r -> r > 0)) AS BIGINT)
         AS n_distinct_tokens,
       CASE WHEN len(t) > 0 THEN
         CAST(list_sum(list_transform(ru,
              x -> CASE WHEN x >= 2 THEN x ELSE 0 END)) AS BIGINT)
           * 1000000 // CAST(len(t) AS BIGINT)
       END AS dup_token_frac_q,
       CAST(len(s) AS BIGINT) AS n_bigrams,
       CAST(list_max(rs) AS BIGINT) AS top_bigram_n,
       CASE WHEN len(s) > 0 THEN
         CAST(list_max(rs) AS BIGINT) * 1000000
           // CAST(len(s) AS BIGINT)
       END AS top_bigram_frac_q,
       CASE WHEN len(s) > 0 THEN
         CAST(list_max(rs) AS BIGINT) * 1000000
           // CAST(len(s) AS BIGINT) <= {TOP_BIGRAM_MAX_PPM}
       ELSE false END AS passes
FROM __runs
"""
