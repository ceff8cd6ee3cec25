"""HTML → text extraction: the step every web-crawl training
pipeline runs FIRST (C4, RefinedWeb, FineWeb all begin from crawled
HTML), previously absent from the engine's corpus-prep block.

Whole pipeline is a chain of ``regexp_replace`` / literal
``replace`` Column expressions — JVM-side, whole-stage-codegen, no
UDF — so it runs at scan speed and composes with the downstream
quality/dedup operators on the same pass over the data. The DuckDB
twin is generated from the SAME pattern constants
(:func:`html_to_text_sql`), so extraction is value-verified
end-to-end, not spot-checked.

Dialect parity, stated precisely: every pattern below is valid and
equivalent in Java regex (Spark) and RE2 (DuckDB) — ``(?is)`` inline
flags, lazy ``.*?``, ``\\s`` classes all behave identically; DuckDB
needs the explicit ``'g'`` flag to match Spark's global-replace
default, which the SQL builder supplies. Entity decoding is literal
``replace`` (no regex), ``&amp;`` LAST so double-escaped entities
(``&amp;lt;``) decode to the literal entity text, not to ``<`` —
the HTML5-correct order.

Semantics (the documented, oracle-replicated contract):

1. ``<script>…</script>``, ``<style>…</style>`` blocks,
   ``<!-- comments -->`` and the entire ``<head>`` are removed WITH
   their contents (non-greedy, case-insensitive,
   dot-matches-newline);
2. block-closing tags and ``<br>`` become a space (word boundary
   preserved across block structure);
3. every remaining tag is stripped;
4. the five core entities + ``&nbsp;`` are decoded
   (``&amp;`` last); unknown entities pass through literally;
5. whitespace runs collapse to one space, ends trimmed.

100 TB: stateless per-row map — no shuffle, no state, perfectly
partition-parallel; the natural fusion point is directly over the
WARC/JSONL scan before anything wide. ``html_stats`` is the
pre-strip audit (link/script counts, visible-text ratio) pipelines
use to gate boilerplate-heavy pages before paying for downstream
scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (pattern, replacement) regexp stages, applied in order. Valid and
#: equivalent in Java regex AND RE2 — see module docstring.
HTML_REGEX_STAGES: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", ""),
    (r"(?is)<style[^>]*>.*?</style>", ""),
    (r"(?s)<!--.*?-->", ""),
    # the whole <head> is non-content (title/meta/link) — dropped
    # like C4's extractor, AFTER script/style so its contents can't
    # hide an unclosed tag from the block regexes
    (r"(?is)<head[^>]*>.*?</head>", ""),
    (
        r"(?i)</(?:p|div|h[1-6]|li|tr|table|ul|ol|blockquote"
        r"|nav|header|footer|section|article)>|<br[^>]*>",
        " ",
    ),
    (r"<[^>]*>", ""),
)

#: literal entity decodes, applied in order AFTER tag stripping;
#: ``&amp;`` must stay last (HTML5 double-escape correctness).
HTML_ENTITY_STAGES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

_WS_RUN = r"\s+"
_LINK_PAT = r"(?i)<a[\s>]"
_TAG_PAT = r"<[^>]*>"


def html_text_expr(col: F.Column) -> F.Column:
    """The full extraction as one Column expression (fusable into
    any select over the raw-HTML scan)."""
    out = col
    for pat, rep in HTML_REGEX_STAGES:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in HTML_ENTITY_STAGES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, _WS_RUN, " "))


def html_to_text(
    df: DataFrame, html_col: str, out_col: str = "text"
) -> DataFrame:
    """Append ``out_col`` holding the extracted visible text."""
    return df.withColumn(out_col, html_text_expr(F.col(html_col)))


def html_stats(
    df: DataFrame,
    id_col: str,
    html_col: str,
    text_col: str | None = None,
) -> DataFrame:
    """Pre-strip page audit: (id, n_links, n_tags, html_chars,
    text_chars, visible_ratio_q) — ``visible_ratio_q`` is the
    visible-text fraction quantized to int64 ppm (the engine's
    engine-exact float discipline). Pages with low visible ratio or
    extreme link density are the classic boilerplate/link-farm gate
    (RefinedWeb §3.1) — all computed in the same codegen stage as
    the extraction itself. Pass ``text_col`` to also emit the
    extracted text in the same single-scan select (audit +
    extraction fused)."""
    h = F.col(html_col)
    text = html_text_expr(h)
    return df.select(
        F.col(id_col),
        *([text.alias(text_col)] if text_col else []),
        F.regexp_count(h, F.lit(_LINK_PAT)).cast("bigint").alias("n_links"),
        F.regexp_count(h, F.lit(_TAG_PAT)).cast("bigint").alias("n_tags"),
        F.length(h).cast("bigint").alias("html_chars"),
        F.length(text).cast("bigint").alias("text_chars"),
        F.when(
            F.length(h) > 0,
            F.floor(
                F.length(text).cast("bigint")
                * F.lit(1_000_000)
                / F.length(h).cast("bigint")
            ),
        ).cast("bigint").alias("visible_ratio_q"),
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def html_text_expr_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_text_expr`, generated from the
    same stage constants (``'g'`` flag supplies Spark's
    global-replace default)."""
    out = expr
    for pat, rep in HTML_REGEX_STAGES:
        out = (
            f"regexp_replace({out}, {_sql_quote(pat)}, "
            f"{_sql_quote(rep)}, 'g')"
        )
    for ent, ch in HTML_ENTITY_STAGES:
        out = f"replace({out}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    return (
        f"trim(regexp_replace({out}, {_sql_quote(_WS_RUN)}, ' ', 'g'))"
    )


def html_stats_sql(
    table_sql: str,
    id_col: str,
    html_expr: str,
    text_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`html_stats` over ``table_sql``."""
    text = html_text_expr_sql(html_expr)
    text_sel = f"{text} AS {text_col}," if text_col else ""
    return f"""
SELECT {id_col},
       {text_sel}
       CAST(len(regexp_extract_all({html_expr},
            {_sql_quote(_LINK_PAT)})) AS BIGINT) AS n_links,
       CAST(len(regexp_extract_all({html_expr},
            {_sql_quote(_TAG_PAT)})) AS BIGINT) AS n_tags,
       CAST(length({html_expr}) AS BIGINT) AS html_chars,
       CAST(length({text}) AS BIGINT) AS text_chars,
       CAST(CASE WHEN length({html_expr}) > 0
            THEN FLOOR(length({text}) * 1000000.0
                 / length({html_expr})) END AS BIGINT)
         AS visible_ratio_q
FROM ({table_sql}) AS __pages
"""
