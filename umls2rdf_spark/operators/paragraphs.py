"""Cross-document paragraph deduplication — the MassiveText /
RefinedWeb "remove repeated lines/paragraphs across documents" stage
(Rae et al. 2021 §A1.2; Penedo et al. 2023): boilerplate navigation
blocks, cookie banners and licence footers repeat verbatim across a
site's pages; within-doc repetition signals (operators/repetition.py)
can't see them, and document-level dedup (C1/C2) won't fire because
the SURROUNDING text differs. The fix is paragraph-grained keep-first:
every distinct paragraph survives exactly once — at its first
occurrence in corpus order — and later copies are stripped, with the
document reassembled from its surviving paragraphs.

Spark-first shape (one corpus scan, three bounded-purpose shuffles):

1. explode paragraphs map-side with their in-doc position;
2. group by a 128-bit fingerprint (two independent ``xxhash64``
   values — the substrings.py discipline: the paragraph string never
   leaves the map side for the winner election, cutting shuffle bytes
   by the mean paragraph length) and elect the winner occurrence =
   MIN of the int64 ``doc_id · 2^POS_BITS + pos`` order key — the
   engine-exact total "corpus order";
3. semi-join paragraphs to their winner key (equi on fingerprint) and
   keep only winner occurrences;
4. reassemble per document: in-row sort of the surviving (pos, para)
   structs, ``array_join`` — no per-doc window.

The order-key packing fails closed (raise_error) if a document has
more than ``2^POS_BITS`` paragraphs, rather than silently electing a
wrong winner (the intervals.py valve discipline). False fingerprint
collisions need both 64-bit hashes to collide: < 1e-12 at 10^13
paragraphs (substrings.py's argument).

The DuckDB twin groups by the paragraph STRING itself (exact at
oracle SF) with the same order key, so a Spark/oracle match verifies
the fingerprint grouping is collision-free on the data as well as the
keep-first semantics.

Reference parity: the reference has no text-level dedup at all (its
only dedup is triple-level uniqueness, /root/reference/umls2rdf.py
AtomDictionary); this exists for the LLM-pipeline surface (SURVEY §2
C64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: paragraphs-per-document capacity of the packed order key
POS_BITS = 20


def _paragraph_occurrences(
    df: DataFrame, id_col: str, text_col: str, sep: str, min_chars: int
) -> DataFrame:
    """(id, pos, para) — map-side explode; empty/short paragraphs are
    dropped BEFORE position assignment so reassembly is stable under
    repeated application (idempotence, pinned by test)."""
    import re

    arr = F.filter(
        F.split(F.col(text_col), re.escape(sep), -1),
        lambda p: F.length(p) >= min_chars,
    )
    idx = F.when(
        F.size(arr) > (1 << POS_BITS),
        F.raise_error(
            F.lit(
                f"dedup_paragraphs: document exceeds 2^{POS_BITS} "
                "paragraphs — raise POS_BITS or pre-chunk"
            )
        ).cast("array<int>"),
    ).otherwise(F.sequence(F.lit(0), F.size(arr) - 1))
    return (
        df.select(F.col(id_col), arr.alias("__ps"), idx.alias("__ix"))
        .where(F.size("__ps") > 0)
        .select(
            id_col,
            F.explode(
                F.arrays_zip(
                    F.col("__ix").alias("pos"), F.col("__ps").alias("para")
                )
            ).alias("__z"),
        )
        .select(
            id_col,
            F.col("__z.pos").cast("bigint").alias("pos"),
            F.col("__z.para").alias("para"),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """(id, text_clean, n_paras, n_kept): keep-first cross-document
    paragraph dedup (module docstring). EVERY input document gets a
    row: docs whose every paragraph was a later duplicate (and docs
    with no qualifying paragraph at all, ``n_paras = 0``) come back
    with ``text_clean = ''`` and ``n_kept = 0`` — the caller decides
    whether empty shells are dropped (they usually are, via the
    quality gates)."""
    occ = _paragraph_occurrences(df, id_col, text_col, sep, min_chars)
    key = (
        F.col(id_col) * F.lit(1 << POS_BITS) + F.col("pos")
    ).cast("bigint")
    fp = occ.select(
        id_col,
        "pos",
        "para",
        key.alias("__ok"),
        F.xxhash64("para").alias("__h1"),
        F.xxhash64(F.lit("\x1fsalt"), F.col("para")).alias("__h2"),
    )
    winners = fp.groupBy("__h1", "__h2").agg(
        F.min("__ok").alias("__win")
    )
    kept = fp.join(winners, ["__h1", "__h2"]).where(
        F.col("__ok") == F.col("__win")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "para"))
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text_clean"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )
    cnts = occ.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__np")
    )
    totals = df.select(id_col).join(cnts, id_col, "left").select(
        id_col,
        F.coalesce(F.col("__np"), F.lit(0))
        .cast("bigint")
        .alias("n_paras"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        "n_paras",
        F.coalesce(F.col("n_kept"), F.lit(0))
        .cast("bigint")
        .alias("n_kept"),
    )


def dedup_paragraphs_sql(
    docs_sql: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
) -> str:
    """DuckDB twin — groups by the paragraph string itself (exact at
    oracle SF; a match also certifies the Spark fingerprint grouping
    collision-free on the data). ``sep`` is the literal separator
    string (same as the Spark side), rendered via chr() so control
    characters survive DuckDB's non-C-escaped string literals."""
    sep_e = " || ".join(f"chr({ord(c)})" for c in sep)
    return f"""
WITH __arr AS (
  SELECT {id_col},
         list_filter(string_split({text_col}, {sep_e}),
                     p -> length(p) >= {min_chars}) AS ps
  FROM {docs_sql}),
__occ AS MATERIALIZED (
  SELECT {id_col}, i - 1 AS pos, ps[i] AS para
  FROM (SELECT {id_col}, ps,
               unnest(generate_series(1, len(ps))) AS i
        FROM __arr WHERE len(ps) > 0)),
__win AS (
  SELECT para,
         MIN({id_col} * {1 << POS_BITS} + pos) AS win
  FROM __occ GROUP BY 1),
__kept AS (
  SELECT o.{id_col}, o.pos, o.para
  FROM __occ o JOIN __win w ON o.para = w.para
  WHERE o.{id_col} * {1 << POS_BITS} + o.pos = w.win),
__built AS (
  SELECT {id_col},
         string_agg(para, {sep_e} ORDER BY pos) AS text_clean,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM __kept GROUP BY 1),
__cnt AS (
  SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS np
  FROM __occ GROUP BY 1),
__tot AS (
  SELECT d.{id_col}, CAST(COALESCE(c.np, 0) AS BIGINT) AS n_paras
  FROM {docs_sql} d LEFT JOIN __cnt c USING ({id_col}))
SELECT t.{id_col},
       COALESCE(b.text_clean, '') AS text_clean,
       t.n_paras,
       CAST(COALESCE(b.n_kept, 0) AS BIGINT) AS n_kept
FROM __tot t LEFT JOIN __built b USING ({id_col})
"""
