"""Content-defined chunking (CDC) and chunk-level deduplication —
the storage-style dedup family (LBFS/Venti fixed-fingerprint
chunking; FastCDC's evaluation frames the design space): cut each
document into variable-size chunks whose boundaries depend only on
LOCAL window content, so an insertion or deletion shifts at most the
chunks it touches — unlike fixed-size blocks, where one inserted
byte re-aligns (and un-dedups) everything downstream. Shared
boilerplate, quoted passages and mirrored fragments then dedup at
chunk grain even when document-level (C1) and paragraph-level (C64)
dedup both miss (the repeat does not line up with a paragraph
boundary and the documents differ elsewhere).

Boundary rule (the fixed-window fingerprint variant): position ``i``
(1-based, ``2 <= i <= len - W + 1``) starts a new chunk iff
``stable_hash40(substr(text, i, W)) % D == 0`` — a pure per-position
predicate over the W-char window, so the whole boundary set is one
zero-shuffle higher-order-function expression (sequence → filter),
no sequential scan, no UDF. Expected chunk length is ~D chars.
Rolling-hash CDC (Rabin/Gear) adds a min/max-size clamp whose
suppression rule is sequential (each boundary depends on the
previous accepted one); this variant trades that clamp away for a
fully data-parallel, engine-neutral rule — the same md5-prefix hash
(functions/hashing.py) evaluates bit-identically in Spark and the
DuckDB twin, so chunk boundaries (not just chunk counts) are
value-verified across engines.

Dedup is keep-first over chunk content, the paragraphs.py
discipline: occurrences carry the packed int64 corpus-order key
``id * 2^POS_BITS + pos`` (fail-closed valve on overflow), winners
are elected with one map-side-combined MIN per 128-bit content
fingerprint (two independent xxhash64 values — the chunk string
never ships to the winner shuffle), and the DuckDB twin groups by
the chunk STRING itself, so a driver match also certifies the
fingerprint grouping collision-free on the data.

At 100 TB: the boundary/filter stage is embarrassingly parallel
(per-row expressions inside WholeStageCodegen); the only shuffles
are the winner groupBy (keys are 16-byte fingerprints + one int64,
~32 B/chunk regardless of chunk text) and the per-doc stat groupBy.
Skewed hot chunks (a site-wide footer) produce hot fingerprint keys
whose MIN aggregation is map-side combined — the reduce side sees
one partial per task, not one row per occurrence.

Reference parity: the reference has no text-level dedup (its only
dedup is triple uniqueness, /root/reference/umls2rdf.py
AtomDictionary); this is LLM-pipeline surface (SURVEY §2 C66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import (
    HASH_HEX_CHARS,
    stable_hash40,
)

#: chunks-per-document capacity of the packed corpus-order key —
#: 2^20 chunks × ~DIVISOR chars ≈ a 16 MB document at the defaults;
#: bigger blobs should be pre-split (the valve raises, fail-closed)
POS_BITS = 20

#: boundary window width (chars) — the content a cut decision sees
DEFAULT_WINDOW = 12

#: boundary divisor — expected chunk length in chars
DEFAULT_DIVISOR = 16


def _chunks_expr(chars_col, n, window: int, divisor: int):
    """array<string> of CDC chunks from a MATERIALIZED char-array
    column — a single zero-shuffle expression tree (sequence →
    filter → zip_with).

    Why a char array and ``slice`` instead of ``substr`` on the
    string: Spark's ``UTF8String.substring`` walks bytes from
    position 0 on every call (multi-byte safety), so per-position
    windows over an L-char document cost O(L²/D) — a 1 MB document
    took HOURS (caught when the valve test wedged the suite; two
    executor threads sat in UTF8String.substring for 2 h). Array
    ``slice`` on a bound attribute is O(window) element reads, so
    the whole boundary set is O(L·W). The char array must be a real
    COLUMN (not an inline split() in the lambda): higher-order-
    function lambda bodies evaluate per element, and an inline split
    would re-tokenize the document once per candidate position."""
    win = lambda i: F.array_join(F.slice(chars_col, i, window), "")
    cuts = F.when(
        n >= window + 1,
        F.filter(
            F.sequence(F.lit(2), n - window + 1),
            lambda i: stable_hash40(win(i)) % divisor == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.concat(F.array(F.lit(1)), cuts)
    nexts = F.concat(cuts, F.array(n + 1))
    chunks = F.zip_with(
        starts,
        nexts,
        lambda s, e: F.array_join(F.slice(chars_col, s, e - s), ""),
    )
    # the only zero-length chunk possible is the whole-doc chunk of
    # an EMPTY text (cut candidates all have e > s by construction)
    return F.filter(chunks, lambda c: F.length(c) >= 1)


def cdc_chunk_occurrences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = DEFAULT_WINDOW,
    divisor: int = DEFAULT_DIVISOR,
) -> DataFrame:
    """(id, pos, chunk) — every CDC chunk of every document with its
    0-based in-doc position. Chunks concatenated in pos order
    reconstruct the text exactly (pinned by test): boundaries
    partition the character range, nothing is dropped or overlapped.
    Empty texts produce no rows."""
    base = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("__n"),
        F.split(F.col(text_col), "", -1).alias("__ch"),
    )
    arr = _chunks_expr(F.col("__ch"), F.col("__n"), window, divisor)
    return (
        base.select(F.col(id_col), arr.alias("__cs"))
        .where(F.size("__cs") > 0)
        .select(
            id_col,
            F.posexplode("__cs").alias("pos", "chunk"),
        )
        .select(
            id_col, F.col("pos").cast("bigint").alias("pos"), "chunk"
        )
    )


def fingerprinted_occurrences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = DEFAULT_WINDOW,
    divisor: int = DEFAULT_DIVISOR,
    pos_bits: int = POS_BITS,
) -> DataFrame:
    """(id, chunk, __ok, __h1, __h2): chunk occurrences with the
    packed corpus-order key (fail-closed ``pos_bits`` valve —
    parameterized so the valve is testable on a small document; the
    production default stays 2^20) and the 128-bit content
    fingerprint — the shared input of the batch stats
    (:func:`cdc_dedup_stats`) and the continuous chunk-store intake
    (streaming/cdc.py)."""
    occ = cdc_chunk_occurrences(df, id_col, text_col, window, divisor)
    cap = 1 << pos_bits
    ok = F.when(
        F.col("pos") >= cap,
        F.raise_error(
            F.lit(
                f"cdc_dedup_stats: document exceeds 2^{pos_bits} "
                "chunks — raise pos_bits or pre-split"
            )
        ).cast("bigint"),
    ).otherwise(F.col(id_col) * F.lit(cap) + F.col("pos"))
    return occ.select(
        id_col,
        "chunk",
        ok.alias("__ok"),
        F.xxhash64("chunk").alias("__h1"),
        F.xxhash64(F.lit("\x1fcdc"), F.col("chunk")).alias("__h2"),
    )


def cdc_dedup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = DEFAULT_WINDOW,
    divisor: int = DEFAULT_DIVISOR,
    pos_bits: int = POS_BITS,
) -> DataFrame:
    """(id, n_chunks, n_dup, dup_chars): keep-first chunk-level dedup
    accounting per document — ``n_dup`` of its chunks already
    occurred earlier in corpus order (anywhere in the corpus,
    including earlier in the same document), and ``dup_chars`` is the
    storage those chunks would share under content-addressed
    storage. EVERY input document gets a row (zeros for empty
    texts) — the caller gates on ``dup_chars / n_chars`` to drop
    mirror-heavy documents, or feeds the chunk store directly."""
    fp = fingerprinted_occurrences(
        df, id_col, text_col, window, divisor, pos_bits
    )
    winners = fp.groupBy("__h1", "__h2").agg(
        F.min("__ok").alias("__win")
    )
    dup = F.col("__ok") != F.col("__win")
    stats = (
        fp.join(winners, ["__h1", "__h2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(dup.cast("bigint")).cast("bigint").alias("n_dup"),
            F.sum(
                F.when(dup, F.length("chunk")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("dup_chars"),
        )
    )
    return df.select(id_col).join(stats, id_col, "left").select(
        id_col,
        F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias(
            "n_chunks"
        ),
        F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup"),
        F.coalesce("dup_chars", F.lit(0))
        .cast("bigint")
        .alias("dup_chars"),
    )


def _chunks_sql(text_expr: str, window: int, divisor: int) -> str:
    """DuckDB twin of :func:`_chunks_expr` — same hash, same
    boundary rule, chunk extraction via list functions."""
    h = (
        f"CAST(('0x' || substr(md5(substr({text_expr}, CAST(i AS INT),"
        f" {window})), 1, {HASH_HEX_CHARS})) AS BIGINT)"
    )
    cuts = (
        f"list_filter(range(2, greatest(length({text_expr})"
        f" - {window} + 2, 2)), i -> {h} % {divisor} = 0)"
    )
    return (
        "list_filter(list_transform("
        f"range(1, len({cuts}) + 2), "
        f"j -> substr({text_expr}, "
        f"CAST(list_prepend(CAST(1 AS BIGINT), {cuts})[j] AS INT), "
        f"CAST(list_append({cuts}, CAST(length({text_expr}) + 1 AS"
        f" BIGINT))[j] "
        f"- list_prepend(CAST(1 AS BIGINT), {cuts})[j] AS INT))), "
        "c -> length(c) >= 1)"
    )


def cdc_dedup_stats_sql(
    docs_sql: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
    divisor: int = DEFAULT_DIVISOR,
    pos_bits: int = POS_BITS,
) -> str:
    """DuckDB twin of :func:`cdc_dedup_stats` — winner election
    groups by the chunk STRING (exact at oracle SF), so a match also
    certifies the Spark 128-bit fingerprint grouping collision-free
    on the data. ``pos_bits`` must match the Spark side so the
    packed order keys agree; the fail-closed over-cap RAISE has no
    SQL twin (an over-cap input makes the Spark side error, which a
    parity harness reports as a mismatch — never a silent wrong
    value)."""
    chunks = _chunks_sql(text_col, window, divisor)
    cap = 1 << pos_bits
    return f"""
WITH __arr AS (
  SELECT {id_col}, {chunks} AS cs FROM {docs_sql}),
__occ AS MATERIALIZED (
  SELECT {id_col}, i - 1 AS pos, cs[i] AS chunk
  FROM (SELECT {id_col}, cs,
               unnest(generate_series(1, len(cs))) AS i
        FROM __arr WHERE len(cs) > 0)),
__win AS (
  SELECT chunk, MIN({id_col} * {cap} + pos) AS win
  FROM __occ GROUP BY 1),
__stat AS (
  SELECT o.{id_col},
         CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN o.{id_col} * {cap} + o.pos <> w.win
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         CAST(SUM(CASE WHEN o.{id_col} * {cap} + o.pos <> w.win
                       THEN length(o.chunk) ELSE 0 END) AS BIGINT)
           AS dup_chars
  FROM __occ o JOIN __win w ON o.chunk = w.chunk
  GROUP BY 1)
SELECT d.{id_col},
       CAST(COALESCE(s.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(COALESCE(s.n_dup, 0) AS BIGINT) AS n_dup,
       CAST(COALESCE(s.dup_chars, 0) AS BIGINT) AS dup_chars
FROM {docs_sql} d LEFT JOIN __stat s USING ({id_col})
"""
