"""Exact repeated-substring detection and removal — the
suffix-array-style dedup step ("Deduplicating Training Data Makes
Language Models Better": drop any substring that occurs twice
anywhere in the corpus, including within one document).

Spark-first shape instead of a suffix array: every overlapping
``min_len``-token window (hop 1) is emitted map-side and grouped by a
**128-bit fingerprint** (two independent ``xxhash64`` values of the
window string, one plain and one salt-prefixed). The |tokens|-row
fingerprint shuffle IS the distributed substitute for suffix sorting:
it partitions by window content, so each reducer sees all occurrences
of a window regardless of where they live — the same all-to-all a
distributed suffix sort needs, expressed as one map-side-combined
aggregation over 16-byte keys. The raw L-token window string never
leaves the map side: at min_len=50 that cuts the shuffled bytes by
~two orders of magnitude vs grouping on the string itself (each
corpus token appears in up to L windows, so a string-keyed shuffle
moves ~L× the corpus through the wire). A false positive needs BOTH
64-bit hashes of two distinct windows to collide — probability
~N²/2⁻¹²⁸ for N windows, < 1e-12 even at 10¹³ windows (100 TB), so
the result is exact for every physically realizable corpus.
Repeated positions then merge into maximal spans with the sessionize
window pattern (lag + cumulative break flags) — per-document, no
driver logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _windows(df: DataFrame, id_col: str, text_col: str, L: int) -> DataFrame:
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    with_t = df.select(F.col(id_col), toks.alias("__t"))
    starts = F.when(
        F.size("__t") >= L, F.sequence(F.lit(0), F.size("__t") - L)
    ).otherwise(F.array())
    return with_t.select(
        F.col(id_col),
        F.explode(starts).alias("pos"),
        F.col("__t"),
    ).select(
        F.col(id_col),
        "pos",
        F.concat_ws(" ", F.slice(F.col("__t"), F.col("pos") + 1, L)).alias(
            "win"
        ),
    )


def repeated_substring_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 50,
    persist: bool = True,
) -> DataFrame:
    """Maximal token spans covered by some ``min_len``-token window
    that occurs MORE than once corpus-wide (across documents or
    within one).

    Output: (id, span_start, span_end) — half-open token offsets,
    non-overlapping, only for documents that contain repeats.
    Overlapping/touching repeated windows merge: a position starts a
    new span only when it clears the previous window's end
    (pos > prev_pos + min_len).

    Scale shape: the window string is fingerprinted map-side into two
    independent xxhash64 values; BOTH the count aggregation and the
    position semi-join key on the 16-byte fingerprint, so neither
    shuffle carries the L-token string. The repeated-fingerprint set
    is count>1 groups — tiny in a mostly-unique corpus — and the
    semi-join is left to AQE, which broadcasts it from observed size
    (no hard hint: an adversarial fully-repeated corpus would OOM a
    forced broadcast). ``persist`` caches the narrow (id, pos, h1,
    h2) frame (~32 B/row, MEMORY_AND_DISK) so the tokenize + explode
    + hash pass runs once instead of twice; pass ``persist=False`` to
    keep the plan fully lazy (double scan, zero cache pressure).
    """
    if min_len <= 0:
        raise ValueError("min_len must be positive")
    wins = _windows(df, id_col, text_col, min_len)
    hashed = wins.select(
        F.col(id_col),
        "pos",
        F.xxhash64("win").alias("__h1"),
        # Salt-prefixed second hash: a false positive needs both
        # 64-bit values of two DISTINCT windows to collide (~2^-128).
        F.xxhash64(F.lit("substr-salt"), F.col("win")).alias("__h2"),
    )
    if persist:
        from pyspark import StorageLevel

        hashed = hashed.persist(StorageLevel.MEMORY_AND_DISK)
    repeated_wins = (
        hashed.select("__h1", "__h2")
        .groupBy("__h1", "__h2")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .select("__h1", "__h2")
    )
    rep = hashed.join(
        repeated_wins, ["__h1", "__h2"], "left_semi"
    ).select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") > F.lag("pos").over(w) + min_len, 1
    ).otherwise(F.lit(0))
    spans = rep.withColumn(
        "__span",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        spans.groupBy(id_col, "__span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + min_len).alias("span_end"),
        )
        .drop("__span")
    )


def remove_repeated_substrings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 50,
    persist: bool = True,
) -> DataFrame:
    """Cut every repeated span out of every document; survivors keep
    their relative order. Documents without repeats pass through
    unchanged (left join against the span table).

    The cut itself is map-side: spans collect to a per-document array
    (bounded by doc length / min_len), and token filtering is a
    higher-order filter over (token, index) — no per-row Python, no
    extra shuffle beyond the span computation.

    Output: (id, clean_text, n_removed_tokens).
    """
    spans = repeated_substring_spans(
        df, id_col, text_col, min_len, persist=persist
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    joined = df.join(per_doc, id_col, "left_outer").select(
        F.col(id_col), toks.alias("__t"), F.col("__spans")
    )
    indexed = F.transform(
        F.col("__t"), lambda x, i: F.struct(x.alias("tok"), i.alias("idx"))
    )
    kept = F.filter(
        indexed,
        lambda s: F.col("__spans").isNull()
        | ~F.exists(
            F.col("__spans"),
            lambda sp: (s["idx"] >= sp["span_start"])
            & (s["idx"] < sp["span_end"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(
            F.transform(kept, lambda s: s["tok"]), " "
        ).alias("clean_text"),
        (F.size("__t") - F.size(kept)).cast("bigint").alias(
            "n_removed_tokens"
        ),
    )
