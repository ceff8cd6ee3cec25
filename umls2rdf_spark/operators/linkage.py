"""Blocked record linkage (entity resolution): find pairs of records
that describe the SAME entity despite textual noise — the structured-
data sibling of the text near-dup family (C2 MinHash = long
documents; this = short entity strings like names/titles/addresses,
where edit distance is the right signal and shingle sketches are
too coarse).

The classic two-phase shape (Fellegi & Sunter framing, Hernández
sorted-neighborhood lineage):

1. **Blocking** — candidate pairs form ONLY inside blocks sharing a
   cheap key; multiple PASSES with different keys (first token;
   length-bucketed last token here) catch pairs a single key splits,
   and the union of passes is deduped on the pair id. This is the
   LSH-banding argument exactly: never all-pairs, recall from pass
   diversity rather than pair volume.
2. **Pairwise scoring** — exact Levenshtein edit distance (built-in
   JVM `levenshtein` == DuckDB `levenshtein`, both textbook
   Wagner-Fischer) plus token-overlap Jaccard in exact ppm
   (int64 — the dedup.py convention); a pair matches when
   ``edit <= max_edit``.

At 100 TB: pair volume is Σ over blocks of |block|², so the skew
valve FAILS CLOSED — any block larger than ``max_block`` raises
IN-PLAN (the checked block-size column rides the candidate join
and kills the job at the block's first emitted pair — no eager
plan-build collect) instead of quadratically exploding; the fix (a
finer key, a third pass) is a modelling decision the operator must
not silently make. Scoring
touches only candidate pairs; the record strings ship to exactly
the pairs that need them (join on id after candidate generation,
the substrings.py discipline is not needed at entity-string sizes
but ids still keep the block shuffle narrow).

Reference parity: none (the reference links by exact CUI keys);
LLM-pipeline / data-cleaning extension (SURVEY §2 C73).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PPM = 1_000_000


def _norm(col):
    """Casefold + whitespace-collapse — the cheap canonicalization
    both blocking and scoring read (linkage must not depend on
    spacing noise)."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def _block_keys(nm_col: str):
    """The two blocking passes over the already-normalized name:
    (first token) and (last token, length div 4) — different
    failure modes: a typo in the first word still blocks on the
    last, and vice versa."""
    toks = F.split(F.col(nm_col), " ")
    return [
        F.concat(F.lit("f:"), toks.getItem(0)),
        F.concat(
            F.lit("l:"),
            F.element_at(toks, -1),
            F.lit(":"),
            F.expr(f"length({nm_col}) div 4").cast("string"),
        ),
    ]


def link_records(
    records: DataFrame,
    id_col: str,
    name_col: str,
    max_edit: int = 2,
    max_block: int = 10_000,
    cache=None,
) -> DataFrame:
    """Self-linkage: (id_a, id_b, edit, jaccard_ppm) for every
    record pair (id_a < id_b) sharing a block key whose normalized
    names are within ``max_edit`` Levenshtein. ``jaccard_ppm`` is
    the exact token-set Jaccard in ppm, the secondary confidence
    signal (1.0 for reordered-token exact matches that edit
    distance scores badly).

    Scoring runs on DISTINCT NAME PAIRS, not record pairs: every
    decision this operator makes — block membership, edit distance,
    token Jaccard — is a pure function of the normalized name, so
    candidate generation and the Levenshtein/Jaccard work collapse
    to the distinct-name domain and the (id_a, id_b) rows are
    reconstituted afterwards by joining the per-name id lists back
    in (two broadcast joins, each emitted pair produced exactly
    once — no record-pair distinct). Entity data repeats names
    heavily, so |distinct names| << |records| and the pair-scoring
    volume drops by the square of the repetition factor; with
    all-unique names it degrades to exactly the record-pair volume,
    never worse. Levenshtein itself uses the bounded 3-arg form
    (O(len * max_edit) band instead of the full DP matrix; returns
    -1 above the threshold, which the edit <= max_edit filter
    already discards).

    The ``max_block`` valve is IN-PLAN (the cdc.py ``raise_error``
    pattern): an oversized block kills the job at its first
    enumerated name pair — no eager plan-build collect, no extra
    scan. The keyed frame feeds the valve and the name-pair sides,
    so it is persisted through the caller's ``cache`` (CacheScope)
    or latest-call-only ``op_scope`` residency."""
    from umls2rdf_spark.operators.caching import op_scope

    if max_edit < 0:
        raise ValueError("link_records: max_edit must be >= 0")
    if max_block < 1:
        # a 1-record block can never emit a pair, so the valve's
        # "raises at the first emitted pair" contract needs
        # max_block >= 1 to stay exact under name-level enumeration
        raise ValueError("link_records: max_block must be >= 1")
    scope = cache if cache is not None else op_scope(
        records.sparkSession, "link_records"
    )
    base = records.select(
        F.col(id_col).cast("bigint").alias("rid"),
        _norm(F.col(name_col)).alias("nm"),
    )
    keyed = scope.persist(
        base.select(
            "rid",
            "nm",
            F.explode(F.array(*_block_keys("nm"))).alias("bk"),
        )
    )
    checked = keyed.groupBy("bk").agg(
        F.count(F.lit(1)).alias("__bn")
    ).select(
        "bk",
        F.when(
            F.col("__bn") > max_block,
            F.raise_error(
                F.concat(
                    F.lit("link_records: a block holds "),
                    F.col("__bn").cast("string"),
                    F.lit(
                        f" records (> max_block={max_block}) — add"
                        " a blocking pass or refine the key"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(F.col("__bn"))
        .alias("__bn"),
    )
    # block membership is a pure function of nm — enumerate and
    # score candidate NAME pairs (nm_a <= nm_b covers both record
    # orientations; edit and Jaccard are symmetric)
    names = keyed.select("bk", "nm").distinct()
    na = names.select("bk", F.col("nm").alias("nm_a"))
    nb = names.select("bk", F.col("nm").alias("nm_b"))
    name_cand = (
        na.join(checked, "bk")
        .join(nb, "bk")
        .where((F.col("nm_a") <= F.col("nm_b")) & (F.col("__bn") > 0))
        .select("nm_a", "nm_b")
        .distinct()  # name pair found by several passes scores once
    )
    ta, tb = (
        F.array_distinct(F.split(F.col(c), " "))
        for c in ("nm_a", "nm_b")
    )
    inter = F.size(F.array_intersect(ta, tb)).cast("bigint")
    union = F.size(F.array_union(ta, tb)).cast("bigint")
    matched = (
        name_cand.select(
            "nm_a",
            "nm_b",
            # bounded Levenshtein: -1 above max_edit, exact below
            F.levenshtein("nm_a", "nm_b", max_edit)
            .cast("bigint")
            .alias("edit"),
            (inter * _PPM).alias("__num"),
            union.alias("__den"),
        )
        .where((F.col("edit") >= 0) & (F.col("edit") <= max_edit))
        .select(
            "nm_a",
            "nm_b",
            "edit",
            F.expr("__num div __den").cast("bigint").alias(
                "jaccard_ppm"
            ),
        )
    )
    # reconstitute id pairs: each unordered record pair appears in
    # exactly one matched name pair (rid -> nm is functional), and
    # within it exactly once — (a, b) ordered by id via
    # least/greatest for nm_a != nm_b, rid_a < rid_b for the
    # self-name pair
    ids_a = base.select(F.col("nm").alias("nm_a"), F.col("rid").alias("__ra"))
    ids_b = base.select(F.col("nm").alias("nm_b"), F.col("rid").alias("__rb"))
    # the matched-names frame is tiny (often 1 post-AQE partition),
    # so without a spread the whole id expansion would stream out of
    # ONE task; hash the half-expanded frame across the session's
    # shuffle parallelism (explicit count — AQE must not coalesce a
    # deliberate fan-out spread; scale-adaptive via the conf, never
    # a constant)
    n_spread = int(
        records.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return (
        matched.join(F.broadcast(ids_a), "nm_a")
        .repartition(n_spread, F.col("__ra"))
        .join(F.broadcast(ids_b), "nm_b")
        .where(
            F.when(
                F.col("nm_a") == F.col("nm_b"),
                F.col("__ra") < F.col("__rb"),
            ).otherwise(F.col("__ra") != F.col("__rb"))
        )
        .select(
            F.least("__ra", "__rb").alias("id_a"),
            F.greatest("__ra", "__rb").alias("id_b"),
            "edit",
            "jaccard_ppm",
        )
    )


def link_records_sql(
    src_sql: str,
    id_col: str,
    name_col: str,
    max_edit: int = 2,
) -> str:
    """DuckDB twin of :func:`link_records` — same normalization,
    blocking passes, pair dedup, `levenshtein` and exact-ppm token
    Jaccard."""
    nm = (
        f"trim(regexp_replace(lower({name_col}), '\\s+', ' ', 'g'))"
    )
    return f"""
WITH __base AS (
  SELECT CAST({id_col} AS BIGINT) AS rid, {nm} AS nm
  FROM ({src_sql}) AS __src),
__keyed AS (
  SELECT rid, nm, UNNEST([
    'f:' || string_split(nm, ' ')[1],
    'l:' || string_split(nm, ' ')[-1] || ':' ||
      CAST(length(nm) // 4 AS VARCHAR)
  ]) AS bk
  FROM __base),
__cand AS (
  SELECT DISTINCT a.rid AS id_a, b.rid AS id_b,
         a.nm AS nm_a, b.nm AS nm_b
  FROM __keyed a JOIN __keyed b ON a.bk = b.bk AND a.rid < b.rid)
SELECT id_a, id_b,
       CAST(levenshtein(nm_a, nm_b) AS BIGINT) AS edit,
       CAST((CAST(len(list_intersect(list_distinct(string_split(nm_a, ' ')),
                                     list_distinct(string_split(nm_b, ' '))))
                  AS BIGINT) * {_PPM})
            // CAST(len(list_distinct(string_split(nm_a, ' ') ||
                                      string_split(nm_b, ' ')))
                    AS BIGINT) AS BIGINT) AS jaccard_ppm
FROM __cand
WHERE levenshtein(nm_a, nm_b) <= {max_edit}
"""
