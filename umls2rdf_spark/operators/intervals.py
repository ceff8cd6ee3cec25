"""Generic interval overlap join (range join) — the join family
member Spark's optimizer has no native strategy for: given two sets
of [start, end] intervals (points are zero-length intervals), emit
every overlapping pair. A naive theta join ``l.start <= r.end AND
r.start <= l.end`` plans as BroadcastNestedLoopJoin / cartesian — a
100 TB non-starter.

The engine's strategy is EPOCH BINNING (the published range-join
optimization, e.g. Databricks' range-join hints and the interval-join
of stream processors): pick a bin width W, explode each interval into
the integer bins it touches (``start div W .. end div W``), and
equi-join on the bin — which Catalyst plans as a plain shuffle
hash/sort-merge join. The overlap predicate then filters candidates
within the bin.

Dedup without a distinct(): a pair overlapping k shared bins would
appear k times, and a ``distinct()`` would re-shuffle the whole
candidate stream. Instead each pair is emitted ONLY in its
overlap-anchor bin ``greatest(l.start, r.start) div W`` — for an
overlapping pair that bin is shared by construction (the later start
lies inside both intervals), and there is exactly one of it, so the
join is exact with zero post-shuffle.

Scale levers:
- ``bin width`` trades explode factor (rows per interval =
  interval_length/W + 1) against candidate selectivity (bin
  population). Set it near the TYPICAL interval length.
- The explode factor is fail-closed: an interval touching more than
  ``max_bins`` bins raises in-plan (``raise_error``) rather than
  silently amplifying a degenerate interval (an open-ended interval
  would otherwise explode into millions of rows PER ROW) — the
  BPE/unigram valve discipline.
- Hot bins (a burst hour) are AQE skew-join territory, the session
  default stance.

The DuckDB twin uses the O(n·m) theta join directly — at oracle SF
that's the ground truth the binned plan must value-match, which
pins both the overlap semantics AND the anchor-bin dedup.

Reference parity: the reference has no join engine at all (nested
dict lookups, /root/reference/umls2rdf.py:586-650); this operator
exists for the analytics surface (SURVEY §2 B44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _binned(
    df: DataFrame,
    cols: list[str],
    start: str,
    end: str,
    bin_width: int,
    max_bins: int,
) -> DataFrame:
    """Explode one side into the bins its interval touches, with the
    fail-closed explode-factor valve."""
    b0 = F.expr(f"{start} div {bin_width}")
    b1 = F.expr(f"{end} div {bin_width}")
    n_bins = b1 - b0 + F.lit(1)
    guarded = F.when(
        n_bins > max_bins,
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_overlap_join: interval touches more "
                    f"than max_bins={max_bins} bins of width "
                    f"{bin_width} ("
                ),
                n_bins.cast("string"),
                F.lit(") — widen bin_width or cap the interval"),
            )
        ).cast("bigint"),
    ).otherwise(b1)
    return df.select(
        *cols, F.explode(F.sequence(b0, guarded)).alias("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_id: str,
    l_start: str,
    l_end: str,
    r_id: str,
    r_start: str,
    r_end: str,
    bin_width: int,
    max_bins: int = 64,
) -> DataFrame:
    """All (l_id, r_id, ov_start, ov_end) with ``[l_start, l_end]``
    and ``[r_start, r_end]`` overlapping (closed intervals — touching
    endpoints count; pass end-1 upstream for half-open semantics).
    Bounds are integers (unix micros for time intervals; positions
    for genomic/text ranges). Output overlap bounds are the
    intersection.

    The join is the bin equi-join described in the module docstring:
    one shuffle per side on ``__bin``, candidates filtered by the
    overlap predicate, each pair emitted exactly once in its
    anchor bin.
    """
    lb = _binned(
        left.select(
            F.col(l_id),
            F.col(l_start).cast("bigint").alias("__ls"),
            F.col(l_end).cast("bigint").alias("__le"),
        ),
        [l_id, "__ls", "__le"],
        "__ls",
        "__le",
        bin_width,
        max_bins,
    )
    rb = _binned(
        right.select(
            F.col(r_id),
            F.col(r_start).cast("bigint").alias("__rs"),
            F.col(r_end).cast("bigint").alias("__re"),
        ),
        [r_id, "__rs", "__re"],
        "__rs",
        "__re",
        bin_width,
        max_bins,
    )
    anchor = F.expr(f"greatest(__ls, __rs) div {bin_width}")
    return (
        lb.join(rb, "__bin")
        .where(
            (F.col("__ls") <= F.col("__re"))
            & (F.col("__rs") <= F.col("__le"))
            & (anchor == F.col("__bin"))
        )
        .select(
            l_id,
            r_id,
            F.greatest("__ls", "__rs").alias("ov_start"),
            F.least("__le", "__re").alias("ov_end"),
        )
    )


def interval_overlap_join_sql(
    left_sql: str,
    right_sql: str,
    l_id: str,
    l_start: str,
    l_end: str,
    r_id: str,
    r_start: str,
    r_end: str,
) -> str:
    """DuckDB twin — the direct theta join (exact at oracle SF; the
    engine's binned plan must value-match it, which verifies both
    overlap semantics and the anchor-bin dedup)."""
    return f"""
SELECT l.{l_id}, r.{r_id},
       CAST(greatest(l.{l_start}, r.{r_start}) AS BIGINT) AS ov_start,
       CAST(least(l.{l_end}, r.{r_end}) AS BIGINT) AS ov_end
FROM ({left_sql}) l JOIN ({right_sql}) r
  ON l.{l_start} <= r.{r_end} AND r.{r_start} <= l.{l_end}
"""
