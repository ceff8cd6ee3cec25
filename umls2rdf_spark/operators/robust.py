"""Robust statistics over integer-quantized values: exact group
quantiles from value COUNTS, median/MAD outlier detection, and
per-group winsorization — the metric-hygiene layer of a curation
pipeline (quality scores, token counts and event values all have
heavy tails; mean/stddev gates move with the very outliers they are
meant to catch, median/MAD do not — Hampel's classic argument, and
the same per-source robust centering CCNet applies to perplexity).

Everything is EXACT and engine-neutral, no sampling and no
``percentile()``-style buffering:

1. one map-side-combined ``groupBy(group, value).count()`` — after
   this, every statistic reads the (group, value, cnt) frame, whose
   size is bounded by the DISTINCT quantized values per group, not
   the row count (the surface_extra.py B21 counting-quantile
   argument: a billion-row group with a bounded value domain costs
   the same as a thousand-row one);
2. the q-quantile is the ⌈n·q⌉-th order statistic (type-1 empirical
   quantile, integer rank math — no interpolation, so the result is
   always an observed value and parity needs no float discipline);
3. MAD re-runs the same machinery over |v − median| counts DERIVED
   from the counts frame (two aggregations total over raw data: the
   initial counts build — deviations never touch raw rows).

The value column must already be integer-quantized (callers use
``floor(value * 10^6)`` for doubles — the fingerprint_section
convention, identical in both engines). For unbounded-cardinality
continuous domains where even the counts frame is too big, the
approximate path is the q-digest sketch (operators/sketch.py); this
module is the exact path.

At 100 TB: the counts build is the only raw-data shuffle and it
map-side combines; the per-group cumulative window sorts DISTINCT
values within each group (bounded domain ⇒ bounded sort); the
counts frame is persisted so median, MAD and the outlier count do
not re-scan the source.

Reference parity: none (the reference has no numeric analytics);
LLM-pipeline surface (SURVEY §2 B45/C67).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _bt(name: str) -> str:
    """Backtick-quote an interpolated identifier (the completion.py
    fingerprint pattern) so caller-supplied column names containing
    spaces, hyphens or reserved words parse exactly as the Column API
    would have resolved them."""
    return "`" + name.replace("`", "``") + "`"


def quantile_from_counts(
    counts: DataFrame,
    grp_cols: list[str],
    val_col: str,
    cnt_col: str,
    q_ppm: int,
    out_col: str = "q_val",
) -> DataFrame:
    """(grp..., q_val): exact ⌈n·q⌉-th order statistic per group from
    a (grp, value, cnt) frame. One window pass over distinct values
    per group (cumulative counts), one map-side-combined argmin."""
    # sql-string exprs (1 py4j round-trip each — this helper runs
    # 2x per MAD summary and per winsorize): same windows, same
    # type-1 rank target as the old Column graph
    g = ", ".join(_bt(c) for c in grp_cols)
    v, cnt = _bt(val_col), _bt(cnt_col)
    cum = counts.selectExpr(
        *[_bt(c) for c in grp_cols],
        v,
        f"SUM({cnt}) OVER (PARTITION BY {g} ORDER BY {v})"
        " AS __cum",
        f"SUM({cnt}) OVER (PARTITION BY {g}) AS __n",
    )
    return cum.groupBy(*grp_cols).agg(
        F.expr(
            f"MIN(CASE WHEN __cum >= greatest(1,"
            f" (__n * {q_ppm} + {PPM - 1}) div {PPM})"
            f" THEN {v} END)"
        ).alias(out_col)
    )


def _quantile_from_counts_sql(
    counts_sql: str,
    grp: str,
    val: str,
    cnt: str,
    q_ppm: int,
    out: str,
) -> str:
    return f"""
SELECT {grp},
       MIN(CASE WHEN __cum >= greatest(1, (__n * {q_ppm} + {PPM - 1})
                                           // {PPM})
                THEN {val} END) AS {out}
FROM (SELECT {grp}, {val},
             SUM({cnt}) OVER (PARTITION BY {grp} ORDER BY {val})
               AS __cum,
             SUM({cnt}) OVER (PARTITION BY {grp}) AS __n
      FROM ({counts_sql}) AS __qc) AS __qcum
GROUP BY {grp}
"""


def mad_outlier_summary(
    df: DataFrame,
    grp_col: str,
    val_expr,
    k: int = 3,
    cache=None,
) -> DataFrame:
    """(grp, n, med_q, mad_q, n_outliers): per-group median, median
    absolute deviation and the count of values with
    ``|v − med| > k · MAD`` — the Hampel identifier with an integer
    threshold. ``val_expr`` is an already-quantized bigint Column
    (NULL values are dropped, documented loudly rather than treated
    as zero — the selection.py weight discipline).

    ``k·MAD`` and all comparisons are int64-exact; ``MAD = 0``
    (constant-majority group) flags every value not equal to the
    median, the standard Hampel edge — gate on ``mad_q > 0`` if that
    is too eager for the data.

    The counts and deviation-counts frames feed multiple branches,
    so both are persisted — through the caller's ``cache``
    (a :class:`~umls2rdf_spark.operators.caching.CacheScope`) when
    one is passed, else latest-call-only residency via ``op_scope``
    (a monitoring loop that calls this per epoch holds at most one
    invocation's cache, not an unbounded accumulation)."""
    from umls2rdf_spark.operators.caching import op_scope

    scope = cache if cache is not None else op_scope(
        df.sparkSession, "mad_outlier_summary"
    )
    vals = df.select(
        F.col(grp_col).alias("g"), val_expr.cast("bigint").alias("v")
    ).where(F.col("v").isNotNull())
    counts = scope.persist(
        vals.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
    )
    return mad_summary_from_counts(counts, grp_col, k, scope)


def mad_summary_from_counts(
    counts: DataFrame, grp_col: str, k: int, scope
) -> DataFrame:
    """The median/MAD/Hampel core over an already-built (and
    caller-persisted) ``(g, v, cnt)`` frame — shared by the batch
    operator above and the streaming sum-on-read face
    (streaming/robust.py), so the two can never drift. The derived
    deviation-counts frame is persisted on the caller's ``scope``
    (it feeds both the MAD quantile and the summary agg)."""
    med = quantile_from_counts(counts, ["g"], "v", "cnt", 500_000, "med_q")
    devc = scope.persist(
        counts.join(med, "g")
        .select(
            "g",
            F.abs(F.col("v") - F.col("med_q")).alias("dv"),
            "cnt",
        )
        .groupBy("g", "dv")
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = quantile_from_counts(devc, ["g"], "dv", "cnt", 500_000, "mad_q")
    summary = (
        devc.join(mad, "g")
        .groupBy("g")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.max("mad_q").cast("bigint").alias("mad_q"),
            F.sum(
                F.when(
                    F.col("dv") > F.lit(k) * F.col("mad_q"), F.col("cnt")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )
    return summary.join(med, "g").select(
        F.col("g").alias(grp_col),
        "n",
        F.col("med_q").cast("bigint").alias("med_q"),
        "mad_q",
        "n_outliers",
    )


def mad_outlier_summary_sql(
    src_sql: str,
    grp_col: str,
    val_sql: str,
    k: int = 3,
) -> str:
    """DuckDB twin of :func:`mad_outlier_summary` — the same counts
    CTE, rank targets and Hampel threshold."""
    counts = f"""
SELECT {grp_col} AS g, CAST({val_sql} AS BIGINT) AS v,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM ({src_sql}) AS __src
WHERE {val_sql} IS NOT NULL
GROUP BY 1, 2"""
    med = _quantile_from_counts_sql(counts, "g", "v", "cnt", 500_000, "med_q")
    devc = f"""
SELECT c.g, abs(c.v - m.med_q) AS dv, CAST(SUM(c.cnt) AS BIGINT) AS cnt
FROM ({counts}) c JOIN __med m ON c.g = m.g
GROUP BY 1, 2"""
    mad = _quantile_from_counts_sql(
        "SELECT * FROM __devc", "g", "dv", "cnt", 500_000, "mad_q"
    )
    return f"""
WITH __med AS MATERIALIZED ({med}),
__devc AS MATERIALIZED ({devc}),
__mad AS ({mad})
SELECT d.g AS {grp_col},
       CAST(SUM(d.cnt) AS BIGINT) AS n,
       CAST(MAX(m.med_q) AS BIGINT) AS med_q,
       CAST(MAX(a.mad_q) AS BIGINT) AS mad_q,
       CAST(SUM(CASE WHEN d.dv > {k} * a.mad_q THEN d.cnt ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM __devc d JOIN __mad a ON d.g = a.g JOIN __med m ON d.g = m.g
GROUP BY 1
"""


def winsorize(
    df: DataFrame,
    grp_col: str,
    val_expr,
    id_col: str,
    lo_ppm: int = 50_000,
    hi_ppm: int = 950_000,
) -> DataFrame:
    """(id, grp, v, v_clip): per-group winsorization — values below
    the exact lo-quantile (or above the hi-quantile) are CLIPPED to
    it, not dropped (the point of winsorizing: tail mass keeps its
    rank signal without its leverage). Quantiles are the same type-1
    order statistics as :func:`mad_outlier_summary`; the per-row
    pass is a broadcast join against the per-group bounds frame
    (|groups| rows)."""
    vals = df.select(
        F.col(id_col),
        F.col(grp_col).alias("g"),
        val_expr.cast("bigint").alias("v"),
    ).where(F.col("v").isNotNull())
    counts = vals.groupBy("g", "v").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # both bounds from ONE cumulative pass (shared window, shared
    # scan) — two quantile_from_counts calls would each re-derive
    # the counts frame from the source; sql-string exprs as there
    cum = counts.selectExpr(
        "g",
        "v",
        "SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS __cum",
        "SUM(cnt) OVER (PARTITION BY g) AS __n",
    )

    def _q(ppm: int, out: str) -> F.Column:
        return F.expr(
            f"MIN(CASE WHEN __cum >= greatest(1,"
            f" (__n * {ppm} + {PPM - 1}) div {PPM})"
            f" THEN v END)"
        ).alias(out)

    bounds = F.broadcast(
        cum.groupBy("g").agg(_q(lo_ppm, "lo_q"), _q(hi_ppm, "hi_q"))
    )
    return vals.join(bounds, "g").selectExpr(
        _bt(id_col),
        f"g AS {_bt(grp_col)}",
        "v",
        "CAST(greatest(lo_q, least(hi_q, v)) AS BIGINT) AS v_clip",
    )


def winsorize_sql(
    src_sql: str,
    grp_col: str,
    val_sql: str,
    id_col: str,
    lo_ppm: int = 50_000,
    hi_ppm: int = 950_000,
) -> str:
    """DuckDB twin of :func:`winsorize`."""
    counts = f"""
SELECT {grp_col} AS g, CAST({val_sql} AS BIGINT) AS v,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM ({src_sql}) AS __src
WHERE {val_sql} IS NOT NULL
GROUP BY 1, 2"""
    return f"""
WITH __wc AS MATERIALIZED ({counts}),
__cum AS (
  SELECT g, v,
         SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS __cum,
         SUM(cnt) OVER (PARTITION BY g) AS __n
  FROM __wc),
__b AS (
  SELECT g,
         MIN(CASE WHEN __cum >= greatest(1, (__n * {lo_ppm}
                  + {PPM - 1}) // {PPM}) THEN v END) AS lo_q,
         MIN(CASE WHEN __cum >= greatest(1, (__n * {hi_ppm}
                  + {PPM - 1}) // {PPM}) THEN v END) AS hi_q
  FROM __cum GROUP BY g)
SELECT s.{id_col},
       s.{grp_col},
       CAST({val_sql} AS BIGINT) AS v,
       CAST(greatest(b.lo_q, least(b.hi_q, CAST({val_sql} AS BIGINT)))
            AS BIGINT) AS v_clip
FROM ({src_sql}) AS s
JOIN __b b ON s.{grp_col} = b.g
WHERE {val_sql} IS NOT NULL
"""
