"""Time-series gap filling + interpolation: densify a per-key bucket
series (the TimescaleDB ``time_bucket_gapfill`` / ``locf`` /
``interpolate`` trio, re-expressed as DataFrame ops) — the missing
member of the time family next to tumbling/hopping/session windows
(B6/B22/B23b), sessionize (B7) and as-of join (B8): windowed
aggregates silently OMIT empty buckets, and every downstream
consumer that charts, differences, or rate-computes the series needs
the empty buckets PRESENT, carrying either the last observation
(locf) or a linear interpolation.

Shape (all built-ins, no UDF anywhere):

1. bucket + aggregate observed events: ONE map-side-combined
   ``groupBy(key, bucket)`` — the only raw-data shuffle;
2. per-key [min, max] bucket spans: a |keys|-row frame;
3. the dense grid via ``explode(sequence(minb, maxb))`` — grid size
   is |keys| x (span / bucket), a function of the TIME RANGE, not
   the event count (a year of minutes is ~526k buckets per key no
   matter how many trillion events fed them);
4. one window pass per direction over the GRID (not the events):
   ``last(ignorenulls)`` looking back gives locf and the previous
   observed bucket, ``first(ignorenulls)`` looking forward gives
   the bracketing next observation.

Interpolation is exact integer arithmetic on the already-quantized
values (the robust.py convention): with nonnegative quantized
values, ``(v_prev*(b_next − b) + v_next*(b − b_prev)) div
(b_next − b_prev)`` keeps the numerator nonnegative, so Spark's
``div`` and DuckDB's ``//`` (both truncating) agree exactly —
engine-exact parity with no float anywhere.

Fail-closed valve: a caller who buckets an unbounded key domain (per
user rather than per event type) or a degenerate bucket width gets a
runtime raise when any key's span exceeds ``max_buckets_per_key`` —
the check rides IN-PLAN on the spans frame (the cdc.py
``raise_error`` pattern: the checked bound feeds ``sequence()``
directly), so no eager driver job runs at plan-build time and a grid
explosion at 100 TB is a loud error before the grid materializes,
not an OOM. The observed-buckets frame feeds both the span
derivation and the grid join, so it is persisted through the
caller's ``cache`` (CacheScope) or latest-call-only ``op_scope``
residency.

Reference parity: none (the reference has no time-series surface);
LLM-pipeline / analytics extension (SURVEY §2 B49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    val_expr,
    bucket_secs: int,
    max_buckets_per_key: int = 1_000_000,
    cache=None,
) -> DataFrame:
    """Dense per-key bucket series with locf + linear interpolation.

    Returns (key, bucket, n_events, v_q, locf_q, interp_q):

    - ``bucket`` — epoch-seconds div ``bucket_secs`` (bigint);
      every bucket between a key's first and last observation is
      present exactly once;
    - ``n_events`` — observed events in the bucket (0 for gaps);
    - ``v_q`` — SUM of ``val_expr`` (an already-quantized
      NONNEGATIVE bigint Column) over the bucket, NULL for gaps;
    - ``locf_q`` — last observation carried forward (= ``v_q`` on
      observed buckets);
    - ``interp_q`` — linear interpolation between the bracketing
      observations on gap buckets, = ``v_q`` on observed buckets;
      NULL only before the first / after the last observation
      (no extrapolation, by design).
    """
    from umls2rdf_spark.operators.caching import op_scope

    if bucket_secs < 1:
        raise ValueError("gap_fill: bucket_secs must be >= 1")
    scope = cache if cache is not None else op_scope(
        events.sparkSession, "gap_fill"
    )
    obs = scope.persist(
        events.select(
            F.col(key_col).alias("k"),
            (
                F.unix_timestamp(F.col(ts_col))
                .cast("bigint")
            ).alias("__sec"),
            val_expr.cast("bigint").alias("__v"),
        )
        .where(F.col("__v").isNotNull())
        .select(
            "k",
            F.expr(f"__sec div {bucket_secs}").alias("b"),
            "__v",
        )
        .groupBy("k", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("__v").cast("bigint").alias("v_q"),
        )
    )
    # span valve IN-PLAN (the cdc.py raise_error pattern): the
    # checked maxb feeds sequence() directly, so an exploding key
    # kills the job before its grid materializes — no eager collect
    spans = obs.groupBy("k").agg(
        F.min("b").alias("minb"), F.max("b").alias("maxb")
    )
    checked_maxb = F.when(
        F.col("maxb") - F.col("minb") + 1 > max_buckets_per_key,
        F.raise_error(
            F.concat(
                F.lit("gap_fill: a key spans "),
                (F.col("maxb") - F.col("minb") + 1).cast("string"),
                F.lit(
                    " buckets (> max_buckets_per_key="
                    f"{max_buckets_per_key}) — widen bucket_secs or"
                    " coarsen the key"
                ),
            )
        ).cast("long"),
    ).otherwise(F.col("maxb"))
    grid = spans.select(
        "k",
        F.explode(
            F.sequence("minb", checked_maxb.alias("maxb"))
        ).alias("b"),
    )
    j = grid.join(obs, ["k", "b"], "left")
    back = (
        Window.partitionBy("k")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("k")
        .orderBy("b")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    observed_b = F.when(F.col("v_q").isNotNull(), F.col("b"))
    w = j.select(
        "k",
        "b",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias(
            "n_events"
        ),
        "v_q",
        F.last("v_q", ignorenulls=True).over(back).alias("locf_q"),
        F.last(observed_b, ignorenulls=True).over(back).alias(
            "__prev_b"
        ),
        F.first("v_q", ignorenulls=True).over(fwd).alias("__next_v"),
        F.first(observed_b, ignorenulls=True).over(fwd).alias(
            "__next_b"
        ),
    )
    interp = F.when(F.col("v_q").isNotNull(), F.col("v_q")).otherwise(
        F.expr(
            "(locf_q * (__next_b - b) + __next_v * (b - __prev_b)) "
            "div (__next_b - __prev_b)"
        )
    )
    return w.select(
        F.col("k").alias(key_col),
        F.col("b").alias("bucket"),
        "n_events",
        "v_q",
        "locf_q",
        interp.cast("bigint").alias("interp_q"),
    )


def gap_fill_sql(
    events_sql: str,
    key_col: str,
    ts_col: str,
    val_sql: str,
    bucket_secs: int,
) -> str:
    """DuckDB twin of :func:`gap_fill` — identical bucket math
    (``epoch_us // 10^6`` == Spark's second-truncating
    ``unix_timestamp`` for positive epochs), grid via
    ``unnest(generate_series(...))``, the same two IGNORE NULLS
    window passes and the same truncating integer division."""
    return f"""
WITH __obs AS (
  SELECT {key_col} AS k,
         (epoch_us({ts_col}) // 1000000) // {bucket_secs} AS b,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST({val_sql} AS BIGINT)) AS BIGINT) AS v_q
  FROM ({events_sql}) AS __src
  WHERE {val_sql} IS NOT NULL
  GROUP BY 1, 2),
__spans AS (
  SELECT k, MIN(b) AS minb, MAX(b) AS maxb FROM __obs GROUP BY 1),
__grid AS (
  SELECT k, UNNEST(generate_series(minb, maxb)) AS b FROM __spans),
__j AS (
  SELECT g.k, g.b, o.n_events, o.v_q
  FROM __grid g LEFT JOIN __obs o ON g.k = o.k AND g.b = o.b),
__w AS (
  SELECT k, b, COALESCE(n_events, 0) AS n_events, v_q,
    last_value(v_q IGNORE NULLS) OVER (
      PARTITION BY k ORDER BY b
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_q,
    last_value(CASE WHEN v_q IS NOT NULL THEN b END IGNORE NULLS)
      OVER (PARTITION BY k ORDER BY b
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __prev_b,
    first_value(v_q IGNORE NULLS) OVER (
      PARTITION BY k ORDER BY b
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS __next_v,
    first_value(CASE WHEN v_q IS NOT NULL THEN b END IGNORE NULLS)
      OVER (PARTITION BY k ORDER BY b
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS __next_b
  FROM __j)
SELECT k AS {key_col}, b AS bucket,
       CAST(n_events AS BIGINT) AS n_events, v_q, locf_q,
       CAST(CASE WHEN v_q IS NOT NULL THEN v_q
            ELSE (locf_q * (__next_b - b) + __next_v * (b - __prev_b))
                 // (__next_b - __prev_b) END AS BIGINT) AS interp_q
FROM __w
"""
