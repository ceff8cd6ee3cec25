"""Corpus selection operators: token-budget curation and domain
mixture resampling — the "decide what goes into the training run"
steps that sit after cleaning/dedup in an LLM data pipeline (no
counterpart in the reference; 100 TB extensions).

Both are engine-exact by construction (integer arithmetic,
deterministic hash tie-breaks), so DuckDB oracles reproduce them
bit-for-bit under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import (
    stable_hash40,
    stable_hash40_spark_sql,
)


def _bt(name: str) -> str:
    """Backtick-quote an interpolated identifier for the sql-string
    exprs below (the completion.py fingerprint pattern)."""
    return "`" + name.replace("`", "``") + "`"



def select_to_token_budget(
    df: DataFrame,
    id_col: str,
    ntok_col: str,
    score_col: str,
    budget: int,
    shards: int = 64,
) -> DataFrame:
    """Greedy quality-first corpus selection under a global token
    budget: admit documents in (score DESC, shard, id) order while
    the running token total stays <= ``budget`` — the standard
    "take the best data until the budget is full" curation step.

    Admission order within a score class is (stable_hash40(id) mod
    ``shards``, id): deterministic and partition-invariant because
    the key is data, and it is exactly what makes the cumulative sum
    scale — the global running total decomposes into

    - per-(score, shard) local cumsums (window inside one shuffle
      partition each),
    - a (|score classes| x shards)-row totals frame whose running
      offsets are one window over a bounded frame,
    - a broadcast join lifting local cumsum to global position.

    No single-reducer pass ever sees the corpus: the same two-level
    scan as pack_sequences. ``score_col`` must be integer/bucketed
    (quality scores always are) — the totals frame is bounded by
    |distinct scores| x shards, the same boundedness argument as
    unigram_surprisal's distinct-count frame. A doc is admitted iff
    its global inclusive cumsum <= budget; once the budget is
    crossed every later doc in the order has a larger cumsum, so
    admission is a clean prefix.

    ``score_col`` must be non-null (a NULL score class would not
    match its own offset row in the equi-join); score it 0 upstream
    if "unscored" should mean "last in line".

    Returns the admitted rows with their input columns.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    # sql-string exprs, one Dataset per step (each classic DataFrame
    # construction costs ~4 ms of eager JVM analysis — guide §7.3):
    # shard + local cumsum fuse into ONE select (the window may
    # PARTITION BY the shard expression directly), offsets into one
    # selectExpr over the agg
    qid, qscore, qntok = _bt(id_col), _bt(score_col), _bt(ntok_col)
    shard_sql = (
        f"CAST(pmod({stable_hash40_spark_sql(f'CAST({qid} AS STRING)')},"
        f" {shards}) AS INT)"
    )
    local = df.selectExpr(
        "*",
        f"{shard_sql} AS __shard",
        f"SUM(CAST({qntok} AS BIGINT)) OVER ("
        f"PARTITION BY {qscore}, {shard_sql} ORDER BY {qid}"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __cum",
    )
    offs = (
        local.groupBy(score_col, "__shard")
        .agg(F.max("__cum").alias("__tot"))
        .selectExpr(
            qscore,
            "__shard",
            "COALESCE(SUM(__tot) OVER ("
            f"ORDER BY {qscore} DESC, __shard ASC"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
            " 0) AS __off",
        )
    )
    # The offsets frame is bounded (|distinct scores| x shards — the
    # distinct-count-value argument), so it is collected EAGERLY and
    # shipped back as a literal broadcast frame. The corpus-sized
    # local frame is then read by exactly one job — the output — so
    # nothing is persisted: round 5 cached it MEMORY_AND_DISK for
    # the life of the session, i.e. a full corpus copy in executor
    # storage per call. Two streaming passes over the upstream beat
    # a corpus-sized spill + an unreleasable cache at 100 TB; a
    # caller who wants one pass persists the INPUT with an owned
    # lifecycle (operators/caching.CacheScope).
    spark = df.sparkSession
    offs_lit = spark.createDataFrame(offs.collect(), offs.schema)
    out = local.join(F.broadcast(offs_lit), [score_col, "__shard"])
    return out.where(
        F.col("__off") + F.col("__cum") <= F.lit(int(budget))
    ).select(*df.columns)


def select_to_token_budget_sql(
    table: str,
    id_col: str,
    ntok_col: str,
    score_col: str,
    budget: int,
    shards: int = 64,
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`select_to_token_budget`: one global
    window cumsum over the identical (score DESC, shard, id) order —
    the oracle can afford the global sort the operator avoids."""
    from umls2rdf_spark.functions.hashing import stable_hash40_sql

    if cols == "*":
        # the Spark operator returns only the input columns — keep
        # column parity by stripping the internal cumsum helper
        cols = "* EXCLUDE (__cum)"
    h = stable_hash40_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""
SELECT {cols} FROM (
  SELECT *, SUM(CAST({ntok_col} AS BIGINT)) OVER (
      ORDER BY {score_col} DESC, ({h}) % {shards}, {id_col}
      ROWS UNBOUNDED PRECEDING) AS __cum
  FROM {table}
) WHERE __cum <= {budget}
"""


def resample_mixture(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    target_parts: dict[str, int],
    precision: int = 1_000_000,
) -> DataFrame:
    """Deterministic domain-mixture resampling: downsample each
    domain so the surviving corpus approaches the target mixture
    ``target_parts`` (integer weight per domain, e.g. {web: 6,
    code: 3, wiki: 1}) WITHOUT upsampling anything — the data-mixing
    step (DoReMi / The Pile-style recipes) before training.

    The largest feasible total T under "no domain is upsampled" puts
    the scarcest domain (min count/parts) in almost fully (exactly
    full when its count divides evenly; floor rounding of T costs at
    most one part otherwise); every other domain is hash-thresholded
    to its share. All sizing arithmetic
    is DECIMAL(38,0) floor-division in-plan (counts frame is
    |domains| rows, broadcast; the feasibility min is a 1-row
    broadcast cross join — no driver collect), so the per-domain
    keep thresholds are exact integers any engine reproduces.
    Membership is stable_hash40(id) mod precision < threshold: the
    same id always samples the same way (re-runs and incremental
    rebuilds see a consistent subset), and realized counts
    concentrate at threshold/precision like stratified_sample.
    Domains absent from ``target_parts`` are dropped (weight 0).

    Returns the surviving rows with their input columns.
    """
    if not target_parts:
        raise ValueError("target_parts must be non-empty")
    if any(p < 0 for p in target_parts.values()):
        raise ValueError("target parts must be >= 0")
    total_parts = sum(target_parts.values())
    if total_parts <= 0:
        raise ValueError("target parts must sum > 0")

    parts_map = F.create_map(
        *[
            x
            for d, p in sorted(target_parts.items())
            for x in (F.lit(d), F.lit(int(p)))
        ]
    )
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__cnt"))
        .withColumn(
            "__parts",
            F.coalesce(
                parts_map[F.col(domain_col)], F.lit(0)
            ).cast("decimal(38,0)"),
        )
    )
    # feasible totals per domain: T_d = cnt_d * P div parts_d; the
    # global T = min over weighted domains. 1-row frame, broadcast.
    feas = counts.where(F.col("__parts") > 0).agg(
        F.min(
            F.expr(f"__cnt * {total_parts} div __parts")
        ).alias("__T")
    )
    rates = (
        counts.crossJoin(F.broadcast(feas))
        # threshold_d = parts_d * T * precision div (P * cnt_d),
        # <= precision by construction of T
        .withColumn(
            "__thresh",
            F.expr(
                f"CAST(__parts * __T * {precision} "
                f"div ({total_parts} * __cnt) AS BIGINT)"
            ),
        )
        .select(domain_col, "__thresh")
    )
    bucket = F.pmod(
        stable_hash40(F.col(id_col).cast("string")), F.lit(precision)
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(bucket < F.col("__thresh"))
        .select(*df.columns)
    )


def resample_mixture_sql(
    table: str,
    domain_col: str,
    id_col: str,
    target_parts: dict[str, int],
    precision: int = 1_000_000,
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`resample_mixture` — identical integral
    floor-division sizing (HUGEINT here, DECIMAL(38,0) ``div`` on
    the Spark side; DuckDB's ``//`` on DECIMAL does NOT truncate, so
    the integer type is load-bearing), identical hash membership."""
    from umls2rdf_spark.functions.hashing import stable_hash40_sql

    total_parts = sum(target_parts.values())
    parts_case = " ".join(
        "WHEN '{}' THEN {}".format(d.replace("'", "''"), int(p))
        for d, p in sorted(target_parts.items())
    )
    h = stable_hash40_sql(f"CAST(t.{id_col} AS VARCHAR)")
    return f"""
WITH counts AS (
  SELECT {domain_col} AS dom,
         CAST(COUNT(*) AS HUGEINT) AS cnt,
         CAST(CASE {domain_col} {parts_case} ELSE 0 END
              AS HUGEINT) AS parts
  FROM {table}
  GROUP BY {domain_col}
),
feas AS (
  SELECT MIN(cnt * {total_parts} // parts) AS T
  FROM counts WHERE parts > 0
),
rates AS (
  SELECT dom,
         CAST(parts * T * {precision}
              // ({total_parts} * cnt) AS BIGINT) AS thresh
  FROM counts CROSS JOIN feas
)
SELECT {cols} FROM {table} t
JOIN rates r ON r.dom = t.{domain_col}
WHERE ({h}) % {precision} < r.thresh
"""


def temperature_parts(
    df: DataFrame,
    domain_col: str,
    tau: float,
    scale: int = 1_000_000,
) -> dict[str, int]:
    """Temperature-scaled mixture weights from observed domain
    sizes: parts_d ∝ n_d^tau (the mT5 §3.3 / XLM-R multi-source
    sampling recipe — tau < 1 flattens toward uniform so low-resource
    domains are not drowned; tau = 1 keeps natural proportions;
    tau = 0 is uniform).

    Driver-side by design: the collect is bounded by the number of
    DOMAINS (the same bounded-distinct-value argument as
    bigram_surprisal's weight dims), and the float ``n^tau`` is
    evaluated ONCE here — the resulting integer parts are inlined
    identically into the Spark plan and the SQL oracle, so engine
    libm differences cannot split the engines. Every nonempty domain
    gets >= 1 part (quantization can't silently drop a domain).

    Feed the result to :func:`resample_mixture` /
    :func:`resample_mixture_sql` (see :func:`resample_temperature`).
    """
    if tau < 0:
        raise ValueError("tau must be >= 0")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    powed = {d: float(n) ** tau for d, n in counts.items() if n > 0}
    tot = sum(powed.values())
    return {
        d: max(1, int(round(p * scale / tot)))
        for d, p in sorted(powed.items())
    }


def resample_temperature(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    tau: float,
    precision: int = 1_000_000,
) -> DataFrame:
    """Temperature-resampled source mixing: derive the parts with
    :func:`temperature_parts`, then the engine-exact hash-threshold
    resample of :func:`resample_mixture` (no upsampling; scarcest
    post-temperature domain kept almost fully)."""
    parts = temperature_parts(df, domain_col, tau)
    return resample_mixture(
        df, domain_col, id_col, parts, precision=precision
    )


#: quantization for the in-plan sqrt(n) parts — int64-exact because
#: IEEE sqrt is CORRECTLY ROUNDED in both engines (unlike ln/exp/
#: pow, which is why general tau stays driver-side above).
SQRT_PARTS_SCALE = 1 << 20


def resample_sqrt_mixture(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    precision: int = 1_000_000,
) -> DataFrame:
    """The tau = 0.5 temperature mix ENTIRELY in-plan — no driver
    collect: parts_d = floor(sqrt(n_d)·2^20) (sqrt is the one
    transcendental-ish primitive IEEE requires correctly rounded, so
    quantizing it yields identical int64 parts on any engine), then
    the same no-upsampling feasibility/threshold machinery as
    :func:`resample_mixture` with the parts TOTAL joined in as a
    1-row broadcast instead of a literal. Domain-count skew flattens
    as sqrt — the multilingual/multi-source sampling default when no
    hand-tuned weights exist.

    All sizing stays DECIMAL(38,0) integral division (parts < 2^40,
    cnt·P < 10^38 for any realistic corpus); membership is the
    shared stable-hash threshold, so re-runs and incremental
    rebuilds keep identical subsets.
    """
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__cnt"))
        .withColumn(
            "__parts",
            F.expr(
                "CAST(floor(sqrt(CAST(__cnt AS DOUBLE)) "
                f"* {SQRT_PARTS_SCALE}) AS DECIMAL(38,0))"
            ),
        )
    )
    ptot = counts.agg(
        F.sum("__parts").cast("decimal(38,0)").alias("__P")
    )
    feas = (
        counts.crossJoin(F.broadcast(ptot))
        .where(F.col("__parts") > 0)
        .agg(F.min(F.expr("__cnt * __P div __parts")).alias("__T"))
    )
    rates = (
        counts.crossJoin(F.broadcast(ptot))
        .crossJoin(F.broadcast(feas))
        .withColumn(
            "__thresh",
            F.expr(
                f"CAST(__parts * __T * {precision} "
                "div (__P * __cnt) AS BIGINT)"
            ),
        )
        .select(domain_col, "__thresh")
    )
    bucket = F.pmod(
        stable_hash40(F.col(id_col).cast("string")), F.lit(precision)
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(bucket < F.col("__thresh"))
        .select(*df.columns)
    )


def resample_sqrt_mixture_sql(
    table: str,
    domain_col: str,
    id_col: str,
    precision: int = 1_000_000,
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`resample_sqrt_mixture` — HUGEINT
    integral division, the same quantized-sqrt parts."""
    from umls2rdf_spark.functions.hashing import stable_hash40_sql

    h = stable_hash40_sql(f"CAST(t.{id_col} AS VARCHAR)")
    return f"""
WITH counts AS (
  SELECT {domain_col} AS dom,
         CAST(COUNT(*) AS HUGEINT) AS cnt,
         CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE))
              * {SQRT_PARTS_SCALE}) AS HUGEINT) AS parts
  FROM {table}
  GROUP BY {domain_col}
),
ptot AS (SELECT SUM(parts) AS P FROM counts),
feas AS (
  SELECT MIN(cnt * P // parts) AS T
  FROM counts CROSS JOIN ptot WHERE parts > 0
),
rates AS (
  SELECT dom,
         CAST(parts * T * {precision}
              // (P * cnt) AS BIGINT) AS thresh
  FROM counts CROSS JOIN ptot CROSS JOIN feas
)
SELECT {cols} FROM {table} t
JOIN rates r ON r.dom = t.{domain_col}
WHERE ({h}) % {precision} < r.thresh
"""


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    buckets: int = 4096,
) -> DataFrame:
    """Deterministic training-order shuffle: every row's global
    position under the pseudorandom order (stable_hash40(seed|id),
    id) — the "shuffle the corpus once per epoch" step before
    sequence packing, reproducible anywhere (a new ``seed`` is a new
    epoch order; the same seed always replays the same order).

    No global sort: the order key's TOP bits pick one of ``buckets``
    range-aligned buckets (``hkey div (2^40/buckets)`` — a modulo
    would interleave ranges and break the decomposition), so the
    global rank is bucket offsets (one window over a <= buckets-row
    count frame) + a within-bucket row_number — the same two-level
    scan as select_to_token_budget, with hash-uniform bucket sizes
    by construction. ``buckets`` is a pure parallelism knob: any
    value yields the identical order.

    Returns the input columns plus ``epoch_pos`` (0-based).
    ``buckets`` must be a power of two dividing 2^40.
    """
    if buckets <= 0 or (1 << 40) % buckets != 0:
        raise ValueError("buckets must be a power of two <= 2^40")
    width = (1 << 40) // buckets
    # sql-string exprs, fused steps (each classic DataFrame
    # construction costs ~4 ms of eager JVM analysis — guide §7.3);
    # identical hash key, bucketing and offset window as the old
    # Column chain
    qid = _bt(id_col)
    hk_sql = stable_hash40_spark_sql(
        f"concat('{seed}|', CAST({qid} AS STRING))"
    )
    base = df.selectExpr(
        "*",
        f"{hk_sql} AS __hk",
        f"CAST(({hk_sql}) div {width} AS INT) AS __b",
    )
    offs = (
        base.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .selectExpr(
            "__b",
            "COALESCE(SUM(__n) OVER (ORDER BY __b"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
            " 0) AS __off",
        )
    )
    # <= buckets rows — collected eagerly so the corpus-sized base
    # frame feeds exactly one job and needs no persist (same
    # zero-residency trade as select_to_token_budget: the per-epoch
    # call in a long-lived training session must not accumulate
    # corpus-sized caches)
    spark = df.sparkSession
    offs_lit = spark.createDataFrame(offs.collect(), offs.schema)
    w_rank = Window.partitionBy("__b").orderBy("__hk", id_col)
    return (
        base.join(F.broadcast(offs_lit), "__b")
        .withColumn(
            "epoch_pos",
            (F.col("__off") + F.row_number().over(w_rank) - 1)
            .cast("bigint"),
        )
        .select(*df.columns, "epoch_pos")
    )


def epoch_shuffle_sql(
    table: str, id_col: str, seed: int = 0, cols: str = "*"
) -> str:
    """DuckDB twin of :func:`epoch_shuffle`: one global window rank
    over the identical (hash, id) order."""
    from umls2rdf_spark.functions.hashing import stable_hash40_sql

    h = stable_hash40_sql(
        f"'{seed}|' || CAST({id_col} AS VARCHAR)"
    )
    return f"""
SELECT {cols},
       CAST(ROW_NUMBER() OVER (ORDER BY {h}, {id_col}) - 1 AS BIGINT)
         AS epoch_pos
FROM {table}
"""


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
    buckets: int = 4096,
) -> DataFrame:
    """Deterministic weighted sampling without replacement:
    systematic (Madow) selection of ~``k`` rows with inclusion
    probability proportional to ``weight_col`` — the
    quality-weighted subsampling step ("sample 10M docs, better
    docs more likely") between scoring and packing. Priority-based
    weighted reservoirs need u^(1/w) floats that no two engines
    round alike; systematic sampling needs only the cumulative
    weight, so it is EXACT int64 end to end and replayable anywhere
    (same seed → same sample, regardless of partitioning).

    Construction: rows take the pseudorandom order
    (stable_hash40(seed|id), id) — epoch_shuffle's order — and a row
    is selected iff the counter ``floor(k·cum/W)`` advances across
    its weight span:

        keep ⟺ (k·cum) div W  >  (k·(cum − w)) div W

    with cum the inclusive running weight and W the total. Exactly
    k selections land when every weight ≤ W/k; a heavier row
    absorbs multiple selection points but is emitted once (sampling
    WITHOUT replacement — the standard systematic-sampling
    behavior, so the output can be < k on extreme skew).

    Scale shape: the running weight uses epoch_shuffle's two-level
    decomposition — hash-TOP-bit range buckets, per-bucket window
    cumsum, a ≤ ``buckets``-row offsets frame collected eagerly
    (which also yields W driver-side, where k·W < 2^63 is CHECKED,
    not assumed) — no global sort, no corpus-sized cache. Weights
    must be non-negative integers (CHECKED in the same eager pass —
    a negative weight raises); zero-weight rows are never selected.

    Returns the selected rows with the input columns.
    """
    if k <= 0:
        raise ValueError("k must be >= 1")
    if buckets <= 0 or (1 << 40) % buckets != 0:
        raise ValueError("buckets must be a power of two <= 2^40")
    width = (1 << 40) // buckets
    hkey = stable_hash40(
        F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
    )
    base = df.withColumn("__hk", hkey).withColumn(
        "__b", F.expr(f"__hk div {width}").cast("int")
    )
    w_local = (
        Window.partitionBy("__b")
        .orderBy("__hk", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = base.withColumn(
        "__cum", F.sum(F.col(weight_col).cast("bigint")).over(w_local)
    )
    totals = local.groupBy("__b").agg(
        F.max("__cum").alias("__tot"),
        F.min(F.col(weight_col).cast("bigint")).alias("__minw"),
        F.sum(
            F.col(weight_col).isNull().cast("bigint")
        ).alias("__nnull"),
    )
    w_off = (
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
    ).select("__b", "__off", "__tot", "__minw", "__nnull")
    spark = df.sparkSession
    rows = offs.collect()  # <= buckets rows (zero-residency trade)
    n_null = sum(r["__nnull"] or 0 for r in rows)
    if n_null > 0:
        # window-sum and min() both SKIP NULLs, so a NULL weight
        # would otherwise silently act as zero (and an all-NULL
        # bucket would make __minw None and crash min() below with
        # a TypeError) — enforced in the same eager pass
        raise ValueError(
            f"weights must be non-null non-negative integers "
            f"({n_null} NULL weight(s) found)"
        )
    min_w = min((r["__minw"] for r in rows), default=0)
    if min_w < 0:
        # enforced, not just documented: a negative weight breaks the
        # monotone-cumsum invariant (max(__cum) != bucket total) and
        # silently corrupts offsets, W, and the selection predicate
        raise ValueError(
            f"weights must be non-negative (min = {min_w})"
        )
    total_w = sum(r["__tot"] for r in rows)
    if total_w <= 0:
        return df.limit(0).select(*df.columns)
    if k * total_w >= (1 << 63):
        raise ValueError(
            f"k*W = {k}*{total_w} overflows int64; reduce k or "
            "pre-scale weights"
        )
    offs_lit = spark.createDataFrame(
        [(r["__b"], r["__off"]) for r in rows], "__b int, __off bigint"
    )
    keep = F.expr(
        f"(({k} * (__off + __cum)) div {total_w})"
    ) > F.expr(
        f"(({k} * (__off + __cum - CAST({weight_col} AS BIGINT)))"
        f" div {total_w})"
    )
    return (
        local.join(F.broadcast(offs_lit), "__b")
        .where(keep)
        .select(*df.columns)
    )


def weighted_sample_sql(
    table: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`weighted_sample`: one global window
    cumsum over the identical (hash, id) order, the identical
    integer selection predicate (``//`` ≡ Spark ``div``)."""
    from umls2rdf_spark.functions.hashing import stable_hash40_sql

    if cols == "*":
        # column parity with the Spark operator (input columns only)
        # — strip the internal cumsum/total helpers, the
        # select_to_token_budget_sql discipline
        cols = "* EXCLUDE (__cum, __w)"

    h = stable_hash40_sql(f"'{seed}|' || CAST({id_col} AS VARCHAR)")
    return f"""
WITH __wcum AS (
  SELECT *,
         SUM(CAST({weight_col} AS BIGINT)) OVER (
           ORDER BY {h}, {id_col}) AS __cum
  FROM {table}),
__wtot AS (
  SELECT CAST(SUM(CAST({weight_col} AS BIGINT)) AS BIGINT) AS __w
  FROM {table})
SELECT {cols} FROM __wcum CROSS JOIN __wtot
WHERE __w > 0
  AND ({k} * __cum) // __w
      > ({k} * (__cum - CAST({weight_col} AS BIGINT))) // __w
"""


def score_percentile(
    df: DataFrame,
    id_col: str,
    score_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group score → percentile calibration: each row's exact
    within-group percentile (ppm of the group's rows scoring
    STRICTLY below it) — the normalization step before a single
    global threshold can act across heterogeneous sources
    (FineWeb-edu-style per-shard calibration: "keep the top 10% of
    EACH source" needs every source's own CDF, not the global one;
    raw classifier scores aren't comparable across domains).

    Engine-exact and scale-safe by the distinct-count-value
    argument: the CDF is computed on the (group, score) COUNTS frame
    — bounded by |groups| × |score classes|, and the engine's scores
    are quantized integers by discipline — with one window over that
    bounded frame, then broadcast-joined back to the corpus. The
    corpus itself is never sorted or windowed; the only
    corpus-scale op is one map-side-combined groupBy + one broadcast
    join. Percentile is the int64 floor-division
    ``below * 1_000_000 div n`` (strictly-below convention: the
    minimum scores 0, the maximum scores < 1_000_000; ties share a
    percentile — the property that makes "top p%" cuts stable).

    ``score_col`` must be non-null (the NULL class would not match
    its own CDF row in the equi-join and the row would silently
    drop) — the select_to_token_budget contract; score unscored
    rows 0 upstream.

    Output: the input columns + ``pct_ppm``.
    """
    dim = score_percentile_dim(
        score_counts(df, score_col, group_col), score_col, group_col
    )
    return df.join(F.broadcast(dim), [group_col, score_col]).select(
        *df.columns, "pct_ppm"
    )


def score_counts(
    df: DataFrame, score_col: str, group_col: str
) -> DataFrame:
    """The bounded (group, score, __cnt) counts frame behind
    :func:`score_percentile` — ADDITIVE across shards and epochs
    (plain int64 sums), which is what makes it the streaming
    calibration state (streaming/selection.py): each micro-batch
    persists ITS OWN counts partial and the standing CDF is a
    re-aggregation of tiny rows, never of the data."""
    return df.groupBy(group_col, score_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )


def score_percentile_dim(
    counts: DataFrame, score_col: str, group_col: str
) -> DataFrame:
    """(group, score, pct_ppm) calibration dim from a (possibly
    multi-epoch) counts frame: duplicate (group, score) rows are
    merged first so epoch partials compose exactly; then the one
    window runs over the bounded merged frame (strictly-below int64
    ppm, the :func:`score_percentile` convention)."""
    merged = counts.groupBy(group_col, score_col).agg(
        F.sum("__cnt").cast("bigint").alias("__cnt")
    )
    w_cdf = (
        Window.partitionBy(group_col)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cdf = merged.withColumn(
        "__below", F.coalesce(F.sum("__cnt").over(w_cdf), F.lit(0))
    )
    tot = merged.groupBy(group_col).agg(F.sum("__cnt").alias("__n"))
    return cdf.join(tot, group_col).select(
        group_col,
        score_col,
        F.expr("__below * 1000000 div __n").alias("pct_ppm"),
    )


def score_percentile_sql(
    table: str,
    id_col: str,
    score_col: str,
    group_col: str,
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`score_percentile`: the same bounded
    (group, score) CDF frame, the same strictly-below int64 ppm."""
    if cols.strip() == "*":
        # "t.*" keeps the twin's output schema = df columns + pct_ppm;
        # a bare "*" would leak __cdf's __below/__n helpers through the
        # JOIN (the file's convention — see select_to_token_budget_sql).
        cols = "t.*"
    return f"""
WITH __counts AS (
  SELECT {group_col}, {score_col}, COUNT(*) AS __cnt
  FROM {table} GROUP BY 1, 2),
__cdf AS (
  SELECT {group_col}, {score_col},
         COALESCE(SUM(__cnt) OVER (
           PARTITION BY {group_col} ORDER BY {score_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS __below,
         SUM(__cnt) OVER (PARTITION BY {group_col}) AS __n
  FROM __counts)
SELECT {cols},
       CAST(__below * 1000000 // __n AS BIGINT) AS pct_ppm
FROM {table} t JOIN __cdf USING ({group_col}, {score_col})
"""


def stratified_sample(
    df: DataFrame, grp_col: str, id_col: str, n: int
) -> DataFrame:
    """(grp, id, rank): deterministic fixed-size-per-group sample —
    exactly ``min(n, |group|)`` rows from every group, drawn by the
    engine-neutral hash order (a uniform permutation of each group,
    reproducible across runs and engines; the epoch_shuffle
    argument). The eval-set carve: "give me 1 000 docs from EVERY
    source", which fraction-based sampling (split_assign) can't
    promise for small strata and weighted_sample doesn't target.

    ``row_number() <= n`` over the hash order compiles to
    WindowGroupLimit(Partial) → Exchange → Final (the cap_per_domain
    discipline): every map task prunes each group to its n best
    candidates BEFORE the shuffle, so a billion-row stratum ships
    O(n · partitions) rows, never its population. ``rank`` is kept
    so downstream can take any nested prefix (rank <= m < n) without
    re-sampling — nested samples are consistent by construction."""
    if n < 1:
        raise ValueError(f"stratified_sample: n must be >= 1, got {n}")
    w = Window.partitionBy(grp_col).orderBy(
        stable_hash40(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select(F.col(grp_col), F.col(id_col))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= n)
    )


def stratified_sample_sql(
    src_sql: str, grp_col: str, id_col: str, n: int
) -> str:
    """DuckDB twin of :func:`stratified_sample` — same hash order."""
    from umls2rdf_spark.functions.hashing import stable_hash40_sql

    h = stable_hash40_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""
SELECT {grp_col}, {id_col}, rank
FROM (SELECT {grp_col}, {id_col},
             CAST(row_number() OVER (
               PARTITION BY {grp_col}
               ORDER BY {h}, {id_col}) AS BIGINT) AS rank
      FROM ({src_sql}) AS __ss) AS __ranked
WHERE rank <= {n}
"""
