"""Mergeable frequency / cardinality sketches with value-verifiable
state: count-min (heavy-hitter counts in bounded memory) and
HyperLogLog (distinct counts in m registers) built from the engine's
md5-based hash family — so, unlike engine-native approx aggregates
(opaque internal state), BOTH the sketch state and the estimates are
deterministic and oracle-checkable cell-for-cell in DuckDB.

Why these exist at 100 TB:

- ``cms_sketch``: counting a vocabulary exactly (frequent_tokens,
  textstats.py) shuffles one record per distinct key per map task —
  fine for words, hopeless for URLs/n-grams/user-ids with billions of
  distinct keys. The count-min sketch caps the aggregation state at
  depth×width cells NO MATTER the key cardinality: every map task
  combines into ≤ d·w cells, the shuffle moves ≤ tasks·d·w rows, and
  the merged sketch answers point queries with one-sided error
  (estimate ≥ true count, overshoot ≤ εN with ε = e/width w.h.p.).
  Sketches MERGE by cell-wise addition — shards/days/streams combine
  without re-reading data (merge == whole-corpus sketch EXACTLY,
  pinned by tests).

- ``hll_registers``: COUNT(DISTINCT) over a 100 TB key column is a
  full shuffle of the distinct keys; the HLL register frame is m
  int rows. Registers are groupBy(bucket).max(rho) — map-side
  combined, mergeable by register-wise MAX (same exact-equality
  pin). The profiler's default mode (D7) uses Spark's built-in
  HLL++ for per-column stats; THIS operator is the explicit,
  cross-engine-verifiable form whose state you can store, merge
  across ingests, and re-estimate from.

Engine-exactness: hashes are ``stable_hash40`` (md5 prefix) +
the ``perm_params`` universal family (functions/hashing.py), both
already oracle-shared. The HLL estimate is the raw alpha formula
``alpha·m² / Σ 2^-reg`` — every term is IEEE-exact in both engines
(the alpha literal is generated once in Python and inlined into both;
``2^-reg`` are exact powers of two whose sum spans < 53 bits, so the
double SUM is order-independent), so even ``floor(est)`` cannot
diverge. The small-range (linear-counting) correction uses ``ln``,
whose libm rounding may differ per engine — it is deliberately NOT
part of the gated output; ``n_zero`` is emitted so callers apply it,
and the closeness test covers it with tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import (
    PERM_MODULUS,
    perm_params,
    stable_hash40,
    stable_hash40_py,
    stable_hash40_sql,
)

#: HLL hash width in bits (stable_hash40's range).
_HASH_BITS = 40


# ── count-min ────────────────────────────────────────────────────────
def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """(row_i, col, cnt): the count-min matrix as a frame of ≤
    depth·width cells. One pass, map-side-combined; state bounded by
    construction (see module docstring)."""
    params = perm_params(depth)
    arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(a).alias("a"),
                F.lit(b).alias("b"),
            )
            for i, a, b in params
        ]
    )
    cells = df.select(
        stable_hash40(F.col(key_col)).alias("__h"),
        F.explode(arr).alias("__p"),
    ).select(
        F.col("__p.i").cast("bigint").alias("row_i"),
        F.pmod(
            F.pmod(
                F.col("__p.a") * F.col("__h") + F.col("__p.b"),
                F.lit(PERM_MODULUS),
            ),
            F.lit(width),
        ).cast("bigint").alias("col"),
    )
    return cells.groupBy("row_i", "col").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_cells_py(
    key: str, depth: int, width: int
) -> list[tuple[int, int]]:
    """Driver-side twin of the in-plan cell derivation — the (row_i,
    col) cells a key maps to. Used to build point-query lookup frames
    and the oracle VALUES list from the SAME constants."""
    h = stable_hash40_py(key)
    return [
        (i, ((a * h + b) % PERM_MODULUS) % width)
        for i, a, b in perm_params(depth)
    ]


def cms_estimates(
    sketch: DataFrame,
    keys: list[str],
    depth: int = 4,
    width: int = 512,
    key_name: str = "token",
) -> DataFrame:
    """(key, est): point queries against the sketch — min over the
    key's depth cells, absent cells counting 0. The sketch side is
    ≤ d·w rows and broadcasts; estimates never underestimate."""
    spark = sketch.sparkSession
    rows = [
        (k, i, c)
        for k in keys
        for i, c in cms_cells_py(k, depth, width)
    ]
    lookup = spark.createDataFrame(
        rows, f"{key_name} string, row_i bigint, col bigint"
    )
    return (
        lookup.join(F.broadcast(sketch), ["row_i", "col"], "left")
        .groupBy(key_name)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est")
        )
    )


def _perm_values_sql(depth: int) -> str:
    return ", ".join(f"({i}, {a}, {b})" for i, a, b in perm_params(depth))


def cms_sketch_sql(
    occ_sql: str, key_expr: str, depth: int = 4, width: int = 512
) -> str:
    """DuckDB twin of :func:`cms_sketch` over ``occ_sql`` (one row
    per key occurrence)."""
    h = stable_hash40_sql(key_expr)
    return f"""
WITH __occ AS ({occ_sql}),
__h AS (SELECT {h} AS h FROM __occ),
__p(i, a, b) AS (VALUES {_perm_values_sql(depth)}),
__cells AS (
  SELECT CAST(__p.i AS BIGINT) AS row_i,
         CAST(((__p.a * __h.h + __p.b) % {PERM_MODULUS})
              % {width} AS BIGINT) AS col
  FROM __h CROSS JOIN __p)
SELECT row_i, col, CAST(COUNT(*) AS BIGINT) AS cnt
FROM __cells GROUP BY 1, 2
"""


def cms_estimates_sql(
    occ_sql: str,
    key_expr: str,
    keys: list[str],
    depth: int = 4,
    width: int = 512,
    key_name: str = "token",
) -> str:
    """DuckDB twin of :func:`cms_estimates` — the lookup cells come
    from the same :func:`cms_cells_py` constants."""
    vals = ", ".join(
        f"('{k}', {i}, {c})"
        for k in keys
        for i, c in cms_cells_py(k, depth, width)
    )
    return f"""
WITH __sk AS ({cms_sketch_sql(occ_sql, key_expr, depth, width)}),
__q({key_name}, row_i, col) AS (VALUES {vals})
SELECT __q.{key_name},
       CAST(MIN(COALESCE(__sk.cnt, 0)) AS BIGINT) AS est
FROM __q LEFT JOIN __sk
  ON __sk.row_i = __q.row_i AND __sk.col = __q.col
GROUP BY 1
"""


# ── HyperLogLog ──────────────────────────────────────────────────────
def hll_alpha(m: int) -> float:
    """The standard HLL bias constant — generated ONCE here and
    inlined as the same literal into both engines."""
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(df: DataFrame, key_col: str, b: int = 6) -> DataFrame:
    """(bucket, reg): the m = 2^b HLL registers, spine-completed so
    every bucket appears (reg 0 = empty). bucket = low b bits of the
    40-bit hash; rho = 1-based position of the leftmost 1 in the
    remaining 40-b bits (all-zero remainder → width+1)."""
    m = 1 << b
    w_bits = _HASH_BITS - b
    h = stable_hash40(F.col(key_col))
    w = (h / F.lit(m)).cast("bigint")  # h DIV m, h >= 0
    bitlen = F.length(
        F.regexp_replace(F.conv(w, 10, 2), "^0+", "")
    )
    rho = (F.lit(w_bits) - bitlen + F.lit(1)).cast("bigint")
    agg = (
        df.select(
            F.pmod(h, F.lit(m)).cast("bigint").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )
    spine = df.sparkSession.range(m).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    return spine.join(agg, "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("reg"), F.lit(0)).cast("bigint").alias("reg"),
    )


def hll_estimate(registers: DataFrame, b: int = 6) -> DataFrame:
    """(m, n_zero, est_floor): the raw-alpha estimate (IEEE-exact in
    both engines — see module docstring); n_zero lets callers apply
    the linear-counting small-range correction themselves."""
    m = 1 << b
    alpha = hll_alpha(m)
    return registers.agg(
        F.lit(m).cast("bigint").alias("m"),
        F.sum(
            F.when(F.col("reg") == 0, 1).otherwise(0)
        ).cast("bigint").alias("n_zero"),
        F.floor(
            F.lit(alpha)
            * F.lit(float(m * m))
            / F.sum(F.pow(F.lit(2.0), -F.col("reg")))
        ).cast("bigint").alias("est_floor"),
    )


def hll_registers_sql(occ_sql: str, key_expr: str, b: int = 6) -> str:
    m = 1 << b
    w_bits = _HASH_BITS - b
    h = stable_hash40_sql(key_expr)
    return f"""
WITH __src AS ({occ_sql}),
__h AS (SELECT {h} AS h FROM __src),
__r AS (
  SELECT h % {m} AS bucket,
         CAST({w_bits} - length(regexp_replace(bin(h // {m}),
              '^0+', '')) + 1 AS BIGINT) AS rho
  FROM __h),
__agg AS (SELECT bucket, MAX(rho) AS reg FROM __r GROUP BY 1)
SELECT CAST(__s.bucket AS BIGINT) AS bucket,
       CAST(COALESCE(__agg.reg, 0) AS BIGINT) AS reg
FROM (SELECT range AS bucket FROM range({m})) __s
LEFT JOIN __agg ON __s.bucket = __agg.bucket
"""


def hll_estimate_sql(registers_sql: str, b: int = 6) -> str:
    m = 1 << b
    alpha = hll_alpha(m)
    return f"""
SELECT CAST({m} AS BIGINT) AS m,
       CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero,
       CAST(FLOOR(CAST({alpha!r} AS DOUBLE)
            * CAST({m * m} AS DOUBLE)
            / SUM(pow(2.0, -reg))) AS BIGINT) AS est_floor
FROM ({registers_sql}) AS __regs
"""


# ── q-digest ─────────────────────────────────────────────────────────
def qdigest_build(
    df,
    value_col: str,
    levels: int = 13,
    k: int = 32,
    group_cols: tuple[str, ...] = (),
    local_finish: bool | None = None,
) -> DataFrame:
    """(level, idx, cnt): a q-digest (Shrivastava et al. 2004) over an
    integer column in ``[0, 2^levels)`` — the DETERMINISTIC mergeable
    quantile sketch completing the module's family (CMS = frequencies,
    HLL = cardinality, q-digest = quantiles). Unlike KLL/t-digest
    (randomized / centroid-heuristic), the q-digest build is a pure
    function of the value histogram, so the sketch STATE is
    oracle-checkable node-for-node in DuckDB like the others.

    Why at 100 TB: an exact quantile needs the full value multiset
    (the histogram key's exact counting-quantile does one corpus
    shuffle per query batch); the q-digest aggregation state is
    bounded by construction — the only corpus-scale op is ONE
    map-side-combined groupBy onto ≤ 2^levels leaf cells (the CMS
    argument), after which ``levels`` rounds of compression run on
    frames that START ≤ 2^levels rows and halve each round,
    independent of data size. Rank queries answer within
    ``levels · floor(n/k)`` of the true rank (the classic q-digest
    guarantee for its ≲ 2k·levels nodes; pinned by property test).

    Build = :func:`qdigest_compress` on the leaf histogram (level =
    ``levels``). Values outside the universe fail closed in-plan
    (raise_error, the intervals.py valve discipline) — callers with
    open-ended domains clamp into a top overflow bucket explicitly.

    ``group_cols`` builds one INDEPENDENT digest per group (per-source
    length quantiles for dataset cards): every threshold uses the
    group's OWN mass, the leaf frame is ≤ |groups|·2^levels rows, and
    the compression rounds stay bounded — the per-group digests are
    byte-equal to filtering first and building per group (pinned).

    ``local_finish`` (auto: on for ungrouped builds with levels ≤ 16)
    collects the leaf histogram — which is ≤ 2^levels rows BY
    CONSTRUCTION, a hard bound no data distribution can break (unlike
    the BPE word-frequency frame, which needed a valve) — and runs
    the identical compression in driver Python, replacing ``levels``
    sequential tiny Spark jobs with one collect (~10× faster at any
    SF; byte-equality to the distributed path is pinned by test).
    The distributed path remains for per-group builds (the leaf bound
    is |groups|·2^levels — not driver-safe when groups are unbounded)
    and for universes past 2^16.
    """
    top = 1 << levels
    v = F.col(value_col).cast("bigint")
    guarded = F.when(
        (v < 0) | (v >= top),
        F.raise_error(
            F.concat(
                F.lit(
                    f"qdigest_build: value outside [0, {top}) — "
                    "clamp or rescale upstream: "
                ),
                v.cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(v)
    g = list(group_cols)
    leaves = (
        df.select(*g, guarded.alias("idx"))
        .groupBy(*g, "idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    if local_finish is None:
        local_finish = not g and levels <= 16
    if local_finish and not g:
        rows = leaves.collect()  # <= 2^levels rows by construction
        digest = qdigest_compress_py(
            [(r["idx"], r["cnt"]) for r in rows], levels, k
        )
        return df.sparkSession.createDataFrame(
            digest or [], "level int, idx bigint, cnt bigint"
        )
    nodes = leaves.select(
        *g, F.lit(levels).cast("int").alias("level"), "idx", "cnt"
    )
    return qdigest_compress(nodes, levels, k, group_cols=group_cols)


def qdigest_compress_py(
    leaf_counts: list[tuple[int, int]], levels: int, k: int
) -> list[tuple[int, int, int]]:
    """Driver-side twin of :func:`qdigest_compress` over a leaf
    histogram — the same per-level sweep, same int arithmetic, byte-
    equal output (pinned by test). Used by the ungrouped
    ``local_finish`` build path and by tests as the independent
    replica."""
    n = sum(c for _, c in leaf_counts)
    t = n // k
    cur: dict[int, int] = {}
    for idx, c in leaf_counts:
        cur[idx] = cur.get(idx, 0) + c
    frozen: list[tuple[int, int, int]] = []
    for lvl in range(levels, 0, -1):
        groups: dict[int, list[tuple[int, int]]] = {}
        for idx, c in cur.items():
            groups.setdefault(idx // 2, []).append((idx, c))
        nxt: dict[int, int] = {}
        for p, kids in groups.items():
            s = sum(c for _, c in kids)
            if s <= t:
                nxt[p] = s
            else:
                frozen.extend(
                    (lvl, idx, c) for idx, c in kids if c > 0
                )
                nxt[p] = 0
        cur = nxt
    frozen.extend((0, idx, c) for idx, c in cur.items() if c > 0)
    return sorted(frozen)


def qdigest_compress(
    nodes: DataFrame,
    levels: int,
    k: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Bottom-up q-digest compression of a node frame (level, idx,
    cnt) — ALSO the merge operation: union two digests' node frames
    and compress (counts at equal nodes add; the threshold uses the
    union's total mass). Per level, sibling groups whose combined
    mass fits under ``T = n div k`` push up; groups over T freeze
    their members into the digest and forward a zero-mass path
    holder. Every decision is int64 arithmetic on bounded frames —
    engine-exact by construction.

    The input and each level's carry frame are eagerly
    localCheckpoint-ed (the pagerank/BPE per-round pattern): the
    frames are bounded (<= 2^level rows), so the cost is ``levels``
    tiny jobs, and without the barrier the level-on-level
    self-referential plan sends Catalyst analysis superlinear — a
    compress-of-union-of-digests (the merge path) stacks 3x the
    depth and stalls at plan build.

    With ``group_cols`` every decision is per group: the threshold is
    the group's own ``n div k`` (attached by a broadcast equi-join on
    the bounded per-group totals frame instead of the 1-row
    crossJoin), sibling grouping keys on (group, parent), and the
    output carries the group columns."""
    from functools import reduce as _reduce

    g = list(group_cols)
    if g:
        tot = nodes.groupBy(*g).agg(
            F.expr(
                f"CAST(coalesce(sum(cnt), 0) div {k} AS BIGINT)"
            ).alias("__T")
        )
        nt = nodes.join(F.broadcast(tot), g).localCheckpoint()
    else:
        tot = nodes.agg(
            F.expr(
                f"CAST(coalesce(sum(cnt), 0) div {k} AS BIGINT)"
            ).alias("__T")
        )
        nt = nodes.crossJoin(F.broadcast(tot)).localCheckpoint()
    frozen = []
    cur = nt.where(F.col("level") == levels).select(
        *g, "idx", "cnt", "__T"
    )
    for lvl in range(levels, 0, -1):
        par = cur.groupBy(
            *g, F.expr("idx div 2").alias("p")
        ).agg(
            F.sum("cnt").cast("bigint").alias("__s"),
            F.max("__T").alias("__T"),
        )
        ps = par.select(
            *[F.col(c).alias(f"__g_{c}") for c in g], "p", "__s"
        )
        cond = F.expr("idx div 2") == F.col("p")
        for c in g:
            cond = cond & (F.col(c) == F.col(f"__g_{c}"))
        frozen.append(
            cur.join(ps, cond)
            .where(
                (F.col("__s") > F.col("__T")) & (F.col("cnt") > 0)
            )
            .select(
                *g,
                F.lit(lvl).cast("int").alias("level"),
                "idx",
                "cnt",
            )
        )
        nxt = par.select(
            *g,
            F.col("p").alias("idx"),
            F.when(F.col("__s") <= F.col("__T"), F.col("__s"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("cnt"),
            "__T",
        )
        inc = nt.where(F.col("level") == lvl - 1).select(
            *g, "idx", "cnt", "__T"
        )
        cur = (
            nxt.unionByName(inc)
            .groupBy(*g, "idx")
            .agg(
                F.sum("cnt").cast("bigint").alias("cnt"),
                F.max("__T").alias("__T"),
            )
            .localCheckpoint()
        )
    root = cur.where(F.col("cnt") > 0).select(
        *g, F.lit(0).cast("int").alias("level"), "idx", "cnt"
    )
    return _reduce(lambda a, b: a.unionByName(b), frozen + [root])


def qdigest_quantiles(
    digest: DataFrame,
    q_ppms: list[int],
    levels: int = 13,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(q_ppm, rank_target, est): rank queries against a digest.
    Nodes are walked in the canonical post-order (upper bound asc,
    deeper nodes first at ties); the estimate for quantile q is the
    first node upper bound whose cumulative mass reaches
    ``rank_target = ceil(q·n)`` (int64 ppm arithmetic — engine-exact).
    The digest is ≲ 2k·levels rows, so the unpartitioned window and
    the non-equi query join are bounded-frame ops by construction
    (the score_percentile stance). An empty digest yields no rows.

    With ``group_cols`` (a per-group digest from
    :func:`qdigest_build`): the walk partitions by group, each
    group's rank target uses its OWN mass, and the output carries the
    group columns — per-source quantiles from one frame."""
    from pyspark.sql import Window

    g = list(group_cols)
    spark = digest.sparkSession
    d = digest.select(
        *g,
        "level",
        "cnt",
        F.expr(
            f"(idx + 1) * CAST(shiftleft(1, {levels} - level) AS BIGINT) - 1"
        ).alias("ub"),
    )
    w = (
        Window.partitionBy(*g) if g else Window
    ).orderBy(
        F.col("ub").asc(), F.col("level").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    dc = d.select(
        *g, "ub", F.sum("cnt").over(w).cast("bigint").alias("cum")
    )
    if g:
        n_row = digest.groupBy(*g).agg(
            F.coalesce(F.sum("cnt"), F.lit(0))
            .cast("bigint")
            .alias("__n")
        )
    else:
        n_row = digest.agg(
            F.coalesce(F.sum("cnt"), F.lit(0))
            .cast("bigint")
            .alias("__n")
        )
    qf = (
        spark.createDataFrame(
            [(int(q),) for q in q_ppms], "q_ppm bigint"
        )
        .crossJoin(F.broadcast(n_row))
        .select(
            *[F.col(c).alias(f"__g_{c}") for c in g],
            "q_ppm",
            F.expr(
                "CAST((q_ppm * __n + 999999) div 1000000 AS BIGINT)"
            ).alias("rank_target"),
        )
    )
    cond = F.col("cum") >= F.col("rank_target")
    for c in g:
        cond = cond & (F.col(c) == F.col(f"__g_{c}"))
    return (
        F.broadcast(qf)
        .join(dc, cond)
        .groupBy(
            *[
                F.col(f"__g_{c}").alias(c) for c in g
            ],
            "q_ppm",
            "rank_target",
        )
        .agg(F.min("ub").cast("bigint").alias("est"))
    )


def qdigest_sql(
    src_sql: str, value_expr: str, levels: int = 13, k: int = 32
) -> str:
    """DuckDB twin of :func:`qdigest_build` — the same unrolled
    level-by-level compression (the BPE unrolled-CTE discipline), so
    the digest STATE is value-verified node-for-node."""
    parts = [
        f"""__leaf AS MATERIALIZED (
  SELECT CAST({value_expr} AS BIGINT) AS idx,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({src_sql}) AS __src GROUP BY 1)""",
        f"""__tot AS MATERIALIZED (
  SELECT CAST(COALESCE(SUM(cnt), 0) // {k} AS BIGINT) AS T
  FROM __leaf)""",
        f"""__cur{levels} AS MATERIALIZED (
  SELECT idx, cnt, (SELECT T FROM __tot) AS T FROM __leaf)""",
    ]
    frz = []
    for lvl in range(levels, 0, -1):
        parts.append(
            f"""__par{lvl} AS MATERIALIZED (
  SELECT idx // 2 AS p, CAST(SUM(cnt) AS BIGINT) AS s, MAX(T) AS T
  FROM __cur{lvl} GROUP BY 1)"""
        )
        parts.append(
            f"""__frz{lvl} AS (
  SELECT {lvl} AS level, c.idx, c.cnt
  FROM __cur{lvl} c JOIN __par{lvl} p ON c.idx // 2 = p.p
  WHERE p.s > p.T AND c.cnt > 0)"""
        )
        parts.append(
            f"""__cur{lvl - 1} AS MATERIALIZED (
  SELECT p AS idx,
         CAST(CASE WHEN s <= T THEN s ELSE 0 END AS BIGINT) AS cnt,
         T
  FROM __par{lvl})"""
        )
        frz.append(f"SELECT level, idx, cnt FROM __frz{lvl}")
    frz.append(
        "SELECT 0 AS level, idx, cnt FROM __cur0 WHERE cnt > 0"
    )
    union = "\nUNION ALL\n".join(frz)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT CAST(level AS INT) AS level, idx, cnt FROM ({union}) AS __d"
    )


def qdigest_quantiles_sql(
    digest_sql: str, q_ppms: list[int], levels: int = 13
) -> str:
    """DuckDB twin of :func:`qdigest_quantiles` over a digest SQL."""
    qvals = ", ".join(f"({int(q)})" for q in q_ppms)
    return f"""
WITH __dig AS MATERIALIZED ({digest_sql}),
__d AS (
  SELECT cnt,
         (idx + 1) * CAST(1 << ({levels} - level) AS BIGINT) - 1 AS ub,
         level
  FROM __dig),
__dc AS MATERIALIZED (
  SELECT ub,
         CAST(SUM(cnt) OVER (ORDER BY ub, level DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM __d),
__n AS (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n FROM __dig),
__q(q_ppm) AS (VALUES {qvals}),
__r AS (
  SELECT CAST(q_ppm AS BIGINT) AS q_ppm,
         CAST((q_ppm * n + 999999) // 1000000 AS BIGINT)
           AS rank_target
  FROM __q CROSS JOIN __n)
SELECT r.q_ppm, r.rank_target, CAST(MIN(dc.ub) AS BIGINT) AS est
FROM __r r JOIN __dc dc ON dc.cum >= r.rank_target
GROUP BY 1, 2
"""
