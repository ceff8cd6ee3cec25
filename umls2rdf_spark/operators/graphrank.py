"""Link-graph centrality for corpus curation: clickstream edge
derivation + distributed PageRank with engine-exact integer
arithmetic.

Why this lives in a training-data engine: graph centrality over the
link/click graph is a standard web-corpus QUALITY signal (Common
Crawl publishes harmonic-centrality host rankings; curation
pipelines weight or threshold documents by the rank of their source
host). The reference has no graph operator at all — its deepest
relational structure is the MRREL hierarchy walk
(``/root/reference/umls2rdf.py:679-770``), re-expressed here as
:func:`umls2rdf_spark.operators.hierarchy.transitive_closure`.
PageRank is the second iterative-fixpoint operator of the engine,
built on the same discipline: per-iteration
``localCheckpoint`` (lazy — the consumer's action materializes,
so each round costs its shuffle stages but no extra count job) to
truncate the otherwise
exponentially growing lineage.

Engine-exact semantics (the repo's int64 discipline): every rank is
a scaled BIGINT (``total_q`` mass units split across nodes), every
division is integer division (Spark ``div`` ≡ DuckDB ``//`` on
positive longs), so Spark and the DuckDB oracle agree bit-for-bit at
any scale — no float drift across iterations. Per-edge contribution
is ``(rank_q div out_w) * w`` (divide FIRST, then scale by the edge
weight): bounded by ``rank_q``, so the sum over a node's in-edges
can never overflow int64 even on mega-hub nodes, at the cost of
dropping at most ``out_w-1`` mass units per node per iteration —
deterministically, identically in both engines.

Dangling-node semantics are a FLAG (``dangling=``): the default
``"decay"`` lets dangling mass (nodes with no out-edges) leave the
system — the simplified variant, replicated exactly by the oracle;
``"redistribute"`` adds each round's dangling-rank sum back evenly
(standard PageRank) at the cost of one 1-row agg per round. Rank
*ordering* agreement between the two on click graphs is TESTED
(tests/test_graphrank.py), not asserted.

100 TB design: nodes and ranks are (node, rank_q) pairs — bytes per
node. One iteration = one join (edges ⋈ ranks on src) + one groupBy
(dst) + one left join back to nodes: two shuffles, both on node
keys, with the degree-annotated edge frame computed ONCE and
checkpointed, never per-iteration. Hub skew (one page with millions
of in-links) lands in the groupBy(dst) sum — a partial-aggregated
shuffle, the skew-tolerant shape (map-side combine collapses each
partition's contribution to one row per dst). AQE handles residual
reducer skew. Rank state is checkpointed per iteration, so the plan
depth is constant in the iteration count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def clickstream_edges(
    events: DataFrame,
    node: Column,
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Weighted page-transition edges from an event stream.

    Per user, order events by ``order_cols`` (the trailing unique id
    makes the order total — timestamp ties are routine in click
    data) and emit an edge from each event's page to the next one's;
    duplicate transitions collapse into an integer weight ``w``.
    One window shuffle (by user) + one groupBy — both partition on
    keys whose cardinality grows with the data, so the shape holds
    at crawl scale.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    paged = events.select(
        F.col(user_col), *[F.col(c) for c in order_cols],
        node.alias("src"),
    ).withColumn("dst", F.lead("src").over(w))
    return (
        paged.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    total_q: int = 10**12,
    dangling: str = "decay",
) -> DataFrame:
    """Fixed-iteration weighted PageRank, exact int64 arithmetic.

    ``edges``: (src, dst, w) with positive integer weights.
    Returns (node, rank_q): ``rank_q`` is the node's share of
    ``total_q`` mass units after ``iters`` rounds with teleport
    probability ``(100-damping_pct)%``.

    Update rule (all integer ops, oracle-identical):

        base      = ((100-d) * (total_q div N)) div 100
        contrib_v = Σ_{(u,v,w)} (rank_q(u) div out_w(u)) * w
        rank_q'_v = base + (d * contrib_v) div 100

    ``dangling`` picks the dangling-node (no out-edges) treatment:

    - ``"decay"`` (default): dangling mass is NOT redistributed — it
      leaves the system, the documented simplified variant;
    - ``"redistribute"``: standard PageRank — each round the summed
      rank of dangling nodes is split evenly (``dang_q div N``) and
      added to every node's contribution before damping. Costs one
      extra shuffle-free-broadcastable 1-row agg per round (the
      dangling-rank sum), inside the round's existing checkpoint.

    The degree-annotated edge frame and every iteration's rank frame
    are localCheckpoint'd (lazily) — same lineage discipline as
    ``transitive_closure`` (hierarchy.py:114): without it the rank
    plan references the previous iteration's plan once per term and
    grows without bound.
    """
    if dangling not in ("decay", "redistribute"):
        raise ValueError(f"dangling must be decay|redistribute, got {dangling!r}")
    edges = edges.select("src", "dst", F.col("w").cast("bigint"))
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    ew = edges.join(out_w, "src").localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # N and the per-node teleport base stay IN-PLAN (single-row agg
    # cross-joined onto the node frame — broadcast by size), attached
    # ONCE: the checkpointed node frame carries __n through every
    # iteration, so the loop adds no per-round broadcast or count.
    n_frame = nodes.agg(F.count(F.lit(1)).alias("__n"))
    nodes = (
        nodes.crossJoin(F.broadcast(n_frame))
        .localCheckpoint(eager=False)
    )
    teleport = F.expr(f"CAST({total_q} AS BIGINT) div __n")
    ranks = nodes.select("node", teleport.alias("rank_q"))
    d = damping_pct
    base = F.expr(
        f"CAST(({100 - d}) AS BIGINT) * (CAST({total_q} AS BIGINT) div __n) div 100"
    )
    dang_nodes = None
    if dangling == "redistribute":
        dang_nodes = (
            nodes.select("node")
            .join(
                edges.select(F.col("src").alias("node")).distinct(),
                "node",
                "left_anti",
            )
            .localCheckpoint(eager=False)
        )
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.expr("(rank_q div out_w) * w").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        joined = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        )
        if dang_nodes is not None:
            dang_q = (
                ranks.join(dang_nodes, "node", "semi")
                .agg(
                    F.coalesce(F.sum("rank_q"), F.lit(0))
                    .cast("bigint")
                    .alias("__dq")
                )
            )
            new_rank = base + F.expr(
                f"CAST({d} AS BIGINT) * (coalesce(contrib, "
                "CAST(0 AS BIGINT)) + (__dq div __n)) div 100"
            )
            joined = joined.crossJoin(F.broadcast(dang_q))
        else:
            new_rank = base + F.expr(
                f"CAST({d} AS BIGINT) * coalesce(contrib, "
                "CAST(0 AS BIGINT)) div 100"
            )
        ranks = joined.select(
            "node", new_rank.alias("rank_q")
        ).localCheckpoint(eager=False)
    return ranks.select("node", "rank_q")


def label_propagation(edges: DataFrame, iters: int = 4) -> DataFrame:
    """Fixed-iteration weighted label propagation (Raghavan et al.
    2007) over the symmetrized graph — community detection for the
    click/link graph: pages that share traffic converge to one
    label, giving the per-community caps / sampling strata that
    host-level grouping (webcurate C37) can't see when one logical
    site spans many hosts. Third iterative-fixpoint operator of the
    engine (transitive_closure, pagerank, this), same per-round
    ``localCheckpoint`` lineage discipline.

    Deterministic semantics (synchronous variant, value-verifiable):
    label₀(v) = v; each round every node adopts the label with the
    MAXIMUM incident edge-weight sum among its neighbors, ties
    broken by MIN label — both engines evaluate the identical
    (Σw DESC, label ASC) top-1, so the full trajectory is
    oracle-checkable. Synchronous LPA can oscillate on bipartite
    structures; with fixed ``iters`` and deterministic ties that is
    a defined, reproducible output (the async variant is not even
    deterministic run-to-run).

    100 TB shape: one round = one join (sym-edges ⋈ labels on dst) +
    one (node, label) map-side-combined groupBy + one per-node
    ``max_by`` argmax aggregation — TWO hash aggregations, no sort:
    the adoption rule (max lw, tie min label) is encoded as the
    orderable struct ``(lw, -label)`` so the per-node top-1 is a
    partial-aggregating groupBy rather than a window (a sort-based
    WindowGroupLimit would re-sort the candidate frame every round;
    max_by combines map-side like any agg — at sf0.1 the two forms
    tie on wall clock because per-round checkpoint latency
    dominates, but at scale the sort is the term that grows). All
    shuffles keyed on node ids; label state is (node, label) —
    16 bytes/node.
    """
    edges = edges.select("src", "dst", F.col("w").cast("bigint"))
    sym = (
        edges.union(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "w",
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    # labels₀ is consumed exactly once (round 1's join) — no
    # checkpoint: its lineage is one distinct over the checkpointed
    # sym frame, truncated at round 1's own checkpoint anyway
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    # (lw, -label) makes "max weight, tie → min label" a single
    # orderable key; labels are non-negative ids so -label is safe
    ord_key = F.struct(
        F.col("lw").alias("o1"), (-F.col("label")).alias("o2")
    )
    for _ in range(iters):
        cand = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src", "label")
            .agg(F.sum("w").alias("lw"))
        )
        labels = (
            cand.groupBy("src")
            .agg(F.max_by("label", ord_key).alias("label"))
            .select(F.col("src").alias("node"), "label")
            .localCheckpoint(eager=False)
        )
    return labels


def label_propagation_sql(edges_sql: str, iters: int = 4) -> str:
    """DuckDB twin of :func:`label_propagation`: the same fixed
    rounds unrolled as CTEs with the identical (Σw DESC, label ASC)
    ROW_NUMBER top-1 — the trajectory is value-verified round for
    round (the pagerank/Lloyd discipline)."""
    ctes = [
        f"__edges AS ({edges_sql})",
        """__sym AS (
  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w
  FROM (SELECT src, dst, CAST(w AS BIGINT) AS w FROM __edges
        UNION ALL
        SELECT dst AS src, src AS dst, CAST(w AS BIGINT) AS w
        FROM __edges) AS __u
  GROUP BY 1, 2)""",
        "__l0 AS (SELECT DISTINCT src AS node, src AS label FROM __sym)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""__c{i} AS (
  SELECT s.src, l.label, CAST(SUM(s.w) AS BIGINT) AS lw
  FROM __sym s JOIN __l{i - 1} l ON l.node = s.dst
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""__l{i} AS (
  SELECT src AS node, label FROM (
    SELECT src, label,
           ROW_NUMBER() OVER (
             PARTITION BY src ORDER BY lw DESC, label ASC) AS rn
    FROM __c{i}) AS __t
  WHERE rn = 1)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, label FROM __l{iters}"
    )


def clickstream_edges_sql(
    events_sql: str,
    node_expr: str,
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> str:
    """DuckDB twin of :func:`clickstream_edges` (LEAD over the same
    total order, identical weight aggregation)."""
    order = ", ".join(order_cols)
    return f"""
SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
FROM (
  SELECT {node_expr} AS src,
         LEAD({node_expr}) OVER (
           PARTITION BY {user_col} ORDER BY {order}
         ) AS dst
  FROM ({events_sql}) AS __ev
) AS __paged
WHERE dst IS NOT NULL
GROUP BY src, dst
"""


def pagerank_sql(
    edges_sql: str,
    iters: int = 5,
    damping_pct: int = 85,
    total_q: int = 10**12,
    dangling: str = "decay",
) -> str:
    """DuckDB twin of :func:`pagerank`: the same fixed iterations
    unrolled as chained CTEs, every arithmetic step the identical
    integer op (``//`` ≡ Spark ``div`` on positive BIGINTs), so the
    oracle value-verifies training dynamics, not just the final
    shape — same discipline as the Lloyd-iteration CTEs in
    plans/completion.py semantic_dedup. ``dangling`` mirrors the
    operator's flag (the redistribute variant adds the per-round
    dangling-rank sum CTE)."""
    if dangling not in ("decay", "redistribute"):
        raise ValueError(f"dangling must be decay|redistribute, got {dangling!r}")
    d = damping_pct
    ctes = [
        f"__edges AS ({edges_sql})",
        """__ew AS (
  SELECT src, dst, CAST(w AS BIGINT) AS w,
         SUM(CAST(w AS BIGINT)) OVER (PARTITION BY src) AS out_w
  FROM __edges)""",
        """__nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM __edges
    UNION ALL SELECT dst FROM __edges) AS __u)""",
        "__nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM __nodes)",
        f"""__r0 AS (
  SELECT node, CAST({total_q} AS BIGINT) // n AS rank_q
  FROM __nodes CROSS JOIN __nn)""",
    ]
    base = (
        f"(CAST({100 - d} AS BIGINT)"
        f" * (CAST({total_q} AS BIGINT) // __nn.n)) // 100"
    )
    for i in range(1, iters + 1):
        ctes.append(
            f"""__c{i} AS (
  SELECT e.dst AS node,
         CAST(SUM((r.rank_q // e.out_w) * e.w) AS BIGINT) AS contrib
  FROM __ew e JOIN __r{i - 1} r ON r.node = e.src
  GROUP BY e.dst)"""
        )
        if dangling == "redistribute":
            ctes.append(
                f"""__d{i} AS (
  SELECT CAST(COALESCE(SUM(r.rank_q), 0) AS BIGINT) AS dq
  FROM __r{i - 1} r
  WHERE NOT EXISTS (SELECT 1 FROM __edges e WHERE e.src = r.node))"""
            )
            ctes.append(
                f"""__r{i} AS (
  SELECT n.node,
         CAST({base} + (CAST({d} AS BIGINT)
                   * (COALESCE(c.contrib, CAST(0 AS BIGINT))
                      + (__d{i}.dq // __nn.n))) // 100
           AS BIGINT) AS rank_q
  FROM __nodes n CROSS JOIN __nn CROSS JOIN __d{i}
  LEFT JOIN __c{i} c ON c.node = n.node)"""
            )
        else:
            ctes.append(
                f"""__r{i} AS (
  SELECT n.node,
         CAST({base} + (CAST({d} AS BIGINT)
                   * COALESCE(c.contrib, CAST(0 AS BIGINT))) // 100
           AS BIGINT) AS rank_q
  FROM __nodes n CROSS JOIN __nn
  LEFT JOIN __c{i} c ON c.node = n.node)"""
            )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, rank_q FROM __r{iters}"
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, n_tri): per-node triangle counts — the local clustering
    signal (spam link-farms and scraper rings close triangles;
    organic browsing graphs are locally tree-ish), and the classic
    join-skew benchmark.

    Algorithm: degree-ordered wedge closing (Latapy's
    compact-forward / the standard MapReduce formulation, Suri &
    Vassilvitskii 2011). The graph is made UNDIRECTED and simple
    (canonical a<b pairs, self-loops dropped, weights ignored); each
    edge is then ORIENTED from the endpoint with smaller (degree,
    node) rank to the larger. Every triangle has exactly one node
    whose two incident edges both point away (the smallest-rank
    vertex), so counting wedges u→v, u→w (rank v < rank w) closed by
    v→w counts each triangle exactly ONCE — no /3 correction, no
    duplicate elimination shuffle.

    Why orientation matters at 100 TB: raw wedge enumeration is
    Σ deg(u)² — a single celebrity hub with 10M neighbors yields
    10^14 wedges. Orientation caps the out-degree of every node at
    O(√m) (a node keeps only edges toward HIGHER-degree endpoints),
    so wedges total O(m^1.5) worst-case and hot hubs become wedge
    CENTERS of tiny out-degree instead of wedge factories. The two
    joins key on node ids (AQE skew-split territory for what skew
    remains); the closing join is a semi-join against the oriented
    edge list itself.

    Output has one row per node appearing in ≥1 triangle (each
    triangle credits all three corners).
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    # total order: (degree, node) — deterministic, engine-neutral
    ranked = (
        und.join(deg.withColumnRenamed("n", "a"), "a")
        .withColumnRenamed("d", "da")
        .join(
            deg.withColumnRenamed("n", "b").withColumnRenamed(
                "d", "db"
            ),
            "b",
        )
    )
    fwd = F.col("da") < F.col("db")
    tie = (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    oriented = ranked.select(
        F.when(fwd | tie, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd | tie, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd | tie, F.col("da")).otherwise(F.col("db")).alias(
            "du"
        ),
        F.when(fwd | tie, F.col("db")).otherwise(F.col("da")).alias(
            "dv"
        ),
    )
    e1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = e1.join(e2, "u").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"]).select("u", "x", "y")
    corners = (
        tris.select(F.col("u").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tri")
    )


def triangle_counts_sql(
    edges_sql: str, src: str = "src", dst: str = "dst"
) -> str:
    """DuckDB twin of :func:`triangle_counts` — identical
    canonicalization, (degree, node) orientation and wedge-closing
    join."""
    return f"""
WITH __und AS MATERIALIZED (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM ({edges_sql}) AS __e
  WHERE {src} <> {dst}),
__deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT a AS n FROM __und
        UNION ALL SELECT b AS n FROM __und) AS __ns
  GROUP BY 1),
__ori AS MATERIALIZED (
  SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
         CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v,
         CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS dv
  FROM (SELECT e.a, e.b, d1.d AS da, d2.d AS db
        FROM __und e
        JOIN __deg d1 ON e.a = d1.n
        JOIN __deg d2 ON e.b = d2.n) AS __r),
__tri AS (
  SELECT w1.u, w1.v AS x, w2.v AS y
  FROM __ori w1
  JOIN __ori w2 ON w1.u = w2.u
   AND (w1.dv < w2.dv OR (w1.dv = w2.dv AND w1.v < w2.v))
  JOIN __ori c ON c.u = w1.v AND c.v = w2.v)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
FROM (SELECT u AS node FROM __tri
      UNION ALL SELECT x AS node FROM __tri
      UNION ALL SELECT y AS node FROM __tri) AS __c
GROUP BY 1
"""


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, degree, converged): the subgraph remaining after
    ``rounds`` of k-core peeling — repeatedly delete nodes of degree
    < k from the canonical undirected simple graph (self-loops and
    duplicate directions collapse first). Peeling is monotone, so if
    a round deletes nothing the result IS the exact k-core and every
    row carries ``converged = true``; otherwise rows carry false and
    the caller adds rounds (the fixed-iteration PageRank/LPA
    discipline: a data-independent round count keeps the oracle an
    unrolled-CTE twin, and the convergence FLAG makes the
    approximation explicit instead of silent).

    k-core completes the graph-hygiene set (B41 centrality, B42
    communities, B47 triangles): coreness separates crawl-graph hubs
    with real interconnection from star-shaped spam (high degree,
    k-core 1), and "peel to the 2-core" is the standard prune before
    expensive triangle/community passes.

    Per round: one map-side-combined degree count + two semi-joins
    of the edge frame against the ≤|nodes| survivor frame, then a
    localCheckpoint — plan depth stays linear in rounds, and each
    round's frames shrink monotonically. At 100 TB the first round
    dominates (full edge frame); every later round touches only
    surviving edges."""
    if k < 1 or rounds < 1:
        raise ValueError(f"kcore: need k >= 1 and rounds >= 1")
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur = und
    dropped_last = None
    for _ in range(rounds):
        deg = (
            cur.select(F.col("a").alias("n"))
            .unionByName(cur.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("n")
        nxt = (
            cur.join(keep.withColumnRenamed("n", "a"), "a", "semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "semi")
            .localCheckpoint(eager=False)
        )
        dropped_last = cur.count() - nxt.count()
        cur = nxt
    deg = (
        cur.select(F.col("a").alias("node"))
        .unionByName(cur.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return deg.select(
        "node", "degree", F.lit(dropped_last == 0).alias("converged")
    )


def kcore_sql(
    edges_sql: str,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> str:
    """DuckDB twin of :func:`kcore` — the peel rounds unrolled as
    CTEs (the pagerank_sql discipline), with the converged flag
    computed from the last round's edge counts."""
    parts = [
        f"""__e0 AS (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM ({edges_sql}) AS __raw
  WHERE {src} <> {dst})"""
    ]
    for r in range(rounds):
        parts.append(f"""__k{r} AS (
  SELECT n FROM (
    SELECT n, CAST(COUNT(*) AS BIGINT) AS d
    FROM (SELECT a AS n FROM __e{r}
          UNION ALL SELECT b AS n FROM __e{r}) AS __ns{r}
    GROUP BY 1) AS __d{r}
  WHERE d >= {k})""")
        parts.append(f"""__e{r + 1} AS (
  SELECT e.a, e.b FROM __e{r} e
  WHERE e.a IN (SELECT n FROM __k{r})
    AND e.b IN (SELECT n FROM __k{r}))""")
    last, prev = rounds, rounds - 1
    joined = ",\n".join(parts)
    return f"""
WITH {joined},
__conv AS (
  SELECT (SELECT COUNT(*) FROM __e{last})
       = (SELECT COUNT(*) FROM __e{prev}) AS converged)
SELECT node, CAST(COUNT(*) AS BIGINT) AS degree,
       (SELECT converged FROM __conv) AS converged
FROM (SELECT a AS node FROM __e{last}
      UNION ALL SELECT b AS node FROM __e{last}) AS __fin
GROUP BY 1
"""


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> DataFrame:
    """(node, dist, converged): multi-source weighted shortest paths
    by ``rounds`` of Bellman-Ford relaxation over the directed
    weighted edge frame — distances are exact for every node within
    ``rounds`` hops of a source (Bellman-Ford's invariant), and if a
    round improves nothing the frontier is exhausted and every
    distance is globally exact, reported by ``converged = true``
    (the kcore/PageRank fixed-rounds discipline: data-independent
    round counts keep the oracle an unrolled-CTE twin, and the flag
    makes under-iteration loud instead of silent).

    ``sources`` is a (node) frame of zero-distance seeds —
    multi-source by construction, which is the curation shape
    ("hops from any seed domain" as a crawl-frontier quality
    signal); weights must be nonnegative ints (min-plus over int64:
    no floats, engine-exact).

    Per round: one equi-join of the current ≤|nodes| distance frame
    against the edge frame on ``src`` (the only edge-frame-sized
    op), one map-side-combined ``groupBy(node).min(dist)``, one
    localCheckpoint to keep plan depth linear. Unreached nodes stay
    absent (no +inf sentinels to overflow). At 100 TB the join
    partitions on src — a natural bucketing key (D11) that makes
    every round's shuffle a bucket-local merge."""
    if rounds < 1:
        raise ValueError("shortest_paths: rounds must be >= 1")
    cur = (
        sources.select(
            F.col("node").cast("bigint").alias("node"),
            F.lit(0).cast("bigint").alias("dist"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = cur
    for _ in range(rounds):
        relax = cur.join(
            edges, cur["node"] == edges[src], "inner"
        ).select(
            edges[dst].alias("node"),
            (cur["dist"] + edges[w].cast("bigint")).alias("dist"),
        )
        nxt = (
            cur.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .localCheckpoint(eager=False)
        )
        prev, cur = cur, nxt
    changed = cur.join(prev, ["node", "dist"], "left_anti").count()
    return cur.select(
        "node", "dist", F.lit(changed == 0).alias("converged")
    )


def shortest_paths_sql(
    edges_sql: str,
    sources_sql: str,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> str:
    """DuckDB twin of :func:`shortest_paths` — the relaxation rounds
    unrolled as CTEs, converged = last round added/improved nothing
    vs the one before."""
    parts = [
        f"""__se AS MATERIALIZED (
  SELECT {src} AS src, {dst} AS dst, CAST({w} AS BIGINT) AS w
  FROM ({edges_sql}) AS __raw)""",
        f"""__d0 AS (
  SELECT DISTINCT CAST(node AS BIGINT) AS node,
         CAST(0 AS BIGINT) AS dist
  FROM ({sources_sql}) AS __seeds)""",
    ]
    for r in range(rounds):
        parts.append(f"""__d{r + 1} AS (
  SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM __d{r}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM __d{r} d JOIN __se e ON d.node = e.src
  ) AS __relax{r} GROUP BY 1)""")
    last, prev = rounds, rounds - 1
    joined = ",\n".join(parts)
    return f"""
WITH {joined},
__conv AS (
  SELECT COUNT(*) = 0 AS converged FROM __d{last} n
  WHERE NOT EXISTS (SELECT 1 FROM __d{prev} p
                    WHERE p.node = n.node AND p.dist = n.dist))
SELECT node, dist, (SELECT converged FROM __conv) AS converged
FROM __d{last}
"""
