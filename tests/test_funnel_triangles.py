"""B46 ordered funnel / B47 triangle counting: hand-built semantics
(strict ordering, greedy-earliest exactness, orientation count-once)
and oracle parity on the real events table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umls2rdf_spark.operators.funnel import (
    funnel_counts,
    funnel_counts_sql,
)
from umls2rdf_spark.operators.graphrank import (
    clickstream_edges,
    clickstream_edges_sql,
    triangle_counts,
    triangle_counts_sql,
)
from tests.conftest import SF_DIR, make_duck

STEPS = ["signup", "click", "purchase"]


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )


def test_funnel_strict_ordering(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # u1 completes all three in order
        (1, "signup", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # u2 clicked BEFORE signing up -> stops at step 1
        (2, "click", t(1)), (2, "signup", t(2)),
        # u3 same-timestamp click (NOT strictly after) -> stops at 1
        (3, "signup", t(5)), (3, "click", t(5)),
        # u4 never signed up -> not even step 1
        (4, "click", t(1)), (4, "purchase", t(2)),
    ]
    got = {
        r.step: r.n_users
        for r in funnel_counts(
            _ev(spark, rows), "user_id", "event_type", "ts", STEPS
        ).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1}


def test_funnel_greedy_earliest_is_exact(spark):
    """u1's FIRST click is before the purchase; a non-greedy choice
    of the later click would also work — greedy must not lose the
    conversion, and the early-click-then-signup red herring must not
    create one."""
    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    rows = [
        (1, "click", t(1)),  # pre-signup click: unusable
        (1, "signup", t(2)),
        (1, "click", t(3)),
        (1, "purchase", t(4)),
    ]
    got = {
        r.step: r.n_users
        for r in funnel_counts(
            _ev(spark, rows), "user_id", "event_type", "ts", STEPS
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_funnel_rejects_bad_steps(spark):
    df = _ev(spark, [])
    with pytest.raises(ValueError, match="non-empty"):
        funnel_counts(df, "user_id", "event_type", "ts", [])
    with pytest.raises(ValueError, match="duplicate"):
        funnel_counts(
            df, "user_id", "event_type", "ts", ["a", "b", "a"]
        )


def test_funnel_oracle_parity(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = sorted(
        tuple(r)
        for r in funnel_counts(
            ev, "user_id", "event_type", "ts", STEPS
        ).collect()
    )
    con = make_duck(SF_DIR)
    try:
        want = sorted(
            tuple(r)
            for r in con.execute(
                funnel_counts_sql(
                    "SELECT * FROM events", "user_id", "event_type",
                    "ts", STEPS,
                )
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src bigint, dst bigint, w bigint"
    )


def test_triangle_hand_graph(spark):
    # K4 minus one edge = two triangles sharing edge (1,2);
    # a self-loop and a reverse duplicate must not change anything
    pairs = [
        (1, 2), (2, 3), (1, 3), (1, 4), (2, 4),
        (2, 1),  # reverse duplicate
        (3, 3),  # self-loop
    ]
    got = {
        r.node: r.n_tri
        for r in triangle_counts(_edges(spark, pairs)).collect()
    }
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_free_graph(spark):
    got = triangle_counts(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])  # 4-cycle
    ).collect()
    assert got == []


def test_triangle_oracle_parity_clickstream(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    node = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    got = sorted(
        tuple(r)
        for r in triangle_counts(clickstream_edges(ev, node)).collect()
    )
    con = make_duck(SF_DIR)
    try:
        esql = clickstream_edges_sql(
            "SELECT * FROM events",
            "CAST(json_extract_string(props, '$.k') AS BIGINT)",
        )
        want = sorted(
            tuple(r)
            for r in con.execute(triangle_counts_sql(esql)).fetchall()
        )
    finally:
        con.close()
    assert got == want
    assert sum(r[1] for r in got) % 3 == 0  # 3 corner credits each
    assert len(got) > 0


# ── k-core peeling (B48) ─────────────────────────────────────────────
def test_kcore_hand_graph(spark):
    """Triangle survives the 2-core; a pendant chain and a star
    (high-degree hub, no interconnection) peel away entirely —
    including the CASCADE: removing leaves strands the hub."""
    from umls2rdf_spark.operators.graphrank import kcore

    pairs = [
        (1, 2), (2, 3), (1, 3),          # triangle: the 2-core
        (3, 4),                          # pendant
        (5, 6), (5, 7), (5, 8),          # star
        (2, 1), (3, 3),                  # reverse dup + self-loop
    ]
    got = {
        r.node: (r.degree, r.converged)
        for r in kcore(_edges(spark, pairs), 2, 3).collect()
    }
    assert got == {1: (2, True), 2: (2, True), 3: (2, True)}


def test_kcore_convergence_flag(spark):
    """A long chain peels one node per round from each end: with too
    few rounds the flag is false, with enough it flips true and the
    result is the exact (empty) 2-core."""
    from umls2rdf_spark.operators.graphrank import kcore

    chain = [(i, i + 1) for i in range(9)]
    partial = kcore(_edges(spark, chain), 2, 2).collect()
    assert partial and all(not r.converged for r in partial)
    full = kcore(_edges(spark, chain), 2, 6).collect()
    assert full == []  # a path has no 2-core


def test_kcore_oracle_parity_clickstream(spark):
    from umls2rdf_spark.operators.graphrank import kcore, kcore_sql

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    node = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    got = sorted(
        tuple(r)
        for r in kcore(clickstream_edges(ev, node), 14, 4).collect()
    )
    con = make_duck(SF_DIR)
    try:
        esql = clickstream_edges_sql(
            "SELECT * FROM events",
            "CAST(json_extract_string(props, '$.k') AS BIGINT)",
        )
        want = sorted(
            tuple(r)
            for r in con.execute(kcore_sql(esql, 14, 4)).fetchall()
        )
    finally:
        con.close()
    assert got == want
    # k=14 at sf0.001 genuinely peels (12 of 100 nodes survive)
    assert 0 < len(got) < 100


def test_kcore_validation(spark):
    import pytest as _pytest

    from umls2rdf_spark.operators.graphrank import kcore

    with _pytest.raises(ValueError, match="kcore"):
        kcore(_edges(spark, [(1, 2)]), 0, 3)


def _wedges(spark, triples):
    return spark.createDataFrame(
        list(triples), "src bigint, dst bigint, w bigint"
    )


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node bigint")


def test_sssp_hand_graph(spark):
    """Weighted relaxation beats hop count: 1->2->3 (1+1) undercuts
    the direct 1->3 (5); unreached nodes are absent, directed edges
    are NOT traversed backwards."""
    from umls2rdf_spark.operators.graphrank import shortest_paths

    g = _wedges(
        spark,
        [(1, 2, 1), (2, 3, 1), (1, 3, 5), (4, 1, 2), (9, 8, 1)],
    )
    got = {
        r.node: (r.dist, r.converged)
        for r in shortest_paths(g, _nodes(spark, [1]), 4).collect()
    }
    # 4 points INTO 1 (not reachable); island 9->8 untouched
    assert got == {1: (0, True), 2: (1, True), 3: (2, True)}


def test_sssp_convergence_flag(spark):
    """A weighted chain needs length-many rounds: under-iteration
    reports converged=False with hop-exact prefix distances."""
    from umls2rdf_spark.operators.graphrank import shortest_paths

    chain = _wedges(spark, [(i, i + 1, 2) for i in range(6)])
    part = {
        r.node: (r.dist, r.converged)
        for r in shortest_paths(chain, _nodes(spark, [0]), 2).collect()
    }
    assert part == {0: (0, False), 1: (2, False), 2: (4, False)}
    full = {
        r.node: (r.dist, r.converged)
        for r in shortest_paths(chain, _nodes(spark, [0]), 7).collect()
    }
    assert full == {i: (2 * i, True) for i in range(7)}


def test_sssp_multi_source_min(spark):
    """Two seeds: every node takes the cheaper source."""
    from umls2rdf_spark.operators.graphrank import shortest_paths

    chain = _wedges(spark, [(i, i + 1, 1) for i in range(5)])
    got = {
        r.node: r.dist
        for r in shortest_paths(
            chain, _nodes(spark, [0, 4]), 5
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 0, 5: 1}


def test_sssp_oracle_parity_clickstream(spark):
    from umls2rdf_spark.operators.graphrank import (
        shortest_paths,
        shortest_paths_sql,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    node = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    edges = clickstream_edges(ev, node)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % 17 == 0)
    )
    got = sorted(
        tuple(r) for r in shortest_paths(edges, seeds, 3).collect()
    )
    con = make_duck(SF_DIR)
    try:
        esql = clickstream_edges_sql(
            "SELECT * FROM events",
            "CAST(json_extract_string(props, '$.k') AS BIGINT)",
        )
        ssql = (
            "SELECT DISTINCT node FROM ("
            f"SELECT src AS node FROM ({esql}) "
            f"UNION ALL SELECT dst FROM ({esql})) WHERE node % 17 = 0"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                shortest_paths_sql(esql, ssql, 3)
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want and len(got) > 0


def test_sssp_validation(spark):
    from umls2rdf_spark.operators.graphrank import shortest_paths

    with pytest.raises(ValueError, match="rounds"):
        shortest_paths(
            _wedges(spark, [(1, 2, 1)]), _nodes(spark, [1]), 0
        )
