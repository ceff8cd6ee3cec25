"""PageRank (operators/graphrank.py) and HTML extraction
(operators/htmlextract.py): unit semantics + DuckDB-oracle value
equality — the round-6 web-curation additions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle
from umls2rdf_spark.operators.graphrank import (
    clickstream_edges,
    clickstream_edges_sql,
    pagerank,
    pagerank_sql,
)
from umls2rdf_spark.operators.htmlextract import (
    html_stats,
    html_stats_sql,
    html_text_expr,
    html_text_expr_sql,
    html_to_text,
)


# ── graphrank: unit semantics ───────────────────────────────────────
def test_clickstream_edges_lead_and_weights(spark):
    ev = spark.createDataFrame(
        [
            # user 1 visits a→b→a→b  (a→b twice, b→a once)
            (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
            # user 2 single event → no edge
            (2, 1, "c"),
        ],
        "user_id long, event_id long, page string",
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    edges = clickstream_edges(ev, F.col("page")).orderBy("src", "dst")
    rows = {(r.src, r.dst): r.w for r in edges.collect()}
    assert rows == {("a", "b"): 2, ("b", "a"): 1}


def test_pagerank_two_node_cycle_conserves_mass(spark):
    # a↔b symmetric cycle: ranks stay equal, total mass is conserved
    # up to the documented integer-floor loss per node per iteration
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], "src string, dst string, w long"
    )
    total = 10**12
    out = {r.node: r.rank_q for r in pagerank(edges, iters=3, total_q=total).collect()}
    assert out["a"] == out["b"]
    # divisible numbers → zero floor loss; never more than a few
    # mass units per node per iteration in any case
    assert 0 <= total - (out["a"] + out["b"]) < 100


def test_pagerank_sink_gets_more_than_source(spark):
    # star a→c, b→c, c→a: c accumulates both inflows, a gets c's,
    # b (no in-edges) bottoms out at the teleport base
    edges = spark.createDataFrame(
        [("a", "c", 1), ("b", "c", 1), ("c", "a", 1)],
        "src string, dst string, w long",
    )
    out = {r.node: r.rank_q for r in pagerank(edges, iters=5).collect()}
    assert out["c"] > out["a"] > out["b"]


def test_pagerank_dangling_mass_decays(spark):
    # b has no out-edges: its inflow leaks each round (documented
    # simplified semantics) so total mass strictly decreases
    edges = spark.createDataFrame(
        [("a", "b", 1)], "src string, dst string, w long"
    )
    total = 10**12
    out = pagerank(edges, iters=2, total_q=total).collect()
    assert sum(r.rank_q for r in out) < total


# ── graphrank: oracle equality on real events ───────────────────────
_NODE_SQL = "CAST(json_extract_string(props, '$.k') AS BIGINT)"


def test_pagerank_matches_oracle(spark, duck):
    ev = spark.read.parquet(f"{SF_DIR_ORACLE}/events.parquet")
    node = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    ranks = pagerank(clickstream_edges(ev, node), iters=3)
    sql = pagerank_sql(
        clickstream_edges_sql("SELECT * FROM events", _NODE_SQL), iters=3
    )
    assert_matches_oracle(ranks, duck, sql)


def test_pagerank_redistribute_conserves_mass_on_dangling_graph(spark):
    # chain a->b->c with c dangling: redistribute returns c's mass
    # each round, so total mass stays ~total_q while decay leaks
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], "src string, dst string, w long"
    )
    total = 10**12
    decay = sum(
        r.rank_q for r in pagerank(edges, iters=3, total_q=total).collect()
    )
    redis = sum(
        r.rank_q
        for r in pagerank(
            edges, iters=3, total_q=total, dangling="redistribute"
        ).collect()
    )
    assert decay < redis
    # conservation up to integer-floor loss (a few units per node
    # per round)
    assert total - redis < 1000


def test_pagerank_redistribute_matches_oracle(spark, duck):
    ev = spark.read.parquet(f"{SF_DIR_ORACLE}/events.parquet")
    node = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    # truncate the edge set to create REAL dangling nodes (drop all
    # out-edges of the largest src), then value-verify the
    # redistribute trajectory against the unrolled twin
    edges = clickstream_edges(ev, node)
    mx = edges.agg(F.max("src")).collect()[0][0]
    dangled = edges.where(F.col("src") != mx)
    ranks = pagerank(dangled, iters=3, dangling="redistribute")
    edges_sql = (
        "SELECT * FROM ("
        + clickstream_edges_sql("SELECT * FROM events", _NODE_SQL)
        + f") AS __e WHERE src != (SELECT MAX(src) FROM ("
        + clickstream_edges_sql("SELECT * FROM events", _NODE_SQL)
        + ") AS __m)"
    )
    sql = pagerank_sql(edges_sql, iters=3, dangling="redistribute")
    assert_matches_oracle(ranks, duck, sql)


def test_pagerank_ordering_insensitive_to_dangling_mode(spark):
    """The r6 VERDICT nit: the 'ordering is insensitive' claim,
    tested. On a click-shaped graph WITH dangling nodes, decay and
    redistribute produce the same rank ordering (redistribution adds
    a near-uniform term; ordering is driven by link structure)."""
    edges = spark.createDataFrame(
        [
            ("home", "a", 8), ("home", "b", 4), ("a", "b", 3),
            ("b", "home", 5), ("a", "sink1", 2), ("b", "sink2", 1),
            ("home", "sink1", 1),
        ],
        "src string, dst string, w long",
    )
    decay = {
        r.node: r.rank_q for r in pagerank(edges, iters=5).collect()
    }
    redis = {
        r.node: r.rank_q
        for r in pagerank(edges, iters=5, dangling="redistribute").collect()
    }
    order_d = sorted(decay, key=lambda n: (-decay[n], n))
    order_r = sorted(redis, key=lambda n: (-redis[n], n))
    assert order_d == order_r


def test_pagerank_dangling_flag_validated(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1)], "src string, dst string, w long"
    )
    with pytest.raises(ValueError):
        pagerank(edges, dangling="teleport")
    with pytest.raises(ValueError):
        pagerank_sql("SELECT 1", dangling="teleport")


# ── htmlextract: unit semantics ─────────────────────────────────────
_PAGE = (
    '<html><head><title>T</title><script>var a = 1 < 2;</script>'
    "<style>p{}</style></head><body><nav><a href='/'>Home</a></nav>"
    "<!-- hidden -->"
    "<h1>Title</h1><p>Q&amp;A &lt;tag&gt; &#39;x&#39;&nbsp;done</p>"
    "<p>double &amp;lt; stays</p>"
    "<footer>&copy; Co <A HREF='/y'>y</A></footer></body></html>"
)


def test_html_to_text_semantics(spark):
    df = spark.createDataFrame([(1, _PAGE)], "id long, html string")
    out = html_to_text(df, "html", "clean").head().clean
    # head (incl. title/script/style) gone, comments gone, entities
    # decoded, &amp;lt; -> literal "&lt;", unknown &copy; passes through
    assert out == (
        "Home Title Q&A <tag> 'x' done double &lt; stays &copy; Co y"
    )


def test_html_stats_counts(spark):
    df = spark.createDataFrame([(1, _PAGE)], "id long, html string")
    r = html_stats(df, "id", "html").head()
    assert r.n_links == 2  # <a href> and <A HREF>
    assert r.n_tags > 10
    assert 0 < r.visible_ratio_q < 1_000_000
    assert r.text_chars < r.html_chars


def test_html_case_insensitive_script_strip(spark):
    df = spark.createDataFrame(
        [(1, "<SCRIPT>bad()</SCRIPT>ok<BR>next")], "id long, html string"
    )
    assert html_to_text(df, "html").head().text == "ok next"


# ── htmlextract: oracle equality over wrapped real documents ────────
_WRAP_SPARK_PRE = (
    '<html><head><title>Doc</title><script>var k = 1 < 2;</script>'
    '</head><body><nav><a href="/">Home</a> <a href="/t">T&amp;M</a>'
    "</nav><p>"
)
_WRAP_SPARK_POST = (
    "</p><p>Q&amp;A &lt;ok&gt;&nbsp;end</p>"
    '<footer>&copy; 2026 <a href="/x">x</a></footer></body></html>'
)


def _wrapped_pages(spark):
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(_WRAP_SPARK_PRE), F.col("text"), F.lit(_WRAP_SPARK_POST)
        ).alias("html"),
    )


def _wrapped_pages_sql() -> str:
    pre = _WRAP_SPARK_PRE.replace("'", "''")
    post = _WRAP_SPARK_POST.replace("'", "''")
    return (
        f"SELECT doc_id, '{pre}' || text || '{post}' AS html "
        "FROM documents"
    )


def test_html_extract_matches_oracle(spark, duck):
    out = html_to_text(_wrapped_pages(spark), "html", "clean").select(
        "doc_id", "clean"
    )
    sql = (
        f"SELECT doc_id, {html_text_expr_sql('html')} AS clean "
        f"FROM ({_wrapped_pages_sql()}) AS p"
    )
    assert_matches_oracle(out, duck, sql)


def test_html_stats_matches_oracle(spark, duck):
    out = html_stats(_wrapped_pages(spark), "doc_id", "html")
    sql = html_stats_sql(_wrapped_pages_sql(), "doc_id", "html")
    assert_matches_oracle(out, duck, sql)


# ── B42 label propagation ───────────────────────────────────────────
def test_label_prop_two_communities(spark):
    """Two triangles joined by one weak bridge: each triangle
    converges to its own min-id label; the bridge does not merge
    them (internal weight dominates)."""
    from umls2rdf_spark.operators.graphrank import label_propagation

    tri1 = [(1, 2, 5), (2, 3, 5), (1, 3, 5)]
    tri2 = [(10, 11, 5), (11, 12, 5), (10, 12, 5)]
    bridge = [(3, 10, 1)]
    edges = spark.createDataFrame(
        tri1 + tri2 + bridge, "src long, dst long, w long"
    )
    got = {
        r.node: r.label
        for r in label_propagation(edges, iters=6).collect()
    }
    assert {got[1], got[2], got[3]} == {1}
    assert {got[10], got[11], got[12]} == {10}


def test_label_prop_matches_oracle(spark, duck):
    from umls2rdf_spark.plans.completion import (
        _label_prop_frame,
        _label_prop_sql,
    )

    got = _label_prop_frame(spark, SF_DIR_ORACLE)
    assert_matches_oracle(got, duck, _label_prop_sql())


def test_label_prop_python_replica(spark):
    """Synchronous LPA trajectory replicated in plain Python over a
    skew-ish random-shaped (but deterministic) graph."""
    from umls2rdf_spark.operators.graphrank import label_propagation

    raw = [
        (i % 13, (i * 7) % 13, 1 + (i % 3)) for i in range(40)
        if i % 13 != (i * 7) % 13
    ]
    edges = spark.createDataFrame(raw, "src long, dst long, w long")
    got = {
        r.node: r.label
        for r in label_propagation(edges, iters=3).collect()
    }

    # replica
    from collections import defaultdict

    sym = defaultdict(int)
    for s, d, w in raw:
        sym[(s, d)] += w
        sym[(d, s)] += w
    labels = {n: n for n, _ in sym}
    for _ in range(3):
        best = {}
        for (s, d), w in sym.items():
            lw = best.setdefault(s, defaultdict(int))
            lw[labels[d]] += w
        labels = {
            s: min(
                (l for l in lw if lw[l] == max(lw.values())),
            )
            for s, lw in best.items()
        }
    assert got == labels


def test_label_prop_round_is_sort_free_aggregation(spark):
    """The per-round adoption is a max_by argmax AGGREGATION (two
    hash aggs, map-side combined), not a sort-based window — pin no
    Window/WindowGroupLimit node in an un-checkpointed round plan."""
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1)], "src long, dst long, w long"
    )
    sym = (
        edges.union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    cand = (
        sym.join(labels, sym["dst"] == labels["node"])
        .groupBy("src", "label")
        .agg(F.sum("w").alias("lw"))
    )
    ord_key = F.struct(
        F.col("lw").alias("o1"), (-F.col("label")).alias("o2")
    )
    top1 = cand.groupBy("src").agg(
        F.max_by("label", ord_key).alias("label")
    )
    plan = top1._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


# ── B43 cohort retention ────────────────────────────────────────────
def test_cohort_retention_matches_oracle(spark, duck):
    from umls2rdf_spark.plans.completion import (
        _COHORT_SQL,
        _cohort_retention_frame,
    )

    got = _cohort_retention_frame(spark, SF_DIR_ORACLE)
    assert_matches_oracle(got, duck, _COHORT_SQL)


def test_cohort_retention_semantics(spark):
    """Hand-built cohorts: offset-0 row counts every cohort member;
    a user active on several days lands once per distinct day; a
    single-day user appears only at offset 0."""
    from datetime import datetime

    from umls2rdf_spark.plans.completion import _cohort_retention_frame

    rows = [
        # user 1: joins Jan 1, returns Jan 3 (twice that day)
        (1, datetime(2024, 1, 1, 9)), (1, datetime(2024, 1, 3, 9)),
        (1, datetime(2024, 1, 3, 18)),
        # user 2: joins Jan 1 only
        (2, datetime(2024, 1, 1, 12)),
        # user 3: joins Jan 2, returns Jan 3
        (3, datetime(2024, 1, 2, 8)), (3, datetime(2024, 1, 3, 8)),
    ]
    import os
    import tempfile

    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        # write the other tables the loader doesn't need — frame only
        from umls2rdf_spark.plans import completion

        got = {
            (str(r.cohort_day), r.offset_days): r.n_users
            for r in completion._cohort_retention_frame(
                spark, td
            ).collect()
        }
    assert got == {
        ("2024-01-01", 0): 2,   # users 1 and 2
        ("2024-01-01", 2): 1,   # user 1 back on day 3
        ("2024-01-02", 0): 1,   # user 3
        ("2024-01-02", 1): 1,   # user 3 back on day 3
    }
