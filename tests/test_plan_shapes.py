"""Physical-plan audits: the optimizations we rely on at 100 TB must
actually appear in the plans — pushed filters, pruned scans, broadcast
joins for dims, no Python row UDFs in relational paths."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 7 of 11 lineitem columns read — projection reaches the scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_filtered_scan_pushdown(spark):
    plan = plan_of(spark, "filtered_scan")
    assert "EqualTo(o_orderstatus,F)" in plan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan


def test_q5_broadcasts_dimensions(spark):
    plan = plan_of(spark, "q5_local_supplier")
    # all four dims broadcast; only orders⋈lineitem may shuffle
    assert plan.count("BroadcastHashJoin") >= 4


def test_q3_broadcasts_customer(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_semi_join_for_exists(spark):
    plan = plan_of(spark, "order_priority_count")
    assert "LeftSemi" in plan


def test_no_python_row_udfs_in_relational_queries(spark):
    # BatchEvalPython = row-at-a-time Python UDF — the slow path this
    # engine bans from relational plans (ann_lsh_topk is exempt: it is
    # deliberately Arrow-vectorized via mapInPandas/applyInPandas,
    # which shows as ArrowEvalPython/FlatMapGroupsInPandas, not this).
    for name in (
        "q1_pricing_summary", "ngram_jaccard", "text_scoring",
        "turtle_export", "text_features", "sessionize",
    ):
        assert "BatchEvalPython" not in plan_of(spark, name), name


def test_events_scan_prunes_columns(spark):
    plan = plan_of(spark, "sessionize")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in read_schema
    assert "event_type" not in read_schema


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """§6 made executable: co-bucketed tables join without a shuffle."""
    from pyspark.sql import functions as F

    from umls2rdf_spark.sources.bucketed import drop_table, write_bucketed
    from umls2rdf_spark.sources.parquet import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    write_bucketed(
        li.select("l_orderkey", "l_quantity"), "li_bucketed",
        ["l_orderkey"], 8, path=str(tmp_path / "li"),
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"), "orders_bucketed",
        ["o_orderkey"], 8, path=str(tmp_path / "ord"),
        sort_cols=["o_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so bucketing is what avoids the
        # shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_bucketed").join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        drop_table(spark, "li_bucketed")
        drop_table(spark, "orders_bucketed")


def test_set_ops_uses_semi_and_anti_joins(spark):
    """The composed set_ops demo must realize NOT EXISTS as a
    LeftAnti and the keep-set membership as a LeftSemi — never a
    materialized IN-list or cross product."""
    plan = plan_of(spark, "set_ops")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_grouping_sets_single_expand(spark):
    """All four grouping sets come from ONE Expand — the fact is read
    and shuffled once, never a Union of one aggregate per set."""
    plan = plan_of(spark, "grouping_sets")
    # formatted mode lists each node in the tree and again in the
    # details section → exactly one Expand node = 2 mentions
    assert plan.count("Expand") == 2, plan
    assert "Union" not in plan, plan


def test_histogram_has_no_percentile_buffer_agg(spark):
    """Exact quantiles come from per-VALUE counts + a cumulative-sum
    window (memory bounded by the cents domain), never Spark's
    percentile() aggregate, which buffers every group value in
    executor memory — an OOM on a billion-row bucket."""
    plan = plan_of(spark, "histogram")
    assert "percentile" not in plan.lower(), plan
    assert "Window" in plan, plan


def test_ann_lsh_salting_broadcasts_bucket_counts(spark):
    """Oversized-bucket salting joins the 2^planes-row count table as
    a broadcast — the featurized fact is never shuffled for it."""
    plan = plan_of(spark, "ann_lsh_topk")
    assert "BroadcastExchange" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_asof_merge_is_cogrouped_pandas_not_row_udf(spark):
    """The merge_asof scale path (no longer its own queries() key —
    asof_join auto-dispatches to it) stays a cogrouped-pandas plan."""
    from pyspark.sql import functions as F

    from umls2rdf_spark.operators.sessionize import asof_join_cogroup
    from umls2rdf_spark.sources.parquet import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    joined = asof_join_cogroup(
        ev, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_tiebreak="o_orderkey",
        right_cols=["o_orderkey", "o_orderdate"],
    )
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must broadcast — a sort-merge join
    here would shuffle the entire corpus shingle set at 100 TB."""
    from pyspark.sql import functions as F

    from umls2rdf_spark.operators.corpus import decontaminate
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.limit(5).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    flagged = decontaminate(
        docs, bench, "doc_id", "text", "bench_id", "text", shingle_n=5
    )
    plan = flagged._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "BroadcastHashJoin" in plan, plan


def test_pack_sequences_no_single_partition_on_corpus(spark):
    """Sequence packing must window per shard with the shards-row
    offset table broadcast — the only SinglePartition exchange
    allowed is the one over the tiny totals frame, never the corpus
    side (a global-order window would single-reduce 100 TB)."""
    plan = plan_of(spark, "corpus_prep")
    # the big-side cumsum is partitioned by the shard hash
    assert "hashpartitioning(__shard" in plan
    assert plan.count("SinglePartition") == 1
    assert plan.count("BroadcastHashJoin") >= 2  # offsets + bench side


def test_q17_single_fact_scan_with_broadcast_slice(spark):
    """The decorrelated Q17 plan: ONE pruned lineitem scan, the part
    slice broadcast, the per-part aggregate as a window — no second
    scan of the fact table for the correlated subquery."""
    from umls2rdf_spark.plans.tpch_extra import q17_small_quantity

    df = q17_small_quantity(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("lineitem.parquet") == 1, plan.count(
        "lineitem.parquet"
    )
    assert "BroadcastHashJoin" in plan
    import re

    # formatted mode mentions each node twice (tree + detail
    # section): exactly one Window NODE
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_q21_single_fact_scan_no_self_join(spark):
    """The decorrelated Q21 plan: the EXISTS / NOT EXISTS self-joins
    collapse into window aggregates over the per-(order, supplier)
    reduction — ONE lineitem scan, no join-back (the SQL form costs
    two full fact scans with no exchange reuse), supplier dim
    broadcast."""
    from umls2rdf_spark.plans.tpch_extra import q21_waiting_supplier

    df = q21_waiting_supplier(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("lineitem.parquet") == 1, plan.count(
        "lineitem.parquet"
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def _fmt_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_boilerplate_removal_broadcasts_frequent_set(spark):
    """remove_boilerplate_segments: the frequent-segment lookup
    carries NO broadcast hint (a boilerplate-heavy corpus can push
    the frequent set to corpus scale, where a forced broadcast would
    OOM) — instead AQE must convert the join to broadcast at runtime
    from the observed size in the common small-set case. Audit the
    FINAL adaptive plan after execution, and that no Python UDF
    appears anywhere."""
    from umls2rdf_spark.operators.corpus import remove_boilerplate_segments
    from umls2rdf_spark.sources.parquet import load_table

    df = remove_boilerplate_segments(
        load_table(spark, SF_DIR, "documents"), "doc_id", "text",
        segment_words=3, max_docs=5,
    )
    static = _fmt_plan(spark, df)
    assert "BatchEvalPython" not in static
    assert "ArrowEvalPython" not in static
    df.collect()  # finalize AQE so the runtime join strategy is real
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final, final
    assert "SortMergeJoin" not in final, final


def test_q11_q15_single_fact_scan_window_over_aggregate(spark):
    """Q11/Q15: the global scalar (total / max over the view) is a
    window over the ALREADY-AGGREGATED frame, so the fact table is
    scanned once — the SQL subquery form scans it twice."""
    from umls2rdf_spark.plans.tpch_rest import (
        q11_important_stock,
        q15_top_supplier,
    )

    for fn in (q11_important_stock, q15_top_supplier):
        plan = _fmt_plan(spark, fn(spark, SF_DIR))
        assert plan.count("lineitem.parquet") == 1, fn.__name__


def test_q20_single_fact_scan_conditional_agg(spark):
    """Q20: the correlated shipped-qty subquery collapses into one
    conditional aggregation — ONE lineitem scan, part slice and
    nation dim broadcast."""
    from umls2rdf_spark.plans.tpch_rest import q20_excess_availability

    plan = _fmt_plan(spark, q20_excess_availability(spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan


def test_tpch_rest_broadcast_dims(spark):
    """The TPC-H completion set must broadcast its dims — Q2's
    region-filtered supplier set, Q9's part slice + supplier-nation
    map, Q16's part slice and denylist — never sort-merge the fact
    against a dim."""
    from umls2rdf_spark.plans.tpch_rest import (
        q2_min_cost_supplier,
        q9_product_profit,
        q16_parts_supplier_cnt,
    )

    for fn, min_bc in (
        (q2_min_cost_supplier, 2),
        (q9_product_profit, 2),
        (q16_parts_supplier_cnt, 2),
    ):
        plan = _fmt_plan(spark, fn(spark, SF_DIR))
        assert plan.count("BroadcastHashJoin") >= min_bc, fn.__name__


def test_q13_outer_join_preserves_customer_side(spark):
    """Q13's zero-order bucket requires the LEFT OUTER join to
    preserve customers; the order-side filter must sit under the
    join (on the null-producing side), not above it."""
    from umls2rdf_spark.plans.tpch_rest import q13_order_distribution

    plan = _fmt_plan(spark, q13_order_distribution(spark, SF_DIR))
    assert "LeftOuter" in plan, plan


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    """Hive-partitioned layout (the 100 TB table organization): a
    predicate on the partition column must become a PartitionFilter —
    pruned at PLANNING time, non-matching directories never listed
    into the scan — and stay out of the data filters."""
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "by_lang")
    docs.write.partitionBy("lang").parquet(out)

    scan = spark.read.parquet(out).where(
        __import__("pyspark.sql.functions", fromlist=["col"]).col("lang")
        == "en"
    )
    plan = _fmt_plan(spark, scan)
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    # the scan reads only the en partition's files
    en_rows = docs.where(
        __import__("pyspark.sql.functions", fromlist=["col"]).col("lang")
        == "en"
    ).count()
    assert scan.count() == en_rows
    # note: DataFrame.inputFiles() reflects the UNPRUNED relation —
    # the PartitionFilters line above is the planning-time evidence


def test_plan_facts_api(spark):
    """plan_facts must report the structures the audits grep for:
    pruned scan columns + pushed filters on q1, broadcast joins on
    q5, zero Python row evals on both."""
    from umls2rdf_spark.plans.audit import plan_facts

    facts = plan_facts(
        entrymod.queries()["q1_pricing_summary"](spark, SF_DIR)
    )
    assert facts["scans"], facts
    assert facts["scans"][0]["read_columns"] is not None
    assert facts["scans"][0]["read_columns"] <= 7  # pruned projection
    assert facts["scans"][0]["pushed_filters"]
    assert facts["python_evals"] == 0
    assert facts["adaptive_pending"]  # AQE wraps; codegen ids later

    q5 = plan_facts(entrymod.queries()["q5_local_supplier"](spark, SF_DIR))
    assert q5["broadcast_joins"] >= 4
    assert q5["python_evals"] == 0

    # a non-adaptive plan (no exchange) exposes its codegen span ids
    from pyspark.sql import functions as F

    simple = spark.range(10).select((F.col("id") * 2).alias("x")).where(
        F.col("x") > 2
    )
    sf = plan_facts(simple)
    assert not sf["adaptive_pending"]
    assert sf["codegen_spans"] >= 1
