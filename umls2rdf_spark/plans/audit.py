"""Structured physical-plan inspection — the programmatic form of the
checks tests/test_plan_shapes.py asserts.

At 100 TB a wrong plan shape costs hours before it costs a wrong
answer, so the properties worth CI-gating are facts about the
physical plan: did the filter reach the scan, did the dim broadcast,
did a Python eval sneak into a relational path, how many exchanges.
``plan_facts`` extracts those as data; pipelines can assert on them
the way this repo's tests do, without string-grepping explain output
themselves.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted explain string (same text ``.explain("formatted")``
    prints) without capturing stdout."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def plan_facts(df: DataFrame) -> dict:
    """Facts about the physical plan, as data:

    - ``scans``: per file scan — location tail, pushed filters,
      partition filters, read-schema column count
    - ``exchanges``: shuffle count (Exchange nodes)
    - ``broadcast_joins`` / ``sort_merge_joins`` /
      ``nested_loop_joins``: join strategy counts
    - ``python_evals``: Batch/ArrowEvalPython nodes (row-path Python)
    - ``pandas_udfs``: mapInPandas/cogroup nodes (Arrow batch path)
    - ``codegen_spans``: WholeStageCodegen regions
    """
    text = explain_formatted(df)
    # node names appear once in the tree and once in the detail
    # section — count tree occurrences only (lines like "(3) Node")
    tree_nodes = re.findall(r"\(\d+\) ([A-Za-z]+)", text)
    from collections import Counter

    nodes = Counter(tree_nodes)
    scans = []
    for m in re.finditer(r"\(\d+\) Scan parquet ?([^\n]*)", text):
        detail_start = text.find(m.group(0), m.start())
        block = text[detail_start:detail_start + 2000]
        loc = re.search(r"Location: \S+ \[([^\]]*)\]", block)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        part = re.search(r"PartitionFilters: \[([^\]]*)\]", block)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", block)
        n_cols = (
            len([c for c in schema.group(1).split(",") if ":" in c])
            if schema
            else None
        )
        scans.append(
            {
                "location": (loc.group(1).rsplit("/", 1)[-1] if loc else ""),
                "pushed_filters": (pushed.group(1) if pushed else ""),
                "partition_filters": (part.group(1) if part else ""),
                "read_columns": n_cols,
            }
        )
    return {
        "scans": scans,
        "exchanges": nodes.get("Exchange", 0),
        "broadcast_joins": nodes.get("BroadcastHashJoin", 0),
        "sort_merge_joins": nodes.get("SortMergeJoin", 0),
        "nested_loop_joins": nodes.get("BroadcastNestedLoopJoin", 0),
        "python_evals": nodes.get("BatchEvalPython", 0)
        + nodes.get("ArrowEvalPython", 0),
        "pandas_udfs": nodes.get("MapInPandas", 0)
        + nodes.get("FlatMapGroupsInPandas", 0)
        + nodes.get("FlatMapCoGroupsInPandas", 0),
        # formatted mode annotates nodes with [codegen id : N] instead
        # of WholeStageCodegen wrapper nodes. Under AQE the annotation
        # exists only once the plan is FINAL (post-execution / no
        # AdaptiveSparkPlan wrapper) — a pre-execution adaptive plan
        # reports 0 here, not "no codegen".
        "codegen_spans": len(
            set(re.findall(r"\[codegen id : (\d+)\]", text))
        ),
        "adaptive_pending": "isFinalPlan=false" in text,
    }
