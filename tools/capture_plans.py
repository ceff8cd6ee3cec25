#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into
plans/r09/<key>_<tag>.txt (guide §1: record the plan shape before and
after each optimization).

Usage:
    python tools/capture_plans.py before [key ...]
    python tools/capture_plans.py after  [key ...]

No args after the tag = all queries(). Also prints a one-line plan
summary (Exchange count, join strategies, Python eval nodes) per key.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umls2rdf_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r10"),
)


def plan_summary(text: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", text)),
        "SortMergeJoin": len(re.findall(r"\bSortMergeJoin\b", text)),
        "BroadcastHashJoin": len(re.findall(r"\bBroadcastHashJoin\b", text)),
        "ShuffledHashJoin": len(re.findall(r"\bShuffledHashJoin\b", text)),
        "BroadcastNestedLoopJoin": len(
            re.findall(r"\bBroadcastNestedLoopJoin\b", text)
        ),
        "BatchEvalPython": len(re.findall(r"\bBatchEvalPython\b", text)),
        "ArrowEvalPython": len(re.findall(r"\bArrowEvalPython\b", text)),
        "Scan parquet": len(re.findall(r"Scan parquet", text)),
        "Window": len(re.findall(r"^\s*[+:]?-? ?Window\b", text, re.M)),
    }
    return ", ".join(f"{k}={v}" for k, v in counts.items() if v)


def main() -> None:
    import __spark_entry__ as entrymod

    tag = sys.argv[1]
    keys = sys.argv[2:]
    spark = get_spark(
        app_name="umls2rdf-spark-plans",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(OUT_DIR, exist_ok=True)

    for name in keys or sorted(qs):
        df = qs[name](spark, SF_DIR)
        text = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"{name}: {plan_summary(text)}  -> {path}")


if __name__ == "__main__":
    main()
