#!/usr/bin/env python
"""Warm-call attribution for declared queries: per bench methodology
(same session, repeated fn(spark, SF_DIR).count()), split each warm
call into plan-BUILD wall (the queries() builder call) and EXECUTE
wall (the count action). Guide §1: measure the thing the bench times.

Usage: python tools/warm_split.py text_scoring [event_windows ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umls2rdf_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entrymod

    keys = sys.argv[1:] or ["text_scoring"]
    spark = get_spark(
        app_name="umls2rdf-spark-warmsplit",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["q1_pricing_summary"](spark, SF_DIR).count()

    for key in keys:
        fn = qs[key]
        fn(spark, SF_DIR).count()  # warmup, as the bench does
        builds, execs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b = sorted(builds)[1]
        e = sorted(execs)[1]
        print(
            f"== {key}: warm build {b:.2f}s  warm exec {e:.2f}s  "
            f"(total {b + e:.2f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
