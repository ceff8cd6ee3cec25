#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count-materialized) after a
warmup of the session; per-query wall time includes planning.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from umls2rdf_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Bench every declared query (the full SURVEY §2 inventory) so the
# recorded numbers cover the whole surface, not a cherry-picked set.
BENCH_QUERIES: list[str] | None = None  # None → all queries()


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="umls2rdf-spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Warm the JVM/session so the first measured query doesn't pay
    # one-time init costs.
    qs["q1_pricing_summary"](spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES or sorted(qs):
        fn = qs[name]
        # one warmup run per query: first execution pays one-time
        # plan-analysis/codegen-compile costs (~1s measured on a
        # trivial 2-shuffle query); the steady-state run is what
        # scales with data size.
        fn(spark, SF_DIR).count()
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
