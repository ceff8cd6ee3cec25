#!/usr/bin/env python
"""Count Spark jobs / stages / tasks one warm execution of a declared
query schedules (guide §1: know whether time is compute or per-stage
overhead — at sf0.1 a query that runs 40 jobs of 8 ms tasks is
scheduler-bound, and the fix is fewer exchanges/jobs, which is also
what a 100 TB run wants).

Usage: python tools/job_counts.py key [key ...]
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
        app_name="umls2rdf-spark-jobcounts",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    qs["q1_pricing_summary"](spark, SF_DIR).count()

    for key in keys:
        fn = qs[key]
        fn(spark, SF_DIR).count()  # warmup (bench methodology)
        df = fn(spark, SF_DIR)     # build OUTSIDE the measured group:
        group = f"jobcount-{key}"  # build-time jobs counted separately
        sc.setJobGroup(group, key)
        t0 = time.perf_counter()
        df.count()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        stages = 0
        tasks = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    stages += 1
                    tasks += si.numTasks
        print(
            f"== {key}: exec {wall:.2f}s  jobs={len(job_ids)} "
            f"stages={stages} tasks={tasks}"
        )


if __name__ == "__main__":
    main()
