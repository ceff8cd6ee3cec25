#!/usr/bin/env python
"""Per-stage trace of one warm execution of a declared query, via the
Spark event log: stage name, duration, task count — pinpoints WHICH
stages carry the per-stage overhead when a key's exec time is far
above its task work (guide §1/§7).

Usage: python tools/stage_trace.py key [key ...]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umls2rdf_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entrymod

    keys = sys.argv[1:] or ["dedup_embedding"]
    logdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = get_spark(
        app_name="umls2rdf-spark-stagetrace",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["q1_pricing_summary"](spark, SF_DIR).count()

    marks = {}
    for key in keys:
        fn = qs[key]
        fn(spark, SF_DIR).count()  # warmup
        df = fn(spark, SF_DIR)
        t0 = time.time()
        df.count()
        marks[key] = (t0, time.time())
        print(f"== {key}: exec {marks[key][1] - t0:.2f}s", flush=True)

    spark.stop()
    # parse the event log
    files = []
    for root, _dirs, names in os.walk(logdir):
        for f in names:
            if not f.startswith(".") and "appstatus" not in f:
                files.append(os.path.join(root, f))
    stages = []
    jobs = []
    tasks_run = []
    for path in files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    tm = ev.get("Task Metrics") or {}
                    ti = ev.get("Task Info") or {}
                    tasks_run.append(
                        (
                            ti.get("Launch Time", 0),
                            tm.get("Executor Run Time", 0),
                            tm.get("Executor CPU Time", 0) / 1e6,
                            tm.get("Executor Deserialize Time", 0),
                        )
                    )
                elif ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages.append(
                        (
                            si.get("Submission Time", 0),
                            si.get("Completion Time", 0),
                            si["Stage Name"],
                            si["Number of Tasks"],
                        )
                    )
                elif ev.get("Event") == "SparkListenerJobStart":
                    jobs.append(
                        (
                            ev.get("Submission Time", 0),
                            ev["Job ID"],
                            ev.get("Properties", {}).get(
                                "spark.job.description", ""
                            ),
                        )
                    )
    for key, (t0, t1) in marks.items():
        lo, hi = t0 * 1000, t1 * 1000
        sel = [s for s in stages if lo <= s[0] <= hi]
        tsel = [t for t in tasks_run if lo <= t[0] <= hi]
        print(
            f"   tasks={len(tsel)} sum runtime "
            f"{sum(t[1] for t in tsel)/1000:.2f}s cpu "
            f"{sum(t[2] for t in tsel)/1000:.2f}s deser "
            f"{sum(t[3] for t in tsel)/1000:.2f}s"
        )
        sel.sort(key=lambda s: -(s[1] - s[0]))
        njobs = len([j for j in jobs if lo <= j[0] <= hi])
        print(f"\n== {key}: {len(sel)} stages, {njobs} jobs in window")
        covered = sum(s[1] - s[0] for s in sel)
        print(f"   sum of stage walls {covered/1000:.2f}s")
        for sub, comp, name, ntasks in sel[:25]:
            print(f"   {(comp-sub)/1000:7.3f}s  tasks={ntasks:4d}  {name[:90]}")


if __name__ == "__main__":
    main()
