#!/usr/bin/env python
"""Per-section profiler for the composed fingerprint-union keys
(guide §1: measure first, isolate each expensive query).

Monkey-patches ``completion.fingerprint_section`` to capture every
(section, frame) pair while the composed demo builds, then times each
section's fingerprint frame individually (warmup + median-of-3
count(), the bench's own methodology), plus the plan-build and
planning cost of the full union.

Usage:
    python tools/profile_sections.py text_scoring [event_windows ...]

Writes a JSON report to /tmp/profile_<key>.json and a sorted table to
stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umls2rdf_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import umls2rdf_spark.plans.completion as completion
    import __spark_entry__ as entrymod

    keys = sys.argv[1:] or ["text_scoring"]
    spark = get_spark(
        app_name="umls2rdf-spark-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    for key in keys:
        captured: list[tuple[str, object]] = []
        orig = completion.fingerprint_section

        def wrapper(df, section, float_cols=(), _orig=orig, _cap=captured):
            out = _orig(df, section, float_cols)
            _cap.append((section, out))
            return out

        completion.fingerprint_section = wrapper
        try:
            t0 = time.perf_counter()
            full = qs[key](spark, SF_DIR)
            build_s = time.perf_counter() - t0
        finally:
            completion.fingerprint_section = orig

        # planning cost of the full union (analyze + optimize + plan)
        t0 = time.perf_counter()
        full._jdf.queryExecution().executedPlan()
        plan_s = time.perf_counter() - t0

        # full-union execution, bench methodology (warm + median of 3)
        spark.sparkContext.setJobDescription(f"profile: {key} full union")
        full.count()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            full.count()
            runs.append(time.perf_counter() - t0)
        full_s = sorted(runs)[1]

        per_section: dict[str, float] = {}
        for section, sdf in captured:
            spark.sparkContext.setJobDescription(f"profile: {key}/{section}")
            t0 = time.perf_counter()
            sdf.count()
            warm = time.perf_counter() - t0
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                sdf.count()
                runs.append(time.perf_counter() - t0)
            per_section[section] = round(min(runs + [warm]), 3)
        spark.sparkContext.setJobDescription(None)

        report = {
            "key": key,
            "sf_dir": SF_DIR,
            "build_s": round(build_s, 3),
            "plan_s": round(plan_s, 3),
            "full_union_median_s": round(full_s, 3),
            "n_sections": len(captured),
            "sections_sum_s": round(sum(per_section.values()), 3),
            "sections": dict(
                sorted(per_section.items(), key=lambda kv: -kv[1])
            ),
        }
        out_path = f"/tmp/profile_{key}.json"
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"== {key}: build {build_s:.2f}s  plan {plan_s:.2f}s  "
              f"full-union {full_s:.2f}s  ({len(captured)} sections, "
              f"sum-of-sections {report['sections_sum_s']:.2f}s)")
        for s, t in report["sections"].items():
            print(f"  {t:7.3f}s  {s}")
        print(f"-> {out_path}")


if __name__ == "__main__":
    main()
