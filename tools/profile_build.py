#!/usr/bin/env python
"""Plan-BUILD attribution for the composed fingerprint-union keys
(guide §1: measure first; §7.3: driver-side latency).

Runs the key's section builders SERIALLY (monkey-patching
``completion._build_sections``), timing each builder and counting the
py4j round-trips it issues — plan construction is driver-side latency,
so (wall, round-trips) per builder says exactly which factories are
worth rewriting to emit fewer Column-graph operations.

Usage:
    python tools/profile_build.py text_scoring [event_windows ...]

Writes /tmp/build_<key>.json and a sorted table to stdout.
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

_CALLS = {"n": 0}


def _patch_py4j() -> None:
    import py4j.java_gateway as jg

    orig = jg.GatewayClient.send_command

    def counted(self, *a, **kw):
        _CALLS["n"] += 1
        return orig(self, *a, **kw)

    jg.GatewayClient.send_command = counted
    try:
        import py4j.clientserver as cs

        if cs.JavaClient.send_command is not counted:
            orig_cs = cs.JavaClient.send_command

            def counted_cs(self, *a, **kw):
                _CALLS["n"] += 1
                return orig_cs(self, *a, **kw)

            cs.JavaClient.send_command = counted_cs
    except Exception:
        pass


def main() -> None:
    _patch_py4j()
    import umls2rdf_spark.plans.completion as completion
    import __spark_entry__ as entrymod

    keys = sys.argv[1:] or ["text_scoring"]
    spark = get_spark(
        app_name="umls2rdf-spark-profile-build",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # serial _build_sections with per-builder attribution; the section
    # name is taken from the last fingerprint_section call the builder
    # makes (pre-phase builders get a positional label)
    records: list[dict] = []
    last_section = {"name": None}
    orig_fp = completion.fingerprint_section

    def fp_wrapper(df, section, float_cols=()):
        last_section["name"] = section
        return orig_fp(df, section, float_cols)

    def serial_build(builders):
        out = []
        for i, b in enumerate(builders):
            last_section["name"] = None
            c0, t0 = _CALLS["n"], time.perf_counter()
            out.append(b())
            dt = time.perf_counter() - t0
            records.append(
                {
                    "section": last_section["name"] or f"<pre-{i}>",
                    "wall_s": round(dt, 3),
                    "py4j_calls": _CALLS["n"] - c0,
                }
            )
        return out

    warm = "--warm" in keys
    keys = [k for k in keys if k != "--warm"]
    if warm:
        # one full normal construction + execution first, so the
        # serial attributed build below measures the WARM cost the
        # bench's repeated calls actually pay
        for key in keys:
            qs[key](spark, SF_DIR).count()
    completion.fingerprint_section = fp_wrapper
    completion._build_sections = serial_build
    try:
        for key in keys:
            records.clear()
            c0, t0 = _CALLS["n"], time.perf_counter()
            qs[key](spark, SF_DIR)
            build_s = time.perf_counter() - t0
            calls = _CALLS["n"] - c0
            out = {
                "key": key,
                "build_s": round(build_s, 3),
                "py4j_calls": calls,
                "builders": sorted(
                    records, key=lambda r: -r["wall_s"]
                ),
            }
            path = f"/tmp/build_{key}.json"
            with open(path, "w") as fh:
                json.dump(out, fh, indent=1)
            print(
                f"== {key}: serial build {build_s:.2f}s, "
                f"{calls} py4j round-trips, {len(records)} builders"
            )
            for r in out["builders"][:30]:
                print(
                    f"  {r['wall_s']:7.3f}s  {r['py4j_calls']:6d} rt  "
                    f"{r['section']}"
                )
            print(f"-> {path}")
    finally:
        completion.fingerprint_section = orig_fp


if __name__ == "__main__":
    main()
