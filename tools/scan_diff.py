"""Print each UNFILTERED documents.parquet scan of a composed key
with its ReadSchema, so the section that gained/lost a scan can be
identified by the columns it reads. Run in two checkouts and diff.

Usage: python tools/scan_diff.py text_scoring [table-substr]
"""
from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(key: str, table: str) -> None:
    import __spark_entry__ as entrymod
    from umls2rdf_spark.plans.audit import explain_formatted
    from umls2rdf_spark.session import get_spark

    spark = get_spark(app_name="scan-diff", shuffle_partitions=8)
    df = entrymod.queries()[key](spark, "/root/testdata/sf0.001")
    text = explain_formatted(df)
    out = Counter()
    for m in re.finditer(r"\(\d+\) Scan parquet ?([^\n]*)", text):
        block = text[m.start():m.start() + 2000]
        loc = re.search(r"Location: \S+ \[([^\]]*)\]", block)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        part = re.search(r"PartitionFilters: \[([^\]]*)\]", block)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", block)
        locname = loc.group(1).rsplit("/", 1)[-1] if loc else ""
        if table not in locname:
            continue
        if (pushed and pushed.group(1)) or (part and part.group(1)):
            continue
        out[schema.group(1) if schema else "?"] += 1
    for sch, n in sorted(out.items()):
        print(f"{n} x <{sch}>")
    print("total unfiltered", table, "scans:", sum(out.values()))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "documents")
