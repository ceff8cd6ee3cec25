"""Triple generation and deduplication.

The reference emits (subject, predicate, object) triples imperatively
while string-building each class (toRDF, umls2rdf.py:391-490) and
dedupes them with a per-class Python set (umls2rdf.py:337-363,
DEDUPE_CLASS_TRIPLES). Spark shape: unpivot wide rows into a long
(s, p, o) relation with ``stack``, dedupe with ``dropDuplicates`` —
the seen-set becomes a hash aggregation that scales past RAM.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def triple_gen(
    df: DataFrame,
    subject: Column,
    predicates: Sequence[tuple[str, Column]],
) -> DataFrame:
    """Unpivot: one input row → one triple per (predicate, value) pair.

    Uses ``stack`` so the whole explosion stays in one codegen stage;
    null objects are dropped (the reference simply doesn't emit
    absent fields).
    """
    n = len(predicates)
    args: list[Column] = []
    for name, value in predicates:
        args.extend([F.lit(name), value.cast("string")])
    stacked = df.select(
        subject.cast("string").alias("subject"),
        F.stack(F.lit(n), *args).alias("predicate", "object"),
    )
    return stacked.where(F.col("object").isNotNull())


def dedupe_triples(triples: DataFrame) -> DataFrame:
    """Distinct (s,p,o) — the DEDUPE_CLASS_TRIPLES seen-set
    (umls2rdf.py:337-363) as a distributed hash aggregate. Partial
    (map-side) dedupe happens before the shuffle for free."""
    return triples.dropDuplicates(["subject", "predicate", "object"])
