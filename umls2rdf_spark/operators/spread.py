"""Gated input spreading for map-only featurize/shingle/decode paths.

Many operators start with embarrassingly-parallel per-row work
(quantize an embedding, shingle a document, decode an image) that
needs no co-location whatsoever. On local[32] reading one small
parquet file, the scan yields a single split, so that work would run
on one core — rounds 1-4 therefore opened these paths with an
unconditional ``repartition(id)``.

On a real cluster that unconditional exchange is the single most
expensive avoidable pass in the engine: a 100 TB scan already yields
~400k parallel splits (``files.maxPartitionBytes``), and the
repartition becomes a full all-to-all shuffle of the raw corpus
bytes/vectors *before* map work whose downstream groupBy shuffles the
(much smaller) featurized form anyway.

``spread_small_input`` keeps the local[32] behavior and removes the
cluster-scale shuffle: it repartitions ONLY when the observed scan
layout has fewer partitions than the session's default parallelism.
The check (``df.rdd.getNumPartitions()``) is a driver-side physical
plan inspection — no job runs.

Verified safe without the barrier: Spark's CollapseProject refuses to
inline non-cheap expressions referenced more than once (quantize /
shingle transforms stay materialized at their Project even with no
exchange between producer and the dim-subscript consumers — checked
against the optimized plan, round 5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_small_input(
    df: DataFrame,
    key,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Hash-repartition ``df`` by ``key`` only when its observed
    partition count is below the session's default parallelism
    (i.e. a small / single-file local read that would otherwise
    serialize map-only work on one core). No-op on any layout that
    already has enough splits — in particular every real multi-file
    cluster scan — so featurize paths carry no Exchange at scale.

    ``key`` is a column name or Column; hashing by the id keeps the
    spread deterministic-ish and skew-free for unique ids.

    Cost of the check itself: frames already downstream of a
    shuffle-producing node (join/aggregate/window/distinct/
    repartition) are detected from the ANALYZED logical plan — built
    eagerly at DataFrame creation, so that inspection is free — and
    skipped outright (their partitioning is the shuffle's, already
    parallel). Only plain scan/project/filter chains pay the
    physical-plan partition count, and a file scan's listing is
    cached by the relation.
    """
    spark = df.sparkSession
    if min_parallelism is None:
        try:
            min_parallelism = spark.sparkContext.defaultParallelism
        except Exception:
            # SparkSession.sparkContext itself raises on Spark
            # Connect — treat exactly like the missing-RDD-bridge
            # case below: no way to observe the layout, degrade to
            # the shuffle-detection fast path, else always-spread.
            min_parallelism = None
    try:
        analyzed = df._jdf.queryExecution().analyzed().toString()
        # match NODE names at their tree position (start of line
        # after the :/+/- prefix), not raw substrings — a column
        # named JoinKey or a literal 'WindowsCrawl' must not
        # misclassify a plain scan as already-shuffled
        import re

        if re.search(
            r"(?m)^[\s:+\-]*(Join|Aggregate|Window|Deduplicate|"
            r"Distinct|Repartition|RepartitionByExpression|Expand)\b",
            analyzed,
        ):
            return df
    except Exception:
        pass  # fall through to the partition-count check
    key_col = key if isinstance(key, Column) else F.col(key)
    try:
        if min_parallelism is None:
            raise RuntimeError("no parallelism probe (Connect)")
        if df.rdd.getNumPartitions() >= min_parallelism:
            return df
    except Exception:
        # No RDD bridge (Spark Connect) and no analyzed-plan probe
        # either: we cannot observe the layout, so degrade to the
        # always-spread behavior — correct everywhere, and the only
        # choice that can't serialize a single-split local read onto
        # one core.
        return df.repartition(key_col)
    # EXPLICIT partition count, not repartition(key): a keyed
    # repartition without a count is REPARTITION_BY_COL, which AQE's
    # partition coalescing is free to (and, for these byte-tiny
    # frames, always does) collapse back to ONE partition — the
    # event-log audit showed every spread site's downstream
    # shingle/hash/explode stage running as a single task behind an
    # ``AQEShuffleRead coalesced`` node, exactly the serialization
    # this helper exists to prevent. AQE sizes by bytes and cannot
    # see per-row CPU density; the explicit count is user intent it
    # must preserve. Only the gated small-input case ever reaches
    # this line, so the pinned width never applies to a real
    # cluster-scale scan.
    return df.repartition(min_parallelism, key_col)
