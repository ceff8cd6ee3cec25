"""AQE skew-join evidence: the runtime path we rely on at 100 TB for
JOIN skew actually fires, and the case where it cannot fire is
exactly why operators/skew.py ships deterministic salting for
AGGREGATION pipelines.

Two measured facts pinned here:

1. With a hot join key whose shuffle partition exceeds the skew
   threshold, AQE rewrites the sort-merge join to
   ``SortMergeJoin(skew=true)`` with a ``skewed`` AQEShuffleRead —
   the hot partition is split across tasks at runtime, no salting
   needed. (The payload must be incompressible: a constant-key
   partition of identical values LZ4-compresses below any realistic
   threshold and never registers as skewed — a subtle false-negative
   worth pinning.)
2. The same join under a downstream aggregation does NOT get the
   rewrite (splitting would break the join output's hash
   partitioning that the agg requires, and AQE refuses to add the
   extra shuffle unless forceOptimizeSkewedJoin). Skewed
   JOIN-then-AGG pipelines therefore need the explicit two-phase
   salted aggregation (skew_salted_agg) — runtime AQE alone does not
   cover them.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_frames(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    # incompressible payload: distinct per-row values, so the hot
    # partition's shuffle bytes reflect its row count
    payload = (F.col("id") * F.lit(2654435761)).bitwiseXOR(
        F.shiftleft(F.col("id"), 13)
    )
    left = (
        spark.range(0, 300000)
        .select(F.lit(0).alias("k"), payload.alias("v"))
        .union(
            spark.range(0, 5000).select(
                (F.col("id") % 50 + 1).alias("k"), payload.alias("v")
            )
        )
    )
    right = spark.range(0, 51).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    yield left, right
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_at_runtime(spark, skew_frames):
    left, right = skew_frames
    j = left.join(right, "k").select("k", "v", "w")
    n = len(j.collect())  # no downstream distribution requirement
    assert n == 305000
    plan = _executed(j)
    assert len(re.findall(r"skew=true", plan)) >= 1, plan[:1500]
    assert "skewed" in plan  # AQEShuffleRead … skewed


def test_downstream_agg_blocks_the_rewrite(spark, skew_frames):
    """count() plans an aggregate over the join output; AQE keeps the
    join's hash partitioning and declines the skew split — the
    documented reason skew_salted_agg exists."""
    left, right = skew_frames
    j = left.join(right, "k").select("k", "v", "w")
    assert j.count() == 305000
    assert "skew=true" not in _executed(j)
