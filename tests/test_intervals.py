"""B44 interval overlap join: exactness vs the theta-join oracle,
anchor-bin dedup, endpoint semantics, the explode valve, and the
plan fact (equi-join on bin, never a nested-loop join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umls2rdf_spark.operators.intervals import (
    interval_overlap_join,
    interval_overlap_join_sql,
)


def _pairs(df):
    return sorted(
        (r[0], r[1], r[2], r[3]) for r in df.collect()
    )


def test_overlap_semantics_and_anchor_dedup(spark):
    """Closed-interval semantics (touching endpoints join) and ONE
    row per overlapping pair even when the overlap spans many bins."""
    left = spark.createDataFrame(
        [(1, 0, 100), (2, 200, 210), (3, 500, 500)],
        "lid int, s bigint, e bigint",
    )
    right = spark.createDataFrame(
        [
            (10, 100, 150),   # touches lid=1 at exactly 100
            (11, 0, 95),      # inside lid=1, spans 10 bins at W=10
            (12, 211, 220),   # just misses lid=2
            (13, 500, 500),   # point-on-point with lid=3
        ],
        "rid int, s bigint, e bigint",
    )
    got = interval_overlap_join(
        left, right, "lid", "s", "e", "rid", "s", "e", bin_width=10
    )
    assert _pairs(got) == [
        (1, 10, 100, 100),
        (1, 11, 0, 95),
        (3, 13, 500, 500),
    ]


def test_matches_theta_oracle_on_events(spark, duck):
    """The binned plan value-matches the direct theta join on the
    driver demo's incident-window shape."""
    from tests.conftest import assert_matches_oracle
    from umls2rdf_spark.plans.completion import (
        _range_join_frame,
        _range_join_sql,
    )
    from tests.conftest import SF_DIR_ORACLE

    got = _range_join_frame(spark, SF_DIR_ORACLE)
    assert got.count() > 0
    assert_matches_oracle(got, duck, _range_join_sql())


def test_max_bins_valve_raises(spark):
    """A degenerate interval (touching more bins than max_bins) must
    fail closed in-plan, not explode into millions of rows."""
    left = spark.createDataFrame(
        [(1, 0, 10_000)], "lid int, s bigint, e bigint"
    )
    right = spark.createDataFrame(
        [(2, 5, 6)], "rid int, s bigint, e bigint"
    )
    j = interval_overlap_join(
        left, right, "lid", "s", "e", "rid", "s", "e",
        bin_width=10, max_bins=64,
    )
    with pytest.raises(Exception, match="max_bins"):
        j.collect()


def test_plan_is_equi_join_not_nested_loop(spark):
    """The scale claim: the physical plan joins on the bin key
    (shuffle hash / sort-merge), never BroadcastNestedLoopJoin or
    CartesianProduct."""
    left = spark.range(100).select(
        F.col("id").alias("lid"),
        (F.col("id") * 100).alias("s"),
        (F.col("id") * 100 + 50).alias("e"),
    )
    right = spark.range(100).select(
        F.col("id").alias("rid"),
        (F.col("id") * 97).alias("s"),
        (F.col("id") * 97 + 10).alias("e"),
    )
    j = interval_overlap_join(
        left, right, "lid", "s", "e", "rid", "s", "e", bin_width=64
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan


def test_interval_x_interval_oracle_parity(spark, duck):
    """Interval-on-both-sides parity against the generic SQL twin on
    synthetic frames registered in DuckDB."""
    import pandas as pd
    from tests.conftest import assert_matches_oracle

    lrows = [(i, i * 37 % 1000, i * 37 % 1000 + 25) for i in range(80)]
    rrows = [(i, i * 53 % 1000, i * 53 % 1000 + 15) for i in range(80)]
    left = spark.createDataFrame(lrows, "lid int, ls bigint, le bigint")
    right = spark.createDataFrame(rrows, "rid int, rs bigint, re bigint")
    duck.register("__ivl_l", pd.DataFrame(lrows, columns=["lid", "ls", "le"]))
    duck.register("__ivl_r", pd.DataFrame(rrows, columns=["rid", "rs", "re"]))
    got = interval_overlap_join(
        left, right, "lid", "ls", "le", "rid", "rs", "re", bin_width=16
    )
    sql = interval_overlap_join_sql(
        "SELECT * FROM __ivl_l", "SELECT * FROM __ivl_r",
        "lid", "ls", "le", "rid", "rs", "re",
    )
    assert_matches_oracle(got, duck, sql)
    duck.unregister("__ivl_l")
    duck.unregister("__ivl_r")
