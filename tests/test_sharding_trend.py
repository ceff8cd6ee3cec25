"""C75 rendezvous shard assignment / B51 grouped OLS trend: the HRW
movement contracts (the reason the operator exists), hand-exact
slopes, and DuckDB twin parity."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle
from umls2rdf_spark.operators.regression import (
    grouped_trend,
    grouped_trend_sql,
)
from umls2rdf_spark.operators.sharding import (
    rendezvous_assign,
    rendezvous_assign_sql,
)

SF_ORACLE = "/root/testdata/sf0.01"


def _ids(spark):
    return (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id")
    )


def _assign(spark, shards):
    return {
        r.doc_id: r.shard
        for r in rendezvous_assign(_ids(spark), "doc_id", shards).collect()
    }


def test_rendezvous_add_shard_minimal_movement(spark):
    """Growing the cluster moves keys ONLY into the new shard, at
    roughly 1/(S+1) of the keyspace — the property key-mod-S lacks
    (mod reassigns ~everything)."""
    s5 = [f"s{i}" for i in range(5)]
    before = _assign(spark, s5)
    after = _assign(spark, s5 + ["s5"])
    moved = {k for k in before if before[k] != after[k]}
    assert all(after[k] == "s5" for k in moved)
    frac = len(moved) / len(before)
    assert 0.05 < frac < 0.35  # ~1/6 expected


def test_rendezvous_remove_shard_relocates_only_its_keys(spark):
    s5 = [f"s{i}" for i in range(5)]
    before = _assign(spark, s5)
    after = _assign(spark, [s for s in s5 if s != "s2"])
    for k in before:
        if before[k] != "s2":
            assert after[k] == before[k]
        else:
            assert after[k] != "s2"


def test_rendezvous_balance_and_determinism(spark):
    shards = [f"n{i}" for i in range(8)]
    a = _assign(spark, shards)
    assert a == _assign(spark, shards)  # pure function of (key, shards)
    counts = Counter(a.values())
    assert set(counts) == set(shards)
    assert max(counts.values()) < 2.5 * min(counts.values())


def test_rendezvous_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        rendezvous_assign(_ids(spark), "doc_id", [])
    with pytest.raises(ValueError, match="duplicate"):
        rendezvous_assign(_ids(spark), "doc_id", ["a", "a"])


def test_rendezvous_oracle_parity(spark, duck):
    shards = [f"s{i}" for i in range(5)]
    got = rendezvous_assign(_ids(spark), "doc_id", shards)
    assert_matches_oracle(
        got,
        duck,
        "SELECT doc_id, "
        + rendezvous_assign_sql("doc_id", shards)
        + " FROM documents",
    )


def test_trend_hand_exact_slopes(spark):
    """y = 3x+1 gives exactly 3·scale; a negative trend keeps its
    sign under the sign-split division; constant x is degenerate
    (NULL slope, flagged) — never silently zero."""
    pts = spark.createDataFrame(
        [
            ("up", 0, 1), ("up", 1, 4), ("up", 2, 7),
            ("down", 0, 0), ("down", 1, -2), ("down", 2, -4),
            ("flat_x", 5, 9), ("flat_x", 5, 11),
        ],
        "g string, x long, y long",
    )
    got = {
        r.g: (r.n, r.slope_q, r.degenerate)
        for r in grouped_trend(pts, "g", F.col("x"), F.col("y")).collect()
    }
    assert got == {
        "up": (3, 3_000_000, False),
        "down": (3, -2_000_000, False),
        "flat_x": (2, None, True),
    }


def test_trend_truncation_toward_zero_both_signs(spark):
    """slope 1/3 and -1/3: the sign-split division truncates the
    MAGNITUDE in both engines (−333333, not −333334)."""
    pts = spark.createDataFrame(
        [("p", 0, 0), ("p", 3, 1), ("n", 0, 0), ("n", 3, -1)],
        "g string, x long, y long",
    )
    got = {
        r.g: r.slope_q
        for r in grouped_trend(pts, "g", F.col("x"), F.col("y")).collect()
    }
    assert got == {"p": 333_333, "n": -333_333}


def test_trend_oracle_parity(spark, duck):
    from umls2rdf_spark.plans.completion import _TREND_ANCHOR

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    got = grouped_trend(
        ev,
        "event_type",
        F.unix_timestamp("ts").cast("bigint") - _TREND_ANCHOR,
        F.floor(F.col("value") * 1_000_000),
    )
    assert_matches_oracle(
        got,
        duck,
        grouped_trend_sql(
            "SELECT * FROM events",
            "event_type",
            f"(epoch_us(ts) // 1000000) - {_TREND_ANCHOR}",
            "FLOOR(value * 1000000)",
        ),
    )
