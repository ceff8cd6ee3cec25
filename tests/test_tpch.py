"""Oracle-parity tests for the headline query plans (SURVEY §2 B-block).

Runs each Spark plan and its DuckDB oracle SQL at sf0.01 — the same
comparison shape as the driver's t2 gate.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert qfn(spark, SF_DIR_ORACLE).count() >= 0
        return
    assert_matches_oracle(qfn(spark, SF_DIR_ORACLE), duck, sql)


@pytest.mark.parametrize(
    "name",
    sorted(
        __import__(
            "umls2rdf_spark.plans.tpch_extra", fromlist=["TESTS_ONLY_QUERIES"]
        ).TESTS_ONLY_QUERIES
    ),
)
def test_tests_only_query_matches_oracle(spark, duck, name):
    """Beyond-the-cap surface (correlated scalar subquery, semi-join
    HAVING): same oracle compare as the driver gate, run in-repo."""
    from umls2rdf_spark.plans.tpch_extra import (
        TESTS_ONLY_ORACLES,
        TESTS_ONLY_QUERIES,
    )

    assert_matches_oracle(
        TESTS_ONLY_QUERIES[name](spark, SF_DIR_ORACLE),
        duck,
        TESTS_ONLY_ORACLES[name],
    )
