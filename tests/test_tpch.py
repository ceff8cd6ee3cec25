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
