"""D11 bucketed layout (sources/bucketed.py): the write-once /
join-shuffle-free contract, pinned at the plan level — the exact
fact that matters at 100 TB (a co-located fact-fact join must plan
ZERO Exchange; losing the bucket spec re-shuffles the full table
every run)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE
from umls2rdf_spark.sources.bucketed import read_bucketed, write_bucketed
from umls2rdf_spark.sources.parquet import load_table

N_BUCKETS = 8


@pytest.fixture()
def no_broadcast(spark):
    """Bucket-join planning is for fact-fact joins: disable the
    broadcast path so the small test tables plan like big ones."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _write_two_sides(spark, tmp_path):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    left = docs.select("doc_id", "source", "n_chars")
    right = docs.select("doc_id", "lang")
    write_bucketed(
        left, "t_bleft", "doc_id", N_BUCKETS,
        path=str(tmp_path / "bleft"), sort_cols="doc_id",
    )
    write_bucketed(
        right, "t_bright", "doc_id", N_BUCKETS,
        path=str(tmp_path / "bright"), sort_cols="doc_id",
    )
    return left, right


def test_bucketed_join_plans_zero_exchange(spark, tmp_path, no_broadcast):
    left, right = _write_two_sides(spark, tmp_path)
    joined = read_bucketed(spark, "t_bleft").join(
        read_bucketed(spark, "t_bright"), "doc_id"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # and the result is the same join computed from the raw frames
    expect = left.join(right, "doc_id")
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_unbucketed_side_still_shuffles(spark, tmp_path, no_broadcast):
    """Control: joining the bucketed table against a RAW frame plans
    an Exchange for the raw side only — proving the zero above comes
    from the bucket spec, not from the data being small."""
    _write_two_sides(spark, tmp_path)
    raw = load_table(spark, SF_DIR_ORACLE, "documents").select(
        "doc_id", "lang"
    )
    joined = read_bucketed(spark, "t_bleft").join(raw, "doc_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_path_read_forgets_bucketing(spark, tmp_path, no_broadcast):
    """The bucket spec lives in the catalog: reading the same files
    by path plans shuffles again — the reason read_bucketed goes
    through spark.table."""
    _write_two_sides(spark, tmp_path)
    by_path = spark.read.parquet(str(tmp_path / "bleft")).join(
        spark.read.parquet(str(tmp_path / "bright")), "doc_id"
    )
    plan = by_path._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_bucketed_groupby_on_key_plans_zero_exchange(
    spark, tmp_path, no_broadcast
):
    """Aggregation on the bucket key rides the same co-location."""
    _write_two_sides(spark, tmp_path)
    agg = (
        read_bucketed(spark, "t_bleft")
        .groupBy("doc_id")
        .agg(F.sum("n_chars").alias("s"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
