"""C73 blocked record linkage / C74 Pareto-frontier selection:
hand semantics, valves, and DuckDB twin parity at sf0.01."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle
from umls2rdf_spark.functions.hashing import (
    stable_hash40,
    stable_hash40_sql,
)
from umls2rdf_spark.operators.linkage import (
    link_records,
    link_records_sql,
)
from umls2rdf_spark.operators.pareto import (
    pareto_front,
    pareto_front_sql,
)

SF_ORACLE = "/root/testdata/sf0.01"


def _recs(spark, rows):
    return spark.createDataFrame(rows, "rid bigint, name string")


def test_linkage_hand_semantics(spark):
    """A typo'd twin links (edit 1), an unrelated record does not,
    case/whitespace noise is normalized away, and a reordered-token
    exact pair scores jaccard 1.0 even at high edit distance when
    within max_edit."""
    recs = _recs(
        spark,
        [
            (1, "cold widget"),
            (2, "kold widget"),       # 1 edit, same block (widget)
            (3, "  COLD   WIDGET "),  # normalizes to rid 1's name
            (4, "steel hammer"),      # unrelated
        ],
    )
    got = {
        (r.id_a, r.id_b): (r.edit, r.jaccard_ppm)
        for r in link_records(recs, "rid", "name", max_edit=2).collect()
    }
    assert got == {
        (1, 2): (1, 333333),
        (1, 3): (0, 1000000),
        (2, 3): (1, 333333),
    }


def test_linkage_multi_pass_blocking_recall(spark):
    """A pair split by the first-token key still links through the
    last-token pass — and is scored ONCE despite sharing two
    blocks in other cases (pair dedup across passes)."""
    recs = _recs(
        spark,
        [
            (1, "alpha rotor"),
            (2, "alpfa rotor"),  # first tokens differ, last agree
            (3, "alpha rotor"),  # shares BOTH blocks with rid 1
        ],
    )
    rows = link_records(recs, "rid", "name", max_edit=2).collect()
    pairs = sorted((r.id_a, r.id_b) for r in rows)
    assert pairs == [(1, 2), (1, 3), (2, 3)]  # each exactly once


def test_linkage_block_valve_fails_closed(spark):
    """The in-plan valve kills the job at the oversized block's
    first emitted pair."""
    recs = _recs(spark, [(i, "same name") for i in range(50)])
    with pytest.raises(Exception, match="max_block"):
        link_records(recs, "rid", "name", max_block=10).collect()


def test_linkage_oracle_parity(spark, duck):
    from umls2rdf_spark.plans.completion import (
        _LINK_MAX_EDIT,
        _LINKAGE_SRC_SQL,
        _linkage_records_frame,
    )

    got = link_records(
        _linkage_records_frame(spark, SF_ORACLE),
        "p_partkey",
        "p_name",
        max_edit=_LINK_MAX_EDIT,
    )
    assert_matches_oracle(
        got,
        duck,
        link_records_sql(
            _LINKAGE_SRC_SQL, "p_partkey", "p_name", _LINK_MAX_EDIT
        ),
    )


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id bigint, q bigint, c bigint")


def test_pareto_hand_front(spark):
    """Equal-hi rows: the smaller lo dominates; duplicate points
    both survive; strict dominance on either axis removes."""
    pts = _pts(
        spark,
        [
            (1, 10, 5),  # dominated by 2 (same q, smaller c)
            (2, 10, 3),
            (3, 12, 7),
            (4, 8, 2),
            (5, 12, 7),  # duplicate of 3: both stay
            (6, 5, 1),
            (7, 4, 9),   # dominated by 6
        ],
    )
    got = sorted(
        (r.id, r.hi, r.lo)
        for r in pareto_front(
            pts, "id", F.col("q"), F.col("c"), shards=4
        ).collect()
    )
    assert got == [
        (2, 10, 3),
        (3, 12, 7),
        (4, 8, 2),
        (5, 12, 7),
        (6, 5, 1),
    ]


def test_pareto_shard_invariance(spark):
    """Local-front pruning is lossless: any shard count gives the
    identical global front (dominance transitivity)."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    lo = stable_hash40(F.col("doc_id").cast("string")) % 10000

    def front(s):
        return sorted(
            tuple(r)
            for r in pareto_front(
                docs, "doc_id", F.col("n_chars"), lo, shards=s
            ).collect()
        )

    one = front(1)
    assert one == front(7) == front(64)
    assert len(one) > 1


def test_pareto_validation_and_nulls(spark):
    with pytest.raises(ValueError, match="shards"):
        pareto_front(
            _pts(spark, [(1, 1, 1)]), "id", F.col("q"), F.col("c"), 0
        )
    pts = spark.createDataFrame(
        [(1, None, 5), (2, 4, 4)], "id bigint, q long, c long"
    )
    got = pareto_front(pts, "id", F.col("q"), F.col("c")).collect()
    assert [(r.id, r.hi, r.lo) for r in got] == [(2, 4, 4)]


def test_pareto_oracle_parity(spark, duck):
    from umls2rdf_spark.plans.completion import (
        _PARETO_RISK_MOD,
        _PARETO_SHARDS,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = pareto_front(
        docs,
        "doc_id",
        F.col("n_chars"),
        stable_hash40(F.col("doc_id").cast("string"))
        % _PARETO_RISK_MOD,
        shards=_PARETO_SHARDS,
    )
    assert_matches_oracle(
        got,
        duck,
        pareto_front_sql(
            "SELECT * FROM documents",
            "doc_id",
            "n_chars",
            f"({stable_hash40_sql('CAST(doc_id AS VARCHAR)')}) "
            f"% {_PARETO_RISK_MOD}",
            shards=_PARETO_SHARDS,
        ),
    )
