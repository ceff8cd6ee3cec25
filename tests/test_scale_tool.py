"""tools/scale_oracle.py is itself part of the evidence chain (the
10x tables in SCALE.md come from it), so its replica construction and
compare logic are suite-covered here on a tiny 2x replica."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")

from scale_oracle import (  # noqa: E402
    KEY_OFFSET,
    build_replica,
    frame_facts,
)

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replica(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("rep"))
    build_replica(SRC, dst, copies=2, perturb_docs=True)
    return dst


def test_replica_keys_shifted_consistently(replica):
    con = duckdb.connect()
    # row counts double for fact tables, dims stay single-copy
    for t, mult in [("lineitem", 2), ("orders", 2), ("documents", 2),
                    ("nation", 1), ("region", 1)]:
        n_src = con.execute(
            f"SELECT COUNT(*) FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        n_dst = con.execute(
            f"SELECT COUNT(*) FROM '{replica}/{t}.parquet'"
        ).fetchone()[0]
        assert n_dst == mult * n_src, t
    # referential consistency survives the shift: every copy-1
    # lineitem orderkey exists in copy-1 orders
    orphans = con.execute(f"""
        SELECT COUNT(*) FROM '{replica}/lineitem.parquet' l
        WHERE l.l_orderkey >= {KEY_OFFSET}
          AND NOT EXISTS (SELECT 1 FROM '{replica}/orders.parquet' o
                          WHERE o.o_orderkey = l.l_orderkey)
    """).fetchone()[0]
    assert orphans == 0


def test_perturbed_docs_have_unique_tails(replica):
    con = duckdb.connect()
    # every doc text is globally unique (per-row tail), and the tail
    # tokens encode the SHIFTED doc_id
    dup, total = con.execute(f"""
        SELECT COUNT(*) - COUNT(DISTINCT text), COUNT(*)
        FROM '{replica}/documents.parquet'
    """).fetchone()
    assert dup == 0 and total > 0
    bad = con.execute(f"""
        SELECT COUNT(*) FROM '{replica}/documents.parquet'
        WHERE text NOT LIKE '%ua' || CAST(doc_id AS VARCHAR) || '%'
    """).fetchone()[0]
    assert bad == 0


def test_compare_logic_on_two_keys(spark, replica):
    """The gate's own compare (frame_facts both sides) goes green on
    a replica for two fast keys — the same code path the 10x tables
    in SCALE.md were produced by."""
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{replica}/{t}.parquet'"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for key in ("histogram", "skew_salted_agg"):
        df = qs[key](spark, replica)
        s_n, s_names, s_hash = frame_facts(
            df.columns, [tuple(r) for r in df.collect()]
        )
        rel = con.execute(oracles[key])
        o_cols = [d[0] for d in rel.description]
        o_n, o_names, o_hash = frame_facts(o_cols, rel.fetchall())
        assert (s_n, s_names, s_hash) == (o_n, o_names, o_hash), key
