from __future__ import annotations

import duckdb
import pytest

from umls2rdf_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="umls2rdf-spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the testdata tables registered as views —
    mirrors the driver's oracle harness."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    con = make_duck(SF_DIR_ORACLE)
    yield con
    con.close()


def assert_matches_oracle(spark_df, duck_con, sql: str):
    """Order-insensitive row/value comparison between a Spark result and
    the DuckDB oracle — the same bar the driver's t2 gate applies."""
    got = spark_df.toPandas()
    exp = duck_con.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    cols = sorted(got.columns)
    g = [tuple(str(v) for v in row) for row in got[cols].itertuples(index=False)]
    e = [tuple(str(v) for v in row) for row in exp[cols].itertuples(index=False)]
    assert sorted(g) == sorted(e), (
        f"value mismatch: spark={sorted(g)[:5]} oracle={sorted(e)[:5]} "
        f"(n_spark={len(g)}, n_oracle={len(e)})"
    )
