"""JDBC source — reference parity with umls2rdf's MySQL access.

The reference pages through MySQL with LIMIT/OFFSET on a single
connection (umls2rdf.py:228-259) — O(n^2) server work and one reader.
Spark's JDBC source instead issues ``partitionColumn`` range predicates
so N executors read N disjoint slices concurrently, and pushes WHERE
clauses server-side via the ``predicates``/``dbtable`` subquery.

Untestable in this container (no MySQL / JDBC driver jar) — the
construction is kept declarative and covered by a plan-shape unit test
only when a driver is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    where: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    driver: str = "com.mysql.cj.jdbc.Driver",
) -> DataFrame:
    """Parallel JDBC read of ``table`` (optionally filtered by ``where``).

    Equivalent of UmlsTable.scan(filt=...) (umls2rdf.py:228) but
    partitioned: each executor gets a bounded range of
    ``partition_column`` instead of the driver paging LIMIT/OFFSET.
    """
    dbtable = table if not where else f"(SELECT * FROM {table} WHERE {where}) t"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("fetchsize", "10000")
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1_000_000_000))
        )
    return reader.load()
