"""Bucketed table layout: the write-time co-location contract that
turns every downstream equi-join and aggregation ON THE BUCKET KEY
into a zero-shuffle operation.

Why this is a first-class capability at 100 TB: the engine's hot
keys (doc_id for dedup indexes and incremental-ingest anti-joins,
page/node ids for the graph ops, vec_id for the ANN code tables) are
joined again and again across a pipeline's life. A shuffle on a
100 TB fact table costs the full table over the network EVERY run;
writing the table bucketed by that key pays the shuffle ONCE at
write time and amortizes it over every later join/agg — Spark's
scan reports the bucket spec as its output partitioning, so the
planner drops both Exchange nodes when the join keys and bucket
counts line up (tests/test_bucketed.py pins exactly that plan fact).

Mechanics (native data-source bucketing, no Hive required):
``bucketBy(n, key)`` + ``saveAsTable`` records the bucket spec in
the session catalog; files are named by bucket id and each holds one
hash(key)-class of rows. ``sortBy`` additionally orders rows inside
each file, letting the SortMergeJoin skip its per-partition sort.
Bucket-join planning requires autoBroadcastJoinThreshold to lose to
the table size (or -1) — a broadcast beats co-location for dim
tables anyway; bucketing is for fact-fact joins.

Reference parity: none — the reference is a single-process exporter
(no storage layout at all). This is a 100 TB extension in the same
family as D6 (size-targeted writes) and D8 (Z-order clustering):
D6 bounds file sizes, D8 clusters for RANGE pruning, D11 co-locates
for JOIN locality. The three compose: a bucketed write can also be
sorted (sortBy) and size-capped (maxRecordsPerFile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) catalog
    table. ``path`` makes it an EXTERNAL table at that location —
    pass one in tests and pipelines that own their storage layout;
    omit it to use the session warehouse.

    ``num_buckets`` is the co-location contract: two tables join
    shuffle-free only when bucketed on the join key with the SAME
    bucket count. Pick it like a shuffle partition count for the
    table's full-size joins (SCALE.md: bytes-per-bucket ≈ executor
    task target, e.g. a 100 TB table at 256 MB/bucket-file-task →
    ~400k buckets is too many files; bucket at the JOIN parallelism
    you provision, e.g. 8-32k, and let maxRecordsPerFile split
    within buckets).
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    w = df.write.format(fmt).mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def drop_table(spark, table: str) -> None:
    """Drop a bucketed table from the session catalog (external data
    files are left in place — the catalog entry, not the data, is
    what ``write_bucketed`` owns for external tables)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def read_bucketed(spark, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucket
    spec only reaches the planner via the catalog — a plain
    ``spark.read.parquet(path)`` of the same files forgets it and
    re-shuffles)."""
    return spark.table(table)
