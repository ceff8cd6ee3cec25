"""Text-format corpus sources: JSON-lines and CSV ingest, plus the
size-targeted parquet writer for the other end of the pipeline.

Training corpora arrive as JSONL/CSV shards far more often than as
parquet; both readers here follow the engine's scan rules:

- EXPLICIT schema, always. Schema inference is a full extra pass over
  the data before the real one — a non-starter at 100 TB — and it
  lets a single malformed shard silently retype a column for the
  whole read.
- Malformed rows are quarantined, not fatal and not silently dropped:
  PERMISSIVE mode routes them to a corrupt-record column the caller
  can count/inspect, so a bad shard surfaces as data instead of
  killing a 1000-executor job hours in.
- Both formats are splittable line-based reads (multiLine stays
  off): executors take file splits directly, no single-node ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields)
        + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSON-lines with a declared schema.

    Rows that fail to parse (or violate the schema) land with every
    data column null and the raw line in ``_corrupt_record``. By
    default they are dropped AFTER being countable
    (``keep_corrupt=True`` returns them for quarantine/inspection —
    filter on ``_corrupt_record IS NOT NULL``). Note Spark's rule for
    raw JSON/CSV scans: a plan referencing ONLY the corrupt column is
    rejected — select at least one data column alongside it (or
    cache the parsed frame) when auditing quarantined rows.
    """
    df = (
        spark.read.format("json")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(_with_corrupt(schema))
        .load(path)
    )
    if keep_corrupt:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read CSV with a declared schema — same quarantine contract as
    :func:`read_jsonl`."""
    df = (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(_with_corrupt(schema))
        .load(path)
    )
    if keep_corrupt:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_file_mb: int = 256,
    sample_rows: int = 1000,
    mode: str = "error",
) -> int:
    """Write parquet with output files near ``target_file_mb`` — the
    small-files defense for the 100 TB write path.

    A naive ``df.write`` emits one file per task: after a wide
    shuffle that is `spark.sql.shuffle.partitions` files per write
    (tiny files — metadata pressure, slow listings, poor scan
    granularity on re-read); after a narrow scan it can be multi-GB
    files that kill read parallelism. This writer bounds file size
    from ABOVE with ``maxRecordsPerFile`` — computed from a
    driver-side sample's average encoded row width (a bounded
    ``limit(sample_rows)`` collect, never a full pass) — so oversized
    tasks split their output, and from BELOW by letting AQE's
    partition coalescing merge undersized shuffle outputs upstream.

    Returns the records-per-file cap used. Parquet's own columnar
    encoding compresses below the pickled-row estimate, so files land
    under the target rather than over it — the safe side for scans.
    """
    sample = df.limit(sample_rows).collect()
    if not sample:
        df.write.mode(mode).parquet(path)
        return 0
    import pickle

    avg_row = max(
        1, sum(len(pickle.dumps(r.asDict())) for r in sample) // len(sample)
    )
    per_file = max(1, (target_file_mb * 1024 * 1024) // avg_row)
    (
        df.write.option("maxRecordsPerFile", per_file)
        .mode(mode)
        .parquet(path)
    )
    return per_file


def from_json_quarantine(
    df: DataFrame,
    payload_col: str,
    schema: str,
    probe_field: str,
) -> DataFrame:
    """Schema-on-read PERMISSIVE parse of an in-flight JSON string
    column — the computational core of :func:`read_jsonl`'s
    quarantine contract for payloads already inside a frame (message
    queues, CDC streams, staged raw columns): adds ``__parsed``
    (the struct, null-fielded when malformed) and ``_corrupt_record``
    (the raw payload when parsing failed, else null — the same
    filter-on-not-null contract as the file readers).

    ``probe_field`` names a field that is non-null in every VALID
    payload; a null probe on a non-null payload is what marks the
    row corrupt (Spark's from_json yields an all-null struct for
    malformed input instead of raising).
    """
    df = df.withColumn("__parsed", F.from_json(F.col(payload_col), schema))
    return df.withColumn(
        CORRUPT_COL,
        F.when(
            F.col(f"__parsed.{probe_field}").isNull()
            & F.col(payload_col).isNotNull(),
            F.col(payload_col),
        ),
    )


def sized_write_plan(
    df: DataFrame,
    group_col: str,
    size_col,
    target_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Exact distributed form of :func:`write_sized_parquet`'s sizing
    rule, per group: records-per-file cap = max(1, target_bytes div
    avg_row) and file count = ceil(n_rows / cap). Pure integer math
    over one map-side-combined aggregation — engine-exact and
    SQL-oracle-able.

    write_sized_parquet samples driver-side because a writer must
    not add a full corpus pass before the write; this form IS a full
    pass, for when the plan itself is the product (catalog sizing
    reports, pre-write planning, layout audits).

    Output: (group, n_rows, total_bytes, per_file_cap, n_files).
    """
    size_col = size_col if isinstance(size_col, Column) else F.col(size_col)
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(size_col.cast("bigint")).cast("bigint").alias("total_bytes"),
    )
    # integer div end to end — float division would drift between
    # engines on wide totals
    return (
        agg.withColumn(
            "__avg_row",
            F.greatest(
                F.expr("total_bytes div n_rows"),
                F.lit(1).cast("bigint"),
            ),
        )
        .withColumn(
            "per_file_cap",
            F.greatest(
                F.expr(f"CAST({int(target_bytes)} AS BIGINT) div __avg_row"),
                F.lit(1).cast("bigint"),
            ),
        )
        .withColumn(
            "n_files",
            F.expr("(n_rows + per_file_cap - 1) div per_file_cap"),
        )
        .drop("__avg_row")
    )
