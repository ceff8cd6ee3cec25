"""RRF (Rich Release Format) source — UMLS's pipe-delimited text files.

The reference never reads RRF directly (it shells MySQL's LOAD DATA,
create_mysql_db.py); Spark reads it natively as a delimited scan, so
the whole MySQL staging hop disappears. RRF rows end with a trailing
'|', which LOAD DATA drops — we read one extra column and drop it
rather than post-processing strings.

At 100 TB scale this is a splittable line-based read: Spark assigns
file splits to executors directly, no single-node ingest bottleneck.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from umls2rdf_spark.schemas import UMLS_SCHEMAS


def read_rrf(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read a .RRF file (``MRCONSO.RRF`` etc.) into a DataFrame.

    ``table`` picks a schema from schemas.UMLS_SCHEMAS; pass an
    explicit ``schema`` for non-standard files.
    """
    if schema is None:
        if table is None:
            table = os.path.basename(path).split(".")[0].upper()
        schema = UMLS_SCHEMAS[table]
    # Trailing '|' → one phantom column; read it and drop it.
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField("_trailing", T.StringType(), True)]
    )
    df = (
        spark.read.format("csv")
        .option("sep", "|")
        .option("header", "false")
        .option("quote", "")  # RRF does not quote; '"' is data
        .option("emptyValue", "")
        .schema(read_schema)
        .load(path)
    )
    return df.drop("_trailing")
