"""Vector functions for embedding similarity.

Determinism strategy: float components are quantized to integer
milliunits FIRST (round(x*1000) — identical in Spark and DuckDB since
both round halves away from zero for doubles), then dot products and
norms are exact BIGINT sums, so results are independent of summation
order / partitioning. Only the final cosine division + sqrt touch
floating point, and those are single correctly-rounded IEEE ops.

For 64-dim embeddings with |x| < ~1, quantized comps are < 2^10, so
norm² < 2^26 and norm products < 2^52 — far from BIGINT overflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1000


def quantize(col: Column) -> Column:
    """array<float> → array<bigint> milliunit quantization."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("bigint")
    )


QUANTIZE_SQL = (
    "list_transform({col}, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
)


def explode_components(
    df: DataFrame, id_col: str, vec_col: str, quantized: bool = True
) -> DataFrame:
    """(id, vec) → (id, pos, comp) long form for join-based dot
    products — the shape that distributes: dot(a,b) becomes a join on
    pos + an integer sum, exact under any partitioning."""
    vec = quantize(F.col(vec_col)) if quantized else F.col(vec_col)
    return df.select(
        F.col(id_col), F.posexplode(vec).alias("pos", "comp")
    )


def norm2_by_id(components: DataFrame, id_col: str) -> DataFrame:
    """Exact squared norm per vector from the long form."""
    return components.groupBy(id_col).agg(
        F.sum(F.col("comp") * F.col("comp")).alias("norm2")
    )
