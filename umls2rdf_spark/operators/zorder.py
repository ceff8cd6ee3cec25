"""Z-order (Morton-curve) clustered writes for multi-column data
skipping.

A 100 TB fact table is usually range-clustered on ONE column (its
write partitioning), so min/max row-group stats only prune filters on
that column. Interleaving the bits of k columns into one z-value and
range-partitioning + sorting on it gives every interleaved column
locality in the SAME layout: a selective predicate on ANY of them
excludes most files/row groups by their parquet footer stats alone —
no reading, no index. This is the standard lakehouse trick (Delta
OPTIMIZE ZORDER BY / Iceberg sort orders), expressed here as plain
DataFrame ops: the z-value is engine-neutral integer bit arithmetic
(shiftright/shiftleft/bitwiseOR — SQL-oracle-able), the layout is
``repartitionByRange`` + ``sortWithinPartitions``.

Scale shape: one range shuffle (sampled bounds, the same cost any
re-layout pays) and a per-partition sort; the z-value itself is a
map-side codegen expression. No driver state, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleaved Morton code of the low ``bits`` bits of each
    column (columns must be non-negative integers; values are masked
    to ``bits`` — map wider domains down first, e.g. by bucketing).

    Bit j of column i lands at position ``j * k + i``, so the code
    cycles through all k columns at every bit level — equal-length
    prefixes of the z-value bound every column's range, which is what
    makes min/max stats selective on each of them.

    SQL twin (k=2): ``SUM over j of
    (((a >> j) & 1) << (2*j)) + (((b >> j) & 1) << (2*j + 1))``.
    """
    k = len(cols)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits overflows BIGINT")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("bigint") for c in cols
    ]
    out: Column | None = None
    for j in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            term = F.shiftleft(bit, j * k + i)
            out = term if out is None else out + term
    assert out is not None
    return out


def normalized_z(
    df: DataFrame, cols: list[str], bits: int = 16
) -> DataFrame:
    """``df`` plus a ``__z`` column: each column min-max scaled to the
    full ``bits`` width IN-PLAN (1-row stats agg broadcast back — no
    collect), then Morton-interleaved.

    The scaling is what makes interleaving meaningful: raw columns of
    different magnitudes put all their varying bits at different
    positions, so the top z-bits — the ones ``n_files``-way range
    partitioning actually splits on — would belong to the widest
    column alone and the narrow column would get no locality.
    """
    mins = [F.min(c).alias(f"__lo_{i}") for i, c in enumerate(cols)]
    maxs = [F.max(c).alias(f"__hi_{i}") for i, c in enumerate(cols)]
    stats = df.agg(*mins, *maxs)
    top = (1 << bits) - 1
    scaled = []
    with_stats = df.crossJoin(F.broadcast(stats))
    for i, c in enumerate(cols):
        lo, hi = F.col(f"__lo_{i}"), F.col(f"__hi_{i}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
        scaled.append(
            F.floor(
                (F.col(c).cast("bigint") - lo) * F.lit(top) / span
            ).cast("bigint")
        )
    return with_stats.withColumn("__z", z_value(scaled, bits)).drop(
        *[f"__lo_{i}" for i in range(len(cols))],
        *[f"__hi_{i}" for i in range(len(cols))],
    )


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` z-clustered on ``cols``: min-max scale each column
    to ``bits`` (:func:`normalized_z`), range-partition on the
    interleaved z-value into ``n_files`` output files, sort within
    each, drop the helper column (projection after sort keeps row
    order). Footer min/max stats on every clustered column become
    selective in the written layout — verified by the skipping test."""
    z = normalized_z(df, cols, bits)
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_pruned_by_stats(
    path: str, predicates: dict[str, tuple[int, int]]
) -> tuple[int, int]:
    """(pruned, total) parquet files under ``path`` whose row-group
    min/max stats exclude ``{col: (lo, hi)}`` — the footer-only
    skipping decision a scan makes, measured directly so tests can
    compare layouts without timing noise."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    pruned = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        keep = False
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            cols_stats = {
                row_group.column(ci).path_in_schema: row_group.column(
                    ci
                ).statistics
                for ci in range(row_group.num_columns)
            }
            overlaps = all(
                cols_stats[c] is not None
                and cols_stats[c].min <= hi
                and cols_stats[c].max >= lo
                for c, (lo, hi) in predicates.items()
            )
            if overlaps:
                keep = True
                break
        if not keep:
            pruned += 1
    return pruned, len(files)
