"""Z-order clustered writes: Morton code vs a Python replica, and
footer-stats skipping that a single-column sort cannot provide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umls2rdf_spark.operators.zorder import (
    files_pruned_by_stats,
    z_value,
    zorder_write,
)


def _z_py(vals: list[int], bits: int) -> int:
    k = len(vals)
    out = 0
    for j in range(bits):
        for i, v in enumerate(vals):
            out |= ((v >> j) & 1) << (j * k + i)
    return out


def test_z_value_matches_python_replica(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 3, 77, 1024)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", z_value(["a", "b"], 16)).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _z_py([a, b], 16), (a, b)


def test_z_value_overflow_guard():
    with pytest.raises(ValueError):
        z_value(["a", "b", "c", "d"], 16)  # 64 bits > BIGINT range


def test_zorder_skips_on_both_columns(spark, tmp_path):
    """The z-layout must let footer stats prune files for a selective
    predicate on EITHER interleaved column; the single-column-sorted
    layout prunes only on its own sort column. lineitem's partkey and
    suppkey are independent, so this is the realistic two-filter
    case."""
    li = spark.read.parquet(
        "/root/testdata/sf0.01/lineitem.parquet"
    ).select("l_partkey", "l_suppkey", "l_quantity")

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "single")
    zorder_write(li, ["l_partkey", "l_suppkey"], zpath, n_files=16)
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # selective range on the SECONDARY column (suppkey): the
    # single-column layout scatters it across every file
    sup_pred = {"l_suppkey": (10, 40)}
    z_pruned, z_total = files_pruned_by_stats(zpath, sup_pred)
    s_pruned, s_total = files_pruned_by_stats(spath, sup_pred)
    assert z_total == s_total == 16
    # scattered: every file overlaps; z-layout: roughly the files
    # outside the predicate's top z-bit quarters go (sampled range
    # bounds are not exactly bit-aligned, hence >= 6 not >= 8)
    assert s_pruned == 0
    assert z_pruned >= 6

    # and the z-layout still prunes on the primary column too
    part_pred = {"l_partkey": (100, 600)}
    zp, _ = files_pruned_by_stats(zpath, part_pred)
    assert zp >= 6

    # row content identical across layouts
    a = spark.read.parquet(zpath).groupBy().agg(
        F.sum("l_quantity"), F.count(F.lit(1))
    ).collect()
    b = spark.read.parquet(spath).groupBy().agg(
        F.sum("l_quantity"), F.count(F.lit(1))
    ).collect()
    assert a == b


def test_zorder_scan_pushdown_end_to_end(spark, tmp_path):
    """Reading the z-clustered layout with a both-column filter keeps
    the predicate pushed to the scan (the engine-side half of the
    skipping story)."""
    from umls2rdf_spark.plans.audit import plan_facts

    li = spark.read.parquet(
        "/root/testdata/sf0.01/lineitem.parquet"
    ).select("l_partkey", "l_suppkey", "l_quantity")
    zpath = str(tmp_path / "z2")
    zorder_write(li, ["l_partkey", "l_suppkey"], zpath, n_files=8)
    scan = spark.read.parquet(zpath).where(
        (F.col("l_partkey").between(100, 600))
        & (F.col("l_suppkey").between(10, 40))
    )
    facts = plan_facts(scan)
    assert facts["scans"][0]["pushed_filters"]
    expected = li.where(
        (F.col("l_partkey").between(100, 600))
        & (F.col("l_suppkey").between(10, 40))
    ).count()
    assert scan.count() == expected
