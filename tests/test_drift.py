"""C70 chi-square drift: hand-computed statistic, novel/vanished
bucket semantics, single-sided groups, and oracle parity on the
driver demo's seeded split."""

from __future__ import annotations

from pyspark.sql import functions as F

from umls2rdf_spark.operators.drift import (
    chi_square_drift,
    chi_square_drift_sql,
)
from tests.conftest import SF_DIR, make_duck


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, g string, v bigint")


def test_hand_computed_chi_square(spark):
    """base values [1,1,2], new [1,2,2], W=1: e = (2,1) scaled to
    N_n=3 -> chi2 = (1-2)^2/2 + (2-1)^2/1 = 1.5; quantized exactly
    1.5 * 2^20 (the scale-first division order loses nothing here)."""
    base = _df(spark, [(1, "a", 1), (2, "a", 1), (3, "a", 2)])
    new = _df(spark, [(4, "a", 1), (5, "a", 2), (6, "a", 2)])
    r = chi_square_drift(base, new, "g", F.col("v"), 1).collect()[0]
    assert (r.n_base, r.n_new, r.n_buckets) == (3, 3, 2)
    assert r.chi2_q == int(1.5 * (1 << 20))
    assert (r.n_novel, r.novel_mass) == (0, 0)


def test_identical_distributions_zero_drift(spark):
    rows = [(i, "a", i % 7) for i in range(70)]
    base = _df(spark, rows)
    new = _df(spark, [(i + 100, g, v) for i, g, v in rows])
    r = chi_square_drift(base, new, "g", F.col("v"), 1).collect()[0]
    assert r.chi2_q == 0 and r.n_novel == 0


def test_novel_and_vanished_buckets(spark):
    base = _df(spark, [(1, "a", 1), (2, "a", 1), (3, "a", 2)])
    new = _df(spark, [(4, "a", 1), (5, "a", 9), (6, "a", 9)])
    r = chi_square_drift(base, new, "g", F.col("v"), 1).collect()[0]
    # bucket 9 is novel (2 rows); bucket 2 vanished but still
    # contributes its expected mass through the chi2 term
    assert (r.n_novel, r.novel_mass) == (1, 2)
    assert r.chi2_q > 0
    assert r.n_buckets == 3  # buckets 1, 2, 9


def test_single_sided_groups(spark):
    base = _df(spark, [(1, "only_base", 5)])
    new = _df(spark, [(2, "only_new", 5)])
    got = {
        r[0]: tuple(r[1:])
        for r in chi_square_drift(
            base, new, "g", F.col("v"), 1
        ).collect()
    }
    assert got["only_base"] == (1, 0, 1, 0, 0, 0)
    # the all-novel group: no defined chi2, everything novel
    assert got["only_new"] == (0, 1, 1, 0, 1, 1)


def test_oracle_parity_seeded_demo(spark):
    from umls2rdf_spark.plans.completion import (
        _DRIFT_BASE_SQL,
        _DRIFT_BUCKET,
        _DRIFT_NEW_SQL,
        _drift_base_frame,
        _drift_new_frame,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in chi_square_drift(
            _drift_base_frame(docs),
            _drift_new_frame(docs),
            "source",
            F.col("n_chars"),
            _DRIFT_BUCKET,
        ).collect()
    )
    con = make_duck(SF_DIR)
    try:
        want = sorted(
            tuple(r)
            for r in con.execute(
                chi_square_drift_sql(
                    _DRIFT_BASE_SQL, _DRIFT_NEW_SQL, "source",
                    "n_chars", _DRIFT_BUCKET,
                )
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want
    # the seeded shift genuinely drifts: some group has chi2 or
    # novel mass, and both sides are populated (hash split works)
    assert any(r[4] > 0 or r[5] > 0 for r in got)
    assert all(r[1] > 0 and r[2] > 0 for r in got)
