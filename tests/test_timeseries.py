"""B49 gap_fill: dense grid construction, locf/interp semantics on
hand-built series, DuckDB twin parity on real event data, and the
fail-closed span valve."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle
from umls2rdf_spark.operators.timeseries import gap_fill, gap_fill_sql


def _series(spark, rows):
    """rows: (key, epoch_sec, value) triples."""
    return spark.createDataFrame(
        [
            (k, dt.datetime.fromtimestamp(s, dt.timezone.utc), v)
            for k, s, v in rows
        ],
        "k string, ts timestamp, v long",
    )


def test_hand_series_locf_and_interp(spark):
    """Buckets 0,3 observed (10, 40): gaps at 1,2 carry locf=10 and
    interpolate 20, 30; before-first/after-last stay NULL."""
    df = _series(
        spark,
        [("a", 5, 10), ("a", 3 * 60 + 5, 40), ("a", 3 * 60 + 20, 0)],
    )
    out = {
        r["bucket"]: r
        for r in gap_fill(df, "k", "ts", F.col("v"), 60).collect()
    }
    assert sorted(out) == [0, 1, 2, 3]
    assert (out[0]["v_q"], out[0]["n_events"]) == (10, 1)
    assert (out[3]["v_q"], out[3]["n_events"]) == (40, 2)
    for b, want in ((1, 20), (2, 30)):
        r = out[b]
        assert r["v_q"] is None and r["n_events"] == 0
        assert r["locf_q"] == 10
        assert r["interp_q"] == want


def test_observed_buckets_pass_through(spark):
    """On observed buckets locf == interp == v_q (no smoothing of
    real data)."""
    df = _series(spark, [("a", 60 * b, 7 * b) for b in range(5)])
    for r in gap_fill(df, "k", "ts", F.col("v"), 60).collect():
        assert r["v_q"] == r["locf_q"] == r["interp_q"]
        assert r["n_events"] == 1


def test_no_extrapolation_and_per_key_spans(spark):
    """Each key gets its own [first, last] grid; interp is NULL
    after a key's last observation when only locf can answer."""
    df = _series(
        spark,
        [("a", 0, 1), ("a", 240, 5), ("b", 600, 9)],
    )
    rows = gap_fill(df, "k", "ts", F.col("v"), 60).collect()
    a = sorted(r["bucket"] for r in rows if r["k"] == "a")
    b = sorted(r["bucket"] for r in rows if r["k"] == "b")
    assert a == [0, 1, 2, 3, 4] and b == [10]
    # uneven interpolation floors (exact integer division)
    byb = {r["bucket"]: r for r in rows if r["k"] == "a"}
    assert [byb[i]["interp_q"] for i in (1, 2, 3)] == [2, 3, 4]


def test_span_valve_fails_closed(spark):
    """The in-plan valve fires at execution, before the grid
    materializes."""
    df = _series(spark, [("a", 0, 1), ("a", 10_000_000, 2)])
    with pytest.raises(Exception, match="max_buckets_per_key"):
        gap_fill(
            df, "k", "ts", F.col("v"), 1, max_buckets_per_key=1000
        ).collect()


def test_oracle_parity_on_events(spark, duck):
    """Thinned real event stream (hourly buckets with real gaps):
    Spark == DuckDB twin value-for-value."""
    sf = "/root/testdata/sf0.01"
    ev = spark.read.parquet(f"{sf}/events.parquet").where(
        F.col("event_id") % 37 == 0
    )
    out = gap_fill(
        ev, "event_type", "ts", F.floor(F.col("value") * 1000000), 3600
    )
    assert_matches_oracle(
        out,
        duck,
        gap_fill_sql(
            "SELECT * FROM events WHERE event_id % 37 = 0",
            "event_type",
            "ts",
            "FLOOR(value * 1000000)",
            3600,
        ),
    )
