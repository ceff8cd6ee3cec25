"""B45 MAD outlier detection, C67 winsorization / keep-k capped
dedup: hand-computed semantics, edge cases, plan shape, and exact
oracle parity on the real tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from umls2rdf_spark.operators.dedup import (
    dedup_keep_k,
    dedup_keep_k_sql,
)
from umls2rdf_spark.operators.robust import (
    mad_outlier_summary,
    mad_outlier_summary_sql,
    winsorize,
    winsorize_sql,
)
from tests.conftest import SF_DIR, make_duck


def _vals(spark, rows):
    return spark.createDataFrame(rows, "id bigint, g string, v bigint")


# ── MAD outliers ─────────────────────────────────────────────────────
def test_mad_hand_computed(spark):
    """[1,2,3,100]: lower median 2, deviations [1,0,1,98] -> MAD 1,
    one Hampel outlier at k=3 (98 > 3)."""
    df = _vals(
        spark, [(1, "a", 1), (2, "a", 2), (3, "a", 3), (4, "a", 100)]
    )
    r = mad_outlier_summary(df, "g", F.col("v"), k=3).collect()[0]
    assert (r.n, r.med_q, r.mad_q, r.n_outliers) == (4, 2, 1, 1)


def test_mad_zero_mad_constant_majority(spark):
    """Constant-majority group: MAD 0 -> every non-median value is an
    outlier (the documented Hampel edge)."""
    df = _vals(
        spark,
        [(i, "a", 5) for i in range(5)] + [(9, "a", 6), (10, "a", 7)],
    )
    r = mad_outlier_summary(df, "g", F.col("v"), k=3).collect()[0]
    assert (r.med_q, r.mad_q, r.n_outliers) == (5, 0, 2)


def test_mad_null_values_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", None), (3, "a", 3.0)],
        "id bigint, g string, v double",
    )
    r = mad_outlier_summary(
        df, "g", F.floor(F.col("v") * 1000000), k=3
    ).collect()[0]
    assert r.n == 2  # the NULL row is dropped, not counted as zero


def test_mad_oracle_parity_events(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = sorted(
        tuple(r)
        for r in mad_outlier_summary(
            ev, "event_type", F.floor(F.col("value") * 1000000), k=3
        ).collect()
    )
    con = make_duck(SF_DIR)
    try:
        want = sorted(
            tuple(r)
            for r in con.execute(
                mad_outlier_summary_sql(
                    "SELECT * FROM events",
                    "event_type",
                    "CAST(FLOOR(value * 1000000) AS BIGINT)",
                    k=3,
                )
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want
    assert sum(r[4] for r in got) > 0  # outliers genuinely flagged


# ── winsorize ────────────────────────────────────────────────────────
def test_winsorize_clips_not_drops(spark):
    rows = [(i, "s", v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    out = {
        r.id: (r.v, r.v_clip)
        for r in winsorize(
            _vals(spark, rows), "g", F.col("v"), "id",
            lo_ppm=200_000, hi_ppm=800_000,
        ).collect()
    }
    assert len(out) == 10  # every row survives
    # bounds: lo = ceil(10*0.2)=2nd value = 2; hi = 8th value = 8
    assert out[0] == (1, 2)
    assert out[9] == (1000, 8)
    assert out[4] == (5, 5)  # interior values untouched
    # monotone: clipping preserves order
    clips = [out[i][1] for i in range(10)]
    assert clips == sorted(clips)


def test_winsorize_oracle_parity_docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in winsorize(
            docs, "source", F.col("n_chars"), "doc_id"
        ).collect()
    )
    con = make_duck(SF_DIR)
    try:
        want = sorted(
            tuple(r)
            for r in con.execute(
                winsorize_sql(
                    "SELECT * FROM documents", "source", "n_chars",
                    "doc_id",
                )
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want
    assert any(r[2] != r[3] for r in got)  # tails genuinely clipped


# ── keep-k capped dedup ──────────────────────────────────────────────
def _seeded(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 < 3,
            F.concat(
                F.lit("boilerplate page "),
                (F.col("doc_id") % 5).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("ktext"),
    )


_SEEDED_SQL = (
    "(SELECT doc_id, CASE WHEN doc_id % 7 < 3 THEN 'boilerplate page '"
    " || CAST(doc_id % 5 AS VARCHAR) ELSE text END AS ktext"
    " FROM documents)"
)


def test_keep_k_semantics(spark):
    df = spark.createDataFrame(
        [(i, "dup") for i in range(5)] + [(10, "solo")],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.dup_rank, r.group_n)
        for r in dedup_keep_k(df, "doc_id", "text", k=2).collect()
    }
    # lowest-id 2 copies kept, group size reported, singleton intact
    assert out == {0: (1, 5), 1: (2, 5), 10: (1, 1)}


def test_keep_k_one_equals_exact_dedup_winners(spark):
    from umls2rdf_spark.operators.dedup import exact_dedupe_groups

    seeded = _seeded(spark)
    kept = {
        r.doc_id
        for r in dedup_keep_k(seeded, "doc_id", "ktext", k=1).collect()
    }
    winners = {
        r.keep_id
        for r in exact_dedupe_groups(seeded, "doc_id", "ktext").collect()
    }
    assert kept == winners


def test_keep_k_plan_group_limit_pushdown(spark):
    """The cap compiles to WindowGroupLimit(Partial) before the
    Exchange — hot mirror groups ship O(k·partitions) rows."""
    plan = (
        dedup_keep_k(_seeded(spark), "doc_id", "ktext", k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_keep_k_oracle_parity(spark):
    got = sorted(
        tuple(r)
        for r in dedup_keep_k(
            _seeded(spark), "doc_id", "ktext", k=2
        ).collect()
    )
    con = make_duck(SF_DIR)
    try:
        want = sorted(
            tuple(r)
            for r in con.execute(
                dedup_keep_k_sql(_SEEDED_SQL, "doc_id", "ktext", k=2)
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want
    assert any(r[2] > 2 for r in got)  # capped groups exist


# ── stratified fixed-n sampling ──────────────────────────────────────
def test_stratified_sample_semantics(spark):
    from umls2rdf_spark.operators.selection import stratified_sample

    rows = [(i, "big") for i in range(20)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = stratified_sample(df, "source", "doc_id", 5).collect()
    per = {}
    for r in out:
        per.setdefault(r.source, []).append(r.rank)
    assert sorted(per["big"]) == [1, 2, 3, 4, 5]  # exactly n
    assert per["tiny"] == [1]  # small stratum: whole group


def test_stratified_sample_nested_and_deterministic(spark):
    from umls2rdf_spark.operators.selection import stratified_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    five = {
        (r.source, r.doc_id)
        for r in stratified_sample(docs, "source", "doc_id", 5).collect()
    }
    three = {
        (r.source, r.doc_id)
        for r in stratified_sample(docs, "source", "doc_id", 3).collect()
    }
    prefix = {
        (r.source, r.doc_id)
        for r in stratified_sample(docs, "source", "doc_id", 5)
        .where("rank <= 3")
        .collect()
    }
    assert three == prefix  # nested samples are consistent
    assert three < five


def test_stratified_sample_plan_and_validation(spark):
    import pytest as _pytest

    from umls2rdf_spark.operators.selection import stratified_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        stratified_sample(docs, "source", "doc_id", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan
    with _pytest.raises(ValueError, match="n must be"):
        stratified_sample(docs, "source", "doc_id", 0)


def test_stratified_sample_oracle_parity(spark):
    from umls2rdf_spark.operators.selection import (
        stratified_sample,
        stratified_sample_sql,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in stratified_sample(docs, "source", "doc_id", 5).collect()
    )
    con = make_duck(SF_DIR)
    try:
        want = sorted(
            tuple(r)
            for r in con.execute(
                stratified_sample_sql(
                    "SELECT * FROM documents", "source", "doc_id", 5
                )
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want and len(got) > 0
