"""C65 text normalization: oracle parity on the driver demo,
idempotence, per-stage count semantics, mojibake pair-order safety,
and dialect parity of the \\x{...} patterns."""

from __future__ import annotations

from pyspark.sql import functions as F

from umls2rdf_spark.operators.normalize import (
    MOJIBAKE_PAIRS,
    normalize_text,
    normalize_text_sql,
)


def _one(spark, text):
    df = spark.createDataFrame(
        [(0, text)], "doc_id bigint, text string"
    )
    return normalize_text(df, "doc_id", "text").collect()[0]


def test_stage_semantics(spark):
    r = _one(spark, "donâ€™t x​  y\n\n\n\nz")
    assert r.text_norm == "don't x y\n\nz"
    assert (r.n_moji, r.n_ctrl, r.n_zerowidth) == (1, 1, 1)
    assert (r.n_multispace, r.n_multinewline) == (1, 1)


def test_mojibake_longest_prefix_order(spark):
    """The bare U+00E2 U+20AC remainder pair must not consume the
    prefix of the three-char sequences (the en/em dash artifacts
    would otherwise normalize to a stray quote + garbage)."""
    # U+2013 en dash artifact = e2 80 93 read as cp1252
    r = _one(spark, "aâ€“b")
    assert r.text_norm == "a-b"
    # the genuine U+201D remainder still resolves via the bare pair
    r2 = _one(spark, "say â€that")
    assert r2.text_norm == 'say "that'
    assert r2.n_ctrl == 1  # the stray U+009D


def test_idempotent_and_clean_text_untouched(spark):
    dirty = "CafÃ©   here\t\t."
    once = _one(spark, dirty).text_norm
    assert _one(spark, once).text_norm == once
    clean = "plain ascii text, one line."
    r = _one(spark, clean)
    assert r.text_norm == clean
    assert (
        r.n_moji + r.n_ctrl + r.n_zerowidth + r.n_nbsp
        + r.n_multispace + r.n_multinewline
    ) == 0


def test_no_pair_output_feeds_another_pair(spark):
    """Table safety: applying the full chain to every pair's GOOD
    side changes nothing (no replacement cascades)."""
    for _, good in MOJIBAKE_PAIRS:
        r = _one(spark, f"x{good}y")
        assert r.n_moji == 0, good


def test_demo_matches_oracle(spark, duck):
    from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle
    from umls2rdf_spark.plans.completion import (
        _NORM_SEED,
        _normalize_sql,
    )
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 5 == 0, F.lit(_NORM_SEED))
            .otherwise(F.lit("")),
            F.col("text"),
        ).alias("ntext"),
    )
    got = normalize_text(seeded, "doc_id", "ntext")
    assert_matches_oracle(got, duck, _normalize_sql())
    pdf = got.toPandas()
    seeded_rows = pdf[pdf.doc_id % 5 == 0]
    assert (seeded_rows["n_moji"] == 3).all()  # é + “ + ” remainder
    assert (seeded_rows["n_ctrl"] == 1).all()  # the U+009D
    assert (seeded_rows["n_zerowidth"] == 1).all()
    assert (seeded_rows["n_nbsp"] == 1).all()
    assert (pdf[pdf.doc_id % 5 != 0][
        ["n_moji", "n_ctrl", "n_zerowidth", "n_nbsp"]
    ].sum().sum()) == 0
