"""Embedding-based benchmark decontamination (SURVEY §2 C43) —
oracle parity, planted-leak detection, empty-benchmark semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle
from umls2rdf_spark.operators.similarity import (
    decontaminate_embeddings,
    decontaminate_embeddings_sql,
)
from umls2rdf_spark.sources.parquet import load_table


def test_oracle_parity(spark, duck):
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    got = decontaminate_embeddings(
        emb.where(F.col("vec_id") % 23 != 0),
        emb.where(F.col("vec_id") % 23 == 0),
        "vec_id",
        "embedding",
        min_cos=0.35,
    ).withColumn(
        # stringified-float compare: quantize like the driver's
        # fingerprint does
        "max_cos",
        F.floor(F.col("max_cos") * 1e6).cast("bigint"),
    )
    sql = decontaminate_embeddings_sql(
        "vec_id % 23 <> 0", "vec_id % 23 = 0", 0.35
    )
    assert_matches_oracle(
        got,
        duck,
        f"SELECT vec_id, CAST(FLOOR(max_cos * 1000000) AS BIGINT)"
        f" AS max_cos, keep FROM ({sql}) AS __d",
    )


def test_planted_leak_is_dropped(spark):
    """A corpus vector that IS a benchmark vector (paraphrase limit
    case: identical embedding) must come back keep=false with
    max_cos 1.0; an orthogonal one survives."""
    bench = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], ["vec_id", "embedding"]
    )
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0, 0.0]),   # exact leak
            (11, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
            (12, [0.9, 0.1, 0.0, 0.0]),   # near-paraphrase
        ],
        ["vec_id", "embedding"],
    )
    rows = {
        r["vec_id"]: r
        for r in decontaminate_embeddings(
            corpus, bench, "vec_id", "embedding", min_cos=0.9, dim=4
        ).collect()
    }
    assert not rows[10]["keep"] and abs(rows[10]["max_cos"] - 1.0) < 1e-9
    assert rows[11]["keep"] and abs(rows[11]["max_cos"]) < 1e-9
    assert not rows[12]["keep"]  # cos ≈ 0.9939 ≥ 0.9


def test_empty_benchmark_keeps_everything(spark):
    """No benchmark rows → nothing to decontaminate: every corpus
    row survives with null max_cos (NOT an empty result — the
    fail-open-vs-vanish hazard)."""
    bench = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    rows = decontaminate_embeddings(
        corpus, bench, "vec_id", "embedding", min_cos=0.5, dim=2
    ).collect()
    assert len(rows) == 2
    assert all(r["keep"] and r["max_cos"] is None for r in rows)


# ── bucketed (LSH) form — recall relative to the exact baseline ────
def _load_split(spark):
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    return (
        emb.where(F.col("vec_id") % 23 != 0),
        emb.where(F.col("vec_id") % 23 == 0),
    )


def test_lsh_form_is_fail_open_and_score_exact(spark):
    """Every (id, max_cos) the bucketed form reports agrees exactly
    with the exact baseline's score for that id (same quantized
    arithmetic), approximate max_cos never EXCEEDS the true max
    (missed candidates can only lower it — fail-open), and every
    corpus row is present."""
    from umls2rdf_spark.operators.similarity import (
        decontaminate_embeddings_lsh,
    )

    corp, bench = _load_split(spark)
    exact = {
        r["vec_id"]: r["max_cos"]
        for r in decontaminate_embeddings(
            corp, bench, "vec_id", "embedding", min_cos=0.35
        ).collect()
    }
    approx = decontaminate_embeddings_lsh(
        corp, bench, "vec_id", "embedding", min_cos=0.35, nprobe=2
    ).collect()
    assert {r["vec_id"] for r in approx} == set(exact)
    for r in approx:
        if r["max_cos"] is not None:
            assert r["max_cos"] <= exact[r["vec_id"]] + 1e-12
    # dropped-by-approx must be a subset of dropped-by-exact
    adrop = {r["vec_id"] for r in approx if not r["keep"]}
    edrop = {v for v, c in exact.items() if c >= 0.35}
    assert adrop <= edrop and adrop


def test_lsh_recall_monotone_in_nprobe(spark):
    from umls2rdf_spark.operators.similarity import (
        decontaminate_embeddings_lsh,
    )

    corp, bench = _load_split(spark)
    exact_drop = {
        r["vec_id"]
        for r in decontaminate_embeddings(
            corp, bench, "vec_id", "embedding", min_cos=0.35
        ).collect()
        if not r["keep"]
    }
    recalls = []
    for nprobe in (1, 2, 5):
        drop = {
            r["vec_id"]
            for r in decontaminate_embeddings_lsh(
                corp, bench, "vec_id", "embedding",
                min_cos=0.35, nprobe=nprobe,
            ).collect()
            if not r["keep"]
        }
        assert drop <= exact_drop
        recalls.append(len(drop) / max(1, len(exact_drop)))
    assert recalls == sorted(recalls)
    assert recalls[-1] > 0


def test_ivf_form_full_probe_degenerates_to_exact(spark):
    """nprobe = cells makes the IVF form scan every cell — its
    (max_cos, keep) must EQUAL the exact baseline's, row for row."""
    from umls2rdf_spark.operators.similarity import (
        decontaminate_embeddings_ivf,
    )

    corp, bench = _load_split(spark)
    exact = {
        r["vec_id"]: (r["max_cos"], r["keep"])
        for r in decontaminate_embeddings(
            corp, bench, "vec_id", "embedding", min_cos=0.35
        ).collect()
    }
    full = {
        r["vec_id"]: (r["max_cos"], r["keep"])
        for r in decontaminate_embeddings_ivf(
            corp, bench, "vec_id", "embedding",
            min_cos=0.35, cells=4, nprobe=4,
        ).collect()
    }
    assert set(full) == set(exact)
    for vid, (cos, keep) in full.items():
        ecos, ekeep = exact[vid]
        assert keep == ekeep
        assert abs(cos - ecos) < 1e-12
