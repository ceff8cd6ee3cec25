"""The round-5 scale fix: featurize/shingle/decode paths must not pay
an unconditional pre-shuffle of the raw corpus.

``spread_small_input`` repartitions ONLY when the observed input
layout has fewer partitions than the session's default parallelism —
i.e. the local single-file-read case. A well-split input (what every
real multi-file cluster scan looks like) must flow into map-side work
with ZERO added Exchange, and the gating must not change results.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from umls2rdf_spark.operators.dedup import minhash_signatures, simhash
from umls2rdf_spark.operators.similarity import lsh_cosine_topk
from umls2rdf_spark.operators.spread import spread_small_input
from umls2rdf_spark.plans.audit import plan_facts
from tests.conftest import SF_DIR


def test_noop_identity_on_well_split_input(spark):
    df = spark.range(1000).repartition(64)
    assert spread_small_input(df, "id") is df


def test_spreads_single_partition_input(spark):
    # a real single-file scan (the layout the gate exists for) — an
    # explicit coalesce/repartition upstream is user intent and the
    # analyzed-plan fast path deliberately leaves it alone
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = spread_small_input(df, "doc_id")
    assert out is not df
    # AQE may coalesce the tiny shuffle back down, so assert the plan
    # gained the spread node, not a runtime partition count
    plan = out._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "repartition" in plan


def test_noop_on_explicit_repartition(spark):
    df = spark.range(1000).coalesce(1)
    assert spread_small_input(df, "id") is df


def _ops(spark):
    from umls2rdf_spark.operators.similarity import (
        cosine_near_dup_pairs,
        hard_negative_topk_lsh,
        ivf_cosine_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return [
        # (input df, operator, exchanges allowed on a 64-split input —
        # 1 of which is the test's own repartition(64), so the
        # operator itself adds at most its post-featurize shuffles and
        # NO pre-featurize spread)
        (emb, lambda d: lsh_cosine_topk(d, "vec_id", "embedding", k=3, planes=4), 2),
        (docs, lambda d: minhash_signatures(d, "doc_id", "text", num_perm=8), 2),
        (docs, lambda d: simhash(d, "doc_id", "text"), 2),
        (emb, lambda d: cosine_near_dup_pairs(
            d, "vec_id", "embedding", min_cos=0.3, planes=4), 2),
        (emb, lambda d: ivf_cosine_topk(
            d, "vec_id", "embedding", k=3, cells=8), 2),
        # multi-probe paths: featurize + grouped topk + global re-rank
        (emb, lambda d: lsh_cosine_topk(
            d, "vec_id", "embedding", k=3, planes=4, nprobe=3), 3),
        (emb, lambda d: ivf_cosine_topk(
            d, "vec_id", "embedding", k=3, cells=8, nprobe=2), 3),
        # bucketed hard-negative mining: featurize + bucket topk +
        # global re-rank
        (emb, lambda d: hard_negative_topk_lsh(
            d, "vec_id", "embedding", "label", k=2, planes=4,
            nprobe=2), 3),
    ]


def test_no_spread_exchange_on_well_split_input(spark):
    for df_in, op, allowed in _ops(spark):
        wide = op(df_in.repartition(64))
        facts = plan_facts(wide)
        assert facts["exchanges"] <= allowed, (
            f"{op}: {facts['exchanges']} exchanges on well-split input "
            f"(> {allowed}) — an eager pre-featurize spread is back"
        )


def test_gating_is_result_invariant(spark):
    for df_in, op, _ in _ops(spark):
        wide = op(df_in.repartition(64))
        narrow = op(df_in.coalesce(1))
        assert wide.exceptAll(narrow).count() == 0
        assert narrow.exceptAll(wide).count() == 0


def test_corpus_n_avoids_count_jobs(spark):
    """known_n wins outright; a pure parquet scan resolves via footer
    metadata — in both cases no count() job may run."""
    from umls2rdf_spark.operators.similarity import _corpus_n

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    true_n = emb.count()

    class NoCount:
        def __init__(self, df):
            self._df = df

        def __getattr__(self, name):
            if name == "count":
                raise AssertionError("count() job ran")
            return getattr(self._df, name)

    assert _corpus_n(NoCount(emb), 42) == 42
    assert _corpus_n(NoCount(emb), None) == true_n  # footer path
    # non-scan plan: falls back to a real count()
    filtered = emb.where(F.col("vec_id") % 2 == 0)
    assert _corpus_n(filtered, None) == filtered.count()
