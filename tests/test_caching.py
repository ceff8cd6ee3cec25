"""Cache-residency contracts (operators/caching.py + the round-6
de-persist of the selection ops): repeated operator calls in one
long-lived session must not accumulate cached partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from umls2rdf_spark.operators.caching import CacheScope
from umls2rdf_spark.operators.selection import (
    epoch_shuffle,
    select_to_token_budget,
)
from umls2rdf_spark.operators.textstats import (
    bigram_surprisal,
    unigram_surprisal,
)


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _release_all_persistent(spark) -> None:
    """Deterministic zero-cache baseline: blocking-unpersist every
    persistent RDD left behind by EARLIER test files (eager
    localCheckpoints from the iterative ops — bpe/pagerank/closure
    — survive catalog.clearCache() and are otherwise released
    asynchronously by the ContextCleaner, which can fire MID-test
    and shift the absolute counts these contracts compare). Their
    owning frames are dead by the time this file runs, so releasing
    storage is safe."""
    spark.catalog.clearCache()
    # py4j surfaces the Java map as a dict view
    for jrdd in list(
        spark.sparkContext._jsc.getPersistentRDDs().values()
    ):
        jrdd.unpersist(True)


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            "text",
            F.length("text").alias("ntok"),
            (F.col("doc_id") % 3).cast("int").alias("score"),
        )
    )


def test_selection_ops_hold_zero_cache(spark):
    """select_to_token_budget and epoch_shuffle collect their
    bounded offset frames eagerly — three full invocations leave NO
    cached RDDs behind (the round-5 version pinned a corpus-sized
    MEMORY_AND_DISK copy per call)."""
    docs = _docs(spark)
    _release_all_persistent(spark)
    before = _n_cached(spark)
    for _ in range(3):
        select_to_token_budget(
            docs, "doc_id", "ntok", "score", budget=5000
        ).count()
        epoch_shuffle(docs, "doc_id", seed=1).count()
    assert _n_cached(spark) == before


def test_surprisal_latest_call_only_residency(spark):
    """bigram/unigram surprisal keep their multi-consumer persists,
    but repeated calls stay bounded: call N releases call N-1's
    frames, so cache count after three invocations equals the count
    after one."""
    docs = _docs(spark)
    _release_all_persistent(spark)
    baseline = _n_cached(spark)
    bigram_surprisal(docs, "doc_id", "text").count()
    unigram_surprisal(docs, "doc_id", "text").count()
    after_one = _n_cached(spark)
    assert after_one > baseline  # the persists are real
    for _ in range(2):
        bigram_surprisal(docs, "doc_id", "text").count()
        unigram_surprisal(docs, "doc_id", "text").count()
    assert _n_cached(spark) == after_one
    _release_all_persistent(spark)


def test_cache_scope_releases_everything(spark):
    """Explicit CacheScope: zero residual cache after the with-block,
    and the result computed inside matches a fresh computation."""
    docs = _docs(spark)
    _release_all_persistent(spark)
    before = _n_cached(spark)
    with CacheScope() as scope:
        rows = sorted(
            (r["doc_id"], r["surprisal_q"])
            for r in bigram_surprisal(
                docs, "doc_id", "text", cache=scope
            ).collect()
        )
        assert _n_cached(spark) > before
    assert _n_cached(spark) == before
    fresh = sorted(
        (r["doc_id"], r["surprisal_q"])
        for r in bigram_surprisal(docs, "doc_id", "text").collect()
    )
    assert rows == fresh
    _release_all_persistent(spark)


def test_released_result_still_correct(spark):
    """A frame returned by call N stays correct after call N+1
    releases its cache — lineage recompute, never wrong data."""
    docs = _docs(spark)
    r1 = bigram_surprisal(docs, "doc_id", "text")
    first = {r["doc_id"]: r["surprisal_q"] for r in r1.collect()}
    bigram_surprisal(docs, "doc_id", "text").count()  # releases r1's cache
    again = {r["doc_id"]: r["surprisal_q"] for r in r1.collect()}
    assert first == again
    _release_all_persistent(spark)


def test_mad_summary_latest_call_only_residency(spark):
    """mad_outlier_summary persists its counts + deviation-counts
    frames, but a monitoring loop calling it per epoch stays
    bounded: call N releases call N-1's frames (round-8 advice —
    the persists were previously unscoped and accumulated)."""
    from umls2rdf_spark.operators.robust import mad_outlier_summary

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    vq = F.floor(F.col("value") * 1_000_000)
    _release_all_persistent(spark)
    baseline = _n_cached(spark)
    mad_outlier_summary(ev, "event_type", vq).count()
    after_one = _n_cached(spark)
    assert after_one > baseline  # the persists are real
    for _ in range(3):
        mad_outlier_summary(ev, "event_type", vq).count()
    assert _n_cached(spark) == after_one
    # explicit scope: zero residual
    _release_all_persistent(spark)
    before = _n_cached(spark)
    with CacheScope() as scope:
        mad_outlier_summary(ev, "event_type", vq, cache=scope).count()
    assert _n_cached(spark) == before
    _release_all_persistent(spark)
