"""Observation-API pipeline metrics (operators/metrics.py): stage
counts from ONE action, values verified against direct counts, and
the zero-extra-jobs property asserted via the status tracker."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from umls2rdf_spark.operators.metrics import funnel, observe_stage
from umls2rdf_spark.sources.parquet import load_table


def test_funnel_counts_match_direct_counts(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out, obs = funnel(
        docs,
        [
            ("lang_en", lambda d: d.where(F.col("lang") == "en")),
            ("long_docs", lambda d: d.where(F.col("n_chars") > 200)),
            ("not_src1", lambda d: d.where(F.col("source") != "src1")),
        ],
    )
    survivors = out.count()  # the ONE action
    got = {name: o.get["n_rows"] for name, o in obs.items()}

    en = docs.where(F.col("lang") == "en")
    long_ = en.where(F.col("n_chars") > 200)
    final = long_.where(F.col("source") != "src1")
    assert got == {
        "input": docs.count(),
        "lang_en": en.count(),
        "long_docs": long_.count(),
        "not_src1": final.count(),
    }
    assert survivors == got["not_src1"]
    # a funnel only narrows
    assert (
        got["input"] >= got["lang_en"] >= got["long_docs"]
        >= got["not_src1"] > 0
    )


def test_observe_custom_metrics_and_single_job(spark):
    docs = load_table(spark, SF_DIR, "documents")
    observed, obs = observe_stage(
        docs,
        "quality_probe",
        {
            "n_rows": F.count(F.lit(1)),
            "null_text": F.count_if(F.col("text").isNull()),
            "sum_chars": F.sum("n_chars"),
            "max_id": F.max("doc_id"),
        },
    )
    tracker = spark.sparkContext.statusTracker()

    def jobs(action):
        # count by MAX job id, not list length: the status tracker
        # EVICTS old entries in a long-lived session (full-suite
        # runs), so length deltas can go negative; ids are monotone
        ids = tracker.getJobIdsForGroup(None) or []
        before = max(ids) if ids else -1
        out = action()
        ids = tracker.getJobIdsForGroup(None) or []
        return out, (max(ids) if ids else -1) - before

    _, plain_jobs = jobs(docs.count)
    n, observed_jobs = jobs(observed.count)
    m = obs.get
    assert m["n_rows"] == n
    assert m["null_text"] == 0
    assert m["max_id"] == docs.agg(F.max("doc_id")).collect()[0][0]
    assert m["sum_chars"] == docs.agg(F.sum("n_chars")).collect()[0][0]
    # the metrics rode the SAME action — observing launches no more
    # jobs than the identical unobserved count
    assert observed_jobs <= plain_jobs
