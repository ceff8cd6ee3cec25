"""Continuous per-domain cap intake (streaming/webcurate.py): the
cap holds across epochs, a single-epoch stream equals the batch
operator exactly, admissions are never revoked, and replays are
no-ops."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from umls2rdf_spark.operators.webcurate import cap_per_domain
from umls2rdf_spark.sources.parquet import load_table
from umls2rdf_spark.streaming.webcurate import (
    read_admitted,
    run_domain_cap_intake,
)

SF_DIR = "/root/testdata/sf0.001"
CAP = 3


def _stream(spark, src_dir):
    schema = spark.read.parquet(f"{src_dir}/part0.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src_dir)
    )


def _write_parts(spark, tmp_path, frames):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    for p, f in enumerate(frames):
        pq.write_table(
            pa.Table.from_pandas(f.toPandas(), preserve_index=False),
            str(src / f"part{p}.parquet"),
        )
    return str(src)


def test_single_epoch_equals_batch_operator(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source"
    )
    src = _write_parts(spark, tmp_path, [docs])
    state = str(tmp_path / "state")
    run_domain_cap_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "doc_id", "source", cap=CAP, blocklist=["src3"],
    )
    got = sorted(
        (r["source"], r["doc_id"])
        for r in read_admitted(spark, state).collect()
    )
    want = sorted(
        (r["source"], r["doc_id"])
        for r in cap_per_domain(
            docs, "doc_id", "source", cap=CAP, blocklist=["src3"]
        ).collect()
    )
    assert got == want and len(got) > 0


def test_cap_holds_across_epochs_and_admissions_persist(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source"
    )
    parts = [docs.where(F.col("doc_id") % 3 == p) for p in range(3)]
    src = _write_parts(spark, tmp_path, parts)
    state = str(tmp_path / "state")
    run_domain_cap_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "doc_id", "source", cap=CAP,
    )
    adm = read_admitted(spark, state)
    per = {
        r["source"]: r["n"]
        for r in adm.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # never exceeds the cap; domains with >= CAP docs are full
    assert all(n <= CAP for n in per.values())
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for d, n in totals.items():
        assert per.get(d, 0) == min(n, CAP), d
    # arrival-order semantics: epoch-0 admissions are exactly the
    # batch operator on epoch 0 alone (slots were all free)
    ep0 = sorted(
        (r["source"], r["doc_id"])
        for r in adm.where(F.col("batch_id") == 0).collect()
    )
    want0 = sorted(
        (r["source"], r["doc_id"])
        for r in cap_per_domain(
            parts[0], "doc_id", "source", cap=CAP
        ).collect()
    )
    assert ep0 == want0


def test_replay_is_noop(spark, tmp_path):
    """Re-running an epoch against the same prior state rewrites the
    identical partition: admitted set unchanged."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source"
    )
    parts = [docs.where(F.col("doc_id") % 2 == p) for p in range(2)]
    src = _write_parts(spark, tmp_path, parts)
    state = str(tmp_path / "state")
    run_domain_cap_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "doc_id", "source", cap=CAP,
    )
    before = sorted(
        map(tuple, read_admitted(spark, state).collect())
    )
    # simulate the at-least-once replay of epoch 1: recompute its
    # admission against prior state (epoch 0 only) and overwrite
    from umls2rdf_spark.functions.hashing import stable_hash40
    from pyspark.sql import Window

    used = (
        read_admitted(spark, state)
        .where(F.col("batch_id") != 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("int").alias("__used"))
    )
    w = Window.partitionBy("source").orderBy(
        stable_hash40(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    redo = (
        parts[1]
        .withColumn("__r", F.row_number().over(w))
        .join(F.broadcast(used), "source", "left")
        .withColumn("__used", F.coalesce("__used", F.lit(0)))
        .where(F.col("__r") <= F.lit(CAP) - F.col("__used"))
        .select("source", "doc_id")
    )
    redo.write.mode("overwrite").parquet(f"{state}/capidx/batch_id=1")
    after = sorted(
        map(tuple, read_admitted(spark, state).collect())
    )
    assert after == before


# ── continuous canonical-URL dedup intake ───────────────────────────
def _url_frame(docs):
    # deterministic URL mix: every third row is a utm variant of the
    # previous row's URL (same canonical), ids keep batch order
    base = F.concat(
        F.lit("http://h"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".com/p"), (F.col("doc_id") % 11).cast("string"),
    )
    url = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(base, F.lit("?utm_source=x")),
    ).otherwise(base)
    return docs.select("doc_id", url.alias("url"))


def test_url_intake_single_epoch_equals_batch(spark, tmp_path):
    from umls2rdf_spark.operators.webcurate import dedup_by_url
    from umls2rdf_spark.streaming.webcurate import (
        read_url_index,
        run_url_dedup_intake,
    )

    docs = _url_frame(
        load_table(spark, SF_DIR, "documents").select("doc_id")
    )
    src = _write_parts(spark, tmp_path, [docs])
    state = str(tmp_path / "state")
    run_url_dedup_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "doc_id", "url",
    )
    got = sorted(
        (r["url_norm"], r["doc_id"])
        for r in read_url_index(spark, state).collect()
    )
    want = sorted(
        (r["url_norm"], r["doc_id"])
        for r in dedup_by_url(docs, "doc_id", "url").collect()
    )
    assert got == want and len(got) > 0


def test_url_intake_first_seen_wins_across_epochs(spark, tmp_path):
    from umls2rdf_spark.streaming.webcurate import (
        read_url_index,
        run_url_dedup_intake,
    )

    docs = _url_frame(
        load_table(spark, SF_DIR, "documents").select("doc_id")
    )
    # epoch 0 = high ids, epoch 1 = low ids re-fetching the SAME
    # canonical urls: first-seen (epoch 0) must keep its admission
    # even though the batch operator over the union would prefer the
    # lower ids
    median = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    parts = [
        docs.where(F.col("doc_id") > median),
        docs.where(F.col("doc_id") <= median),
    ]
    src = _write_parts(spark, tmp_path, parts)
    state = str(tmp_path / "state")
    run_url_dedup_intake(
        _stream(spark, src), state, str(tmp_path / "ckpt"),
        "doc_id", "url",
    )
    idx = read_url_index(spark, state)
    # one admission per canonical url
    assert (
        idx.groupBy("url_norm").count().agg(F.max("count")).collect()[0][0]
        == 1
    )
    # every url first seen in epoch 0 is owned by an epoch-0 id
    ep0_urls = {
        r["url_norm"]
        for r in idx.where(F.col("batch_id") == 0).collect()
    }
    owners = {
        r["url_norm"]: r["doc_id"] for r in idx.collect()
    }
    for u in ep0_urls:
        assert owners[u] > median, u
