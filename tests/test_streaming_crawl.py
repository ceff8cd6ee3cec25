"""Continuous crawl intake (streaming/crawl.py): the full
curate_crawl chain as ONE foreachBatch loop over shared standing
state. Pins: single-epoch == batch curate_crawl (admitted set, funnel
counts, packed spans), multi-epoch URL first-seen / cap-holds /
near-dup-vs-standing-corpus semantics, and replay no-op."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from tests.test_crawl_pipeline import _PSL, _fixture, _page
from umls2rdf_spark.plans.crawl_pipeline import curate_crawl
from umls2rdf_spark.sources.warc import make_warc_bytes
from umls2rdf_spark.streaming.crawl import (
    crawl_epoch,
    read_epoch_table,
    run_crawl_intake,
)

_NEW_GOOD = (
    "a small observatory on the ridge opens its dome on clear "
    "nights and the volunteers log every pass of the bright "
    "satellites while the kettle hums on the old iron stove in the "
    "corner of the warm room"
)
# good4 from the epoch-1 fixture: EXACTLY one of the beta/epsilon
# near-dup pair carrying this text is always admitted in epoch 1, so
# an epoch-2 copy is guaranteed to hit the standing corpus (good3's
# alpha.com page may instead be the one the domain cap cuts)
_GOOD4 = (
    "the committee reviewed a long list of proposals and voted "
    "to fund the bridge repairs first because the inspection "
    "report had flagged serious rust in the main cables and in "
    "several of the anchor plates"
)


def _epoch2_warc(tmp_path) -> str:
    """Epoch-2 fixture: one blocked by each standing-state gate plus
    one genuinely new admission."""
    records = [
        # re-fetch of an epoch-1 ADMITTED URL -> first-seen-wins
        {"type": "response", "uri": "http://delta.com/p",
         "payload": _page(_NEW_GOOD + " refetched body differs")},
        # new page on alpha.com (cap=2 already used) -> cap blocks
        {"type": "response", "uri": "http://alpha.com/d",
         "payload": _page(_NEW_GOOD + " alpha extra page")},
        # exact copy of epoch-1 admitted text on a NEW domain ->
        # near-dup vs the standing corpus blocks
        {"type": "response", "uri": "http://omicron.com/copy4",
         "payload": _page(_GOOD4)},
        # genuinely new -> admitted
        {"type": "response", "uri": "http://sigma.com/new",
         "payload": _page(_NEW_GOOD)},
    ]
    path = str(tmp_path / "crawl2.warc")
    with open(path, "wb") as f:
        f.write(make_warc_bytes(records))
    return path


def _raw_frame(spark, path):
    return spark.read.option("lineSep", "WARC/1.").text(path)


def test_single_epoch_equals_batch(spark, tmp_path):
    """Cold-state epoch 0 == batch curate_crawl on the same WARC with
    an empty base: same funnel counts, same admitted ids, same packed
    token spans."""
    path, _base_text = _fixture(tmp_path)
    empty = spark.createDataFrame([], "doc_id long, text string")
    packed_b, counts_b, frames_b = curate_crawl(
        spark, path, empty, _PSL, cap=2, seq_len=32
    )
    state = str(tmp_path / "state")
    counts_s = crawl_epoch(
        _raw_frame(spark, path), 0, state, _PSL, cap=2, seq_len=32
    )
    assert counts_s == {k: v["direct"] for k, v in counts_b.items()}
    got_ids = {
        r["doc_id"]
        for r in read_epoch_table(spark, state, "corpus").collect()
    }
    want_ids = {
        r["doc_id"] for r in frames_b["near_dup"].select("doc_id").collect()
    }
    assert got_ids == want_ids
    packed_s = read_epoch_table(spark, state, "packed").drop("batch_id")
    assert sorted(map(tuple, packed_s.collect())) == sorted(
        map(tuple, packed_b.select(*packed_s.columns).collect())
    )
    # funnel table matches the returned counts, in stage order
    fun = {
        r["stage"]: r["n_rows"]
        for r in read_epoch_table(spark, state, "funnel").collect()
    }
    assert fun == counts_s
    for f in frames_b.values():
        f.unpersist()


def test_multi_epoch_semantics_and_replay(spark, tmp_path):
    """Epoch 1: each standing-state gate blocks its designated record
    (URL first-seen, cap-holds-across-epochs, near-dup vs standing
    corpus); the new document is admitted. Replaying either epoch is
    a no-op on all standing state."""
    path1, _ = _fixture(tmp_path)
    path2 = _epoch2_warc(tmp_path)
    state = str(tmp_path / "state")
    crawl_epoch(_raw_frame(spark, path1), 0, state, _PSL,
                cap=2, seq_len=32)
    counts2 = crawl_epoch(_raw_frame(spark, path2), 1, state, _PSL,
                          cap=2, seq_len=32)
    # all four epoch-2 records are quality pages on distinct URLs
    assert counts2["ingest"] == 4
    assert counts2["quality_gate"] == 4
    # delta.com/p re-fetch blocked by the standing URL index
    assert counts2["url_dedup"] == 3
    # alpha.com/d blocked by the standing cap admissions
    assert counts2["domain_cap"] == 2
    # omicron copy blocked vs standing corpus; sigma admitted
    assert counts2["near_dup"] == 1
    corpus = read_epoch_table(spark, state, "corpus")
    e1 = {r["url"] for r in corpus.where("batch_id = 0").collect()}
    e2 = {r["url"] for r in corpus.where("batch_id = 1").collect()}
    assert e2 == {"http://sigma.com/new"}
    assert "http://delta.com/p" in e1 or any(
        u.startswith("http://delta.com/p") for u in e1
    )
    # cap NEVER exceeded across the union of epochs
    cap_rows = read_epoch_table(spark, state, "capidx")
    per_dom = {
        r["reg_domain"]: r["n"]
        for r in cap_rows.groupBy("reg_domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(n <= 2 for n in per_dom.values()), per_dom

    def state_snapshot():
        snap = {}
        for t in ("urlidx", "capidx", "corpus", "funnel", "packed"):
            snap[t] = sorted(
                map(tuple, read_epoch_table(spark, state, t).collect())
            )
        return snap

    before = state_snapshot()
    # at-least-once replay of BOTH epochs, in order
    replay1 = crawl_epoch(_raw_frame(spark, path1), 0, state, _PSL,
                          cap=2, seq_len=32)
    replay2 = crawl_epoch(_raw_frame(spark, path2), 1, state, _PSL,
                          cap=2, seq_len=32)
    assert replay2 == counts2
    assert state_snapshot() == before
    # replay1's counts equal epoch 0's persisted funnel rows
    fun0 = {
        r["stage"]: r["n_rows"]
        for r in read_epoch_table(spark, state, "funnel")
        .where("batch_id = 0").collect()
    }
    assert replay1 == fun0


def test_stream_driver_end_to_end(spark, tmp_path):
    """The actual Structured Streaming loop: two availableNow passes
    over a landing directory (epoch 0 = first WARC, epoch 1 = the
    second file only — the checkpoint prevents any re-read), ending
    in the same standing state as the direct-epoch runs."""
    path1, _ = _fixture(tmp_path)
    path2 = _epoch2_warc(tmp_path)
    land = str(tmp_path / "land")
    os.makedirs(land)
    state = str(tmp_path / "sstate")
    ckpt = str(tmp_path / "ckpt")
    shutil.copy(path1, os.path.join(land, "crawl1.warc"))
    run_crawl_intake(spark, land, state, ckpt, _PSL, cap=2, seq_len=32)
    n_e0 = read_epoch_table(spark, state, "corpus").count()
    shutil.copy(path2, os.path.join(land, "crawl2.warc"))
    run_crawl_intake(spark, land, state, ckpt, _PSL, cap=2, seq_len=32)
    corpus = read_epoch_table(spark, state, "corpus")
    assert corpus.where("batch_id = 0").count() == n_e0
    e2 = {r["url"] for r in corpus.where("batch_id = 1").collect()}
    assert e2 == {"http://sigma.com/new"}
    # funnel rows exist for both epochs, 7 stages each
    fun = read_epoch_table(spark, state, "funnel")
    assert fun.groupBy("batch_id").count().count() == 2
    assert fun.count() == 14


def test_decontam_stage_single_epoch_equals_batch(spark, tmp_path):
    """The composed intake with the decontamination stage: cold-state
    epoch 0 against a staged benchmark equals batch curate_crawl with
    the same benchmark — funnel counts (incl. the decontam row) and
    packed spans."""
    from umls2rdf_spark.streaming.decontam import stage_benchmark

    path, _ = _fixture(tmp_path)
    empty = spark.createDataFrame([], "doc_id long, text string")
    _p0, _c0, frames0 = curate_crawl(
        spark, path, empty, _PSL, cap=2, seq_len=32
    )
    delta_text = [
        r["text"]
        for r in frames0["near_dup"].collect()
        if "delta.com" in r["url"]
    ][0]
    for f in frames0.values():
        f.unpersist()
    bench = spark.createDataFrame(
        [(1, delta_text)], "bench_id long, text string"
    )
    packed_b, counts_b, frames_b = curate_crawl(
        spark, path, empty, _PSL, cap=2, seq_len=32, benchmark=bench
    )
    state = str(tmp_path / "state")
    stage_benchmark(bench, state, "bench_id", "text")
    counts_s = crawl_epoch(
        _raw_frame(spark, path), 0, state, _PSL, cap=2, seq_len=32,
        decontaminate=True,
    )
    assert counts_s == {k: v["direct"] for k, v in counts_b.items()}
    assert "decontam" in counts_s
    packed_s = read_epoch_table(spark, state, "packed").drop("batch_id")
    assert sorted(map(tuple, packed_s.collect())) == sorted(
        map(tuple, packed_b.select(*packed_s.columns).collect())
    )
    fun = {
        r["stage"]: r["n_rows"]
        for r in read_epoch_table(spark, state, "funnel").collect()
    }
    assert fun == counts_s
    for f in frames_b.values():
        f.unpersist()
