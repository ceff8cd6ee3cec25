"""Continuous near-dup intake: the foreachBatch loop must dedupe
across micro-batches via the growing band index, admit per the batch
operator's rule within a batch, and be idempotent under replay."""

from __future__ import annotations

from pyspark.sql import functions as F

BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog near the old river "
    "bank while the morning sun rises slowly over distant hills"
)
NEAR_TEXT = (
    "the quick brown fox jumps over the lazy dog near the old river "
    "bank while the evening sun rises slowly over distant hills"
)
OTHER_TEXT = (
    "completely different content about distributed query engines "
    "running columnar scans with vectorized execution and shuffles"
)
THIRD_TEXT = (
    "yet another unrelated document discussing watermarks state "
    "stores and micro batch execution semantics in streaming systems"
)


def _write_shard(spark, path, rows):
    # a real single FILE (not a Spark output directory): the file
    # stream source does not recurse into subdirectories
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        path,
    )


def _run(spark, in_dir, state_dir, ckpt_dir):
    from umls2rdf_spark.streaming.events import (
        run_incremental_minhash_ingest,
    )

    schema = spark.read.parquet(in_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    run_incremental_minhash_ingest(
        stream, state_dir, ckpt_dir, min_jaccard=0.5
    )
    return spark.read.parquet(f"{state_dir}/corpus")


def test_cross_batch_near_dup_dropped_and_replay_noop(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ckpt_dir = str(tmp_path / "ckpt")
    # shard A: an original + its exact dup (within-batch drop) …
    _write_shard(
        spark, f"{in_dir}/s1.parquet",
        [(1, BASE_TEXT), (3, BASE_TEXT), (5, OTHER_TEXT)],
    )
    # … shard B: a near-dup of shard A's doc (cross-batch drop, only
    # reachable through the persisted index) + a fresh doc
    _write_shard(
        spark, f"{in_dir}/s2.parquet",
        [(11, NEAR_TEXT), (13, THIRD_TEXT)],
    )
    corpus = _run(spark, in_dir, state_dir, ckpt_dir)
    admitted = sorted(
        r["doc_id"] for r in corpus.select("doc_id").collect()
    )
    # file order decides which of {1, 11} survives; every other
    # outcome is order-independent
    assert 3 not in admitted  # exact dup, within batch
    assert 5 in admitted and 13 in admitted
    assert len({1, 11} & set(admitted)) == 1  # near-dup pair: one side
    assert len(admitted) == 3

    # the index matches the corpus (one band-sig set per admitted doc)
    index = spark.read.parquet(f"{state_dir}/index")
    assert sorted(
        r["doc_id"] for r in index.select("doc_id").distinct().collect()
    ) == admitted

    # restart on the same checkpoint: no new files → state unchanged
    corpus2 = _run(spark, in_dir, state_dir, ckpt_dir)
    assert sorted(
        r["doc_id"] for r in corpus2.select("doc_id").collect()
    ) == admitted


def test_matches_batch_operator_per_epoch(spark, tmp_path):
    """One-shard stream ≡ the batch operator against an empty base."""
    from umls2rdf_spark.operators.dedup import incremental_minhash_dedupe

    in_dir = str(tmp_path / "in")
    rows = [(1, BASE_TEXT), (3, BASE_TEXT), (5, OTHER_TEXT),
            (7, NEAR_TEXT)]
    _write_shard(spark, f"{in_dir}/s1.parquet", rows)
    corpus = _run(
        spark, in_dir, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    shard = spark.createDataFrame(rows, ["doc_id", "text"])
    expected = incremental_minhash_dedupe(
        shard, shard.limit(0), "doc_id", "text", min_jaccard=0.5
    )
    assert sorted(r["doc_id"] for r in corpus.collect()) == sorted(
        r["doc_id"] for r in expected.collect()
    )


# ── fail-closed standing-state reads ────────────────────────────────
def test_read_standing_state_missing_path_is_none(spark, tmp_path):
    from umls2rdf_spark.streaming.events import read_standing_state

    assert read_standing_state(spark, str(tmp_path / "nope")) is None


def test_read_standing_state_corrupt_state_fails_closed(spark, tmp_path):
    """A standing-state dir that EXISTS but cannot be read (corrupt
    footer — the stand-in for any transient storage failure) must
    raise, not silently degrade to 'no state': degrading would admit
    every near-duplicate in the batch."""
    import pytest

    from umls2rdf_spark.streaming.events import read_standing_state

    bad = tmp_path / "corpus"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"PAR1 this is not parquet")
    with pytest.raises(Exception):
        read_standing_state(spark, str(bad))


def test_ingest_fails_batch_on_corrupt_standing_state(spark, tmp_path):
    """End-to-end: corrupt the standing corpus between two runs; the
    next micro-batch must FAIL (so the checkpoint will retry it)
    instead of admitting duplicates against an empty base."""
    import pytest
    from pyspark.errors import StreamingQueryException

    in_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ckpt_dir = str(tmp_path / "ckpt")
    _write_shard(spark, f"{in_dir}/s1.parquet", [(1, BASE_TEXT)])
    _run(spark, in_dir, state_dir, ckpt_dir)

    # corrupt the standing corpus, then feed a new shard holding an
    # exact duplicate of the admitted doc
    import glob
    import os

    for f in glob.glob(f"{state_dir}/corpus/**/*.parquet",
                       recursive=True):
        with open(f, "wb") as fh:
            fh.write(b"PAR1 garbage")
    _write_shard(spark, f"{in_dir}/s2.parquet", [(2, BASE_TEXT)])
    with pytest.raises((StreamingQueryException, Exception)):
        _run(spark, in_dir, state_dir, ckpt_dir)
    # and the duplicate was NOT admitted anywhere under batch_id=1
    admitted_dirs = [
        d for d in glob.glob(f"{state_dir}/corpus/batch_id=*")
        if os.path.isdir(d)
    ]
    for d in admitted_dirs:
        if d.endswith("batch_id=1"):
            files = glob.glob(f"{d}/*.parquet")
            assert not files, "duplicate admitted despite corrupt base"
