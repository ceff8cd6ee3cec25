"""incremental_minhash_dedupe: constructed near-dup fixtures, the
precomputed-index path, and the re-ingest no-op property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umls2rdf_spark.operators.dedup import (
    band_signatures,
    incremental_minhash_dedupe,
    minhash_signatures,
)

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


@pytest.fixture(scope="module")
def frames(spark):
    base = spark.createDataFrame(
        [(0, BASE_TEXT), (2, OTHER_TEXT)], ["doc_id", "text"]
    )
    shard = spark.createDataFrame(
        [
            (1, BASE_TEXT),    # exact dup of base 0
            (3, NEAR_TEXT),    # near-dup of base 0 (one word changed)
            (5, NEAR_TEXT),    # near-dup of shard 3 (and of base 0)
            (7, "a short isolated unique document with novel words"),
        ],
        ["doc_id", "text"],
    )
    return base, shard


def survivors(out):
    return sorted(r["doc_id"] for r in out.select("doc_id").collect())


def test_exact_and_near_dups_dropped(spark, frames):
    base, shard = frames
    out = incremental_minhash_dedupe(
        shard, base, "doc_id", "text", min_jaccard=0.5
    )
    assert survivors(out) == [7]


def test_threshold_one_keeps_near_dups(spark, frames):
    """At min_jaccard=1.0 only the exact duplicate can be dropped:
    the near-dup's shingle sets differ, so verification rescues it
    even though LSH banding proposed it."""
    base, shard = frames
    out = incremental_minhash_dedupe(
        shard, base, "doc_id", "text", min_jaccard=1.0
    )
    assert 1 not in survivors(out)
    assert {3, 7} <= set(survivors(out))


def test_precomputed_index_path_equivalent(spark, frames):
    """base_index= (the production form: the persisted band-sig
    index) must admit exactly the same shard rows as deriving the
    index from base_docs on the fly."""
    base, shard = frames
    idx = band_signatures(
        minhash_signatures(base, "doc_id", "text"), "doc_id"
    )
    on_the_fly = incremental_minhash_dedupe(
        shard, base, "doc_id", "text", min_jaccard=0.5
    )
    from_index = incremental_minhash_dedupe(
        shard, base, "doc_id", "text", min_jaccard=0.5, base_index=idx
    )
    assert survivors(on_the_fly) == survivors(from_index)


def test_reingest_is_noop(spark, frames):
    """Admitted docs folded into the base; re-ingesting the same
    shard (shifted ids, same texts) must admit nothing."""
    base, shard = frames
    admitted = incremental_minhash_dedupe(
        shard, base, "doc_id", "text", min_jaccard=0.5
    )
    grown = base.unionByName(admitted)
    reingest = shard.withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000)
    )
    out = incremental_minhash_dedupe(
        reingest, grown, "doc_id", "text", min_jaccard=0.5
    )
    assert survivors(out) == []


def test_band_collision_only_mode(spark, frames):
    """min_jaccard=None drops on banding alone (no verify joins) —
    strictly more aggressive than any verified threshold."""
    base, shard = frames
    banded = incremental_minhash_dedupe(
        shard, base, "doc_id", "text", min_jaccard=None
    )
    verified = incremental_minhash_dedupe(
        shard, base, "doc_id", "text", min_jaccard=0.5
    )
    assert set(survivors(banded)) <= set(survivors(verified))


def test_requires_base_source():
    with pytest.raises(ValueError):
        incremental_minhash_dedupe(None, None, "doc_id", "text")


def test_mapside_signatures_row_identical_zero_exchanges(spark, frames):
    """minhash_signatures_mapside must produce byte-identical rows to
    the explode+groupBy path with ZERO Exchange nodes — it is the
    streaming-legal and index-build-cheap variant."""
    from umls2rdf_spark.operators.dedup import minhash_signatures_mapside
    from umls2rdf_spark.plans.audit import plan_facts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        tuple(r)
        for r in minhash_signatures(docs, "doc_id", "text").collect()
    )
    b_df = minhash_signatures_mapside(docs, "doc_id", "text")
    b = sorted(tuple(r) for r in b_df.collect())
    assert a == b and len(a) > 0
    facts = plan_facts(b_df)
    assert facts["exchanges"] == 0
    assert facts["python_evals"] == 0


def test_admission_is_partitioning_invariant(spark):
    """The admitted set must not depend on physical layout — same
    result at 1 partition and 16, shuffled input order. Guards the
    drop rule against any accidental order dependence (first-wins
    instead of min-id, nondeterministic tie-breaks)."""
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    def doc(i):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(30)]
        return (i, " ".join(words))

    rows = [doc(i) for i in range(60)]
    # inject near-dup structure: clones with one word changed
    for i in range(60, 80):
        src_id, text = rows[i - 60]
        words = text.split()
        words[rng.randrange(len(words))] = "mutated"
        rows.append((i, " ".join(words)))
    base_rows = rows[:40]
    shard_rows = rows[40:]

    results = []
    for n_parts, seed in ((1, 0), (16, 1)):
        shuffled = list(shard_rows)
        random.Random(seed).shuffle(shuffled)
        base = spark.createDataFrame(base_rows, ["doc_id", "text"]).repartition(n_parts)
        shard = spark.createDataFrame(shuffled, ["doc_id", "text"]).repartition(n_parts)
        out = incremental_minhash_dedupe(
            shard, base, "doc_id", "text", min_jaccard=0.4
        )
        results.append(survivors(out))
    assert results[0] == results[1]
    assert 0 < len(results[0]) < len(shard_rows)  # non-trivial case


def test_provided_shard_sigs_slice_equivalent(spark, frames):
    """round 9: the text_scoring key persists ONE full-corpus
    signature frame and slices it per shard. The signature expression
    is a pure per-row projection, so sigs(df.where(p)) ==
    sigs(df).where(p), and passing the slice as ``shard_sigs`` (plus
    the base slice as the index) must admit exactly the same rows as
    computing signatures inside the operator."""
    from umls2rdf_spark.operators.dedup import minhash_signatures_mapside

    base, shard = frames
    all_docs = base.unionByName(shard)
    all_sigs = minhash_signatures_mapside(all_docs, "doc_id", "text")
    inline = incremental_minhash_dedupe(
        shard, base, "doc_id", "text", min_jaccard=0.5
    )
    sliced = incremental_minhash_dedupe(
        shard, base, "doc_id", "text", min_jaccard=0.5,
        base_index=band_signatures(
            all_sigs.where(F.col("doc_id") % 2 == 0), "doc_id"
        ),
        shard_sigs=all_sigs.where(F.col("doc_id") % 2 == 1),
    )
    assert survivors(inline) == survivors(sliced)
    # the slice itself is row-identical to signing the slice
    a = sorted(map(tuple, all_sigs.where(F.col("doc_id") % 2 == 1).collect()))
    b = sorted(map(tuple, minhash_signatures_mapside(shard, "doc_id", "text").collect()))
    assert a == b
