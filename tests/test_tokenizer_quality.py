"""Tokenizer-quality bounds (round-7 verdict item 2): the measured
comparisons in tools/tokenizer_quality.py, pinned with slack so a
regression in either trainer's quality (not just its parity) fails
loudly. Numbers recorded in SCALE.md."""

from __future__ import annotations

from tools.tokenizer_quality import (
    PROSE,
    bpe_comparison,
    sennrich_train,
    unigram_comparison,
)


def test_byte_bpe_tracks_sennrich_compression(spark):
    """At an equal 128-merge budget on the prose fixture, the
    engine's byte-BPE (GPT-2 formulation: bytes, no end-of-word
    marker) compresses at least as well as Sennrich char-BPE and
    within 15% either way — the formulations differ (the </w> fusing
    burns merges on word-final units), but tokens/word must track."""
    b = bpe_comparison(spark, 128)
    assert b["sennrich_merges_done"] == 128
    assert 0.85 <= b["ratio"] <= 1.05, b
    # sanity: both genuinely compress (chars/word ~5-6 on this text)
    assert b["byte_bpe_tokens_per_word"] < 3.5
    assert b["sennrich_tokens_per_word"] < 3.5


def test_sennrich_replica_basics():
    """The reference replica itself behaves like learn_bpe: </w> is
    fused to the last char, merges reduce total symbol count."""
    merges, seg, wf = sennrich_train(PROSE, 10)
    assert len(merges) == 10
    assert all(syms[-1].endswith("</w>") for syms in seg.values())
    tok0 = sum(
        (len(w) if len(w) == 1 else len(w)) * f for w, f in wf.items()
    )
    tok = sum(len(seg[w]) * f for w, f in wf.items())
    assert tok < tok0


def test_unigram_greedy_near_viterbi(spark):
    """The greedy E-step's measured gap to Viterbi under the SAME
    trained costs is immaterial on realistic English: cost-optimal
    on >= 90% of words, mean excess cost < 1%, and the token count a
    pipeline consumes within 0.5% of the Viterbi count. (Measured:
    97.95% / 0.10% / 0.0% — tools/tokenizer_quality.py; this is the
    evidence that a Viterbi E-step option is not needed for token
    accounting.)"""
    u = unigram_comparison(spark)
    assert u["greedy_cost_optimal_pct"] >= 90.0, u
    assert u["mean_excess_cost_pct"] < 1.0, u
    assert abs(u["token_delta_pct"]) <= 0.5, u


def test_segment_words_deep_merge_table_equals_training_vocab(spark):
    """The chunked-replace application path at a PRODUCTION-depth
    merge table (1000 merges — the depth that StackOverflowed the
    single-expression form): applying the merge table to the
    training corpus reproduces the trainer's own final vocab
    segmentation byte-for-byte."""
    from umls2rdf_spark.operators.bpe import segment_words, train_bpe

    corpus = [
        " ".join(
            "tok%04d%s" % (i, "qrstuvwxyz"[: (i * 3) % 8 + 3])
            for i in range(j, j + 100)
        )
        for j in range(0, 4000, 100)
    ]
    df = spark.createDataFrame([(t,) for t in corpus], ["text"])
    merges, vocab = train_bpe(df, "text", rounds=1000)
    assert merges.count() == 1000
    got = {
        r["word"]: r["seg"]
        for r in segment_words(df, merges).collect()
    }
    want = {r["word"]: r["seg"] for r in vocab.collect()}
    assert got == want


def test_wordpiece_inference_tracks_training(spark):
    """The train/inference asymmetry is bounded on the prose fixture:
    greedy longest-match coverage stays high and the inference
    token count stays within a band of the training segmentation."""
    from tools.tokenizer_quality import wordpiece_comparison

    w = wordpiece_comparison(spark, 128)
    assert w["merges_done"] == 128
    assert w["infer_coverage_pct"] >= 95.0, w
    # likelihood-max merges rare-but-correlated pairs first, so at a
    # small budget WordPiece compresses more slowly than count-max
    # BPE (measured 3.54 vs 2.28 tok/word at 128) — sanity band only
    assert w["train_tokens_per_word"] < 4.5
    assert w["infer_tokens_per_word"] is not None
    # longest-match can only use pieces the training run produced,
    # so per covered word it is at least as compact as chars and
    # within a modest band of the training replay
    ratio = w["infer_tokens_per_word"] / w["train_tokens_per_word"]
    assert 0.7 <= ratio <= 1.3, w
