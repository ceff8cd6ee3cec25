"""Byte-level BPE tokenizer training (SURVEY §2 C42) — plain-Python
reference replica, oracle parity, tie-break pin, and the
apply-merges round trip."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle
from umls2rdf_spark.operators.bpe import (
    segment_words,
    train_bpe_merges,
    train_bpe_merges_sql,
    word_freqs,
)


# ── plain-Python reference trainer (independent implementation) ────
def _ref_train(texts: list[str], rounds: int):
    """Reference BPE over the word-frequency table: symbols are
    |-wrapped uppercase byte hex, merges replace left-to-right
    non-overlapping, ties broken by (a, b) ascending."""
    wf = collections.Counter(
        w for t in texts for w in t.split() if w != ""
    )
    seg = {
        w: ["|%02X|" % b for b in w.encode("utf-8")] for w in wf
    }
    merges = []
    for r in range(1, rounds + 1):
        pairs = collections.Counter()
        for w, syms in seg.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wf[w]
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merged = a[:-1] + b[1:]
        merges.append((r, a, b, merged, cnt))
        for w, syms in seg.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seg[w] = out
    return merges, seg, wf


_CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "héllo héllo naïve",          # multi-byte UTF-8 symbols
    "aaa aa aaaa",                # overlapping same-symbol runs
    "xy xy yx yx",                # tie-break exercise
    "low\tnewer\n aaa  xy",       # whitespace-run tokenization
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in _CORPUS], ["text"])
    got = sorted(
        tuple(r) for r in train_bpe_merges(df, "text", rounds=5)
        .select("round", "pair_a", "pair_b", "merged", "cnt")
        .collect()
    )
    exp, _, _ = _ref_train(_CORPUS, rounds=5)
    assert got == sorted(exp)


def test_tie_break_is_pair_ascending(spark):
    # |78||79| ("xy") and |79||78| ("yx") tie at 2 — the ascending
    # pair must win round 1 in both engines' collation
    df = spark.createDataFrame(
        [("xy xy",), ("yx yx",)], ["text"]
    )
    top = train_bpe_merges(df, "text", rounds=1).collect()[0]
    assert (top["pair_a"], top["pair_b"]) == ("|78|", "|79|")
    assert top["cnt"] == 2


def test_oracle_parity_at_oracle_sf(spark, duck):
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    assert_matches_oracle(
        train_bpe_merges(docs, "text", rounds=3),
        duck,
        train_bpe_merges_sql(
            "SELECT * FROM documents", "text", rounds=3
        ),
    )


def test_segment_words_round_trip(spark):
    """Applying the trained merge table: every word's final
    segmentation concatenates back to its exact byte hex (no bytes
    lost or invented), subword count shrinks only for words
    containing a merged pair, and the reference replica agrees."""
    df = spark.createDataFrame([(t,) for t in _CORPUS], ["text"])
    merges = train_bpe_merges(df, "text", rounds=5)
    segged = segment_words(df, merges, "text").collect()
    _, ref_seg, ref_wf = _ref_train(_CORPUS, rounds=5)
    assert {r["word"] for r in segged} == set(ref_wf)
    for r in segged:
        syms = r["seg"].split(" ")
        assert syms == ref_seg[r["word"]]
        assert r["n_subwords"] == len(syms)
        joined = "".join(s.strip("|") for s in syms)
        assert joined == r["word"].encode("utf-8").hex().upper()
        assert r["freq"] == ref_wf[r["word"]]


def test_word_freqs_whitespace_runs(spark):
    df = spark.createDataFrame(
        [("a\tb\n\n c  a",), ("", ), ("   ",)], ["text"]
    )
    got = {
        r["word"]: r["freq"] for r in word_freqs(df, "text").collect()
    }
    assert got == {"a": 2, "b": 1, "c": 1}


def test_no_python_udfs_and_bounded_final_plan(spark):
    """The returned merge frame is a union of checkpointed 1-row
    frames — constant-size plan regardless of round count — and the
    whole family is codegen Column ops (no Python eval anywhere)."""
    df = spark.createDataFrame([(t,) for t in _CORPUS], ["text"])
    out = train_bpe_merges(df, "text", rounds=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_vocab_after_matches_reference_and_oracle(spark, duck):
    from umls2rdf_spark.operators.bpe import (
        bpe_vocab_after,
        bpe_vocab_after_sql,
    )

    # reference seg lengths on the adversarial corpus
    df = spark.createDataFrame([(t,) for t in _CORPUS], ["text"])
    got = {
        r["word"]: (r["freq"], r["n_subwords"])
        for r in bpe_vocab_after(df, "text", rounds=5).collect()
    }
    _, ref_seg, ref_wf = _ref_train(_CORPUS, rounds=5)
    assert got == {
        w: (ref_wf[w], len(ref_seg[w])) for w in ref_wf
    }
    # oracle parity at the driver's SF
    from tests.conftest import SF_DIR_ORACLE
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    assert_matches_oracle(
        bpe_vocab_after(docs, "text", rounds=3),
        duck,
        bpe_vocab_after_sql("SELECT * FROM documents", "text", rounds=3),
    )


def test_one_run_feeds_both_artifacts(spark):
    """train_bpe returns (merges, vocab) from ONE run; the vocab's
    total subword count equals initial byte count minus one per
    merge occurrence applied — conservation, no bytes lost."""
    from umls2rdf_spark.operators.bpe import train_bpe

    df = spark.createDataFrame([(t,) for t in _CORPUS], ["text"])
    merges, vocab = train_bpe(df, "text", rounds=5)
    rows = vocab.collect()
    total_sub = sum(
        r["freq"] * len(r["seg"].split(" ")) for r in rows
    )
    total_bytes = sum(
        r["freq"] * len(r["word"].encode("utf-8")) for r in rows
    )
    _, ref_seg, ref_wf = _ref_train(_CORPUS, rounds=5)
    ref_sub = sum(
        ref_wf[w] * len(ref_seg[w]) for w in ref_wf
    )
    assert total_sub == ref_sub
    assert total_sub < total_bytes  # merges actually compressed


def test_bpe_doc_tokens_matches_oracle(spark, duck):
    from umls2rdf_spark.operators.bpe import (
        bpe_doc_tokens,
        bpe_doc_tokens_sql,
    )
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    assert_matches_oracle(
        bpe_doc_tokens(docs, "doc_id", "text", rounds=4),
        duck,
        bpe_doc_tokens_sql(
            "SELECT * FROM documents", "doc_id", "text", rounds=4
        ),
    )


def test_bpe_doc_tokens_conserves_vocab_totals(spark):
    # sum over docs of n_bpe_tokens == sum over vocab of
    # freq * n_subwords (every word occurrence accounted once)
    from pyspark.sql import functions as F

    from umls2rdf_spark.operators.bpe import bpe_doc_tokens, train_bpe

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], ["doc_id", "text"]
    )
    _, vocab = train_bpe(df, "text", rounds=3)
    per_doc = bpe_doc_tokens(df, "doc_id", "text", vocab=vocab)
    doc_total = per_doc.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    vocab_total = vocab.select(
        F.sum(
            F.col("freq") * F.size(F.split("seg", " "))
        ).alias("t")
    ).collect()[0][0]
    assert doc_total == vocab_total
    # and n_words matches the plain whitespace count per doc
    words = {
        r.doc_id: r.n_words for r in per_doc.collect()
    }
    for i, t in enumerate(_CORPUS):
        assert words[i] == len(t.split())


# ── local-finish path (production merge counts) ─────────────────────
def _as_tuples(merges_df):
    return sorted(
        tuple(r)
        for r in merges_df.select(
            "round", "pair_a", "pair_b", "merged", "cnt"
        ).collect()
    )


def test_local_finish_equals_distributed_rounds_4(spark):
    """Both artifacts byte-equal across the two execution paths."""
    from umls2rdf_spark.operators.bpe import train_bpe

    df = spark.createDataFrame([(t,) for t in _CORPUS], ["text"])
    m_d, v_d = train_bpe(df, "text", rounds=4, local_finish=False)
    m_l, v_l = train_bpe(df, "text", rounds=4, local_finish=True)
    assert _as_tuples(m_d) == _as_tuples(m_l)
    assert sorted(tuple(r) for r in v_d.collect()) == sorted(
        tuple(r) for r in v_l.collect()
    )


def test_local_finish_equals_distributed_through_exhaustion(spark):
    """rounds=64 exhausts the tiny corpus's pairs well before the
    round budget: BOTH paths must stop emitting merges at the same
    round AND both must empty the vocab (the distributed form's
    crossJoin-with-empty-top behavior, replicated exactly)."""
    from umls2rdf_spark.operators.bpe import train_bpe

    df = spark.createDataFrame([(t,) for t in _CORPUS], ["text"])
    m_d, v_d = train_bpe(df, "text", rounds=64, local_finish=False)
    m_l, v_l = train_bpe(df, "text", rounds=64, local_finish=True)
    got_d, got_l = _as_tuples(m_d), _as_tuples(m_l)
    assert got_d == got_l
    assert 0 < len(got_l) < 64  # exhaustion actually happened
    assert v_d.count() == 0 and v_l.count() == 0


def test_local_finish_matches_reference_rounds_512(spark):
    """Deep-round equality vs the independent recount-from-scratch
    replica — validates the heap's incremental count maintenance and
    lazy invalidation at depth (the naive replica recounts every
    pair every round; the operator must land on the same winners)."""
    from umls2rdf_spark.operators.bpe import train_bpe

    corpus = [
        " ".join(
            "w%d%s" % (i, "abcdefghij"[: (i * 7) % 9 + 2])
            for i in range(j, j + 40)
        )
        for j in range(0, 400, 40)
    ]
    df = spark.createDataFrame([(t,) for t in corpus], ["text"])
    m_l, v_l = train_bpe(df, "text", rounds=512)  # auto → local
    exp, ref_seg, ref_wf = _ref_train(corpus, rounds=512)
    assert _as_tuples(m_l) == sorted(exp)
    if len(exp) == 512:
        got = {
            r["word"]: (r["freq"], r["seg"].split(" "))
            for r in v_l.collect()
        }
        assert got == {
            w: (ref_wf[w], ref_seg[w]) for w in ref_wf
        }
    else:
        assert v_l.count() == 0


def test_local_finish_wall_rounds_1000(spark):
    """The point of the path: 1000 merges complete in seconds (the
    per-round distributed form would be ~2000 serial Spark jobs).
    Generous bound — an idle box does this in single-digit seconds,
    dominated by the one word_freqs job."""
    import time

    from umls2rdf_spark.operators.bpe import train_bpe

    corpus = [
        " ".join(
            "tok%04d%s" % (i, "qrstuvwxyz"[: (i * 3) % 8 + 3])
            for i in range(j, j + 100)
        )
        for j in range(0, 4000, 100)
    ]
    df = spark.createDataFrame([(t,) for t in corpus], ["text"])
    t0 = time.monotonic()
    m, v = train_bpe(df, "text", rounds=1000)  # auto → local
    n_merges = m.count()
    wall = time.monotonic() - t0
    assert n_merges == 1000, n_merges
    assert v.count() > 0
    assert wall < 120, f"local-finish took {wall:.1f}s"


# ── min_word_freq valve + collect guard (the adversarial-vocabulary
#    hazard that unigram_lm_train already closed; VERDICT r7 weak
#    mark) ──────────────────────────────────────────────────────────
_ADVERSARIAL = [
    # every word distinct (boilerplate-id shape): the (word, freq)
    # frame is CORPUS-sized, the exact non-Heaps case the valve
    # exists for — reuses the unigram tiny-alphabet construction
    " ".join("id%06d" % (j * 50 + i) for i in range(50))
    for j in range(20)
]
_MIXED = _ADVERSARIAL + [
    "the cat sat on the mat the cat",
    "the cat ran to the mat and sat",
] * 3


def test_local_finish_collect_guard_raises(spark):
    """An adversarial vocabulary must NOT reach driver heap: the
    limit(max+1) probe trips and the error names the valve."""
    import pytest

    from umls2rdf_spark.operators.bpe import train_bpe

    df = spark.createDataFrame([(t,) for t in _ADVERSARIAL], ["text"])
    with pytest.raises(ValueError, match="min_word_freq"):
        train_bpe(
            df, "text", rounds=100,  # auto → local finish
            max_collect_rows=100,
        )


def test_local_finish_valve_bounds_and_trains(spark):
    """min_word_freq=2 drops the 1000 distinct boilerplate ids, the
    guarded collect passes under the same tight bound, and training
    proceeds on the repeated-word core."""
    from umls2rdf_spark.operators.bpe import train_bpe

    df = spark.createDataFrame([(t,) for t in _MIXED], ["text"])
    m, v = train_bpe(
        df, "text", rounds=100, min_word_freq=2, max_collect_rows=100
    )
    words = {r["word"] for r in v.collect()} if v.count() else set()
    # trained state never contained a hapax id
    assert not any(w.startswith("id") for w in words)
    assert m.count() > 0


def test_min_word_freq_parity_both_paths_and_oracle(spark, duck):
    """freq>=2 training: local-finish == distributed == DuckDB twin
    (the HAVING lands in __wf so every downstream CTE sees the same
    filtered vocabulary), and bpe_vocab_after drops hapax words
    fail-closed in both engines."""
    from umls2rdf_spark.operators.bpe import (
        bpe_vocab_after,
        bpe_vocab_after_sql,
        train_bpe,
        train_bpe_merges_sql,
    )

    corpus = _CORPUS + ["hapax~ héllo low"]
    df = spark.createDataFrame([(t,) for t in corpus], ["text"])
    m_d, v_d = train_bpe(
        df, "text", rounds=3, local_finish=False, min_word_freq=2
    )
    m_l, v_l = train_bpe(
        df, "text", rounds=3, local_finish=True, min_word_freq=2
    )
    assert _as_tuples(m_d) == _as_tuples(m_l)
    assert sorted(tuple(r) for r in v_d.collect()) == sorted(
        tuple(r) for r in v_l.collect()
    )
    inline = "SELECT * FROM (VALUES " + ", ".join(
        "('%s')" % t.replace("'", "''") for t in corpus
    ) + ") AS v(text)"
    assert_matches_oracle(
        m_d, duck,
        train_bpe_merges_sql(inline, "text", rounds=3, min_word_freq=2),
    )
    va = bpe_vocab_after(df, "text", rounds=3, min_word_freq=2)
    assert "hapax~" not in {r["word"] for r in va.collect()}
    assert_matches_oracle(
        va, duck,
        bpe_vocab_after_sql(inline, "text", rounds=3, min_word_freq=2),
    )
