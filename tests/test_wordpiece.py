"""WordPiece tokenizer training + longest-match inference (SURVEY §2
C59) — exact-rational reference replica, oracle parity for all four
twins, local-finish equality, the adversarial-vocabulary valve, and
the fail-closed OOV contract."""

from __future__ import annotations

import collections
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle
from umls2rdf_spark.operators.wordpiece import (
    _SCALE,
    train_wordpiece,
    train_wordpiece_merges,
    train_wordpiece_merges_sql,
    wordpiece_doc_tokens,
    wordpiece_doc_tokens_sql,
    wordpiece_pieces,
    wordpiece_segment,
    wordpiece_segment_sql,
    wordpiece_vocab_after,
    wordpiece_vocab_after_sql,
)

FIXTURE = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
    "the dog and the fox share the lazy afternoon",
    "quick brown foxes and lazy dogs repeat the corpus",
]


# ── exact-rational reference replica (independent implementation) ──
def _ref_train_wp(texts: list[str], rounds: int, exact: bool):
    """Reference WordPiece trainer over the word-frequency table:
    likelihood score cnt(ab)/(cnt(a)*cnt(b)) as an EXACT Fraction
    (``exact=True``) or through the engine's 2^SCORE_BITS integer
    quantization (``exact=False``); ties by (a, b) ascending;
    replace left-to-right non-overlapping."""
    wf = collections.Counter(
        w for t in texts for w in t.split() if w != ""
    )
    seg = {w: ["|%02X|" % b for b in w.encode("utf-8")] for w in wf}
    merges = []
    for r in range(1, rounds + 1):
        pairs: collections.Counter = collections.Counter()
        syms: collections.Counter = collections.Counter()
        for w, ss in seg.items():
            for s in ss:
                syms[s] += wf[w]
            for a, b in zip(ss, ss[1:]):
                pairs[(a, b)] += wf[w]
        if not pairs:
            break

        def score(p):
            c = pairs[p]
            if exact:
                return Fraction(c, syms[p[0]] * syms[p[1]])
            return (c * _SCALE) // (syms[p[0]] * syms[p[1]])

        (a, b) = min(pairs, key=lambda p: (-score(p), p))
        merged = a[:-1] + b[1:]
        merges.append(
            (r, a, b, merged, pairs[(a, b)],
             (pairs[(a, b)] * _SCALE) // (syms[a] * syms[b]))
        )
        for w, ss in seg.items():
            out, i = [], 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == a and ss[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            seg[w] = out
    return merges, seg, wf


def _fixture_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURE)], "doc_id int, text string"
    )


def test_matches_exact_rational_replica(spark):
    """Engine merges == the Fraction-scored replica — i.e. on this
    corpus the 2^40 quantization never flips a non-tied comparison
    (scores of a <=1e3-total corpus differ by >= 1/denom^2 > 2^-40),
    and genuine rational ties break identically."""
    ref, _, _ = _ref_train_wp(FIXTURE, 12, exact=True)
    got = sorted(
        train_wordpiece_merges(
            _fixture_df(spark), "text", rounds=12
        ).collect(),
        key=lambda r: r["round"],
    )
    assert [
        (r["round"], r["pair_a"], r["pair_b"], r["merged"],
         r["cnt"], r["score_q"])
        for r in got
    ] == ref


def test_quantized_equals_exact_ordering():
    """The quality-evidence pin by itself: quantized and exact
    replicas agree round for round on the fixture."""
    exact, _, _ = _ref_train_wp(FIXTURE, 16, exact=True)
    quant, _, _ = _ref_train_wp(FIXTURE, 16, exact=False)
    assert exact == quant


def test_wordpiece_differs_from_bpe(spark):
    """The likelihood score must actually change training: on the
    fixture the WordPiece merge sequence is NOT the raw-count BPE
    sequence (else the new family is a re-label)."""
    from umls2rdf_spark.operators.bpe import train_bpe_merges

    df = _fixture_df(spark)
    wp = [
        (r["pair_a"], r["pair_b"])
        for r in train_wordpiece_merges(df, "text", rounds=8).collect()
    ]
    bpe = [
        (r["pair_a"], r["pair_b"])
        for r in train_bpe_merges(df, "text", rounds=8).collect()
    ]
    assert wp != bpe


def test_merges_match_oracle(spark, duck):
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    assert_matches_oracle(
        train_wordpiece_merges(docs, "text", rounds=4),
        duck,
        train_wordpiece_merges_sql(
            "SELECT * FROM documents", "text", rounds=4
        ),
    )


def test_vocab_after_matches_oracle(spark, duck):
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    assert_matches_oracle(
        wordpiece_vocab_after(docs, "text", rounds=3),
        duck,
        wordpiece_vocab_after_sql(
            "SELECT * FROM documents", "text", rounds=3
        ),
    )


def test_doc_tokens_match_oracle(spark, duck):
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    assert_matches_oracle(
        wordpiece_doc_tokens(docs, "doc_id", "text", rounds=3),
        duck,
        wordpiece_doc_tokens_sql(
            "SELECT * FROM documents", "doc_id", "text", rounds=3
        ),
    )


def test_segment_matches_oracle(spark, duck):
    """Longest-match inference under the trained vocab, both
    engines: train 3 rounds, segment the training corpus's own
    words greedily (which may differ from the training segs — the
    real WordPiece train/inference asymmetry)."""
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    _, vocab = train_wordpiece(docs, "text", rounds=3)
    pieces = wordpiece_pieces(vocab)
    assert_matches_oracle(
        wordpiece_segment(docs, pieces, "text"),
        duck,
        wordpiece_segment_sql(
            "SELECT * FROM documents", "text", rounds=3
        ),
    )


def test_segment_greedy_longest_replica(spark):
    """wordpiece_segment == a plain-Python greedy longest-match walk
    under the same piece set, including the n_subwords counts."""
    df = _fixture_df(spark)
    _, vocab = train_wordpiece(df, "text", rounds=10)
    pieces = {r["piece"] for r in wordpiece_pieces(vocab).collect()}
    got = {
        r["word"]: r["n_subwords"]
        for r in wordpiece_segment(df, wordpiece_pieces(vocab)).collect()
    }
    wf = collections.Counter(
        w for t in FIXTURE for w in t.split() if w != ""
    )
    exp = {}
    for w in wf:
        hx = w.encode("utf-8").hex().upper()
        pos, cnt, ok = 0, 0, True
        while pos < len(hx):
            take = 0
            for l in range(min(16 * 2, len(hx) - pos), 0, -2):
                if hx[pos:pos + l] in pieces:
                    take = l
                    break
            if take == 0:
                ok = False
                break
            pos += take
            cnt += 1
        if ok:
            exp[w] = cnt
    assert got == exp


def test_segment_drops_uncoverable_words(spark):
    """A vocab missing a byte drops exactly the words containing it
    (fail-closed), and keeps full counts for the rest."""
    df = _fixture_df(spark)
    _, vocab = train_wordpiece(df, "text", rounds=4)
    pieces = wordpiece_pieces(vocab).where(
        F.col("piece") != F.upper(F.hex(F.lit("z")))
    )
    out = wordpiece_segment(df, pieces, "text").collect()
    words = {r["word"] for r in out}
    assert "quartz" not in words and "dozen" not in words
    assert "quick" in words and "the" in words


@pytest.mark.parametrize("rounds", [4, 64, 96])
def test_local_finish_equals_distributed(spark, rounds):
    df = _fixture_df(spark)
    key = lambda r: r["round"]  # noqa: E731
    dist_m, dist_v = train_wordpiece(
        df, "text", rounds=rounds, local_finish=False
    )
    loc_m, loc_v = train_wordpiece(
        df, "text", rounds=rounds, local_finish=True
    )
    assert sorted(dist_m.collect(), key=key) == sorted(
        loc_m.collect(), key=key
    )
    assert sorted(dist_v.collect()) == sorted(loc_v.collect())


def test_pair_exhaustion_parity(spark):
    """Rounds past pair exhaustion: merge table stops early and the
    vocab empties, identically on both execution paths (the bpe
    exhaustion contract)."""
    df = spark.createDataFrame([(0, "ab ab")], "doc_id int, text string")
    # "ab" = 2 symbols -> 1 merge possible; ask for 5
    for lf in (False, True):
        m, v = train_wordpiece(df, "text", rounds=5, local_finish=lf)
        assert m.count() == 1
        assert v.count() == 0


def test_local_finish_collect_valve(spark):
    """Adversarial vocabulary (every word distinct): the guarded
    collect raises naming the valve; min_word_freq bounds it."""
    df = spark.range(64).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat(F.lit("tok"), F.col("id").cast("string")).alias("text"),
    )
    with pytest.raises(ValueError, match="min_word_freq"):
        train_wordpiece(
            df, "text", rounds=2, local_finish=True, max_collect_rows=8
        )
    m, v = train_wordpiece(
        df,
        "text",
        rounds=2,
        local_finish=True,
        min_word_freq=2,
        max_collect_rows=8,
    )
    # nothing reaches freq >= 2 -> empty training, exhaustion path
    assert m.count() == 0


def test_min_word_freq_parity_with_oracle(spark, duck):
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    assert_matches_oracle(
        train_wordpiece_merges(docs, "text", rounds=3, min_word_freq=3),
        duck,
        train_wordpiece_merges_sql(
            "SELECT * FROM documents", "text", rounds=3, min_word_freq=3
        ),
    )


def test_segment_covers_long_fully_merged_pieces(spark):
    """Production-budget hazard pinned: a word fully merged into a
    single piece LONGER than any fixed candidate cap must still be
    covered by the default walk (the cap now derives from the
    inventory's own longest piece)."""
    df = spark.createDataFrame(
        [(0, "internationalization internationalization")],
        "doc_id int, text string",
    )
    # 20 bytes -> fully merged after 19 rounds; ask for more and let
    # the walk's default cap follow the 20-byte piece
    _, vocab = train_wordpiece(df, "text", rounds=19)
    out = wordpiece_segment(df, wordpiece_pieces(vocab)).collect()
    assert len(out) == 1
    assert out[0]["word"] == "internationalization"
    assert out[0]["n_subwords"] == 1


def test_local_finish_production_round_count(spark):
    """The production path at a real merge budget: rounds=1000 on a
    prose-scale fixture completes in one collect + driver loop (the
    bpe.py rounds=1000 wall pin for the third family), merge rounds
    are sequential from 1, and every final segmentation symbol is a
    byte-aligned piece."""
    texts = [
        " ".join(
            f"w{(i * 7 + j) % 97}x{(i + j * 13) % 53}"
            for j in range(40)
        )
        for i in range(50)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges, vocab = train_wordpiece(
        df, "text", rounds=1000, local_finish=True
    )
    rows = sorted(merges.collect(), key=lambda r: r["round"])
    assert [r["round"] for r in rows] == list(
        range(1, len(rows) + 1)
    )
    assert len(rows) > 100  # a real budget actually trains
    segs = vocab.collect()
    if segs:  # not exhausted
        for r in segs[:50]:
            for sym in r["seg"].split(" "):
                assert sym.startswith("|") and sym.endswith("|")
                assert len(sym.replace("|", "")) % 2 == 0
