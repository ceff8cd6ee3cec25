"""Corpus selection + semantic dedup: oracle parity and the
properties that make them safe at scale (partition invariance,
prefix/subset behavior, no-upsample feasibility)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE
from umls2rdf_spark.operators.selection import (
    resample_mixture,
    resample_mixture_sql,
    select_to_token_budget,
    select_to_token_budget_sql,
)
from umls2rdf_spark.operators.similarity import semantic_dedup
from umls2rdf_spark.sources.parquet import load_table

_TOKED_SQL = (
    "(SELECT *, CAST(len(list_filter(string_split(text, ' '), "
    "t -> t <> '')) AS INT) AS ntok FROM documents)"
)


def _toked(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    return docs.withColumn(
        "ntok",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")),
    )


# ── select_to_token_budget ──────────────────────────────────────────
@pytest.mark.parametrize("budget", [0, 5_000, 12_000, 10_000_000])
def test_token_budget_matches_oracle(spark, duck, budget):
    got = sorted(
        (r.doc_id, r.ntok)
        for r in select_to_token_budget(
            _toked(spark), "doc_id", "ntok", "n_chars", budget
        ).collect()
    )
    sql = select_to_token_budget_sql(
        _TOKED_SQL, "doc_id", "ntok", "n_chars", budget,
        cols="doc_id, ntok",
    )
    exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == exp


def test_token_budget_is_prefix_and_monotone(spark):
    """A smaller budget's selection is a subset of a larger one, and
    the admitted token total never exceeds the budget."""
    toked = _toked(spark)
    small = {
        r.doc_id
        for r in select_to_token_budget(
            toked, "doc_id", "ntok", "n_chars", 5_000
        ).collect()
    }
    rows = select_to_token_budget(
        toked, "doc_id", "ntok", "n_chars", 12_000
    ).collect()
    large = {r.doc_id for r in rows}
    assert small <= large
    assert sum(r.ntok for r in rows) <= 12_000


def test_token_budget_partition_invariant(spark):
    """Same selection regardless of input partitioning/order — the
    admission order is data-derived (score, id-hash shard, id)."""
    toked = _toked(spark)
    a = {
        r.doc_id
        for r in select_to_token_budget(
            toked.repartition(17), "doc_id", "ntok", "n_chars", 9_000
        ).collect()
    }
    b = {
        r.doc_id
        for r in select_to_token_budget(
            toked.orderBy(F.col("doc_id").desc()).coalesce(1),
            "doc_id", "ntok", "n_chars", 9_000,
        ).collect()
    }
    assert a == b


def test_token_budget_rejects_negative(spark):
    with pytest.raises(ValueError):
        select_to_token_budget(
            _toked(spark), "doc_id", "ntok", "n_chars", -1
        )


# ── resample_mixture ────────────────────────────────────────────────
_PARTS = {"src0": 4, "src1": 2, "src2": 2, "src3": 1, "src4": 1}


def test_mixture_matches_oracle(spark, duck):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = sorted(
        r.doc_id
        for r in resample_mixture(
            docs, "source", "doc_id", _PARTS
        ).collect()
    )
    sql = resample_mixture_sql(
        "documents", "source", "doc_id", _PARTS, cols="t.doc_id"
    )
    exp = sorted(r[0] for r in duck.execute(sql).fetchall())
    assert got == exp


def test_mixture_no_upsample_and_binding_domain_full(spark):
    """No domain exceeds its input count; the scarcest domain
    relative to its weight is kept in full; unlisted domains drop."""
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    out = resample_mixture(docs, "source", "doc_id", _PARTS).collect()
    from collections import Counter

    kept = Counter(r.source for r in out)
    orig = Counter(
        r.source for r in docs.select("source").collect()
    )
    assert set(kept) <= set(_PARTS)
    for d, n in kept.items():
        assert n <= orig[d]
    # equal counts and src0 has the max weight -> src0 is binding:
    # its keep threshold is within floor-rounding of precision, so
    # nearly all of it survives (hash membership, not exact count)
    assert kept["src0"] >= 0.9 * orig["src0"]
    # and the weighted ordering shows through: src0 keeps more than
    # the half-weight domains
    assert kept["src0"] > kept["src1"]


def test_mixture_deterministic_rerun(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    a = sorted(
        r.doc_id
        for r in resample_mixture(
            docs.repartition(13), "source", "doc_id", _PARTS
        ).collect()
    )
    b = sorted(
        r.doc_id
        for r in resample_mixture(docs, "source", "doc_id", _PARTS)
        .collect()
    )
    assert a == b


def test_mixture_rejects_bad_weights(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    with pytest.raises(ValueError):
        resample_mixture(docs, "source", "doc_id", {})
    with pytest.raises(ValueError):
        resample_mixture(docs, "source", "doc_id", {"src0": -1})


# ── semantic_dedup ──────────────────────────────────────────────────
def test_semantic_dedup_matches_sql_lloyd_oracle(spark, duck):
    """The full pipeline — distributed integer Lloyd training, cell
    assignment, within-cell cosine drops — against the oracle that
    re-derives the SAME training from the data as SQL CTEs."""
    from umls2rdf_spark.plans.completion import (
        _SD_CELLS,
        _SD_ITERS,
        _SD_MIN_COS,
        _semantic_dedup_sql,
    )

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    got = sorted(
        (r.vec_id, r.cell, r.keep)
        for r in semantic_dedup(
            emb, "vec_id", "embedding", min_cos=_SD_MIN_COS,
            cells=_SD_CELLS, iters=_SD_ITERS,
        ).collect()
    )
    exp = sorted(
        tuple(r) for r in duck.execute(_semantic_dedup_sql()).fetchall()
    )
    assert got == exp
    assert len(got) == emb.count()
    # non-trivial at this threshold: something dropped, most kept
    n_drop = sum(1 for _, _, k in got if not k)
    assert 0 < n_drop < len(got) / 2


def test_semantic_dedup_min_id_kept_per_cell(spark):
    """The lowest id in every cell always survives (it has no
    lower-id member to match)."""
    from umls2rdf_spark.plans.completion import _SD_MIN_COS

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    rows = semantic_dedup(
        emb, "vec_id", "embedding", min_cos=_SD_MIN_COS
    ).collect()
    from collections import defaultdict

    by_cell = defaultdict(list)
    for r in rows:
        by_cell[r.cell].append(r)
    for cell_rows in by_cell.values():
        lowest = min(cell_rows, key=lambda r: r.vec_id)
        assert lowest.keep


def test_semantic_dedup_exact_duplicates_collapse(spark):
    """Two copies of the same vector always land in one cell and the
    higher id is dropped at any positive threshold."""
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings").limit(50)
    dup = emb.withColumn("vec_id", F.col("vec_id") + 10_000)
    both = emb.unionByName(dup)
    rows = semantic_dedup(
        both, "vec_id", "embedding", min_cos=0.99
    ).collect()
    by_id = {r.vec_id: r for r in rows}
    for r in emb.select("vec_id").collect():
        a, b = by_id[r.vec_id], by_id[r.vec_id + 10_000]
        assert a.cell == b.cell
        assert a.keep and not b.keep


# ── decontaminate_bloom ─────────────────────────────────────────────
def _doc_slices(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    bench = docs.where(F.col("doc_id") % 17 == 0)
    corp = docs.where(F.col("doc_id") % 17 != 0)
    return docs, bench, corp


def test_bloom_decontam_matches_sql_oracle(spark, duck):
    from umls2rdf_spark.operators.corpus import (
        bloom_positions,
        decontaminate_bloom,
    )
    from umls2rdf_spark.plans.completion import (
        _BLOOM_K,
        _BLOOM_M,
        _BLOOM_N,
        _bloom_decontam_sql,
    )

    _, bench, corp = _doc_slices(spark)
    pos = bloom_positions(
        bench, "doc_id", "text",
        shingle_n=_BLOOM_N, m_bits=_BLOOM_M, k=_BLOOM_K,
    )
    got = sorted(
        (r.doc_id, r.n_hit_ngrams)
        for r in decontaminate_bloom(
            corp, pos, "doc_id", "text",
            shingle_n=_BLOOM_N, m_bits=_BLOOM_M, k=_BLOOM_K,
        ).collect()
    )
    exp = sorted(
        tuple(r) for r in duck.execute(_bloom_decontam_sql()).fetchall()
    )
    assert got == exp
    assert len(got) > 0


def test_bloom_no_false_negatives(spark):
    """Every document the exact n-gram decontaminate flags is also
    flagged by the bloom variant (bloom membership can only
    over-approximate the benchmark shingle set)."""
    from umls2rdf_spark.operators.corpus import (
        bloom_positions,
        decontaminate,
        decontaminate_bloom,
    )

    _, bench, corp = _doc_slices(spark)
    exact = {
        r.doc_id
        for r in decontaminate(
            corp, bench, "doc_id", "text", "doc_id", "text",
            shingle_n=4,
        ).collect()
    }
    pos = bloom_positions(bench, "doc_id", "text", shingle_n=4)
    bloom = {
        r.doc_id
        for r in decontaminate_bloom(
            corp, pos, "doc_id", "text", shingle_n=4
        ).collect()
    }
    assert exact, "fixture must produce real contamination"
    assert exact <= bloom


def test_bloom_tiny_filter_fp_deterministic(spark):
    """A deliberately undersized filter (m_bits=64) produces false
    positives — and two independent runs produce the IDENTICAL flag
    set, because bloom FPs here are a pure function of the data."""
    from umls2rdf_spark.operators.corpus import (
        bloom_positions,
        decontaminate,
        decontaminate_bloom,
    )

    _, bench, corp = _doc_slices(spark)

    def run():
        pos = bloom_positions(
            bench, "doc_id", "text", shingle_n=4, m_bits=64
        )
        return {
            r.doc_id
            for r in decontaminate_bloom(
                corp, pos, "doc_id", "text", shingle_n=4, m_bits=64
            ).collect()
        }

    a, b = run(), run()
    assert a == b
    exact = {
        r.doc_id
        for r in decontaminate(
            corp, bench, "doc_id", "text", "doc_id", "text",
            shingle_n=4,
        ).collect()
    }
    # 64 bits vs thousands of shingles: saturated filter, so the FP
    # set is strictly larger than the exact set
    assert exact < a


def test_bloom_positions_bounded(spark):
    from umls2rdf_spark.operators.corpus import bloom_positions

    _, bench, _ = _doc_slices(spark)
    pos = bloom_positions(
        bench, "doc_id", "text", shingle_n=4, m_bits=128
    )
    vals = [r.pos for r in pos.collect()]
    assert len(vals) == len(set(vals)) <= 128
    assert all(0 <= v < 128 for v in vals)


# ── LSH banding recall calibration (quality evidence) ──────────────
def test_minhash_banding_recall_vs_exact_jaccard(spark, duck):
    """Candidate recall of the 8-band/1-row LSH against the exact
    all-pairs Jaccard ground truth: every truly-high-similarity pair
    (j >= 0.5, where a band match has >= 1-(1-j)^8 = 99.6%
    probability) must surface as a candidate on this corpus — the
    minhash analogue of the IVF/LSH rank-1 recall calibrations.
    Deterministic: fixed data, fixed permutation constants."""
    from umls2rdf_spark.plans.llm_demos import dedup_minhash

    exact = {
        (a, b)
        for a, b, _ in duck.execute("""
WITH f AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), t -> t <> '') AS f
           FROM documents),
idx AS (SELECT doc_id, f,
               unnest(generate_series(1, greatest(len(f)-2, 0))) AS i
        FROM f),
sh AS (SELECT DISTINCT doc_id, f[i]||' '||f[i+1]||' '||f[i+2] AS s
       FROM idx),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b, CAST(n AS DOUBLE)/(za.sz+zb.sz-n) AS j
FROM inter
JOIN sizes za ON za.doc_id = id_a
JOIN sizes zb ON zb.doc_id = id_b
WHERE CAST(n AS DOUBLE)/(za.sz+zb.sz-n) >= 0.5
""").fetchall()
    }
    assert len(exact) >= 20, "fixture must contain true near-dups"
    cands = {
        (r.id_a, r.id_b)
        for r in dedup_minhash(spark, SF_DIR_ORACLE).collect()
    }
    missed = exact - cands
    assert not missed, f"banding missed true pairs: {sorted(missed)[:5]}"


def test_semantic_dedup_salting_only_misses_pairs(spark):
    """max_cell salting splits cells by id-hash, which can only MISS
    cross-salt pairs — so the salted drop set is a subset of the
    unsalted one, and every vector still appears exactly once."""
    from umls2rdf_spark.plans.completion import _SD_MIN_COS

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    full = semantic_dedup(
        emb, "vec_id", "embedding", min_cos=_SD_MIN_COS
    ).collect()
    salted = semantic_dedup(
        emb, "vec_id", "embedding", min_cos=_SD_MIN_COS, max_cell=40
    ).collect()
    assert len(salted) == len(full) == emb.count()
    drop_full = {r.vec_id for r in full if not r.keep}
    drop_salted = {r.vec_id for r in salted if not r.keep}
    assert drop_salted <= drop_full
    # cell assignment is unaffected by salting
    cells_full = {r.vec_id: r.cell for r in full}
    for r in salted:
        assert cells_full[r.vec_id] == r.cell


def test_mixture_all_weighted_domains_absent_is_empty(spark, duck):
    """Weights referencing only domains absent from the data: the
    feasibility min is over an empty set (NULL threshold), so nothing
    survives — identically in Spark and the oracle."""
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    parts = {"no_such_domain": 3}
    got = resample_mixture(docs, "source", "doc_id", parts).count()
    sql = resample_mixture_sql(
        "documents", "source", "doc_id", parts, cols="t.doc_id"
    )
    exp = len(duck.execute(sql).fetchall())
    assert got == exp == 0


# ── epoch_shuffle ───────────────────────────────────────────────────
@pytest.mark.parametrize("seed", [0, 7])
def test_epoch_shuffle_matches_oracle(spark, duck, seed):
    from umls2rdf_spark.operators.selection import (
        epoch_shuffle,
        epoch_shuffle_sql,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = sorted(
        (r.doc_id, r.epoch_pos)
        for r in epoch_shuffle(docs, "doc_id", seed=seed)
        .select("doc_id", "epoch_pos")
        .collect()
    )
    sql = epoch_shuffle_sql(
        "documents", "doc_id", seed=seed, cols="doc_id"
    )
    exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == exp
    # a permutation of 0..n-1
    assert sorted(p for _, p in got) == list(range(len(got)))


def test_epoch_shuffle_bucket_and_partition_invariant(spark):
    """buckets is a pure parallelism knob and placement never leaks
    into the order: any bucket count and any input partitioning give
    the identical position assignment; different seeds differ."""
    from umls2rdf_spark.operators.selection import epoch_shuffle

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    a = sorted(
        (r.doc_id, r.epoch_pos)
        for r in epoch_shuffle(docs, "doc_id", seed=3, buckets=16)
        .select("doc_id", "epoch_pos").collect()
    )
    b = sorted(
        (r.doc_id, r.epoch_pos)
        for r in epoch_shuffle(
            docs.repartition(17), "doc_id", seed=3, buckets=4096
        ).select("doc_id", "epoch_pos").collect()
    )
    assert a == b
    c = sorted(
        (r.doc_id, r.epoch_pos)
        for r in epoch_shuffle(docs, "doc_id", seed=4)
        .select("doc_id", "epoch_pos").collect()
    )
    assert a != c


def test_epoch_shuffle_rejects_bad_buckets(spark):
    from umls2rdf_spark.operators.selection import epoch_shuffle

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    with pytest.raises(ValueError):
        epoch_shuffle(docs, "doc_id", buckets=3)


# ── quality classifier (unigram log-odds) ───────────────────────────
def test_quality_classifier_matches_oracle(spark, duck):
    from umls2rdf_spark.operators.textstats import (
        score_log_odds,
        token_log_odds,
    )
    from umls2rdf_spark.plans.completion import _QC_SQL

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    weights = token_log_odds(
        docs.withColumn("__lbl", F.col("lang") == "en"),
        "doc_id", "text", "__lbl",
    )
    got = sorted(
        (r.doc_id, r.n_tokens, r.logodds_q)
        for r in score_log_odds(
            docs, weights, "doc_id", "text"
        ).collect()
    )
    exp = sorted(
        (r[0], r[1], r[2]) for r in duck.execute(_QC_SQL).fetchall()
    )
    assert got == exp


def test_quality_classifier_separates_classes(spark):
    """The trained log-odds scores must actually separate the
    classes: English documents (the positive label) average a higher
    length-normalized score than non-English ones, and the sign
    test beats chance by a wide margin."""
    from umls2rdf_spark.operators.textstats import (
        score_log_odds,
        token_log_odds,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    weights = token_log_odds(
        docs.withColumn("__lbl", F.col("lang") == "en"),
        "doc_id", "text", "__lbl",
    )
    scored = score_log_odds(docs, weights, "doc_id", "text").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    rows = scored.collect()
    en = [r.avg_logodds for r in rows if r.lang == "en"]
    other = [r.avg_logodds for r in rows if r.lang != "en"]
    assert en and other
    assert sum(en) / len(en) > 0 > sum(other) / len(other)
    # sign agreement beats chance (the synthetic corpus shares its
    # template vocabulary across languages, so 0.63 measured —
    # deterministic; a real-language corpus would be near 1.0)
    acc = (
        sum(1 for v in en if v > 0) + sum(1 for v in other if v < 0)
    ) / len(rows)
    assert acc > 0.55, acc


def test_score_log_odds_unseen_tokens_weigh_zero(spark):
    from umls2rdf_spark.operators.textstats import (
        score_log_odds,
        token_log_odds,
    )

    train = spark.createDataFrame(
        [(1, "good text here", True), (2, "bad spam junk", False)],
        "id long, text string, lbl boolean",
    )
    weights = token_log_odds(train, "id", "text", "lbl")
    unseen = spark.createDataFrame(
        [(9, "entirely novel words")], "id long, text string"
    )
    row = score_log_odds(unseen, weights, "id", "text").collect()[0]
    assert row.n_tokens == 3 and row.logodds_q == 0


# ── empty-input hardening (empty shards are routine in production) ──
def test_new_ops_handle_empty_input(spark):
    from umls2rdf_spark.operators.corpus import (
        bloom_bitmap,
        bloom_positions,
        decontaminate_bloom,
    )
    from umls2rdf_spark.operators.selection import (
        epoch_shuffle,
        resample_mixture,
        select_to_token_budget,
    )
    from umls2rdf_spark.operators.similarity import semantic_dedup
    from umls2rdf_spark.operators.textstats import (
        score_log_odds,
        token_log_odds,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    empty_docs = docs.where(F.lit(False))
    empty_emb = load_table(spark, SF_DIR_ORACLE, "embeddings").where(
        F.lit(False)
    )
    toked = empty_docs.withColumn("ntok", F.length("text"))

    assert (
        select_to_token_budget(
            toked, "doc_id", "ntok", "n_chars", 100
        ).count()
        == 0
    )
    assert (
        resample_mixture(
            empty_docs, "source", "doc_id", {"src0": 1}
        ).count()
        == 0
    )
    assert epoch_shuffle(empty_docs, "doc_id").count() == 0
    # semantic dedup over an empty corpus: fixed seed centroids, no
    # rows in, no rows out
    from umls2rdf_spark.operators.similarity import ivf_centroid

    cents = [[ivf_centroid(c, j) for j in range(64)] for c in range(8)]
    assert (
        semantic_dedup(
            empty_emb, "vec_id", "embedding", min_cos=0.3,
            centroids=cents,
        ).count()
        == 0
    )
    # empty benchmark -> empty positions -> nothing flagged
    pos = bloom_positions(empty_docs, "doc_id", "text", shingle_n=4)
    assert pos.count() == 0
    assert (
        decontaminate_bloom(
            docs.limit(20), pos, "doc_id", "text", shingle_n=4
        ).count()
        == 0
    )
    # empty-positions bitmap is all-zero words, not an empty frame
    bm = bloom_bitmap(pos, m_bits=256).collect()
    assert len(bm) == 1 and all(w == 0 for w in bm[0]["bloom"])
    # classifier: empty training corpus yields an empty model; the
    # scorer then weighs everything 0
    w = token_log_odds(
        empty_docs.withColumn("__lbl", F.lit(True)),
        "doc_id", "text", "__lbl",
    )
    assert w.count() == 0
    scored = score_log_odds(docs.limit(5), w, "doc_id", "text")
    assert all(r.logodds_q == 0 for r in scored.collect())


# ── bigram surprisal ────────────────────────────────────────────────
def test_bigram_surprisal_matches_oracle(spark, duck):
    from umls2rdf_spark.operators.textstats import bigram_surprisal
    from umls2rdf_spark.plans.completion import _BIGRAM_SQL

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = sorted(
        (r.doc_id, r.n_bigrams, r.surprisal_q)
        for r in bigram_surprisal(docs, "doc_id", "text").collect()
    )
    exp = sorted(
        (r[0], r[1], r[2])
        for r in duck.execute(_BIGRAM_SQL).fetchall()
    )
    assert got == exp
    assert len(got) > 0


def test_bigram_surprisal_detects_shuffled_order(spark):
    """A document whose words are common but in unusual ORDER scores
    higher than the same words in corpus order — the signal the
    unigram model cannot see (both docs have identical unigram
    surprisal)."""
    from umls2rdf_spark.operators.textstats import bigram_surprisal

    base = [
        (i, "the quick brown fox jumps over the lazy dog again")
        for i in range(20)
    ]
    # doc 100: same words, reversed order (unigram-identical)
    rows = base + [(100, "again dog lazy the over jumps fox brown quick the")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.bits_per_bigram
           for r in bigram_surprisal(df, "doc_id", "text").collect()}
    assert out[100] > out[0]


def test_token_budget_sql_default_cols_hides_helper():
    """ADVICE round 4: cols='*' must not leak the internal __cum
    column — parity with the Spark operator's input-columns-only
    output."""
    import duckdb

    from umls2rdf_spark.operators.selection import (
        select_to_token_budget_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT i AS id, i % 5 AS score, 10 AS ntok "
        "FROM range(100) r(i)"
    )
    out = con.execute(
        select_to_token_budget_sql("t", "id", "ntok", "score", budget=200)
    ).fetchdf()
    assert list(sorted(out.columns)) == ["id", "ntok", "score"]
    con.close()


def test_mixture_sql_escapes_quoted_domains():
    """ADVICE round 4: a domain literal containing a single quote must
    not break the generated oracle SQL."""
    import duckdb

    from umls2rdf_spark.operators.selection import resample_mixture_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT i AS id, CASE WHEN i % 2 = 0 THEN "
        "'o''brien' ELSE 'web' END AS dom FROM range(50) r(i)"
    )
    out = con.execute(
        resample_mixture_sql("d", "dom", "id", {"o'brien": 1, "web": 1})
    ).fetchdf()
    assert len(out) == 50
    con.close()


# ── gopher-style quality gate ───────────────────────────────────────
def test_gopher_quality_rules(spark):
    """Hand-built edge docs: short text fails word count, symbol soup
    fails the alpha fraction, stopword-free fails stop_hits, a long
    normal sentence passes; empty text is total-fail without a
    div-by-zero."""
    from umls2rdf_spark.operators.textstats import gopher_quality

    good = ("the quick brown fox and the lazy dog walked to town in "
            "a bright morning of early spring with many other words "
            "to cross the minimum count easily right here")
    rows = [
        (1, good),
        (2, "the and of"),                      # too short
        (3, " ".join(["123"] * 30)),            # no alpha, no stops
        (4, " ".join(["token"] * 30)),          # no stopwords
        (5, ""),                                # empty
        (6, " ".join(["USA", "NATO", "GDP"] * 10)),   # uppercase-only
        (7, good.replace(" ", "\n", 5).replace(" ", "\t", 5)),
        (8, "The " + good),                     # capitalized stopword
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality(df, "doc_id", "text").collect()}
    assert got[1]["passes"] is True
    assert got[2]["passes"] is False and got[2]["n_words"] == 3
    assert got[3]["passes"] is False and got[3]["alpha_frac_q"] == 0
    assert got[4]["passes"] is False and got[4]["stop_hits"] == 0
    assert got[5]["passes"] is False and got[5]["n_words"] == 0
    assert got[5]["mean_len_q"] == 0  # guarded division
    # acronyms are alphabetic: the (?i) rule — fails only on stopwords
    assert got[6]["alpha_frac_q"] == 1000 and got[6]["stop_hits"] == 0
    # newline/tab separators tokenize exactly like spaces
    assert got[7]["n_words"] == got[1]["n_words"]
    assert got[7]["mean_len_q"] == got[1]["mean_len_q"]
    # "The" counts as the stopword "the"
    assert got[8]["stop_hits"] >= got[1]["stop_hits"]
    assert got[8]["passes"] is True


def test_gopher_quality_matches_oracle(spark, duck):
    from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle
    from umls2rdf_spark.operators.textstats import (
        gopher_quality,
        gopher_quality_sql,
    )
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    assert_matches_oracle(
        gopher_quality(docs, "doc_id", "text"),
        duck,
        gopher_quality_sql("documents", "doc_id", "text"),
    )


# ── C48: temperature mixing (general-tau driver helper + in-plan
#    sqrt form) ────────────────────────────────────────────────────
def test_sqrt_mixture_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle
    from umls2rdf_spark.operators.selection import (
        resample_sqrt_mixture,
        resample_sqrt_mixture_sql,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = resample_sqrt_mixture(docs, "source", "doc_id")
    cols = ", ".join(f"t.{c}" for c in docs.columns)
    assert_matches_oracle(
        got,
        duck,
        resample_sqrt_mixture_sql(
            "documents", "source", "doc_id", cols=cols
        ),
    )


def test_sqrt_mixture_flattens_skew_without_upsampling(spark):
    from umls2rdf_spark.operators.selection import (
        resample_sqrt_mixture,
    )

    # 1600 'big' rows vs 100 'small': sqrt parts 40:10 -> the kept
    # corpus targets 4:1 where the input was 16:1
    rows = [(i, "big") for i in range(1600)] + [
        (10_000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    kept = resample_sqrt_mixture(df, "source", "doc_id").groupBy(
        "source"
    ).count()
    got = {r.source: r["count"] for r in kept.collect()}
    assert got["small"] <= 100  # never upsampled
    # binding domain kept (almost) fully, ratio ~4:1 (hash noise)
    assert got["small"] >= 90
    assert 3.0 <= got["big"] / got["small"] <= 5.0


def test_temperature_parts_limits_and_monotonicity(spark):
    from umls2rdf_spark.operators.selection import temperature_parts

    rows = [(i, "a") for i in range(1000)] + [
        (2000 + i, "b") for i in range(250)
    ] + [(4000, "c")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    # tau=1: proportional (up to rounding); tau=0: uniform
    p1 = temperature_parts(df, "source", tau=1.0)
    assert abs(p1["a"] - 4 * p1["b"]) <= 4  # proportional ± rounding
    p0 = temperature_parts(df, "source", tau=0.0)
    assert len(set(p0.values())) == 1
    # tau=0.5 sits between: spread strictly shrinks vs tau=1
    ph = temperature_parts(df, "source", tau=0.5)
    assert p1["a"] / p1["c"] > ph["a"] / ph["c"] > 1
    # bigger domain never gets smaller parts; tiny domain never 0
    assert ph["a"] >= ph["b"] >= ph["c"] >= 1
    with pytest.raises(ValueError):
        temperature_parts(df, "source", tau=-0.1)


def test_temperature_parts_feed_resample_mixture_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle
    from umls2rdf_spark.operators.selection import (
        resample_mixture,
        resample_mixture_sql,
        temperature_parts,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    parts = temperature_parts(docs, "source", tau=0.7)
    got = resample_mixture(docs, "source", "doc_id", parts)
    cols = ", ".join(f"t.{c}" for c in docs.columns)
    assert_matches_oracle(
        got,
        duck,
        resample_mixture_sql(
            "documents", "source", "doc_id", parts, cols=cols
        ),
    )


# ── Kneser-Ney smoothed bigram scoring (C52) ────────────────────────
def _kn_replica(rows, d4=3, qbits=20):
    """Plain-Python replica of the kn_surprisal quantization chain."""
    import math
    import re
    from collections import Counter

    occ = []
    for did, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        occ += [(did, a, b) for a, b in zip(toks, toks[1:])]
    big = Counter((a, b) for _, a, b in occ)
    cc: Counter = Counter()
    n1: Counter = Counter()
    n2: Counter = Counter()
    for (a, b), c in big.items():
        cc[a] += c
        n1[a] += 1
        n2[b] += 1
    B = len(big)
    scale = 1 << qbits
    wq = {}
    for (a, b), c in big.items():
        num = float(B) * float(4 * c - d4) + float(d4 * n1[a]) * float(n2[b])
        den = float(cc[a]) * float(4 * B)
        wq[(a, b)] = int(round((math.log2(den) - math.log2(num)) * scale))
    out: dict = {}
    for did, a, b in occ:
        n, s = out.get(did, (0, 0))
        out[did] = (n + 1, s + wq[(a, b)])
    return out


def test_kn_surprisal_matches_oracle(spark, duck):
    from umls2rdf_spark.operators.textstats import (
        kn_surprisal,
        kn_surprisal_sql,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = sorted(
        (r.doc_id, r.n_bigrams, r.kn_q)
        for r in kn_surprisal(docs, "doc_id", "text").collect()
    )
    exp = sorted(
        (r[0], r[1], r[2])
        for r in duck.execute(kn_surprisal_sql()).fetchall()
    )
    assert got == exp
    assert len(got) > 0


def test_kn_surprisal_matches_python_replica(spark):
    from umls2rdf_spark.operators.textstats import kn_surprisal

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown cat sleeps under the warm sun"),
        (3, "a rare unique phrase appears exactly once here"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "numbers 123 and words mix 456 freely 789 yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.kn_q)
        for r in kn_surprisal(df, "doc_id", "text").collect()
    }
    assert got == _kn_replica(rows)


def test_kn_smooths_deterministic_contexts(spark):
    """MLE bigram surprisal gives ZERO bits to a context with a
    single continuation (p=1); KN discounts it — the mass leak that
    stops boilerplate's fixed rare phrases from scoring as free."""
    from umls2rdf_spark.operators.textstats import (
        bigram_surprisal,
        kn_surprisal,
    )

    rows = [(i, "alpha beta gamma delta") for i in range(5)] + [
        (100, "alpha beta epsilon zeta")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mle = {r.doc_id: r.surprisal_q
           for r in bigram_surprisal(df, "doc_id", "text").collect()}
    kn = {r.doc_id: r.kn_q
          for r in kn_surprisal(df, "doc_id", "text").collect()}
    # "gamma delta" / "beta gamma" are deterministic continuations:
    # MLE charges nothing for them; KN charges a positive discount
    assert kn[0] > mle[0] >= 0
    # and the smoothed score still ranks the divergent doc higher
    assert kn[100] > kn[0]


def test_kn_probability_mass_bounded():
    """Per context, the smoothed probabilities of OBSERVED
    continuations sum to <= 1 (the discount leaks mass to unseen
    ones) — the property that makes it a valid LM score."""
    import re
    from collections import Counter

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown cat sleeps under the warm sun"),
        (3, "the dog and the cat share the brown rug"),
    ]
    occ = []
    for _, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        occ += list(zip(toks, toks[1:]))
    big = Counter(occ)
    cc: Counter = Counter()
    n1: Counter = Counter()
    n2: Counter = Counter()
    for (a, b), c in big.items():
        cc[a] += c
        n1[a] += 1
        n2[b] += 1
    B = len(big)
    for ctx in cc:
        total = sum(
            (B * (4 * c - 3) + 3 * n1[a] * n2[b]) / (4 * B * cc[a])
            for (a, b), c in big.items()
            if a == ctx
        )
        assert total <= 1.0 + 1e-12


# ── character-class / script profile (C53) ──────────────────────────
def test_char_profile_matches_oracle_on_seeded_corpus(spark, duck):
    from tests.conftest import assert_matches_oracle
    from umls2rdf_spark.operators.textstats import (
        char_profile,
        char_profile_sql,
    )
    from umls2rdf_spark.plans.completion import (
        _SCRIPT_PAGES_SQL,
        _script_pages_frame,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = char_profile(_script_pages_frame(docs), "doc_id", "text")
    assert_matches_oracle(
        got, duck, char_profile_sql(_SCRIPT_PAGES_SQL, "doc_id", "text")
    )


def test_char_profile_semantics(spark):
    from umls2rdf_spark.operators.textstats import char_profile

    rows = [
        (1, "Hello World 123"),
        (2, "привет мир данных и ещё текст"),
        (3, "数据处理是关键任务"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in char_profile(df, "doc_id", "text").collect()}
    assert out[1].dom_script == "latin" and out[1].mostly_ascii
    assert out[2].dom_script == "cyrillic" and not out[2].mostly_ascii
    assert out[3].dom_script == "cjk" and out[3].non_ascii_ppm > 900000
    # empty doc: NULL ppm, tie default, passes the ascii gate
    assert out[4].non_ascii_ppm is None and out[4].dom_script == "latin"
    assert out[4].mostly_ascii
    # NULL doc: identical treatment (r6 ADVICE pin — NULL class counts
    # used to fall through the WHEN chain to 'cjk')
    df_null = spark.createDataFrame(
        [(5, None)], "doc_id long, text string"
    )
    rn = char_profile(df_null, "doc_id", "text").collect()[0]
    assert rn.dom_script == "latin" and rn.non_ascii_ppm is None
    assert rn.mostly_ascii and rn.n_chars is None
    # ppm identity: letter+digit partition of an alnum-only doc
    df2 = spark.createDataFrame([(9, "abc123XYZ")], "doc_id long, text string")
    r = char_profile(df2, "doc_id", "text").collect()[0]
    assert r.letter_ppm + r.digit_ppm == 999999 or (
        r.letter_ppm + r.digit_ppm == 1000000
    )
    assert r.upper_ppm == 333333 and r.non_ascii_ppm == 0


def test_char_profile_null_text_engine_parity(spark, duck):
    """NULL text rows agree byte-for-byte across engines (dom_script
    'latin', NULL ppm) — the coalesced-class-count contract."""
    from tests.conftest import assert_matches_oracle
    from umls2rdf_spark.operators.textstats import (
        char_profile,
        char_profile_sql,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "ok text"), (3, "")],
        "doc_id long, text string",
    )
    inline = (
        "SELECT * FROM (VALUES (1, CAST(NULL AS VARCHAR)), "
        "(2, 'ok text'), (3, '')) AS v(doc_id, text)"
    )
    assert_matches_oracle(
        char_profile(df, "doc_id", "text"),
        duck,
        char_profile_sql(inline, "doc_id", "text"),
    )


def test_char_profile_is_single_scan_no_shuffle(spark):
    from umls2rdf_spark.operators.textstats import char_profile
    from umls2rdf_spark.sources.parquet import load_table as lt

    docs = lt(spark, SF_DIR_ORACLE, "documents")
    plan = (
        char_profile(docs, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ── asymmetric n-gram containment (C54) ─────────────────────────────
def test_containment_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle
    from umls2rdf_spark.operators.dedup import containment_verify_pairs
    from umls2rdf_spark.plans.completion import (
        _CONTAINMENT_SQL,
        _containment_frames,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = containment_verify_pairs(
        *_containment_frames(docs), "doc_id", "text", shingle_n=3
    )
    assert_matches_oracle(got, duck, _CONTAINMENT_SQL)


def test_containment_detects_subset_duplicate(spark):
    """A short doc wholly quoted inside a long one: containment of
    the short side == 1.0 while Jaccard stays small — the pair a
    Jaccard threshold would keep."""
    from umls2rdf_spark.operators.dedup import containment_verify_pairs

    long_text = " ".join(f"w{i}" for i in range(40))
    short_text = " ".join(f"w{i}" for i in range(10, 18))  # inside
    df = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, "completely different words here now")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = {
        (r.id_a, r.id_b): r
        for r in containment_verify_pairs(
            df, pairs, "doc_id", "text", shingle_n=3
        ).collect()
    }
    sub = out[(1, 2)]
    assert sub.containment_b == 1.0          # short fully contained
    assert sub.jaccard < 0.2                  # Jaccard blind to it
    assert sub.containment_a < sub.containment_b
    # disjoint pair: zero everywhere, no NULLs (both sides non-empty)
    assert out[(1, 3)].inter == 0 and out[(1, 3)].jaccard == 0.0
    # min_containment filter keeps only the subset pair
    kept = containment_verify_pairs(
        df, pairs, "doc_id", "text", shingle_n=3, min_containment=0.9
    ).collect()
    assert [(r.id_a, r.id_b) for r in kept] == [(1, 2)]


def test_containment_missing_side_is_null(spark):
    from umls2rdf_spark.operators.dedup import containment_verify_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 99)], "id_a long, id_b long")
    r = containment_verify_pairs(
        df, pairs, "doc_id", "text", shingle_n=3
    ).collect()[0]
    assert r.sz_b == 0 and r.containment_b is None
    assert r.containment_a == 0.0


# ── deterministic weighted systematic sampling (C56) ────────────────
def test_weighted_sample_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle
    from umls2rdf_spark.operators.selection import (
        weighted_sample,
        weighted_sample_sql,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents").withColumn(
        "w", F.col("n_chars").cast("bigint")
    )
    got = weighted_sample(docs, "doc_id", "w", k=50, seed=7)
    assert_matches_oracle(
        got,
        duck,
        weighted_sample_sql(
            "(SELECT *, CAST(n_chars AS BIGINT) AS w FROM documents)",
            "doc_id", "w", k=50, seed=7,
        ),
    )


def test_weighted_sample_exact_k_when_weights_small(spark):
    """Every weight <= W/k → exactly k rows selected."""
    from umls2rdf_spark.operators.selection import weighted_sample

    df = spark.createDataFrame(
        [(i, 1) for i in range(1000)], "id long, w long"
    )
    for k in (1, 7, 100, 999):
        assert weighted_sample(df, "id", "w", k=k).count() == k


def test_weighted_sample_inclusion_tracks_weight(spark):
    """Across seeds, rows with 10x the weight are selected ~10x as
    often — the proportionality contract (deterministic per seed)."""
    from umls2rdf_spark.operators.selection import weighted_sample

    rows = [(i, 10 if i < 50 else 1) for i in range(550)]
    df = spark.createDataFrame(rows, "id long, w long")
    heavy = light = 0
    for seed in range(12):
        picked = {r.id for r in
                  weighted_sample(df, "id", "w", k=50, seed=seed).collect()}
        heavy += sum(1 for i in picked if i < 50)
        light += sum(1 for i in picked if i >= 50)
    # weight mass: heavy 500, light 500 → expect ~equal draws even
    # though heavy rows are 10x fewer
    assert 0.6 < heavy / max(light, 1) < 1.67


def test_weighted_sample_zero_weight_never_selected(spark):
    from umls2rdf_spark.operators.selection import weighted_sample

    df = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 0), (4, 5)], "id long, w long"
    )
    for seed in range(5):
        picked = {r.id for r in
                  weighted_sample(df, "id", "w", k=2, seed=seed).collect()}
        assert picked <= {2, 4}


def test_weighted_sample_without_replacement_on_skew(spark):
    """A row heavier than W/k absorbs several selection points but
    is emitted ONCE (output < k — the documented systematic
    behavior)."""
    from umls2rdf_spark.operators.selection import weighted_sample

    df = spark.createDataFrame(
        [(1, 1000)] + [(i, 1) for i in range(2, 12)], "id long, w long"
    )
    out = weighted_sample(df, "id", "w", k=5, seed=3).collect()
    ids = [r.id for r in out]
    assert len(ids) == len(set(ids))
    assert 1 in ids and len(ids) < 5


def test_weighted_sample_guards(spark):
    import pytest as _pt

    from umls2rdf_spark.operators.selection import weighted_sample

    df = spark.createDataFrame([(1, 1)], "id long, w long")
    with _pt.raises(ValueError):
        weighted_sample(df, "id", "w", k=0)
    # k*W overflow is CHECKED driver-side
    big = spark.createDataFrame([(1, 1 << 40)], "id long, w long")
    with _pt.raises(ValueError):
        weighted_sample(big, "id", "w", k=1 << 40)
    # empty / all-zero weight input → empty output
    zero = spark.createDataFrame([(1, 0)], "id long, w long")
    assert weighted_sample(zero, "id", "w", k=3).count() == 0
    # negative weights raise (r6 ADVICE: previously documented but
    # unenforced — a negative weight silently corrupts offsets/W)
    neg = spark.createDataFrame(
        [(1, 5), (2, -1)], "id long, w long"
    )
    with _pt.raises(ValueError, match="non-negative"):
        weighted_sample(neg, "id", "w", k=1)
    # NULL weights raise with the same clear error (r7 ADVICE: the
    # window-sum/min skip NULLs, so a NULL weight otherwise acts as
    # silent zero — and an all-NULL bucket crashed min() with a
    # TypeError instead of the intended ValueError)
    part_null = spark.createDataFrame(
        [(1, 5), (2, None)], "id long, w long"
    )
    with _pt.raises(ValueError, match="non-null"):
        weighted_sample(part_null, "id", "w", k=1)
    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "id long, w long"
    )
    with _pt.raises(ValueError, match="non-null"):
        weighted_sample(all_null, "id", "w", k=1)


# ── per-source score calibration (C57) ──────────────────────────────
def test_score_percentile_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle
    from umls2rdf_spark.operators.selection import (
        score_percentile,
        score_percentile_sql,
    )

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = score_percentile(docs, "doc_id", "n_chars", "source")
    # default cols="*" — pins the r6 ADVICE fix (bare "*" used to leak
    # the twin's __below/__n helpers through the JOIN)
    assert_matches_oracle(
        got,
        duck,
        score_percentile_sql("documents", "doc_id", "n_chars", "source"),
    )


def test_score_percentile_semantics(spark):
    from umls2rdf_spark.operators.selection import score_percentile

    rows = [
        (1, 10, "a"), (2, 20, "a"), (3, 20, "a"), (4, 30, "a"),
        (5, 999, "b"),
    ]
    df = spark.createDataFrame(rows, "id long, s long, g string")
    out = {r.id: r.pct_ppm
           for r in score_percentile(df, "id", "s", "g").collect()}
    assert out[1] == 0                 # group minimum → 0
    assert out[2] == out[3] == 250000  # ties share (1 of 4 below)
    assert out[4] == 750000            # 3 of 4 below
    assert out[5] == 0                 # singleton group
    # "top 25% of each group" via one global cut keeps exactly the
    # per-group top scores — the cross-source calibration point
    top = {r.id for r in
           score_percentile(df, "id", "s", "g")
           .where(F.col("pct_ppm") >= 750000).collect()}
    assert top == {4}


def test_score_percentile_corpus_is_not_windowed(spark):
    """The corpus-scale side sees only a groupBy + broadcast join —
    no Sort/Window over the full table (the CDF window runs on the
    bounded counts frame; pin no SortMergeJoin and a broadcast)."""
    from umls2rdf_spark.operators.selection import score_percentile

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    plan = (
        score_percentile(docs, "doc_id", "n_chars", "source")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
