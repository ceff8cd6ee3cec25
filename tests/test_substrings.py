"""Exact repeated-substring dedup: DuckDB oracle over the corpus,
constructed-fixture semantics, and removal accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle

L = 6


def test_repeated_spans_match_oracle(spark, duck):
    from umls2rdf_spark.operators.substrings import repeated_substring_spans
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    got = repeated_substring_spans(docs, "doc_id", "text", min_len=L)
    sql = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    wins AS (
      SELECT doc_id, CAST(s AS INT) AS pos,
             array_to_string(t[CAST(s+1 AS INT) : CAST(s+{L} AS INT)], ' ')
                 AS win
      FROM toks, UNNEST(range(0, greatest(len(t)-{L}+1, 0))) AS u(s)
    ),
    rep AS (
      SELECT doc_id, pos FROM wins
      WHERE win IN (SELECT win FROM wins GROUP BY win HAVING COUNT(*) > 1)
    ),
    runs AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NOT NULL AND pos > prev + {L}
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS span
      FROM (SELECT doc_id, pos,
                   LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM rep)
    )
    SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start,
           CAST(MAX(pos) + {L} AS INT) AS span_end
    FROM runs GROUP BY doc_id, span
    """
    assert_matches_oracle(got, duck, sql)
    assert got.count() > 0  # the corpus's replicated docs guarantee spans


def test_repeated_substring_semantics(spark):
    """A 6-token run shared by two docs is flagged in both; a run
    repeated WITHIN one doc is flagged at both sites; unique docs are
    untouched; removal cuts exactly the spans."""
    from umls2rdf_spark.operators.substrings import (
        remove_repeated_substrings,
        repeated_substring_spans,
    )

    shared = "one two three four five six"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta gamma"),
            (2, f"delta {shared} epsilon"),
            (3, f"{shared} zeta {shared}"),
            (4, "totally unique words nothing repeats here ever"),
        ],
        "doc_id bigint, text string",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_substring_spans(
            docs, "doc_id", "text", min_len=6
        ).collect()
    }
    assert (1, 0, 6) in spans
    assert (2, 1, 7) in spans
    # doc 3: the run appears at 0 and 7; window(1..6)='two..zeta' etc.
    # are unique, so two disjoint spans — but pos 7 <= 0+6+? gap rule:
    # 7 > 0 + 6 → new span
    assert (3, 0, 6) in spans and (3, 7, 13) in spans
    assert not any(d == 4 for d, _, _ in spans)

    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
        for r in remove_repeated_substrings(
            docs, "doc_id", "text", min_len=6
        ).collect()
    }
    assert out[1] == ("alpha beta gamma", 6)
    assert out[2] == ("delta epsilon", 6)
    assert out[3] == ("zeta", 12)
    assert out[4] == ("totally unique words nothing repeats here ever", 0)


def test_removal_accounting_on_corpus(spark):
    """Across the corpus: token loss equals total span length, and
    docs without spans round-trip byte-identical (after whitespace
    normalization, which tokenization implies)."""
    from umls2rdf_spark.operators.substrings import (
        remove_repeated_substrings,
        repeated_substring_spans,
    )
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    span_total = (
        repeated_substring_spans(docs, "doc_id", "text", min_len=L)
        .agg(F.sum(F.col("span_end") - F.col("span_start")))
        .collect()[0][0]
    )
    removed = remove_repeated_substrings(docs, "doc_id", "text", min_len=L)
    got_total = removed.agg(F.sum("n_removed_tokens")).collect()[0][0]
    assert got_total == span_total > 0
    untouched = removed.where(F.col("n_removed_tokens") == 0)
    joined = untouched.join(docs, "doc_id").where(
        F.col("clean_text") != F.col("text")
    )
    assert joined.count() == 0  # single-spaced corpus: identity


def test_hot_window_does_not_skew(spark):
    """A single window repeated in EVERY doc (the hot-key case for
    the window group-by) must still produce correct spans — partial
    aggregation collapses the hot key map-side, so correctness and
    the plan shape hold regardless of repetition count."""
    from umls2rdf_spark.operators.substrings import (
        remove_repeated_substrings,
    )

    hot = "w x y z q r"
    docs = spark.createDataFrame(
        [(i, f"{hot} unique{i} tail{i}") for i in range(200)],
        "doc_id bigint, text string",
    ).repartition(16)
    out = remove_repeated_substrings(docs, "doc_id", "text", min_len=6)
    rows = out.collect()
    assert len(rows) == 200
    assert all(r["n_removed_tokens"] == 6 for r in rows)
    assert all(
        r["clean_text"] == f"unique{r['doc_id']} tail{r['doc_id']}"
        for r in rows
    )


def test_window_shuffle_carries_fingerprints_not_strings(spark):
    """The scale fix for the hop-1 window table: both the repeat
    count group-by and the position semi-join must shuffle the
    16-byte (__h1, __h2) fingerprint, never the raw L-token window
    string (which would inflate shuffled bytes by ~L× the corpus)."""
    from umls2rdf_spark.operators.substrings import (
        repeated_substring_spans,
    )
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    plan = (
        repeated_substring_spans(
            docs, "doc_id", "text", min_len=L, persist=False
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(__h1" in plan
    assert "hashpartitioning(win" not in plan
    # the window string is born and dies map-side: no Exchange input
    # carries it, so it must not appear in any shuffle partitioning
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "win#" not in line, line


def test_incremental_dedupe_matches_oracle(spark, duck):
    """Shard-vs-base incremental dedup: base = even doc_ids, shard =
    odd doc_ids; survivors are odd docs whose text no even doc has,
    min-id per duplicate text within the shard. Both the on-the-fly
    and precomputed-index base forms must agree with the oracle."""
    from umls2rdf_spark.operators.dedup import incremental_dedupe
    from umls2rdf_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    base = docs.where(F.col("doc_id") % 2 == 0)
    shard = docs.where(F.col("doc_id") % 2 == 1)
    got = incremental_dedupe(shard, base, "doc_id", "text")
    sql = """
    WITH shard AS (SELECT *, md5(text) AS fp FROM documents
                   WHERE doc_id % 2 = 1),
    fresh AS (
      SELECT * FROM shard
      WHERE fp NOT IN (SELECT md5(text) FROM documents WHERE doc_id % 2 = 0)
    )
    SELECT doc_id, text, lang, source, n_chars
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id)
                    AS rn
          FROM fresh)
    WHERE rn = 1
    """
    assert_matches_oracle(got, duck, sql)
    survivors = sorted(map(tuple, got.collect()))
    assert survivors

    # re-ingesting every base doc (new ids, same text) must change
    # nothing: the base-collision anti-join drops them all
    reingest = shard.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + 100000)
    )
    got2 = incremental_dedupe(reingest, base, "doc_id", "text")
    assert sorted(map(tuple, got2.collect())) == survivors

    idx = base.select(F.md5(F.col("text")).alias("text_hash"))
    via_index = incremental_dedupe(
        reingest, idx, "doc_id", "text", base_is_fingerprints=True
    )
    assert sorted(map(tuple, via_index.collect())) == survivors
