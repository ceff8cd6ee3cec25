"""Hash-sampled scale verification: value-check Spark results past
the point where the single-process DuckDB oracle runs out of memory.

The 10x/30x sweeps (tools/scale_oracle.py, SCALE.md) showed the
ORACLE is the binding constraint (~95-106 GB RSS at 30x), not Spark.
This tool pushes value verification to 100x by exploiting section
LOCALITY: Spark computes each section over the FULL replica and the
result is filtered to a deterministic stable_hash40 sample of the
section's closure key; DuckDB computes the SAME section over ONLY
the sampled sub-corpus. For sections whose per-row output depends
only on its own closure (per-document or per-source), the two are
EXACTLY equal — this is a value gate, not a statistical one.

Closure classes verified here (all from the text_scoring surface):

- **per-document** (row depends only on its own doc): char_profile,
  pii_scrub, doc_repetition, gopher_quality, html_extract, simhash,
  snapshot_diff (both snapshots derive from the same doc_id).
- **per-source** (row depends only on its whole source/domain —
  sampling whole sources keeps group semantics exact):
  ingest_quarantine, quality_report, diversity_report,
  score_calibration (the per-source CDF needs every row OF THAT
  SOURCE, all present), domain_cap (cap ranks within source),
  winsorize (per-source clip bounds), stratified_sample (per-source
  hash ranks), drift (per-source chi-square over the source's own
  split halves) — the last three round-8 session 3.

- **group closure** (round 8 — the round-7 verdict's item 4: the
  sample key is the section's own grouping unit, chosen so the
  sampled sub-corpus contains EVERY row each sampled output row
  depends on): url_dedup (canonical-URL groups — all variants of a
  URL share its url_norm hash), minhash_pairs (LSH band buckets —
  both members of a candidate pair carry the sampled bucket, and
  the per-doc "has a sampled bucket" predicate is computable from
  the doc's own text in BOTH engines; compared at BUCKET
  granularity, strictly finer than the section's distinct-pair
  output), containment (candidate-pair anchors — pairs are
  (d, d+10M) prefix twins derived in-query and (d, d+1) neighbors,
  so sampling anchor d and keeping d+1 via the shifted predicate
  closes every pair).

NOT sampleable (global closure — the full-oracle sweeps remain
their ceiling): tfidf/bm25/surprisal/kn/bigram (corpus-global
counts), frequent_tokens, mixtures and weighted_sample (global
totals/budgets), BPE/unigram training (global vocab),
embedding/hard-negative families (corpus-global candidates),
sketches (global cells). Listed explicitly in SCALE.md.

Usage:
    python tools/sampled_oracle.py [--copies 100] [--rate 16]
        [--src /root/testdata/sf0.1] [--dst /tmp/sf10x]
        [--skip-build] [--markdown]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.scale_oracle import build_replica, frame_facts, table_glob


def _doc_sections():
    """name -> (spark_frame_fn(docs), oracle_sql, filter_output_col).

    Each Spark frame is built exactly as the text_scoring composed
    demo builds its section (same seeded wrappers, same constants),
    so a sampled match here is evidence about the driver surface."""
    from pyspark.sql import functions as F

    from umls2rdf_spark.operators.htmlextract import html_stats
    from umls2rdf_spark.operators.pii import pii_scrub
    from umls2rdf_spark.operators.repetition import doc_repetition
    from umls2rdf_spark.operators.corpus import snapshot_diff
    from umls2rdf_spark.operators.dedup import simhash
    from umls2rdf_spark.operators.textstats import (
        char_profile,
        char_profile_sql,
        gopher_quality,
        gopher_quality_sql,
    )
    from umls2rdf_spark.plans import completion as C
    from umls2rdf_spark.plans.llm_demos import DEDUP_SIMHASH_SQL

    def snap(docs):
        return snapshot_diff(
            docs.where(F.col("doc_id") % 3 != 0),
            docs.where(F.col("doc_id") % 5 != 0).withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(F.col("text"), F.lit(" rev2")),
                ).otherwise(F.col("text")),
            ),
            "doc_id",
            "text",
        )

    return {
        "char_profile": (
            lambda d: char_profile(
                C._script_pages_frame(d), "doc_id", "text"
            ),
            char_profile_sql(C._SCRIPT_PAGES_SQL, "doc_id", "text"),
            "doc_id",
        ),
        "pii_scrub": (
            lambda d: pii_scrub(C._pii_pages_frame(d), "doc_id", "text"),
            C._pii_scrub_sql(),
            "doc_id",
        ),
        "doc_repetition": (
            lambda d: doc_repetition(d, "doc_id", "text"),
            C._doc_repetition_sql(),
            "doc_id",
        ),
        "gopher_quality": (
            lambda d: gopher_quality(d, "doc_id", "text"),
            gopher_quality_sql("documents", "doc_id", "text"),
            "doc_id",
        ),
        "html_extract": (
            lambda d: html_stats(
                C._html_pages_frame(d), "doc_id", "html", text_col="clean"
            ),
            C._html_extract_sql(),
            "doc_id",
        ),
        "simhash": (
            lambda d: simhash(d, "doc_id", "text"),
            DEDUP_SIMHASH_SQL,
            "doc_id",
        ),
        "snapshot_diff": (snap, C._snapshot_diff_sql(), "doc_id"),
    }


def _source_sections():
    from pyspark.sql import functions as F

    from umls2rdf_spark.operators.drift import (
        chi_square_drift,
        chi_square_drift_sql,
    )
    from umls2rdf_spark.operators.reporting import (
        diversity_report,
        diversity_report_sql,
        quality_report,
    )
    from umls2rdf_spark.operators.robust import (
        winsorize,
        winsorize_sql,
    )
    from umls2rdf_spark.operators.selection import (
        score_percentile,
        score_percentile_sql,
        stratified_sample,
        stratified_sample_sql,
    )
    from umls2rdf_spark.operators.webcurate import cap_per_domain
    from umls2rdf_spark.plans import completion as C
    from umls2rdf_spark.plans import curation_demos as CD

    return {
        "ingest_quarantine": (
            lambda d: C._ingest_quarantine_frame(d),
            C._QUAR_SQL,
            "source",
        ),
        "quality_report": (
            lambda d: quality_report(
                C._pii_pages_frame(d), "doc_id", "text", "source"
            ),
            C._quality_report_sql(),
            "source",
        ),
        "diversity_report": (
            lambda d: diversity_report(d, "doc_id", "text", "source"),
            diversity_report_sql(
                "SELECT * FROM documents", "doc_id", "text", "source"
            ),
            "source",
        ),
        "score_calibration": (
            lambda d: score_percentile(d, "doc_id", "n_chars", "source"),
            score_percentile_sql(
                "documents", "doc_id", "n_chars", "source"
            ),
            "source",
        ),
        "domain_cap": (
            lambda d: cap_per_domain(
                d, "doc_id", "source", cap=CD._CAP,
                blocklist=CD._BLOCKLIST,
            ),
            CD.DOMAIN_CAP_SQL,
            "source",
        ),
        # round-8 session 3: clip bounds are per-source order
        # statistics — whole-source sampling keeps them exact
        "winsorize": (
            lambda d: winsorize(d, "source", F.col("n_chars"), "doc_id"),
            winsorize_sql(
                "SELECT * FROM documents", "source", "n_chars",
                "doc_id",
            ),
            "source",
        ),
        # the fixed-n draw ranks within the source only
        "stratified_sample": (
            lambda d: stratified_sample(
                d, "source", "doc_id", C._STRAT_N
            ),
            stratified_sample_sql(
                "SELECT * FROM documents", "source", "doc_id",
                C._STRAT_N,
            ),
            "source",
        ),
        # chi-square compares the source's own two split halves —
        # every row of both sides rides with the sampled source
        "drift": (
            lambda d: chi_square_drift(
                C._drift_base_frame(d),
                C._drift_new_frame(d),
                "source",
                F.col("n_chars"),
                C._DRIFT_BUCKET,
            ),
            chi_square_drift_sql(
                C._DRIFT_BASE_SQL, C._DRIFT_NEW_SQL, "source",
                "n_chars", C._DRIFT_BUCKET,
            ),
            "source",
        ),
    }


def _group_sections(rate: int, docs_path: str):
    """name -> (spark_fn(docs) -> FILTERED full-replica frame,
    oracle_sql over the section's own SAMPLED temp ``documents``
    table, temp-table WHERE predicate). See the module docstring's
    group-closure class for why each sample is closure-complete."""
    from pyspark.sql import functions as F

    from umls2rdf_spark.functions.hashing import (
        PERM_MODULUS,
        perm_params,
        stable_hash40,
        stable_hash40_sql,
    )
    from umls2rdf_spark.operators.dedup import (
        band_signatures,
        containment_verify_pairs,
        minhash_signatures_mapside,
    )
    from umls2rdf_spark.operators.webcurate import (
        dedup_by_url,
        normalize_url_expr_sql,
    )
    from umls2rdf_spark.plans import completion as C

    # ── url_dedup: closure = the canonical-URL group ────────────────
    def url_fn(d):
        out = dedup_by_url(C._url_pages_frame(d), "doc_id", "url")
        return out.where(
            stable_hash40(F.col("url_norm")) % rate == 0
        )

    head, tail = "SELECT doc_id, ", " AS url FROM documents"
    assert C._URL_PAGES_SQL.startswith(head), C._URL_PAGES_SQL
    assert C._URL_PAGES_SQL.endswith(tail), C._URL_PAGES_SQL
    url_case = C._URL_PAGES_SQL[len(head):-len(tail)]
    url_pred = (
        f"{stable_hash40_sql(normalize_url_expr_sql(url_case))}"
        f" % {rate} = 0"
    )

    # ── minhash_pairs: closure = the LSH band bucket ────────────────
    perm_values = ", ".join(
        f"({i}, {a}, {b})" for i, a, b in perm_params(8)
    )
    bucket_sql = stable_hash40_sql(
        "CAST(band AS VARCHAR) || '|' || band_sig"
    )

    def bands_ctes(src: str) -> str:
        return f"""filtered AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS f
  FROM {src}),
indexed AS (
  SELECT doc_id, f,
         unnest(generate_series(1, greatest(len(f) - 2, 0))) AS i
  FROM filtered),
shingles AS (
  SELECT DISTINCT doc_id, f[i] || ' ' || f[i+1] || ' ' || f[i+2] AS shingle
  FROM indexed),
hashed AS (
  SELECT doc_id, {stable_hash40_sql('shingle')} AS h FROM shingles),
perms(perm_id, a, b) AS (VALUES {perm_values}),
sigs AS (
  SELECT doc_id, perm_id, MIN((a * h + b) % {PERM_MODULUS}) AS minhash
  FROM hashed CROSS JOIN perms GROUP BY 1, 2),
bands AS (
  SELECT doc_id, perm_id AS band, CAST(minhash AS VARCHAR) AS band_sig
  FROM sigs)"""

    def mh_fn(d):
        sigs = minhash_signatures_mapside(
            d, "doc_id", "text", num_perm=8
        )
        bands = band_signatures(sigs, "doc_id", 1)
        bucket_h = stable_hash40(
            F.concat(
                F.col("band").cast("string"),
                F.lit("|"),
                F.col("band_sig"),
            )
        )
        samp = bands.where(bucket_h % rate == 0)
        a = samp.select(F.col("doc_id").alias("id_a"), "band", "band_sig")
        b = samp.select(F.col("doc_id").alias("id_b"), "band", "band_sig")
        return (
            a.join(b, ["band", "band_sig"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("band", "band_sig", "id_a", "id_b")
        )

    mh_sql = f"""WITH {bands_ctes('documents')},
samp AS (SELECT * FROM bands WHERE {bucket_sql} % {rate} = 0)
SELECT a.band, a.band_sig, a.doc_id AS id_a, b.doc_id AS id_b
FROM samp a
JOIN samp b ON a.band = b.band AND a.band_sig = b.band_sig
           AND a.doc_id < b.doc_id"""
    mh_pred = f"""doc_id IN (
WITH {bands_ctes(f"'{docs_path}'")}
SELECT DISTINCT doc_id FROM bands WHERE {bucket_sql} % {rate} = 0)"""

    # ── containment: closure = the candidate-pair anchor ────────────
    def cont_fn(d):
        frame, pairs = C._containment_frames(d)
        out = containment_verify_pairs(
            frame, pairs, "doc_id", "text", shingle_n=3
        )
        return out.where(
            stable_hash40(F.col("id_a").cast("string")) % rate == 0
        )

    anchor = stable_hash40_sql("CAST(id_a AS VARCHAR)")
    cont_sql = (
        f"SELECT * FROM ({C._CONTAINMENT_SQL}) AS __c"
        f" WHERE {anchor} % {rate} = 0"
    )
    cont_pred = (
        f"{stable_hash40_sql('CAST(doc_id AS VARCHAR)')} % {rate} = 0"
        f" OR {stable_hash40_sql('CAST(doc_id - 1 AS VARCHAR)')}"
        f" % {rate} = 0"
    )

    # ── keep_k_dedup: closure = the exact-text group ────────────────
    from umls2rdf_spark.operators.dedup import (
        dedup_keep_k,
        dedup_keep_k_sql,
    )

    kk_head = "(SELECT doc_id, "
    kk_tail = " AS ktext FROM documents)"
    assert C._KEEPK_SQL.startswith(kk_head), C._KEEPK_SQL
    assert C._KEEPK_SQL.endswith(kk_tail), C._KEEPK_SQL
    kk_case = C._KEEPK_SQL[len(kk_head):-len(kk_tail)]
    kk_pred = f"{stable_hash40_sql(kk_case)} % {rate} = 0"

    def kk_fn(d):
        seeded = C._keepk_seeded_frame(d)
        out = dedup_keep_k(seeded, "doc_id", "ktext", k=C._KEEPK_K)
        return (
            out.join(seeded, "doc_id")
            .where(stable_hash40(F.col("ktext")) % rate == 0)
            .select("doc_id", "dup_rank", "group_n")
        )

    kk_sql = dedup_keep_k_sql(
        C._KEEPK_SQL, "doc_id", "ktext", k=C._KEEPK_K
    )

    return {
        "url_dedup": (url_fn, C._url_dedup_sql(), url_pred),
        "minhash_pairs": (mh_fn, mh_sql, mh_pred),
        "containment": (cont_fn, cont_sql, cont_pred),
        "keep_k_dedup": (kk_fn, kk_sql, kk_pred),
    }


def _bench_sections(rate: int, docs_path: str):
    """name -> (spark_fn(docs) -> FILTERED full-replica frame,
    oracle_sql, extra CREATE statements): the round-8 closure class
    "per-doc closure + bounded global side". lexical_decontam's
    per-doc output depends on the doc's own shingles plus the WHOLE
    benchmark set — so the oracle's ``documents`` holds only the
    doc-hash sample while a second temp table carries the benchmark
    derived from the FULL replica (bounded by nature: 1/17 of the
    corpus, and the corpus×bench join is what sampling shrinks).
    Exactly closed, not statistical."""
    from pyspark.sql import functions as F

    from umls2rdf_spark.functions.hashing import stable_hash40
    from umls2rdf_spark.operators.corpus import (
        decontaminate_lexical,
        decontaminate_lexical_sql,
    )
    from umls2rdf_spark.plans import completion as C

    def lex_fn(d):
        out = decontaminate_lexical(
            d, C._lexical_bench_frame(d), "doc_id", "text",
            "bench_id", "text",
        )
        return out.where(
            stable_hash40(F.col("doc_id").cast("string")) % rate == 0
        )

    bench_full_sql = C._LEXICAL_BENCH_SQL.replace(
        "FROM documents", f"FROM '{docs_path}'"
    )
    lex_sql = decontaminate_lexical_sql(
        "SELECT * FROM documents",
        "SELECT * FROM __bench_full",
        "doc_id",
        "text",
        "bench_id",
        "text",
    )
    extra = [f"CREATE TEMP TABLE __bench_full AS {bench_full_sql}"]
    return {"lexical_decontam": (lex_fn, lex_sql, extra)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--rate", type=int, default=16,
                    help="keep keys with stable_hash40 %% rate == 0")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf10x")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--keys", default="all")
    args = ap.parse_args()

    if not args.skip_build:
        t0 = time.time()
        build_replica(args.src, args.dst, args.copies,
                      perturb_docs=True)
        print(f"replica built at {args.dst} in {time.time()-t0:.1f}s",
              file=sys.stderr)

    import duckdb

    from umls2rdf_spark.functions.hashing import (
        stable_hash40,
        stable_hash40_sql,
    )
    from umls2rdf_spark.session import get_spark

    spark = get_spark(app_name="sampled-oracle", shuffle_partitions=32)
    docs_path = table_glob(args.dst, "documents")

    doc_pred_sql = (
        stable_hash40_sql("CAST(doc_id AS VARCHAR)")
        + f" % {args.rate} = 0"
    )
    src_pred_sql = stable_hash40_sql("source") + f" % {args.rate} = 0"

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{args.dst}/documents.parquet")

    def pred_for(fcol: str):
        # Spark-side sample predicate built from the SAME per-section
        # filter-column declaration the section tuple carries, so the
        # declaration cannot silently drift from the actual filter
        return stable_hash40(F.col(fcol).cast("string")) % args.rate == 0

    # TWO oracle connections, each exposing the SAME table name the
    # section twins reference ('documents') but holding only the
    # sampled closure: by doc hash for per-doc sections, by source
    # hash for per-source sections.
    con_doc = duckdb.connect()
    con_doc.execute(
        f"CREATE TEMP TABLE documents AS SELECT * FROM '{docs_path}' "
        f"WHERE {doc_pred_sql}"
    )
    con_src = duckdb.connect()
    con_src.execute(
        f"CREATE TEMP TABLE documents AS SELECT * FROM '{docs_path}' "
        f"WHERE {src_pred_sql}"
    )

    # group-closure sections build their OWN sampled temp table (the
    # predicate is section-specific); the connection is lazy because
    # the minhash bucket predicate is itself a corpus scan
    def group_con(table_pred: str, extra: list[str] | None = None):
        def make():
            c = duckdb.connect()
            c.execute(
                f"CREATE TEMP TABLE documents AS SELECT * FROM "
                f"'{docs_path}' WHERE {table_pred}"
            )
            for stmt in extra or ():
                c.execute(stmt)
            return c

        return make

    plans = [
        (name, (lambda fn=fn, fc=fcol: fn(docs).where(pred_for(fc))),
         sql, "doc", (lambda c=con_doc: c))
        for name, (fn, sql, fcol) in _doc_sections().items()
    ] + [
        (name, (lambda fn=fn, fc=fcol: fn(docs).where(pred_for(fc))),
         sql, "source", (lambda c=con_src: c))
        for name, (fn, sql, fcol) in _source_sections().items()
    ] + [
        (name, (lambda fn=fn: fn(docs)), sql, "group",
         group_con(table_pred))
        for name, (fn, sql, table_pred)
        in _group_sections(args.rate, docs_path).items()
    ] + [
        (name, (lambda fn=fn: fn(docs)), sql, "doc+bench",
         group_con(doc_pred_sql, extra))
        for name, (fn, sql, extra)
        in _bench_sections(args.rate, docs_path).items()
    ]
    wanted = None if args.keys == "all" else set(args.keys.split(","))

    results = []
    closures = {}
    for name, make_frame, sql, closure, make_con in plans:
        if wanted is not None and name not in wanted:
            continue
        closures[name] = closure
        t0 = time.time()
        print(f"[{time.strftime('%H:%M:%S')}] {name}: spark(full) + "
              f"filter...", file=sys.stderr, flush=True)
        try:
            frame = make_frame()
            cols = frame.columns
            s_n, s_names, s_hash = frame_facts(
                cols, [tuple(r) for r in frame.collect()]
            )
            print(f"[{time.strftime('%H:%M:%S')}] {name}: "
                  f"oracle(sampled)...", file=sys.stderr, flush=True)
            rel = make_con().execute(sql)
            o_cols = [d[0] for d in rel.description]
            o_n, o_names, o_hash = frame_facts(o_cols, rel.fetchall())
            ok = (s_n == o_n and s_names == o_names and s_hash == o_hash)
            results.append((name, s_n, o_n, s_names == o_names,
                            s_hash == o_hash, ok, time.time() - t0, None))
        except Exception as e:
            results.append((name, -1, -1, False, False, False,
                            time.time() - t0,
                            f"{type(e).__name__}: {e}"))

    fail = 0
    if args.markdown:
        print("| section | closure | rows (spark=oracle) | schema | "
              "values | wall (s) |")
        print("|---|---|---|---|---|---|")
    for name, s_n, o_n, sch, hsh, ok, wall, err in results:
        if not ok:
            fail += 1
        closure = closures[name]
        if args.markdown:
            rows = f"{s_n}={o_n}" if s_n == o_n else f"**{s_n}≠{o_n}**"
            print(f"| {name} | {closure} | {rows} | {'✓' if sch else '✗'}"
                  f" | {'✓' if hsh else '✗'} | {wall:.1f} |")
        else:
            print(name, "OK" if ok else
                  f"FAIL rows={s_n}/{o_n} schema={sch} hash={hsh} "
                  f"err={err}", f"{wall:.1f}s")
        if err:
            print(f"  {name}: {err}", file=sys.stderr)
    print(f"{len(results) - fail}/{len(results)} green", file=sys.stderr)
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
