"""Composed coverage demos: fingerprint-union keys that put the
tests-only SURVEY §2 rows under the driver's CORRECTNESS gate.

The driver caps the contract at 50 queries() keys, but §2 has 95
rows. These demos compose many full pipelines into one key each by
reducing every pipeline's result to (section, n_rows, checksum) and
unioning the sections — the DuckDB oracle performs the identical
reduction over the identical oracle SQL, so a checksum match verifies
every section's full output value-for-value (stable_hash40 of a
canonical row string, summed; a single changed cell in any section
breaks its checksum).

Canonical row string: every column cast to its engine-portable
string form (ints/strings/dates/timestamps: plain CAST; doubles:
``FLOOR(x * 1e6)`` first — floor of an identical IEEE double is
identical everywhere, with no round-half mode ambiguity), NULLs
sentineled, joined with the unit separator. Checksum = SUM of 40-bit
md5-prefix hashes — order-insensitive, bounded (2^40 x rows << 2^63).

Keys:
- ``tpch_completion`` — the 13 TPC-H shapes beyond the individually
  keyed ones (Q2, Q7-Q9, Q11, Q13, Q15-Q18, Q20-Q22), each a section.
- ``text_scoring`` — minhash LSH pairs, simhash, TF-IDF, BM25,
  unigram surprisal, nearest-centroid confusion, incremental dedup,
  top-k vocabulary (SURVEY C2, C3, C21, C22, C25-C28).
- ``event_windows`` — tumbling, session, and hopping window
  aggregations over events (SURVEY B6, B22, B23b).
- ``pq_topk`` — product-quantization ADC top-k with the deterministic
  seed codebooks, full-value oracle (SURVEY C6c; the trained-codebook
  path is replica-tested in tests/test_pq.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import (
    PERM_MODULUS,
    perm_params,
    stable_hash40,
    stable_hash40_spark_sql,
    stable_hash40_sql,
)
from umls2rdf_spark.plans import curation_demos
from umls2rdf_spark.sources.parquet import load_table

_SEP = "\x1f"
_NULL = "<NULL>"
_FLOAT_SCALE = "1000000.0"
#: checksum modulus — identity below 2^62, keeps the Σ-of-40-bit-
#: hashes checksum int64-represented at ANY frame size (the sum
#: itself runs in DECIMAL(38,0)/HUGEINT in the two engines)
_CHECKSUM_MOD = 1 << 62


def fingerprint_section(
    df: DataFrame, section: str, float_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Reduce a result frame to one (section, n_rows, checksum) row.

    The reduction is a single map-side-combined aggregation over the
    section's plan — composing N sections into one demo adds no
    shuffle beyond each pipeline's own.

    Built as THREE sql-string expressions (selectExpr/expr), not a
    per-column Column graph: this wrapper runs once per section (81x
    in text_scoring alone), and each F.col/cast/coalesce call is a
    py4j round-trip while an F.expr of any size is one. The SQL is
    function-for-function the old graph (CAST/FLOOR/COALESCE/
    concat_ws/md5-conv hash, DECIMAL(38,0) sum, % 2^62): double *
    1000000.0 is forced DOUBLE (a bare SQL 1000000.0 literal is
    DECIMAL) so the float canonicalization stays bit-identical.
    """
    parts = []
    for field in df.schema.fields:
        q = "`" + field.name.replace("`", "``") + "`"
        e = (
            # _FLOAT_SCALE interpolated (not a hardcoded copy) so the
            # Spark-side canonicalization can never drift from the
            # DuckDB twin's; the CAST keeps it DOUBLE (a bare SQL
            # float literal parses as DECIMAL)
            f"CAST(FLOOR({q} * CAST({_FLOAT_SCALE} AS DOUBLE)) AS BIGINT)"
            if field.name in float_cols
            else q
        )
        parts.append(f"COALESCE(CAST({e} AS STRING), '{_NULL}')")
    cat = f"concat_ws('{_SEP}', " + ", ".join(parts) + ")"
    h = stable_hash40_spark_sql(cat)
    # checksum = (Σ 40-bit row hashes) mod 2^62, summed in
    # DECIMAL(38,0) / HUGEINT so the sum itself can NEVER overflow
    # int64 — a 10x-replica pair frame (identical payloads pair
    # across every copy: ~100x rows) pushed Σh past 2^63 and ANSI
    # Spark raised mid-verification. Below 2^62 the modulus is the
    # identity, so every existing section checksum is unchanged.
    sec = section.replace("'", "''")
    return (
        df.selectExpr(f"{h} AS __h")
        .agg(
            F.expr("CAST(count(1) AS BIGINT)").alias("n_rows"),
            F.expr(
                "CAST(COALESCE(SUM(CAST(__h AS DECIMAL(38,0))), "
                f"CAST(0 AS DECIMAL(38,0))) % {_CHECKSUM_MOD} AS BIGINT)"
            ).alias("checksum"),
        )
        .selectExpr(f"'{sec}' AS section", "n_rows", "checksum")
    )


def fingerprint_sql(
    section: str,
    inner_sql: str,
    cols: list[str],
    float_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`fingerprint_section` wrapped around an
    existing oracle SELECT. ``cols`` must list the oracle's output
    columns in the SAME order as the Spark frame's columns."""
    parts = []
    for c in cols:
        e = (
            f'CAST(FLOOR("{c}" * {_FLOAT_SCALE}) AS BIGINT)'
            if c in float_cols
            else f'"{c}"'
        )
        parts.append(f"COALESCE(CAST({e} AS VARCHAR), '{_NULL}')")
    cat = "concat_ws(chr(31), " + ", ".join(parts) + ")"
    h = stable_hash40_sql("__row")
    # HUGEINT sum + mod 2^62: the Spark twin's overflow-proof form
    return f"""
SELECT '{section}' AS section,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM({h}), 0) % {_CHECKSUM_MOD} AS BIGINT)
         AS checksum
FROM (SELECT {cat} AS __row FROM ({inner_sql}) AS __inner) AS __rows
"""


def _union(sections: list[DataFrame]) -> DataFrame:
    # balanced tree, not a linear reduce: unionByName analyzes the
    # accumulated plan at every step, so a 75-section linear chain
    # pays quadratic analysis (~2.4s); the tree is n·log n (~0.8s).
    # Union is associative and concatenates left-to-right either
    # way — the produced rows and their order are identical.
    if len(sections) == 1:
        return sections[0]
    mid = len(sections) // 2
    return _union(sections[:mid]).unionByName(_union(sections[mid:]))


#: thread-pool width for composed-demo section construction — bounded
#: by py4j round-trip latency, not cores; every worker only BUILDS
#: plans / runs the training loops' driver jobs concurrently,
#: execution parallelism is still Spark's own. Round 10 re-measured
#: the width with the round-9 debug-capture tax gone: 24 workers
#: build text_scoring ~10% faster than 8 (7.7-8.5s vs 8.6-9.5s warm,
#: same window; the earlier "16 within 10% of 8" was measured when
#: every call paid 3 extra round-trips, which serialized the pool on
#: the GIL). Python-side CPU is ~15% of the build (cProfile), so the
#: pool is JVM-wait-bound and wider is strictly better until the
#: longest single builder chain dominates.
_BUILD_WORKERS = 24


def _build_sections(builders) -> list:
    """Construct independent section frames (or any independent
    build products — the trainings use it too) concurrently.

    A composed demo's build is dominated by tens of thousands of
    sequential py4j round-trips (plan construction) plus the
    iterative operators' mid-build driver jobs (training rounds,
    checkpoint loops) — all driver-side latency, all independent
    between sections. Running the builders from a thread pool
    overlaps both (guide §2.6 shape: concurrent jobs back-fill;
    py4j pins one JVM connection per Python thread, so construction
    itself parallelizes). Results keep ``builders`` order, so the
    produced union is byte-identical to the serial build; any
    builder failure re-raises, preserving the fail-closed valves.
    """
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.util import inheritable_thread_target

    builders = list(builders)
    if len(builders) <= 1:
        return [b() for b in builders]
    with ThreadPoolExecutor(max_workers=_BUILD_WORKERS) as pool:
        futs = [
            pool.submit(inheritable_thread_target(b)) for b in builders
        ]
        return [f.result() for f in futs]


# ── tpch_completion: B24-B36 under one driver key ───────────────────
# (query key, float-typed output columns) — column order comes from
# the plan functions themselves at build time.
_TPCH_FLOATS = {
    "q2_min_cost_supplier": ("s_acctbal", "supply_cost"),
    "q7_volume_shipping": ("revenue",),
    "q8_market_share": ("mkt_share",),
    "q9_product_profit": ("sum_profit",),
    "q11_important_stock": ("value",),
    "q13_order_distribution": (),
    "q15_top_supplier": ("total_revenue",),
    "q16_parts_supplier_cnt": (),
    "q17_small_quantity": ("avg_yearly",),
    "q18_large_orders": ("total_price", "sum_qty"),
    "q20_excess_availability": ("s_acctbal",),
    "q21_waiting_supplier": (),
    "q22_dormant_customers": ("totacctbal",),
}


def tpch_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 13 remaining TPC-H shapes (SURVEY B24-B36) as fingerprint
    sections of one driver key: correlated scalar subqueries (Q2,
    Q17), semi/anti-join HAVING (Q18, Q21, Q22), nation-pair and
    market-share rollups (Q7-Q9), view-max (Q15), NOT IN denylists
    (Q16, Q20), zero-inclusive distributions (Q13), and global-scalar
    HAVING (Q11). Each section is the full production plan from
    plans/tpch_extra.py / plans/tpch_rest.py — the checksum pins
    every output cell of every shape."""
    from umls2rdf_spark.plans.tpch_extra import TESTS_ONLY_QUERIES

    sections = _build_sections(
        [
            (
                lambda name=name: fingerprint_section(
                    TESTS_ONLY_QUERIES[name](spark, sf_dir),
                    name,
                    _TPCH_FLOATS[name],
                )
            )
            for name in sorted(_TPCH_FLOATS)
        ]
    )
    sections.append(
        fingerprint_section(_zorder_code(spark, sf_dir), "zorder_code")
    )
    # SURVEY D2's structural-validation core under the driver gate
    # (round 6): the smoke-tier Turtle checks (rdf/validate.py
    # validate_turtle's line classifiers) value-verified per exported
    # block. Blocks are generated in-plan by the same codegen the
    # turtle_export demo oracles, then deterministically corrupted —
    # subject % _TV_CHOP_MOD rows lose their terminator bytes,
    # subject % _TV_BRACKET_MOD rows gain a stray '<' — so both
    # engines build, break, scan, and classify identical documents.
    # The strict tokenizer/rdflib tier stays tests-only by nature.
    sections.append(
        fingerprint_section(
            _turtle_validate_frame(spark, sf_dir), "turtle_validate"
        )
    )
    return _union(sections)


_TV_CHOP_MOD = 7
_TV_BRACKET_MOD = 13
_TV_BLOCK_RE = "^<.* a owl:(Class|Ontology)"
_TV_TERM_RE = "\\.\\s*$"


def _corrupt_ttl(blocks: DataFrame) -> DataFrame:
    key = F.col("subject").cast("bigint")
    ttl = F.col("ttl")
    chopped = F.when(
        key % _TV_CHOP_MOD == 0,
        F.expr("substring(ttl, 1, length(ttl) - 2)"),
    ).otherwise(ttl)
    return blocks.select(
        "subject",
        F.when(
            key % _TV_BRACKET_MOD == 0, F.concat(chopped, F.lit("<"))
        )
        .otherwise(chopped)
        .alias("ttl"),
    )


def _turtle_validate_frame(spark, sf_dir: str) -> DataFrame:
    from umls2rdf_spark.plans.reference_demos import turtle_export

    blocks = _corrupt_ttl(turtle_export(spark, sf_dir))
    lines = blocks.select(
        "subject", F.explode(F.split("ttl", "\n")).alias("line")
    )
    tq = (
        (
            F.length("line")
            - F.length(F.replace(F.col("line"), F.lit('"""'), F.lit("")))
        )
        / 3
    ).cast("bigint")
    opens = F.length("line") - F.length(
        F.replace(F.col("line"), F.lit("<"), F.lit(""))
    )
    closes = F.length("line") - F.length(
        F.replace(F.col("line"), F.lit(">"), F.lit(""))
    )
    per = lines.groupBy("subject").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.when(F.col("line").rlike(_TV_BLOCK_RE), 1).otherwise(0)
        ).alias("n_class_lines"),
        F.sum(
            F.when(F.col("line").rlike(_TV_TERM_RE), 1).otherwise(0)
        ).alias("n_terminators"),
        F.sum(F.when(tq % 2 != 0, 1).otherwise(0)).alias("n_odd_tq"),
        F.sum(F.when(opens != closes, 1).otherwise(0)).alias(
            "n_bad_bracket"
        ),
    )
    return per.withColumn(
        "ok",
        (F.col("n_class_lines") == 1)
        & (F.col("n_terminators") >= 1)
        & (F.col("n_odd_tq") == 0)
        & (F.col("n_bad_bracket") == 0),
    )


def _turtle_validate_sql() -> str:
    from umls2rdf_spark.plans.reference_demos import TURTLE_EXPORT_SQL

    return f"""
WITH blocks AS ({TURTLE_EXPORT_SQL}),
corrupted AS (
  SELECT subject,
         CASE WHEN CAST(subject AS BIGINT) % {_TV_BRACKET_MOD} = 0
              THEN chopped || '<' ELSE chopped END AS ttl
  FROM (
    SELECT subject,
           CASE WHEN CAST(subject AS BIGINT) % {_TV_CHOP_MOD} = 0
                THEN substr(ttl, 1, length(ttl) - 2) ELSE ttl
           END AS chopped
    FROM blocks)),
lines AS (
  SELECT subject, unnest(string_split(ttl, chr(10))) AS line
  FROM corrupted),
per AS (
  SELECT subject,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN regexp_matches(line,
             '^<.* a owl:(Class|Ontology)') THEN 1 ELSE 0 END)
             AS BIGINT) AS n_class_lines,
         CAST(SUM(CASE WHEN regexp_matches(line, '\\.\\s*$')
             THEN 1 ELSE 0 END) AS BIGINT) AS n_terminators,
         CAST(SUM(CASE WHEN ((length(line)
             - length(replace(line, '\"\"\"', ''))) // 3) % 2 <> 0
             THEN 1 ELSE 0 END) AS BIGINT) AS n_odd_tq,
         CAST(SUM(CASE WHEN
             length(line) - length(replace(line, '<', ''))
             <> length(line) - length(replace(line, '>', ''))
             THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_bracket
  FROM lines GROUP BY 1)
SELECT subject, n_lines, n_class_lines, n_terminators, n_odd_tq,
       n_bad_bracket,
       (n_class_lines = 1 AND n_terminators >= 1 AND n_odd_tq = 0
        AND n_bad_bracket = 0) AS ok
FROM per
"""


def _zorder_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Morton-interleave core of the z-order clustered writer
    (SURVEY D8, operators/zorder.py z_value) as a value-verifiable
    frame: every lineitem (orderkey, partkey) pair masked to 16 bits
    and bit-interleaved. The file-writing/range-partitioning half of
    D8 stays under its pruning-evidence test — this section pins the
    code every written layout is clustered BY."""
    from umls2rdf_spark.operators.zorder import z_value

    li = load_table(spark, sf_dir, "lineitem").select(
        F.pmod(F.col("l_orderkey"), F.lit(1 << 16)).alias("a"),
        F.pmod(F.col("l_partkey"), F.lit(1 << 16)).alias("b"),
    )
    return li.select("a", "b", z_value(["a", "b"], bits=16).alias("z"))


def _zorder_code_sql() -> str:
    terms = " + ".join(
        f"(((a >> {j}) & 1) << {2 * j}) + (((b >> {j}) & 1) << {2 * j + 1})"
        for j in range(16)
    )
    return f"""
SELECT a, b, CAST({terms} AS BIGINT) AS z
FROM (SELECT CAST(l_orderkey % 65536 AS BIGINT) AS a,
             CAST(l_partkey % 65536 AS BIGINT) AS b
      FROM lineitem)
"""


def _tpch_completion_sql() -> str:
    from umls2rdf_spark.plans.tpch_extra import TESTS_ONLY_ORACLES

    pieces = [
        fingerprint_sql(
            name,
            TESTS_ONLY_ORACLES[name],
            _TPCH_COLS[name],
            _TPCH_FLOATS[name],
        )
        for name in sorted(_TPCH_FLOATS)
    ]
    pieces.append(
        fingerprint_sql("zorder_code", _zorder_code_sql(), ["a", "b", "z"])
    )
    pieces.append(
        fingerprint_sql(
            "turtle_validate",
            _turtle_validate_sql(),
            [
                "subject", "n_lines", "n_class_lines", "n_terminators",
                "n_odd_tq", "n_bad_bracket", "ok",
            ],
        )
    )
    return "\nUNION ALL\n".join(pieces)


# Output column ORDER of each shape (mirrors the plan functions; the
# contract test asserts this stays in sync with the live schemas).
_TPCH_COLS = {
    "q2_min_cost_supplier": [
        "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
        "supply_cost",
    ],
    "q7_volume_shipping": [
        "supp_nation", "cust_nation", "l_year", "revenue",
    ],
    "q8_market_share": ["o_year", "mkt_share"],
    "q9_product_profit": ["nation", "o_year", "sum_profit"],
    "q11_important_stock": ["p_partkey", "value"],
    "q13_order_distribution": ["c_count", "custdist"],
    "q15_top_supplier": ["s_suppkey", "s_name", "total_revenue"],
    "q16_parts_supplier_cnt": [
        "p_brand", "p_type", "p_size", "supplier_cnt",
    ],
    "q17_small_quantity": ["avg_yearly"],
    "q18_large_orders": [
        "c_name", "o_custkey", "o_orderkey", "o_orderdate",
        "total_price", "sum_qty",
    ],
    "q20_excess_availability": ["s_name", "s_acctbal"],
    "q21_waiting_supplier": ["s_name", "numwait"],
    "q22_dormant_customers": ["cgroup", "numcust", "totacctbal"],
}


# ── text_scoring: C2, C3, C21, C22, C25-C32 under one driver key ───
_BM25_TERMS = ["spark", "window", "hash"]
_IMH_PERM = 8  # must equal llm_demos._NUM_PERM so the SQL CTEs match
_IMH_JACCARD = 0.5
_TFIDF_K = 3
_BM25_K = 15
_FREQ_K = 20
_PMI_MIN_COUNT = 5  # prunes hapax bigrams before the margin joins
_PMI_K = 30
#: C65 seed prefix injected into every 5th doc — one artifact per
#: normalizer stage: mojibake é + curly quotes (incl. the U+009D
#: remainder), a zero-width space, an NBSP, a double space.
_NORM_SEED = (
    "Caf\u00c3\u00a9 \u00e2\u20ac\u0153q\u00e2\u20ac\u009d"
    "\u200b \u00a0 x  "
)


def _sql_str(s: str) -> str:
    """Render a Python string as a DuckDB expression, emitting
    non-ASCII / control code points via chr() so the generated SQL
    stays ASCII-clean and byte-unambiguous."""
    parts: list[str] = []
    run = ""
    for ch in s:
        if 32 <= ord(ch) < 127:
            run += ch.replace("'", "''")
        else:
            if run:
                parts.append(f"'{run}'")
                run = ""
            parts.append(f"chr({ord(ch)})")
    if run:
        parts.append(f"'{run}'")
    return " || ".join(parts) if parts else "''"


_PARA_BOILER = "COOKIE BANNER ACCEPT ALL"  # seeded repeated paragraph
_PARA_MIN_CHARS = 5  # drop tiny ' the '-split fragments
_QD_LEVELS = 13  # q-digest universe 2^13; doc lengths clamp at 8191
_QD_K = 256  # rank error <= levels·(n div k) ~ 5% of n
_QD_QS = (10_000, 250_000, 500_000, 750_000, 990_000)
_SURPRISAL_SCALE = 1 << 20
# semantic dedup (SemDeDup): same cells/iters as the IVF demo; the
# synthetic embeddings top out near cos 0.42, so 0.3 is the
# non-trivial threshold (same constant as dedup_embedding)
_SD_CELLS = 8
_SD_ITERS = 3
_SD_DIM = 64
_SD_MIN_COS = 0.3
# token-budget selection: ~44% of the sf0.01 corpus tokens, so the
# admission boundary is exercised at every SF
_TB_BUDGET = 12_000
_TB_SHARDS = 64
# weighted systematic sample: ~30% of the sf0.01 corpus, weights =
# token counts, so heavy/light docs and multi-increment spans all
# occur at every SF
_WS_K = 150
_WS_SEED = 11
# mixture resampling: weighted subset of the 20 source domains;
# unlisted domains drop (weight 0)
_MIX_PARTS = {"src0": 4, "src1": 2, "src2": 2, "src3": 1, "src4": 1}
_MIX_PRECISION = 1_000_000
# bloom decontamination: benchmark = every 17th doc; 4-grams give a
# non-trivial overlap on the synthetic corpus (8-grams barely touch)
_BLOOM_N = 4
_BLOOM_M = 1 << 20
_BLOOM_K = 3
_BLOOM_BENCH_MOD = 17
# epoch shuffle: deterministic training-order seed
_EPOCH_SEED = 7
# quality classifier: lang='en' as the positive-class proxy label
_QC_BITS = 20
# hard-negative mining: queries = first 50 vec_ids, top-2 negatives
_HN_QUERIES = 50
_HN_K = 2
# D5 driver-gated core: payload corruption modulus + D6 sizing target
_QUAR_MOD = 13
_SIZED_TARGET = 64 * 1024
# bucketed (LSH) hard-negative mining: planes pinned to the value
# auto_planes(500, 8) derives for the correctness SF's embeddings
# corpus, like ann_lsh_topk — operator and generated oracle can
# never disagree on the bucket space (production callers pass
# planes=None for the adaptive path)
_HNL_PLANES = 6


def text_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight full text/dedup scoring pipelines as fingerprint
    sections of one driver key:

    - ``minhash_pairs`` — minhash signatures + LSH banding candidate
      pairs (SURVEY C2; the same chain ngram_jaccard verifies),
    - ``simhash`` — 64-bit simhash fingerprints (C3),
    - ``tfidf`` — per-doc top-3 TF-IDF with exact-integer inputs
      (C21),
    - ``bm25`` — BM25 retrieval, per-term contributions quantized to
      int64 before the doc sum (C22),
    - ``surprisal`` — unigram cross-entropy, int64-quantized weight
      dim (C25),
    - ``centroid_confusion`` — nearest-centroid hold-out confusion
      matrix over embeddings (C26),
    - ``incremental_dedupe`` — shard-vs-base ingest dedup, base =
      even doc_ids (C27),
    - ``frequent_tokens`` — corpus top-20 vocabulary audit (C28),
    - ``incremental_minhash`` — NEAR-dup ingest dedup: the odd shard
      against the even base's persisted band-signature index, LSH
      candidates verified at exact Jaccard ≥ 0.5 (C29; the
      production path — base_index precomputed, base text touched
      only for semi-joined verify candidates),
    - ``semantic_dedup`` — SemDeDup over embeddings: distributed
      integer Lloyd's k-means, within-cluster exact quantized cosine
      drops vs the min-id representative; the oracle re-runs the
      SAME Lloyd iterations as SQL CTEs, so training + assignment +
      dedup are all value-verified at any SF (C30),
    - ``token_budget`` — greedy quality-first selection under a
      global token budget via the two-level sharded cumsum (C31),
    - ``mixture`` — deterministic domain-mixture resampling with
      exact DECIMAL sizing arithmetic (C32),
    - ``bloom_decontam`` — bloom-filter decontamination: the
      constant-size positions index vs every-17th-doc benchmark,
      corpus probes dropped map-side at the broadcast join (C33),
    - ``epoch_shuffle`` — deterministic training-order positions
      under the seeded hash order, two-level rank (no global sort)
      (C34),
    - ``quality_classifier`` — fastText-style unigram log-odds
      quality scores, trained on lang='en' as the proxy label;
      int64-quantized weights, engine-exact doc sums (C35),
    - ``bigram_surprisal`` — per-doc bigram cross-entropy vs the
      corpus's own bigram LM; two bounded distinct-count weight
      dims, pure-int64 doc sums (C36),
    - ``kn_surprisal`` — the smoothed form: interpolated Kneser-Ney
      bigram cross-entropy (the CCNet-style perplexity filter);
      discount 3/4 multiplied out to exact-integer numerator/
      denominator, per-type weights computed distributed on the
      bigram-type frame, int64 doc sums (C52, round 6),
    - ``char_profile`` — character-class / Unicode-script profile
      (the multilingual-curation signal) over the deterministically
      multilingual-seeded corpus; one zero-shuffle codegen Project,
      int64 ppm fractions, dialect-portable patterns shared with the
      DuckDB twin (C53, round 6; operators/textstats.py),
    - ``containment`` — asymmetric n-gram containment for candidate
      pairs (Broder 1997): the subset-duplicate signal symmetric
      Jaccard under-scores; exact int64 shingle counts, prefix-twin
      + id-neighbor fixture pairs (C54, round 6;
      operators/dedup.py containment_verify_pairs),
    - ``diversity_report`` — per-source cross-document n-gram
      type-token ratios (Self-BLEU-style corpus diversity) from one
      fused struct-stream explode; the template-farm signal
      within-doc repetition can't see (C55, round 6;
      operators/reporting.py diversity_report),
    - ``weighted_sample`` — deterministic weighted systematic
      (Madow) sampling: inclusion ∝ weight via the exact-int64
      counter predicate over the two-level sharded cumsum — no
      float priorities, no global sort (C56, round 6;
      operators/selection.py weighted_sample),
    - ``score_calibration`` — per-source score→percentile
      normalization on the bounded (source, score) CDF frame,
      broadcast back (the corpus is never sorted or windowed); the
      cross-source calibration before a global threshold (C57,
      round 6; operators/selection.py score_percentile),
    - ``html_extract`` — HTML → visible-text extraction + page
      audit stats in one codegen select over the deterministically
      wrapped corpus, byte-exact vs the oracle built from the same
      pattern constants (C40, round 6; operators/htmlextract.py),
    - ``url_dedup`` — canonical-URL dedup: normalize (case, default
      ports, fragments, trailing slashes, tracking params) then one
      kept doc per URL via the WindowGroupLimit-pruned window (C41,
      round 6; operators/webcurate.py dedup_by_url),
    - ``bpe_merges`` — byte-level BPE tokenizer training: one corpus
      scan into the vocab-bounded (word, freq) frame, then fixed
      merge rounds (freq-weighted pair counts → deterministic top-1
      → boundary-safe left-to-right replace) whose state never grows
      with corpus size; the oracle unrolls the SAME rounds as CTEs,
      value-verifying the training trajectory (C42, round 6;
      operators/bpe.py),
    - ``bpe_tokens`` — the same training run's application half:
      post-merge vocab segmentation (word, freq, n_subwords); the
      oracle selects the final __v{rounds} CTE of the same chain,

    - ``embedding_decontam`` — embedding-based benchmark
      decontamination: per-corpus-vector max exact cosine against
      the broadcast benchmark set, keep = below threshold — catches
      paraphrased benchmark leakage the n-gram passes miss (C43,
      round 6; operators/similarity.py decontaminate_embeddings),

    - ``pii_scrub`` — email/IPv4/SSN/phone redaction with
      sequential per-stage counts, one zero-shuffle select over the
      deterministically PII-seeded corpus; the oracle is generated
      from the same stage constants so the redacted text is
      byte-exact-verified (C44, round 6; operators/pii.py),

    - ``doc_repetition`` — within-document repetition signals
      (Gopher §A1): top-bigram fraction + duplicate-token fraction
      computed WITHOUT any shuffle by sorting each doc's own n-gram
      array in-row and reading group sizes as run lengths (C45,
      round 6; operators/repetition.py),

    - ``cms_sketch`` / ``cms_estimates`` — count-min sketch over the
      token occurrence stream: aggregation state capped at
      depth×width cells regardless of key cardinality, point
      queries = min over a key's cells; the sketch matrix AND the
      estimates are value-verified cell-for-cell (C46, round 6;
      operators/sketch.py),

    - ``hll_registers`` / ``hll_estimate`` — explicit HyperLogLog:
      m=2^b max-rho registers (mergeable by register-wise MAX) and
      the raw-alpha estimate, every term IEEE-exact in both engines
      (C47, round 6; operators/sketch.py),

    - ``temp_mixture`` — temperature-scaled (tau = 0.5) source
      mixing entirely in-plan: parts = floor(sqrt(n_d)·2^20) (IEEE
      sqrt is correctly rounded in both engines, so the quantized
      parts are engine-exact with NO driver collect), then the
      no-upsampling threshold machinery of resample_mixture (C48,
      round 6; operators/selection.py resample_sqrt_mixture),

    - ``hashed_embedding`` — feature-hashing text embeddings: the
      signed-md5 projection (token|dim → ±1, summed per doc) that
      lets every embedding consumer (C2b/C5/C30/C43) run end-to-end
      from raw text; integer-exact long form gated (C49, round 6;
      operators/embed.py),

    - ``pipeline_funnel`` — D9's Observation-API core under the
      value gate: a 3-stage filter funnel instrumented with
      df.observe() points, ONE action populates every stage count
      (zero extra scans), and the observed values — not recomputed
      aggregates — are what the oracle's cumulative-filter COUNTs
      must match (round 6; operators/metrics.py funnel),

    - ``quality_report`` — per-source dataset-card statistics with
      the PII and repetition families FUSED into one corpus scan
      via their expr-level builders + one map-side-combined
      |sources|-group aggregation (C50, round 6;
      operators/reporting.py),

    - ``bpe_doc_tokens`` — per-document token counts under the
      SAME trained BPE tokenizer (one word explode joined to the
      broadcast vocab segmentation): the number packing/budgeting
      actually consumes, closing C42's train→apply loop at document
      granularity (C51, round 6; operators/bpe.py),

    - ``unigram_model`` / ``unigram_tokens`` — unigram-LM
      (SentencePiece-style) tokenizer training, the second tokenizer
      family: frequent-substring seed, greedy score-aware
      segmentation (winner-per-offset precomputed, walk via one
      ``aggregate`` lambda), usage recount + prune per round; model
      = (piece, cnt, quantized cost), tokens = per-word piece counts
      under the final model; oracle unrolls the same rounds with
      recursive-CTE walks (C58, round 7; operators/unigram.py),

    - ``psl_domains`` — FULL Public Suffix List registered domains
      over a seeded host mix exercising every rule kind (exact,
      wildcard, exception, bare-label): the zero-Exchange K-join
      plan (C37's production half, round 7; webcurate.py
      registered_domain_psl),

    - round 9: ``l2_neighbors`` / ``rrf_fusion`` (C71 — RRF hybrid
      rank fusion over genuinely-disagreeing cosine vs exact-L2
      rankings; operators/fusion.py), ``postings_stats`` /
      ``boolean_query`` (C72 — inverted index + conjunction-as-
      counting boolean retrieval; operators/invindex.py),
      ``record_linkage`` (C73 — blocked entity resolution with
      Levenshtein + token Jaccard over seeded typo twins;
      operators/linkage.py), ``pareto_front`` (C74 — two-stage
      skyline selection; operators/pareto.py), and ``rendezvous``
      (C75 — HRW shard assignment as one zero-shuffle Project;
      operators/sharding.py).
    """
    from umls2rdf_spark.operators.classify import centroid_confusion
    from umls2rdf_spark.operators.imagededup import hamming_near_dup_pairs
    from umls2rdf_spark.operators.profile import profile_table
    from umls2rdf_spark.operators.dedup import (
        band_signatures,
        containment_verify_pairs,
        incremental_dedupe,
        incremental_minhash_dedupe,
        minhash_signatures_mapside,
    )
    from umls2rdf_spark.operators.corpus import (
        bloom_positions,
        decontaminate_bloom,
        snapshot_diff,
    )
    from umls2rdf_spark.operators.selection import (
        epoch_shuffle,
        resample_mixture,
        resample_sqrt_mixture,
        score_percentile,
        select_to_token_budget,
        stratified_sample,
        weighted_sample,
    )
    from umls2rdf_spark.operators.similarity import (
        decontaminate_embeddings,
        hard_negative_topk,
        hard_negative_topk_lsh,
        semantic_dedup,
    )
    from umls2rdf_spark.operators.bpe import bpe_doc_tokens, train_bpe
    from umls2rdf_spark.operators.htmlextract import html_stats
    from umls2rdf_spark.operators.embed import hashed_embedding
    from umls2rdf_spark.operators.pii import pii_scrub
    from umls2rdf_spark.operators.repetition import doc_repetition
    from umls2rdf_spark.operators.reporting import (
        diversity_report,
        quality_report,
    )
    from umls2rdf_spark.operators.sketch import (
        cms_estimates,
        cms_sketch,
        hll_estimate,
        hll_registers,
    )
    from umls2rdf_spark.operators.cdc import cdc_dedup_stats
    from umls2rdf_spark.operators.dedup import dedup_keep_k
    from umls2rdf_spark.operators.fusion import rrf_fuse
    from umls2rdf_spark.operators.invindex import (
        boolean_query,
        build_postings,
        postings_stats,
    )
    from umls2rdf_spark.operators.linkage import link_records
    from umls2rdf_spark.operators.pareto import pareto_front
    from umls2rdf_spark.operators.sharding import rendezvous_assign
    from umls2rdf_spark.operators.drift import chi_square_drift
    from umls2rdf_spark.operators.robust import winsorize
    from umls2rdf_spark.operators.webcurate import dedup_by_url
    from umls2rdf_spark.sources.text import sized_write_plan
    from umls2rdf_spark.operators.textstats import (
        bigram_surprisal,
        char_profile,
        gopher_quality,
        kn_surprisal,
        bm25_topk,
        ccnet_buckets,
        frequent_tokens,
        pmi_collocations,
        score_log_odds,
        tfidf_topk,
        token_log_odds,
        unigram_surprisal,
    )
    from umls2rdf_spark.plans.llm_demos import dedup_simhash

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    base = docs.where(F.col("doc_id") % 2 == 0)
    shard = docs.where(F.col("doc_id") % 2 == 1)
    toked = docs.withColumn(
        "ntok",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")),
    )
    from umls2rdf_spark.operators.unigram import (
        unigram_doc_tokens,
        unigram_lm_train,
        unigram_vocab_after,
    )
    from umls2rdf_spark.operators.wordpiece import (
        train_wordpiece,
        wordpiece_doc_tokens,
        wordpiece_pieces,
        wordpiece_segment,
        wordpiece_vocab_after,
    )

    # the three tokenizer trainings each run ONCE and feed several
    # sections; their merge/EM rounds are serial chains of driver
    # jobs, but the three chains are independent of each other — run
    # them concurrently (same §2.6 overlap as _build_sections) so the
    # build pays max(bpe, unigram, wordpiece), not the sum
    (
        (bpe_merges_df, bpe_vocab),
        uni_model,
        (wp_merges_df, wp_vocab),
        simhash_df,
        l2_df,
        postings_df,
    ) = _build_sections(
        [
            lambda: train_bpe(docs, "text", rounds=_BPE_ROUNDS),
            lambda: unigram_lm_train(
                docs,
                "text",
                vocab_size=_UNI_VOCAB,
                rounds=_UNI_ROUNDS,
                seed_size=_UNI_SEED,
            ),
            lambda: train_wordpiece(docs, "text", rounds=_WP_ROUNDS),
            # frames consumed by TWO sections each — construct once
            # (execution still dedups via ReuseExchange; this saves
            # the doubled plan-construction chatter)
            lambda: dedup_simhash(spark, sf_dir),
            lambda: _l2_list(emb),
            lambda: build_postings(docs, "doc_id", "text"),
        ]
    )
    from umls2rdf_spark.operators.corpus import decontaminate_lexical
    from umls2rdf_spark.operators.normalize import normalize_text
    from umls2rdf_spark.operators.paragraphs import dedup_paragraphs
    from umls2rdf_spark.operators.webcurate import registered_domain_psl
    # ONE bigram-occurrence stream feeds both LM scorers (bigram
    # raw-MLE + Kneser-Ney): one scan+explode, one cached copy —
    # per-op persists would double both
    from umls2rdf_spark.operators.caching import op_scope
    from umls2rdf_spark.operators.textstats import bigram_occurrences

    occ_scope = op_scope(spark, "ts_bigram_occ")
    shared_occ = occ_scope.persist(
        bigram_occurrences(docs, "doc_id", "text")
    )
    # ONE map-side minhash signature pass feeds the LSH pair section
    # AND both sides of the incremental near-dup intake (base index +
    # shard signatures, the latter consumed TWICE inside the
    # operator): the signature expression is the key's most expensive
    # per-row projection (md5 per shingle x num_perm permutation
    # minima), and it is a pure per-row function, so slicing the
    # persisted full-corpus frame by the shard predicate is
    # row-identical to signing each slice (sigs(df.where(p)) ==
    # sigs(df).where(p); pinned by test_incremental_minhash).
    from umls2rdf_spark.operators.dedup import lsh_candidate_pairs
    from umls2rdf_spark.operators.spread import spread_small_input
    from umls2rdf_spark.plans.llm_demos import _NUM_PERM as _LSH_PERM

    assert _LSH_PERM == _IMH_PERM, "shared signature frame needs one num_perm"
    sig_scope = op_scope(spark, "ts_minhash_sigs")
    # spread (gated; no-op on real multi-split layouts) BEFORE the
    # signature projection: the persisted frame inherits the input's
    # partitioning, and a single-file local scan is one partition —
    # without this the md5-per-shingle × num_perm signature pass (the
    # key's most expensive per-row projection) materializes on one
    # core as a ~2 s single-task stage on the union's critical path
    shared_sigs = sig_scope.persist(
        minhash_signatures_mapside(
            spread_small_input(docs, "doc_id"),
            "doc_id", "text", num_perm=_IMH_PERM,
        )
    )
    # ONE q-digest build feeds the node-state AND rank-query
    # sections (the digest is <= 2k·levels rows — persisting it
    # costs nothing and halves the corpus histogram scans)
    from umls2rdf_spark.operators.sketch import (
        qdigest_build,
        qdigest_quantiles,
    )

    # ONE Kneser-Ney scoring run feeds its own section AND the CCNet
    # bucket partition (per-doc frame, persisted — recomputing KN is
    # the weight-collect jobs twice)
    kn_scope = op_scope(spark, "ts_kn")
    shared_kn = kn_scope.persist(
        kn_surprisal(docs, "doc_id", "text", occ=shared_occ)
    )
    qd_scope = op_scope(spark, "ts_qdigest")
    shared_qdigest = qd_scope.persist(
        qdigest_build(
            docs.select(
                F.least(
                    F.col("n_chars"), F.lit((1 << _QD_LEVELS) - 1)
                ).alias("len_clamped")
            ),
            "len_clamped",
            levels=_QD_LEVELS,
            k=_QD_K,
        )
    )
    builders = [
        # row-identical to dedup_minhash(spark, sf_dir): the same
        # lsh_candidate_pairs over the same map-side signatures, just
        # reading the shared persisted signature frame
        lambda: fingerprint_section(
            lsh_candidate_pairs(shared_sigs, "doc_id", rows_per_band=1),
            "minhash_pairs",
        ),
        lambda: fingerprint_section(simhash_df, "simhash"),
        # banded Hamming near-dup join over those simhashes — the
        # generic perceptual-hash pair operator (imagededup.py; its
        # image aHash front-end is tests-only, binary decode) driven
        # on corpus data: complete for hamming<=3 at 4 bands
        lambda: fingerprint_section(
            hamming_near_dup_pairs(
                simhash_df, "doc_id", "simhash",
                max_hamming=3, bands=4, hash_bits=32,
            ),
            "simhash_hamming",
        ),
        lambda: fingerprint_section(
            tfidf_topk(docs, "doc_id", "text", k=_TFIDF_K),
            "tfidf",
            ("tfidf",),
        ),
        lambda: fingerprint_section(
            bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=_BM25_K),
            "bm25",
        ),
        lambda: fingerprint_section(
            unigram_surprisal(docs, "doc_id", "text"),
            "surprisal",
            ("bits_per_token",),
        ),
        lambda: fingerprint_section(
            centroid_confusion(emb, "vec_id", "embedding", "label"),
            "centroid_confusion",
        ),
        lambda: fingerprint_section(
            incremental_dedupe(shard, base, "doc_id", "text"),
            "incremental_dedupe",
        ),
        lambda: fingerprint_section(
            frequent_tokens(
                docs.select("doc_id", "text"), "text", k=_FREQ_K
            ),
            "frequent_tokens",
        ),
        lambda: fingerprint_section(
            incremental_minhash_dedupe(
                shard, base, "doc_id", "text",
                num_perm=_IMH_PERM, min_jaccard=_IMH_JACCARD,
                base_index=band_signatures(
                    shared_sigs.where(F.col("doc_id") % 2 == 0),
                    "doc_id",
                ),
                shard_sigs=shared_sigs.where(F.col("doc_id") % 2 == 1),
            ),
            "incremental_minhash",
        ),
        lambda: fingerprint_section(
            semantic_dedup(
                emb, "vec_id", "embedding", min_cos=_SD_MIN_COS,
                cells=_SD_CELLS, iters=_SD_ITERS, dim=_SD_DIM,
            ),
            "semantic_dedup",
        ),
        lambda: fingerprint_section(
            select_to_token_budget(
                toked, "doc_id", "ntok", "n_chars",
                budget=_TB_BUDGET, shards=_TB_SHARDS,
            ),
            "token_budget",
        ),
        lambda: fingerprint_section(
            resample_mixture(
                docs, "source", "doc_id", _MIX_PARTS,
                precision=_MIX_PRECISION,
            ),
            "mixture",
        ),
        lambda: fingerprint_section(
            decontaminate_bloom(
                docs.where(F.col("doc_id") % _BLOOM_BENCH_MOD != 0),
                bloom_positions(
                    docs.where(F.col("doc_id") % _BLOOM_BENCH_MOD == 0),
                    "doc_id", "text",
                    shingle_n=_BLOOM_N, m_bits=_BLOOM_M, k=_BLOOM_K,
                ),
                "doc_id", "text",
                shingle_n=_BLOOM_N, m_bits=_BLOOM_M, k=_BLOOM_K,
            ),
            "bloom_decontam",
        ),
        lambda: fingerprint_section(
            epoch_shuffle(
                docs.select("doc_id", "source"), "doc_id",
                seed=_EPOCH_SEED,
            ),
            "epoch_shuffle",
        ),
        lambda: fingerprint_section(
            score_log_odds(
                docs,
                token_log_odds(
                    docs.withColumn(
                        "__lbl", F.col("lang") == "en"
                    ),
                    "doc_id", "text", "__lbl",
                    quant_bits=_QC_BITS,
                ),
                "doc_id", "text", quant_bits=_QC_BITS,
            ),
            "quality_classifier",
            ("avg_logodds",),
        ),
        lambda: fingerprint_section(
            bigram_surprisal(docs, "doc_id", "text", occ=shared_occ),
            "bigram_surprisal",
            ("bits_per_bigram",),
        ),
        # SURVEY C52 (round 6): Kneser-Ney smoothed bigram LM scoring
        # — the CCNet-style perplexity filter's smoothing; per-type
        # weights computed DISTRIBUTED on the bigram-type frame
        # (cast-before-multiply exact-int log2 args, same expression
        # tree in the twin), per-doc sums pure int64
        lambda: fingerprint_section(
            shared_kn,
            "kn_surprisal",
            ("kn_bits_per_bigram",),
        ),
        # SURVEY C53 (round 6): character-class / Unicode-script
        # profile over the deterministically multilingual-seeded
        # corpus (doc_id mod 3 → Cyrillic, mod 5 → CJK, mod 11 →
        # control chars; every class + the empty-guard fires) — one
        # zero-shuffle codegen Project, int64 ppm floor-divisions
        lambda: fingerprint_section(
            char_profile(_script_pages_frame(docs), "doc_id", "text"),
            "char_profile",
        ),
        # SURVEY C54 (round 6): asymmetric n-gram containment over
        # candidate pairs — the subset-duplicate signal (prefix twins
        # score containment ≈ 1 at small Jaccard; the id-neighbor
        # pairs exercise low overlap and the missing-side NULL path)
        lambda: fingerprint_section(
            containment_verify_pairs(
                *_containment_frames(docs), "doc_id", "text",
                shingle_n=3,
            ),
            "containment",
            ("jaccard", "containment_a", "containment_b"),
        ),
        # SURVEY C55 (round 6): per-source cross-document n-gram
        # diversity (type-token ratios) — unigrams, bigrams and the
        # doc marker ride ONE concatenated struct stream (one scan,
        # one explode), then a (source, kind, gram) map-side-combined
        # groupBy + |sources|-scale rollup
        lambda: fingerprint_section(
            diversity_report(docs, "doc_id", "text", "source"),
            "diversity_report",
        ),
        # SURVEY C56 (round 6): deterministic weighted systematic
        # sampling — inclusion ∝ token count, exact int64 selection
        # predicate over the two-level sharded cumsum (no global
        # sort, no float priorities)
        lambda: fingerprint_section(
            weighted_sample(
                toked, "doc_id", "ntok", k=_WS_K, seed=_WS_SEED
            ),
            "weighted_sample",
        ),
        # SURVEY C57 (round 6): per-source score→percentile
        # calibration — the CDF lives on the bounded (source, score)
        # counts frame (distinct-count-value argument), broadcast
        # back; the corpus is never sorted or windowed
        lambda: fingerprint_section(
            score_percentile(docs, "doc_id", "n_chars", "source"),
            "score_calibration",
        ),
        # SURVEY D7: the one-pass profiler's exact mode (the
        # catalog/data-quality gate) — COUNT(DISTINCT) per column in
        # one aggregation, min/max stringified; the HLL default mode
        # stays under its closeness test by nature
        lambda: fingerprint_section(
            profile_table(docs, exact=True), "profile"
        ),
        # composite Gopher-style quality gate: integer-quantized
        # word/length/alpha/stopword rules, pass verdict engine-exact
        lambda: fingerprint_section(
            gopher_quality(docs, "doc_id", "text"), "gopher_quality"
        ),
        # hard-negative mining (contrastive-training data op): top-2
        # most-similar DIFFERENT-label vectors per query
        lambda: fingerprint_section(
            hard_negative_topk(
                emb, emb.where(F.col("vec_id") < _HN_QUERIES),
                "vec_id", "embedding", "label", k=_HN_K,
            ),
            "hard_negatives",
            ("cos_sim",),
        ),
        # bucketed hard-negative mining — the corpus-as-queries
        # scale form: every vector mines its top-k different-label
        # neighbors WITHIN its hyperplane bucket (per-bucket matmul,
        # never the O(n²) broadcast scorer above)
        lambda: fingerprint_section(
            hard_negative_topk_lsh(
                emb, "vec_id", "embedding", "label",
                k=_HN_K, planes=_HNL_PLANES,
            ),
            "hard_negatives_lsh",
            ("cos_sim",),
        ),
        # SURVEY D5's computational core under the driver gate
        # (round 6): schema-on-read PERMISSIVE parse + per-shard
        # quarantine counting. The JSON payload is built in-plan
        # (to_json of the doc row) and deterministically corrupted —
        # doc_id % _QUAR_MOD rows lose their last two bytes — so
        # both engines construct, break, parse, and count the same
        # rows; sum_chars only aggregates successfully-parsed
        # payloads (null-propagation through the corrupt rows).
        lambda: fingerprint_section(
            _ingest_quarantine_frame(docs), "ingest_quarantine"
        ),
        # SURVEY D6's sizing rule as a full aggregation (round 6):
        # per-source records-per-file cap and file count from exact
        # byte totals — integer math end to end (sources/text.py
        # sized_write_plan; write_sized_parquet applies the same
        # rule from a driver-side sample on the write path)
        lambda: fingerprint_section(
            sized_write_plan(
                docs.select("source", "text"), "source",
                F.octet_length("text"), target_bytes=_SIZED_TARGET,
            ),
            "sized_write_plan",
        ),
        # SURVEY C37 (round 6): FineWeb-style host-level curation —
        # blocklist anti-join + deterministic hash-rank cap per
        # domain, compiled to WindowGroupLimit Partial/Final (map
        # tasks prune to <= cap rows per domain pre-shuffle)
        lambda: fingerprint_section(
            curation_demos.domain_cap(spark, sf_dir), "domain_cap"
        ),
        # SURVEY C38 (round 6): DSIR hashed-n-gram importance
        # weights — 256-bucket bounded-state model trained in one
        # conditional-agg pass, scored through a broadcast dim
        lambda: fingerprint_section(
            curation_demos.dsir_weights(spark, sf_dir),
            "dsir_weights",
            ("avg_dsir",),
        ),
        # SURVEY C39 (round 6): release-to-release snapshot diff —
        # added/removed/changed/unchanged per doc id over a
        # map-side-fingerprinted full-outer join (the shuffle
        # carries 16-byte md5s, never text). Snapshots derived
        # deterministically: base drops doc_id%3==0, new drops
        # doc_id%5==0 and revises the text of doc_id%7==0, so every
        # status class is populated in both engines.
        lambda: fingerprint_section(
            snapshot_diff(
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
            ),
            "snapshot_diff",
        ),
        # SURVEY C40 (round 6): HTML → text extraction + page audit
        # in ONE codegen select over the wrapped corpus — the crawl
        # pipeline's first step (C4/RefinedWeb), value-verified
        # byte-for-byte including entity decode order
        lambda: fingerprint_section(
            html_stats(
                _html_pages_frame(docs), "doc_id", "html",
                text_col="clean",
            ),
            "html_extract",
        ),
        # SURVEY C41 (round 6): canonical-URL dedup — FineWeb's
        # first dedup pass; normalization rules all fire on the
        # 3-variant fixture and WindowGroupLimit prunes per-URL
        # candidates map-side (same machinery as domain_cap)
        lambda: fingerprint_section(
            dedup_by_url(_url_pages_frame(docs), "doc_id", "url"),
            "url_dedup",
        ),
        # SURVEY C42 (round 6): byte-level BPE tokenizer training —
        # fixed rounds so the oracle unrolls them as CTEs (the
        # pagerank/Lloyd discipline); corpus scanned once into the
        # vocab-bounded (word,freq) frame, every round runs on THAT
        lambda: fingerprint_section(bpe_merges_df, "bpe_merges"),
        # SURVEY C42's application half: the post-merge vocab
        # segmentation — per-word subword counts, the number
        # packing/epoch budgeting consumes; same run, same oracle
        # CTE chain (final __v{rounds} select)
        lambda: fingerprint_section(
            bpe_vocab.select(
                "word",
                "freq",
                F.size(F.split("seg", " ")).alias("n_subwords"),
            ),
            "bpe_tokens",
        ),
        # SURVEY C43 (round 6): embedding-based benchmark
        # decontamination — the semantic complement of the exact
        # n-gram passes; benchmark = every-23rd embedding (the
        # bounded-by-nature side, broadcast), corpus scanned once
        lambda: fingerprint_section(
            decontaminate_embeddings(
                emb.where(F.col("vec_id") % 23 != 0),
                emb.where(F.col("vec_id") % 23 == 0),
                "vec_id",
                "embedding",
                min_cos=_DECON_MIN_COS,
            ),
            "embedding_decontam",
            float_cols=("max_cos",),
        ),
        # SURVEY C44 (round 6): PII redaction — the corpus is
        # deterministically seeded with emails/IPs/SSNs/phones from
        # doc_id arithmetic (every rule fires on a known subset;
        # doc_id ≡ 1 mod 2·3·5·7 rows stay clean, exercising the
        # zero-count path), then scrubbed in one zero-shuffle select
        lambda: fingerprint_section(
            pii_scrub(_pii_pages_frame(docs), "doc_id", "text"),
            "pii_scrub",
        ),
        # SURVEY C45 (round 6): within-doc repetition signals — the
        # shuffle-free in-row run-length form over the raw corpus
        lambda: fingerprint_section(
            doc_repetition(docs, "doc_id", "text"), "doc_repetition"
        ),
        # SURVEY C46 (round 6): count-min over token occurrences —
        # the whole d×w matrix is the section (cell-for-cell value
        # verification), estimates for a fixed query list incl. an
        # absent key (collision floor) and corpus-frequent tokens
        lambda: fingerprint_section(
            cms_sketch(
                _token_occ_frame(docs), "token",
                depth=_CMS_D, width=_CMS_W,
            ),
            "cms_sketch",
        ),
        lambda: fingerprint_section(
            cms_estimates(
                cms_sketch(
                    _token_occ_frame(docs), "token",
                    depth=_CMS_D, width=_CMS_W,
                ),
                list(_CMS_QUERIES), depth=_CMS_D, width=_CMS_W,
            ),
            "cms_estimates",
        ),
        # SURVEY C47 (round 6): explicit HLL over the same stream —
        # all m registers gated (the mergeable state itself), plus
        # the raw-alpha estimate row
        lambda: fingerprint_section(
            hll_registers(_token_occ_frame(docs), "token", b=_HLL_B),
            "hll_registers",
        ),
        lambda: fingerprint_section(
            hll_estimate(
                hll_registers(
                    _token_occ_frame(docs), "token", b=_HLL_B
                ),
                b=_HLL_B,
            ),
            "hll_estimate",
        ),
        # SURVEY C48 (round 6): tau=0.5 temperature mixing with the
        # parts derived IN-PLAN from quantized sqrt(domain count) —
        # the hand-weight-free multi-source sampling default
        lambda: fingerprint_section(
            resample_sqrt_mixture(
                docs, "source", "doc_id", precision=_MIX_PRECISION
            ),
            "temp_mixture",
        ),
        # SURVEY C49 (round 6): feature-hashing embeddings — the
        # integer-exact long form (doc, dim, value); the array form
        # feeds the similarity family end-to-end in tests
        lambda: fingerprint_section(
            hashed_embedding(
                _token_occ_id_frame(docs), "doc_id", "token",
                dim=_EMB_DIM,
            ),
            "hashed_embedding",
        ),
        # SURVEY D9's computational core under the driver gate
        # (round 6): the observed per-stage survivor counts of a
        # deterministic curation funnel — the values READ FROM the
        # Observation accumulators (one action, zero extra scans),
        # oracle = the same cumulative filters as SQL COUNTs
        lambda: fingerprint_section(
            _funnel_frame(spark, docs), "pipeline_funnel"
        ),
        # SURVEY C50 (round 6): per-source dataset-card report —
        # the PII and repetition signal families FUSED into one
        # corpus scan (expr-level builders) + one |sources|-group
        # map-side-combined aggregation
        lambda: fingerprint_section(
            quality_report(
                _pii_pages_frame(docs), "doc_id", "text", "source"
            ),
            "quality_report",
        ),
        # SURVEY C51 (round 6): per-doc token counts under the SAME
        # trained tokenizer (vocab reused — training ran once above)
        lambda: fingerprint_section(
            bpe_doc_tokens(docs, "doc_id", "text", vocab=bpe_vocab),
            "bpe_doc_tokens",
        ),
        # SURVEY C58 (round 7): unigram-LM (SentencePiece-style)
        # tokenizer training — the second mainstream tokenizer
        # family beside BPE: frequent-substring seed, greedy
        # score-aware segmentation, usage recount + prune per round;
        # one training run feeds the model AND its application half
        # (per-word piece counts), same unrolled-CTE oracle
        # discipline (operators/unigram.py)
        lambda: fingerprint_section(uni_model, "unigram_model"),
        lambda: fingerprint_section(
            unigram_vocab_after(
                docs,
                "text",
                vocab_size=_UNI_VOCAB,
                rounds=_UNI_ROUNDS,
                seed_size=_UNI_SEED,
                model=uni_model,
            ),
            "unigram_tokens",
        ),
        # C58's per-doc application (round 7): token counts under the
        # SAME trained unigram model — the C51 counterpart for the
        # second tokenizer family (model reused; training ran once)
        lambda: fingerprint_section(
            unigram_doc_tokens(
                docs, "doc_id", "text", model=uni_model
            ),
            "unigram_doc_tokens",
        ),
        # SURVEY C59 (round 8): WordPiece — the THIRD mainstream
        # tokenizer family (BERT-style likelihood-scored merges,
        # operators/wordpiece.py): same vocab-bounded round shape as
        # BPE, winner ranked by the engine-exact quantized score
        # cnt(ab)*2^40 div (cnt(a)*cnt(b)); ONE training run feeds
        # model + both application halves
        lambda: fingerprint_section(wp_merges_df, "wordpiece_model"),
        lambda: fingerprint_section(
            wordpiece_vocab_after(docs, "text", vocab=wp_vocab),
            "wordpiece_tokens",
        ),
        lambda: fingerprint_section(
            wordpiece_doc_tokens(
                docs, "doc_id", "text", vocab=wp_vocab
            ),
            "wordpiece_doc_tokens",
        ),
        # C59's inference half: greedy LONGEST-MATCH-FIRST walk (the
        # real WordPiece apply algorithm — deliberately NOT the
        # training segmentation; the train/inference asymmetry is the
        # family's defining trait) under the trained piece inventory
        lambda: fingerprint_section(
            wordpiece_segment(
                docs, wordpiece_pieces(wp_vocab), "text"
            ),
            "wordpiece_segment",
        ),
        # SURVEY C60 (round 8): FUZZY lexical benchmark
        # decontamination — completes the decontamination matrix
        # (exact n-gram C18 / bloom C33 / semantic C43 /
        # fuzzy-lexical): jaccard OR bench-containment vs a seeded
        # benchmark (every 17th doc's 3/5-word prefix — containment
        # 1.0 for the source doc, partial jaccard for near-dups);
        # map-side distinct-shingle arrays, broadcast bench, one
        # corpus scan (operators/corpus.py decontaminate_lexical)
        lambda: fingerprint_section(
            decontaminate_lexical(
                docs,
                _lexical_bench_frame(docs),
                "doc_id",
                "text",
                "bench_id",
                "text",
            ),
            "lexical_decontam",
            ("max_jaccard", "max_bench_containment"),
        ),
        # SURVEY C61 (round 8): top-k PMI collocations — phrase
        # mining over the SHARED bigram-occurrence stream (the same
        # persisted scan both LM scorers read); lift_q is the
        # WordPiece-style DECIMAL/HUGEINT integral-division
        # quantization, so the PMI ranking uses no libm in either
        # engine (operators/textstats.py pmi_collocations)
        lambda: fingerprint_section(
            pmi_collocations(
                docs,
                "doc_id",
                "text",
                min_count=_PMI_MIN_COUNT,
                k=_PMI_K,
                occ=shared_occ,
                cache=occ_scope,
            ),
            "pmi_collocations",
        ),
        # SURVEY C62 (round 8): CCNet per-source perplexity
        # partition — kn_surprisal scores (same shared occurrence
        # stream) cut into head/middle/tail thirds within each
        # source by the score_percentile bounded-CDF machinery
        # (textstats.py ccnet_buckets)
        lambda: fingerprint_section(
            ccnet_buckets(
                docs, "doc_id", "text", "source", kn=shared_kn
            ),
            "ccnet_buckets",
        ),
        # SURVEY C65 (round 8): auditable text normalization —
        # mojibake pairs + ctrl/zero-width/NBSP/whitespace stages
        # with sequential per-stage counts, one zero-shuffle select
        # over the seeded corpus (operators/normalize.py); oracle
        # generated from the same pair/stage constants
        lambda: fingerprint_section(
            normalize_text(
                docs.select(
                    "doc_id",
                    F.concat(
                        F.when(
                            F.col("doc_id") % 5 == 0,
                            F.lit(_NORM_SEED),
                        ).otherwise(F.lit("")),
                        F.col("text"),
                    ).alias("ntext"),
                ),
                "doc_id",
                "ntext",
            ),
            "normalize",
        ),
        # SURVEY C64 (round 8): cross-document paragraph dedup
        # (keep-first, MassiveText/RefinedWeb line dedup) over the
        # boilerplate-seeded corpus: every third doc carries the same
        # cookie-banner paragraph, natural ' the '-split segments
        # provide organic repeats (operators/paragraphs.py)
        lambda: fingerprint_section(
            dedup_paragraphs(
                _para_seeded_frame(docs),
                "doc_id",
                "ptext",
                min_chars=_PARA_MIN_CHARS,
            ),
            "paragraph_dedup",
        ),
        # SURVEY C63 (round 8): q-digest — the deterministic
        # mergeable quantile sketch completing the sketch family
        # (CMS/HLL/q-digest); ONE persisted build over the doc-length
        # histogram feeds both the node-state and the rank-query
        # sections (operators/sketch.py)
        lambda: fingerprint_section(shared_qdigest, "qdigest_nodes"),
        lambda: fingerprint_section(
            qdigest_quantiles(
                shared_qdigest, _QD_QS, levels=_QD_LEVELS
            ),
            "qdigest_quantiles",
        ),
        # SURVEY C37's production half (round 7): FULL-PSL registered
        # domains — wildcard + exception rules resolved by the
        # zero-Exchange K-join plan (webcurate.py
        # registered_domain_psl); the seeded host mix exercises every
        # rule kind (exact 1/2-label, wildcard, exception,
        # bare-label pass-through) in both engines
        lambda: fingerprint_section(
            registered_domain_psl(
                _psl_hosts_frame(docs), "host", _PSL_RULES
            ),
            "psl_domains",
        ),
        # SURVEY C66 (round 8): content-defined chunking dedup —
        # fixed-window fingerprint boundaries (operators/cdc.py:
        # shift-resistant cuts from a pure per-position window-hash
        # predicate, zero-shuffle HOF expression) + keep-first chunk
        # accounting; the word-salad corpus repeats phrases
        # naturally, so dup_chars > 0 without seeding (pinned in
        # tests). The oracle groups by the chunk STRING — a match
        # certifies the 128-bit fingerprint grouping collision-free
        lambda: fingerprint_section(
            cdc_dedup_stats(docs, "doc_id", "text"), "cdc_dedup"
        ),
        # SURVEY C67 (round 8): frequency-CAPPED dedup — keep up to
        # k copies per distinct text in corpus order (FineWeb's
        # "some repetition is signal" policy); row_number<=k over
        # the content fingerprint compiles to
        # WindowGroupLimit(Partial) before the Exchange, so hot
        # mirror groups ship O(k·partitions) rows (dedup.py
        # dedup_keep_k); seeded boilerplate groups exercise the cap
        lambda: fingerprint_section(
            dedup_keep_k(
                _keepk_seeded_frame(docs), "doc_id", "ktext",
                k=_KEEPK_K,
            ),
            "keep_k_dedup",
        ),
        # SURVEY C67 (round 8): per-source winsorization — exact
        # type-1 p05/p95 order statistics from the distinct-value-
        # bounded counts frame (operators/robust.py, the B21
        # counting-quantile argument), tails CLIPPED not dropped,
        # per-row pass is one broadcast join against |sources| rows
        lambda: fingerprint_section(
            winsorize(docs, "source", F.col("n_chars"), "doc_id"),
            "winsorize",
        ),
        # SURVEY C68 (round 8): stratified fixed-n sampling — the
        # eval-set carve ("exactly n docs from EVERY source"),
        # engine-neutral hash order so the draw is reproducible and
        # nested (rank <= m gives a consistent sub-sample);
        # row_number<=n compiles to WindowGroupLimit(Partial) —
        # billion-row strata ship O(n·partitions) rows
        # (operators/selection.py stratified_sample)
        lambda: fingerprint_section(
            stratified_sample(docs, "source", "doc_id", _STRAT_N),
            "stratified_sample",
        ),
        # SURVEY C70 (round 8): corpus drift detection — per-source
        # quantized chi-square of a seeded "new crawl" (hash-split
        # half with a shifted length distribution in some sources)
        # against the base half (operators/drift.py; DECIMAL/HUGEINT
        # integral divisions — the PMI discipline, so the statistic
        # is engine-exact, novel buckets reported separately)
        lambda: fingerprint_section(
            chi_square_drift(
                _drift_base_frame(docs),
                _drift_new_frame(docs),
                "source",
                F.col("n_chars"),
                _DRIFT_BUCKET,
            ),
            "drift",
        ),
        # SURVEY C71 (round 9): rank fusion for hybrid retrieval —
        # RRF over two genuinely-disagreeing ranked lists (cosine
        # vs exact-int64 squared-L2 neighbors of the same queries:
        # unnormalized vectors make the metrics rank differently);
        # contributions are integer quotients scale div (k+rank),
        # summed in int64, so the fused scores are engine-exact
        # (operators/fusion.py)
        lambda: fingerprint_section(l2_df, "l2_neighbors"),
        lambda: fingerprint_section(
            rrf_fuse(
                {"cos": _cos_list(emb), "l2": l2_df},
                k_rrf=_RRF_KRRF,
                topk=_RRF_TOPK,
            ),
            "rrf_fusion",
        ),
        # SURVEY C72 (round 9): inverted index + boolean retrieval —
        # postings built once (in-row array_distinct BEFORE the
        # explode: repeated tokens never shuffle), conjunction as
        # counting (COUNT(*)==|must| — one shuffle for any term
        # count), must_not as anti-join, should kept as the rank
        # signal (operators/invindex.py)
        lambda: fingerprint_section(
            postings_stats(postings_df),
            "postings_stats",
        ),
        lambda: fingerprint_section(
            boolean_query(
                postings_df,
                must=_BQ_MUST,
                should=_BQ_SHOULD,
                must_not=_BQ_NOT,
            ),
            "boolean_query",
        ),
        # SURVEY C73 (round 9): blocked record linkage — entity
        # resolution over part names + seeded typo twins: two
        # blocking passes (first token; last token + length bucket),
        # pair dedup across passes, exact Levenshtein + ppm token
        # Jaccard, fail-closed max_block valve
        # (operators/linkage.py)
        lambda: fingerprint_section(
            link_records(
                _linkage_records_frame(spark, sf_dir),
                "p_partkey",
                "p_name",
                max_edit=_LINK_MAX_EDIT,
            ),
            "record_linkage",
        ),
        # SURVEY C74 (round 9): Pareto-frontier selection — the
        # undominated (maximize n_chars, minimize seeded risk score)
        # rows via the two-stage skyline (local fronts per hash
        # shard — lossless by dominance transitivity — then the
        # global pass over the pruned union; operators/pareto.py)
        lambda: fingerprint_section(
            pareto_front(
                docs,
                "doc_id",
                F.col("n_chars"),
                stable_hash40(F.col("doc_id").cast("string"))
                % _PARETO_RISK_MOD,
                shards=_PARETO_SHARDS,
            ),
            "pareto_front",
        ),
        # SURVEY C75 (round 9): rendezvous (HRW) shard assignment —
        # coordination-free placement with minimal movement under
        # resharding (movement-only-into-the-new-shard pinned by
        # test); the packed (weight, index) argmax unrolls into ONE
        # zero-shuffle codegen Project (operators/sharding.py)
        lambda: fingerprint_section(
            rendezvous_assign(
                docs.select("doc_id"), "doc_id", _RV_SHARDS
            ),
            "rendezvous",
        ),
    ]
    return _union(_build_sections(builders))


_BPE_ROUNDS = 4
# C59 WordPiece demo scale: same 4-round unroll as BPE (one extra
# symbol-count CTE per round in the oracle)
_WP_ROUNDS = 4
# C58 unigram-LM demo scale: 2 EM rounds unroll compactly in the
# oracle; 32-piece target over a 256-piece substring seed
_UNI_VOCAB = 32
_UNI_ROUNDS = 2
_UNI_SEED = 256
#: C37 full-PSL demo rules: one of every rule kind (1- and 2-label
#: exact, wildcard, exception) — the publicsuffix.org kobe.jp block
_PSL_RULES = ("com", "co.uk", "jp", "*.kobe.jp", "!city.kobe.jp")
_DECON_MIN_COS = 0.35


def _lexical_bench_frame(docs: DataFrame) -> DataFrame:
    """Seeded benchmark for the C60 lexical_decontam section: every
    17th doc's 3/5-word prefix — bench-containment exactly 1.0 for
    the source doc (prefix shingles ⊂ doc shingles), partial jaccard
    for its near-duplicates; integer `div` arithmetic so both
    engines slice identically."""
    return docs.where(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(
            F.slice(
                F.split(F.col("text"), " "),
                1,
                F.greatest(
                    F.lit(3),
                    F.expr(
                        "CAST((size(split(text, ' ')) * 3) div 5"
                        " AS INT)"
                    ),
                ),
            ),
            " ",
        ).alias("text"),
    )


_LEXICAL_BENCH_SQL = """
SELECT doc_id AS bench_id,
       array_to_string(list_slice(string_split(text, ' '), 1,
         greatest(3, CAST((len(string_split(text, ' ')) * 3) // 5
                          AS INT))), ' ') AS text
FROM documents WHERE doc_id % 17 = 0"""


def _normalize_sql() -> str:
    from umls2rdf_spark.operators.normalize import normalize_text_sql

    seeded = f"""(SELECT doc_id,
       (CASE WHEN doc_id % 5 = 0 THEN {_sql_str(_NORM_SEED)}
             ELSE '' END) || text AS ntext
FROM documents)"""
    return normalize_text_sql(seeded, "doc_id", "ntext")


def _para_seeded_frame(docs: DataFrame) -> DataFrame:
    """C64 seed: every third doc opens with the same boilerplate
    paragraph; ' the ' occurrences become paragraph breaks so natural
    segments repeat organically across docs."""
    boiler = F.when(
        F.col("doc_id") % 3 == 0, F.lit(_PARA_BOILER + "\n")
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(
            boiler,
            F.replace(F.col("text"), F.lit(" the "), F.lit("\n")),
        ).alias("ptext"),
    )


def _paragraph_dedup_sql() -> str:
    from umls2rdf_spark.operators.paragraphs import dedup_paragraphs_sql

    seeded = f"""(SELECT doc_id,
       (CASE WHEN doc_id % 3 = 0
             THEN '{_PARA_BOILER}' || chr(10) ELSE '' END)
       || replace(text, ' the ', chr(10)) AS ptext
FROM documents)"""
    return dedup_paragraphs_sql(
        seeded, "doc_id", "ptext", min_chars=_PARA_MIN_CHARS
    )


def _qdigest_nodes_sql() -> str:
    from umls2rdf_spark.operators.sketch import qdigest_sql

    top = (1 << _QD_LEVELS) - 1
    return qdigest_sql(
        f"SELECT least(n_chars, {top}) AS len_clamped FROM documents",
        "len_clamped",
        levels=_QD_LEVELS,
        k=_QD_K,
    )


def _lexical_decontam_sql() -> str:
    from umls2rdf_spark.operators.corpus import (
        decontaminate_lexical_sql,
    )

    return decontaminate_lexical_sql(
        "SELECT * FROM documents",
        _LEXICAL_BENCH_SQL,
        "doc_id",
        "text",
        "bench_id",
        "text",
    )


_KEEPK_K = 2  # copies kept per distinct text in the keep-k section

_STRAT_N = 5  # fixed per-source sample size (stratified_sample)

_DRIFT_BUCKET = 50  # n_chars bucket width for the drift section


def _drift_split(docs: DataFrame, side: int) -> DataFrame:
    """Hash-split half-corpus — a modulus split would correlate with
    the modulus-derived source labels and leave every group
    single-sided."""
    h = stable_hash40(F.col("doc_id").cast("string"))
    return docs.where(h % 2 == side)


def _drift_base_frame(docs: DataFrame) -> DataFrame:
    return _drift_split(docs, 0).select("doc_id", "source", "n_chars")


def _drift_new_frame(docs: DataFrame) -> DataFrame:
    """The seeded 'new crawl': docs with ``doc_id % 3 == 0`` get a
    +150-char length shift (an extractor regression touching a third
    of EVERY source), the rest stay iid — so each per-source group
    mixes shifted and stable rows and the drifted mass is visible in
    every group's bucket counts."""
    shifted = F.when(
        F.col("doc_id") % 3 == 0, F.col("n_chars") + F.lit(150)
    ).otherwise(F.col("n_chars"))
    return _drift_split(docs, 1).select(
        "doc_id", "source", shifted.alias("n_chars")
    )


_DRIFT_BASE_SQL = (
    "SELECT doc_id, source, n_chars FROM documents WHERE "
    + "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS"
    " BIGINT) % 2 = 0"
)

_DRIFT_NEW_SQL = (
    "SELECT doc_id, source, n_chars + CASE WHEN doc_id % 3 = 0 THEN"
    " 150 ELSE 0 END AS n_chars FROM documents WHERE "
    + "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS"
    " BIGINT) % 2 = 1"
)


def _keepk_seeded_frame(docs: DataFrame) -> DataFrame:
    """Duplicate-group seeding for keep_k_dedup: ~3/7 of docs
    collapse onto 5 boilerplate texts (hot groups well above the
    cap), the rest stay unique singletons."""
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 < 3,
            F.concat(
                F.lit("boilerplate page "),
                (F.col("doc_id") % 5).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("ktext"),
    )


_KEEPK_SQL = (
    "(SELECT doc_id, CASE WHEN doc_id % 7 < 3 THEN 'boilerplate page '"
    " || CAST(doc_id % 5 AS VARCHAR) ELSE text END AS ktext"
    " FROM documents)"
)


def _psl_hosts_frame(docs: DataFrame) -> DataFrame:
    """Deterministically seeded host mix for the psl_domains section:
    doc_id mod 5 routes each doc through a different PSL rule kind —
    plain eTLD+1, multi-label suffix, wildcard (host has a label in
    the * slot), exception, and the bare-label pass-through."""
    m = F.col("doc_id") % 5
    host = (
        F.when(m == 0, F.concat(F.col("source"), F.lit(".alpha.com")))
        .when(m == 1, F.concat(F.col("source"), F.lit(".beta.co.uk")))
        .when(m == 2, F.concat(F.col("source"), F.lit(".sub.kobe.jp")))
        .when(m == 3, F.lit("city.kobe.jp"))
        .otherwise(F.lit("localhost"))
    )
    return docs.select("doc_id", host.alias("host"))


_PSL_HOSTS_SQL = """
SELECT doc_id,
       CASE doc_id % 5
         WHEN 0 THEN source || '.alpha.com'
         WHEN 1 THEN source || '.beta.co.uk'
         WHEN 2 THEN source || '.sub.kobe.jp'
         WHEN 3 THEN 'city.kobe.jp'
         ELSE 'localhost' END AS host
FROM documents
"""


def _unigram_doc_tokens_sql() -> str:
    from umls2rdf_spark.operators.unigram import unigram_doc_tokens_sql

    return unigram_doc_tokens_sql(
        "SELECT * FROM documents",
        "doc_id",
        "text",
        vocab_size=_UNI_VOCAB,
        rounds=_UNI_ROUNDS,
        seed_size=_UNI_SEED,
    )


def _psl_domains_sql() -> str:
    from umls2rdf_spark.operators.webcurate import (
        registered_domain_psl_sql,
    )

    return registered_domain_psl_sql(
        _PSL_HOSTS_SQL, "host", _PSL_RULES
    )

# C46/C47 sketch parameters: d×w = 2048 cells, m = 64 registers —
# the query list mixes corpus-frequent tokens with an absent key so
# the estimate's collision floor is value-pinned too.
_CMS_D = 4
_CMS_W = 512
_CMS_QUERIES = ("the", "data", "join", "window", "zz_absent")
_HLL_B = 6

#: shared token-occurrence stream for the sketch sections
_TOK_ARR = "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_OCC_SQL = (
    "SELECT u.t AS token FROM documents, "
    "UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t) "
    "WHERE u.t <> ''"
)


def _token_occ_frame(docs: DataFrame) -> DataFrame:
    return docs.select(F.explode(F.expr(_TOK_ARR)).alias("token"))


# C49: the id-carrying occurrence stream + embedding dim
_EMB_DIM = 16
_OCC_ID_SQL = (
    "SELECT doc_id, u.t AS token FROM documents, "
    "UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t) "
    "WHERE u.t <> ''"
)


def _token_occ_id_frame(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.expr(_TOK_ARR)).alias("token")
    )


# D9 (round 6): the funnel's stages — deterministic filters both
# engines express identically; cumulative by construction.
_FUNNEL_STAGES = (
    ("chars", "n_chars >= 200"),
    ("lang", "lang IN ('en', 'de')"),
    ("mod", "doc_id % 3 != 0"),
)


def _funnel_frame(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Run the instrumented funnel ONCE (a single count action
    populates every Observation) and return the observed stage
    counts as a bounded frame — |stages|+1 rows of driver data, the
    same bounded-collect class as bigram_surprisal's weight dims."""
    from umls2rdf_spark.operators.metrics import funnel

    staged, obs = funnel(
        docs,
        [
            (name, lambda d, p=pred: d.where(F.expr(p)))
            for name, pred in _FUNNEL_STAGES
        ],
    )
    staged.count()  # the one action; every observation point fills
    rows = [
        (name, int(o.get["n_rows"])) for name, o in obs.items()
    ]
    return spark.createDataFrame(rows, "stage string, n_rows bigint")


def _funnel_sql() -> str:
    preds: list[str] = []
    pieces = [
        "SELECT 'input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_rows "
        "FROM documents"
    ]
    for name, pred in _FUNNEL_STAGES:
        preds.append(f"({pred.replace('!=', '<>')})")
        pieces.append(
            f"SELECT '{name}', CAST(COUNT(*) AS BIGINT) "
            f"FROM documents WHERE {' AND '.join(preds)}"
        )
    return " UNION ALL ".join(pieces)


def _ingest_quarantine_frame(docs: DataFrame) -> DataFrame:
    from umls2rdf_spark.sources.text import (
        CORRUPT_COL,
        from_json_quarantine,
    )

    payload = F.to_json(F.struct("doc_id", "lang", "n_chars"))
    staged = docs.select(
        "source", "doc_id", payload.alias("payload")
    ).withColumn(
        "payload",
        F.when(
            F.col("doc_id") % _QUAR_MOD == 0,
            F.expr("substring(payload, 1, length(payload) - 2)"),
        ).otherwise(F.col("payload")),
    )
    q = from_json_quarantine(
        staged, "payload",
        "doc_id bigint, lang string, n_chars bigint", "doc_id",
    )
    return q.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count(CORRUPT_COL).cast("bigint").alias("n_corrupt"),
        (F.count(F.lit(1)) - F.count(CORRUPT_COL))
        .cast("bigint")
        .alias("n_good"),
        F.coalesce(F.sum("__parsed.n_chars"), F.lit(0))
        .cast("bigint")
        .alias("sum_chars"),
    )


_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, u.t AS token
  FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+'))
       AS u(t)
  WHERE u.t <> ''
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token, tf, doc_freq, tfidf, rank
FROM (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.doc_freq,
         CAST(tf.tf * n.n_docs AS DOUBLE)
           / CAST(dfreq.doc_freq AS DOUBLE) AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE)
                    / CAST(dfreq.doc_freq AS DOUBLE) DESC,
                    tf.token ASC
         ) AS rank
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
)
WHERE rank <= {_TFIDF_K}
"""

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)
_BM25_SQL = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS toks
  FROM documents
),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM base),
tf AS (
  SELECT b.doc_id, dl.dl, u.t AS token, COUNT(*) AS tf
  FROM base b JOIN dl ON b.doc_id = dl.doc_id,
       UNNEST(b.toks) AS u(t)
  WHERE u.t IN ({_BM25_TERMS_SQL})
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
totals AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens FROM dl)
SELECT doc_id, score_q, n_terms_hit
FROM (
  SELECT tf.doc_id,
         CAST(SUM(CAST(FLOOR(
           1000000.0
           * (CAST(n_docs AS DOUBLE) / CAST(doc_freq AS DOUBLE))
           * (CAST(22 * tf * total_tokens AS DOUBLE)
              / CAST(10 * tf * total_tokens + 3 * total_tokens
                     + 9 * dl * n_docs AS DOUBLE))
         ) AS BIGINT)) AS BIGINT) AS score_q,
         COUNT(*) AS n_terms_hit
  FROM tf JOIN dfreq USING (token) CROSS JOIN totals
  GROUP BY 1
)
ORDER BY score_q DESC, doc_id ASC
LIMIT {_BM25_K}
"""

# The weight dim is computed with log2 in DuckDB; the Spark operator
# computes it with Python math.log2 on the driver. Both call the same
# platform libm, and the quantization boundary (an exact .5 at 2^-20)
# is measure-zero, so the int64 weight tables agree.
_SURPRISAL_SQL = f"""
WITH toks AS (
  SELECT doc_id, u.t AS token
  FROM documents,
       UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
  WHERE u.t <> ''
),
counts AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
tot AS (SELECT SUM(cnt) AS total FROM counts),
wdim AS (
  SELECT cnt,
         CAST(round((log2(CAST(total AS DOUBLE))
                     - log2(CAST(cnt AS DOUBLE)))
                    * {_SURPRISAL_SCALE}) AS BIGINT) AS w
  FROM (SELECT DISTINCT cnt FROM counts) CROSS JOIN tot
),
per_tok AS (
  SELECT t.doc_id, w.w
  FROM toks t JOIN counts c USING (token) JOIN wdim w USING (cnt)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(w) AS BIGINT) AS surprisal_q,
       CAST(SUM(w) AS DOUBLE) / {float(_SURPRISAL_SCALE)}
         / CAST(COUNT(*) AS DOUBLE) AS bits_per_token
FROM per_tok GROUP BY doc_id
"""


def _centroid_sql() -> str:
    h = stable_hash40_sql("CAST(vec_id AS VARCHAR)")
    return f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv,
         {h} % 5 AS bucket
  FROM embeddings
),
trc AS (
  SELECT label, CAST(u.i AS INT) AS pos,
         SUM(qv[CAST(u.i AS INT)]) AS s, COUNT(*) AS n
  FROM q, UNNEST(range(1, len(qv)+1)) AS u(i)
  WHERE bucket <> 0
  GROUP BY 1, 2
),
cent AS (
  SELECT label AS clabel, pos,
         (s - ((s % n) + n) % n) // n AS cc
  FROM trc
),
dist AS (
  SELECT t.vec_id, t.label, c.clabel,
         SUM((t.c - c.cc) * (t.c - c.cc)) AS d2
  FROM (SELECT vec_id, label, CAST(u.i AS INT) AS pos,
               qv[CAST(u.i AS INT)] AS c
        FROM q, UNNEST(range(1, len(qv)+1)) AS u(i)
        WHERE bucket = 0) t
  JOIN cent c USING (pos)
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT vec_id, label, clabel AS predicted,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d2, clabel) AS rn
  FROM dist
)
SELECT CAST(label AS INT) AS label,
       CAST(predicted AS INT) AS predicted,
       CAST(COUNT(*) AS BIGINT) AS n,
       label = predicted AS is_correct
FROM pred WHERE rn = 1
GROUP BY 1, 2, 4
"""


_INCREMENTAL_SQL = """
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

_FREQ_SQL = f"""
WITH toks AS (
  SELECT doc_id, u.t AS token
  FROM documents,
       UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
  WHERE u.t <> ''
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token)
            AS INT) AS rank
FROM toks GROUP BY token
ORDER BY rank LIMIT {_FREQ_K}
"""

_IMH_PERM_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, a, b in perm_params(_IMH_PERM)
)
# Shard = odd doc_ids vs base = even. Drop rule mirrors the operator:
# a shard doc goes if a verified pair links it to the base (it is
# id_a) or to a LOWER-id shard doc (it is id_b).
_IMH_SQL = f"""
WITH filtered AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS f
  FROM documents),
indexed AS (
  SELECT doc_id, f,
         unnest(generate_series(1, greatest(len(f) - 2, 0))) AS i
  FROM filtered),
shingles AS (
  SELECT DISTINCT doc_id, f[i] || ' ' || f[i+1] || ' ' || f[i+2] AS shingle
  FROM indexed),
hashed AS (
  SELECT doc_id, {stable_hash40_sql('shingle')} AS h FROM shingles),
perms(perm_id, a, b) AS (VALUES {_IMH_PERM_VALUES}),
sigs AS (
  SELECT doc_id, perm_id, MIN((a * h + b) % {PERM_MODULUS}) AS minhash
  FROM hashed CROSS JOIN perms GROUP BY 1, 2),
bands AS (
  SELECT doc_id, perm_id AS band, CAST(minhash AS VARCHAR) AS band_sig
  FROM sigs),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
  WHERE a.doc_id % 2 = 1 AND (b.doc_id % 2 = 0 OR
        (b.doc_id % 2 = 1 AND a.doc_id < b.doc_id))),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.id_a
  JOIN shingles sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2),
verified AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  LEFT JOIN inter USING (id_a, id_b)
  JOIN sizes za ON za.doc_id = c.id_a
  JOIN sizes zb ON zb.doc_id = c.id_b
  WHERE CAST(COALESCE(inter.inter, 0) AS DOUBLE)
        / CAST(za.sz + zb.sz - COALESCE(inter.inter, 0) AS DOUBLE)
        >= {_IMH_JACCARD}),
dropped AS (
  SELECT id_a AS doc_id FROM verified WHERE id_b % 2 = 0
  UNION
  SELECT id_b AS doc_id FROM verified WHERE id_b % 2 = 1)
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def _semantic_dedup_sql() -> str:
    """SQL twin of the semantic_dedup section: the SAME deterministic
    integer Lloyd's iterations the distributed trainer runs, unrolled
    as CTE chains (assign with c_{k-1} → per-cell floor-div mean →
    c_k, empty cells carrying forward), then final assignment and
    within-cell cosine drops. Training is re-derived from the data
    INSIDE the query, so the oracle is valid at any SF — unlike an
    inlined centroid table. Floor division is spelled with the
    modulo correction (exact, engine-neutral); the cosine double is
    built from exact int dot/norms like every other vector oracle."""
    from umls2rdf_spark.operators.similarity import ivf_centroid

    init = ", ".join(
        f"({i}, {j + 1}, {ivf_centroid(i, j)})"
        for i in range(_SD_CELLS)
        for j in range(_SD_DIM)
    )
    ctes = [
        """qv AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings)""",
        """comps AS (
  SELECT vec_id, CAST(u.i AS INT) AS pos, v[CAST(u.i AS INT)] AS comp
  FROM qv, UNNEST(range(1, len(v)+1)) AS u(i))""",
        "norms AS (SELECT vec_id, SUM(comp*comp) AS norm2 "
        "FROM comps GROUP BY 1)",
        f"c0(cell_id, pos, c) AS (VALUES {init})",
    ]
    for k in range(1, _SD_ITERS + 1):
        p = k - 1
        ctes.append(f"""d{k} AS (
  SELECT v.vec_id, ct.cell_id,
         SUM((v.comp - ct.c) * (v.comp - ct.c)) AS d2
  FROM comps v JOIN c{p} ct ON ct.pos = v.pos
  GROUP BY 1, 2)""")
        ctes.append(f"""a{k} AS (
  SELECT vec_id, cell_id FROM (
    SELECT vec_id, cell_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY d2, cell_id) AS rn
    FROM d{k})
  WHERE rn = 1)""")
        ctes.append(f"""u{k} AS (
  SELECT a.cell_id, m.pos, SUM(m.comp) AS s, COUNT(*) AS n
  FROM comps m JOIN a{k} a USING (vec_id)
  GROUP BY 1, 2)""")
        ctes.append(f"""c{k} AS (
  SELECT p.cell_id, p.pos,
         CAST(COALESCE(
           (u.s - ((u.s % u.n) + u.n) % u.n) // u.n, p.c
         ) AS BIGINT) AS c
  FROM c{p} p LEFT JOIN u{k} u
    ON u.cell_id = p.cell_id AND u.pos = p.pos)""")
    fin = _SD_ITERS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
df AS (
  SELECT v.vec_id, ct.cell_id,
         SUM((v.comp - ct.c) * (v.comp - ct.c)) AS d2
  FROM comps v JOIN c{fin} ct ON ct.pos = v.pos
  GROUP BY 1, 2),
af AS (
  SELECT vec_id, cell_id FROM (
    SELECT vec_id, cell_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY d2, cell_id) AS rn
    FROM df)
  WHERE rn = 1),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM (SELECT q.vec_id, q.v, s.cell_id FROM qv q
        JOIN af s USING (vec_id)) a
  JOIN (SELECT q.vec_id, q.v, s.cell_id FROM qv q
        JOIN af s USING (vec_id)) b
    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
  JOIN norms na ON na.vec_id = a.vec_id
  JOIN norms nb ON nb.vec_id = b.vec_id
  WHERE CAST(list_inner_product(a.v, b.v) AS DOUBLE)
        / sqrt(CAST(na.norm2 * nb.norm2 AS DOUBLE)) >= {_SD_MIN_COS})
SELECT q.vec_id, CAST(af.cell_id AS INT) AS cell,
       (dr.vec_id IS NULL) AS keep
FROM qv q
JOIN af ON af.vec_id = q.vec_id
LEFT JOIN dropped dr ON dr.vec_id = q.vec_id"""
    )


def _bloom_decontam_sql() -> str:
    """SQL twin of the bloom_decontam section: identical salted-hash
    bit positions over identical word n-grams, bloom membership as
    count(*)==k against the distinct positions set — the relational
    bitmap. Deterministic false positives replicate exactly."""
    n, m, k = _BLOOM_N, _BLOOM_M, _BLOOM_K
    parts = "||' '||".join(f"f[i+{j}]" for j in range(n))

    def pos_expr(i: int) -> str:
        salted = "'" + str(i) + "|' || shingle"
        return f"({stable_hash40_sql(salted)}) % {m}"

    bsel = "\n    UNION ALL\n    ".join(
        f"SELECT {pos_expr(i)} AS pos FROM bsh" for i in range(k)
    )
    psel = "\n    UNION ALL\n    ".join(
        f"SELECT doc_id, shingle, {pos_expr(i)} AS pos FROM csh"
        for i in range(k)
    )
    return f"""
WITH f AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS f
  FROM documents),
idx AS (
  SELECT doc_id, f,
         unnest(generate_series(1, greatest(len(f) - {n - 1}, 0))) AS i
  FROM f),
sh AS (SELECT DISTINCT doc_id, {parts} AS shingle FROM idx),
bsh AS (SELECT DISTINCT shingle FROM sh
        WHERE doc_id % {_BLOOM_BENCH_MOD} = 0),
csh AS (SELECT doc_id, shingle FROM sh
        WHERE doc_id % {_BLOOM_BENCH_MOD} <> 0),
bpos AS (SELECT DISTINCT pos FROM (
    {bsel})),
probes AS (
    {psel}),
hits AS (
  SELECT p.doc_id, p.shingle
  FROM probes p JOIN bpos USING (pos)
  GROUP BY 1, 2
  HAVING COUNT(*) = {k})
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_ngrams
FROM hits GROUP BY 1 HAVING COUNT(*) >= 1
"""


_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
_TOKED_SQL = (
    "(SELECT *, CAST(len(list_filter(string_split(text, ' '), "
    "t -> t <> '')) AS INT) AS ntok FROM documents)"
)


_QC_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS pos, u.t AS token
  FROM documents,
       UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
  WHERE u.t <> ''
),
counts AS (
  SELECT token,
         SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS pos_n,
         SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS neg_n
  FROM toks GROUP BY 1),
tot AS (SELECT SUM(pos_n) AS pt, SUM(neg_n) AS nt, COUNT(*) AS v
        FROM counts),
wdim AS (
  SELECT token,
         CAST(round((log2(CAST(pos_n + 1 AS DOUBLE)
                          * CAST(nt + v AS DOUBLE))
                     - log2(CAST(neg_n + 1 AS DOUBLE)
                            * CAST(pt + v AS DOUBLE)))
                    * {1 << _QC_BITS}) AS BIGINT) AS w
  FROM counts CROSS JOIN tot),
per AS (
  SELECT t.doc_id, COALESCE(w.w, 0) AS w
  FROM toks t LEFT JOIN wdim w USING (token))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(w) AS BIGINT) AS logodds_q,
       CAST(SUM(w) AS DOUBLE) / {float(1 << _QC_BITS)}
         / CAST(COUNT(*) AS DOUBLE) AS avg_logodds
FROM per GROUP BY 1
"""


_BIGRAM_SQL = f"""
WITH f AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS f
  FROM documents),
idx AS (
  SELECT doc_id, f,
         unnest(generate_series(1, greatest(len(f) - 1, 0))) AS i
  FROM f),
occ AS (SELECT doc_id, f[i] AS w1, f[i+1] AS w2 FROM idx),
big AS (SELECT w1, w2, COUNT(*) AS cb FROM occ GROUP BY 1, 2),
ctx AS (SELECT w1, SUM(cb) AS cc FROM big GROUP BY 1),
wb AS (
  SELECT cb, CAST(round(log2(CAST(cb AS DOUBLE))
                        * {_SURPRISAL_SCALE}) AS BIGINT) AS wb
  FROM (SELECT DISTINCT cb FROM big)),
wcd AS (
  SELECT cc, CAST(round(log2(CAST(cc AS DOUBLE))
                        * {_SURPRISAL_SCALE}) AS BIGINT) AS wc
  FROM (SELECT DISTINCT cc FROM ctx)),
per AS (
  SELECT o.doc_id, wcd.wc - wb.wb AS w
  FROM occ o
  JOIN big USING (w1, w2)
  JOIN ctx USING (w1)
  JOIN wb USING (cb)
  JOIN wcd USING (cc))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(w) AS BIGINT) AS surprisal_q,
       CAST(SUM(w) AS DOUBLE) / {float(_SURPRISAL_SCALE)}
         / CAST(COUNT(*) AS DOUBLE) AS bits_per_bigram
FROM per GROUP BY 1
"""


_HARD_NEG_SQL = f"""
WITH qv AS (
  SELECT vec_id, label,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings),
comps AS (
  SELECT vec_id, unnest(generate_series(1, len(v))) AS pos,
         unnest(v) AS comp
  FROM qv),
norms AS (SELECT vec_id, SUM(comp * comp) AS norm2 FROM comps GROUP BY 1),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         SUM(q.comp * c.comp) AS dot
  FROM comps q
  JOIN comps c ON q.pos = c.pos AND q.vec_id < {_HN_QUERIES}
              AND q.vec_id <> c.vec_id
  JOIN qv ql ON ql.vec_id = q.vec_id
  JOIN qv cl ON cl.vec_id = c.vec_id
  WHERE ql.label <> cl.label
  GROUP BY 1, 2),
scored AS (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE)
           / sqrt(CAST(qn.norm2 * cn.norm2 AS DOUBLE)) AS cos
  FROM dots
  JOIN norms qn ON qn.vec_id = query_id
  JOIN norms cn ON cn.vec_id = neighbor_id)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       cos AS cos_sim
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {_HN_K}
"""


def _hard_neg_lsh_sql() -> str:
    """DuckDB twin of the text_scoring ``hard_negatives_lsh``
    section: the same md5-derived hyperplane coefficients are inlined
    as VALUES, bucket assembly replicates the sign-bit packing, and
    scoring joins only bucket-equal DIFFERENT-label pairs — the exact
    reduction the Spark kernel performs per bucket."""
    from umls2rdf_spark.operators.similarity import hyperplane_bucket_expr

    dim = 64
    coeff = hyperplane_bucket_expr(dim, _HNL_PLANES)
    plane_values = ", ".join(
        f"({i}, {j + 1}, {coeff(i, j)})"
        for i in range(_HNL_PLANES)
        for j in range(dim)
    )
    assemble = " + ".join(
        f"CASE WHEN d{i} > 0 THEN {1 << i} ELSE 0 END"
        for i in range(_HNL_PLANES)
    )
    plane_dots = ",\n         ".join(
        f"SUM(CASE WHEN p.plane_id = {i} THEN c.comp * p.coeff "
        f"ELSE 0 END) AS d{i}"
        for i in range(_HNL_PLANES)
    )
    return f"""
WITH qv AS (
  SELECT vec_id, label,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings),
comps AS (
  SELECT vec_id, unnest(generate_series(1, len(v))) AS pos,
         unnest(v) AS comp
  FROM qv),
norms AS (SELECT vec_id, SUM(comp * comp) AS norm2 FROM comps GROUP BY 1),
planes(plane_id, pos, coeff) AS (VALUES {plane_values}),
pdots AS (
  SELECT c.vec_id,
         {plane_dots}
  FROM comps c JOIN planes p ON p.pos = c.pos
  GROUP BY 1),
buckets AS (SELECT vec_id, {assemble} AS bucket FROM pdots),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         SUM(q.comp * c.comp) AS dot
  FROM comps q
  JOIN buckets bq ON bq.vec_id = q.vec_id
  JOIN buckets bc ON bc.bucket = bq.bucket AND bc.vec_id <> q.vec_id
  JOIN comps c ON c.vec_id = bc.vec_id AND c.pos = q.pos
  JOIN qv ql ON ql.vec_id = q.vec_id
  JOIN qv cl ON cl.vec_id = c.vec_id
  WHERE CAST(ql.label AS VARCHAR) <> CAST(cl.label AS VARCHAR)
  GROUP BY 1, 2),
scored AS (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE)
           / sqrt(CAST(qn.norm2 * cn.norm2 AS DOUBLE)) AS cos
  FROM dots
  JOIN norms qn ON qn.vec_id = query_id
  JOIN norms cn ON cn.vec_id = neighbor_id)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       cos AS cos_sim
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {_HN_K}
"""


_QUAR_SQL = f"""
WITH staged AS (
  SELECT source, doc_id,
         CASE WHEN doc_id % {_QUAR_MOD} = 0
              THEN substr(p, 1, length(p) - 2) ELSE p END AS p
  FROM (SELECT source, doc_id,
               CAST(to_json(struct_pack(doc_id := doc_id,
                    lang := lang, n_chars := n_chars)) AS VARCHAR) AS p
        FROM documents)),
parsed AS (
  SELECT source,
         CASE WHEN json_valid(p)
              THEN CAST(p->>'$.doc_id' AS BIGINT) END AS pid,
         CASE WHEN json_valid(p)
              THEN CAST(p->>'$.n_chars' AS BIGINT) END AS pchars
  FROM staged)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(pid) AS BIGINT) AS n_corrupt,
       CAST(COUNT(pid) AS BIGINT) AS n_good,
       CAST(COALESCE(SUM(pchars), 0) AS BIGINT) AS sum_chars
FROM parsed
GROUP BY source
"""

_SIZED_SQL = f"""
WITH agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
  FROM documents GROUP BY source),
caps AS (
  SELECT source, n_rows, total_bytes,
         GREATEST({_SIZED_TARGET} // GREATEST(total_bytes // n_rows, 1),
                  1) AS per_file_cap
  FROM agg)
SELECT source, n_rows, total_bytes,
       CAST(per_file_cap AS BIGINT) AS per_file_cap,
       CAST((n_rows + per_file_cap - 1) // per_file_cap AS BIGINT)
         AS n_files
FROM caps
"""


# ── C73 record linkage / C74 pareto front (round 9) ────────────────
_RV_SHARDS = [f"s{i}" for i in range(5)]  # C75 placement targets
_LINK_MOD = 7  # every 7th part gets a typo'd twin record
_LINK_ID_OFF = 1_000_000
_LINK_MAX_EDIT = 2
_PARETO_SHARDS = 16
_PARETO_RISK_MOD = 10_000


def _linkage_records_frame(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Part names + deterministically typo'd twins (drop the 3rd
    char) for every ``_LINK_MOD``-th part — the linkage demo must
    contain TRUE matches to recover. (Twins whose typo crosses a
    length-div-4 block boundary AND changes the first token are
    deliberately unrecoverable — the classic blocking-recall
    tradeoff, visible in the section's pair count.)"""
    part = load_table(spark, sf_dir, "part")
    dirty = part.where(F.col("p_partkey") % _LINK_MOD == 0).select(
        (F.col("p_partkey") + _LINK_ID_OFF).alias("p_partkey"),
        F.concat(
            F.substring("p_name", 1, 2),
            F.expr("substring(p_name, 4)"),
        ).alias("p_name"),
    )
    return part.select("p_partkey", "p_name").unionByName(dirty)


_LINKAGE_SRC_SQL = f"""
SELECT p_partkey, p_name FROM part
UNION ALL
SELECT p_partkey + {_LINK_ID_OFF}, substr(p_name, 1, 2) || substr(p_name, 4)
FROM part WHERE p_partkey % {_LINK_MOD} = 0"""


# ── C71 rank fusion / C72 inverted index (round 9) ─────────────────
_RRF_QUERIES = 10
_RRF_K = 10
_RRF_KRRF = 60
_RRF_TOPK = 10
_RRF_DIM = 64
_BQ_MUST = ["query", "window"]
_BQ_SHOULD = ["scan", "merge"]
_BQ_NOT = ["customer"]


def _cos_list(emb: DataFrame) -> DataFrame:
    from umls2rdf_spark.operators.similarity import cosine_topk

    return cosine_topk(
        emb,
        emb.where(F.col("vec_id") < _RRF_QUERIES),
        "vec_id",
        "embedding",
        k=_RRF_K,
        dim=_RRF_DIM,
    )


def _l2_list(emb: DataFrame) -> DataFrame:
    from umls2rdf_spark.operators.fusion import l2_topk

    return l2_topk(
        emb,
        emb.where(F.col("vec_id") < _RRF_QUERIES),
        "vec_id",
        "embedding",
        k=_RRF_K,
        dim=_RRF_DIM,
    )


def _vec_lists_sql() -> tuple[str, str]:
    """(cosine list SQL, L2 list SQL): the same qv/comps/norms
    derivation the ann_cosine_topk oracle uses (round(x*1000)
    quantization — similarity.quantize's twin), ranked by float cos
    DESC vs exact-int dist2 ASC respectively."""
    base = f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings),
comps AS (
  SELECT vec_id, unnest(generate_series(1, len(v))) AS pos,
         unnest(v) AS comp
  FROM qv),
norms AS (SELECT vec_id, SUM(comp * comp) AS norm2 FROM comps GROUP BY 1),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         SUM(q.comp * c.comp) AS dot
  FROM comps q
  JOIN comps c ON q.pos = c.pos AND q.vec_id < {_RRF_QUERIES}
              AND q.vec_id <> c.vec_id
  GROUP BY 1, 2)"""
    cos = f"""{base}
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       cos AS cos_sim
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM (SELECT query_id, neighbor_id,
                   CAST(dot AS DOUBLE)
                     / sqrt(CAST(qn.norm2 * cn.norm2 AS DOUBLE)) AS cos
            FROM dots
            JOIN norms qn ON qn.vec_id = query_id
            JOIN norms cn ON cn.vec_id = neighbor_id) AS __scored)
WHERE rank <= {_RRF_K}"""
    l2 = f"""{base}
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       CAST(dist2 AS BIGINT) AS dist2
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY dist2 ASC, neighbor_id) AS rank
      FROM (SELECT query_id, neighbor_id,
                   qn.norm2 + cn.norm2 - 2 * dot AS dist2
            FROM dots
            JOIN norms qn ON qn.vec_id = query_id
            JOIN norms cn ON cn.vec_id = neighbor_id) AS __scored)
WHERE rank <= {_RRF_K}"""
    return cos, l2


def _text_scoring_sql() -> str:
    from umls2rdf_spark.operators.cdc import cdc_dedup_stats_sql
    from umls2rdf_spark.operators.dedup import dedup_keep_k_sql
    from umls2rdf_spark.operators.drift import chi_square_drift_sql
    from umls2rdf_spark.operators.fusion import rrf_fuse_sql
    from umls2rdf_spark.operators.invindex import (
        boolean_query_sql,
        postings_sql,
    )
    from umls2rdf_spark.operators.linkage import link_records_sql
    from umls2rdf_spark.operators.pareto import pareto_front_sql
    from umls2rdf_spark.operators.sharding import (
        rendezvous_assign_sql,
    )
    from umls2rdf_spark.operators.imagededup import (
        hamming_near_dup_pairs_sql,
    )
    from umls2rdf_spark.operators.robust import winsorize_sql
    from umls2rdf_spark.operators.reporting import diversity_report_sql
    from umls2rdf_spark.operators.sketch import qdigest_quantiles_sql
    from umls2rdf_spark.operators.textstats import (
        ccnet_buckets_sql,
        char_profile_sql,
        gopher_quality_sql,
        kn_surprisal_sql,
        pmi_collocations_sql,
    )
    from umls2rdf_spark.operators.selection import (
        epoch_shuffle_sql,
        resample_mixture_sql,
        resample_sqrt_mixture_sql,
        score_percentile_sql,
        select_to_token_budget_sql,
        stratified_sample_sql,
        weighted_sample_sql,
    )
    from umls2rdf_spark.plans.llm_demos import (
        DEDUP_MINHASH_SQL,
        DEDUP_SIMHASH_SQL,
    )

    pieces = [
        fingerprint_sql(
            "minhash_pairs", DEDUP_MINHASH_SQL, ["id_a", "id_b"]
        ),
        fingerprint_sql(
            "simhash", DEDUP_SIMHASH_SQL, ["doc_id", "simhash"]
        ),
        fingerprint_sql(
            "simhash_hamming",
            hamming_near_dup_pairs_sql(
                DEDUP_SIMHASH_SQL, "doc_id", "simhash",
                max_hamming=3, bands=4, hash_bits=32,
            ),
            ["id_a", "id_b", "hamming"],
        ),
        fingerprint_sql(
            "tfidf",
            _TFIDF_SQL,
            ["doc_id", "token", "tf", "doc_freq", "tfidf", "rank"],
            ("tfidf",),
        ),
        fingerprint_sql(
            "bm25", _BM25_SQL, ["doc_id", "score_q", "n_terms_hit"]
        ),
        fingerprint_sql(
            "surprisal",
            _SURPRISAL_SQL,
            ["doc_id", "n_tokens", "surprisal_q", "bits_per_token"],
            ("bits_per_token",),
        ),
        fingerprint_sql(
            "centroid_confusion",
            _centroid_sql(),
            ["label", "predicted", "n", "is_correct"],
        ),
        fingerprint_sql(
            "incremental_dedupe",
            _INCREMENTAL_SQL,
            ["doc_id", "text", "lang", "source", "n_chars"],
        ),
        fingerprint_sql(
            "frequent_tokens", _FREQ_SQL, ["token", "n", "rank"]
        ),
        fingerprint_sql(
            "incremental_minhash",
            _IMH_SQL,
            ["doc_id", "text", "lang", "source", "n_chars"],
        ),
        fingerprint_sql(
            "semantic_dedup",
            _semantic_dedup_sql(),
            ["vec_id", "cell", "keep"],
        ),
        fingerprint_sql(
            "token_budget",
            select_to_token_budget_sql(
                _TOKED_SQL, "doc_id", "ntok", "n_chars",
                budget=_TB_BUDGET, shards=_TB_SHARDS,
                cols=", ".join(_DOC_COLS + ["ntok"]),
            ),
            _DOC_COLS + ["ntok"],
        ),
        fingerprint_sql(
            "mixture",
            resample_mixture_sql(
                "documents", "source", "doc_id", _MIX_PARTS,
                precision=_MIX_PRECISION,
                cols=", ".join(f"t.{c}" for c in _DOC_COLS),
            ),
            _DOC_COLS,
        ),
        fingerprint_sql(
            "bloom_decontam",
            _bloom_decontam_sql(),
            ["doc_id", "n_hit_ngrams"],
        ),
        fingerprint_sql(
            "epoch_shuffle",
            epoch_shuffle_sql(
                "documents", "doc_id", seed=_EPOCH_SEED,
                cols="doc_id, source",
            ),
            ["doc_id", "source", "epoch_pos"],
        ),
        fingerprint_sql(
            "quality_classifier",
            _QC_SQL,
            ["doc_id", "n_tokens", "logodds_q", "avg_logodds"],
            ("avg_logodds",),
        ),
        fingerprint_sql(
            "bigram_surprisal",
            _BIGRAM_SQL,
            ["doc_id", "n_bigrams", "surprisal_q", "bits_per_bigram"],
            ("bits_per_bigram",),
        ),
        fingerprint_sql(
            "kn_surprisal",
            kn_surprisal_sql("documents", "doc_id", "text"),
            ["doc_id", "n_bigrams", "kn_q", "kn_bits_per_bigram"],
            ("kn_bits_per_bigram",),
        ),
        fingerprint_sql(
            "char_profile",
            char_profile_sql(_SCRIPT_PAGES_SQL, "doc_id", "text"),
            [
                "doc_id", "n_chars", "non_ascii_ppm", "letter_ppm",
                "digit_ppm", "upper_ppm", "white_ppm",
                "cyrillic_ppm", "cjk_ppm", "dom_script",
                "mostly_ascii",
            ],
        ),
        fingerprint_sql(
            "containment",
            _CONTAINMENT_SQL,
            [
                "id_a", "id_b", "inter", "sz_a", "sz_b",
                "jaccard", "containment_a", "containment_b",
            ],
            ("jaccard", "containment_a", "containment_b"),
        ),
        fingerprint_sql(
            "diversity_report",
            diversity_report_sql(
                "SELECT * FROM documents", "doc_id", "text", "source"
            ),
            [
                "source", "n_docs", "tok_occ", "tok_distinct",
                "tok_ttr_ppm", "big_occ", "big_distinct",
                "big_ttr_ppm",
            ],
        ),
        fingerprint_sql(
            "weighted_sample",
            weighted_sample_sql(
                _TOKED_SQL, "doc_id", "ntok", k=_WS_K, seed=_WS_SEED,
                cols=", ".join(_DOC_COLS + ["ntok"]),
            ),
            _DOC_COLS + ["ntok"],
        ),
        fingerprint_sql(
            "score_calibration",
            score_percentile_sql(
                "documents", "doc_id", "n_chars", "source",
                cols=", ".join(f"t.{c}" for c in _DOC_COLS),
            ),
            _DOC_COLS + ["pct_ppm"],
        ),
        fingerprint_sql(
            "gopher_quality",
            gopher_quality_sql("documents", "doc_id", "text"),
            [
                "doc_id", "n_words", "mean_len_q", "alpha_frac_q",
                "stop_hits", "passes",
            ],
        ),
        fingerprint_sql(
            "hard_negatives",
            _HARD_NEG_SQL,
            ["query_id", "neighbor_id", "rank", "cos_sim"],
            ("cos_sim",),
        ),
        fingerprint_sql(
            "hard_negatives_lsh",
            _hard_neg_lsh_sql(),
            ["query_id", "neighbor_id", "rank", "cos_sim"],
            ("cos_sim",),
        ),
        fingerprint_sql(
            "ingest_quarantine",
            _QUAR_SQL,
            ["source", "n_rows", "n_corrupt", "n_good", "sum_chars"],
        ),
        fingerprint_sql(
            "sized_write_plan",
            _SIZED_SQL,
            ["source", "n_rows", "total_bytes", "per_file_cap",
             "n_files"],
        ),
        fingerprint_sql(
            "profile",
            _profile_sql(),
            [
                "column", "n_rows", "n_nulls", "n_distinct",
                "min_value", "max_value",
            ],
        ),
        fingerprint_sql(
            "domain_cap",
            curation_demos.DOMAIN_CAP_SQL,
            ["doc_id", "source", "r"],
        ),
        fingerprint_sql(
            "dsir_weights",
            curation_demos.DSIR_SQL,
            ["doc_id", "n_tokens", "dsir_q", "avg_dsir"],
            ("avg_dsir",),
        ),
        fingerprint_sql(
            "snapshot_diff",
            _snapshot_diff_sql(),
            ["doc_id", "status", "base_fp", "new_fp"],
        ),
        fingerprint_sql(
            "html_extract",
            _html_extract_sql(),
            [
                "doc_id", "clean", "n_links", "n_tags",
                "html_chars", "text_chars", "visible_ratio_q",
            ],
        ),
        fingerprint_sql(
            "url_dedup",
            _url_dedup_sql(),
            ["doc_id", "url_norm"],
        ),
        fingerprint_sql(
            "bpe_merges",
            _bpe_merges_sql(),
            ["round", "pair_a", "pair_b", "merged", "cnt"],
        ),
        fingerprint_sql(
            "bpe_tokens",
            _bpe_tokens_sql(),
            ["word", "freq", "n_subwords"],
        ),
        fingerprint_sql(
            "embedding_decontam",
            _embedding_decontam_sql(),
            ["vec_id", "max_cos", "keep"],
            ("max_cos",),
        ),
        fingerprint_sql(
            "pii_scrub",
            _pii_scrub_sql(),
            ["doc_id", "clean", "n_email", "n_ipv4", "n_ssn",
             "n_phone"],
        ),
        fingerprint_sql(
            "doc_repetition",
            _doc_repetition_sql(),
            ["doc_id", "n_tokens", "n_distinct_tokens",
             "dup_token_frac_q", "n_bigrams", "top_bigram_n",
             "top_bigram_frac_q", "passes"],
        ),
        fingerprint_sql(
            "cms_sketch",
            _cms_sketch_sql(),
            ["row_i", "col", "cnt"],
        ),
        fingerprint_sql(
            "cms_estimates",
            _cms_estimates_sql(),
            ["token", "est"],
        ),
        fingerprint_sql(
            "hll_registers",
            _hll_registers_sql(),
            ["bucket", "reg"],
        ),
        fingerprint_sql(
            "hll_estimate",
            _hll_estimate_sql(),
            ["m", "n_zero", "est_floor"],
        ),
        fingerprint_sql(
            "temp_mixture",
            resample_sqrt_mixture_sql(
                "documents", "source", "doc_id",
                precision=_MIX_PRECISION,
                cols=", ".join(f"t.{c}" for c in _DOC_COLS),
            ),
            _DOC_COLS,
        ),
        fingerprint_sql(
            "hashed_embedding",
            _hashed_embedding_sql(),
            ["doc_id", "j", "v"],
        ),
        fingerprint_sql(
            "pipeline_funnel",
            _funnel_sql(),
            ["stage", "n_rows"],
        ),
        fingerprint_sql(
            "quality_report",
            _quality_report_sql(),
            ["source", "n_docs", "pii_docs", "sum_pii",
             "rep_pass_docs", "bigram_docs", "avg_top_bigram_ppm"],
        ),
        fingerprint_sql(
            "bpe_doc_tokens",
            _bpe_doc_tokens_sql(),
            ["doc_id", "n_words", "n_bpe_tokens"],
        ),
        fingerprint_sql(
            "unigram_model",
            _unigram_model_sql(),
            ["piece", "cnt", "cost_q"],
        ),
        fingerprint_sql(
            "unigram_tokens",
            _unigram_tokens_sql(),
            ["word", "freq", "n_pieces"],
        ),
        fingerprint_sql(
            "unigram_doc_tokens",
            _unigram_doc_tokens_sql(),
            ["doc_id", "n_words", "n_unigram_tokens"],
        ),
        fingerprint_sql(
            "wordpiece_model",
            _wordpiece_model_sql(),
            ["round", "pair_a", "pair_b", "merged", "cnt", "score_q"],
        ),
        fingerprint_sql(
            "wordpiece_tokens",
            _wordpiece_tokens_sql(),
            ["word", "freq", "n_subwords"],
        ),
        fingerprint_sql(
            "wordpiece_doc_tokens",
            _wordpiece_doc_tokens_sql(),
            ["doc_id", "n_words", "n_wp_tokens"],
        ),
        fingerprint_sql(
            "wordpiece_segment",
            _wordpiece_segment_sql(),
            ["word", "freq", "n_subwords"],
        ),
        fingerprint_sql(
            "lexical_decontam",
            _lexical_decontam_sql(),
            ["doc_id", "max_jaccard", "max_bench_containment", "keep"],
            ("max_jaccard", "max_bench_containment"),
        ),
        fingerprint_sql(
            "pmi_collocations",
            pmi_collocations_sql(
                min_count=_PMI_MIN_COUNT, k=_PMI_K
            ),
            [
                "w1", "w2", "pair_n", "left_n", "right_n",
                "lift_q", "rank",
            ],
        ),
        fingerprint_sql(
            "ccnet_buckets",
            ccnet_buckets_sql(),
            ["doc_id", "source", "bpb_q", "pct_ppm", "bucket"],
        ),
        fingerprint_sql(
            "normalize",
            _normalize_sql(),
            [
                "doc_id", "text_norm", "n_moji", "n_ctrl",
                "n_zerowidth", "n_nbsp", "n_multispace",
                "n_multinewline",
            ],
        ),
        fingerprint_sql(
            "paragraph_dedup",
            _paragraph_dedup_sql(),
            ["doc_id", "text_clean", "n_paras", "n_kept"],
        ),
        fingerprint_sql(
            "qdigest_nodes",
            _qdigest_nodes_sql(),
            ["level", "idx", "cnt"],
        ),
        fingerprint_sql(
            "qdigest_quantiles",
            qdigest_quantiles_sql(
                _qdigest_nodes_sql(), list(_QD_QS), levels=_QD_LEVELS
            ),
            ["q_ppm", "rank_target", "est"],
        ),
        fingerprint_sql(
            "psl_domains",
            _psl_domains_sql(),
            ["doc_id", "host", "reg_domain"],
        ),
        fingerprint_sql(
            "cdc_dedup",
            cdc_dedup_stats_sql(),
            ["doc_id", "n_chunks", "n_dup", "dup_chars"],
        ),
        fingerprint_sql(
            "keep_k_dedup",
            dedup_keep_k_sql(_KEEPK_SQL, "doc_id", "ktext", k=_KEEPK_K),
            ["doc_id", "dup_rank", "group_n"],
        ),
        fingerprint_sql(
            "winsorize",
            winsorize_sql(
                "SELECT * FROM documents", "source", "n_chars",
                "doc_id",
            ),
            ["doc_id", "source", "v", "v_clip"],
        ),
        fingerprint_sql(
            "stratified_sample",
            stratified_sample_sql(
                "SELECT * FROM documents", "source", "doc_id",
                _STRAT_N,
            ),
            ["source", "doc_id", "rank"],
        ),
        fingerprint_sql(
            "drift",
            chi_square_drift_sql(
                _DRIFT_BASE_SQL, _DRIFT_NEW_SQL, "source",
                "n_chars", _DRIFT_BUCKET,
            ),
            [
                "source", "n_base", "n_new", "n_buckets",
                "chi2_q", "n_novel", "novel_mass",
            ],
        ),
        fingerprint_sql(
            "l2_neighbors",
            _vec_lists_sql()[1],
            ["query_id", "neighbor_id", "rank", "dist2"],
        ),
        fingerprint_sql(
            "rrf_fusion",
            rrf_fuse_sql(
                dict(zip(("cos", "l2"), _vec_lists_sql())),
                k_rrf=_RRF_KRRF,
                topk=_RRF_TOPK,
            ),
            ["query_id", "neighbor_id", "n_lists", "rrf_q", "fused_rank"],
        ),
        fingerprint_sql(
            "postings_stats",
            f"""SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq
FROM ({postings_sql('SELECT * FROM documents', 'doc_id', 'text')}) AS __p
GROUP BY 1""",
            ["token", "doc_freq"],
        ),
        fingerprint_sql(
            "boolean_query",
            boolean_query_sql(
                postings_sql("SELECT * FROM documents", "doc_id", "text"),
                _BQ_MUST,
                _BQ_SHOULD,
                _BQ_NOT,
            ),
            ["doc_id", "n_should"],
        ),
        fingerprint_sql(
            "record_linkage",
            link_records_sql(
                _LINKAGE_SRC_SQL,
                "p_partkey",
                "p_name",
                max_edit=_LINK_MAX_EDIT,
            ),
            ["id_a", "id_b", "edit", "jaccard_ppm"],
        ),
        fingerprint_sql(
            "pareto_front",
            pareto_front_sql(
                "SELECT * FROM documents",
                "doc_id",
                "n_chars",
                f"({stable_hash40_sql('CAST(doc_id AS VARCHAR)')}) "
                f"% {_PARETO_RISK_MOD}",
                shards=_PARETO_SHARDS,
            ),
            ["doc_id", "hi", "lo"],
        ),
        fingerprint_sql(
            "rendezvous",
            "SELECT doc_id, "
            + rendezvous_assign_sql("doc_id", _RV_SHARDS)
            + " FROM documents",
            ["doc_id", "shard"],
        ),
    ]
    return "\nUNION ALL\n".join(pieces)


def _bpe_tokens_sql() -> str:
    from umls2rdf_spark.operators.bpe import bpe_vocab_after_sql

    return bpe_vocab_after_sql(
        "SELECT * FROM documents", "text", rounds=_BPE_ROUNDS
    )


def _unigram_model_sql() -> str:
    from umls2rdf_spark.operators.unigram import unigram_lm_train_sql

    return unigram_lm_train_sql(
        "SELECT * FROM documents",
        "text",
        vocab_size=_UNI_VOCAB,
        rounds=_UNI_ROUNDS,
        seed_size=_UNI_SEED,
    )


def _wordpiece_model_sql() -> str:
    from umls2rdf_spark.operators.wordpiece import (
        train_wordpiece_merges_sql,
    )

    return train_wordpiece_merges_sql(
        "SELECT * FROM documents", "text", rounds=_WP_ROUNDS
    )


def _wordpiece_tokens_sql() -> str:
    from umls2rdf_spark.operators.wordpiece import (
        wordpiece_vocab_after_sql,
    )

    return wordpiece_vocab_after_sql(
        "SELECT * FROM documents", "text", rounds=_WP_ROUNDS
    )


def _wordpiece_doc_tokens_sql() -> str:
    from umls2rdf_spark.operators.wordpiece import (
        wordpiece_doc_tokens_sql,
    )

    return wordpiece_doc_tokens_sql(
        "SELECT * FROM documents", "doc_id", "text", rounds=_WP_ROUNDS
    )


def _wordpiece_segment_sql() -> str:
    from umls2rdf_spark.operators.wordpiece import (
        wordpiece_segment_sql,
    )

    return wordpiece_segment_sql(
        "SELECT * FROM documents", "text", rounds=_WP_ROUNDS
    )


def _unigram_tokens_sql() -> str:
    from umls2rdf_spark.operators.unigram import unigram_vocab_after_sql

    return unigram_vocab_after_sql(
        "SELECT * FROM documents",
        "text",
        vocab_size=_UNI_VOCAB,
        rounds=_UNI_ROUNDS,
        seed_size=_UNI_SEED,
    )


def _embedding_decontam_sql() -> str:
    from umls2rdf_spark.operators.similarity import (
        decontaminate_embeddings_sql,
    )

    return decontaminate_embeddings_sql(
        "vec_id % 23 <> 0", "vec_id % 23 = 0", _DECON_MIN_COS
    )


def _bpe_doc_tokens_sql() -> str:
    from umls2rdf_spark.operators.bpe import bpe_doc_tokens_sql

    return bpe_doc_tokens_sql(
        "SELECT * FROM documents", "doc_id", "text",
        rounds=_BPE_ROUNDS,
    )


def _bpe_merges_sql() -> str:
    from umls2rdf_spark.operators.bpe import train_bpe_merges_sql

    return train_bpe_merges_sql(
        "SELECT * FROM documents", "text", rounds=_BPE_ROUNDS
    )


# C44 (round 6): deterministic PII seeding applied identically in
# both engines — emails / IPv4s / SSN-shaped ids / phones built from
# doc_id arithmetic so every scrub rule fires on a known subset and
# values differ per row; rows hitting none of the mods stay clean.
def _script_pages_frame(docs: DataFrame) -> DataFrame:
    """Deterministically multilingual-seeded corpus for the C53
    char_profile section: mod-3 rows gain Cyrillic, mod-5 rows CJK,
    mod-11 rows tab/newline control chars — every SCRIPT_CLASSES
    entry and the dom_script branches fire in both engines."""
    did = F.col("doc_id")
    seeded = F.concat(
        F.col("text"),
        F.when(did % 3 == 0, F.lit(" мир данных и ещё текст"))
        .otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit(" 数据处理是关键"))
        .otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit("\tTAB\nLINE")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", seeded.alias("text"))


_SCRIPT_PAGES_SQL = (
    "SELECT doc_id, text "
    "|| CASE WHEN doc_id % 3 = 0 THEN ' мир данных и ещё текст' "
    "ELSE '' END "
    "|| CASE WHEN doc_id % 5 = 0 THEN ' 数据处理是关键' ELSE '' END "
    "|| CASE WHEN doc_id % 11 = 0 THEN chr(9) || 'TAB' || chr(10) "
    "|| 'LINE' ELSE '' END AS text "
    "FROM documents"
)


def _containment_frames(docs: DataFrame):
    """Fixture for the C54 containment section: mod-6 docs gain a
    PREFIX twin (first 8 words, id + 10M) — a genuine
    subset-duplicate whose containment ≈ 1 while Jaccard is small —
    and mod-9 docs pair with their id-neighbor (low overlap, and the
    corpus-max id exercises the missing-side NULL path). Both
    engines derive frame and pairs from the same arithmetic."""
    words = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    prefix = docs.where(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.array_join(F.slice(words, 1, 8), " ").alias("text"),
    )
    frame = docs.select("doc_id", "text").unionByName(prefix)
    pairs = (
        docs.where(F.col("doc_id") % 6 == 0)
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 10_000_000).alias("id_b"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 9 == 0).select(
                F.col("doc_id").alias("id_a"),
                (F.col("doc_id") + 1).alias("id_b"),
            )
        )
    )
    return frame, pairs


_CONTAINMENT_SQL = """
WITH prefix AS (
  SELECT doc_id + 10000000 AS doc_id,
         array_to_string(list_filter(string_split(text, ' '),
                                     t -> t <> '')[1:8], ' ') AS text
  FROM documents WHERE doc_id % 6 = 0),
frame AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, text FROM prefix),
pairs AS (
  SELECT doc_id AS id_a, doc_id + 10000000 AS id_b
  FROM documents WHERE doc_id % 6 = 0
  UNION ALL
  SELECT doc_id AS id_a, doc_id + 1 AS id_b
  FROM documents WHERE doc_id % 9 = 0),
filtered AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS f
  FROM frame),
indexed AS (
  SELECT doc_id, f,
         unnest(generate_series(1, greatest(len(f) - 2, 0))) AS i
  FROM filtered),
shingles AS (
  SELECT DISTINCT doc_id,
         f[i] || ' ' || f[i+1] || ' ' || f[i+2] AS shingle
  FROM indexed),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY 1),
inter AS (
  SELECT p.id_a, p.id_b, COUNT(*) AS inter
  FROM pairs p
  JOIN shingles sa ON sa.doc_id = p.id_a
  JOIN shingles sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2),
scored AS (
  SELECT p.id_a, p.id_b,
         CAST(COALESCE(i.inter, 0) AS BIGINT) AS inter,
         CAST(COALESCE(za.sz, 0) AS BIGINT) AS sz_a,
         CAST(COALESCE(zb.sz, 0) AS BIGINT) AS sz_b
  FROM pairs p
  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
  LEFT JOIN sizes za ON za.doc_id = p.id_a
  LEFT JOIN sizes zb ON zb.doc_id = p.id_b)
SELECT id_a, id_b, inter, sz_a, sz_b,
       CASE WHEN sz_a + sz_b - inter > 0
            THEN CAST(inter AS DOUBLE)
                   / CAST(sz_a + sz_b - inter AS DOUBLE) END AS jaccard,
       CASE WHEN sz_a > 0
            THEN CAST(inter AS DOUBLE) / CAST(sz_a AS DOUBLE) END
         AS containment_a,
       CASE WHEN sz_b > 0
            THEN CAST(inter AS DOUBLE) / CAST(sz_b AS DOUBLE) END
         AS containment_b
FROM scored
"""


def _pii_pages_frame(docs: DataFrame) -> DataFrame:
    did = F.col("doc_id")

    def when_mod(m: int, *parts) -> F.Column:
        return F.when(did % m == 0, F.concat(*parts)).otherwise(
            F.lit("")
        )

    seeded = F.concat(
        F.col("text"),
        when_mod(
            2,
            F.lit(" mail user"), did.cast("string"),
            F.lit("@ex"), (did % 7).cast("string"), F.lit(".org"),
        ),
        when_mod(
            3,
            F.lit(" from 10."), (did % 256).cast("string"),
            F.lit(".3."), ((did * 7) % 256).cast("string"),
        ),
        when_mod(
            5,
            F.lit(" ssn 123-45-"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
        ),
        when_mod(
            7,
            F.lit(" call (555) 210-"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
        ),
    )
    # source rides along for the per-source report (C50); the PII
    # section's own select ignores it
    return docs.select("doc_id", "source", seeded.alias("text"))


_PII_PAGES_SQL = (
    "SELECT doc_id, source, text "
    "|| CASE WHEN doc_id % 2 = 0 THEN ' mail user' "
    "|| CAST(doc_id AS VARCHAR) || '@ex' "
    "|| CAST(doc_id % 7 AS VARCHAR) || '.org' ELSE '' END "
    "|| CASE WHEN doc_id % 3 = 0 THEN ' from 10.' "
    "|| CAST(doc_id % 256 AS VARCHAR) || '.3.' "
    "|| CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END "
    "|| CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END "
    "|| CASE WHEN doc_id % 7 = 0 THEN ' call (555) 210-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END "
    "AS text FROM documents"
)


def _pii_scrub_sql() -> str:
    from umls2rdf_spark.operators.pii import pii_scrub_sql

    return pii_scrub_sql(_PII_PAGES_SQL, "doc_id", "text")


def _cms_sketch_sql() -> str:
    from umls2rdf_spark.operators.sketch import cms_sketch_sql

    return cms_sketch_sql(_OCC_SQL, "token", depth=_CMS_D, width=_CMS_W)


def _cms_estimates_sql() -> str:
    from umls2rdf_spark.operators.sketch import cms_estimates_sql

    return cms_estimates_sql(
        _OCC_SQL, "token", list(_CMS_QUERIES),
        depth=_CMS_D, width=_CMS_W,
    )


def _hll_registers_sql() -> str:
    from umls2rdf_spark.operators.sketch import hll_registers_sql

    return hll_registers_sql(_OCC_SQL, "token", b=_HLL_B)


def _hll_estimate_sql() -> str:
    from umls2rdf_spark.operators.sketch import (
        hll_estimate_sql,
        hll_registers_sql,
    )

    return hll_estimate_sql(
        hll_registers_sql(_OCC_SQL, "token", b=_HLL_B), b=_HLL_B
    )


def _hashed_embedding_sql() -> str:
    from umls2rdf_spark.operators.embed import hashed_embedding_sql

    return hashed_embedding_sql(
        _OCC_ID_SQL, "doc_id", "token", dim=_EMB_DIM
    )


def _doc_repetition_sql() -> str:
    from umls2rdf_spark.operators.repetition import doc_repetition_sql

    return doc_repetition_sql(
        "SELECT doc_id, text FROM documents", "doc_id", "text"
    )


def _quality_report_sql() -> str:
    from umls2rdf_spark.operators.reporting import quality_report_sql

    return quality_report_sql(
        _PII_PAGES_SQL, "doc_id", "text", "source"
    )


# C41 (round 6): deterministic URL variants — three per canonical
# page (uppercased scheme/host + default port + tracking param;
# trailing slash; fragment) so every normalization rule fires and
# each 3-variant group collapses to its smallest doc_id.
def _url_pages_frame(docs: DataFrame) -> DataFrame:
    url = F.concat(
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit("HTTPS://Example.COM:443/p/"),
        )
        .when(F.col("doc_id") % 3 == 1, F.lit("https://example.com/p/"))
        .otherwise(F.lit("https://example.com/p")),
        F.lit("?id="),
        F.expr("doc_id div 3").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("&utm_source=x"))
        .when(F.col("doc_id") % 3 == 1, F.lit("#frag"))
        .otherwise(F.lit("")),
    )
    return docs.select("doc_id", url.alias("url"))


_URL_PAGES_SQL = (
    "SELECT doc_id, "
    "CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://Example.COM:443/p/' "
    "     WHEN doc_id % 3 = 1 THEN 'https://example.com/p/' "
    "     ELSE 'https://example.com/p' END "
    "|| '?id=' || CAST(doc_id // 3 AS VARCHAR) "
    "|| CASE WHEN doc_id % 3 = 0 THEN '&utm_source=x' "
    "        WHEN doc_id % 3 = 1 THEN '#frag' ELSE '' END AS url "
    "FROM documents"
)


def _url_dedup_sql() -> str:
    from umls2rdf_spark.operators.webcurate import dedup_by_url_sql

    return dedup_by_url_sql(_URL_PAGES_SQL, "doc_id", "url")


# C40 (round 6): the HTML wrap applied identically in both engines —
# a deterministic page template around each document's text, with
# head/script/style noise, entities (incl. a double-escaped one and
# an unknown one), nav/footer boilerplate and two links, so every
# extraction rule is exercised on every row.
_HTML_PRE = (
    '<html><head><title>Doc</title><script>var k = 1 < 2;</script>'
    '<style>p { color: red; }</style></head><body>'
    '<nav><a href="/">Home</a> <a href="/t">T&amp;M</a></nav>'
    "<!-- generated --><h1>Heading</h1><p>"
)
_HTML_POST = (
    "</p><p>Q&amp;A &lt;ok&gt; &amp;lt;literal&nbsp;end</p>"
    '<footer>&copy; 2026 <a href="/x">x</a></footer></body></html>'
)


def _html_pages_frame(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_POST)
        ).alias("html"),
    )


def _html_extract_sql() -> str:
    from umls2rdf_spark.operators.htmlextract import html_stats_sql

    pre = _HTML_PRE.replace("'", "''")
    post = _HTML_POST.replace("'", "''")
    return html_stats_sql(
        f"SELECT doc_id, '{pre}' || text || '{post}' AS html "
        "FROM documents",
        "doc_id",
        "html",
        text_col="clean",
    )


def _snapshot_diff_sql() -> str:
    from umls2rdf_spark.operators.corpus import snapshot_diff_sql

    return snapshot_diff_sql(
        "doc_id",
        "text",
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0",
        """SELECT doc_id,
                  CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
                       ELSE text END AS text
           FROM documents WHERE doc_id % 5 <> 0""",
    )


def _profile_sql() -> str:
    pieces = [
        f'''
        SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM documents
        '''
        for c in ["doc_id", "text", "lang", "source", "n_chars"]
    ]
    return " UNION ALL ".join(pieces)


# ── event_windows: B6 + B22 + B23b + C14 twins, one driver key ──────
def _stream_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/events.py streaming_dedup
    (dropDuplicatesWithinWatermark), fed a deterministic redelivery:
    every event_id % 7 == 0 row appears twice, byte-identical — the
    at-least-once shape the streaming dedup exists for. event_ids are
    unique in the source (asserted per SF), and duplicate rows are
    identical, so one-row-per-event_id is engine-exact."""
    from umls2rdf_spark.streaming.events import dedup_events_batch

    ev = load_table(spark, sf_dir, "events")
    redelivered = ev.unionByName(ev.where(F.col("event_id") % 7 == 0))
    return dedup_events_batch(redelivered)


_STREAM_DEDUP_SQL = """
WITH redelivered AS (
  SELECT * FROM events
  UNION ALL
  SELECT * FROM events WHERE event_id % 7 = 0
)
SELECT DISTINCT * FROM redelivered
"""


def _interval_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (streaming/events.py click_purchase_attribution): same function,
    batch sources — clicks joined to same-user purchases within the
    1-hour attribution gap."""
    from umls2rdf_spark.streaming.events import (
        click_purchase_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    return click_purchase_attribution(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        max_gap="1 hour",
    )


_INTERVAL_JOIN_SQL = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       CAST(c.ts AS TIMESTAMP) AS click_ts, p.value
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
 AND CAST(p.ts AS TIMESTAMP)
     <= CAST(c.ts AS TIMESTAMP) + INTERVAL 1 HOUR
"""


def _stateful_counts_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final-state twin of user_event_counts_stateful
    (applyInPandasWithState): after the stream drains, the per-user
    running counts equal one batch groupBy — the equivalence the
    streaming tests assert; this section pins the twin's values."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


_STATEFUL_COUNTS_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
"""


def _interval_join_outer_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of the LEFT-OUTER stream-stream interval join:
    every purchase with its attributing clicks OR null click columns
    (conversion without a tracked click). The batch twin keeps every
    unmatched purchase; the streaming form emits a null row only
    once the click watermark proves no match can arrive — that
    subset relationship is pinned in tests/test_streaming_multimodal.
    """
    from umls2rdf_spark.streaming.events import (
        click_purchase_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    return click_purchase_attribution(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        max_gap="1 hour",
        how="leftOuter",
    )


_INTERVAL_JOIN_OUTER_SQL = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       CAST(c.ts AS TIMESTAMP) AS click_ts, p.value
FROM events p LEFT JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
 AND CAST(p.ts AS TIMESTAMP)
     <= CAST(c.ts AS TIMESTAMP) + INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
"""


def _rolling_window_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE rolling aggregation (SURVEY B40): per-user count
    and value-sum over the trailing 1-hour RANGE frame at every
    event — the sliding-lookback shape (rate limiting, trailing
    spend, rolling error counts) that tumbling/hopping buckets
    cannot express because each row needs ITS OWN window anchored at
    its own timestamp.

    Spark has no interval-typed RANGE frame, so the frame runs over
    MICROSECOND epoch — ``rangeBetween(-3_600_000_000, 0)`` on
    unix_micros is value-identical to DuckDB's ``RANGE BETWEEN
    INTERVAL 1 HOUR PRECEDING AND CURRENT ROW`` (both are the
    inclusive [t-1h, t] frame at full timestamp precision; an
    earlier unix_timestamp() form TRUNCATED to seconds and the 10x
    replica gate caught the frame-membership drift on
    boundary-straddling pairs the small SF never produced). One
    shuffle on user_id, in-partition time sort, frame bounded by the
    time horizon — at 100 TB the state per partition is the 1-hour
    slice, not the user's history.

    The value sum quantizes each row to int64 BEFORE summing (the
    bm25 convention): a double sum's addition order inside a frame
    is engine-dependent once frames grow (caught by the 10x replica
    gate — green at sf0.01, hash-mismatch at 10x), while the int64
    sum is order-independent and engine-exact at any frame size.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    vq = F.floor(F.col("value") * F.lit(1000000.0)).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(vq).over(w).alias("sum_1h_q"),
    )


_ROLLING_WINDOW_SQL = """
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) OVER w
            AS BIGINT) AS sum_1h_q
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window families over events PLUS the streaming batch-twins
    as fingerprint sections of one driver key: tumbling 1-hour
    buckets (SURVEY B6), native gap-merged 30-minute session windows
    (B22), hopping 1-hour/15-minute sliding windows where every event
    lands in exactly 4 epoch-aligned windows (B23b), the per-user
    trailing 1-hour RANGE-frame rolling count/sum (B37 — each row
    anchors its own window; microsecond-exact frame, int64-quantized
    sum), and the four
    SQL-expressible twins of the C14 streaming surface — redelivery
    dedup (streaming_dedup), the stream-stream interval join
    (click_purchase_attribution, batch sources), its LEFT-OUTER form
    (unattributed purchases kept; the streaming watermark-withholding
    subset is pinned in tests), and the
    applyInPandasWithState final-state counts. The streaming forms
    themselves run under watermarks in streaming/events.py with
    batch-equality tests; these sections put the twin semantics under
    the driver's value gate. Round 6 adds ``pagerank`` (B41):
    clickstream page-graph centrality — per-user LEAD transitions
    into fixed-iteration int64 PageRank (operators/graphrank.py),
    oracle-unrolled so every iteration is value-verified — and
    ``label_prop`` (B42): label-propagation communities over the
    same graph, deterministic synchronous adoption with the oracle
    unrolling the identical rounds — and ``cohort_retention``
    (B43): the day-grain product-analytics retention matrix."""
    from umls2rdf_spark.plans.analytics_extra import (
        events_hopping,
        events_windowed,
        session_window_agg,
    )

    pr_frame, lp_frame, tri_frame, kc_frame, sp_frame = _graph_frames(
        spark, sf_dir
    )
    return _union(
        _build_sections([
            lambda: fingerprint_section(
                events_windowed(spark, sf_dir),
                "tumbling",
                ("total_value",),
            ),
            lambda: fingerprint_section(
                session_window_agg(spark, sf_dir), "session"
            ),
            lambda: fingerprint_section(
                events_hopping(spark, sf_dir),
                "hopping",
                ("total_value",),
            ),
            lambda: fingerprint_section(
                _stream_dedup_twin(spark, sf_dir),
                "stream_dedup",
                ("value",),
            ),
            lambda: fingerprint_section(
                _interval_join_twin(spark, sf_dir),
                "interval_join",
                ("value",),
            ),
            lambda: fingerprint_section(
                _stateful_counts_twin(spark, sf_dir),
                "stateful_counts",
            ),
            lambda: fingerprint_section(
                _interval_join_outer_twin(spark, sf_dir),
                "interval_join_outer",
                ("value",),
            ),
            lambda: fingerprint_section(
                _rolling_window_twin(spark, sf_dir), "rolling"
            ),
            # B41 (round 6): clickstream PageRank — weighted page
            # transitions per user (LEAD over the total ts/event_id
            # order) into fixed-iteration PageRank with engine-exact
            # int64 mass units; the oracle unrolls the SAME
            # iterations as CTEs, so the training dynamics are
            # value-verified, not just the shape
            lambda: fingerprint_section(pr_frame, "pagerank"),
            # B42 (round 6): label-propagation communities over the
            # SAME clickstream graph (shared checkpointed edge
            # frame) — synchronous weighted LPA with deterministic
            # (Σw DESC, label ASC) adoption as a sort-free max_by
            # argmax aggregation; the oracle unrolls the same
            # rounds, value-verifying the trajectory
            lambda: fingerprint_section(lp_frame, "label_prop"),
            # B43 (round 6): day-grain cohort retention — the
            # product-analytics matrix; (user, day) distinct frame,
            # min-day cohorts, one user join + one map-side-combined
            # count (no COUNT DISTINCT needed by construction)
            lambda: fingerprint_section(
                _cohort_retention_frame(spark, sf_dir),
                "cohort_retention",
            ),
            # B44 (round 8): generic interval overlap join (range
            # join) — incident windows × event points via the
            # epoch-binned equi-join with anchor-bin dedup
            # (operators/intervals.py); the oracle is the direct
            # theta join, so the binned plan's exactness is
            # value-verified
            lambda: fingerprint_section(
                _range_join_frame(spark, sf_dir), "range_join"
            ),
            # B45 (round 8): median/MAD outlier detection — the
            # Hampel identifier with exact type-1 order statistics
            # computed from value COUNTS (operators/robust.py: one
            # map-side-combined groupBy over raw rows, everything
            # else over the distinct-value-bounded counts frame);
            # int64-quantized values, int64-exact k·MAD threshold
            lambda: fingerprint_section(
                _mad_outliers_frame(spark, sf_dir), "mad_outliers"
            ),
            # B46 (round 8): ordered funnel conversion — greedy
            # earliest-completion join chain (operators/funnel.py;
            # exactness argued there), strict-after semantics, every
            # shuffle on user_id
            lambda: fingerprint_section(
                _funnel_steps_frame(spark, sf_dir), "funnel"
            ),
            # B47 (round 8): per-node triangle counts over the SAME
            # checkpointed clickstream edge frame the centrality
            # sections use — degree-ordered wedge closing, each
            # triangle counted once at its smallest-rank corner
            # (graphrank.py triangle_counts)
            lambda: fingerprint_section(tri_frame, "triangles"),
            # B48 (round 8): k-core peeling over the same shared
            # edge frame — fixed rounds with an explicit converged
            # flag (the PageRank discipline: data-independent
            # rounds keep the oracle an unrolled-CTE twin). The
            # synthetic 100-node page graph saturates at this SF
            # (nothing peels at k=18 — degrees grow with events on a
            # fixed node space); peel/cascade semantics are pinned
            # by the hand-graph and chain tests, and parity holds
            # either way
            lambda: fingerprint_section(kc_frame, "kcore"),
            # B50 (round 9): multi-source weighted shortest paths
            # over the SAME shared edge frame — Bellman-Ford min-plus
            # relaxation in exact int64, fixed rounds + converged
            # flag (the kcore discipline); "hops-times-weight from
            # any seed" is the crawl-frontier distance signal
            lambda: fingerprint_section(sp_frame, "sssp"),
            # B49 (round 9): time-series gap fill — the thinned
            # hourly per-event-type series densified with locf and
            # exact-integer linear interpolation
            # (operators/timeseries.py; windowed aggs omit empty
            # buckets, every charting/differencing consumer needs
            # them present)
            lambda: fingerprint_section(
                _gap_fill_frame(spark, sf_dir), "gap_fill"
            ),
            # B51 (round 9): grouped OLS trend — per-event-type
            # least-squares slope of the quantized value over time,
            # from ONE map-side-combined aggregation of sufficient
            # statistics in DECIMAL(38,0)/HUGEINT with sign-split
            # nonnegative integral division (engine-exact;
            # operators/regression.py)
            lambda: fingerprint_section(
                _trend_frame(spark, sf_dir), "trend"
            ),
        ])
    )


#: fixed epoch anchor (2024-01-01 UTC) — re-origins x so the DECIMAL
#: products stay far inside 10^38 (the grouped_trend magnitude valve)
_TREND_ANCHOR = 1_704_067_200


def _trend_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from umls2rdf_spark.operators.regression import grouped_trend

    ev = load_table(spark, sf_dir, "events")
    return grouped_trend(
        ev,
        "event_type",
        F.unix_timestamp("ts").cast("bigint") - _TREND_ANCHOR,
        F.floor(F.col("value") * 1_000_000),
    )


def _trend_sql() -> str:
    from umls2rdf_spark.operators.regression import grouped_trend_sql

    return grouped_trend_sql(
        "SELECT * FROM events",
        "event_type",
        f"(epoch_us(ts) // 1000000) - {_TREND_ANCHOR}",
        "FLOOR(value * 1000000)",
    )


_GF_MOD = 37  # thin the stream so hourly buckets have real gaps
_GF_BUCKET = 3600


def _gap_fill_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from umls2rdf_spark.operators.timeseries import gap_fill

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_id") % _GF_MOD == 0
    )
    return gap_fill(
        ev,
        "event_type",
        "ts",
        F.floor(F.col("value") * 1_000_000),
        _GF_BUCKET,
    )


def _gap_fill_sql() -> str:
    from umls2rdf_spark.operators.timeseries import gap_fill_sql

    return gap_fill_sql(
        f"SELECT * FROM events WHERE event_id % {_GF_MOD} = 0",
        "event_type",
        "ts",
        "FLOOR(value * 1000000)",
        _GF_BUCKET,
    )


_MAD_K = 3  # Hampel threshold: |v - median| > k * MAD


def _mad_outliers_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B45 demo: per-event-type value outliers — values quantized to
    int64 micros (the fingerprint convention), exact median and MAD
    from counts, Hampel flag counts."""
    from umls2rdf_spark.operators.robust import mad_outlier_summary

    ev = load_table(spark, sf_dir, "events")
    return mad_outlier_summary(
        ev, "event_type", F.floor(F.col("value") * 1_000_000), k=_MAD_K
    )


def _mad_outliers_sql() -> str:
    from umls2rdf_spark.operators.robust import mad_outlier_summary_sql

    return mad_outlier_summary_sql(
        "SELECT * FROM events",
        "event_type",
        "CAST(FLOOR(value * 1000000) AS BIGINT)",
        k=_MAD_K,
    )


_RJ_MOD = 37  # every 37th error event opens an incident window
_RJ_WIN = 900_000_000  # 15-minute incident window (micros)
_RJ_BIN = 300_000_000  # 5-minute bins: <= 4 bins per interval


def _range_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B44 demo: 15-minute incident windows (opened by every 37th
    error event) overlap-joined to ALL events as points — keyless
    (cross-user) by design, the shape the equi-key stream join
    (interval_join section) cannot express."""
    from umls2rdf_spark.operators.intervals import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    incidents = (
        ev.where(
            (F.col("event_type") == "error")
            & (F.col("event_id") % _RJ_MOD == 0)
        )
        .select(
            F.col("event_id").alias("incident_id"),
            F.unix_micros("ts").alias("w_start"),
            (F.unix_micros("ts") + F.lit(_RJ_WIN)).alias("w_end"),
        )
    )
    points = ev.select(
        F.col("event_id").alias("hit_id"),
        F.unix_micros("ts").alias("p_ts"),
    )
    return interval_overlap_join(
        incidents,
        points,
        "incident_id",
        "w_start",
        "w_end",
        "hit_id",
        "p_ts",
        "p_ts",
        bin_width=_RJ_BIN,
    )


def _range_join_sql() -> str:
    from umls2rdf_spark.operators.intervals import (
        interval_overlap_join_sql,
    )

    left = f"""
SELECT event_id AS incident_id,
       epoch_us(CAST(ts AS TIMESTAMP)) AS w_start,
       epoch_us(CAST(ts AS TIMESTAMP)) + {_RJ_WIN} AS w_end
FROM events
WHERE event_type = 'error' AND event_id % {_RJ_MOD} = 0"""
    right = """
SELECT event_id AS hit_id,
       epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
FROM events"""
    return interval_overlap_join_sql(
        left, right,
        "incident_id", "w_start", "w_end",
        "hit_id", "p_ts", "p_ts",
    )


_PR_ITERS = 4


def _pagerank_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B41: page-graph centrality over the events clickstream —
    nodes are the JSON ``props.k`` page ids, edges the per-user
    consecutive transitions. Fixed iterations so the oracle can
    unroll them; the operator itself (operators/graphrank.py) is
    iteration-count-agnostic with per-round localCheckpoint."""
    from umls2rdf_spark.operators.graphrank import (
        clickstream_edges,
        pagerank,
    )

    ev = load_table(spark, sf_dir, "events")
    node = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return pagerank(clickstream_edges(ev, node), iters=_PR_ITERS)


def _pagerank_sql() -> str:
    from umls2rdf_spark.operators.graphrank import (
        clickstream_edges_sql,
        pagerank_sql,
    )

    return pagerank_sql(
        clickstream_edges_sql(
            "SELECT * FROM events",
            "CAST(json_extract_string(props, '$.k') AS BIGINT)",
        ),
        iters=_PR_ITERS,
    )


_LP_ITERS = 4


def _cohort_retention_frame(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """B43: cohort retention over the event stream — the classic
    product-analytics matrix (users who first appeared on day D,
    still active D+k days later). Day-grain activity is the
    (user, day) DISTINCT frame; each user's cohort is their min day;
    the matrix is one join back on user_id + one count — the final
    count needs no DISTINCT because (user, day) is already distinct,
    so every aggregation map-side combines. All date/int arithmetic,
    engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    cohort = act.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    return (
        act.join(cohort, "user_id")
        .select(
            # ISO string, not DATE: pandas renders DATE columns as
            # midnight datetimes on the DuckDB side, breaking the
            # driver's stringified compare
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("offset_days"),
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


_COHORT_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
coh AS (
  SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1)
SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
       CAST(datediff('day', cohort_day, day) AS INT) AS offset_days,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM act JOIN coh USING (user_id)
GROUP BY 1, 2
"""


def _label_prop_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B42: community labels over the same clickstream page graph as
    B41 — fixed rounds so the oracle unrolls them; the operator
    itself is iteration-count-agnostic with per-round checkpoints."""
    from umls2rdf_spark.operators.graphrank import (
        clickstream_edges,
        label_propagation,
    )

    ev = load_table(spark, sf_dir, "events")
    node = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return label_propagation(
        clickstream_edges(ev, node), iters=_LP_ITERS
    )


def _graph_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """All five graph sections (B41 pagerank, B42 label_prop, B47
    triangles, B48 kcore, B50 sssp) over ONE checkpointed
    clickstream edge frame — the per-user LEAD window job (the
    expensive derivation) runs once instead of once per section;
    each op's own per-round checkpoints stay internal."""
    from umls2rdf_spark.operators.graphrank import (
        clickstream_edges,
        kcore,
        label_propagation,
        pagerank,
        shortest_paths,
        triangle_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    node = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    edges = clickstream_edges(ev, node).localCheckpoint(eager=True)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % _SSSP_SEED_MOD == 0)
    )
    # the five fixpoint loops are serial driver-job chains over the
    # same checkpointed edges but independent of each other — overlap
    # them (pay the slowest chain, not the sum)
    return tuple(
        _build_sections(
            [
                lambda: pagerank(edges, iters=_PR_ITERS),
                lambda: label_propagation(edges, iters=_LP_ITERS),
                lambda: triangle_counts(edges),
                lambda: kcore(edges, _KCORE_K, _KCORE_ROUNDS),
                lambda: shortest_paths(edges, seeds, _SSSP_ROUNDS),
            ]
        )
    )


_FUNNEL_STEPS = ["signup", "click", "purchase"]


def _funnel_steps_frame(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from umls2rdf_spark.operators.funnel import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(
        ev, "user_id", "event_type", "ts", _FUNNEL_STEPS
    )


def _funnel_steps_sql() -> str:
    from umls2rdf_spark.operators.funnel import funnel_counts_sql

    return funnel_counts_sql(
        "SELECT * FROM events", "user_id", "event_type", "ts",
        _FUNNEL_STEPS,
    )


_KCORE_K = 18
_KCORE_ROUNDS = 3
_SSSP_SEED_MOD = 17  # every 17th page id seeds the distance frontier
_SSSP_ROUNDS = 4


def _sssp_sql() -> str:
    from umls2rdf_spark.operators.graphrank import (
        clickstream_edges_sql,
        shortest_paths_sql,
    )

    esql = clickstream_edges_sql(
        "SELECT * FROM events",
        "CAST(json_extract_string(props, '$.k') AS BIGINT)",
    )
    seeds = (
        "SELECT DISTINCT node FROM ("
        f"SELECT src AS node FROM ({esql}) "
        f"UNION ALL SELECT dst FROM ({esql})"
        f") AS __allnodes WHERE node % {_SSSP_SEED_MOD} = 0"
    )
    return shortest_paths_sql(esql, seeds, _SSSP_ROUNDS)


def _kcore_sql() -> str:
    from umls2rdf_spark.operators.graphrank import (
        clickstream_edges_sql,
        kcore_sql,
    )

    return kcore_sql(
        clickstream_edges_sql(
            "SELECT * FROM events",
            "CAST(json_extract_string(props, '$.k') AS BIGINT)",
        ),
        _KCORE_K,
        _KCORE_ROUNDS,
    )


def _triangles_sql() -> str:
    from umls2rdf_spark.operators.graphrank import (
        clickstream_edges_sql,
        triangle_counts_sql,
    )

    return triangle_counts_sql(
        clickstream_edges_sql(
            "SELECT * FROM events",
            "CAST(json_extract_string(props, '$.k') AS BIGINT)",
        )
    )


def _label_prop_sql() -> str:
    from umls2rdf_spark.operators.graphrank import (
        clickstream_edges_sql,
        label_propagation_sql,
    )

    return label_propagation_sql(
        clickstream_edges_sql(
            "SELECT * FROM events",
            "CAST(json_extract_string(props, '$.k') AS BIGINT)",
        ),
        iters=_LP_ITERS,
    )


def _event_windows_sql() -> str:
    from umls2rdf_spark.plans.analytics_extra import (
        EVENTS_HOPPING_SQL,
        EVENTS_WINDOWED_SQL,
        SESSION_WINDOW_SQL,
    )

    pieces = [
        fingerprint_sql(
            "tumbling",
            EVENTS_WINDOWED_SQL,
            ["bucket", "event_type", "n", "total_value"],
            ("total_value",),
        ),
        fingerprint_sql(
            "session",
            SESSION_WINDOW_SQL,
            ["user_id", "session_start", "n_events"],
        ),
        fingerprint_sql(
            "hopping",
            EVENTS_HOPPING_SQL,
            ["bucket", "event_type", "n", "total_value"],
            ("total_value",),
        ),
        fingerprint_sql(
            "stream_dedup",
            _STREAM_DEDUP_SQL,
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
            ("value",),
        ),
        fingerprint_sql(
            "interval_join",
            _INTERVAL_JOIN_SQL,
            [
                "purchase_id",
                "click_id",
                "user_id",
                "purchase_ts",
                "click_ts",
                "value",
            ],
            ("value",),
        ),
        fingerprint_sql(
            "stateful_counts",
            _STATEFUL_COUNTS_SQL,
            ["user_id", "n_events"],
        ),
        fingerprint_sql(
            "interval_join_outer",
            _INTERVAL_JOIN_OUTER_SQL,
            [
                "purchase_id",
                "click_id",
                "user_id",
                "purchase_ts",
                "click_ts",
                "value",
            ],
            ("value",),
        ),
        fingerprint_sql(
            "rolling",
            _ROLLING_WINDOW_SQL,
            ["event_id", "user_id", "ts", "n_1h", "sum_1h_q"],
        ),
        fingerprint_sql(
            "range_join",
            _range_join_sql(),
            ["incident_id", "hit_id", "ov_start", "ov_end"],
        ),
        fingerprint_sql(
            "mad_outliers",
            _mad_outliers_sql(),
            ["event_type", "n", "med_q", "mad_q", "n_outliers"],
        ),
        fingerprint_sql(
            "funnel",
            _funnel_steps_sql(),
            ["step", "event_type", "n_users"],
        ),
        fingerprint_sql(
            "triangles",
            _triangles_sql(),
            ["node", "n_tri"],
        ),
        fingerprint_sql(
            "kcore",
            _kcore_sql(),
            ["node", "degree", "converged"],
        ),
        fingerprint_sql(
            "pagerank",
            _pagerank_sql(),
            ["node", "rank_q"],
        ),
        fingerprint_sql(
            "label_prop",
            _label_prop_sql(),
            ["node", "label"],
        ),
        fingerprint_sql(
            "cohort_retention",
            _COHORT_SQL,
            ["cohort_day", "offset_days", "n_users"],
        ),
        fingerprint_sql(
            "sssp",
            _sssp_sql(),
            ["node", "dist", "converged"],
        ),
        fingerprint_sql(
            "gap_fill",
            _gap_fill_sql(),
            [
                "event_type",
                "bucket",
                "n_events",
                "v_q",
                "locf_q",
                "interp_q",
            ],
        ),
        fingerprint_sql(
            "trend",
            _trend_sql(),
            ["event_type", "n", "slope_q", "degenerate"],
        ),
    ]
    return "\nUNION ALL\n".join(pieces)


# ── pq_topk: C6c product quantization under a full-value oracle ────
_PQ_M = 4
_PQ_K = 8
_PQ_DIM = 64
_PQ_QUERIES = 10
_PQ_TOPK = 3


def _seed_books() -> list[list[list[int]]]:
    from umls2rdf_spark.operators.pq import pq_seed

    sub = _PQ_DIM // _PQ_M
    return [
        [[pq_seed(mm, i, j) for j in range(sub)] for i in range(_PQ_K)]
        for mm in range(_PQ_M)
    ]


def pq_topk_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC top-k over embeddings with the deterministic seed
    codebooks (pq_seed constants — the same generated table the SQL
    oracle inlines): encode every vector to its m=4 nearest codewords
    (exact int64 subspace L2, ties lowest), score every (query,
    corpus) pair from per-query broadcast LUTs, keep top-3 per query.
    Codebook TRAINING (distributed integer Lloyd's) is deterministic
    and replica-tested in tests/test_pq.py; the seed books keep the
    driver oracle static."""
    from umls2rdf_spark.operators.pq import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _PQ_QUERIES)
    return pq_topk(
        emb, queries, "vec_id", "embedding", _seed_books(),
        k=_PQ_TOPK, dim=_PQ_DIM,
    )


def _pq_topk_sql() -> str:
    books = _seed_books()
    sub = _PQ_DIM // _PQ_M
    values = ", ".join(
        f"({mm}, {c}, {j}, {books[mm][c][j]})"
        for mm in range(_PQ_M)
        for c in range(_PQ_K)
        for j in range(sub)
    )
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings),
books(mm, c, j, w) AS (VALUES {values}),
d2 AS (
  SELECT q.vec_id, b.mm, b.c,
         SUM((q.v[b.mm * {sub} + b.j + 1] - b.w)
             * (q.v[b.mm * {sub} + b.j + 1] - b.w)) AS d2
  FROM qv q CROSS JOIN books b
  GROUP BY 1, 2, 3),
enc AS (
  SELECT vec_id, mm, c AS code FROM (
    SELECT vec_id, mm, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id, mm
                              ORDER BY d2, c) AS rn
    FROM d2)
  WHERE rn = 1),
luts AS (
  SELECT q.vec_id AS query_id, b.mm, b.c,
         SUM(q.v[b.mm * {sub} + b.j + 1] * b.w) AS dot
  FROM qv q CROSS JOIN books b
  WHERE q.vec_id < {_PQ_QUERIES}
  GROUP BY 1, 2, 3),
scored AS (
  SELECT l.query_id, e.vec_id AS neighbor_id, SUM(l.dot) AS adc
  FROM enc e
  JOIN luts l ON l.mm = e.mm AND l.c = e.code
  WHERE l.query_id <> e.vec_id
  GROUP BY 1, 2)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       CAST(adc AS BIGINT) AS adc_score
FROM (
  SELECT query_id, neighbor_id, adc,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= {_PQ_TOPK}
"""


QUERIES = {
    "tpch_completion": tpch_completion,
    "text_scoring": text_scoring,
    "event_windows": event_windows,
    "pq_topk": pq_topk_demo,
}


def oracles() -> dict[str, str]:
    return {
        "tpch_completion": _tpch_completion_sql(),
        "text_scoring": _text_scoring_sql(),
        "event_windows": _event_windows_sql(),
        "pq_topk": _pq_topk_sql(),
    }
