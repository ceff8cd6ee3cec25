"""SURVEY §2 C-block: LLM-data-pipeline operators demonstrated on the
documents/embeddings testdata, each with a DuckDB oracle.

The minhash/simhash/LSH oracle SQL is generated from the same
constants the Spark operators use (functions/hashing.py.perm_params,
similarity.hyperplane_bucket_expr), so engine and oracle can never
drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import (
    PERM_MODULUS,
    perm_params,
    stable_hash40_sql,
)
from umls2rdf_spark.operators.dedup import (
    SIMHASH_BITS,
    jaccard_verify_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    minhash_signatures_mapside,
    simhash,
)
from umls2rdf_spark.operators.similarity import (
    auto_planes,
    cosine_topk,
    hyperplane_bucket_expr,
    lsh_cosine_topk,
)
from umls2rdf_spark.operators.textstats import (
    STOPWORDS,
    TOKEN_REGEX,
    doc_fingerprint,
    text_features,
)
from umls2rdf_spark.sources.parquet import load_table

_NUM_PERM = 8
_ANN_K = 5
_ANN_QUERIES = 10
_LSH_K = 3
_DIM = 64
_LSH_TARGET_BUCKET = 8
_LSH_MAX_BUCKET = 32
# The driver's correctness gate runs at sf0.01 where the embeddings
# table has 500 rows; the generated oracle must use the same plane
# count the adaptive operator derives there (= 6).
_SF001_N_EMB = 500
_LSH_PLANES = auto_planes(_SF001_N_EMB, _LSH_TARGET_BUCKET)


# ── C1 dedup_exact (+ C10 doc_fingerprint) ──────────────────────────
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keyed on the normalized document fingerprint
    (lower + space-collapse + trim, md5'd), with the count of raw md5
    variants each normalized group collapses — fingerprinting
    (doc_fingerprint) composed with the hash-groupBy dedup.

    Map-side md5; the shuffle carries (hash, id, raw_hash) only."""
    docs = load_table(spark, sf_dir, "documents")
    fps = doc_fingerprint(docs, "doc_id", "text")
    return fps.groupBy("norm_fp").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct("raw_fp").alias("n_raw_variants"),
    )


DEDUP_EXACT_SQL = """
SELECT md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS norm_fp,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies,
       COUNT(DISTINCT md5(text)) AS n_raw_variants
FROM documents
GROUP BY 1
"""


# ── C2 dedup_minhash ────────────────────────────────────────────────
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # map-side signature variant: no shuffle before the band join at
    # scale (row-identical to minhash_signatures; pinned by test).
    # The gated spread only fires on a single-split local read, where
    # the md5×num_perm signature projection would otherwise run on
    # one core (spread_small_input no-ops on real layouts).
    from umls2rdf_spark.operators.spread import spread_small_input

    sigs = minhash_signatures_mapside(
        spread_small_input(
            load_table(spark, sf_dir, "documents"), "doc_id"
        ),
        "doc_id",
        "text",
        num_perm=_NUM_PERM,
    )
    return lsh_candidate_pairs(sigs, "doc_id", rows_per_band=1)


_PERM_VALUES = ", ".join(f"({i}, {a}, {b})" for i, a, b in perm_params(_NUM_PERM))
DEDUP_MINHASH_SQL = f"""
WITH filtered AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS f
  FROM documents),
indexed AS (
  SELECT doc_id, f,
         unnest(generate_series(1, greatest(len(f) - 2, 0))) AS i
  FROM filtered),
shingles AS (
  SELECT DISTINCT doc_id,
         f[i] || ' ' || f[i+1] || ' ' || f[i+2] AS shingle
  FROM indexed),
hashed AS (
  SELECT doc_id, {stable_hash40_sql('shingle')} AS h FROM shingles),
perms(perm_id, a, b) AS (VALUES {_PERM_VALUES}),
sigs AS (
  SELECT doc_id, perm_id, MIN((a * h + b) % {PERM_MODULUS}) AS minhash
  FROM hashed CROSS JOIN perms
  GROUP BY 1, 2),
bands AS (
  SELECT doc_id, perm_id AS band, CAST(minhash AS VARCHAR) AS band_sig
  FROM sigs)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
            AND a.doc_id < b.doc_id
"""


# ── C3 dedup_simhash ────────────────────────────────────────────────
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_BIT_SUMS = ",\n         ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
    for j in range(SIMHASH_BITS)
)
_BIT_ASSEMBLE = " + ".join(
    f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
)
DEDUP_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents),
hashed AS (
  SELECT doc_id, {stable_hash40_sql('tok')} AS h FROM toks),
sums AS (
  SELECT doc_id,
         {_BIT_SUMS}
  FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({_BIT_ASSEMBLE} AS BIGINT) AS simhash FROM sums
"""


# ── C4 ngram_jaccard (LSH candidates → exact verify; scale path) ────
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard computed ONLY for LSH candidate
    pairs — the verify stage of the minhash pipeline. The pair space
    is bounded by the banding, never all-pairs-within-block, so the
    same plan survives a 100 TB corpus (the old ``block_col`` variant,
    quadratic within low-cardinality blocks, remains available as
    ``ngram_jaccard_pairs`` for small dims).

    The shingle frame is computed once and persisted — signatures,
    sizes and both verify sides consume it, which measured 36% faster
    at sf0.1 than recomputing the explode per consumer (at 100 TB
    you'd materialize shingles or signatures to a table anyway)."""
    from umls2rdf_spark.operators.dedup import shingle_rows
    from umls2rdf_spark.operators.spread import spread_small_input

    docs = load_table(spark, sf_dir, "documents")
    shingles = (
        shingle_rows(
            spread_small_input(docs, "doc_id"), "doc_id", "text", 3
        )
        .distinct()
        .persist()
    )
    sigs = minhash_signatures(
        docs, "doc_id", "text", num_perm=_NUM_PERM, shingles=shingles
    )
    pairs = lsh_candidate_pairs(sigs, "doc_id", rows_per_band=1)
    return jaccard_verify_pairs(
        docs,
        pairs,
        "doc_id",
        "text",
        shingle_n=3,
        min_jaccard=0.0,
        shingles=shingles,
    )


# Oracle: the dedup_minhash CTE chain (same generated constants) for
# the candidate pairs, then exact Jaccard over the SAME distinct
# shingle sets the signatures were built from.
NGRAM_JACCARD_SQL = f"""
WITH filtered AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS f
  FROM documents),
indexed AS (
  SELECT doc_id, f,
         unnest(generate_series(1, greatest(len(f) - 2, 0))) AS i
  FROM filtered),
shingles AS (
  SELECT DISTINCT doc_id,
         f[i] || ' ' || f[i+1] || ' ' || f[i+2] AS shingle
  FROM indexed),
hashed AS (
  SELECT doc_id, {stable_hash40_sql('shingle')} AS h FROM shingles),
perms(perm_id, a, b) AS (VALUES {_PERM_VALUES}),
sigs AS (
  SELECT doc_id, perm_id, MIN((a * h + b) % {PERM_MODULUS}) AS minhash
  FROM hashed CROSS JOIN perms
  GROUP BY 1, 2),
bands AS (
  SELECT doc_id, perm_id AS band, CAST(minhash AS VARCHAR) AS band_sig
  FROM sigs),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY 1),
inter AS (
  SELECT p.id_a, p.id_b, COUNT(*) AS inter
  FROM pairs p
  JOIN shingles sa ON sa.doc_id = p.id_a
  JOIN shingles sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2),
scored AS (
  SELECT p.id_a, p.id_b, COALESCE(i.inter, 0) AS inter
  FROM pairs p
  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b)
SELECT s.id_a, s.id_b,
       CAST(s.inter AS DOUBLE)
         / CAST(za.sz + zb.sz - s.inter AS DOUBLE) AS jaccard
FROM scored s
JOIN sizes za ON za.doc_id = s.id_a
JOIN sizes zb ON zb.doc_id = s.id_b
"""


# ── C5 ann_cosine_topk ──────────────────────────────────────────────
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _ANN_QUERIES)
    return cosine_topk(emb, queries, "vec_id", "embedding", k=_ANN_K)


ANN_COSINE_SQL = f"""
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
  JOIN comps c ON q.pos = c.pos AND q.vec_id < {_ANN_QUERIES}
              AND q.vec_id <> c.vec_id
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
WHERE rank <= {_ANN_K}
"""


# ── C6 ann_lsh_topk (adaptive planes + oversized-bucket salting) ────
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane LSH ANN with the two scale controls on: the plane
    count adapts to the corpus (auto_planes → ~target_bucket vectors
    per bucket at any n) and buckets above ``max_bucket`` are split by
    a deterministic id-hash salt, so no single skewed bucket ever
    re-quadratizes. The demo pins planes=_LSH_PLANES — the value
    auto_planes derives for the correctness SF's 500-vector corpus —
    so the operator and the generated oracle below can never disagree
    on the bucket space, whatever table the harness runs against
    (production callers pass planes=None for the adaptive path).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_cosine_topk(
        emb,
        "vec_id",
        "embedding",
        k=_LSH_K,
        planes=_LSH_PLANES,
        target_bucket=_LSH_TARGET_BUCKET,
        max_bucket=_LSH_MAX_BUCKET,
    )


_coeff = hyperplane_bucket_expr(_DIM, _LSH_PLANES)
_PLANE_VALUES = ", ".join(
    f"({i}, {j + 1}, {_coeff(i, j)})"
    for i in range(_LSH_PLANES)
    for j in range(_DIM)
)
_BUCKET_ASSEMBLE = " + ".join(
    f"CASE WHEN d{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(_LSH_PLANES)
)
_PLANE_DOTS = ",\n         ".join(
    f"SUM(CASE WHEN p.plane_id = {i} THEN c.comp * p.coeff ELSE 0 END) AS d{i}"
    for i in range(_LSH_PLANES)
)
# CTE prefix shared by the two LSH-bucketed oracles (top-k ANN and
# near-dup pairs): quantize, component-explode, norms, plane dots,
# bucket assembly, bucket counts, deterministic salting.
_LSH_CTE_PREFIX = f"""
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
planes(plane_id, pos, coeff) AS (VALUES {_PLANE_VALUES}),
pdots AS (
  SELECT c.vec_id,
         {_PLANE_DOTS}
  FROM comps c JOIN planes p ON p.pos = c.pos
  GROUP BY 1),
buckets AS (SELECT vec_id, {_BUCKET_ASSEMBLE} AS bucket FROM pdots),
bcnt AS (SELECT bucket, COUNT(*) AS cnt FROM buckets GROUP BY 1),
salted AS (
  SELECT b.vec_id, b.bucket,
         CASE WHEN c.cnt > {_LSH_MAX_BUCKET}
              THEN {stable_hash40_sql('CAST(b.vec_id AS VARCHAR)')}
                   % ((c.cnt + {_LSH_MAX_BUCKET} - 1) // {_LSH_MAX_BUCKET})
              ELSE 0 END AS salt
  FROM buckets b JOIN bcnt c USING (bucket))"""

ANN_LSH_SQL = f"""{_LSH_CTE_PREFIX},
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         SUM(a.comp * b.comp) AS dot
  FROM (SELECT c.*, s.bucket, s.salt
        FROM comps c JOIN salted s USING (vec_id)) a
  JOIN (SELECT c.*, s.bucket, s.salt
        FROM comps c JOIN salted s USING (vec_id)) b
    ON a.bucket = b.bucket AND a.salt = b.salt
   AND a.pos = b.pos AND a.vec_id <> b.vec_id
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
WHERE rank <= {_LSH_K}
"""


# ── C2b dedup_embedding (cosine near-dup pairs over LSH buckets) ────
_NEAR_DUP_MIN_COS = 0.3  # synthetic embeddings top out near 0.42;
# production near-dup thresholds (~0.95) are the same knob.


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (id_a < id_b, exact
    quantized cosine >= threshold) from the same adaptive+salted
    hyperplane buckets as ann_lsh_topk — the dedup-shaped output (a
    pair list ready for connected components) as opposed to per-query
    top-k."""
    from umls2rdf_spark.operators.similarity import cosine_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    # planes pinned to the oracle-generation constant; see ann_lsh_topk
    return cosine_near_dup_pairs(
        emb,
        "vec_id",
        "embedding",
        min_cos=_NEAR_DUP_MIN_COS,
        planes=_LSH_PLANES,
        target_bucket=_LSH_TARGET_BUCKET,
        max_bucket=_LSH_MAX_BUCKET,
    )


DEDUP_EMBEDDING_SQL = f"""{_LSH_CTE_PREFIX},
dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         SUM(a.comp * b.comp) AS dot
  FROM (SELECT c.*, s.bucket, s.salt
        FROM comps c JOIN salted s USING (vec_id)) a
  JOIN (SELECT c.*, s.bucket, s.salt
        FROM comps c JOIN salted s USING (vec_id)) b
    ON a.bucket = b.bucket AND a.salt = b.salt
   AND a.pos = b.pos AND a.vec_id < b.vec_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       CAST(dot AS DOUBLE)
         / sqrt(CAST(na.norm2 * nb.norm2 AS DOUBLE)) AS cos_sim
FROM dots
JOIN norms na ON na.vec_id = id_a
JOIN norms nb ON nb.vec_id = id_b
WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.norm2 * nb.norm2 AS DOUBLE))
      >= {_NEAR_DUP_MIN_COS}
"""


# ── C7+C8+C9+C16 text_features (lang id, tokens, quality, rep) ─────
def text_features_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused one-pass feature extraction: language id + token counts +
    quality features + bigram repetition ratio share a single
    tokenization and corpus scan (the individual lang_id /
    quality_score / token_count / repetition_ratio operators remain
    the library surface)."""
    return text_features(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


def _stop_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


_ALL_STOP = "[" + ", ".join(
    f"'{w}'" for ws in STOPWORDS.values() for w in ws
) + "]"
TEXT_FEATURES_SQL = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS f
  FROM documents),
m AS (
  SELECT doc_id,
    len(list_filter(f, x -> list_contains({_stop_list('en')}, x))) AS hits_en,
    len(list_filter(f, x -> list_contains({_stop_list('es')}, x))) AS hits_es,
    len(list_filter(f, x -> list_contains({_stop_list('de')}, x))) AS hits_de,
    CAST(len(f) AS BIGINT) AS n_tokens,
    CAST(len(regexp_extract_all(lower(text), '{TOKEN_REGEX}'))
         AS BIGINT) AS re_tokens,
    CAST(len(list_filter(f, x -> list_contains({_ALL_STOP}, x)))
         AS BIGINT) AS n_stopwords,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
         AS BIGINT) AS n_punct,
    CASE WHEN len(f) >= 2
         THEN list_transform(generate_series(1, len(f) - 1),
                             i -> f[i] || ' ' || f[i+1])
         ELSE [] END AS grams
  FROM t)
SELECT doc_id,
       CASE WHEN hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
            WHEN hits_es >= hits_de THEN 'es'
            ELSE 'de' END AS pred_lang,
       n_tokens, re_tokens, n_stopwords, n_punct,
       CASE WHEN n_chars > 0
            THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
            ELSE 0.0 END AS punct_ratio,
       (CASE WHEN n_tokens > 0
             THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             ELSE 0.0 END) * 0.5
       + CAST(least(n_tokens, 50) AS DOUBLE) / 50.0 * 0.5 AS quality,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CASE WHEN len(grams) > 0
            THEN (CAST(len(grams) AS DOUBLE)
                  - CAST(len(list_distinct(grams)) AS DOUBLE))
                 / CAST(len(grams) AS DOUBLE)
            ELSE 0.0 END AS rep_ratio
FROM m
"""


# dedup_minhash / dedup_simhash are no longer separate queries()
# keys: their full pipelines (and the same generated oracle SQL) run
# as driver-hashed sections of the composed text_scoring demo
# (plans/completion.py), freeing two slots under the 50-key cap for
# tpch_completion / pq_topk. The functions and SQL stay here — the
# sections call them directly.
QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_embedding": dedup_embedding,
    "ngram_jaccard": ngram_jaccard,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "text_features": text_features_demo,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
    "ngram_jaccard": NGRAM_JACCARD_SQL,
    "ann_cosine_topk": ANN_COSINE_SQL,
    "ann_lsh_topk": ANN_LSH_SQL,
    "text_features": TEXT_FEATURES_SQL,
}


# ── C6b ann_ivf_topk (trained inverted file) ───────────────────────
from umls2rdf_spark.operators.similarity import (
    ivf_centroid,
    ivf_cosine_topk,
    train_ivf_centroids,
)

_IVF_CELLS = 8
_IVF_ITERS = 3
_SF001_EMB_PARQUET = "/root/testdata/sf0.01/embeddings.parquet"


def _trained_centroids_sf001() -> list[list[int]]:
    """Local replica of train_ivf_centroids over the correctness-SF
    embeddings, for oracle generation (no SparkSession at import
    time). Every step is exact integer arithmetic with deterministic
    tie-breaks — grid init, sign*floor(|x*1000|+.5) quantization,
    int64 squared-L2 argmin (first minimum = lowest cell), per-cell
    int-sum // count update — so the distributed trainer and this
    replica cannot diverge, independent of row order or partitioning.
    """
    import duckdb
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM '{_SF001_EMB_PARQUET}'"
    ).fetchall()
    con.close()
    V = np.array([r[0] for r in rows], dtype=np.float64)
    Y = V * 1000
    q = (np.sign(Y) * np.floor(np.abs(Y) + 0.5)).astype(np.int64)
    cent = np.array(
        [[ivf_centroid(i, j) for j in range(_DIM)] for i in range(_IVF_CELLS)],
        dtype=np.int64,
    )
    for _ in range(_IVF_ITERS):
        d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cell = d2.argmin(axis=1)
        new = cent.copy()
        for c in range(_IVF_CELLS):
            sel = q[cell == c]
            if len(sel):
                new[c] = sel.sum(axis=0) // len(sel)
        cent = new
    return [[int(x) for x in row] for row in cent]


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the TRAINED inverted file: a deterministic
    distributed Lloyd's pass (train_ivf_centroids — grid init, exact
    int arithmetic) fits the cell centroids to the corpus, then exact
    cosine top-k within each cell. The oracle's centroid VALUES come
    from a local exact-arithmetic replica of the same training loop,
    so the driver hash check covers the k-means path end-to-end."""
    emb = load_table(spark, sf_dir, "embeddings")
    trained = train_ivf_centroids(
        emb, "vec_id", "embedding",
        cells=_IVF_CELLS, iters=_IVF_ITERS, dim=_DIM,
    )
    return ivf_cosine_topk(
        emb, "vec_id", "embedding",
        k=_LSH_K, cells=_IVF_CELLS, centroids=trained,
    )


_CENT_VALUES = ", ".join(
    f"({i}, {j + 1}, {c})"
    for i, row in enumerate(_trained_centroids_sf001())
    for j, c in enumerate(row)
)
ANN_IVF_SQL = f"""
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
cents(cell_id, pos, c) AS (VALUES {_CENT_VALUES}),
dists AS (
  SELECT v.vec_id, ct.cell_id,
         SUM((v.comp - ct.c) * (v.comp - ct.c)) AS d2
  FROM comps v JOIN cents ct ON ct.pos = v.pos
  GROUP BY 1, 2),
assigned AS (
  SELECT vec_id, cell_id FROM (
    SELECT vec_id, cell_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY d2, cell_id) AS rn
    FROM dists)
  WHERE rn = 1),
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         SUM(a.comp * b.comp) AS dot
  FROM (SELECT c.*, s.cell_id FROM comps c JOIN assigned s USING (vec_id)) a
  JOIN (SELECT c.*, s.cell_id FROM comps c JOIN assigned s USING (vec_id)) b
    ON a.cell_id = b.cell_id AND a.pos = b.pos AND a.vec_id <> b.vec_id
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
WHERE rank <= {_LSH_K}
"""

QUERIES["ann_ivf_topk"] = ann_ivf_topk
ORACLES["ann_ivf_topk"] = ANN_IVF_SQL


# ── C15 dedup_clusters (pairs → connected components) ──────────────
from umls2rdf_spark.operators.dedup import connected_components


_CLUSTER_JACCARD = 0.5


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters, the full production pipeline: minhash
    LSH candidates -> exact-Jaccard VERIFY (>= 0.5) -> connected
    components; every document gets a cluster id (min doc_id of its
    component).

    The verify stage is load-bearing, not decoration: with k
    genuinely independent bands, a single colliding min-shingle in
    ANY band makes a candidate pair, and closing unverified
    candidates transitively chained 84% of this corpus into one
    mega-cluster. Verification bounds every edge at real similarity
    before the closure."""
    from umls2rdf_spark.operators.spread import spread_small_input

    docs = load_table(spark, sf_dir, "documents")
    # gated spread (no-op on real layouts): the signature projection
    # is the pipeline's most expensive per-row pass and a single-file
    # local scan would run it on one core
    sigs = minhash_signatures_mapside(
        spread_small_input(docs, "doc_id"),
        "doc_id", "text", num_perm=_NUM_PERM,
    )
    cands = lsh_candidate_pairs(sigs, "doc_id", rows_per_band=1)
    pairs = jaccard_verify_pairs(
        docs, cands, "doc_id", "text",
        shingle_n=3, min_jaccard=_CLUSTER_JACCARD,
    ).select("id_a", "id_b")
    labels = connected_components(
        pairs, docs.select(F.col("doc_id")), node_col="doc_id"
    )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE filtered AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS f
  FROM documents),
indexed AS (
  SELECT doc_id, f,
         unnest(generate_series(1, greatest(len(f) - 2, 0))) AS i
  FROM filtered),
shingles AS (
  SELECT DISTINCT doc_id,
         f[i] || ' ' || f[i+1] || ' ' || f[i+2] AS shingle
  FROM indexed),
hashed AS (
  SELECT doc_id, {stable_hash40_sql('shingle')} AS h FROM shingles),
perms(perm_id, a, b) AS (VALUES {_PERM_VALUES}),
sigs AS (
  SELECT doc_id, perm_id, MIN((a * h + b) % {PERM_MODULUS}) AS minhash
  FROM hashed CROSS JOIN perms
  GROUP BY 1, 2),
bands AS (
  SELECT doc_id, perm_id AS band, CAST(minhash AS VARCHAR) AS band_sig
  FROM sigs),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.id_a
  JOIN shingles sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  LEFT JOIN inter USING (id_a, id_b)
  JOIN sizes za ON za.doc_id = c.id_a
  JOIN sizes zb ON zb.doc_id = c.id_b
  WHERE CAST(COALESCE(inter.inter, 0) AS DOUBLE)
        / CAST(za.sz + zb.sz - COALESCE(inter.inter, 0) AS DOUBLE)
        >= {_CLUSTER_JACCARD}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs),
reach(n, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a)
SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n
"""

QUERIES["dedup_clusters"] = dedup_clusters
ORACLES["dedup_clusters"] = DEDUP_CLUSTERS_SQL


# ── C16 split_assign (reproducible train/val/test split) ───────────
from umls2rdf_spark.operators.textstats import split_assign


def split_assign_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = split_assign(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    return docs.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
    ).orderBy("split")


SPLIT_ASSIGN_SQL = f"""
SELECT CASE WHEN {stable_hash40_sql('CAST(doc_id AS VARCHAR)')} % 100 < 80
            THEN 'train'
            WHEN {stable_hash40_sql('CAST(doc_id AS VARCHAR)')} % 100 < 90
            THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_id
FROM documents
GROUP BY 1
ORDER BY 1
"""

QUERIES["split_assign"] = split_assign_demo
ORACLES["split_assign"] = SPLIT_ASSIGN_SQL


# ── C15+C17+C18+C19 corpus_prep (scrub → decontaminate → sample →
#    chunk, the composed training-data preparation pipeline) ─────────
from umls2rdf_spark.operators.corpus import (
    chunk_documents,
    decontaminate,
    pack_sequences,
    remove_boilerplate_segments,
    stratified_sample,
)
from umls2rdf_spark.operators.substrings import remove_repeated_substrings
from umls2rdf_spark.operators.textstats import SCRUB_PATTERNS, scrub_text

# A deterministic PII-bearing suffix appended to every 10th document
# before scrubbing: the synthetic corpus contains no emails/URLs/
# phones, so without this the scrub stage would be a hash-invisible
# no-op. With it, the scrubbed placeholders flow into the shingles,
# the sample and the chunks — any scrub deviation breaks the hash.
_PII_SUFFIX = (
    " contact jane.doe+test@example-mail.com or"
    " https://example.com/a/b?q=1 or call +1 (415) 555-0199 now"
)
_BOILER_W = 3               # boilerplate segment width (words)
_BOILER_K = 5               # a segment in > K docs is boilerplate
_SUBSTR_L = 6               # repeated-substring window (tokens)
_CORPUS_BENCH_MOD = 25      # every 25th doc doubles as the benchmark
_CORPUS_SHINGLE_N = 4       # 4-gram overlap → ~7% of sf0.01 flagged
_CORPUS_CHUNK_TOKENS = 32
_CORPUS_CHUNK_OVERLAP = 8
_PACK_SEQ_LEN = 48          # training sequence length for the pack step
_PACK_SHARDS = 8            # two-level-cumsum shards (bounded window)
# Per-stratum keep fractions exercising the dict path (alternating
# 0.8/0.4 over the 20 synthetic sources).
_CORPUS_FRACTIONS = {f"src{i}": (0.8 if i % 2 == 0 else 0.4) for i in range(20)}
_SAMPLE_PRECISION = 1_000_000


def corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-preparation pipeline over ``documents``:

    1. PII scrub (`scrub_text` — codegen regexp_replace chain),
    2. cross-document boilerplate removal
       (`remove_boilerplate_segments` — 3-word segments appearing in
       >5 docs dropped, survivors reassembled in order),
    3. exact repeated-substring dedup (`remove_repeated_substrings`
       — any 6-token run occurring twice corpus-wide is cut),
    4. benchmark decontamination (`decontaminate` — 4-gram overlap vs
       the every-25th-doc 'benchmark' slice, contaminated docs
       anti-joined away),
    5. deterministic stratified sampling (`stratified_sample` — per-
       source keep fractions keyed on stable_hash40(doc_id)),
    6. overlapping token-window chunking (`chunk_documents`),
    7. GPT-style sequence packing (`pack_sequences` — concat-and-chop
       of the chunk token streams into fixed 48-token training
       sequences via the two-level sharded cumulative sum).

    Returns one row per (chunk, training-sequence) overlap: the chunk
    columns plus (seq_id, tok_start, tok_end, seq_off) — every
    stage's output feeds the next, so the driver hash check verifies
    all seven operators at once.

    Scale shape: scrub and chunk are map-side; boilerplate counting
    and the substring window group-by are map-side-combined
    aggregations whose lookup sides broadcast back (boilerplate) or
    semi-join (repeated windows); decontaminate broadcast-joins the
    (small) benchmark shingle set; sampling is a map-side hash cut;
    packing windows inside hash shards and broadcasts the shards-row
    offset table — no single-reducer stage anywhere. The one
    sort-merge join in the static plan is the contaminated-id
    LeftAnti: its build side is almost always tiny, but hard-hinting
    broadcast would OOM in the adversarial everything-contaminated
    case, so it is deliberately left for AQE to convert to broadcast
    at runtime from the OBSERVED size.
    """
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"), F.lit(_PII_SUFFIX)),
        ).otherwise(F.col("text")),
    )
    # three consumers (corpus shingles, benchmark slice, the kept
    # anti-join side) re-run the scrub scan; measured at 10x, that is
    # CHEAPER than persisting the scrubbed corpus (text-heavy cache
    # materialization cost 3x the repeated codegen regex scans:
    # 5.2s -> 15.9s). Scan-speed recompute wins for wide text rows.
    scrubbed = scrub_text(aug, "text")
    deboiler = remove_boilerplate_segments(
        scrubbed, "doc_id", "text",
        segment_words=_BOILER_W, max_docs=_BOILER_K,
    ).select("doc_id", F.col("clean_text").alias("text"))
    dedup = remove_repeated_substrings(
        deboiler, "doc_id", "text", min_len=_SUBSTR_L
    ).select("doc_id", F.col("clean_text").alias("text"))
    # the cleanup stages return (id, text); source rides back in on
    # the id (the reassembly already shuffled on it)
    clean = dedup.join(scrubbed.select("doc_id", "source"), "doc_id")
    bench = clean.where(
        F.col("doc_id") % _CORPUS_BENCH_MOD == 0
    ).select(F.col("doc_id").alias("bench_id"), "text")
    flagged = decontaminate(
        clean, bench, "doc_id", "text", "bench_id", "text",
        shingle_n=_CORPUS_SHINGLE_N,
    )
    # no distinct on the drop list: left_anti is set-semantics on
    # the left side, so duplicate drop ids cannot multiply or
    # reorder the output — the explicit dedup only added a full
    # extra shuffle of the rows the anti-join hashes anyway
    # (guide §2.4; the incremental_minhash drop-list argument)
    drop = flagged.where(
        F.col("doc_id") != F.col("bench_id")
    ).select("doc_id")
    kept = clean.join(drop, "doc_id", "left_anti")
    sampled = stratified_sample(
        kept, "source", "doc_id", _CORPUS_FRACTIONS,
        precision=_SAMPLE_PRECISION,
    )
    chunks = chunk_documents(
        sampled, "doc_id", "text",
        chunk_tokens=_CORPUS_CHUNK_TOKENS, overlap=_CORPUS_CHUNK_OVERLAP,
    )
    return pack_sequences(
        chunks, "doc_id", "n_tokens",
        seq_len=_PACK_SEQ_LEN, shards=_PACK_SHARDS, order_col="chunk_idx",
    )


def _scrub_sql(expr: str) -> str:
    """DuckDB twin of scrub_text: the same ordered regexp chain with
    the global flag (Spark regexp_replace is replace-all)."""
    for _name, pat, repl in SCRUB_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


_SHINGLE_CAT = " || ' ' || ".join(
    f"f[i+{j}]" for j in range(_CORPUS_SHINGLE_N)
)
_FRACTION_CASE = " ".join(
    f"WHEN source = '{s}' THEN {int(frac * _SAMPLE_PRECISION)}"
    for s, frac in _CORPUS_FRACTIONS.items()
)
_STRIDE = _CORPUS_CHUNK_TOKENS - _CORPUS_CHUNK_OVERLAP
CORPUS_PREP_SQL = f"""
WITH aug AS (
  SELECT doc_id, source,
         text || CASE WHEN doc_id % 10 = 0 THEN '{_PII_SUFFIX}'
                      ELSE '' END AS text
  FROM documents),
clean AS (
  SELECT doc_id, source, {_scrub_sql('text')} AS text FROM aug),
bseg AS (
  SELECT doc_id, s,
         array_to_string(bt[CAST(s+1 AS INT) : CAST(s+{_BOILER_W} AS INT)],
                         ' ') AS seg
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS bt
        FROM clean) c,
       UNNEST(range(0, greatest(len(bt)-1, 0)+1, {_BOILER_W})) AS u(s)),
bfreq AS (
  SELECT seg FROM bseg GROUP BY seg
  HAVING COUNT(DISTINCT doc_id) > {_BOILER_K}),
bclean AS (
  SELECT b.doc_id,
         COALESCE(string_agg(b.seg, ' ' ORDER BY b.s)
                  FILTER (WHERE f2.seg IS NULL), '') AS text
  FROM bseg b LEFT JOIN bfreq f2 ON b.seg = f2.seg
  GROUP BY b.doc_id),
stok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS st
  FROM bclean),
swin AS (
  SELECT doc_id, CAST(s AS INT) AS pos,
         array_to_string(st[CAST(s+1 AS INT) : CAST(s+{_SUBSTR_L} AS INT)],
                         ' ') AS win
  FROM stok, UNNEST(range(0, greatest(len(st)-{_SUBSTR_L}+1, 0))) AS u(s)),
srep AS (
  SELECT doc_id, pos FROM swin
  WHERE win IN (SELECT win FROM swin GROUP BY win HAVING COUNT(*) > 1)),
sruns AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NOT NULL AND pos > prev + {_SUBSTR_L}
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS span
  FROM (SELECT doc_id, pos,
               LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM srep)),
sspans AS (
  SELECT doc_id, MIN(pos) AS sp_start, MAX(pos) + {_SUBSTR_L} AS sp_end
  FROM sruns GROUP BY doc_id, span),
stoks AS (
  SELECT doc_id, st[CAST(s+1 AS INT)] AS tk, CAST(s AS INT) AS idx
  FROM stok, UNNEST(range(0, len(st))) AS u(s)),
skept AS (
  SELECT k.doc_id, k.idx, k.tk
  FROM stoks k
  WHERE NOT EXISTS (SELECT 1 FROM sspans p
                    WHERE p.doc_id = k.doc_id
                      AND k.idx >= p.sp_start AND k.idx < p.sp_end)),
sclean AS (
  SELECT b.doc_id, COALESCE(a.text, '') AS text
  FROM bclean b LEFT JOIN (
    SELECT doc_id, string_agg(tk, ' ' ORDER BY idx) AS text
    FROM skept GROUP BY doc_id) a USING (doc_id)),
tok AS (
  SELECT s.doc_id, c.source, s.text,
         list_filter(string_split(s.text, ' '), t -> t <> '') AS f
  FROM sclean s JOIN clean c USING (doc_id)),
idx AS (
  SELECT doc_id, f,
         unnest(generate_series(1,
            greatest(len(f) - {_CORPUS_SHINGLE_N - 1}, 0))) AS i
  FROM tok),
sh AS (
  SELECT DISTINCT doc_id, {_SHINGLE_CAT} AS shingle FROM idx),
bench AS (
  SELECT doc_id AS bench_id, shingle FROM sh
  WHERE doc_id % {_CORPUS_BENCH_MOD} = 0),
dropped AS (
  SELECT DISTINCT s.doc_id
  FROM sh s JOIN bench b USING (shingle)
  WHERE s.doc_id <> b.bench_id),
sampled AS (
  SELECT t.doc_id, t.f
  FROM tok t
  WHERE t.doc_id NOT IN (SELECT doc_id FROM dropped)
    AND {stable_hash40_sql('CAST(t.doc_id AS VARCHAR)')}
        % {_SAMPLE_PRECISION}
        < CASE {_FRACTION_CASE} ELSE 0 END),
starts AS (
  SELECT doc_id, f,
         unnest(generate_series(0, greatest(len(f) - 1, 0),
                                {_STRIDE})) AS s
  FROM sampled),
chunks AS (
  SELECT doc_id, CAST(s // {_STRIDE} AS BIGINT) AS chunk_idx,
         list_slice(f, s + 1, s + {_CORPUS_CHUNK_TOKENS}) AS w
  FROM starts
  WHERE s = 0 OR s < len(f)),
chunkrows AS (
  SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
         array_to_string(w, ' ') AS chunk_text,
         CAST(len(w) AS BIGINT) AS n_tokens
  FROM chunks
  WHERE len(w) > 0),
sharded AS (
  SELECT *, {stable_hash40_sql('CAST(doc_id AS VARCHAR)')}
            % {_PACK_SHARDS} AS shard
  FROM chunkrows),
loc AS (
  SELECT *, COALESCE(CAST(SUM(n_tokens) OVER (
      PARTITION BY shard ORDER BY doc_id, chunk_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      0) AS lb
  FROM sharded),
offs AS (
  SELECT shard, COALESCE(CAST(SUM(tot) OVER (ORDER BY shard
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      0) AS sb
  FROM (SELECT shard, SUM(n_tokens) AS tot FROM sharded
        GROUP BY shard)),
g AS (
  SELECT l.*, l.lb + o.sb AS gb
  FROM loc l JOIN offs o USING (shard)),
sq AS (
  SELECT *, unnest(generate_series(gb // {_PACK_SEQ_LEN},
      (gb + n_tokens - 1) // {_PACK_SEQ_LEN})) AS seq_id
  FROM g)
SELECT doc_id, chunk_idx, chunk_text, n_tokens,
       CAST(seq_id AS BIGINT) AS seq_id,
       CAST(greatest(0, seq_id * {_PACK_SEQ_LEN} - gb) AS BIGINT)
           AS tok_start,
       CAST(least(n_tokens, (seq_id + 1) * {_PACK_SEQ_LEN} - gb)
           AS BIGINT) AS tok_end,
       CAST(gb + greatest(0, seq_id * {_PACK_SEQ_LEN} - gb)
            - seq_id * {_PACK_SEQ_LEN} AS BIGINT) AS seq_off
FROM sq
"""

QUERIES["corpus_prep"] = corpus_prep
ORACLES["corpus_prep"] = CORPUS_PREP_SQL
