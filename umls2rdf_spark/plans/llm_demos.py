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
    MERSENNE_61,
    perm_params,
    stable_hash40_sql,
)
from umls2rdf_spark.operators.dedup import (
    SIMHASH_BITS,
    exact_dedupe_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from umls2rdf_spark.operators.similarity import (
    cosine_topk,
    hyperplane_bucket_expr,
    lsh_cosine_topk,
)
from umls2rdf_spark.operators.textstats import (
    STOPWORDS,
    TOKEN_REGEX,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from umls2rdf_spark.sources.parquet import load_table

_NUM_PERM = 8
_ANN_K = 5
_ANN_QUERIES = 10
_LSH_PLANES = 4
_LSH_K = 3
_DIM = 64


# ── C1 dedup_exact ──────────────────────────────────────────────────
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedupe_groups(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


# ── C2 dedup_minhash ────────────────────────────────────────────────
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = minhash_signatures(
        load_table(spark, sf_dir, "documents"),
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
  SELECT doc_id, perm_id, MIN((a * h + b) % {MERSENNE_61}) AS minhash
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


# ── C4 ngram_jaccard ────────────────────────────────────────────────
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        block_col="source",
        min_jaccard=0.5,
    )


NGRAM_JACCARD_SQL = """
WITH words AS (
  SELECT DISTINCT block, doc_id, w FROM (
    SELECT source AS block, doc_id,
           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
    FROM documents)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM words GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM words a
  JOIN words b ON a.block = b.block AND a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       CAST(inter AS DOUBLE)
         / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5
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


# ── C6 ann_lsh_topk ─────────────────────────────────────────────────
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_cosine_topk(
        emb, "vec_id", "embedding", k=_LSH_K, planes=_LSH_PLANES
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
ANN_LSH_SQL = f"""
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
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         SUM(a.comp * b.comp) AS dot
  FROM (SELECT c.*, bk.bucket FROM comps c JOIN buckets bk USING (vec_id)) a
  JOIN (SELECT c.*, bk.bucket FROM comps c JOIN buckets bk USING (vec_id)) b
    ON a.bucket = b.bucket AND a.pos = b.pos AND a.vec_id <> b.vec_id
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


# ── C7 lang_id ──────────────────────────────────────────────────────
def lang_id_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def _stop_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS f
  FROM documents),
h AS (
  SELECT doc_id,
    len(list_filter(f, x -> list_contains({_stop_list('en')}, x))) AS hits_en,
    len(list_filter(f, x -> list_contains({_stop_list('es')}, x))) AS hits_es,
    len(list_filter(f, x -> list_contains({_stop_list('de')}, x))) AS hits_de
  FROM t)
SELECT doc_id,
       CASE WHEN hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
            WHEN hits_es >= hits_de THEN 'es'
            ELSE 'de' END AS pred_lang,
       CAST(hits_en AS BIGINT) AS hits_en,
       CAST(hits_es AS BIGINT) AS hits_es,
       CAST(hits_de AS BIGINT) AS hits_de
FROM h
"""


# ── C8 quality_score ────────────────────────────────────────────────
def quality_score_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


_ALL_STOP = "[" + ", ".join(
    f"'{w}'" for ws in STOPWORDS.values() for w in ws
) + "]"
QUALITY_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS f
  FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(f) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(f, x -> list_contains({_ALL_STOP}, x)))
              AS BIGINT) AS n_stopwords,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
              AS BIGINT) AS n_punct
  FROM t JOIN documents USING (doc_id))
SELECT doc_id, n_tokens, n_stopwords, n_punct,
       CASE WHEN n_chars > 0
            THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
            ELSE 0.0 END AS punct_ratio,
       (CASE WHEN n_tokens > 0
             THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             ELSE 0.0 END) * 0.5
       + CAST(least(n_tokens, 50) AS DOUBLE) / 50.0 * 0.5 AS quality
FROM m
"""


# ── C9 token_count ──────────────────────────────────────────────────
def token_count_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
            AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{TOKEN_REGEX}'))
            AS BIGINT) AS re_tokens
FROM documents
"""


# ── C10 doc_fingerprint ─────────────────────────────────────────────
def doc_fingerprint_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS norm_fp,
       md5(text) AS raw_fp
FROM documents
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "ngram_jaccard": ngram_jaccard,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "lang_id": lang_id_demo,
    "quality_score": quality_score_demo,
    "token_count": token_count_demo,
    "doc_fingerprint": doc_fingerprint_demo,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_minhash": DEDUP_MINHASH_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "ngram_jaccard": NGRAM_JACCARD_SQL,
    "ann_cosine_topk": ANN_COSINE_SQL,
    "ann_lsh_topk": ANN_LSH_SQL,
    "lang_id": LANG_ID_SQL,
    "quality_score": QUALITY_SCORE_SQL,
    "token_count": TOKEN_COUNT_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
}


# ── C6b ann_ivf_topk ────────────────────────────────────────────────
from umls2rdf_spark.operators.similarity import ivf_centroid, ivf_cosine_topk

_IVF_CELLS = 8


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_cosine_topk(
        emb, "vec_id", "embedding", k=_LSH_K, cells=_IVF_CELLS
    )


_CENT_VALUES = ", ".join(
    f"({i}, {j + 1}, {ivf_centroid(i, j)})"
    for i in range(_IVF_CELLS)
    for j in range(_DIM)
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


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: minhash candidate pairs closed into
    connected components; every document gets a cluster id (min doc_id
    of its component)."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", num_perm=_NUM_PERM)
    pairs = lsh_candidate_pairs(sigs, "doc_id", rows_per_band=1)
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
  SELECT doc_id, perm_id, MIN((a * h + b) % {MERSENNE_61}) AS minhash
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
