"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

All pure Catalyst expressions (split/filter/size/md5/regexp) — the
per-document cost is a handful of codegen'd string ops, so these run
at scan speed on a 100 TB corpus. Double-valued ratios are divisions
of exact integers → deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from umls2rdf_spark.operators.spread import spread_small_input

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ein"],
}
LANG_ORDER = ["en", "es", "de"]

TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped (string_split parity)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def _hits(text: Column, words: list[str]) -> Column:
    tok_arr = tokens(text)
    return F.size(F.filter(tok_arr, lambda t: t.isin(*words)))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-ratio language heuristic: argmax of per-language
    stopword hits with a fixed preference order on ties."""
    text = F.col(text_col)
    hits = {lg: _hits(text, ws) for lg, ws in STOPWORDS.items()}
    pred = (
        F.when(
            (hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"]), F.lit("en")
        )
        .when(hits["es"] >= hits["de"], F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        hits["en"].cast("bigint").alias("hits_en"),
        hits["es"].cast("bigint").alias("hits_es"),
        hits["de"].cast("bigint").alias("hits_de"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length/stopword/alpha quality features + a combined score.

    Score = stopword_ratio * 0.5 + min(n_tokens,50)/50 * 0.5 —
    exact-integer inputs, deterministic double output.
    """
    text = F.col(text_col)
    tok_arr = tokens(text)
    n_tokens = F.size(tok_arr).cast("bigint")
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    n_stop = F.size(F.filter(tok_arr, lambda t: t.isin(*all_stop))).cast(
        "bigint"
    )
    n_chars = F.length(text).cast("bigint")
    # punctuation = whatever survives stripping [a-z0-9 ] from the
    # lowered text (exact integer count, engine-neutral)
    n_punct = F.length(
        F.regexp_replace(F.lower(text), "[a-z0-9 ]", "")
    ).cast("bigint")
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens.cast("double")).otherwise(
        F.lit(0.0)
    )
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_tokens, F.lit(50)).cast("double") / F.lit(50.0)
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        punct_ratio.alias("punct_ratio"),
        (stop_ratio * 0.5 + len_score * 0.5).alias("quality"),
    )


def text_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass document feature extraction: language id (stopword
    argmax), whitespace + regex token counts, stopword/punctuation
    counts and ratios, the composite quality score, and the bigram
    repetition ratio — the fused form of lang_id/quality_score/
    token_count/repetition_ratio.

    A single projection: every feature shares one tokenization, so a
    100 TB corpus is read (and tokenized) once for the whole feature
    set instead of once per feature query.
    """
    text = F.col(text_col)
    tok_arr = tokens(text)
    hits = {lg: _hits(text, ws) for lg, ws in STOPWORDS.items()}
    pred = (
        F.when(
            (hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"]), F.lit("en")
        )
        .when(hits["es"] >= hits["de"], F.lit("es"))
        .otherwise(F.lit("de"))
    )
    n_tokens = F.size(tok_arr).cast("bigint")
    re_tokens = F.regexp_count(F.lower(text), F.lit(TOKEN_REGEX)).cast("bigint")
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    n_stop = F.size(F.filter(tok_arr, lambda t: t.isin(*all_stop))).cast(
        "bigint"
    )
    n_chars = F.length(text).cast("bigint")
    n_punct = F.length(
        F.regexp_replace(F.lower(text), "[a-z0-9 ]", "")
    ).cast("bigint")
    stop_ratio = F.when(
        n_tokens > 0, n_stop.cast("double") / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_tokens, F.lit(50)).cast("double") / F.lit(50.0)
    # bigram repetition ratio (same expression as repetition_ratio
    # with n=2) — rides the shared tokenization, zero extra shuffle
    with_t = df.withColumn("__t", tok_arr)
    grams = F.expr(
        "CASE WHEN size(__t) >= 2 THEN "
        "transform(sequence(0, size(__t)-2), "
        "i -> concat_ws(' ', __t[i], __t[i+1])) "
        "ELSE array() END"
    )
    g_total = F.size(grams).cast("double")
    g_distinct = F.size(F.array_distinct(grams)).cast("double")
    rep_ratio = F.when(
        g_total > 0, (g_total - g_distinct) / g_total
    ).otherwise(F.lit(0.0))
    return with_t.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        n_tokens.alias("n_tokens"),
        re_tokens.alias("re_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        punct_ratio.alias("punct_ratio"),
        (stop_ratio * 0.5 + len_score * 0.5).alias("quality"),
        F.size(grams).cast("bigint").alias("n_grams"),
        rep_ratio.alias("rep_ratio"),
    )


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(tokens(text)).cast("bigint").alias("ws_tokens"),
        F.regexp_count(F.lower(text), F.lit(TOKEN_REGEX)).cast("bigint").alias(
            "re_tokens"
        ),
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized md5 fingerprint (lower + space-collapse + trim) —
    the near-canonical exact-dup key; plus the raw-text md5."""
    text = F.col(text_col)
    normalized = F.trim(F.regexp_replace(F.lower(text), " +", " "))
    return df.select(
        F.col(id_col),
        F.md5(normalized).alias("norm_fp"),
        F.md5(text).alias("raw_fp"),
    )


SCRUB_PATTERNS = [
    # (name, regex, replacement) — applied in order, all JVM-side
    ("email", r"[\w.+-]+@[\w-]+\.[\w.-]+", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def scrub_text(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """PII/noise scrubbing for training corpora: emails, URLs and
    phone-number shapes replaced by typed placeholder tokens — a
    chain of ``regexp_replace`` expressions, whole-stage codegen'd,
    so a 100 TB corpus scrubs at scan speed (no UDF)."""
    out_col = out_col or text_col
    expr = F.col(text_col)
    for _name, pat, repl in SCRUB_PATTERNS:
        expr = F.regexp_replace(expr, pat, repl)
    return df.withColumn(out_col, expr)


def repetition_ratio(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Repetition quality signal: fraction of duplicate word
    ``n``-grams per document (boilerplate/generated text scores high).
    Pure array expressions — distinct-vs-total n-gram counts computed
    per row, no explode, no shuffle."""
    tok = tokens(F.col(text_col))
    parts = ", ".join(f"__t[i+{j}]" for j in range(n))
    grams = F.expr(
        f"CASE WHEN size(__t) >= {n} THEN "
        f"transform(sequence(0, size(__t)-{n}), i -> concat_ws(' ', {parts})) "
        "ELSE array() END"
    )
    with_g = df.withColumn("__t", tok).withColumn("__g", grams)
    total = F.size(F.col("__g")).cast("double")
    distinct = F.size(F.array_distinct(F.col("__g"))).cast("double")
    ratio = F.when(total > 0, (total - distinct) / total).otherwise(
        F.lit(0.0)
    )
    return with_g.select(
        F.col(id_col),
        F.size(F.col("__g")).cast("bigint").alias("n_grams"),
        ratio.alias("rep_ratio"),
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by stable hash of the
    id — reproducible across runs, engines, partitionings and data
    order (the property random() splits lack). SQL twin uses the same
    md5-prefix bucket."""
    from umls2rdf_spark.functions.hashing import stable_hash40

    bucket = F.pmod(stable_hash40(F.col(id_col).cast("string")), F.lit(100))
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Per-document top-k TF-IDF terms (keyword extraction — no
    counterpart in the reference; LLM-corpus extension).

    Score is the log-free variant ``tf * N / df`` computed as
    ``double(tf*N) / double(df)``: every input is an exact integer
    and IEEE-754 division is correctly rounded, so the score is
    bit-identical in any engine — a log()-based IDF differs in the
    last ulp between libms and would poison oracle hash compares
    (ranking by tf*N/df orders identically to ranking by
    log(tf)+log(N/df)-free monotone transforms of the same ratio).

    Shape at scale: one shuffle to (doc, term) for TF, one map-side-
    combined shuffle to term for DF (input rows already unique per
    doc), a term-keyed join back (``broadcast_vocab=True`` broadcasts
    the DF table when the vocabulary fits — term join then moves no
    corpus rows), and a doc-keyed window for the top-k. The corpus
    text itself is read ONCE; everything downstream carries only
    (id, token, counts). N is a one-row aggregate cross-joined via
    broadcast — it stays in the plan, no driver collect.

    Ties rank deterministically: score desc, then token asc.
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != "",
    )
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            (F.col("tf") * F.col("n_docs")).cast("double")
            / F.col("doc_freq").cast("double"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tf", "doc_freq", "tfidf", "rank")
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under a BM25-shaped
    score (retrieval ranking — no counterpart in the reference;
    LLM-corpus extension). k1=1.2, b=0.75.

    Engine-deterministic scoring: floats are only ever produced by a
    FIXED sequence of correctly-rounded IEEE ops over exact integers
    — the tf-saturation term is multiplied out to the integer ratio
    ``22*tf*T / (10*tf*T + 3*T + 9*dl*N)`` (T = total corpus tokens,
    dl = doc length), the IDF is the log-free ``N/df`` ratio, and
    each per-term contribution is quantized to an int64 via
    ``floor(1e6 * idf * sat)`` BEFORE the per-document sum. Summing
    int64s is order-independent, so the score — unlike a float sum
    — cannot vary with partitioning or engine, and the oracle hash
    is exact. (A log()-IDF or an unquantized float sum would differ
    in the last ulp between engines/partitionings.)

    Shape at scale: ONE corpus scan computes dl and the term-filtered
    tf rows (the explode drops every non-query token immediately, so
    the shuffle carries ≤ |terms| rows per doc); df and the (N, T)
    totals are tiny aggregates joined back via broadcast; the final
    top-k is orderBy+limit = TakeOrdered (no global sort shuffle).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != "",
    )
    base = df.select(
        F.col(id_col), toks.alias("__toks")
    ).withColumn("dl", F.size("__toks").cast("bigint"))
    tf = (
        base.select(
            id_col,
            "dl",
            F.explode(
                F.filter(F.col("__toks"), lambda t: t.isin(*terms))
            ).alias("token"),
        )
        .groupBy(id_col, "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    totals = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    t_ = F.col("total_tokens")
    n_ = F.col("n_docs")
    sat = (F.lit(22) * F.col("tf") * t_).cast("double") / (
        F.lit(10) * F.col("tf") * t_
        + F.lit(3) * t_
        + F.lit(9) * F.col("dl") * n_
    ).cast("double")
    idf = n_.cast("double") / F.col("doc_freq").cast("double")
    contrib = F.floor(F.lit(1000000.0) * idf * sat).cast("bigint")
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(totals))
        .withColumn("__c", contrib)
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("score_q"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("score_q").desc(), F.col(id_col).asc())
        .limit(k)
    )


def unigram_surprisal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    quant_bits: int = 20,
    cache=None,
) -> DataFrame:
    """Per-document unigram cross-entropy against the corpus's own
    unigram distribution — the statistical language-model quality
    signal (high bits/token = rare-token soup or noise; low =
    repetitive boilerplate).

    score(doc) = (1/n) * sum over tokens of -log2(count(tok)/total)

    Engine-exactness: log() differs in the last ulp between libms, so
    the per-token surprisal is computed ONCE per DISTINCT count value
    (driver-side Python log2, quantized to int64 at ``quant_bits``
    fractional bits) and shipped back as a broadcast weight dim. The
    per-document sum is then pure int64 — order-independent, so the
    result is bit-identical on any engine or partitioning, and a SQL
    oracle can inline the identical weight table.

    The driver collect is of DISTINCT token-count VALUES, not tokens:
    among N total tokens there can be at most ~sqrt(2N) distinct
    count values (counts c1>c2>... are distinct positive integers
    summing to <= N), so even a 10^13-token corpus collects a few
    million ints — bounded, and independent of vocabulary size.

    Output: (id, n_tokens, surprisal_q, bits_per_token) where
    surprisal_q is the exact int64-quantized total and bits_per_token
    = surprisal_q / 2^quant_bits / n_tokens as double.
    """
    import math

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != "",
    )
    occ = df.select(F.col(id_col), F.explode(toks).alias("token"))
    # persisted: three consumers (total, distinct counts, the score
    # join) would otherwise each re-tokenize the whole corpus; the
    # cached frame is vocabulary-sized, not corpus-sized. Lifecycle:
    # an explicit CacheScope when the caller passes one, else the
    # latest-call-only default (operators/caching.py) — repeated
    # calls in a long-lived session hold at most one invocation's
    # cache instead of growing without bound.
    from umls2rdf_spark.operators.caching import op_scope

    scope = cache if cache is not None else op_scope(
        df.sparkSession, "unigram_surprisal"
    )
    counts = scope.persist(
        occ.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    )
    # ONE bounded driver job for both decision inputs (total + the
    # distinct count values) instead of two — collect_set returns
    # exactly the distinct-cnt set, and the weight rows are keyed by
    # cnt, so their order is irrelevant (round 9, build-job count:
    # every declared-query call pays these jobs at plan-build time)
    stats = counts.agg(
        F.sum("cnt").alias("total"), F.collect_set("cnt").alias("cnts")
    ).collect()[0]
    total = stats["total"]
    if not total:
        raise ValueError("corpus has no tokens")
    distinct_counts = stats["cnts"]
    scale = 1 << quant_bits
    weights = [
        (int(c), int(round((math.log2(total) - math.log2(c)) * scale)))
        for c in distinct_counts
    ]
    spark = df.sparkSession
    wdim = spark.createDataFrame(weights, "cnt bigint, w bigint")
    per_tok = occ.join(counts, "token").join(F.broadcast(wdim), "cnt")
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("surprisal_q"),
        )
        .withColumn(
            "bits_per_token",
            F.col("surprisal_q").cast("double")
            / F.lit(float(scale))
            / F.col("n_tokens").cast("double"),
        )
    )


def frequent_tokens(
    df: DataFrame,
    text_col: str,
    k: int = 50,
    by_docs: bool = False,
) -> DataFrame:
    """Corpus-wide top-k token frequencies — the vocabulary-audit
    primitive (stopword discovery, boilerplate spotting, tokenizer
    sanity checks before a training run).

    One explode + one map-side-combined groupBy; the top-k is a
    genuine ``orderBy().limit(k)`` TakeOrdered over the
    vocabulary-sized count table (per-partition heaps + a k-row
    driver merge — never a full sort, at ANY k); rank is then derived
    by a window over the ALREADY-LIMITED k rows, so the only
    single-partition stage touches k rows, not the vocabulary.
    ``by_docs=True`` counts document frequency
    (distinct docs containing the token — needs the id column to ride
    along in ``df``... it counts distinct over all non-token columns'
    struct, so pre-select (id, text)) instead of raw occurrences.
    Deterministic ties: count desc, token asc.
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != "",
    )
    other = [c for c in df.columns if c != text_col]
    ex = df.select(*other, F.explode(toks).alias("token"))
    if by_docs:
        counts = ex.select(*other, "token").distinct().groupBy(
            "token"
        ).agg(F.count(F.lit(1)).alias("n"))
    else:
        counts = ex.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w))


def token_log_odds(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    quant_bits: int = 20,
) -> DataFrame:
    """Per-token integer log-odds weights from a boolean label — the
    fastText/GPT-3-style unigram quality classifier, trained in one
    aggregation pass. Returns (token, w): the MODEL a pipeline
    persists and applies to every incoming shard.

    w(token) = round(2^quant_bits * (log2 P(token|pos) -
    log2 P(token|neg))) with add-one smoothing, algebraically
    rearranged so every log2 argument is an exact integer product:
    log2((pos_n+1)*(neg_tot+V)) - log2((neg_n+1)*(pos_tot+V)).
    Exact-int log2 arguments make the weights engine-stable in
    practice, with the platform-libm caveat shared by the other
    log-weight ops: JVM Math.log and DuckDB libm agree to ~1 ulp,
    not bit-for-bit, so a round() sitting exactly on a half-way
    boundary can flip — statistically expected once vocabularies
    reach ~10^9 tokens. Pipelines that need bit-identical weights
    across engines should compute the per-distinct-count weights
    driver-side and broadcast the quantized integers, the way
    :func:`bigram_surprisal` builds its weight dims.

    Shape: one tokenize+explode, one map-side-combined groupBy to
    the vocabulary frame, totals as a broadcast 1-row agg. Nothing
    corpus-sized crosses the wire twice.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != "",
    )
    occ = df.select(
        F.col(label_col).cast("boolean").alias("__pos"),
        F.explode(toks).alias("token"),
    )
    counts = occ.groupBy("token").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("pos_n"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("neg_n"),
    )
    totals = counts.agg(
        F.sum("pos_n").alias("__pt"),
        F.sum("neg_n").alias("__nt"),
        F.count(F.lit(1)).alias("__v"),
    )
    scale = 1 << quant_bits
    # each factor is cast to double BEFORE the multiply: the int64
    # product (pos_n+1)*(neg_tot+V) overflows around 10^10-doc
    # corpora, while double*double of exactly-representable ints is
    # one correctly-rounded op both engines perform identically
    w = F.round(
        (
            F.log2(
                (F.col("pos_n") + 1).cast("double")
                * (F.col("__nt") + F.col("__v")).cast("double")
            )
            - F.log2(
                (F.col("neg_n") + 1).cast("double")
                * (F.col("__pt") + F.col("__v")).cast("double")
            )
        )
        * F.lit(float(scale))
    ).cast("bigint")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select("token", w.alias("w"))
    )


def score_log_odds(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    quant_bits: int = 20,
) -> DataFrame:
    """Apply a :func:`token_log_odds` model: per-document integer
    log-odds score (sum of token weights; unseen tokens weigh 0) —
    positive means the document looks like the positive class.

    Output: (id, n_tokens, logodds_q, avg_logodds). The sum is pure
    int64 (order-independent, engine-exact); avg_logodds =
    logodds_q / 2^quant_bits / n_tokens as double, the
    length-normalized quality signal pipelines threshold on.

    The token join is vocabulary-vs-corpus — leave the strategy to
    AQE (a hint would force a vocabulary broadcast that a 10^9-token
    web vocabulary could not honor; same reasoning as corpus_prep's
    anti-join).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != "",
    )
    occ = df.select(F.col(id_col), F.explode(toks).alias("token"))
    scored = occ.join(weights, "token", "left").withColumn(
        "__w", F.coalesce(F.col("w"), F.lit(0))
    )
    scale = 1 << quant_bits
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__w").alias("logodds_q"),
        )
        .withColumn(
            "avg_logodds",
            F.col("logodds_q").cast("double")
            / F.lit(float(scale))
            / F.col("n_tokens").cast("double"),
        )
    )


def bigram_occurrences(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The (id, w1, w2) bigram-occurrence stream both LM scorers
    consume — UNPERSISTED: callers that feed several consumers (the
    composed text_scoring demo runs bigram_surprisal AND
    kn_surprisal) persist it ONCE through their own CacheScope and
    pass it to each op's ``occ`` parameter, halving both the scan
    count and the cache residency vs per-op persists.

    The input is spread (gated — no-op on any real multi-split
    layout) before the regex tokenize + explode: a single-file local
    read arrives as ONE partition, and because callers persist this
    frame, that single partition is what the cache stores — every
    downstream consumer's map-side work then runs on one core
    (measured: the persisted occurrence build was a 3.5 s
    single-task stage on text_scoring's critical path at sf0.1)."""
    df = spread_small_input(df, id_col)
    toks = f"filter(split(lower({text_col}), '[^a-z0-9]+'), t -> t <> '')"
    pairs_expr = (
        f"transform(array({toks}), t -> CASE WHEN size(t) >= 2 THEN "
        "transform(sequence(0, size(t)-2), "
        "i -> struct(t[i] AS w1, t[i+1] AS w2)) "
        "ELSE array() END)[0]"
    )
    return df.select(
        F.col(id_col), F.explode(F.expr(pairs_expr)).alias("__p")
    ).select(
        id_col, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2")
    )


def bigram_surprisal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    quant_bits: int = 20,
    cache=None,
    occ: DataFrame | None = None,
) -> DataFrame:
    """Per-document bigram cross-entropy against the corpus's own
    bigram LM — the context-sensitive upgrade of
    :func:`unigram_surprisal` (a doc of common words in unusual ORDER
    scores high here and normal there; classic shuffled-text /
    spun-content signal).

    score(doc) = (1/n) * sum over bigrams of
                 -log2(count(w1 w2) / count(w1 ·))

    Engine-exactness by the same two-dim trick: the weight splits as
    log2(count(w1 ·)) - log2(count(w1 w2)), and each term is
    computed once per DISTINCT count value (driver-side Python
    log2, int64-quantized, broadcast back) — both the bigram-count
    and the context-count value sets are bounded by ~sqrt(2N)
    (distinct positive integers summing to <= N), so the collects
    are scale-safe regardless of vocabulary. The per-document sum is
    pure int64: order-independent, bit-identical on any engine.

    Output: (id, n_bigrams, surprisal_q, bits_per_bigram); documents
    with fewer than two tokens produce no row.

    Skew note: the context join keys on w1 alone, and stopword
    contexts ("the ·") dominate real corpora — that is AQE skew-join
    territory (enabled session-wide), the same stance as the other
    hot-key joins; the bigram-count groupBy itself keys on the full
    pair, which spreads fine.
    """
    import math

    from umls2rdf_spark.operators.caching import op_scope

    scope = cache if cache is not None else op_scope(
        df.sparkSession, "bigram_surprisal"
    )
    # ONE corpus scan+tokenize: the occurrence stream is persisted
    # and every downstream consumer — the corpus bigram counts, both
    # weight-collect jobs, the final per-doc join — reads the cache.
    # Round-5 measurements behind this shape (sf0.1 / 10× replica,
    # warm):
    #   double-explode, big persisted (round 4): 1.7 s / 5.0 s
    #   docpair groupBy persisted:               2.7 s / 7.4 s
    #   occ persisted (this):                    2.1 s / 5.5 s
    # The docpair variant loses outright (an occurrence-scale
    # 3-part-key shuffle BEFORE the cache buys nothing its consumers
    # need). The round-4 double-explode is ~0.4 s faster locally
    # because a map-side explode re-run is cheap at this SF — but it
    # scans and regex-tokenizes the corpus twice, which is the
    # dominant term at 100 TB; one scan + a local-disk-spillable
    # occurrence cache is the scale-correct trade, and the vocab
    # count frame no longer needs its own persist. Cache lifecycle:
    # explicit CacheScope param, else latest-call-only residency
    # (operators/caching.py) — the operator cannot unpersist what
    # its lazy output still reads, so the next call releases it.
    if occ is None:
        occ = scope.persist(bigram_occurrences(df, id_col, text_col))
    big = scope.persist(
        occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    )
    ctx = big.groupBy("w1").agg(F.sum("cb").alias("cc"))
    scale = 1 << quant_bits
    spark = df.sparkSession

    # ONE bounded driver job collects BOTH distinct-value sets (the
    # bigram counts and the context totals) instead of one job each —
    # the weight tables are keyed dims, so the per-set values and the
    # rows built from them are identical (round 9, build-job count)
    vals = (
        big.select(F.lit(0).alias("__k"), F.col("cb").alias("__v"))
        .distinct()
        .unionByName(
            ctx.select(F.lit(1).alias("__k"), F.col("cc").alias("__v"))
            .distinct()
        )
        .collect()
    )

    def wdim(which, col):
        rows = [
            (int(r["__v"]), int(round(math.log2(r["__v"]) * scale)))
            for r in vals
            if r["__k"] == which
        ]
        return spark.createDataFrame(rows, f"{col} bigint, w bigint")

    wb = wdim(0, "cb").withColumnRenamed("w", "wb")
    wc = wdim(1, "cc").withColumnRenamed("w", "wc")
    per = (
        occ.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .join(F.broadcast(wb), "cb")
        .join(F.broadcast(wc), "cc")
    )
    return (
        per.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.col("wc") - F.col("wb")).alias("surprisal_q"),
        )
        .withColumn(
            "bits_per_bigram",
            F.col("surprisal_q").cast("double")
            / F.lit(float(scale))
            / F.col("n_bigrams").cast("double"),
        )
    )


#: Character classes for the script/charset profile (C53). Each
#: pattern is written in the common Java-regex ∩ RE2 subset (explicit
#: ranges, \\x hex escapes, no \\p{} properties — the htmlextract
#: dialect stance), so ONE table generates both engines' expressions.
#: Both engines' length() counts CODE POINTS (Spark's length() is
#: code-point based despite the JVM's UTF-16 strings), so the class
#: ranges being BMP-only is a dialect-portability choice, not a
#: length-parity requirement.
SCRIPT_CLASSES = (
    ("ascii", "[\\x00-\\x7f]"),
    ("letter", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("upper", "[A-Z]"),
    ("white", "[ \\t\\n\\r]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("cjk", "[一-鿿]"),
)

#: mostly-ASCII gate threshold: ≤ 10% non-ASCII code points
MOSTLY_ASCII_MAX_NON_ASCII_PPM = 100_000


def char_profile(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document character-class / Unicode-script profile — the
    multilingual-curation signal the token-level ops can't see
    (language-ID by stopwords is blind to SCRIPT: a Cyrillic or CJK
    document has zero English stopwords *and* zero Spanish ones).
    Pipelines targeting an English corpus threshold on
    ``non_ascii_ppm``; multilingual ones route on ``dom_script``.

    Each class count is length(text) − length(text with the class
    removed) — one regexp_replace per class, all fused into a single
    codegen Project over the scan (zero shuffles, zero joins: the
    100 TB cost is the scan itself). Fractions are int64 ppm
    floor-divisions; ``dom_script`` picks latin/cyrillic/cjk by
    integer comparison with a fixed preference order on ties — all
    engine-exact.

    Output: (id, n_chars, one ``<class>_ppm`` per SCRIPT_CLASSES
    entry except ascii which becomes ``non_ascii_ppm``, dom_script,
    mostly_ascii). Empty AND NULL documents emit NULL ppm columns and
    keep dom_script='latin' (the tie default — class counts are
    coalesced to 0 so the tie logic, not the otherwise-branch,
    decides).
    """
    text = F.col(text_col)
    n = F.length(text).cast("bigint")

    def cnt(pat: str):
        # coalesce: NULL text must yield count 0, not NULL — otherwise
        # the dom_script WHEN comparisons all go NULL and evaluation
        # falls through to the 'cjk' otherwise-branch instead of the
        # documented 'latin' tie default
        return F.coalesce(
            (
                F.length(text)
                - F.length(F.regexp_replace(text, pat, ""))
            ).cast("bigint"),
            F.lit(0),
        )

    counts = {name: cnt(pat) for name, pat in SCRIPT_CLASSES}
    ppm = {
        name: F.when(
            F.col("__n") > 0, F.expr(f"__cnt_{name} * 1000000 div __n")
        )
        for name, _ in SCRIPT_CLASSES
    }
    staged = df.select(
        F.col(id_col),
        n.alias("__n"),
        *[counts[name].alias(f"__cnt_{name}") for name, _ in SCRIPT_CLASSES],
    )
    letter, cyr, cjk = (
        F.col("__cnt_letter"),
        F.col("__cnt_cyrillic"),
        F.col("__cnt_cjk"),
    )
    dom = (
        F.when((letter >= cyr) & (letter >= cjk), F.lit("latin"))
        .when(cyr >= cjk, F.lit("cyrillic"))
        .otherwise(F.lit("cjk"))
    )
    non_ascii = F.when(
        F.col("__n") > 0,
        F.expr("(__n - __cnt_ascii) * 1000000 div __n"),
    )
    return staged.select(
        F.col(id_col),
        F.col("__n").alias("n_chars"),
        non_ascii.alias("non_ascii_ppm"),
        *[
            ppm[name].alias(f"{name}_ppm")
            for name, _ in SCRIPT_CLASSES
            if name != "ascii"
        ],
        dom.alias("dom_script"),
        (
            F.coalesce(non_ascii, F.lit(0))
            <= MOSTLY_ASCII_MAX_NON_ASCII_PPM
        ).alias("mostly_ascii"),
    )


def char_profile_sql(
    table_sql: str, id_col: str, text_col: str
) -> str:
    """DuckDB twin of :func:`char_profile`, generated from the SAME
    SCRIPT_CLASSES table (patterns are dialect-portable by
    construction; 'g' flag = Spark's replace-all default)."""

    def cnt(pat: str) -> str:
        # COALESCE mirrors the Spark side: NULL text → 0 counts →
        # dom_script='latin' (the documented tie default)
        p = pat.replace("'", "''")
        return (
            f"coalesce(length({text_col}) - length(regexp_replace("
            f"{text_col}, '{p}', '', 'g')), 0)"
        )

    cnt_cols = ", ".join(
        f"CAST({cnt(pat)} AS BIGINT) AS __cnt_{name}"
        for name, pat in SCRIPT_CLASSES
    )
    ppm_cols = ", ".join(
        f"CASE WHEN __n > 0 THEN __cnt_{name} * 1000000 // __n END"
        f" AS {name}_ppm"
        for name, _ in SCRIPT_CLASSES
        if name != "ascii"
    )
    return f"""
WITH __cp AS (
  SELECT {id_col}, CAST(length({text_col}) AS BIGINT) AS __n,
         {cnt_cols}
  FROM ({table_sql}) AS __cp_src)
SELECT {id_col}, __n AS n_chars,
       CASE WHEN __n > 0
            THEN (__n - __cnt_ascii) * 1000000 // __n END
         AS non_ascii_ppm,
       {ppm_cols},
       CASE WHEN __cnt_letter >= __cnt_cyrillic
             AND __cnt_letter >= __cnt_cjk THEN 'latin'
            WHEN __cnt_cyrillic >= __cnt_cjk THEN 'cyrillic'
            ELSE 'cjk' END AS dom_script,
       COALESCE(CASE WHEN __n > 0
                     THEN (__n - __cnt_ascii) * 1000000 // __n END,
                0) <= {MOSTLY_ASCII_MAX_NON_ASCII_PPM}
         AS mostly_ascii
FROM __cp
"""


def kn_surprisal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    discount4: int = 3,
    quant_bits: int = 20,
    cache=None,
    occ: DataFrame | None = None,
) -> DataFrame:
    """Per-document cross-entropy under an interpolated Kneser-Ney
    bigram LM trained on the corpus itself — the smoothed form of
    :func:`bigram_surprisal` and the shape of the CCNet-style
    perplexity filter (Wenzek et al. 2020 filter web text by LM
    perplexity; KN is the standard n-gram smoothing, Kneser & Ney
    1995). Raw-MLE bigram surprisal over-rewards any bigram the
    corpus has seen even once; KN shrinks rare continuations toward
    their CONTEXT-INDEPENDENT continuation probability (how many
    distinct contexts a word follows), so boilerplate that repeats a
    rare-but-fixed phrase no longer scores as "predictable" for free.

    For an observed bigram (c = c(v,w) >= 1) with discount
    d = discount4/4 (default 3/4, the textbook value):

        p_kn(w|v) = (c - d)/c(v) + d * N1+(v.)/c(v) * N1+(.w)/B

    where N1+(v.) = distinct continuations of context v, N1+(.w) =
    distinct contexts w follows, B = total distinct bigram types.
    Multiplying through by 4B makes every term an exact integer:

        p_kn = (B*(4c - d4) + d4*N1+(v.)*N1+(.w)) / (4B * c(v))

    Engine-exactness: numerator and denominator are built from int64
    factors cast to double BEFORE each multiply (one correctly-
    rounded IEEE op per node, same expression tree in the DuckDB
    twin — the :func:`token_log_odds` stance), the per-type weight is
    round((log2(den) - log2(num)) * 2^quant_bits) as int64, and the
    per-document sum is pure int64 — order-independent on any
    engine. Unlike the raw-count ops the weight dim here is keyed by
    the (c, N1+, N1+) TRIPLE, so it is computed distributed on the
    bigram-type frame (vocabulary-scale, never collected) rather
    than via the driver-side distinct-count broadcast.

    Scale shape: ONE corpus scan+tokenize into the persisted
    occurrence stream (shared-cache discipline of
    :func:`bigram_surprisal`); bigram types via one map-side-combined
    groupBy; context/continuation stats are groupBys OVER THE TYPE
    FRAME (vocabulary-scale, not occurrence-scale); B is a 1-row
    broadcast. The final occurrence join keys on the full (w1, w2)
    pair — hot stopword pairs are AQE skew-join territory, the
    corpus-wide stance.

    Output: (id, n_bigrams, kn_q, kn_bits_per_bigram); documents
    with fewer than two tokens produce no row.
    """
    from umls2rdf_spark.operators.caching import op_scope

    if not (0 < discount4 < 4):
        raise ValueError("discount4 must be in (0, 4) (d = discount4/4)")
    scope = cache if cache is not None else op_scope(
        df.sparkSession, "kn_surprisal"
    )
    if occ is None:
        occ = scope.persist(bigram_occurrences(df, id_col, text_col))
    big = scope.persist(
        occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    )
    ctx = big.groupBy("w1").agg(
        F.sum("cb").alias("cc"), F.count(F.lit(1)).alias("n1")
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n2"))
    tot = big.agg(F.count(F.lit(1)).alias("B"))
    scale = 1 << quant_bits
    num = (
        F.col("B").cast("double")
        * (F.lit(4) * F.col("cb") - F.lit(discount4)).cast("double")
        + (F.lit(discount4) * F.col("n1")).cast("double")
        * F.col("n2").cast("double")
    )
    den = F.col("cc").cast("double") * (F.lit(4) * F.col("B")).cast("double")
    typ = (
        big.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.round((F.log2(den) - F.log2(num)) * F.lit(float(scale)))
            .cast("bigint")
            .alias("wq"),
        )
    )
    return (
        occ.join(typ, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("wq").alias("kn_q"),
        )
        .withColumn(
            "kn_bits_per_bigram",
            F.col("kn_q").cast("double")
            / F.lit(float(scale))
            / F.col("n_bigrams").cast("double"),
        )
    )


def kn_surprisal_sql(
    docs_sql: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    discount4: int = 3,
    quant_bits: int = 20,
) -> str:
    """DuckDB twin of :func:`kn_surprisal` — the same expression tree
    (cast-before-multiply factors, log2 difference, one round) so the
    quantized weights and int64 doc sums are value-identical."""
    scale = 1 << quant_bits
    return f"""
WITH f AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                     t -> t <> '') AS f
  FROM {docs_sql}),
idx AS (
  SELECT {id_col}, f,
         unnest(generate_series(1, greatest(len(f) - 1, 0))) AS i
  FROM f),
occ AS (SELECT {id_col}, f[i] AS w1, f[i+1] AS w2 FROM idx),
big AS (SELECT w1, w2, COUNT(*) AS cb FROM occ GROUP BY 1, 2),
ctx AS (SELECT w1, SUM(cb) AS cc, COUNT(*) AS n1 FROM big GROUP BY 1),
cont AS (SELECT w2, COUNT(*) AS n2 FROM big GROUP BY 1),
tot AS (SELECT COUNT(*) AS B FROM big),
typ AS (
  SELECT w1, w2,
         CAST(round((log2(CAST(cc AS DOUBLE) * CAST(4*B AS DOUBLE))
                     - log2(CAST(B AS DOUBLE)
                              * CAST(4*cb - {discount4} AS DOUBLE)
                            + CAST({discount4}*n1 AS DOUBLE)
                              * CAST(n2 AS DOUBLE)))
                    * {scale}) AS BIGINT) AS wq
  FROM big JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot),
per AS (SELECT o.{id_col}, typ.wq FROM occ o JOIN typ USING (w1, w2))
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(wq) AS BIGINT) AS kn_q,
       CAST(SUM(wq) AS DOUBLE) / {float(scale)}
         / CAST(COUNT(*) AS DOUBLE) AS kn_bits_per_bigram
FROM per GROUP BY 1
"""


GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in")


def gopher_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_len_q: int = 3_000,
    max_mean_len_q: int = 10_000,
    min_alpha_frac_q: int = 800,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Composite document-quality gate in the style of the published
    Gopher web-filtering rules (Rae et al. 2021): word-count bounds,
    mean word length bounds, minimum fraction of words containing an
    alphabetic character, and a minimum number of DISTINCT common
    stopwords present (the classic natural-language-vs-gibberish
    signal). The repetition-rate rules of that family live in
    repetition_ratio (C16); the perplexity-flavored ones in the
    surprisal ops.

    Tokenization splits on WHITESPACE RUNS (``\\s+``), so multi-line
    and tab-separated documents tokenize the same as space-separated
    ones; "alphabetic" is case-insensitive (``[A-Za-z]`` — "USA NATO
    GDP" is fully alphabetic) and stopwords match against lowercased
    tokens, per the published rules.

    Engine-exactness: every ratio is an integer — mean word length
    and alpha fraction are ``x * 1000 div n_words`` (exact integer
    division, identical in Spark and DuckDB) — so the pass verdict
    is a pure integer comparison that hash-matches the oracle under
    any partitioning. One bound-lambda map-side expression over the
    token array: zero shuffles, no UDFs.

    Output: (id, n_words, mean_len_q, alpha_frac_q, stop_hits,
    passes).
    """
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    toks = f"filter(split({text_col}, '\\\\s+'), t -> t <> '')"
    # bind the token array once as a lambda variable (the
    # CollapseProject rule: chained selects would re-split per
    # consumer)
    stats = (
        f"transform(array({toks}), w -> struct("
        "size(w) AS n, "
        "aggregate(w, 0L, (a, t) -> a + length(t)) AS chars, "
        "aggregate(w, 0L, (a, t) -> a + CASE WHEN t RLIKE '[A-Za-z]' "
        "THEN 1L ELSE 0L END) AS alpha, "
        "size(array_intersect(array_distinct(transform(w, t -> lower(t))), "
        f"array({stop_list}))) "
        "AS stop_hits"
        "))[0]"
    )
    out = df.select(
        F.col(id_col), F.expr(stats).alias("__s")
    ).select(
        id_col,
        F.col("__s.n").cast("bigint").alias("n_words"),
        F.when(F.col("__s.n") > 0, F.expr("__s.chars * 1000 div __s.n"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("mean_len_q"),
        F.when(F.col("__s.n") > 0, F.expr("__s.alpha * 1000 div __s.n"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("alpha_frac_q"),
        F.col("__s.stop_hits").cast("bigint").alias("stop_hits"),
    )
    return out.withColumn(
        "passes",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_len_q") >= min_mean_len_q)
        & (F.col("mean_len_q") <= max_mean_len_q)
        & (F.col("alpha_frac_q") >= min_alpha_frac_q)
        & (F.col("stop_hits") >= min_stop_hits),
    )


def gopher_quality_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_len_q: int = 3_000,
    max_mean_len_q: int = 10_000,
    min_alpha_frac_q: int = 800,
    min_stop_hits: int = 2,
) -> str:
    """DuckDB twin of :func:`gopher_quality` — same integer
    quantization, same thresholds."""
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array({text_col}, '\\s+'),
                     t -> t <> '') AS w
  FROM {table}
),
st AS (
  SELECT {id_col},
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(COALESCE(list_sum(list_transform(w, t -> length(t))), 0)
              AS BIGINT) AS chars,
         CAST(COALESCE(list_sum(list_transform(w,
              t -> CASE WHEN regexp_matches(t, '[A-Za-z]') THEN 1 ELSE 0
              END)), 0) AS BIGINT) AS alpha,
         CAST(len(list_intersect(list_distinct(list_transform(w,
              t -> lower(t))),
              [{stop_list}])) AS BIGINT) AS stop_hits
  FROM toks
)
SELECT {id_col}, n_words,
       CASE WHEN n_words > 0
            THEN CAST(chars * 1000 // n_words AS BIGINT)
            ELSE 0 END AS mean_len_q,
       CASE WHEN n_words > 0
            THEN CAST(alpha * 1000 // n_words AS BIGINT)
            ELSE 0 END AS alpha_frac_q,
       stop_hits,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND (CASE WHEN n_words > 0
                  THEN chars * 1000 // n_words ELSE 0 END)
            BETWEEN {min_mean_len_q} AND {max_mean_len_q}
        AND (CASE WHEN n_words > 0
                  THEN alpha * 1000 // n_words ELSE 0 END)
            >= {min_alpha_frac_q}
        AND stop_hits >= {min_stop_hits}) AS passes
FROM st
"""


# ── PMI collocations ─────────────────────────────────────────────────
def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    k: int = 30,
    score_bits: int = 20,
    occ: DataFrame | None = None,
    cache=None,
) -> DataFrame:
    """Corpus-wide top-k collocations by pointwise mutual information
    — the phrase-mining / boilerplate-phrase-discovery primitive
    (Church & Hanks 1990). A pair like ("machine", "learning") has
    high PMI because its joint count dwarfs what its word frequencies
    predict; frequent-but-independent pairs ("the", "of") score ~0.

    Scoring is the LIFT ratio, not the log: for a bigram (x, y) over
    N bigram positions with left-margin count c(x ·) and right-margin
    count c(· y),

        lift_q = (c(x y) · N · 2^score_bits) div (c(x ·) · c(· y))

    computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), the
    WordPiece quantization discipline (operators/wordpiece.py:25):
    PMI = log2(lift) is monotone in lift, so ranking by lift_q IS
    ranking by PMI with no libm in either engine — integral division
    is bit-identical everywhere. Margins are directional (left/right
    occurrence counts), so row and column probabilities each sum to
    one over the SAME N — no end-of-text fudge terms.

    100 TB shape: one scan+tokenize into the (id, w1, w2) occurrence
    stream (pass the shared ``occ`` to reuse a persisted copy), ONE
    pair groupBy (full-pair key — spreads fine) whose result is
    PERSISTED (via ``cache`` or an own scope): margins, the total and
    the candidate filter are all re-aggregations of that one
    distinct-pair frame — without the persist each consumer would
    replay the corpus tokenize+explode (measured 4× the scan cost at
    sf0.1). The ``min_count`` floor prunes the candidate frame BEFORE
    the margin joins — the long tail of hapax bigrams (the vast
    majority at web scale, by Zipf) never shuffles again. The only
    single-partition stage is the TakeOrdered top-k + a window over
    the already-limited k rows (the frequent_tokens discipline,
    textstats.py:474).

    Output: (w1, w2, pair_n, left_n, right_n, lift_q, rank); ties
    break (lift_q desc, w1 asc, w2 asc) — a total order, so the k-cut
    is deterministic in both engines.

    Reference parity: the reference has no co-occurrence analysis
    (its nearest analogue is the per-code term grouping,
    /root/reference/umls2rdf.py:679); this exists for the
    LLM-pipeline surface (SURVEY §2 C61).
    """
    from pyspark.sql import Window

    from umls2rdf_spark.operators.caching import op_scope

    if occ is None:
        occ = bigram_occurrences(df, id_col, text_col)
    scope = cache if cache is not None else op_scope(
        df.sparkSession, "pmi_collocations"
    )
    big = scope.persist(
        occ.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("bigint").alias("pair_n")
        )
    )
    lef = big.groupBy("w1").agg(
        F.sum("pair_n").cast("bigint").alias("left_n")
    )
    rig = big.groupBy("w2").agg(
        F.sum("pair_n").cast("bigint").alias("right_n")
    )
    tot = big.agg(F.sum("pair_n").cast("bigint").alias("n_big"))
    cand = (
        big.where(F.col("pair_n") >= min_count)
        .join(lef, "w1")
        .join(rig, "w2")
        .crossJoin(F.broadcast(tot))
    )
    scored = cand.select(
        "w1",
        "w2",
        "pair_n",
        "left_n",
        "right_n",
        F.expr(
            f"CAST((CAST(pair_n AS DECIMAL(19,0))"
            f" * CAST(n_big AS DECIMAL(19,0))"
            f" * CAST({1 << score_bits} AS DECIMAL(19,0))) div "
            "(CAST(left_n AS DECIMAL(19,0))"
            " * CAST(right_n AS DECIMAL(19,0))) AS BIGINT)"
        ).alias("lift_q"),
    )
    order = [F.col("lift_q").desc(), F.col("w1").asc(), F.col("w2").asc()]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w))


def pmi_collocations_sql(
    docs_sql: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 30,
    score_bits: int = 20,
) -> str:
    """DuckDB twin of :func:`pmi_collocations` — same tokenization
    (kn_surprisal_sql's bigram CTEs), same HUGEINT integral-division
    score, same total tie order."""
    return f"""
WITH f AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                     t -> t <> '') AS f
  FROM {docs_sql}),
idx AS (
  SELECT {id_col}, f,
         unnest(generate_series(1, greatest(len(f) - 1, 0))) AS i
  FROM f),
occ AS (SELECT {id_col}, f[i] AS w1, f[i+1] AS w2 FROM idx),
big AS MATERIALIZED (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_n
        FROM occ GROUP BY 1, 2),
lef AS (SELECT w1, CAST(SUM(pair_n) AS BIGINT) AS left_n
        FROM big GROUP BY 1),
rig AS (SELECT w2, CAST(SUM(pair_n) AS BIGINT) AS right_n
        FROM big GROUP BY 1),
tot AS (SELECT CAST(SUM(pair_n) AS BIGINT) AS n_big FROM big),
scored AS (
  SELECT big.w1, big.w2, pair_n, left_n, right_n,
         CAST((CAST(pair_n AS HUGEINT) * CAST(n_big AS HUGEINT)
               * {1 << score_bits})
              // (CAST(left_n AS HUGEINT) * CAST(right_n AS HUGEINT))
              AS BIGINT) AS lift_q
  FROM big
  JOIN lef USING (w1) JOIN rig USING (w2) CROSS JOIN tot
  WHERE pair_n >= {min_count})
SELECT w1, w2, pair_n, left_n, right_n, lift_q,
       CAST(rnk AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY lift_q DESC, w1, w2) AS rnk
  FROM scored)
WHERE rnk <= {k}
"""


# ── CCNet perplexity buckets ─────────────────────────────────────────
def ccnet_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    discount4: int = 3,
    quant_bits: int = 20,
    cache=None,
    occ: DataFrame | None = None,
    kn: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style per-source perplexity partition (Wenzek et al.
    2020): score every document with the corpus-trained Kneser-Ney
    bigram LM (:func:`kn_surprisal` — the module's CCNet-shaped
    scorer), then split EACH source into equal thirds by perplexity —
    ``head`` (most fluent third, the pretraining keep), ``middle``,
    ``tail``. The per-source cut is the point: a uniform global
    threshold would keep all of an easy source and none of a hard
    one; CCNet calibrates within each source first.

    Pure composition of two existing engine ops, inheriting both
    scale arguments: the KN scorer's bounded weight dims + int64 doc
    sums, and :func:`score_percentile`'s bounded (source, score) CDF
    frame (operators/selection.py:653 — the corpus is never sorted
    or windowed; one map-side groupBy + one broadcast join back).
    The only corpus-scale op this adds is the id-equi-join attaching
    ``group_col`` to the per-doc scores — two per-doc frames on the
    natural key.

    Bucket thresholds are VALUE-based like CCNet's: the score is the
    int64 ``kn_q·1000 div n_bigrams`` (quantized bits-per-bigram)
    and ties share a percentile (strictly-below ppm), so equal-scored
    docs always land in the same bucket and the cut is engine-exact
    — ``head`` is ppm < 1/3, i.e. ``pct_ppm·3 < 1_000_000`` in
    integers.

    Output: (id, group, bpb_q, pct_ppm, bucket); documents with
    fewer than two tokens have no perplexity and produce no row
    (the kn_surprisal contract — gate them with gopher_quality's
    min_words upstream).

    Pass ``kn`` (a kn_surprisal result frame, ideally persisted) to
    reuse a scoring run another consumer already paid for — the
    composed demo shares one run between its kn_surprisal section
    and this one.

    Reference parity: no LM anywhere in the reference; SURVEY §2 C62.
    """
    from umls2rdf_spark.operators.selection import score_percentile

    if kn is None:
        kn = kn_surprisal(
            df, id_col, text_col, discount4, quant_bits,
            cache=cache, occ=occ,
        )
    scored = kn.join(df.select(id_col, group_col), id_col).select(
        id_col,
        group_col,
        F.expr("CAST(kn_q * 1000 div n_bigrams AS BIGINT)").alias(
            "bpb_q"
        ),
    )
    pct = score_percentile(scored, id_col, "bpb_q", group_col)
    bucket = (
        F.when(F.col("pct_ppm") * 3 < 1_000_000, "head")
        .when(F.col("pct_ppm") * 3 < 2_000_000, "middle")
        .otherwise("tail")
    )
    return pct.select(
        id_col, group_col, "bpb_q", "pct_ppm", bucket.alias("bucket")
    )


def ccnet_buckets_sql(
    docs_sql: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    discount4: int = 3,
    quant_bits: int = 20,
) -> str:
    """DuckDB twin of :func:`ccnet_buckets` — kn_surprisal_sql's
    scores, score_percentile's strictly-below CDF, the same integer
    third-cut."""
    kn = kn_surprisal_sql(
        docs_sql, id_col, text_col, discount4, quant_bits
    )
    return f"""
WITH __scored AS MATERIALIZED (
  SELECT k.{id_col}, d.{group_col},
         CAST(k.kn_q * 1000 // k.n_bigrams AS BIGINT) AS bpb_q
  FROM ({kn}) k JOIN {docs_sql} d USING ({id_col})),
__cdf AS (
  SELECT {group_col}, bpb_q,
         COALESCE(SUM(__cnt) OVER (
           PARTITION BY {group_col} ORDER BY bpb_q
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS __below,
         SUM(__cnt) OVER (PARTITION BY {group_col}) AS __n
  FROM (SELECT {group_col}, bpb_q, COUNT(*) AS __cnt
        FROM __scored GROUP BY 1, 2)),
__pct AS (
  SELECT t.{id_col}, t.{group_col}, t.bpb_q,
         CAST(__below * 1000000 // __n AS BIGINT) AS pct_ppm
  FROM __scored t JOIN __cdf USING ({group_col}, bpb_q))
SELECT {id_col}, {group_col}, bpb_q, pct_ppm,
       CASE WHEN pct_ppm * 3 < 1000000 THEN 'head'
            WHEN pct_ppm * 3 < 2000000 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM __pct
"""
