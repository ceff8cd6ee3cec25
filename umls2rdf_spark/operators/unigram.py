"""Unigram-LM (SentencePiece-style) subword tokenizer training — the
second mainstream tokenizer family beside BPE (operators/bpe.py):
instead of agglomerative pair merging, start from a LARGE seed vocab
of frequent substrings and iteratively re-estimate piece scores from
how the current model segments the corpus, pruning to the target
vocabulary (Kudo 2018, "Subword Regularization"; the SentencePiece
unigram trainer).

The reference has nothing in this family (its closest text op is
row-at-a-time Turtle escaping, ``/root/reference/umls2rdf.py:103``);
this module follows the engine's established tokenizer discipline
(bpe.py): corpus touched ONCE (word_freqs — the only data-sized
stage), every later frame vocab-bounded, every number int64 or a
driver-convention quantized log (the token_log_odds / surprisal
stance: log2 differs by ~1 ulp between libms; round() at 2^20
fractional bits makes weights engine-stable in practice).

Deterministic EM variant, stated precisely (both engines and the
plain-Python test replica implement EXACTLY this):

- **Seed**: every substring of every distinct word with length
  1..max_piece_len, occurrence-weighted by word freq (overlapping
  occurrences all count); keep the ``seed_size`` highest by
  (cnt DESC, piece ASC) plus ALL single characters (the coverage
  guarantee — segmentation can always advance).
- **Costs**: cost_q(piece) = round((log2(total + V) -
  log2(cnt + 1)) * 2^quant_bits) over the kept vocab (add-one
  smoothing: pruned-in single chars may have cnt 0).
- **E-step (segmentation)**: greedy lowest-average-cost-per-char.
  At each start offset the candidate pieces are every vocab piece
  matching there; the winner minimizes (cost_q * M) div len with
  M = lcm(1..max_piece_len) — exact integer comparison of
  cost_q/len — ties broken by (len DESC, piece ASC). The winner per
  (word, start) is computed NON-recursively (explode ⋈ vocab ⋈
  window argmin); the left-to-right walk then just follows
  precomputed winners. Greedy-by-score approximates Viterbi while
  staying expressible in BOTH engines without per-position DP
  unrolling: Spark walks via one ``aggregate`` lambda over a
  per-word (start → winner) map column; DuckDB walks via a
  recursive CTE joining the same winner table.
- **M-step**: piece usage counts from the segmentation (freq-
  weighted), prune to the ``vocab_size`` highest by (cnt DESC,
  piece ASC) plus all single chars, re-cost, repeat.

100 TB shape: word_freqs is the one corpus scan; candidates are
(distinct words × len × max_piece_len) — Heaps-bounded; the
per-round window partitions on (word, start) (fine-grained keys, no
skew pile-up); the winner map is one map-side-combined groupBy; the
walk is a pure column expression; usage counts another bounded
groupBy. Ranking windows run on the model-sized piece frame only.
Per-round ``localCheckpoint`` (lazy) keeps plan depth constant
(the bpe/pagerank lineage discipline) — and unlike BPE, rounds here
are intrinsically FEW (each round re-segments everything; practical
trainers run <10 EM rounds), so there is no serial-job bottleneck
and no local-finish variant is needed.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from umls2rdf_spark.operators.bpe import word_freqs, word_freqs_sql

UNIGRAM_QUANT_BITS = 20


def _lcm_upto(n: int) -> int:
    m = 1
    for i in range(2, n + 1):
        m = m * i // math.gcd(m, i)
    return m


def _candidates(wf: DataFrame, max_len: int) -> DataFrame:
    """(word, freq, s, l, piece): every substring occurrence of every
    distinct word, length 1..max_len, 1-based start offset s.

    selectExpr strings, not Column graphs: this chain is rebuilt per
    EM round (and per application walk), and each F.* call is a py4j
    round-trip while a selectExpr of any size is one (the
    minhash_signatures_mapside discipline). Same operators, same
    output."""
    return (
        wf.selectExpr("word", "freq", "CAST(length(word) AS INT) AS __n")
        .selectExpr("word", "freq", "__n", "explode(sequence(1, __n)) AS s")
        .selectExpr(
            "word",
            "freq",
            "s",
            f"explode(sequence(1, least({max_len}, __n - s + 1))) AS l",
        )
        .selectExpr("word", "freq", "s", "l", "substring(word, s, l) AS piece")
    )


def _with_costs(voc: DataFrame, quant_bits: int) -> DataFrame:
    """(piece, cnt) → (piece, cnt, cost_q): add-one-smoothed
    quantized negative log2 probability (the surprisal/token_log_odds
    quantization convention)."""
    tot = voc.agg(
        F.expr("CAST(SUM(cnt) AS BIGINT)").alias("__t"),
        F.expr("CAST(COUNT(1) AS BIGINT)").alias("__v"),
    )
    scale = 1 << quant_bits
    return voc.crossJoin(F.broadcast(tot)).selectExpr(
        "piece",
        "cnt",
        # the scale factor is forced DOUBLE (a bare SQL float literal
        # is DECIMAL) so the arithmetic is the same double math as the
        # old F.lit(float(scale)) Column graph
        "CAST(round((log2(CAST(__t + __v AS DOUBLE))"
        " - log2(CAST(cnt + 1 AS DOUBLE)))"
        f" * CAST({scale} AS DOUBLE)) AS BIGINT) AS cost_q",
    )


def unigram_segment(
    wf: DataFrame, model: DataFrame, max_piece_len: int
) -> DataFrame:
    """Segment the (word, freq) frame under a (piece, cost_q) model:
    greedy lowest-average-cost-per-char (module docstring).

    Words containing a character the model cannot represent (possible
    when applying a model to a NEW corpus, or when training used a
    ``min_word_freq`` cutoff) are DROPPED, identically in both
    engines: the walk stalls at the uncoverable offset and the final
    ``pos == length`` filter removes the word — the DuckDB twin's
    recursive walk stops at the same missing winner row. Fail-closed;
    union the new corpus's chars into the model to keep such words.

    Returns (word, freq, parts array<string>).
    """
    mult = _lcm_upto(max_piece_len)
    cand = _candidates(wf, max_piece_len).join(
        F.broadcast(model.select("piece", "cost_q")), "piece"
    )
    # expr strings throughout (one py4j round-trip each — this graph
    # is rebuilt per EM round and per application walk): same window,
    # same map, same aggregate-lambda walk as the old Column graph.
    best = (
        cand.selectExpr(
            "word",
            "s",
            "l",
            "piece",
            "row_number() OVER (PARTITION BY word, s ORDER BY"
            f" (cost_q * {mult}) div l ASC, l DESC, piece ASC) AS __rn",
        )
        .where("__rn = 1")
        .select("word", "s", "l", "piece")
    )
    winners = best.groupBy("word").agg(
        F.expr(
            "map_from_entries(collect_list("
            "struct(s, struct(l, piece))))"
        ).alias("__m")
    )
    seg = wf.join(winners, "word").selectExpr(
        "*", "CAST(length(word) AS INT) AS __n"
    )
    # stall (keep acc) when done OR when no winner exists at the
    # next offset — an uncoverable character; the pos == __n
    # filter below then drops the word, matching the DuckDB
    # twin's recursive walk stopping at the missing winner row
    walk = (
        "aggregate(sequence(1, __n), "
        "struct(CAST(0 AS INT) AS pos,"
        " CAST(array() AS array<string>) AS parts), "
        "(acc, _x) -> CASE WHEN acc.pos >= __n"
        " OR element_at(__m, acc.pos + 1) IS NULL THEN acc "
        "ELSE struct("
        "CAST(acc.pos + element_at(__m, acc.pos + 1).l AS INT) AS pos, "
        "concat(acc.parts,"
        " array(element_at(__m, acc.pos + 1).piece)) AS parts) END)"
    )
    # project the walk struct ONCE, extract fields in a second
    # select: CollapseProject keeps a multi-referenced non-cheap
    # expression un-inlined, so the plan carries ONE copy of the
    # walk tree instead of two — halves analysis/planning cost of
    # every round checkpoint (and of the application walks)
    return (
        seg.selectExpr("word", "freq", "__n", f"{walk} AS __w")
        .selectExpr(
            "word", "freq", "__w.pos AS __pos", "__w.parts AS parts",
            "__n",
        )
        .where("__pos = __n")
        .select("word", "freq", "parts")
    )


def unigram_lm_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 256,
    quant_bits: int = UNIGRAM_QUANT_BITS,
    min_word_freq: int = 1,
) -> DataFrame:
    """Train the unigram-LM tokenizer; returns the MODEL —
    (piece, cnt, cost_q) after ``rounds`` segment→recount→prune
    rounds — the artifact a pipeline persists (cnt = the final
    round's freq-weighted usage count; single chars are always
    retained, possibly at cnt 0).

    ``min_word_freq`` bounds TRAINING state under adversarial
    vocabularies: real corpora are Heaps-bounded, but boilerplate
    ids / random tails make every word distinct and the candidate
    frame corpus-sized (the SCALE.md 10x-perturbed finding).
    Training on words with freq >= N caps the frame at the
    N-or-more vocabulary while application (unigram_segment /
    unigram_vocab_after / unigram_doc_tokens) still covers the full
    corpus; words whose characters never reached training drop
    fail-closed, identically in both engines."""
    wf = (
        word_freqs(df, text_col)
        .where(F.col("freq") >= min_word_freq)
        .localCheckpoint(eager=False)
    )
    seed_counts = (
        _candidates(wf, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    chars = seed_counts.where(F.length("piece") == 1).select("piece")

    def prune(counts: DataFrame, keep: int) -> DataFrame:
        # top-`keep` by (cnt DESC, piece ASC) ∪ all single chars at
        # their (possibly zero) counts. orderBy+limit compiles to
        # TakeOrderedAndProject — per-partition partial top-K merged
        # on the driver — NOT a single-partition rank window (the
        # piece frame is substring-vocab-bounded, but at crawl scale
        # that is still millions of rows; a global window would
        # funnel them through one reducer)
        top = counts.orderBy(
            F.col("cnt").desc(), F.col("piece").asc()
        ).limit(keep)
        char_cnt = chars.join(counts, "piece", "left").select(
            "piece", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
        )
        return (
            top.unionByName(char_cnt)
            .groupBy("piece")
            .agg(F.max("cnt").cast("bigint").alias("cnt"))
        )

    voc = _with_costs(prune(seed_counts, seed_size), quant_bits)
    voc = voc.localCheckpoint(eager=False)
    for _ in range(rounds):
        seg = unigram_segment(wf, voc, max_piece_len)
        use = (
            seg.select("freq", F.explode("parts").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        voc = _with_costs(prune(use, vocab_size), quant_bits)
        voc = voc.localCheckpoint(eager=False)
    return voc.select("piece", "cnt", "cost_q")


def unigram_vocab_after(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 256,
    quant_bits: int = UNIGRAM_QUANT_BITS,
    model: DataFrame | None = None,
    min_word_freq: int = 1,
) -> DataFrame:
    """The application half: per-word segmentation size under the
    trained model — (word, freq, n_pieces) over the FULL corpus
    vocabulary (the training cutoff, if any, does not restrict
    application; uncoverable words drop fail-closed).
    ``sum(freq * n_pieces)`` is the corpus's post-tokenizer token
    count (the bpe_vocab_after counterpart). Pass ``model`` to reuse
    an existing training run."""
    if model is None:
        model = unigram_lm_train(
            df,
            text_col,
            vocab_size,
            rounds,
            max_piece_len,
            seed_size,
            quant_bits,
            min_word_freq,
        )
    wf = word_freqs(df, text_col)
    return unigram_segment(wf, model, max_piece_len).select(
        "word",
        "freq",
        F.size("parts").cast("int").alias("n_pieces"),
    )


# ---------------------------------------------------------------
# DuckDB twins — the same trajectory as chained CTEs; the walk is a
# recursive CTE joining the same non-recursive winner table the
# Spark side puts in its per-word map (probed: DuckDB 1.0 list
# lambdas cannot carry struct accumulators, recursion can).
# ---------------------------------------------------------------


def _cand_sql(wf_cte: str, max_len: int) -> str:
    """Candidate substrings of the (word, freq) CTE ``wf_cte``."""
    return f"""
  SELECT word, freq, s.s AS s, l.l AS l,
         substring(word, s.s, l.l) AS piece
  FROM {wf_cte},
       UNNEST(range(1, length(word) + 1)) AS s(s),
       UNNEST(range(1, least({max_len},
                             length(word) - s.s + 1) + 1)) AS l(l)"""


def _costs_sql(counts_cte: str, quant_bits: int) -> str:
    scale = 1 << quant_bits
    return f"""
  SELECT piece, cnt,
         CAST(round((log2(CAST(__t + __v AS DOUBLE))
                     - log2(CAST(cnt + 1 AS DOUBLE)))
                    * {float(scale)}) AS BIGINT) AS cost_q
  FROM {counts_cte}
  CROSS JOIN (SELECT CAST(SUM(cnt) AS BIGINT) AS __t,
                     CAST(COUNT(*) AS BIGINT) AS __v
              FROM {counts_cte})"""


def _prune_sql(counts_cte: str, keep: int) -> str:
    return f"""
  SELECT piece, CAST(MAX(cnt) AS BIGINT) AS cnt FROM (
    SELECT piece, cnt FROM (
      SELECT piece, cnt,
             row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rn
      FROM {counts_cte}) WHERE rn <= {keep}
    UNION ALL
    SELECT c.piece, COALESCE(u.cnt, 0) AS cnt
    FROM __chars c LEFT JOIN {counts_cte} u USING (piece)
  ) GROUP BY piece"""


def _round_ctes_unigram(
    docs_sql: str,
    text_col: str,
    vocab_size: int,
    rounds: int,
    max_len: int,
    seed_size: int,
    quant_bits: int,
    min_word_freq: int = 1,
) -> list[str]:
    mult = _lcm_upto(max_len)
    ctes = [
        f"__wfall AS MATERIALIZED ({word_freqs_sql(docs_sql, text_col)})",
        "__wf AS MATERIALIZED (SELECT * FROM __wfall"
        f" WHERE freq >= {min_word_freq})",
        f"__cand AS MATERIALIZED ({_cand_sql('__wf', max_len)})",
        """__seedcnt AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM __cand GROUP BY piece)""",
        """__chars AS (
  SELECT DISTINCT piece FROM __seedcnt WHERE length(piece) = 1)""",
        f"__p0 AS MATERIALIZED ({_prune_sql('__seedcnt', seed_size)})",
        f"__voc0 AS MATERIALIZED ({_costs_sql('__p0', quant_bits)})",
    ]
    for r in range(1, rounds + 1):
        prev = f"__voc{r - 1}"
        ctes.append(
            f"""__best{r} AS MATERIALIZED (
  SELECT word, s, l, piece FROM (
    SELECT c.word, c.s, c.l, c.piece,
           row_number() OVER (
             PARTITION BY c.word, c.s
             ORDER BY (v.cost_q * {mult}) // c.l ASC,
                      c.l DESC, c.piece ASC) AS rn
    FROM __cand c JOIN {prev} v USING (piece)
  ) WHERE rn = 1)"""
        )
        ctes.append(
            f"""__walk{r} AS (
  SELECT word, freq, CAST(0 AS BIGINT) AS pos,
         CAST([] AS VARCHAR[]) AS parts
  FROM __wf
  UNION ALL
  SELECT w.word, w.freq, w.pos + b.l,
         list_append(w.parts, b.piece)
  FROM __walk{r} w
  JOIN __best{r} b ON b.word = w.word AND b.s = w.pos + 1
  WHERE w.pos < length(w.word))"""
        )
        ctes.append(
            f"""__seg{r} AS MATERIALIZED (
  SELECT word, freq, parts FROM __walk{r}
  WHERE pos = length(word))"""
        )
        ctes.append(
            f"""__use{r} AS MATERIALIZED (
  SELECT u.piece AS piece, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM __seg{r}, UNNEST(parts) AS u(piece)
  GROUP BY u.piece)"""
        )
        ctes.append(
            f"__p{r} AS MATERIALIZED ({_prune_sql(f'__use{r}', vocab_size)})"
        )
        ctes.append(
            f"__voc{r} AS MATERIALIZED ({_costs_sql(f'__p{r}', quant_bits)})"
        )
    return ctes


def _final_walk_ctes(rounds: int, max_len: int) -> list[str]:
    """Application-walk CTEs under the FINAL vocab, over the FULL
    (unfiltered) word frame — a training min_word_freq cutoff never
    restricts application; words the final vocab cannot cover stall
    and are dropped by the pos == length filter (both engines)."""
    mult = _lcm_upto(max_len)
    return [
        f"__candF AS MATERIALIZED ({_cand_sql('__wfall', max_len)})",
        f"""__bestF AS MATERIALIZED (
  SELECT word, s, l, piece FROM (
    SELECT c.word, c.s, c.l, c.piece,
           row_number() OVER (
             PARTITION BY c.word, c.s
             ORDER BY (v.cost_q * {mult}) // c.l ASC,
                      c.l DESC, c.piece ASC) AS rn
    FROM __candF c JOIN __voc{rounds} v USING (piece)
  ) WHERE rn = 1)""",
        """__walkF AS (
  SELECT word, freq, CAST(0 AS BIGINT) AS pos,
         CAST([] AS VARCHAR[]) AS parts
  FROM __wfall
  UNION ALL
  SELECT w.word, w.freq, w.pos + b.l,
         list_append(w.parts, b.piece)
  FROM __walkF w
  JOIN __bestF b ON b.word = w.word AND b.s = w.pos + 1
  WHERE w.pos < length(w.word))""",
    ]


def unigram_lm_train_sql(
    docs_sql: str,
    text_col: str = "text",
    vocab_size: int = 64,
    rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 256,
    quant_bits: int = UNIGRAM_QUANT_BITS,
    min_word_freq: int = 1,
) -> str:
    """DuckDB twin of :func:`unigram_lm_train` — the identical
    trajectory unrolled as chained CTEs (the bpe/pagerank oracle
    discipline), value-verifying training dynamics."""
    ctes = _round_ctes_unigram(
        docs_sql,
        text_col,
        vocab_size,
        rounds,
        max_piece_len,
        seed_size,
        quant_bits,
        min_word_freq,
    )
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f"\nSELECT piece, cnt, cost_q FROM __voc{rounds}"
    )


def unigram_vocab_after_sql(
    docs_sql: str,
    text_col: str = "text",
    vocab_size: int = 64,
    rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 256,
    quant_bits: int = UNIGRAM_QUANT_BITS,
    min_word_freq: int = 1,
) -> str:
    """DuckDB twin of :func:`unigram_vocab_after`: one more
    segmentation walk under the FINAL vocab, over the full word
    frame."""
    ctes = _round_ctes_unigram(
        docs_sql,
        text_col,
        vocab_size,
        rounds,
        max_piece_len,
        seed_size,
        quant_bits,
        min_word_freq,
    ) + _final_walk_ctes(rounds, max_piece_len)
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + """
SELECT word, freq, CAST(len(parts) AS INT) AS n_pieces
FROM __walkF WHERE pos = length(word)"""
    )


def unigram_doc_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    vocab_size: int = 64,
    rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 256,
    quant_bits: int = UNIGRAM_QUANT_BITS,
    model: DataFrame | None = None,
    min_word_freq: int = 1,
) -> DataFrame:
    """Per-DOCUMENT token counts under the trained unigram-LM
    tokenizer: (id, n_words, n_unigram_tokens) — the C51
    (bpe_doc_tokens) counterpart for the second tokenizer family,
    and the number packing / token-budget / epoch-sizing decisions
    consume. One word-occurrence explode joined against the
    vocab-bounded per-word segmentation size (broadcast — the MODEL
    side, megabytes at web scale by Heaps' law), then a
    map-side-combined per-doc sum.

    Pass ``model`` to reuse an existing :func:`unigram_lm_train`
    run (the composed demo does — training executes once). The
    segmentation is computed for THIS corpus's words under the
    model, so unlike a word→count lookup table, words absent from
    the training corpus still segment (the single-char coverage
    guarantee) as long as their characters appeared in training;
    truly novel characters drop at the candidate join (fail-closed —
    union the new corpus's chars into the model to keep them).
    """
    if model is None:
        model = unigram_lm_train(
            df,
            text_col,
            vocab_size,
            rounds,
            max_piece_len,
            seed_size,
            quant_bits,
            min_word_freq,
        )
    wf = word_freqs(df, text_col)
    nsub = unigram_segment(wf, model, max_piece_len).select(
        "word", F.size("parts").cast("bigint").alias("__ns")
    )
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    occ = df.select(F.col(id_col), F.explode(toks).alias("word"))
    return (
        occ.join(F.broadcast(nsub), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("__ns").cast("bigint").alias("n_unigram_tokens"),
        )
    )


def unigram_doc_tokens_sql(
    docs_sql: str,
    id_col: str,
    text_col: str = "text",
    vocab_size: int = 64,
    rounds: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 256,
    quant_bits: int = UNIGRAM_QUANT_BITS,
    min_word_freq: int = 1,
) -> str:
    """DuckDB twin of :func:`unigram_doc_tokens` — the shared
    training CTE chain's final walk joined to the same
    word-occurrence unnest (the bpe_doc_tokens_sql shape)."""
    ctes = _round_ctes_unigram(
        docs_sql,
        text_col,
        vocab_size,
        rounds,
        max_piece_len,
        seed_size,
        quant_bits,
        min_word_freq,
    ) + _final_walk_ctes(rounds, max_piece_len)
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f""",
__ns AS (
  SELECT word, CAST(len(parts) AS BIGINT) AS ns
  FROM __walkF WHERE pos = length(word)),
__occ AS (
  SELECT {id_col}, u.w AS word
  FROM ({docs_sql}) AS __docs,
       UNNEST(list_filter(regexp_split_to_array({text_col}, '\\s+'),
              t -> t <> '')) AS u(w))
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(ns) AS BIGINT) AS n_unigram_tokens
FROM __occ JOIN __ns USING (word)
GROUP BY {id_col}"""
    )
