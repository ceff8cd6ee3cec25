"""WordPiece tokenizer TRAINING as a fixed-round Spark plan — the
THIRD mainstream subword family beside byte-BPE (operators/bpe.py)
and unigram-LM (operators/unigram.py), completing the trainer set a
training-data pipeline actually chooses between (GPT-style byte-BPE,
T5/LLaMA-style unigram, BERT-style WordPiece).

WordPiece (Schuster & Nakajima 2012; the BERT trainer popularized by
the HuggingFace ``tokenizers`` WordPiece trainer) differs from BPE in
exactly ONE training decision: the round winner is the adjacent pair
with the highest LIKELIHOOD score

    score(a, b) = count(a b) / (count(a) * count(b))

(the pair whose merge most increases corpus likelihood under a
unigram LM), not the highest raw count. Everything else — the
(word, freq) frame, byte-hex symbols, left-to-right replace — reuses
bpe.py's machinery, so the 100 TB shape is identical: ONE corpus
scan builds word_freqs, every round runs on the vocab-bounded
distinct-word frame (Heaps' law), and per-round localCheckpoints
keep plan depth constant.

Engine-exact score arithmetic (no floats anywhere): the score is
ranked through the int64 quantization

    score_q = (cnt_ab * 2^SCORE_BITS) div (cnt_a * cnt_b)

computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so the
denominator cannot overflow at any corpus size (cnt <= ~1e12 at
100 TB keeps cnt_a*cnt_b <= 1e24 << 1e38); integral division is
bit-identical across engines and Python ``//`` (probed), so the
distributed form, the DuckDB unrolled-CTE twin and the local-finish
loop pick the SAME winner every round. Ties (exact-rational ties,
plus scores closer than 2^-SCORE_BITS — strictly more deterministic
than the float64 scores real trainers use) break by (pair_a, pair_b)
ascending in all three.

INFERENCE is where WordPiece departs from BPE a second time: applying
the tokenizer is greedy LONGEST-MATCH-FIRST over the final piece
vocabulary (BERT's ``max_len`` wordpiece algorithm), not merge-rule
replay. :func:`wordpiece_segment` implements that walk with the
unigram_segment discipline (winner table + fold walk in Spark, a
recursive CTE in DuckDB), over the hex-byte alphabet so any UTF-8
input is representable; words the vocab cannot cover are dropped
fail-closed exactly like unigram_segment (real WordPiece emits
[UNK] — a count-distorting placeholder a token-budget pipeline must
not silently ingest; the dropped-word count is the caller's signal).

Reference parity note: the reference repo has no tokenizer at all
(its text op is row-at-a-time Turtle escaping,
``/root/reference/umls2rdf.py:103-116``); this module exists for the
LLM-pipeline surface and follows the engine's iterative-fixpoint
discipline (operators/bpe.py, operators/unigram.py).
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, functions as F

from umls2rdf_spark.operators.bpe import (
    _SEG_DUCK,
    _SEG_SPARK,
    _pair_counts,
    word_freqs,
    word_freqs_sql,
)

#: quantization scale for the likelihood score (module docstring)
SCORE_BITS = 40
_SCALE = 1 << SCORE_BITS

#: above this round count :func:`train_wordpiece` defaults to the
#: local-finish path (3 eager jobs/round distributed vs one collect —
#: the bpe.py LOCAL_FINISH_ROUNDS argument, one job heavier per round
#: here because symbol counts join the pair counts)
LOCAL_FINISH_ROUNDS = 64

#: driver-collect ceiling for the local-finish path — same
#: adversarial-vocabulary valve as bpe.MAX_LOCAL_FINISH_WORDS
MAX_LOCAL_FINISH_WORDS = 20_000_000

#: merge-table schema: bpe's plus the quantized likelihood score
_WP_MERGES_SCHEMA = (
    "round int, pair_a string, pair_b string, merged string, "
    "cnt bigint, score_q bigint"
)


def _symbol_counts(vocab: DataFrame) -> DataFrame:
    """freq-weighted occurrence count of every CURRENT symbol over
    the vocab frame — the unigram denominator of the WordPiece score
    (every position counts, same convention as _pair_counts)."""
    return (
        vocab.selectExpr("freq", "explode(split(seg, ' ')) AS sym")
        .groupBy("sym")
        .agg(F.expr("CAST(SUM(freq) AS BIGINT)").alias("scnt"))
    )


#: engine-shared quantized-score expression over (cnt, cnt_a, cnt_b)
_SCORE_SPARK = (
    f"CAST((CAST(cnt AS DECIMAL(20,0)) * {_SCALE}) div "
    "(CAST(cnt_a AS DECIMAL(20,0)) * CAST(cnt_b AS DECIMAL(20,0))) "
    "AS BIGINT)"
)


def _scored_pairs(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt, score_q): pair counts joined to both symbols'
    unigram counts with the quantized likelihood score. The symbol
    frame is vocab-bounded — broadcast twice (alias per side), so
    the only shuffle is each aggregation's own."""
    pairs = _pair_counts(vocab)
    syms = _symbol_counts(vocab)
    return (
        pairs.join(
            F.broadcast(syms.selectExpr("sym AS a", "scnt AS cnt_a")),
            "a",
        )
        .join(
            F.broadcast(syms.selectExpr("sym AS b", "scnt AS cnt_b")),
            "b",
        )
        .selectExpr("a", "b", "cnt", f"{_SCORE_SPARK} AS score_q")
    )


def train_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 4,
    local_finish: bool | None = None,
    min_word_freq: int = 1,
    max_collect_rows: int | None = MAX_LOCAL_FINISH_WORDS,
) -> tuple[DataFrame, DataFrame]:
    """One WordPiece training run, both artifacts: the merge table
    (round, pair_a, pair_b, merged, cnt, score_q) and the post-merge
    vocab segmentation (word, freq, seg).

    Same contract surface as bpe.train_bpe: ``local_finish`` None =
    auto (rounds > LOCAL_FINISH_ROUNDS); ``min_word_freq`` bounds
    training state under adversarial vocabularies (the HAVING valve,
    identical in the DuckDB twins); ``max_collect_rows`` guards the
    local-finish collect through a limit(N+1) probe that raises
    instead of OOM-ing the driver."""
    if local_finish is None:
        local_finish = rounds > LOCAL_FINISH_ROUNDS
    if local_finish:
        return _train_wordpiece_local_finish(
            df, text_col, rounds, min_word_freq, max_collect_rows
        )
    vocab = (
        word_freqs(df, text_col, min_word_freq)
        .withColumn("seg", F.expr(_SEG_SPARK.format(w="word")))
        .localCheckpoint(eager=False)
    )
    out: DataFrame | None = None
    for r in range(1, rounds + 1):
        top = (
            _scored_pairs(vocab)
            .orderBy(
                F.col("score_q").desc(),
                F.col("a").asc(),
                F.col("b").asc(),
            )
            .limit(1)
            .selectExpr(
                f"{r} AS round",
                "a AS pair_a",
                "b AS pair_b",
                "cnt",
                "score_q",
                "concat(substring(a, 1, length(a)-1), "
                "substring(b, 2)) AS merged",
            )
            # 1-row eager checkpoint: constant plan depth per round
            # (the bpe/pagerank lineage discipline)
            .localCheckpoint(eager=False)
        )
        out = top if out is None else out.unionByName(top)
        vocab = (
            vocab.crossJoin(
                F.broadcast(top.select("pair_a", "pair_b", "merged"))
            )
            .selectExpr(
                "word",
                "freq",
                "replace(seg, concat(pair_a, ' ', pair_b), merged)"
                " AS seg",
            )
            .localCheckpoint(eager=False)
        )
    assert out is not None
    return (
        out.select(
            "round", "pair_a", "pair_b", "merged", "cnt", "score_q"
        ),
        vocab,
    )


def train_wordpiece_merges(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 4,
    local_finish: bool | None = None,
    min_word_freq: int = 1,
) -> DataFrame:
    """Merge-table half of :func:`train_wordpiece` (bpe parity)."""
    merges, _ = train_wordpiece(
        df, text_col, rounds, local_finish, min_word_freq
    )
    return merges


def wordpiece_vocab_after(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 4,
    local_finish: bool | None = None,
    min_word_freq: int = 1,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Training-corpus segmentation after ``rounds`` merges:
    (word, freq, n_subwords) — ``sum(freq * n_subwords)`` is the
    corpus's post-WordPiece token count. Pass ``vocab`` to reuse an
    existing :func:`train_wordpiece` run."""
    if vocab is None:
        _, vocab = train_wordpiece(
            df, text_col, rounds, local_finish, min_word_freq
        )
    return vocab.select(
        "word",
        "freq",
        F.size(F.split("seg", " ")).alias("n_subwords"),
    )


def wordpiece_doc_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    rounds: int = 4,
    vocab: DataFrame | None = None,
    min_word_freq: int = 1,
) -> DataFrame:
    """Per-document token counts under the trained WordPiece
    vocabulary: (id, n_words, n_wp_tokens) — the bpe_doc_tokens
    shape for the third family: word-occurrence explode, broadcast
    join against the vocab-bounded segmentation (the MODEL side),
    map-side-combined per-doc sum."""
    if vocab is None:
        _, vocab = train_wordpiece(
            df, text_col, rounds, min_word_freq=min_word_freq
        )
    nsub = vocab.select(
        "word",
        F.size(F.split("seg", " ")).cast("bigint").alias("__ns"),
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
            F.sum("__ns").cast("bigint").alias("n_wp_tokens"),
        )
    )


# ---------------------------------------------------------------
# local-finish merge loop (production round counts)
# ---------------------------------------------------------------


def _score_q(cnt_ab: int, cnt_a: int, cnt_b: int) -> int:
    """Python twin of _SCORE_SPARK / the HUGEINT twin: exact
    arbitrary-precision integers, floor division."""
    return (cnt_ab * _SCALE) // (cnt_a * cnt_b)


def _wordpiece_merge_loop(
    words: list[tuple[str, int]], rounds: int
) -> tuple[list[tuple], list[tuple]]:
    """Heap-based WordPiece merge loop over an in-memory (word, freq)
    list, byte-for-byte equivalent to the distributed per-round form.

    The bpe._bpe_merge_loop lazy-invalidation discipline needs one
    strengthening here: a pair's score can change WITHOUT its own
    count changing (merging (a, b) shrinks cnt_a/cnt_b and creates
    cnt_m, moving the score of every pair CONTAINING a, b or m — and
    a shrinking denominator RAISES scores, so a stale-low heap entry
    would bury the true max). So beside re-pushing pairs whose count
    changed, every round re-pushes all current pairs containing a
    touched symbol (a ``sym -> pairs`` index, maintained
    incrementally); on pop an entry is accepted only if its stored
    score equals the pair's CURRENT score. Every live pair therefore
    always has a heap entry carrying its current score, so the popped
    maximum is the true (score_q DESC, a ASC, b ASC) winner.
    """
    segs: list[list[str]] = []
    freqs: list[int] = []
    for w, f in words:
        hx = w.encode("utf-8").hex().upper()
        segs.append([f"|{hx[i:i + 2]}|" for i in range(0, len(hx), 2)])
        freqs.append(int(f))

    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    scnt: dict[str, int] = {}
    sym_pairs: dict[str, set[tuple[str, str]]] = {}
    for wi, syms in enumerate(segs):
        f = freqs[wi]
        for s in syms:
            scnt[s] = scnt.get(s, 0) + f
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + f
            where.setdefault(p, set()).add(wi)
            sym_pairs.setdefault(p[0], set()).add(p)
            sym_pairs.setdefault(p[1], set()).add(p)

    def cur_score(p: tuple[str, str]) -> int:
        return _score_q(counts[p], scnt[p[0]], scnt[p[1]])

    heap = [(-cur_score(p), p[0], p[1]) for p in counts]
    heapq.heapify(heap)

    merge_rows: list[tuple] = []
    exhausted = False
    for r in range(1, rounds + 1):
        top = None
        while heap:
            negs, a, b = heapq.heappop(heap)
            if counts.get((a, b), 0) > 0 and cur_score((a, b)) == -negs:
                top = (a, b)
                break
        if top is None:
            exhausted = True
            break
        a, b = top
        m = a[:-1] + b[1:]
        merge_rows.append(
            (r, a, b, m, counts[(a, b)], cur_score((a, b)))
        )
        changed: set[tuple[str, str]] = set()
        for wi in sorted(where.get((a, b), ())):
            syms = segs[wi]
            f = freqs[wi]
            out: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            # symbol-count deltas (multiset diff per rewritten word)
            for s in syms:
                scnt[s] -= f
            for s in out:
                scnt[s] = scnt.get(s, 0) + f
            old_pairs = [
                (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
            ]
            new_pairs = [
                (out[i], out[i + 1]) for i in range(len(out) - 1)
            ]
            for p in old_pairs:
                counts[p] -= f
                changed.add(p)
            for p in new_pairs:
                counts[p] = counts.get(p, 0) + f
                changed.add(p)
            for p in set(old_pairs) - set(new_pairs):
                where[p].discard(wi)
            for p in set(new_pairs) - set(old_pairs):
                where.setdefault(p, set()).add(wi)
            segs[wi] = out
        # drop dead pairs / maintain the symbol index
        for p in changed:
            if counts.get(p, 0) <= 0:
                counts.pop(p, None)
                sym_pairs.get(p[0], set()).discard(p)
                sym_pairs.get(p[1], set()).discard(p)
            else:
                sym_pairs.setdefault(p[0], set()).add(p)
                sym_pairs.setdefault(p[1], set()).add(p)
        # re-push every pair whose score may have moved: count
        # changes, plus all pairs containing a touched symbol
        touched = set(changed)
        for s in (a, b, m):
            touched |= sym_pairs.get(s, set())
        for p in touched:
            if counts.get(p, 0) > 0:
                heapq.heappush(heap, (-cur_score(p), p[0], p[1]))

    if exhausted:
        vocab_rows: list[tuple] = []
    else:
        vocab_rows = [
            (w, freqs[i], " ".join(segs[i]))
            for i, (w, _f) in enumerate(words)
        ]
    return merge_rows, vocab_rows


def _train_wordpiece_local_finish(
    df: DataFrame,
    text_col: str,
    rounds: int,
    min_word_freq: int = 1,
    max_collect_rows: int | None = MAX_LOCAL_FINISH_WORDS,
) -> tuple[DataFrame, DataFrame]:
    """Local-finish WordPiece training: distributed word_freqs scan,
    guarded collect (limit(N+1) probe — the bpe valve), driver-side
    merge loop, createDataFrame results."""
    spark = df.sparkSession
    wf_df = word_freqs(df, text_col, min_word_freq)
    if max_collect_rows is not None:
        wf = wf_df.limit(max_collect_rows + 1).collect()
        if len(wf) > max_collect_rows:
            raise ValueError(
                f"train_wordpiece local-finish: word-frequency frame"
                f" exceeds max_collect_rows={max_collect_rows}"
                f" (adversarial or non-Heaps vocabulary); raise"
                f" min_word_freq (currently {min_word_freq}) to bound"
                f" training state, or raise max_collect_rows if driver"
                f" heap genuinely allows it"
            )
    else:
        wf = wf_df.collect()
    merge_rows, vocab_rows = _wordpiece_merge_loop(
        [(r["word"], r["freq"]) for r in wf], rounds
    )
    merges = spark.createDataFrame(merge_rows, _WP_MERGES_SCHEMA)
    vocab = spark.createDataFrame(
        vocab_rows, "word string, freq bigint, seg string"
    )
    return merges, vocab


# ---------------------------------------------------------------
# inference: greedy longest-match-first over the final vocabulary
# ---------------------------------------------------------------


def wordpiece_pieces(vocab: DataFrame) -> DataFrame:
    """The final piece inventory of a training run: every distinct
    symbol of the post-merge segmentation with its freq-weighted
    count, as (piece, cnt) where ``piece`` is the symbol's hex-byte
    CONTENT (pipes stripped — the longest-match walk operates on
    hex strings). Vocab-bounded by construction."""
    return (
        vocab.selectExpr("freq", "explode(split(seg, ' ')) AS sym")
        .groupBy("sym")
        .agg(F.expr("CAST(SUM(freq) AS BIGINT)").alias("cnt"))
        .selectExpr("replace(sym, '|', '') AS piece", "cnt")
    )


def wordpiece_segment(
    df: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    max_piece_bytes: int | None = None,
) -> DataFrame:
    """Greedy longest-match-first segmentation (the BERT WordPiece
    inference algorithm) of a corpus's distinct words under a
    (piece,) vocabulary of hex-byte strings: at each position take
    the LONGEST piece matching the remaining prefix, advance, repeat.

    Returns (word, freq, n_subwords). Words containing a byte
    sequence the vocab cannot cover at some offset are DROPPED
    fail-closed (module docstring — the unigram_segment contract;
    both engines stall the walk at the same offset).

    Plan shape: candidate substrings of hex(word) at byte-aligned
    offsets up to ``max_piece_bytes`` — the vocab-bounded distinct-
    word frame times O(n * max_len) — semi-joined to the broadcast
    piece table, per-position longest winner via row_number, then
    the unigram fold walk (one aggregate expression, no UDF).

    ``max_piece_bytes`` defaults to the inventory's OWN longest
    piece (a 1-row agg over the vocab-bounded model frame): a fixed
    cap below that silently excludes long fully-merged pieces from
    candidate generation, stalling the walk and dropping words the
    vocab covers — at production merge budgets whole words become
    single 15-25-byte pieces, so a hardcoded cap is a correctness
    trap, not a tuning knob. Pass an explicit value only to bound
    candidate fanout when the inventory is known to be short."""
    if max_piece_bytes is None:
        row = pieces.agg(
            F.max(F.length("piece")).alias("__m")
        ).collect()[0]
        # empty inventory -> any positive cap; the join yields no
        # candidates and every word drops fail-closed regardless
        max_piece_bytes = max(1, int((row["__m"] or 2) // 2))
    wf = word_freqs(df, text_col)
    # expr strings throughout (the unigram_segment rewrite): one
    # py4j round-trip per projection instead of per Column op.
    hexed = wf.selectExpr(
        "word",
        "freq",
        "upper(hex(encode(word, 'utf-8'))) AS hx",
    ).selectExpr("*", "CAST(length(hx) / 2 AS INT) AS __n")
    # byte-aligned candidates over the hex string: start byte s
    # (1-based), length l bytes -> substring(hx, 2s-1, 2l)
    cand = (
        hexed.selectExpr(
            "word", "freq", "hx", "__n",
            "explode(sequence(1, __n)) AS s",
        )
        .selectExpr(
            "word", "hx", "s",
            f"explode(sequence(1, least({max_piece_bytes},"
            " __n - s + 1))) AS l",
        )
        .selectExpr(
            "word", "hx", "s", "l",
            "substring(hx, 2*s - 1, 2*l) AS piece",
        )
        .join(F.broadcast(pieces.select("piece")), "piece")
    )
    best = (
        cand.selectExpr(
            "word", "s", "l",
            "row_number() OVER (PARTITION BY word, s"
            " ORDER BY l DESC) AS __rn",
        )
        .where("__rn = 1")
        .select("word", "s", "l")
    )
    winners = best.groupBy("word").agg(
        F.expr("map_from_entries(collect_list(struct(s, l)))").alias(
            "__m"
        )
    )
    seg = hexed.join(winners, "word")
    walk = (
        "aggregate(sequence(1, __n), "
        "struct(CAST(0 AS INT) AS pos, CAST(0 AS INT) AS cnt), "
        "(acc, _x) -> CASE WHEN acc.pos >= __n"
        " OR element_at(__m, acc.pos + 1) IS NULL THEN acc "
        "ELSE struct("
        "CAST(acc.pos + element_at(__m, acc.pos + 1) AS INT) AS pos, "
        "CAST(acc.cnt + 1 AS INT) AS cnt) END)"
    )
    # one walk copy in the plan (the unigram_segment discipline):
    # CollapseProject keeps the multi-referenced aggregate
    # un-inlined, halving the planned expression tree
    return (
        seg.selectExpr("word", "freq", "__n", f"{walk} AS __w")
        .selectExpr(
            "word", "freq", "__n",
            "__w.pos AS __pos",
            "__w.cnt AS n_subwords",
        )
        .where("__pos = __n")
        .select("word", "freq", "n_subwords")
    )


# ---------------------------------------------------------------
# DuckDB twins (unrolled-CTE discipline; dialect notes as bpe.py)
# ---------------------------------------------------------------

def _wp_round_ctes(
    docs_sql: str,
    text_col: str,
    rounds: int,
    min_word_freq: int = 1,
) -> list[str]:
    """Shared CTE chain: word freqs, byte segmentation, then per
    round pair counts (__p{r}), symbol counts (__s{r}), the scored
    deterministic top-1 (__m{r}) and the merged vocab (__v{r})."""
    seg0 = _SEG_DUCK.format(w="word")
    ctes = [
        "__wf AS MATERIALIZED ("
        + word_freqs_sql(docs_sql, text_col, min_word_freq)
        + ")",
        f"__v0 AS (SELECT word, freq, {seg0} AS seg FROM __wf)",
    ]
    for r in range(1, rounds + 1):
        prev = f"__v{r - 1}"
        ctes.append(
            f"""__p{r} AS (
  SELECT a, b, SUM(freq) AS cnt FROM (
    SELECT freq,
           unnest(list_slice(toks, 1, len(toks)-1)) AS a,
           unnest(list_slice(toks, 2, len(toks))) AS b
    FROM (SELECT freq, string_split(seg, ' ') AS toks FROM {prev})
  ) GROUP BY a, b)"""
        )
        ctes.append(
            f"""__s{r} AS (
  SELECT sym, SUM(freq) AS scnt FROM (
    SELECT freq, unnest(string_split(seg, ' ')) AS sym FROM {prev}
  ) GROUP BY sym)"""
        )
        ctes.append(
            f"""__m{r} AS (
  SELECT {r} AS round, a AS pair_a, b AS pair_b,
         CAST(cnt AS BIGINT) AS cnt, score_q,
         substring(a, 1, length(a)-1) || substring(b, 2) AS merged
  FROM (
    SELECT p.a, p.b, p.cnt,
           CAST((CAST(p.cnt AS HUGEINT) * {_SCALE}) //
                (CAST(sa.scnt AS HUGEINT) *
                 CAST(sb.scnt AS HUGEINT)) AS BIGINT) AS score_q
    FROM __p{r} p
    JOIN __s{r} sa ON p.a = sa.sym
    JOIN __s{r} sb ON p.b = sb.sym)
  ORDER BY score_q DESC, a ASC, b ASC LIMIT 1)"""
        )
        ctes.append(
            f"""__v{r} AS (
  SELECT v.word, v.freq,
         replace(v.seg, m.pair_a || ' ' || m.pair_b, m.merged) AS seg
  FROM {prev} v, __m{r} m)"""
        )
    return ctes


def train_wordpiece_merges_sql(
    docs_sql: str,
    text_col: str = "text",
    rounds: int = 4,
    min_word_freq: int = 1,
) -> str:
    """DuckDB twin of the merge table: the same fixed rounds unrolled
    as chained CTEs, every step the identical integer/string op, so
    the oracle value-verifies the training trajectory INCLUDING the
    quantized likelihood scores."""
    ctes = _wp_round_ctes(docs_sql, text_col, rounds, min_word_freq)
    unions = "\nUNION ALL\n".join(
        f"SELECT round, pair_a, pair_b, merged, cnt, score_q"
        f" FROM __m{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


def wordpiece_vocab_after_sql(
    docs_sql: str,
    text_col: str = "text",
    rounds: int = 4,
    min_word_freq: int = 1,
) -> str:
    """DuckDB twin of :func:`wordpiece_vocab_after`."""
    ctes = _wp_round_ctes(docs_sql, text_col, rounds, min_word_freq)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT word, freq,
       CAST(len(string_split(seg, ' ')) AS INT) AS n_subwords
FROM __v{rounds}"""
    )


def wordpiece_doc_tokens_sql(
    docs_sql: str,
    id_col: str,
    text_col: str = "text",
    rounds: int = 4,
    min_word_freq: int = 1,
) -> str:
    """DuckDB twin of :func:`wordpiece_doc_tokens`."""
    ctes = _wp_round_ctes(docs_sql, text_col, rounds, min_word_freq)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
__occ AS (
  SELECT {id_col}, u.w AS word
  FROM ({docs_sql}) AS __docs,
       UNNEST(list_filter(regexp_split_to_array({text_col}, '\\s+'),
              t -> t <> '')) AS u(w)),
__ns AS (
  SELECT word,
         CAST(len(string_split(seg, ' ')) AS BIGINT) AS ns
  FROM __v{rounds})
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(ns) AS BIGINT) AS n_wp_tokens
FROM __occ JOIN __ns USING (word)
GROUP BY {id_col}"""
    )


def wordpiece_segment_sql(
    docs_sql: str,
    text_col: str = "text",
    rounds: int = 4,
    max_piece_bytes: int | None = None,
    min_word_freq: int = 1,
) -> str:
    """DuckDB twin of :func:`wordpiece_segment` fed by the training
    chain's own final vocab (the __pieces CTE derived from
    __v{rounds} — the statement is self-contained, so an external
    piece table cannot be injected here; this twin exists to
    value-verify the trained model's own inference): byte-aligned
    candidates, longest winner per offset, recursive walk,
    fail-closed final filter. ``max_piece_bytes`` defaults to the
    inventory's own longest piece via a scalar subquery (the Spark
    side's 1-row agg)."""
    cap = (
        str(int(max_piece_bytes))
        if max_piece_bytes is not None
        else "(SELECT MAX(length(piece)) // 2 FROM __pieces)"
    )
    ctes = _wp_round_ctes(docs_sql, text_col, rounds, min_word_freq)
    ctes.append(
        f"""__pieces AS (
  SELECT DISTINCT replace(sym, '|', '') AS piece FROM (
    SELECT unnest(string_split(seg, ' ')) AS sym FROM __v{rounds}))"""
    )
    ctes.append(
        f"""__hx AS MATERIALIZED (
  SELECT word, freq, hex(word) AS hx,
         length(hex(word)) // 2 AS n
  FROM ({word_freqs_sql(docs_sql, text_col)}) AS __wfull)"""
    )
    ctes.append(
        f"""__wcand AS MATERIALIZED (
  SELECT h.word, s.s AS s, l.l AS l
  FROM __hx h,
       UNNEST(range(1, h.n + 1)) AS s(s),
       UNNEST(range(1, least({cap},
                             h.n - s.s + 1) + 1)) AS l(l)
  WHERE substring(h.hx, 2*s.s - 1, 2*l.l) IN
        (SELECT piece FROM __pieces))"""
    )
    ctes.append(
        """__wbest AS MATERIALIZED (
  SELECT word, s, l FROM (
    SELECT word, s, l,
           row_number() OVER (PARTITION BY word, s
                              ORDER BY l DESC) AS rn
    FROM __wcand) WHERE rn = 1)"""
    )
    ctes.append(
        """__wwalk AS (
  SELECT word, freq, n, CAST(0 AS BIGINT) AS pos,
         CAST(0 AS INT) AS cnt
  FROM __hx
  UNION ALL
  SELECT w.word, w.freq, w.n, w.pos + b.l,
         CAST(w.cnt + 1 AS INT)
  FROM __wwalk w
  JOIN __wbest b ON b.word = w.word AND b.s = w.pos + 1
  WHERE w.pos < w.n)"""
    )
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + """
SELECT word, freq, cnt AS n_subwords
FROM __wwalk WHERE pos = n"""
    )
