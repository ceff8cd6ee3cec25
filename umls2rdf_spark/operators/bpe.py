"""Byte-level BPE tokenizer TRAINING as a fixed-round Spark plan —
the missing front of the token-counting family (C9's whitespace +
BPE-ish regex counter consumes a tokenizer; this op trains one).

Why this lives in a training-data engine: every LLM pipeline trains
(or at least re-fits) a subword vocabulary on its own corpus, and at
100 TB the classic single-process trainers (Sennrich et al. 2016
``learn_bpe``; SentencePiece) cannot see the data. The reference has
nothing like it — its closest text op is the row-at-a-time Turtle
escaping (``/root/reference/umls2rdf.py:103-116``), re-expressed in
functions/text.py; this module follows the engine's iterative-
fixpoint discipline instead (operators/graphrank.py pagerank,
hierarchy.py transitive_closure).

The 100 TB shape — corpus touched ONCE, iterations vocab-bounded:

- one corpus scan builds the (word, freq) frame: the ONLY stage
  whose input grows with the data, and it is a map-side-combined
  groupBy on the word key (the classic word-count shape);
- every merge round then runs on the DISTINCT-WORD frame — bounded
  by vocabulary size (Heaps' law: ~1e6-1e7 rows for a web corpus,
  i.e. megabytes), NOT corpus size. Pair counting is a
  map-side-combined groupBy over that frame, weighted by ``freq``;
- the round's winning pair is a 1-row TakeOrdered frame (no global
  sort materializes) cross-joined back — broadcast by size — and
  applied with a plain left-to-right ``replace``;
- per-round ``localCheckpoint`` (lazy) keeps plan depth
  constant in the round count (the transitive_closure /pagerank
  lineage discipline).

Engine-exact semantics (so the DuckDB oracle can unroll the SAME
rounds as CTEs and value-verify training dynamics, not just shape):

- symbols are BYTES, rendered as uppercase hex (Spark
  ``hex(encode(word,'utf-8'))`` ≡ DuckDB ``hex(word)``), so the
  initial alphabet is the GPT-2-style byte alphabet and any UTF-8
  input is representable without an <unk>;
- a segmentation is a string of ``|``-wrapped symbols joined by
  single spaces (``"|6C| |6F| |77|"``). The wrap makes pair
  replacement boundary-safe: searching ``"|A| |B|"`` cannot match
  inside another symbol that merely ends with A or starts with B,
  and hex symbols never contain the delimiter;
- one round merges THE single most frequent adjacent pair
  (ties broken by (pair_a, pair_b) ascending — deterministic and
  identical in both engines' string collation over hex+pipe ASCII),
  replacing left-to-right non-overlapping occurrences — exactly the
  semantics of ``replace()`` in BOTH engines (probed: ``"a a a"``
  with pair (a,a) merges the first two, keeping the greedy
  leftmost-first behavior of reference BPE trainers);
- pair counts weight each word's pairs by its corpus frequency
  (training on the word-frequency table, not the raw corpus — the
  standard Sennrich formulation and the reason state stays
  vocab-bounded).

Returns the MERGE TABLE — (round, pair_a, pair_b, merged, cnt) —
which is what a pipeline persists: applying it to new text is k
chained ``replace`` calls (see :func:`segment_words`); the training
corpus's own post-merge segmentation is :func:`bpe_vocab_after`.
"""

from __future__ import annotations

import heapq

from pyspark.sql import Column, DataFrame, functions as F

#: above this round count :func:`train_bpe` defaults to the
#: LOCAL-FINISH path: the per-round distributed form runs 2 eager
#: jobs per merge, so a production 32k-merge vocab would be ~64k
#: SERIAL Spark jobs — hours of pure scheduler latency on a
#: megabytes-sized frame. The corpus-scale stage (word_freqs) stays
#: distributed either way; only the vocab-bounded merge loop moves
#: driver-side (bounded by Heaps' law — the same boundedness argument
#: surprisal weights and segment_words already rely on).
LOCAL_FINISH_ROUNDS = 64

#: hard ceiling on the (word, freq) rows the local-finish path will
#: collect to the driver. Heaps' law bounds REAL corpora well under
#: this, but adversarial vocabularies (boilerplate ids, random tails —
#: the SCALE.md 10x-perturbed finding that gave unigram_lm_train its
#: ``min_word_freq`` valve) make every word distinct and the frame
#: corpus-sized; 20M rows ≈ ~1-2 GB of driver heap is the documented
#: bound past which the trainer refuses and tells the caller to raise
#: ``min_word_freq`` instead of silently OOM-ing the driver.
MAX_LOCAL_FINISH_WORDS = 20_000_000

#: initial byte-level segmentation of ``word`` as a SQL expression
#: fragment (engine-shared shape; see module docstring)
_SEG_SPARK = (
    "concat('|', array_join(transform("
    "sequence(1, length(hex(encode({w}, 'utf-8'))) div 2), "
    "i -> substring(hex(encode({w}, 'utf-8')), 2*i-1, 2)), '| |'), '|')"
)


def word_freqs(
    df: DataFrame, text_col: str = "text", min_word_freq: int = 1
) -> DataFrame:
    """(word, freq) over whitespace-run tokens — the one
    corpus-sized stage; map-side-combined word-count shape.

    ``min_word_freq`` > 1 drops rarer words AFTER the count (a
    HAVING, pushed as a post-agg filter): the valve that keeps
    training state vocab-bounded under adversarial vocabularies
    (same contract as unigram.py's unigram_lm_train)."""
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    wf = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    if min_word_freq > 1:
        wf = wf.where(F.col("freq") >= min_word_freq)
    return wf


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """freq-weighted adjacent-pair counts over the vocab frame.

    Single-symbol words contribute no pairs (the ``size >= 2``
    guard; the oracle's parallel slice-unnest yields zero rows for
    them by construction — probed equivalent)."""
    # selectExpr strings (1 py4j round-trip each) — this graph is
    # rebuilt once per training round in BOTH bpe and wordpiece
    return (
        vocab.selectExpr("freq", "split(seg, ' ') AS toks")
        .where("size(toks) >= 2")
        .selectExpr(
            "freq",
            "explode(transform(sequence(1, size(toks)-1), "
            "i -> struct(element_at(toks, i) AS a, "
            "element_at(toks, i+1) AS b))) AS p",
        )
        .selectExpr("freq", "p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
    )


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 4,
    local_finish: bool | None = None,
    min_word_freq: int = 1,
) -> DataFrame:
    """Fixed-round byte-level BPE training; returns the merge table
    (round, pair_a, pair_b, merged, cnt) — ``rounds`` rows (fewer
    only if a round finds no pair at all).

    ``rounds`` is fixed so the oracle can unroll it; the operator
    itself takes any count — plan depth stays constant via the
    per-round checkpoint, and above LOCAL_FINISH_ROUNDS the merge
    loop runs driver-side on the collected vocab-bounded frame
    (see :func:`train_bpe`, incl. the ``min_word_freq`` valve).
    """
    merges, _ = train_bpe(
        df, text_col, rounds, local_finish, min_word_freq
    )
    return merges


def bpe_vocab_after(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 4,
    local_finish: bool | None = None,
    min_word_freq: int = 1,
) -> DataFrame:
    """The APPLICATION side of the same training run: the vocabulary
    segmentation after ``rounds`` merges — (word, freq, n_subwords)
    per distinct word. ``sum(freq * n_subwords)`` over it is the
    corpus's post-BPE token count, the number a data pipeline
    budgets epochs and packing with; the frame itself stays
    vocab-bounded at any corpus size (same argument as training)."""
    _, vocab = train_bpe(
        df, text_col, rounds, local_finish, min_word_freq
    )
    return vocab.select(
        "word",
        "freq",
        F.size(F.split("seg", " ")).alias("n_subwords"),
    )


#: merge-table schema shared by both training paths
_MERGES_SCHEMA = (
    "round int, pair_a string, pair_b string, merged string, cnt bigint"
)


def _bpe_merge_loop(
    words: list[tuple[str, int]], rounds: int
) -> tuple[list[tuple], list[tuple]]:
    """Heap-based BPE merge loop over an in-memory (word, freq) list —
    the standard incremental trainer (Sennrich et al. 2016
    ``learn_bpe``) with lazy heap invalidation, byte-for-byte
    equivalent to the distributed per-round form:

    - symbols are the same ``|XX|`` pipe-wrapped uppercase-hex byte
      tokens (list form of the ``seg`` string);
    - pair counts weight every ADJACENT POSITION by word freq
      (overlapping positions both count — _pair_counts semantics);
    - round winner = max by (cnt DESC, a ASC, b ASC); Python's str
      comparison on these hex+pipe ASCII strings is the identical
      binary collation both engines use;
    - replacement is a left-to-right non-overlapping scan — exactly
      ``replace()`` in both engines (the pipe wrap makes symbol
      alignment unambiguous, see module docstring);
    - pair exhaustion before ``rounds`` empties the vocab, replicating
      the distributed form's crossJoin-with-empty-top behavior.

    Returns (merge_rows, vocab_rows) as plain tuples.
    """
    segs: list[list[str]] = []
    freqs: list[int] = []
    for w, f in words:
        hx = w.encode("utf-8").hex().upper()
        segs.append([f"|{hx[i:i + 2]}|" for i in range(0, len(hx), 2)])
        freqs.append(int(f))

    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(segs):
        f = freqs[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + f
            where.setdefault(p, set()).add(wi)
    # every CURRENT positive count always has a matching heap entry
    # (pushed at init or at its last update); stale entries are
    # discarded on pop — the lazy-invalidation discipline
    heap = [(-c, a, b) for (a, b), c in counts.items()]
    heapq.heapify(heap)

    merge_rows: list[tuple] = []
    exhausted = False
    for r in range(1, rounds + 1):
        top = None
        while heap:
            negc, a, b = heapq.heappop(heap)
            if counts.get((a, b), 0) == -negc:
                top = (a, b, -negc)
                break
        if top is None:
            exhausted = True
            break
        a, b, cnt = top
        m = a[:-1] + b[1:]
        merge_rows.append((r, a, b, m, cnt))
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
        for p in changed:
            c = counts.get(p, 0)
            if c <= 0:
                counts.pop(p, None)
            else:
                heapq.heappush(heap, (-c, p[0], p[1]))

    if exhausted:
        # the distributed form crossJoins vocab with the EMPTY top
        # frame, so the vocab empties — replicated for strict parity
        vocab_rows: list[tuple] = []
    else:
        vocab_rows = [
            (w, freqs[i], " ".join(segs[i]))
            for i, (w, _f) in enumerate(words)
        ]
    return merge_rows, vocab_rows


def _train_bpe_local_finish(
    df: DataFrame,
    text_col: str,
    rounds: int,
    min_word_freq: int = 1,
    max_collect_rows: int | None = MAX_LOCAL_FINISH_WORDS,
) -> tuple[DataFrame, DataFrame]:
    """Local-finish training: the corpus-sized word_freqs scan stays
    distributed; the vocab-bounded (word, freq) frame is collected
    and merged driver-side in one pass — rounds Spark jobs become
    ONE, so a 32k-merge vocab is seconds of heap work instead of
    ~64k serial job round-trips.

    Heaps' law bounds the frame for REAL corpora, but that is an
    assumption, not a guarantee — adversarial vocabularies make
    every word distinct (the unigram finding), so the collect is
    guarded twice: ``min_word_freq`` caps the frame at the
    N-or-more vocabulary, and the collect itself runs through
    ``limit(max_collect_rows + 1)`` — ONE job, no pre-count — and
    raises (naming the valve) if the limit row arrives, so an
    unbounded frame can never reach driver heap."""
    spark = df.sparkSession
    wf_df = word_freqs(df, text_col, min_word_freq)
    if max_collect_rows is not None:
        wf = wf_df.limit(max_collect_rows + 1).collect()
        if len(wf) > max_collect_rows:
            raise ValueError(
                f"train_bpe local-finish: word-frequency frame exceeds"
                f" max_collect_rows={max_collect_rows} (adversarial or"
                f" non-Heaps vocabulary); raise min_word_freq (currently"
                f" {min_word_freq}) to bound training state, or raise"
                f" max_collect_rows if driver heap genuinely allows it"
            )
    else:
        wf = wf_df.collect()
    merge_rows, vocab_rows = _bpe_merge_loop(
        [(r["word"], r["freq"]) for r in wf], rounds
    )
    merges = spark.createDataFrame(merge_rows, _MERGES_SCHEMA)
    vocab = spark.createDataFrame(
        vocab_rows, "word string, freq bigint, seg string"
    )
    return merges, vocab


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 4,
    local_finish: bool | None = None,
    min_word_freq: int = 1,
    max_collect_rows: int | None = MAX_LOCAL_FINISH_WORDS,
) -> tuple[DataFrame, DataFrame]:
    """One training run, both artifacts: (merge table, post-merge
    vocab segmentation) — callers composing both sections use this
    so the eager per-round jobs execute once.

    ``local_finish`` picks the merge-loop execution (None = auto:
    rounds > LOCAL_FINISH_ROUNDS). Both paths compute the SAME
    artifacts — the distributed per-round form stays the default for
    small round counts and is what the DuckDB oracle unrolls; the
    local-finish form is the production path for realistic merge
    counts, where per-round scheduler latency (2 eager jobs × rounds)
    would dominate a vocab-bounded computation (equality is
    property-tested for rounds ∈ {4, 64, 512}).

    ``min_word_freq`` bounds TRAINING state under adversarial
    vocabularies (the unigram_lm_train contract): training sees only
    words with freq >= N, identically on both paths and in the
    DuckDB twins; vocab-side outputs (bpe_vocab_after /
    bpe_doc_tokens) then drop the rarer words fail-closed — full
    coverage of a scored corpus is :func:`segment_words`, whose merge
    rules apply to any word. ``max_collect_rows`` additionally caps
    what the local-finish path may collect (see
    :func:`_train_bpe_local_finish`)."""
    if local_finish is None:
        local_finish = rounds > LOCAL_FINISH_ROUNDS
    if local_finish:
        return _train_bpe_local_finish(
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
            _pair_counts(vocab)
            .orderBy(
                F.col("cnt").desc(),
                F.col("a").asc(),
                F.col("b").asc(),
            )
            .limit(1)
            .selectExpr(
                f"{r} AS round",
                "a AS pair_a",
                "b AS pair_b",
                "cnt",
                "concat(substring(a, 1, length(a)-1), "
                "substring(b, 2)) AS merged",
            )
            # 1 row: lazy-checkpointed, so the next round's vocab
            # plan references a literal-sized LogicalRDD, not the
            # previous round's full lineage; materialization rides
            # the next toRdd's stage jobs instead of a per-round
            # eager count
            .localCheckpoint(eager=False)
        )
        out = top if out is None else out.unionByName(top)
        vocab = (
            vocab.crossJoin(F.broadcast(top.select("pair_a", "pair_b", "merged")))
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
        out.select("round", "pair_a", "pair_b", "merged", "cnt"),
        vocab,
    )


def bpe_doc_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    rounds: int = 4,
    vocab: DataFrame | None = None,
    min_word_freq: int = 1,
) -> DataFrame:
    """Per-DOCUMENT token counts under the trained tokenizer:
    (id, n_words, n_bpe_tokens) — the number every packing /
    token-budget / epoch-sizing decision actually consumes (C9's
    token_count is the whitespace proxy; this is the real
    tokenizer's count). One word-occurrence explode joined against
    the vocab-bounded segmentation (broadcast — the vocab frame is
    the MODEL side, megabytes at web scale by Heaps' law), then a
    map-side-combined per-doc sum.

    Pass ``vocab`` to reuse an existing :func:`train_bpe` run (the
    composed demo does — training executes once). Words absent from
    the vocab are dropped by the inner join; when scoring a corpus
    the tokenizer was NOT trained on, segment the new corpus's
    words with :func:`segment_words` (merge rules apply to any
    word) and pass that as ``vocab``.
    """
    if vocab is None:
        _, vocab = train_bpe(
            df, text_col, rounds, min_word_freq=min_word_freq
        )
    nsub = vocab.select(
        "word", F.size(F.split("seg", " ")).cast("bigint").alias("__ns")
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
            F.sum("__ns").cast("bigint").alias("n_bpe_tokens"),
        )
    )


def bpe_doc_tokens_sql(
    docs_sql: str,
    id_col: str,
    text_col: str = "text",
    rounds: int = 4,
    min_word_freq: int = 1,
) -> str:
    """DuckDB twin of :func:`bpe_doc_tokens` — the shared training
    CTE chain's final vocab joined to the same word-occurrence
    unnest."""
    ctes = _round_ctes(docs_sql, text_col, rounds, min_word_freq)
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
       CAST(SUM(ns) AS BIGINT) AS n_bpe_tokens
FROM __occ JOIN __ns USING (word)
GROUP BY {id_col}"""
    )


#: replaces fused into one projection by :func:`segment_words`.
#: Each F.replace nests one level deeper in the Column tree, and both
#: the Python→JVM column conversion and Catalyst's tree recursion
#: overflow the JVM stack somewhere past ~400 levels (observed:
#: StackOverflowError at 512). Production merge tables are ~32k rows,
#: so application is CHUNKED: `_SEGMENT_CHUNK` replaces per select,
#: with a lazy localCheckpoint barrier between chunks so
#: CollapseProject cannot re-fuse them into one over-deep expression.
_SEGMENT_CHUNK = 128


def segment_words(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained merge table to a corpus: per-word final
    segmentation + subword token count. ``merges`` is collected —
    it is the MODEL (k rows by construction), the one frame of the
    family that is driver-sized at any corpus scale — and applied
    as chained column-level replaces (no UDF, scan-speed), chunked
    ``_SEGMENT_CHUNK`` per projection with lazy checkpoint barriers
    so a 32k-merge model stays within JVM expression-depth limits.
    """
    rows = sorted(
        merges.select("round", "pair_a", "pair_b", "merged").collect(),
        key=lambda x: x["round"],
    )
    wf = word_freqs(df, text_col)
    out = wf.select(
        "word",
        "freq",
        F.expr(_SEG_SPARK.format(w="word")).alias("seg"),
    )
    for i in range(0, len(rows), _SEGMENT_CHUNK):
        seg: Column = F.col("seg")
        for m in rows[i:i + _SEGMENT_CHUNK]:
            seg = F.replace(
                seg,
                F.lit(f"{m['pair_a']} {m['pair_b']}"),
                F.lit(m["merged"]),
            )
        out = out.select("word", "freq", seg.alias("seg"))
        if i + _SEGMENT_CHUNK < len(rows):
            # lazy barrier: materializes once at the first action,
            # keeps every compiled plan ≤ _SEGMENT_CHUNK replaces deep
            out = out.localCheckpoint(eager=False)
    return out.withColumn("n_subwords", F.size(F.split("seg", " ")))


# ---------------------------------------------------------------
# DuckDB twins (generated from the same shapes; dialect notes:
# generate_series(1,0) is EMPTY in DuckDB vs descending in Spark —
# the Spark side guards with size>=2, the DuckDB side pairs via
# parallel slice-unnest which zips positionally and is empty for
# single-symbol words, probed equivalent).
# ---------------------------------------------------------------

_SEG_DUCK = (
    "'|' || array_to_string(list_transform("
    "generate_series(1, length(hex({w}))//2), "
    "i -> substring(hex({w}), 2*i-1, 2)), '| |') || '|'"
)


def word_freqs_sql(
    docs_sql: str, text_col: str = "text", min_word_freq: int = 1
) -> str:
    having = (
        f"\nHAVING COUNT(*) >= {int(min_word_freq)}"
        if min_word_freq > 1
        else ""
    )
    return f"""
SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
FROM (
  SELECT unnest(list_filter(
           regexp_split_to_array({text_col}, '\\s+'),
           t -> t <> '')) AS word
  FROM ({docs_sql}) AS __docs
) AS __w
GROUP BY word{having}
"""


def _round_ctes(
    docs_sql: str,
    text_col: str,
    rounds: int,
    min_word_freq: int = 1,
) -> list[str]:
    """Shared CTE chain for both oracle twins: word freqs (after the
    same ``min_word_freq`` HAVING as the operator), initial byte
    segmentation, then per round the pair counts (__p{r}),
    deterministic top-1 (__m{r}) and merged vocab (__v{r})."""
    seg0 = _SEG_DUCK.format(w="word")
    ctes = [
        f"__wf AS ({word_freqs_sql(docs_sql, text_col, min_word_freq)})",
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
            f"""__m{r} AS (
  SELECT {r} AS round, a AS pair_a, b AS pair_b,
         CAST(cnt AS BIGINT) AS cnt,
         substring(a, 1, length(a)-1) || substring(b, 2) AS merged
  FROM __p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)"""
        )
        ctes.append(
            f"""__v{r} AS (
  SELECT v.word, v.freq,
         replace(v.seg, m.pair_a || ' ' || m.pair_b, m.merged) AS seg
  FROM {prev} v, __m{r} m)"""
        )
    return ctes


def train_bpe_merges_sql(
    docs_sql: str,
    text_col: str = "text",
    rounds: int = 4,
    min_word_freq: int = 1,
) -> str:
    """The same fixed rounds unrolled as chained CTEs — pair counts,
    deterministic top-1, left-to-right replace — every step the
    identical string/integer op, so the oracle value-verifies the
    training trajectory (the pagerank_sql / Lloyd-CTE discipline).
    """
    ctes = _round_ctes(docs_sql, text_col, rounds, min_word_freq)
    unions = "\nUNION ALL\n".join(
        f"SELECT round, pair_a, pair_b, merged, cnt FROM __m{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


def bpe_vocab_after_sql(
    docs_sql: str,
    text_col: str = "text",
    rounds: int = 4,
    min_word_freq: int = 1,
) -> str:
    """DuckDB twin of :func:`bpe_vocab_after`: the final __v{rounds}
    vocab CTE with the subword count (list length of the space-split
    segmentation — identical in both engines)."""
    ctes = _round_ctes(docs_sql, text_col, rounds, min_word_freq)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT word, freq,
       CAST(len(string_split(seg, ' ')) AS INT) AS n_subwords
FROM __v{rounds}"""
    )
