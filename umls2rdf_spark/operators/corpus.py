"""Corpus-preparation operators for training-data pipelines:
document chunking, benchmark decontamination, deterministic
stratified sampling.

All pure Catalyst expressions / joins — no UDFs — so they run at
scan/shuffle speed on a 100 TB corpus. Determinism rule (same as
split_assign): anything sampling-like keys off stable_hash40 of the
id, never random(), so results are reproducible across runs,
engines, partitionings and data order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import stable_hash40
from umls2rdf_spark.operators.dedup import shingle_rows
from umls2rdf_spark.operators.spread import spread_small_input


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-tokenization step for long-context training data.

    Output: (id, chunk_idx, chunk_text, n_tokens), one row per
    window; stride = chunk_tokens - overlap; the final partial window
    is kept (a document shorter than one chunk yields one row).
    Array slicing happens map-side on the already-split token array —
    the explode multiplies rows, never re-tokenizes.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    with_t = df.select(F.col(id_col), toks.alias("__t"))
    # window start offsets: 0, stride, 2*stride, ... < size (always
    # at least one window, even for empty docs)
    starts = F.expr(
        f"sequence(0, greatest(size(__t) - 1, 0), {stride})"
    )
    exploded = with_t.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "start"),
        F.col("__t"),
    )
    # keep windows that start within the document, except the
    # degenerate repeat when the last stride lands exactly at size
    window = F.slice(F.col("__t"), F.col("start") + 1, chunk_tokens)
    return (
        exploded.where(
            (F.col("start") == 0) | (F.col("start") < F.size("__t"))
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            F.concat_ws(" ", window).alias("chunk_text"),
            F.size(window).cast("bigint").alias("n_tokens"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    shingle_n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Test-set decontamination: flag corpus documents sharing at
    least ``min_shared`` distinct word ``shingle_n``-grams with any
    benchmark document (the published n-gram-overlap procedure used
    for LLM training sets; 8-13-gram overlap is the common range).

    Shape: shingle both sides (map-side explode), inner join on the
    shingle with the benchmark side broadcast-hinted — post-explode
    stats are unknown to Catalyst, and a sort-merge join would
    shuffle the ENTIRE corpus shingle set; the hint pins the plan
    that never moves the corpus.
    Returns (id, bench_id, n_shared) for flagged pairs; anti-join the
    corpus against it to drop contaminated documents.
    """
    cs = shingle_rows(
        spread_small_input(corpus, id_col), id_col, text_col, shingle_n
    ).distinct()
    bs = (
        shingle_rows(benchmark, bench_id_col, bench_text_col, shingle_n)
        .distinct()
        .withColumnRenamed(bench_id_col, "bench_id")
    )
    shared = (
        cs.join(F.broadcast(bs), "shingle")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return shared


def _distinct_shingle_arr(text_col: str, n: int) -> str:
    """SQL fragment: the DISTINCT word ``n``-gram shingle array of
    ``text_col``, built map-side (one expression — no pre-shuffle for
    either the per-doc shingle size or the explode).

    The token array is bound as a LAMBDA VARIABLE of a 1-element
    outer ``transform`` rather than a projected alias column: an
    alias is fair game for CollapseProject/filter-pushdown inlining,
    and in a large composed plan that inlining re-evaluates
    ``filter(split(text))`` PER SHINGLE SUBSCRIPT — caught by thread
    dump at 100x as a single task grinding interpreted StringSplit
    for 15+ minutes (the hazard shingle_rows' docstring documents).
    A lambda variable cannot be substituted, so the tokenization
    runs exactly once per row in every plan context. Single-space
    tokenization (the shingle_rows convention)."""
    parts = ", ".join(f"w[i+{j}]" for j in range(n))
    return (
        "array_distinct(flatten(transform("
        f"array(filter(split({text_col}, ' '), t -> t != '')), "
        f"w -> CASE WHEN size(w) >= {n} THEN "
        f"transform(sequence(0, size(w)-{n}), "
        f"i -> concat_ws(' ', {parts})) "
        "ELSE array() END)))"
    )


def decontaminate_lexical(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    shingle_n: int = 3,
    min_jaccard: float = 0.5,
    min_bench_containment: float = 0.8,
    candidates: DataFrame | None = None,
    bench_max_df: int | None = None,
) -> DataFrame:
    """FUZZY lexical benchmark decontamination — the near-duplicate
    complement of :func:`decontaminate`'s exact n-gram hit count:
    a corpus document is contaminated when its word-shingle JACCARD
    against any benchmark document reaches ``min_jaccard``, OR when
    it CONTAINS a benchmark document (``inter / |bench shingles| >=
    min_bench_containment`` — the Broder-asymmetric signal: a doc
    quoting a whole benchmark item verbatim has Jaccard ≈
    |bench|/|doc| ≈ 0 but bench-containment ≈ 1, so a Jaccard-only
    threshold ships the leak). Completes the decontamination matrix:
    exact n-gram (decontaminate), constant-size index
    (decontaminate_bloom), semantic (decontaminate_embeddings),
    fuzzy-lexical (this).

    Returns one row per corpus document: (id, max_jaccard,
    max_bench_containment, keep) — NULL maxes for documents sharing
    no shingle with any benchmark doc (kept; empty benchmark = keep
    everything, the fail-open-vs-vanish convention of
    decontaminate_embeddings).

    100 TB shape: benchmark suites are bounded by nature, so the
    bench shingles broadcast; the corpus side is ONE scan whose
    per-row shingling AND per-doc distinct-shingle size are computed
    map-side (array_distinct before the explode — no corpus-wide
    distinct() shuffle), and the only shuffles carry the MATCHED
    candidate rows plus one row per corpus doc. If the benchmark
    outgrows broadcast, pass ``candidates`` from
    :func:`lexical_decontam_candidates` (minhash-band join, neither
    side broadcast) — this exact form stays the recall baseline and
    the verify stage, restricted to those pairs.

    **Hot-shingle fanout valve** (measured: a 100x replica drives
    the shingle join to 1.08e9 rows at 500k docs because ubiquitous
    stop-word trigrams multiply on BOTH sides): ``bench_max_df``
    drops shingles whose benchmark document frequency exceeds the
    cap from the JOIN ONLY — per-doc sizes (the jaccard/containment
    denominators) are unchanged, so scores can only DECREASE and the
    valve is strictly fail-open (never a false flag; a leak detected
    only through ubiquitous shingles can be missed — those shingles
    carry no discriminative signal, which is also why exact
    decontamination uses 8-13-gram shingles; prefer raising
    ``shingle_n`` when the corpus allows it).
    """
    def shingled(df, idc, txt, out_id):
        return df.select(
            F.col(idc).alias(out_id),
            F.expr(_distinct_shingle_arr(txt, shingle_n)).alias("__sh"),
        )

    # the corpus side carries the heavy per-row work (shingle
    # explode + bench join) — spread a too-few-splits local read
    # before it, or one task chews the whole corpus x bench join
    # (measured: a single-file 500k-doc replica put a 1.08e9-row
    # join on one core; the shingle_rows/minhash discipline)
    corpus = spread_small_input(corpus, id_col)
    cs = shingled(corpus, id_col, text_col, id_col).select(
        F.col(id_col),
        F.size("__sh").alias("sz_a"),
        F.explode("__sh").alias("shingle"),
    )
    bs = shingled(
        benchmark, bench_id_col, bench_text_col, "__bid"
    ).select(
        "__bid",
        F.size("__sh").alias("sz_b"),
        F.explode("__sh").alias("shingle"),
    )
    if bench_max_df is not None:
        hot = (
            bs.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > bench_max_df)
            .select("shingle")
        )
        bs = bs.join(F.broadcast(hot), "shingle", "left_anti")
    if candidates is not None:
        # the scale path's whole point is that the bench side does
        # NOT broadcast: semi-join BOTH sides down to the candidate
        # ids first (bounding the shingle join to candidate docs),
        # then join plain (shuffle on the shingle key) and restrict
        # to the candidate PAIRS
        cand = candidates.select(
            F.col("id_a").alias(id_col), F.col("id_b").alias("__bid")
        )
        # no distinct on the id projections: left_semi is EXISTS
        # semantics, so duplicate right-side ids cannot multiply the
        # kept rows — the explicit dedup only added a full extra
        # shuffle of the rows the semi-join hashes anyway (guide
        # §2.4)
        cs = cs.join(cand.select(id_col), id_col, "left_semi")
        bs = bs.join(cand.select("__bid"), "__bid", "left_semi")
        pair_src = cs.join(bs, "shingle").join(
            cand, [id_col, "__bid"], "left_semi"
        )
    else:
        pair_src = cs.join(F.broadcast(bs), "shingle")
    inter = pair_src.groupBy(id_col, "__bid", "sz_a", "sz_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("inter")
    )
    scored = inter.select(
        F.col(id_col),
        (
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast(
                "double"
            )
        ).alias("__j"),
        (
            F.col("inter").cast("double") / F.col("sz_b").cast("double")
        ).alias("__bc"),
    )
    agg = scored.groupBy(id_col).agg(
        F.max("__j").alias("max_jaccard"),
        F.max("__bc").alias("max_bench_containment"),
    )
    return (
        corpus.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            "max_jaccard",
            "max_bench_containment",
            (
                (
                    F.col("max_jaccard").isNull()
                    | (F.col("max_jaccard") < F.lit(min_jaccard))
                )
                & (
                    F.col("max_bench_containment").isNull()
                    | (
                        F.col("max_bench_containment")
                        < F.lit(min_bench_containment)
                    )
                )
            ).alias("keep"),
        )
    )


def lexical_decontam_candidates(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    num_perm: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Scale path for :func:`decontaminate_lexical` when the
    benchmark side outgrows broadcast (decontaminating shard against
    shard, not corpus against eval suite): minhash-band signatures
    on BOTH sides, bucket-joined on (band signature) — neither side
    broadcast, never all-pairs — yielding candidate (id_a=corpus,
    id_b=bench) pairs for the exact verify. Fail-open only: a missed
    band collision can only UNDER-flag (the LSH-decontam contract);
    every returned pair is still exactly verified."""
    from umls2rdf_spark.operators.dedup import (
        band_signatures,
        minhash_signatures,
    )

    cs = minhash_signatures(
        corpus, id_col, text_col, num_perm=num_perm, shingle_n=shingle_n
    )
    bs = minhash_signatures(
        benchmark,
        bench_id_col,
        bench_text_col,
        num_perm=num_perm,
        shingle_n=shingle_n,
    )
    ca = band_signatures(cs, id_col, rows_per_band=1).select(
        F.col(id_col).alias("id_a"), "band", "band_sig"
    )
    cb = band_signatures(bs, bench_id_col, rows_per_band=1).select(
        F.col(bench_id_col).alias("id_b"), "band", "band_sig"
    )
    return ca.join(cb, ["band", "band_sig"]).select(
        "id_a", "id_b"
    ).distinct()


def decontaminate_lexical_sql(
    corpus_sql: str,
    bench_sql: str,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    shingle_n: int = 3,
    min_jaccard: float = 0.5,
    min_bench_containment: float = 0.8,
    bench_max_df: int | None = None,
) -> str:
    """DuckDB twin of :func:`decontaminate_lexical` (broadcast-exact
    form): the same map-side distinct-shingle arrays, the same
    int64 intersection counts and double ratios, and the same
    ``bench_max_df`` hot-shingle join valve (sizes untouched)."""

    def shingle_cte(src_sql, idc, txt, alias):
        parts = " || ' ' || ".join(
            f"f[i+{j}]" for j in range(shingle_n)
        )
        return f"""{alias} AS (
  SELECT {idc} AS id, list_distinct(
    CASE WHEN len(f) >= {shingle_n} THEN
      list_transform(generate_series(1, len(f) - {shingle_n - 1}),
                     i -> {parts})
    ELSE [] END) AS sh
  FROM (SELECT {idc},
               list_filter(string_split({txt}, ' '),
                           t -> t <> '') AS f
        FROM ({src_sql}) AS __src_{alias}))"""

    return f"""
WITH {shingle_cte(corpus_sql, id_col, text_col, '__ca')},
{shingle_cte(bench_sql, bench_id_col, bench_text_col, '__ba')},
__cs AS (
  SELECT id, len(sh) AS sz_a, unnest(sh) AS shingle FROM __ca),
__bs0 AS (
  SELECT id AS bid, len(sh) AS sz_b, unnest(sh) AS shingle FROM __ba),
__bs AS (
  SELECT * FROM __bs0{f'''
  WHERE shingle NOT IN (
    SELECT shingle FROM __bs0 GROUP BY shingle
    HAVING COUNT(*) > {int(bench_max_df)})'''
   if bench_max_df is not None else ''}),
__inter AS (
  SELECT c.id, b.bid, c.sz_a, b.sz_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM __cs c JOIN __bs b USING (shingle)
  GROUP BY 1, 2, 3, 4),
__agg AS (
  SELECT id,
         MAX(CAST(inter AS DOUBLE)
             / CAST(sz_a + sz_b - inter AS DOUBLE)) AS max_jaccard,
         MAX(CAST(inter AS DOUBLE)
             / CAST(sz_b AS DOUBLE)) AS max_bench_containment
  FROM __inter GROUP BY id)
SELECT c.{id_col} AS {id_col}, a.max_jaccard,
       a.max_bench_containment,
       ((a.max_jaccard IS NULL OR a.max_jaccard < {min_jaccard})
        AND (a.max_bench_containment IS NULL
             OR a.max_bench_containment
               < {min_bench_containment})) AS keep
FROM ({corpus_sql}) AS c
LEFT JOIN __agg a ON a.id = c.{id_col}
"""


def pack_sequences(
    df: DataFrame,
    id_col: str,
    ntok_col: str,
    seq_len: int,
    shards: int = 1024,
    order_col: str | None = None,
    persist: bool = True,
) -> DataFrame:
    """GPT-style sequence packing: concatenate every item's token
    stream in a canonical order and chop the stream into fixed
    ``seq_len`` windows — items cross sequence boundaries (the
    standard concat-and-chop used for LLM pre-training batches,
    zero padding waste).

    Canonical order is (shard, id[, order]) with shard =
    stable_hash40(id) mod ``shards`` — NOT a global sort: the
    cumulative token offset is computed per shard (window over the
    shard partition) and lifted to a global offset by adding
    per-shard totals (a ``shards``-row broadcast join), the classic
    two-level scan. No single-reducer stage anywhere, so the plan
    holds at any corpus size; results are independent of
    partitioning and row order because the order key is data, not
    placement.

    Output: the input columns plus one row per (item, sequence)
    overlap — ``seq_id`` (which training sequence), ``tok_start`` /
    ``tok_end`` (the half-open token slice of THIS item in that
    sequence) and ``seq_off`` (where the slice lands inside the
    sequence). Zero-token items are dropped. All integer arithmetic
    on Catalyst built-ins — sequence()/explode, no UDFs.

    Requires (id[, order]) to be unique per row: the cumulative sum
    is taken over that order, and duplicate keys with differing
    token counts would make the running offset tie-order-dependent.
    The output column names seq_id/tok_start/tok_end/seq_off are
    appended — input columns with those names would collide.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    from pyspark.sql import Window

    order_keys = [F.col(id_col)] + (
        [F.col(order_col)] if order_col else []
    )
    shard = F.pmod(
        stable_hash40(F.col(id_col).cast("string")), F.lit(shards)
    )
    base = df.where(F.col(ntok_col) > 0).withColumn("__shard", shard)
    w = (
        Window.partitionBy("__shard")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "__lb", F.coalesce(F.sum(ntok_col).over(w), F.lit(0))
    )
    if persist:
        # both the output and the shard-totals branch read this frame;
        # without the persist each branch recomputes the ENTIRE
        # upstream pipeline feeding `df` (per-branch column pruning
        # defeats exchange reuse). MEMORY_AND_DISK: spill, not OOM —
        # and at 100 TB you'd materialize the packed table anyway.
        # persist=False keeps the plan fully lazy (double-scan).
        from pyspark import StorageLevel

        local = local.persist(StorageLevel.MEMORY_AND_DISK)
    # shard totals from the windowed frame: max of (lb + n) over a
    # shard IS that shard's token count — no second scan of `df`.
    totals = local.groupBy("__shard").agg(
        F.max(F.col("__lb") + F.col(ntok_col)).alias("__tot")
    )
    w_sh = (
        Window.orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the shard-offset window runs over `shards` rows, not the data —
    # single-partition is fine (and the join side is broadcast)
    offsets = totals.select(
        "__shard",
        F.coalesce(F.sum("__tot").over(w_sh), F.lit(0)).alias("__sb"),
    )
    g = local.join(F.broadcast(offsets), "__shard").withColumn(
        "__gb", F.col("__sb") + F.col("__lb")
    )
    L = F.lit(seq_len)
    first = F.expr(f"__gb div {seq_len}")
    last = F.expr(f"(__gb + {ntok_col} - 1) div {seq_len}")
    s = g.withColumn("seq_id", F.explode(F.sequence(first, last)))
    tok_start = F.greatest(F.lit(0), F.col("seq_id") * L - F.col("__gb"))
    tok_end = F.least(
        F.col(ntok_col), (F.col("seq_id") + 1) * L - F.col("__gb")
    )
    return s.select(
        *[F.col(c) for c in df.columns],
        F.col("seq_id"),
        tok_start.alias("tok_start"),
        tok_end.alias("tok_end"),
        (F.col("__gb") + tok_start - F.col("seq_id") * L).alias("seq_off"),
    )


def remove_boilerplate_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    segment_words: int = 8,
    max_docs: int = 3,
) -> DataFrame:
    """Cross-document boilerplate removal at segment granularity —
    the C4/RefinedWeb "line dedup" step (drop every line that repeats
    across many pages: headers, footers, cookie banners) applied to
    fixed-width word segments, since this corpus's documents are
    single-line token streams.

    A segment is a non-overlapping window of ``segment_words``
    whitespace tokens. Any segment string occurring in MORE than
    ``max_docs`` distinct documents is boilerplate; every occurrence
    is dropped and each document's surviving segments are reassembled
    in order.

    Scale shape (the reason this is safe at 100 TB): segmentation is
    a map-side array slice + posexplode (no re-tokenization);
    frequency counting is ONE count-distinct aggregation shuffled on
    the segment string (map-side combined; a hot segment is exactly
    what the combine collapses); the frequent-segment set is bounded
    at n_segments/max_docs members (each appears in >max_docs
    documents) — in practice boilerplate is a few thousand strings,
    but a boilerplate-heavy corpus can push it to corpus scale, so
    the lookup join carries NO broadcast hint: AQE converts it to a
    broadcast from the observed size in the common case and falls
    back to a shuffled join in the adversarial one (the same policy
    as corpus_prep's decontamination anti-join); reassembly is one
    groupBy on the document id. No UDFs anywhere.

    Output: (id, clean_text, n_dropped) — one row per input document
    (documents whose every segment was boilerplate keep a row with
    empty clean_text).
    """
    if segment_words <= 0:
        raise ValueError("segment_words must be positive")
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    with_t = df.select(F.col(id_col), toks.alias("__t"))
    starts = F.expr(
        f"sequence(0, greatest(size(__t) - 1, 0), {segment_words})"
    )
    segs = with_t.select(
        F.col(id_col),
        F.posexplode(starts).alias("pos", "start"),
        F.concat_ws(
            " ", F.slice(F.col("__t"), F.col("start") + 1, segment_words)
        ).alias("seg"),
    ).drop("start")
    frequent = (
        segs.groupBy("seg")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .where(F.col("__nd") > max_docs)
        .select("seg", F.lit(True).alias("__boiler"))
    )
    flagged = segs.join(frequent, "seg", "left_outer")
    keep = F.col("__boiler").isNull()
    # collect_list drops nulls, so when(keep, ...) keeps survivors only
    # while every document retains its group (each has >= 1 segment row)
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(keep, F.struct(F.col("pos"), F.col("seg")))
                    )
                ),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.when(keep, 0).otherwise(1)).cast("bigint").alias(
            "n_dropped"
        ),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float] | float,
    precision: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``stable_hash40(id) mod precision < fraction * precision`` for
    its stratum — reproducible anywhere (``df.sampleBy`` is seeded
    but partition-order-sensitive), and consistent across tables
    (the same id always samples the same way).

    ``fractions``: one float for all strata, or {stratum: fraction}
    (strata absent from the dict are dropped).
    """
    bucket = F.pmod(
        stable_hash40(F.col(id_col).cast("string")), F.lit(precision)
    )
    if isinstance(fractions, dict):
        cut = None
        for value, frac in fractions.items():
            cond = F.col(strata_col) == value
            lim = F.lit(int(frac * precision))
            cut = F.when(cond, lim) if cut is None else cut.when(cond, lim)
        cut = cut.otherwise(F.lit(0))
    else:
        cut = F.lit(int(float(fractions) * precision))
    return df.where(bucket < cut)


def bloom_positions(
    benchmark: DataFrame,
    bench_id_col: str,
    bench_text_col: str,
    shingle_n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Bloom-filter bit positions of every distinct benchmark
    ``shingle_n``-gram — the CONSTANT-SIZE decontamination index.

    :func:`decontaminate` broadcasts the raw benchmark shingle
    strings, which stops scaling when the benchmark suite grows past
    broadcast range. This index is a (pos int) frame bounded by
    ``m_bits`` rows (~8 MB at the 2^20 default) REGARDLESS of
    benchmark size: each shingle sets ``k`` salted-hash bits, and
    the frame is the distinct set of set bits — the relational form
    of a bloom bitmap, identical membership semantics, exact SQL
    oracle. Persist it once per benchmark-suite release.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    shingles = (
        shingle_rows(benchmark, bench_id_col, bench_text_col, shingle_n)
        .select("shingle")
        .distinct()
    )
    pos = [
        F.pmod(
            stable_hash40(
                F.concat(F.lit(f"{i}|"), F.col("shingle"))
            ),
            F.lit(m_bits),
        )
        for i in range(k)
    ]
    return (
        shingles.select(F.explode(F.array(*pos)).alias("pos"))
        .distinct()
    )


def decontaminate_bloom(
    corpus: DataFrame,
    positions: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Bloom-filter test-set decontamination: flag corpus documents
    with >= ``min_hits`` distinct ``shingle_n``-grams whose ``k``
    bloom bits are ALL set in ``positions`` (from
    :func:`bloom_positions` — same ``shingle_n``/``m_bits``/``k``).

    Bloom semantics: no false negatives (every doc
    :func:`decontaminate` would flag is flagged here), false
    positives deterministic and rate-bounded by (k x n_shingles /
    m_bits)^k — the standard trade for an index whose size is capped
    by ``m_bits``, not by the benchmark suite.

    Shape at scale: the corpus probe rows (k per shingle OCCURRENCE)
    meet the broadcast positions index MAP-SIDE — non-members drop
    before any shuffle, so only candidate hits (true overlaps + the
    few FPs) ever cross an exchange, a vanishing fraction of the
    corpus. Round 10: the implementation previously deduplicated
    (doc, shingle) with a full corpus-shingle ``distinct()`` BEFORE
    probing — the one shuffle the docstring promised not to pay
    (~5M 30-byte rows at sf0.1; corpus-scale at 100 TB). Probes now
    carry their salt index and are deduplicated AFTER the broadcast
    filter: for each distinct (doc, shingle), salt ``i`` survives
    the join iff bit pos(i, shingle) is set (duplicate occurrences
    of a shingle collapse in the post-filter distinct; two salts
    colliding onto one pos stay distinct rows by salt), so
    count==k <=> all k probes hit — row-identical output, the
    corpus-sized exchange gone (guide §2.3/§2.4). Map-side cost is
    k hashes per occurrence instead of per distinct shingle — the
    standard hash-vs-shuffle trade.

    Returns (id, n_hit_ngrams) for flagged documents; anti-join the
    corpus against it to drop them — the same contract as
    :func:`decontaminate`.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    cs = shingle_rows(
        spread_small_input(corpus, id_col), id_col, text_col, shingle_n
    )
    probes = cs.select(
        F.col(id_col),
        F.col("shingle"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("salt"),
                        F.pmod(
                            stable_hash40(
                                F.concat(F.lit(f"{i}|"), F.col("shingle"))
                            ),
                            F.lit(m_bits),
                        ).alias("pos"),
                    )
                    for i in range(k)
                ]
            )
        ).alias("__p"),
    ).select(id_col, "shingle", "__p.salt", "__p.pos")
    # bloom membership = every one of the k salted probes finds its
    # bit set. positions is distinct, so each probe row matches at
    # most once; the distinct below collapses repeated occurrences
    # of a shingle within a doc, and counting DISTINCT SALTS that
    # survived == k <=> all k probes hit (a salt collision onto an
    # already-set bit is still its own salt row — exactly bitmap
    # semantics).
    hits = (
        probes.join(F.broadcast(positions), "pos")
        .select(id_col, "shingle", "salt")
        .distinct()
        .groupBy(id_col, "shingle")
        .agg(F.count(F.lit(1)).alias("__nmatch"))
        .where(F.col("__nmatch") == k)
    )
    return (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
        .where(F.col("n_hit_ngrams") >= min_hits)
    )


def bloom_bitmap(
    positions: DataFrame, m_bits: int = 1 << 20
) -> DataFrame:
    """Pack a :func:`bloom_positions` frame into ONE row holding the
    real bitmap (``bloom`` array<bigint>, m_bits/64 words) — the form
    that broadcasts everywhere (128 KB at 2^20 bits) and makes
    membership a pure per-row expression, which is what the
    STREAMING intake path needs (a stateless column map; the
    relational count==k form needs an aggregation a stream cannot
    run in append mode).

    The word OR-fold is a single-reducer agg over <= m_bits/64 rows
    — bounded by construction, never by data size.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    nwords = m_bits // 64
    words = positions.select(
        (F.col("pos") / 64).cast("int").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
        .alias("bit"),
    ).groupBy("w").agg(F.expr("bit_or(bit)").alias("bits"))
    return words.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("w", "bits"))
        ).alias("__m")
    ).select(
        F.expr(
            f"transform(sequence(0, {nwords - 1}), "
            "i -> coalesce(__m[i], CAST(0 AS BIGINT)))"
        ).alias("bloom")
    )


def bloom_contaminated(
    text_col: str,
    bloom_col: str = "bloom",
    shingle_n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 3,
):
    """Boolean Column: does ``text_col`` contain ANY ``shingle_n``-gram
    whose ``k`` bloom bits are all set in ``bloom_col`` (array<bigint>
    from :func:`bloom_bitmap`, attached via a broadcast cross join)?

    One nested expression with every intermediate bound as a lambda
    variable (the minhash_signatures_mapside lesson: chained HOF
    selects re-evaluate the producer per consumer) — tokens split
    once, each shingle hashed k times, each probe one word-index +
    bit-shift. Entirely stateless codegen, so it runs unchanged
    under Structured Streaming. Flag semantics are row-identical to
    ``decontaminate_bloom(min_hits=1)`` (pinned by test).
    """
    toks = f"filter(split({text_col}, ' '), t -> t <> '')"
    parts = ", ".join(f"t[i+{j}]" for j in range(shingle_n))
    shingles = (
        f"CASE WHEN size(t) >= {shingle_n} THEN "
        f"array_distinct(transform(sequence(0, size(t)-{shingle_n}), "
        f"i -> concat_ws(' ', {parts}))) ELSE array() END"
    )

    # the k probe positions are bound ONCE via transform (each md5
    # evaluated once, not once per bitmap subscript), then forall
    # tests every bound position's bit
    pos_list = ", ".join(
        f"pmod(CAST(conv(substring(md5(concat('{i}|', s)), 1, 10), "
        f"16, 10) AS BIGINT), {m_bits})"
        for i in range(k)
    )
    member = (
        f"forall(transform(array({pos_list}), "
        f"p -> (shiftright({bloom_col}[CAST(p / 64 AS INT)], "
        f"CAST(p % 64 AS INT)) & 1) = 1), b -> b)"
    )
    return F.expr(
        f"exists(transform(array({toks}), t -> {shingles})[0], "
        f"s -> {member})"
    )


def snapshot_diff(
    base: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Release-to-release corpus diff: classify every document id as
    ``added`` (new only), ``removed`` (base only), ``changed`` (both
    present, content fingerprint differs) or ``unchanged`` — the
    audit a pipeline runs before shipping a dataset revision (how
    much churned, what must re-embed / re-tokenize downstream).

    Output: (id, status, base_fp, new_fp) — null fingerprint marks
    the absent side.

    Scale shape: both sides reduce map-side to (id, md5(text)), so
    the single full-outer shuffle join carries 16-byte fingerprints
    per row, never document text. Downstream consumers that only
    need churn counts can aggregate the result; consumers that
    re-process changed docs semi-join their text table against the
    ``changed``/``added`` ids.
    """
    b = base.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("base_fp")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("new_fp")
    )
    joined = b.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("base_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("base_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        id_col, status.alias("status"), "base_fp", "new_fp"
    )


def snapshot_diff_sql(
    id_col: str,
    text_col: str,
    base_sql: str,
    new_sql: str,
) -> str:
    """DuckDB twin of :func:`snapshot_diff` over two snapshot
    subqueries."""
    return f"""
SELECT COALESCE(b.{id_col}, n.{id_col}) AS {id_col},
       CASE WHEN b.{id_col} IS NULL THEN 'added'
            WHEN n.{id_col} IS NULL THEN 'removed'
            WHEN b.base_fp = n.new_fp THEN 'unchanged'
            ELSE 'changed' END AS status,
       b.base_fp, n.new_fp
FROM (SELECT {id_col}, md5({text_col}) AS base_fp
      FROM ({base_sql})) b
FULL OUTER JOIN (SELECT {id_col}, md5({text_col}) AS new_fp
                 FROM ({new_sql})) n
  ON b.{id_col} = n.{id_col}
"""
