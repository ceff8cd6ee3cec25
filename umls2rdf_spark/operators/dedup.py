"""Deduplication operators for large-scale text corpora.

All built on engine-neutral hashing (functions/hashing.py) so every
variant has an exact SQL oracle. Scale notes per operator:

- exact: one hash-groupBy; the md5 is computed map-side, the shuffle
  carries (hash, id) only.
- minhash LSH: explode shingles → k permutation mins per doc (one
  shuffle on doc_id) → band signatures → self-join on (band, sig).
  The band join is the only all-to-all and its key space is the
  signature, so identical docs co-locate; bucket-size skew (a viral
  duplicate cluster) is handled by AQE skew-join splitting.
- simhash: per-bit weighted sums via conditional aggregation — a
  single groupBy, no pairwise work at all.
- jaccard verify: exact similarity ONLY for LSH candidate pairs
  (the standard minhash pipeline's verify stage) — cost bounded by
  the banding, never all-pairs. The block-keyed all-pairs variant
  (ngram_jaccard_pairs) remains for small dimension tables.
- connected components: alternating large-star/small-star — O(log n)
  rounds independent of component diameter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import (
    PERM_MODULUS,
    perm_hash,
    perm_params,
    stable_hash40,
    stable_hash40_spark_sql,
)
from umls2rdf_spark.operators.spread import spread_small_input

SIMHASH_BITS = 32


def exact_dedupe_groups(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the
    representative (min id) and copy count."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) rows: word n-gram shingles per document.

    The token array is projected first and the shingle transform is a
    single SQL expression over plain array subscripts — building it
    from Python-lambda HOFs re-evaluates the tokenization per element
    and runs interpreted (≈4× slower measured). The size guard matters:
    ``sequence(0, negative)`` counts DOWN in Spark.
    """
    tarr = df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("__t"),
    )
    parts = ", ".join(f"__t[i+{j}]" for j in range(n))
    expr = (
        f"CASE WHEN size(__t) >= {n} THEN "
        f"transform(sequence(0, size(__t)-{n}), i -> concat_ws(' ', {parts})) "
        "ELSE array() END"
    )
    return tarr.select(
        F.col(id_col), F.explode(F.expr(expr)).alias("shingle")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 8,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, perm_id, minhash) — k permutation minima per document.

    Shingles explode map-side; the perm table is a k-row broadcast
    cross join; the min-agg shuffles once on (id, perm_id).
    ``shingles`` accepts a precomputed (id, shingle) frame (ideally
    persisted) so pipelines that also verify candidates share one
    shingling pass instead of recomputing the explode per consumer.
    """
    # single-file local reads arrive as one partition; spread the
    # shingling across the cluster before the heavy per-row work
    shingled = (
        shingles
        if shingles is not None
        else shingle_rows(
            spread_small_input(df, id_col), id_col, text_col, shingle_n
        ).distinct()
    )
    hashed = shingled.select(
        F.col(id_col), stable_hash40(F.col("shingle")).alias("h")
    )
    # All k permutation minima as parallel aggregates in ONE groupBy —
    # a crossJoin against the perm table k-tuples the shuffle volume
    # for nothing (measured ~2x slower); map-side partial mins keep
    # the shuffle at k values per (doc, partition).
    min_exprs = [
        F.min(perm_hash(F.col("h"), F.lit(a), F.lit(b))).alias(f"m{i}")
        for i, a, b in perm_params(num_perm)
    ]
    per_doc = hashed.groupBy(id_col).agg(*min_exprs)
    stack_args: list[Column] = []
    for i, _, _ in perm_params(num_perm):
        stack_args.extend([F.lit(i), F.col(f"m{i}")])
    return per_doc.select(
        F.col(id_col),
        F.stack(F.lit(num_perm), *stack_args).alias("perm_id", "minhash"),
    )


def minhash_signatures_mapside(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Row-identical to :func:`minhash_signatures`, computed entirely
    MAP-SIDE: tokens → distinct shingle array → 40-bit hashes → all k
    permutation minima in one ``aggregate`` traversal with a k-slot
    accumulator. Zero shuffles, no explode.

    The groupBy variant spreads one document's shingles across tasks,
    which matters only for pathological single-doc sizes; for typical
    corpus documents this is the cheaper path (the signature index
    build becomes scan-speed), and it is the streaming-legal one — a
    stateless projection needs no watermark or state store, so the
    continuous-ingest loop can band-sign arriving docs per
    micro-batch. Docs with no shingles produce no rows (either
    variant). Equivalence is pinned by tests.
    """
    # The whole chain is ONE nested expression with every
    # intermediate bound as a lambda variable (transform over a
    # singleton array). Writing it as a chain of selects lets
    # CollapseProject inline the token-array expression into every
    # ``t[i+j]`` subscript of the shingle lambda — the split+filter
    # re-runs O(tokens) times per document (measured 20x slower).
    # A lambda variable holds the EVALUATED value, so tokens are
    # split once, each shingle md5-hashed once (the hash transform
    # is the aggregate's single input), and all k permutation minima
    # update in one traversal of a k-slot accumulator. PERM_MODULUS
    # is a safe +inf seed: every pmod result is below it.
    params = perm_params(num_perm)
    toks = f"filter(split({text_col}, ' '), t -> t <> '')"
    parts = ", ".join(f"t[i+{j}]" for j in range(shingle_n))
    shingles = (
        f"array_distinct(transform(sequence(0, size(t)-{shingle_n}), "
        f"i -> concat_ws(' ', {parts})))"
    )
    hashed = (
        f"transform({shingles}, "
        f"s -> {stable_hash40_spark_sql('s')})"
    )
    seed = "array(" + ", ".join(
        f"CAST({PERM_MODULUS} AS BIGINT)" for _ in params
    ) + ")"
    upd = ", ".join(
        f"least(acc[{i}], pmod({a} * h + {b}, {PERM_MODULUS}))"
        for i, (_, a, b) in enumerate(params)
    )
    full = (
        f"transform(array({toks}), "
        f"t -> aggregate({hashed}, {seed}, (acc, h) -> array({upd})))[0]"
    )
    per_doc = df.where(F.expr(f"size({toks}) >= {shingle_n}")).select(
        F.col(id_col), F.expr(full).alias("__m")
    )
    stack_args: list[Column] = []
    for i, _, _ in params:
        stack_args.extend([F.lit(i), F.col("__m")[i]])
    return per_doc.select(
        F.col(id_col),
        F.stack(F.lit(num_perm), *stack_args).alias("perm_id", "minhash"),
    )


def band_signatures(
    signatures: DataFrame, id_col: str, rows_per_band: int = 1
) -> DataFrame:
    """(id, band, band_sig) from a :func:`minhash_signatures` frame —
    the LSH band index. This is also the frame a continuously-fed
    corpus PERSISTS between ingests (bands x ~8 bytes per admitted
    doc; see :func:`incremental_minhash_dedupe`), the near-dup
    analogue of the 16-byte exact-fingerprint index."""
    if rows_per_band == 1:
        # one signature row per (doc, band): the groupBy below would
        # shuffle the whole signature table just to build 1-row
        # groups — this projection is row-identical and shuffle-free
        return signatures.select(
            F.col(id_col),
            F.col("perm_id").cast("int").alias("band"),
            F.col("minhash").cast("string").alias("band_sig"),
        )
    banded = signatures.withColumn(
        "band", (F.col("perm_id") / rows_per_band).cast("int")
    )
    return banded.groupBy(id_col, "band").agg(
        F.concat_ws(
            "-",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("perm_id", "minhash"))
                ),
                lambda s: s["minhash"].cast("string"),
            ),
        ).alias("band_sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, rows_per_band: int = 1
) -> DataFrame:
    """LSH banding: docs sharing any identical band signature become
    candidate pairs (id_a < id_b, distinct)."""
    band_sigs = band_signatures(signatures, id_col, rows_per_band)
    a = band_sigs.select(
        F.col(id_col).alias("id_a"), "band", "band_sig"
    )
    b = band_sigs.select(
        F.col(id_col).alias("id_b"), "band", "band_sig"
    )
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """Per-document simhash fingerprint: sign of per-bit weighted sums
    over token hashes, assembled into one integer.

    One explode + one groupBy with ``bits`` conditional sums — stays
    entirely in whole-stage codegen, no pairwise work.
    """
    # sql-string exprs (one py4j round-trip each) — ``bits``
    # conditional sums and the assemble chain were ~400 Column calls.
    # Interpolated identifiers are backtick-quoted (the completion.py
    # fingerprint pattern) so caller column names with spaces/reserved
    # words parse exactly as the Column API resolved them.
    qid = "`" + id_col.replace("`", "``") + "`"
    qtext = "`" + text_col.replace("`", "``") + "`"
    toks = spread_small_input(df, id_col).selectExpr(
        qid,
        f"explode(filter(split({qtext}, ' '), t -> t <> '')) AS tok",
    )
    hashed = toks.selectExpr(
        qid,
        f"{stable_hash40_spark_sql('tok')} AS h",
    )
    bit_sums = [
        F.expr(
            f"SUM(CASE WHEN (shiftright(h, {j}) & 1) = 1"
            " THEN 1 ELSE -1 END)"
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    agg = hashed.groupBy(id_col).agg(*bit_sums)
    # same ascending-j left-assoc sum as the old Column chain: bits
    # 0..30 stay INT (their sum tops out at 2^31 - 1, exactly int32),
    # the 2^31 term is a BIGINT literal and promotes the total
    assemble = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END"
        for j in range(bits)
    )
    return agg.selectExpr(id_col, f"{assemble} AS simhash")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact pairwise Jaccard over distinct word sets, blocked by
    ``block_col`` to bound the quadratic pair space."""
    words = spread_small_input(df, id_col).select(
        F.col(block_col).alias("block"),
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            )
        ).alias("w"),
    )
    sizes = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = words.select("block", F.col(id_col).alias("id_a"), "w")
    b = words.select("block", F.col(id_col).alias("id_b"), "w")
    inter = (
        a.join(b, ["block", "w"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= min_jaccard)


def jaccard_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_jaccard: float = 0.0,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram-shingle Jaccard restricted to candidate pairs —
    the verify stage of the standard minhash/LSH dedup pipeline
    (candidates from :func:`lsh_candidate_pairs`, exact similarity
    only for those).

    Cost is O(|pairs| x doc shingles), never all-pairs: at 100 TB the
    LSH stage bounds the pair space, so this never re-quadratizes the
    way blocking on a low-cardinality column does. Uses the same
    shingle space the minhash signatures estimate, so the verified
    Jaccard is the quantity LSH approximates. Pairs whose exact
    intersection is empty (pure minhash collisions) survive with
    jaccard 0.0 when ``min_jaccard`` is 0.

    Two row-identical shapes, picked by how the shingles arrive:

    - ``shingles`` passed (a bounded, usually persisted distinct
      (id, shingle) frame — the dedup_minhash / incremental ingest
      callers): intersections run IN-ROW over per-document shingle
      ARRAYS (``array_intersect``) attached with two joins of
      |pairs| rows — the exploded form shipped
      |pairs| x |doc shingles| rows through a join + groupBy (40M
      rows for 82k candidates at sf0.1), the array form ships the
      same bytes in hundreds of times fewer rows and drops two
      joins + a groupBy (measured 2x on ngram_jaccard).
    - ``shingles`` is None (shingling straight off the corpus):
      keep the exploded join — the array form would funnel
      ~10KB shingle arrays through the id_b shuffle of a sort-merge
      join (measured 1.5x SLOWER on dedup_clusters), while the
      exploded rows cost the same bytes with uniform small rows.
    """
    if shingles is None:
        shingles_rows = shingle_rows(
            spread_small_input(df, id_col), id_col, text_col, shingle_n
        ).distinct()
        sizes = shingles_rows.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("sz")
        )
        sa = shingles_rows.select(F.col(id_col).alias("id_a"), "shingle")
        sb = shingles_rows.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            pairs.join(sa, "id_a")
            .join(sb, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        za = sizes.select(
            F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")
        )
        zb = sizes.select(
            F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")
        )
        out = (
            pairs.join(inter, ["id_a", "id_b"], "left")
            .withColumn("inter", F.coalesce(F.col("inter"), F.lit(0)))
            .join(za, "id_a")
            .join(zb, "id_b")
            .select(
                "id_a",
                "id_b",
                (
                    F.col("inter").cast("double")
                    / (
                        F.col("sz_a") + F.col("sz_b") - F.col("inter")
                    ).cast("double")
                ).alias("jaccard"),
            )
        )
        return out.where(F.col("jaccard") >= min_jaccard)

    # bounded provided-shingles path: in-row array intersections.
    # The frame must hold distinct (id, shingle) rows (what every
    # in-repo caller builds); docs without shingles had no rows in
    # the exploded form, so the size guard replicates the sizes-join
    # drop of their pairs.
    arrs = (
        shingles.groupBy(id_col)
        .agg(F.collect_list("shingle").alias("__sh"))
        .where(F.size("__sh") > 0)
    )
    aa = arrs.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a"))
    ab = arrs.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b"))
    inter = F.size(F.array_intersect("__sh_a", "__sh_b")).cast("bigint")
    out = (
        pairs.join(aa, "id_a")
        .join(ab, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size("__sh_a").cast("bigint").alias("sz_a"),
            F.size("__sh_b").cast("bigint").alias("sz_b"),
            inter.alias("inter"),
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= min_jaccard)


def containment_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_containment: float = 0.0,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram-shingle CONTAINMENT (and Jaccard) for candidate
    pairs — the asymmetric dedup signal symmetric Jaccard
    under-scores (Broder 1997 defines both): a short document wholly
    quoted inside a long one has containment(short) ≈ 1 while
    Jaccard ≈ |short|/|long| ≈ 0, so a Jaccard threshold keeps the
    subset-duplicate. Corpus pipelines drop (or link) a pair when
    max(containment_a, containment_b) clears the bar.

        containment_a = |shingles(A) ∩ shingles(B)| / |shingles(A)|

    Same cost shape as :func:`jaccard_verify_pairs`: O(|pairs| ×
    doc shingles) via the shared distinct-shingle frame, never
    all-pairs — candidates come from LSH banding upstream. Pure
    integer counts; the three ratios are divisions of exact int64s
    (deterministic doubles on any engine). Pairs with an empty side
    emit NULL for that side's containment.

    Output: (id_a, id_b, inter, sz_a, sz_b, jaccard, containment_a,
    containment_b), filtered to max(containment) >= min_containment.
    """
    if shingles is None:
        shingles = shingle_rows(
            spread_small_input(df, id_col), id_col, text_col, shingle_n
        ).distinct()
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .withColumn("inter", F.coalesce(F.col("inter"), F.lit(0)))
        .join(za, "id_a", "left")
        .join(zb, "id_b", "left")
        .select(
            "id_a",
            "id_b",
            "inter",
            F.coalesce(F.col("sz_a"), F.lit(0)).alias("sz_a"),
            F.coalesce(F.col("sz_b"), F.lit(0)).alias("sz_b"),
        )
        .withColumn(
            "jaccard",
            F.when(
                F.col("sz_a") + F.col("sz_b") - F.col("inter") > 0,
                F.col("inter").cast("double")
                / (
                    F.col("sz_a") + F.col("sz_b") - F.col("inter")
                ).cast("double"),
            ),
        )
        .withColumn(
            "containment_a",
            F.when(
                F.col("sz_a") > 0,
                F.col("inter").cast("double") / F.col("sz_a").cast("double"),
            ),
        )
        .withColumn(
            "containment_b",
            F.when(
                F.col("sz_b") > 0,
                F.col("inter").cast("double") / F.col("sz_b").cast("double"),
            ),
        )
    )
    if min_containment > 0.0:
        out = out.where(
            F.greatest(
                F.coalesce(F.col("containment_a"), F.lit(0.0)),
                F.coalesce(F.col("containment_b"), F.lit(0.0)),
            )
            >= min_containment
        )
    return out


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every strictly-larger neighbor of u is
    re-pointed at min(Γ(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
    )
    return (
        sym.where(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient each edge (larger, smaller); every
    smaller neighbor of u — and u itself — is pointed at the minimum
    smaller neighbor."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    repointed = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    own = mins.select(F.col("u"), F.col("m").alias("v"))
    return repointed.union(own).distinct()


def connected_components(
    edges: DataFrame,
    all_nodes: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_col: str = "node",
    max_iters: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    candidate-pair graph via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"),
    which converges in O(log n) rounds regardless of component
    diameter — a chain component needs ~log rounds where direct
    min-label propagation needs diameter rounds.

    Each round is two groupBy+join passes over the (shrinking) edge
    list; frames are localCheckpoint'd to truncate lineage, and
    convergence is a constant-size (count, hash-sum) checksum on the
    already-materialized checkpoint — no O(n) driver collect.

    Returns (node, label) for EVERY node in ``all_nodes`` (singletons
    label themselves, label = min id of the component). Raises
    ``RuntimeError`` if the edge set has not stabilized within
    ``max_iters`` rounds instead of silently returning split
    clusters. Pass ``stats={}`` to receive {"rounds": n} back.
    """
    nodes = all_nodes.select(F.col(node_col).alias("node")).distinct()
    e = (
        edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def checksum(df: DataFrame) -> tuple:
        # order-independent, overflow-free set fingerprint
        row = df.agg(
            F.count(F.lit(1)),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)),
        ).collect()[0]
        return (row[0], row[1])

    prev = checksum(e)
    converged = False
    rounds = 0
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        rounds += 1
        cur = checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "large-star/small-star rounds; raise max_iters"
        )
    # Converged edge set is a star forest (child, root): one edge per
    # non-root node, root = component minimum.
    star = e.groupBy("u").agg(F.min("v").alias("label"))
    return (
        nodes.join(star, nodes["node"] == star["u"], "left")
        .select(
            "node", F.coalesce(F.col("label"), F.col("node")).alias("label")
        )
    )


def incremental_dedupe(
    new_docs: DataFrame,
    base: DataFrame,
    id_col: str,
    text_col: str,
    base_is_fingerprints: bool = False,
) -> DataFrame:
    """Incremental corpus intake: keep only new-shard documents whose
    text is (a) absent from the base corpus and (b) the minimum-id
    representative within the shard — the between-ingests shape of
    exact dedup (a continuously-fed training corpus dedupes each
    arriving shard against everything already admitted).

    ``base`` is either the base corpus (fingerprinted on the fly) or,
    with ``base_is_fingerprints=True``, a precomputed ``text_hash``
    frame — the production form: the fingerprint INDEX (16 bytes/row)
    is what you persist between ingests, never the text. Both joins
    are hash-keyed: the anti-join shuffles shard+index fingerprints
    (the shard side is the small one in steady state), and the
    in-shard representative pick is one shard-sized window. New
    columns are untouched — output is the surviving new_docs rows.
    """
    from pyspark.sql import Window

    shard = new_docs.withColumn("__fp", F.md5(F.col(text_col)))
    if base_is_fingerprints:
        base_fp = base.select(F.col("text_hash").alias("__fp"))
    else:
        base_fp = base.select(F.md5(F.col(text_col)).alias("__fp"))
    fresh = shard.join(base_fp, "__fp", "left_anti")
    w = Window.partitionBy("__fp").orderBy(id_col)
    return (
        fresh.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def incremental_minhash_dedupe(
    new_docs: DataFrame,
    base_docs: DataFrame | None,
    id_col: str,
    text_col: str,
    num_perm: int = 8,
    shingle_n: int = 3,
    rows_per_band: int = 1,
    min_jaccard: float | None = None,
    base_index: DataFrame | None = None,
    shard_sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental NEAR-dup intake: admit only new-shard documents
    that are not near-duplicates of the standing corpus or of a
    lower-id shard sibling — the between-ingests shape of minhash/LSH
    dedup, completing :func:`incremental_dedupe` (which is exact-only)
    for the continuous-crawl case where re-fetched pages differ by a
    timestamp or ad block.

    The thing a production corpus persists between ingests is the
    band-signature INDEX (:func:`band_signatures` — bands x ~8 bytes
    per admitted doc, never the text); pass it as ``base_index`` and
    the base corpus is touched only to fetch the few candidate docs
    the verify stage needs. Without ``base_index`` the index is
    derived from ``base_docs`` on the fly.

    Candidates = shard band-sigs hash-joined against the base index
    (shard side small in steady state) plus within-shard LSH pairs —
    never all-pairs. With ``min_jaccard`` set, candidates are
    verified by exact shingle Jaccard (:func:`jaccard_verify_pairs`)
    over the shard shingles plus ONLY the semi-joined candidate base
    docs, so verify cost is bounded by the banding, not the corpus.

    Drop rule (deterministic, conservative): a shard doc is dropped
    if it matches the base or ANY lower-id shard doc — including one
    whose own match got it dropped. This is dedup_clusters'
    cluster-wide convention, not sequential admission (where a doc
    whose only match was itself rejected would be re-admitted);
    sequential semantics would need an id-ordered dependency chain,
    which at corpus scale is a serial scan. Shard and base ids must
    be disjoint (distinct ingests always are).

    Returns the surviving ``new_docs`` rows unchanged.
    """
    if base_index is None:
        if base_docs is None:
            raise ValueError("need base_docs or base_index")
        # signature-only consumer: the map-side variant builds the
        # index at scan speed (no shingle explode, no shuffle)
        base_index = band_signatures(
            minhash_signatures_mapside(
                base_docs, id_col, text_col,
                num_perm=num_perm, shingle_n=shingle_n,
            ),
            id_col,
            rows_per_band,
        )
    # signatures map-side (scan speed, zero shuffle); the shingle
    # explode is built only if the verify stage needs it. A caller
    # that already holds (or persists) the shard's signature frame —
    # e.g. one full-corpus signature pass sliced per shard, the
    # signature computation being a pure per-row projection, so
    # sigs(docs.where(p)) == sigs(docs).where(p) — passes it as
    # ``shard_sigs`` and this pass (consumed TWICE below: the base
    # probe and the within-shard LSH join) is not recomputed.
    if shard_sigs is None:
        shard_sigs = minhash_signatures_mapside(
            new_docs, id_col, text_col,
            num_perm=num_perm, shingle_n=shingle_n,
        )
    shard_bands = band_signatures(shard_sigs, id_col, rows_per_band)

    base_pairs = (
        shard_bands.select(F.col(id_col).alias("id_a"), "band", "band_sig")
        .join(
            base_index.select(
                F.col(id_col).alias("id_b"), "band", "band_sig"
            ),
            ["band", "band_sig"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    shard_pairs = lsh_candidate_pairs(shard_sigs, id_col, rows_per_band)

    if min_jaccard is not None:
        if base_docs is None:
            raise ValueError("verification needs base_docs")
        shard_shingles = shingle_rows(
            spread_small_input(new_docs, id_col), id_col, text_col,
            shingle_n,
        ).distinct()
        # no distinct on the candidate ids: left_semi is EXISTS
        # semantics, so duplicate right-side ids (one per matching
        # shard doc) cannot multiply the output — the explicit dedup
        # only added an extra shuffle of the rows the semi-join
        # hashes anyway (the drop-list argument below, guide §2.4)
        cand_ids = base_pairs.select(F.col("id_b").alias(id_col))
        cand_docs = base_docs.join(cand_ids, id_col, "left_semi")
        cand_shingles = shingle_rows(
            spread_small_input(cand_docs, id_col), id_col, text_col, shingle_n
        ).distinct()
        verify_shingles = shard_shingles.unionByName(cand_shingles)
        base_pairs = jaccard_verify_pairs(
            None, base_pairs, id_col, text_col,
            shingle_n=shingle_n, min_jaccard=min_jaccard,
            shingles=verify_shingles,
        ).select("id_a", "id_b")
        shard_pairs = jaccard_verify_pairs(
            None, shard_pairs, id_col, text_col,
            shingle_n=shingle_n, min_jaccard=min_jaccard,
            shingles=shard_shingles,
        ).select("id_a", "id_b")

    # no distinct on the drop list: left_anti is set-semantics on the
    # left side, so duplicate drop ids cannot multiply or reorder the
    # output — the explicit dedup only added a full extra shuffle of
    # the same rows the anti-join hashes anyway (guide §2.4,
    # "a distinct on data that is already unique" — here, data whose
    # duplicates the consumer ignores)
    drop = base_pairs.select(F.col("id_a").alias(id_col)).unionByName(
        shard_pairs.select(F.col("id_b").alias(id_col))
    )
    return new_docs.join(drop, id_col, "left_anti")


def dedup_keep_k(
    df: DataFrame, id_col: str, text_col: str, k: int = 2
) -> DataFrame:
    """(id, dup_rank, group_n): frequency-CAPPED exact dedup — keep
    up to ``k`` copies of each distinct text, in corpus order
    (``dup_rank`` is the 1-based occurrence rank, winners are the
    lowest ids). Full dedup (k=1) is a special case, but the point
    of k>1 is FineWeb's finding that some natural repetition is
    signal: a hard keep-one policy over-prunes templated-but-useful
    pages, so production pipelines cap copies instead of banning
    them.

    Plan shape: ``row_number() <= k`` over the 128-bit content
    fingerprint compiles to WindowGroupLimit(Partial) → Exchange →
    WindowGroupLimit(Final) (the cap_per_domain discipline,
    webcurate.py:73) — every map task prunes each text group to its
    k best candidates BEFORE the shuffle, so a pathological hot
    document (billions of mirror copies) ships O(k · partitions)
    rows, not its copy count. ``group_n`` (total copies, for the
    audit trail) is a separate map-side-combined count on the same
    fingerprint — also hot-key safe.

    Fingerprints are two independent xxhash64 values (the
    paragraphs.py discipline: text never rides the winner shuffle);
    the DuckDB twin groups by the text STRING, so a driver match
    certifies the fingerprint grouping collision-free on the data.
    """
    from pyspark.sql import Window

    fp = df.select(
        F.col(id_col),
        F.xxhash64(text_col).alias("__h1"),
        F.xxhash64(F.lit("\x1fkeepk"), F.col(text_col)).alias("__h2"),
    )
    w = Window.partitionBy("__h1", "__h2").orderBy(id_col)
    kept = (
        fp.withColumn("dup_rank", F.row_number().over(w))
        .where(F.col("dup_rank") <= k)
    )
    sizes = fp.groupBy("__h1", "__h2").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_n")
    )
    return kept.join(sizes, ["__h1", "__h2"]).select(
        id_col,
        F.col("dup_rank").cast("bigint").alias("dup_rank"),
        "group_n",
    )


def dedup_keep_k_sql(
    docs_sql: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 2,
) -> str:
    """DuckDB twin of :func:`dedup_keep_k` — groups by the text
    string itself (exact at oracle SF)."""
    return f"""
SELECT {id_col},
       CAST(dup_rank AS BIGINT) AS dup_rank,
       CAST(group_n AS BIGINT) AS group_n
FROM (SELECT {id_col},
             row_number() OVER (PARTITION BY {text_col}
                                ORDER BY {id_col}) AS dup_rank,
             COUNT(*) OVER (PARTITION BY {text_col}) AS group_n
      FROM {docs_sql}) AS __kk
WHERE dup_rank <= {k}
"""
