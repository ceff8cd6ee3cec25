"""Similarity search over embedding columns.

Brute-force cosine top-k is the exactness baseline: broadcast the
(small) query set, one pass over the corpus, per-query top-k via
window — never a global sort. The LSH variant buckets vectors by
random-hyperplane sign bits so candidate generation is a bucket-local
join — the 100 TB path where brute force against every corpus vector
is off the table.

Physical shape: pair joins carry the whole quantized vector array and
compute dots with a sequential ``aggregate(zip_with(...))`` fold in
codegen — 64× less shuffle traffic than exploding components, and the
sequential integer fold is exact and order-independent, so results
are reproducible across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import stable_hash40, stable_hash40_py
from umls2rdf_spark.functions.vectors import quantize
from umls2rdf_spark.operators.spread import spread_small_input


def auto_planes(n: int, target_bucket: int = 8) -> int:
    """Hyperplane count for ~``target_bucket`` expected vectors per
    bucket: ``round(log2(n / target_bucket))``, min 1.

    With 2^planes buckets the per-bucket pair work stays ~n x
    target_bucket as the corpus grows, instead of the O(n²/2^planes)
    a FIXED plane count degrades to (measured 7.6x at 10x data with
    planes pinned at 4 — SCALE.md round 1)."""
    import math

    if n <= target_bucket:
        return 1
    return max(1, round(math.log2(n / target_bucket)))



def _corpus_n(vectors: DataFrame, known_n: int | None) -> int:
    """Corpus cardinality for the auto-sizing knobs without a Spark
    job when avoidable: an explicitly supplied ``known_n`` wins (the
    caller often has it — a manifest, a footer count, the previous
    pipeline stage), else parquet footer metadata when the frame is a
    pure scan/projection, else one distributed count()."""
    if known_n is not None:
        return int(known_n)
    from umls2rdf_spark.operators.sessionize import _scan_only_row_count

    n = _scan_only_row_count(vectors)
    return n if n is not None else vectors.count()


def _dot_expr(a: str, b: str, dim: int) -> Column:
    """Exact integer dot product of two array<bigint> columns named
    ``a``/``b``, as an unrolled subscript expression.

    Spark's higher-order-function lambdas (aggregate/zip_with) fall
    outside whole-stage codegen and evaluate interpreted — measured
    ~10x slower on pair joins. An unrolled ``a[0]*b[0] + ...`` chain
    stays in codegen.
    """
    return F.expr(" + ".join(f"{a}[{j}] * {b}[{j}]" for j in range(dim)))


def _with_qvec(
    df: DataFrame, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    # Quantize in its own Project (not inlined per-subscript):
    # CollapseProject refuses to duplicate a non-cheap expression
    # referenced more than once, so qvec stays materialized at this
    # node even with no exchange below it (verified against the
    # optimized plan, round 5). The spread is gated: only a
    # too-few-splits local read pays a repartition; a real multi-file
    # scan flows straight into the dot-product work shuffle-free.
    materialized = spread_small_input(
        df.select(F.col(id_col), quantize(F.col(vec_col)).alias("qvec")),
        id_col,
    )
    return materialized.withColumn("norm2", _dot_expr("qvec", "qvec", dim))


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("cos").alias("cos_sim"))
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int = 64,
    impl: str = "kernel",
    max_bucket: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector:
    (query_id, neighbor_id, rank, cos_sim), ties broken by neighbor
    id. Two result-identical implementations (equality pinned by
    test, same pattern as :func:`hard_negative_topk`):

    - ``impl="kernel"`` (default): single-bucket vectorized kernel —
      one q @ c.T int64 matmul per task instead of a ~190-node
      per-pair cosine expression evaluated row-at-a-time above the
      non-codegen BroadcastNestedLoopJoin (guide §4.2).
      ``max_bucket`` engages the completeness-preserving block-pair
      valve for corpora too big for one task.
    - ``impl="sql"``: broadcast-join the query set against the
      corpus (one corpus pass, no shuffle of the big side), cosine
      in-plan — the oracle-able pure-SQL baseline.
    """
    if impl == "kernel":
        import numpy as np

        def assign(q, probes):
            return np.zeros((q.shape[0], probes), dtype=np.int64)

        return _bucketed_role_topk(
            vectors, queries, id_col, vec_col, None,
            k=k, nprobe=1, assign_fn=assign, max_bucket=max_bucket,
        )
    corpus = _with_qvec(vectors, id_col, vec_col, dim).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("c_vec"),
        F.col("norm2").alias("c_norm2"),
    )
    qs = _with_qvec(queries, id_col, vec_col, dim).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_vec"),
        F.col("norm2").alias("q_norm2"),
    )
    scored = (
        corpus.join(
            F.broadcast(qs), F.col("query_id") != F.col("neighbor_id"), "inner"
        )
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_expr("q_vec", "c_vec", dim).cast("double")
                / F.sqrt((F.col("q_norm2") * F.col("c_norm2")).cast("double"))
            ).alias("cos"),
        )
    )
    return _rank_topk(scored, k)


def hard_negative_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 2,
    dim: int = 64,
    impl: str = "kernel",
    max_bucket: int | None = None,
) -> DataFrame:
    """Top-k most-similar vectors with a DIFFERENT label per query —
    hard-negative mining, the contrastive-training data op (the
    negatives that teach an embedding model the decision boundary
    are the near-misses, not random picks).

    Two result-identical implementations (equality pinned by test):

    - ``impl="kernel"`` (default): the single-bucket degenerate of
      :func:`_bucketed_role_topk` — every query scores against the
      whole corpus through the vectorized int64-matmul Arrow kernel.
      The SQL form's per-pair cosine is a ~190-node expression that
      Catalyst evaluates row-at-a-time above the non-codegen
      BroadcastNestedLoopJoin (measured ~310 ns per TERM per pair at
      sf0.1 — 3.0 s for 100k pairs, scaling linearly with dim);
      the kernel does the same exact arithmetic as one q @ c.T
      (guide §4.2: hand whole batches to vectorized native code).
      ``max_bucket`` engages the completeness-preserving block-pair
      valve so one huge corpus never lands in a single task.
    - ``impl="sql"``: broadcast query set, one corpus pass, exact
      quantized-int cosine in-plan, per-query window top-k — the
      oracle-able pure-SQL baseline, like cosine_topk for ANN.

    Output: (query_id, neighbor_id, rank, cos_sim), ties broken by
    neighbor id.
    """
    if impl == "kernel":
        import numpy as np

        def assign(q, probes):
            return np.zeros((q.shape[0], probes), dtype=np.int64)

        return _bucketed_role_topk(
            vectors, queries, id_col, vec_col, label_col,
            k=k, nprobe=1, assign_fn=assign, max_bucket=max_bucket,
        )
    corpus = spread_small_input(
        vectors.select(
            F.col(id_col),
            F.col(label_col).alias("__lab"),
            quantize(F.col(vec_col)).alias("qvec"),
        ),
        id_col,
    ).withColumn("norm2", _dot_expr("qvec", "qvec", dim))
    corpus = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__lab").alias("c_lab"),
        F.col("qvec").alias("c_vec"),
        F.col("norm2").alias("c_norm2"),
    )
    qs = (
        queries.select(
            F.col(id_col),
            F.col(label_col).alias("__lab"),
            quantize(F.col(vec_col)).alias("qvec"),
        )
        .withColumn("norm2", _dot_expr("qvec", "qvec", dim))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("__lab").alias("q_lab"),
            F.col("qvec").alias("q_vec"),
            F.col("norm2").alias("q_norm2"),
        )
    )
    scored = corpus.join(
        F.broadcast(qs),
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("q_lab") != F.col("c_lab")),
        "inner",
    ).select(
        "query_id",
        "neighbor_id",
        (
            _dot_expr("q_vec", "c_vec", dim).cast("double")
            / F.sqrt((F.col("q_norm2") * F.col("c_norm2")).cast("double"))
        ).alias("cos"),
    )
    return _rank_topk(scored, k)


def hard_negative_topk_lsh(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 2,
    planes: int | None = 4,
    dim: int = 64,
    nprobe: int = 1,
    target_bucket: int = 8,
    known_n: int | None = None,
    queries: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Bucketed hard-negative mining — the scale form of
    :func:`hard_negative_topk` for its realistic corpus-as-queries
    workload, where the exact broadcast scorer is O(n²).

    Same hyperplane machinery as :func:`lsh_cosine_topk`: vectors
    bucket by sign bits (map-side, zero shuffles), scoring runs
    per-bucket (int64 matmul, exact quantized cosine) with the
    DIFFERENT-label predicate applied as a mask inside the kernel,
    and a global window re-ranks the per-bucket winners. Per-bucket
    pair work is ~n x target_bucket instead of n², and the only
    shuffle is the featurized (id, label, qvec, norm2) frame.

    - ``queries=None`` (default): every corpus vector mines its own
      negatives — the contrastive-training shape.
    - ``queries=<frame>``: corpus vectors are residents only; query
      vectors probe buckets without joining the corpus side.
    - ``nprobe`` is the recall lever, exactly as in
      :func:`lsh_cosine_topk`: each query additionally probes the
      nprobe-1 buckets reached by flipping its lowest-|margin| sign
      bits. Corpus residency stays single-bucket, so a (query,
      neighbor) pair is scored at most once and recall is monotone
      in nprobe (property-tested).

    - ``max_bucket`` is the skew valve, and unlike the top-k ops'
      lossy salting it is COMPLETENESS-PRESERVING (the imagededup
      block-pair construction adapted to query × corpus): an
      oversized bucket's corpus residents split into r =
      ceil(size/max_bucket) deterministic id-hash classes, and that
      bucket's QUERY rows replicate to all r classes — every (query,
      resident) pair meets exactly once, so the result is IDENTICAL
      to the unsalted run (property-pinned) at the price of r× query
      replication inside oversized buckets only. The kernel's pair
      work drops from size² to r · (size/r · queries). Composes with
      ``nprobe`` (the probe's target bucket salts the same way).

    The exact :func:`hard_negative_topk` stays as the oracle-able
    baseline, like cosine_topk beside lsh_cosine_topk; recall-vs-
    exact calibration lives in SCALE.md.

    Output: (query_id, neighbor_id, rank, cos_sim), ties broken by
    neighbor id.
    """
    import numpy as np

    if planes is None:
        planes = auto_planes(_corpus_n(vectors, known_n), target_bucket)
    nprobe = max(1, min(nprobe, planes + 1))
    coeff = hyperplane_bucket_expr(dim, planes)
    plane_mat = np.array(
        [[coeff(i, j) for j in range(dim)] for i in range(planes)],
        dtype=np.int64,
    )

    # NOTE: a plain closure over locals (plane_mat/planes + numpy) —
    # cloudpickle ships it by value inside the shared featurize; see
    # lsh_cosine_topk.
    def assign(q, probes):
        sign_dots = q @ plane_mat.T
        bucket = (
            ((sign_dots > 0) << np.arange(planes)).sum(axis=1)
        ).astype(np.int64)
        cols = [bucket]
        if probes > 1:
            flip_order = np.argsort(
                np.abs(sign_dots), axis=1, kind="stable"
            )
            for j in range(probes - 1):
                cols.append(bucket ^ (1 << flip_order[:, j]))
        return np.stack(cols, axis=1)

    return _bucketed_role_topk(
        vectors, queries, id_col, vec_col, label_col,
        k=k, nprobe=nprobe, assign_fn=assign, max_bucket=max_bucket,
    )


def _bucketed_role_topk(
    vectors: DataFrame,
    queries: DataFrame | None,
    id_col: str,
    vec_col: str,
    label_col: str | None,
    k: int,
    nprobe: int,
    assign_fn,
    max_bucket: int | None = None,
    metric: str = "cos",
) -> DataFrame:
    """Shared assembly for the bucketed hard-negative family
    (:func:`hard_negative_topk_lsh` / :func:`hard_negative_topk_ivf`)
    and the exact scorers' single-bucket kernel path:
    quantize → bucket via ``assign_fn`` → role-aware per-bucket
    kernel → global re-rank. ``assign_fn(q, probes)`` maps an
    (n, dim) int64 matrix to an (n, probes) bucket matrix, column 0
    the primary residency bucket; it must be a plain closure
    (locals + numpy only) so cloudpickle ships the whole featurize
    by value. ``max_bucket`` routes through the completeness-
    preserving block-pair valve for either variant.
    ``label_col=None`` turns the different-label mask off (plain
    nearest-neighbor mining); ``metric`` picks the kernel score
    (``cos`` float desc / ``l2`` exact-int dist2 asc)."""
    feat_schema = (
        f"{id_col} long, lab string, qvec array<long>, norm2 long, "
        "bucket int, is_corpus boolean, is_query boolean"
    )

    def make_featurize(as_corpus: bool, as_query: bool, probes: int):
        def featurize(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.vstack(pdf[vec_col].values).astype(np.float64)
                Y = V * 1000
                # round half away from zero — matches Spark/DuckDB
                # round(), NOT numpy's banker's rounding
                q = (np.sign(Y) * np.floor(np.abs(Y) + 0.5)).astype(
                    np.int64
                )
                norm2 = (q * q).sum(axis=1)
                buckets = assign_fn(q, probes)
                base = {
                    id_col: pdf[id_col].values,
                    "lab": pdf["lab"].values,
                    "qvec": list(q),
                    "norm2": norm2,
                }
                frames = [
                    pd.DataFrame(
                        {
                            **base,
                            "bucket": buckets[:, 0].astype(np.int32),
                            "is_corpus": as_corpus,
                            "is_query": as_query,
                        }
                    )
                ]
                for j in range(1, probes):
                    frames.append(
                        pd.DataFrame(
                            {
                                **base,
                                "bucket": buckets[:, j].astype(np.int32),
                                "is_corpus": False,
                                "is_query": True,
                            }
                        )
                    )
                yield pd.concat(frames, ignore_index=True)

        return featurize

    def prep(df: DataFrame) -> DataFrame:
        lab = (
            F.col(label_col).cast("string")
            if label_col is not None
            else F.lit(None).cast("string")
        )
        return df.select(F.col(id_col), lab.alias("lab"), F.col(vec_col))

    if queries is None:
        feat = spread_small_input(prep(vectors), id_col).mapInPandas(
            make_featurize(True, True, nprobe), schema=feat_schema
        )
    else:
        cfeat = spread_small_input(prep(vectors), id_col).mapInPandas(
            make_featurize(True, False, 1), schema=feat_schema
        )
        qfeat = prep(queries).mapInPandas(
            make_featurize(False, True, nprobe), schema=feat_schema
        )
        feat = cfeat.unionByName(qfeat)
    group_cols = ["bucket"]
    if max_bucket is not None:
        feat = _salt_block_pairs(feat, id_col, max_bucket)
        group_cols = ["bucket", "__salt"]
    score_type = "dist2 long" if metric == "l2" else "cos double"
    local = feat.groupBy(*group_cols).applyInPandas(
        _role_topk_fn(
            id_col, k, label_aware=label_col is not None, metric=metric
        ),
        schema=f"query_id long, neighbor_id long, {score_type}",
    )
    if metric == "l2":
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist2").asc(), F.col("neighbor_id").asc()
        )
        return (
            local.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "dist2")
        )
    return _rank_topk(local, k)


def hard_negative_topk_ivf(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 2,
    cells: int | None = 8,
    dim: int = 64,
    centroids: list[list[int]] | None = None,
    nprobe: int = 1,
    known_n: int | None = None,
    queries: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """IVF-cell hard-negative mining — the inverted-file sibling of
    :func:`hard_negative_topk_lsh` (same role-aware kernel, same
    different-label mask, same exact-baseline relationship to
    :func:`hard_negative_topk`): vectors assign to their nearest
    centroid (exact int64 squared-L2, ties to the lowest cell id;
    trained matrix from :func:`train_ivf_centroids` or the
    deterministic grid), corpus residency is single-cell, and
    ``nprobe`` lets queries probe their nprobe nearest cells — a
    neighbor is scored at most once, recall monotone in nprobe.
    nprobe = cells degenerates to the exact result. ``queries``
    switches to the separate-query-frame form; ``max_bucket`` routes
    through the same completeness-preserving block-pair valve as the
    LSH form (shared assembly).
    """
    import numpy as np

    if centroids is not None:
        cent = np.array(centroids, dtype=np.int64)
    else:
        if cells is None:
            cells = auto_cells(_corpus_n(vectors, known_n))
        cent = np.array(
            [[ivf_centroid(i, j) for j in range(dim)] for i in range(cells)],
            dtype=np.int64,
        )
    nprobe = max(1, min(nprobe, len(cent)))

    def assign(q, probes):
        d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return np.argsort(d2, axis=1, kind="stable")[:, :probes]

    return _bucketed_role_topk(
        vectors, queries, id_col, vec_col, label_col,
        k=k, nprobe=nprobe, assign_fn=assign, max_bucket=max_bucket,
    )


def _salt_block_pairs(
    feat: DataFrame, id_col: str, max_bucket: int
) -> DataFrame:
    """Completeness-preserving skew valve for query-vs-corpus bucket
    kernels: a bucket whose CORPUS residency exceeds ``max_bucket``
    splits its residents into r = ceil(size/max_bucket) deterministic
    id-hash classes and replicates its query rows to ALL r classes —
    every (query, resident) pair meets in exactly one (bucket, salt)
    group, so downstream results are identical to the unsalted run.
    Un-split buckets pass through with salt 0; the broadcast counts
    frame holds only the oversized buckets (bounded, same argument
    as imagededup's valve)."""
    counts = (
        feat.where(F.col("is_corpus"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") > max_bucket)
    )
    nsplit = F.expr(f"(__cnt + {max_bucket} - 1) div {max_bucket}")
    j = (
        feat.join(F.broadcast(counts), "bucket", "left")
        .withColumn("__r", F.coalesce(nsplit.cast("int"), F.lit(1)))
        .drop("__cnt")
    )
    own = F.pmod(
        stable_hash40(F.col(id_col).cast("string")), F.col("__r")
    ).cast("int")
    passthrough = j.where(F.col("__r") == 1).withColumn(
        "__salt", F.lit(0).cast("int")
    )
    corpus_part = (
        j.where((F.col("__r") > 1) & F.col("is_corpus"))
        .withColumn("__salt", own)
        .withColumn("is_query", F.lit(False))
    )
    query_part = (
        j.where((F.col("__r") > 1) & F.col("is_query"))
        .withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.col("__r") - 1))
        )
        .withColumn("is_corpus", F.lit(False))
    )
    return (
        passthrough.unionByName(corpus_part)
        .unionByName(query_part)
        .drop("__r")
    )


def _labeled_topk_fn(id_col: str, k: int):
    """Per-bucket hard-negative kernel — see :func:`_role_topk_fn`
    with the same-label mask on."""
    return _role_topk_fn(id_col, k, label_aware=True)


def _role_topk_fn(
    id_col: str, k: int, label_aware: bool = False, metric: str = "cos"
):
    """Per-bucket role-aware top-k kernel: rows tagged is_corpus are
    the bucket's residents, rows tagged is_query mine against them
    (the two roles separate so the block-pair skew valve can split
    residents while replicating queries); same-id pairs — and, when
    ``label_aware``, SAME-label pairs — are masked out; exact int64
    dots, deterministic (best score first, neighbor id asc) ordering.
    ``metric="cos"`` emits a float64 ``cos`` column (dot / sqrt of the
    int64 norm product — the SQL baseline's exact IEEE sequence);
    ``metric="l2"`` emits an int64 ``dist2`` column (|q|^2 + |c|^2 -
    2<q,c>, every term exact int64) ordered ascending. Closure over
    plain locals so cloudpickle ships it by value."""
    import numpy as np
    import pandas as pd

    score_col = "dist2" if metric == "l2" else "cos"
    score_dtype = "int64" if metric == "l2" else "float64"

    def hn_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": [], "neighbor_id": [], score_col: []}
        ).astype(
            {
                "query_id": "int64",
                "neighbor_id": "int64",
                score_col: score_dtype,
            }
        )
        corpus = pdf[pdf["is_corpus"]]
        qs = pdf[pdf["is_query"]]
        if len(corpus) == 0 or len(qs) == 0:
            return empty
        q = np.vstack(qs["qvec"].values).astype(np.int64)
        c = np.vstack(corpus["qvec"].values).astype(np.int64)
        qids = qs[id_col].values.astype(np.int64)
        cids = corpus[id_col].values.astype(np.int64)
        if metric == "l2":
            qn = qs["norm2"].values.astype(np.int64)
            cn = corpus["norm2"].values.astype(np.int64)
            score = qn[:, None] + cn[None, :] - 2 * (q @ c.T)
            # sort key only: float64 is order-exact for |dist2| <
            # 2^53 (quantized coords keep dist2 far below that);
            # emitted values stay int64
            skey = -score.astype(np.float64)
        else:
            score = (q @ c.T) / np.sqrt(
                np.outer(
                    qs["norm2"].values.astype(np.float64),
                    corpus["norm2"].values.astype(np.float64),
                )
            )
            skey = score
        blocked = qids[:, None] == cids[None, :]
        if label_aware:
            qlab = qs["lab"].values
            clab = corpus["lab"].values
            # three-valued '<>' semantics, matching the exact
            # baseline's Spark predicate and the SQL twin: a NULL
            # label can never form a DIFFERENT-label pair, so null
            # rows are masked on BOTH sides (object-array == alone
            # would keep null-vs-labeled pairs: None == 'x' is
            # False, not unknown)
            blocked |= qlab[:, None] == clab[None, :]
            blocked |= pd.isnull(qlab)[:, None]
            blocked |= pd.isnull(clab)[None, :]
        skey = skey.copy()
        skey[blocked] = -np.inf
        rows = []
        kk = min(k, len(cids))
        for i in range(len(qids)):
            order = np.lexsort((cids, -skey[i]))[:kk]
            keep = skey[i][order] > -np.inf
            if not keep.any():
                continue
            rows.append(
                pd.DataFrame(
                    {
                        "query_id": qids[i],
                        "neighbor_id": cids[order[keep]],
                        score_col: score[i][order[keep]],
                    }
                )
            )
        if not rows:
            return empty
        return pd.concat(rows, ignore_index=True)

    return hn_topk


def hyperplane_bucket_expr(dim: int, planes: int):
    """Deterministic pseudo-random hyperplanes: component j of plane
    i is md5-derived (engine-neutral — the same constants are inlined
    into oracle SQL).

    md5 derivation is load-bearing, not style: the earlier
    linear-congruential grid ((i*A + j*B) mod 1009 - 504) made every
    plane a shifted copy of ONE arithmetic progression — pairwise
    plane |cosine| up to 0.995 (vs ~0.12 for independent planes), so
    the "planes" sign bits were nearly redundant and bucket quality
    silently collapsed, the same failure class as the non-wrapping
    minhash modulus."""
    def coeff(i: int, j: int) -> int:
        return stable_hash40_py(f"plane-{i}-{j}") % 1009 - 504

    return coeff


def lsh_bucket_ids(
    vectors: DataFrame, id_col: str, vec_col: str, planes: int = 4, dim: int = 64
) -> DataFrame:
    """(id, bucket): sign-bit bucket from ``planes`` fixed hyperplanes.

    Pure map-side: each plane's dot product is a fold against a
    constant array — zero shuffles.
    """
    coeff = hyperplane_bucket_expr(dim, planes)
    qv = _with_qvec(vectors, id_col, vec_col, dim)
    bucket = None
    for i in range(planes):
        pdot = F.expr(
            " + ".join(f"qvec[{j}] * ({coeff(i, j)})" for j in range(dim))
        )
        bit = F.when(pdot > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return qv.select(F.col(id_col), bucket.alias("bucket"))


def lsh_cosine_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    planes: int | None = 4,
    dim: int = 64,
    target_bucket: int = 8,
    max_bucket: int | None = None,
    known_n: int | None = None,
    nprobe: int = 1,
    salt_mode: str = "subsample",
) -> DataFrame:
    """Approximate top-k: cosine ranking restricted to same-bucket
    pairs — the corpus-vs-corpus scale path.

    Implemented as mapInPandas (quantize + bucket, one vectorized
    pass) → groupBy(bucket).applyInPandas (per-bucket int64 matmul +
    top-k). Pure-relational formulations were measured first: a
    zip_with/aggregate fold runs interpreted (HOFs are outside
    whole-stage codegen) and a 64-term unrolled subscript sum blows
    the JIT method limit — both ~10x slower than the Arrow/numpy
    path. All math is exact int64 (quantized comps ≤ 2^10, dots ≤
    2^27), so results still hash-match the SQL oracle bit-for-bit;
    only the shuffled data is (id, qvec, norm2, bucket).

    Scale controls:
    - ``planes=None`` sizes the bucket space from the corpus:
      :func:`auto_planes` (one count() pass; pass ``planes``
      explicitly to skip it when the cardinality is known).
    - ``max_bucket`` splits any bucket bigger than that into
      ceil(size/max_bucket) deterministic sub-buckets keyed by
      ``stable_hash40(id)`` — a skewed bucket (all vectors on one
      side of every plane) re-quadratizes without this. The split is
      engine-neutral, so the SQL oracle reproduces it bit-for-bit;
      the recall cost is the documented ANN trade-off.
    - ``nprobe`` > 1 is the recall lever (multi-probe LSH, the
      counterpart of IVF's nprobe): each vector additionally queries
      the nprobe-1 buckets reached by flipping its lowest-|margin|
      hyperplane bits one at a time — the planes the vector sits
      closest to, i.e. the most likely sign flips for a true
      neighbor. Corpus membership stays single-bucket, so a neighbor
      is scored at most once per probed bucket and a global re-rank
      merges the probes; query rows duplicate ~nprobe×, the corpus
      does not. Recall is monotone in nprobe (probing more buckets
      only adds candidates — property-tested); capped at planes+1
      (single-bit perturbations). Not composable with the default
      ``max_bucket`` salting (probe buckets don't know the salt
      split) — compose via ``salt_mode="exact"`` instead.
    - ``salt_mode="exact"`` upgrades the ``max_bucket`` valve to the
      COMPLETENESS-PRESERVING block-pair construction (round 6, same
      as hard_negative_topk_lsh): oversized buckets split their
      resident side into r id-hash classes and replicate their query
      side to all r, so every pair still meets exactly once and
      results are IDENTICAL to unsalted (property-pinned) — no
      recall loss, at r× query replication inside oversized buckets
      only. Composes with ``nprobe``. The default "subsample" mode
      stays for oracle compatibility and for corpora where dropping
      cross-class pairs of a degenerate bucket is the cheaper,
      documented ANN trade.
    """
    import numpy as np
    import pandas as pd

    if planes is None:
        planes = auto_planes(_corpus_n(vectors, known_n), target_bucket)
    if salt_mode not in ("subsample", "exact"):
        raise ValueError(f"salt_mode must be subsample or exact: {salt_mode}")
    if nprobe > 1 and max_bucket is not None and salt_mode != "exact":
        raise ValueError(
            "nprobe > 1 composes with max_bucket only under "
            "salt_mode='exact'"
        )
    nprobe = max(1, min(nprobe, planes + 1))
    coeff = hyperplane_bucket_expr(dim, planes)
    plane_mat = np.array(
        [[coeff(i, j) for j in range(dim)] for i in range(planes)],
        dtype=np.int64,
    )
    out_id = "query_id"

    # NOTE: these closures must be fully self-contained (locals +
    # numpy/pandas only). A reference to anything module-level in
    # umls2rdf_spark makes cloudpickle serialize it BY REFERENCE and
    # worker pythons that lack the repo on sys.path crash with
    # ModuleNotFoundError.
    def featurize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            Y = V * 1000
            # round half away from zero — matches Spark/DuckDB
            # round(), NOT numpy's banker's rounding
            q = (np.sign(Y) * np.floor(np.abs(Y) + 0.5)).astype(np.int64)
            norm2 = (q * q).sum(axis=1)
            sign_dots = q @ plane_mat.T
            bucket = ((sign_dots > 0) << np.arange(planes)).sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "qvec": list(q),
                    "norm2": norm2,
                    "bucket": bucket.astype(np.int32),
                }
            )

    def featurize_probe(batches):
        # home bucket as corpus+query, then the nprobe-1 single-bit
        # flips in ascending |margin| order as query-only probes.
        # Stable argsort: equal margins keep ascending plane order,
        # deterministic across engines/batches.
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            Y = V * 1000
            q = (np.sign(Y) * np.floor(np.abs(Y) + 0.5)).astype(np.int64)
            norm2 = (q * q).sum(axis=1)
            sign_dots = q @ plane_mat.T
            bucket = (
                ((sign_dots > 0) << np.arange(planes)).sum(axis=1)
            ).astype(np.int64)
            flip_order = np.argsort(
                np.abs(sign_dots), axis=1, kind="stable"
            )
            frames = [
                pd.DataFrame(
                    {
                        id_col: pdf[id_col].values,
                        "qvec": list(q),
                        "norm2": norm2,
                        "bucket": bucket.astype(np.int32),
                        "is_corpus": True,
                    }
                )
            ]
            for j in range(nprobe - 1):
                flipped = bucket ^ (1 << flip_order[:, j])
                frames.append(
                    pd.DataFrame(
                        {
                            id_col: pdf[id_col].values,
                            "qvec": list(q),
                            "norm2": norm2,
                            "bucket": flipped.astype(np.int32),
                            "is_corpus": False,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    part = spread_small_input(vectors, id_col)
    probe_schema = (
        f"{id_col} long, qvec array<long>, norm2 long, bucket int, "
        "is_corpus boolean"
    )
    if max_bucket is not None and salt_mode == "exact":
        feat = part.mapInPandas(
            featurize_probe, schema=probe_schema
        ).withColumn("is_query", F.lit(True))
        feat = _salt_block_pairs(feat, id_col, max_bucket)
        local = feat.groupBy("bucket", "__salt").applyInPandas(
            _role_topk_fn(id_col, k),
            schema="query_id long, neighbor_id long, cos double",
        )
        return _rank_topk(local, k)
    if nprobe > 1:
        local = (
            part.mapInPandas(featurize_probe, schema=probe_schema)
            .groupBy("bucket")
            .applyInPandas(
                _probe_topk_fn(id_col, k),
                schema="query_id long, neighbor_id long, cos double",
            )
        )
        return _rank_topk(local, k)

    feat_schema = f"{id_col} long, qvec array<long>, norm2 long, bucket int"
    feat = part.mapInPandas(featurize, schema=feat_schema)
    feat = salt_oversized_buckets(feat, id_col, max_bucket)
    group_cols = ["bucket"] if max_bucket is None else ["bucket", "salt"]
    return _grouped_topk(feat, id_col, k, group_cols=group_cols)


def salt_oversized_buckets(
    feat: DataFrame, id_col: str, max_bucket: int | None
) -> DataFrame:
    """Add a deterministic ``salt`` column splitting buckets larger
    than ``max_bucket`` into ceil(size/max_bucket) sub-buckets
    (stable_hash40 of the id — engine-neutral, so SQL oracles can
    replicate the split). No-op when ``max_bucket`` is None.

    The bucket-count side is 2^planes rows — broadcast, never a
    shuffle of the featurized fact."""
    if max_bucket is None:
        return feat
    counts = feat.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    nsplit = F.expr(f"(cnt + {max_bucket} - 1) div {max_bucket}")
    return (
        feat.join(F.broadcast(counts), "bucket")
        .withColumn(
            "salt",
            F.when(
                F.col("cnt") > max_bucket,
                F.pmod(stable_hash40(F.col(id_col).cast("string")), nsplit),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("cnt")
    )


def _grouped_topk(
    feat: DataFrame,
    id_col: str,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group exact cosine top-k over a featurized frame
    (id, qvec, norm2, bucket[, salt]) — int64 matmul per group,
    deterministic ordering (cos desc, neighbor id asc)."""
    import numpy as np
    import pandas as pd

    group_cols = group_cols or ["bucket"]
    out_id = "query_id"

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {out_id: [], "neighbor_id": [], "rank": [], "cos_sim": []}
            ).astype(
                {out_id: "int64", "neighbor_id": "int64",
                 "rank": "int32", "cos_sim": "float64"}
            )
        q = np.vstack(pdf["qvec"].values).astype(np.int64)
        ids = pdf[id_col].values.astype(np.int64)
        n2 = pdf["norm2"].values.astype(np.float64)
        dots = q @ q.T  # exact int64
        cos = dots / np.sqrt(np.outer(n2, n2))
        np.fill_diagonal(cos, -np.inf)
        rows = []
        kk = min(k, n - 1)
        for i in range(n):
            order = np.lexsort((ids, -cos[i]))[:kk]
            rows.append(
                pd.DataFrame(
                    {
                        out_id: ids[i],
                        "neighbor_id": ids[order],
                        "rank": np.arange(1, kk + 1, dtype=np.int32),
                        "cos_sim": cos[i][order],
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    out_schema = (
        f"{out_id} long, neighbor_id long, rank int, cos_sim double"
    )
    return feat.groupBy(*group_cols).applyInPandas(
        bucket_topk, schema=out_schema
    )


def _probe_topk_fn(id_col: str, k: int):
    """Factory for the per-bucket probe top-k kernel shared by the
    multi-probe LSH and IVF paths: rows tagged is_corpus are the
    bucket's residents, every row is a query; exact int64 dots,
    deterministic (cos desc, neighbor id asc) ordering. Returned as
    a closure over plain locals so cloudpickle ships it by value
    (module-level callables pickle by reference and break on workers
    without the repo on sys.path)."""
    import numpy as np
    import pandas as pd

    def probe_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "cos": []}
        ).astype(
            {"query_id": "int64", "neighbor_id": "int64", "cos": "float64"}
        )
        corpus = pdf[pdf["is_corpus"]]
        if len(corpus) == 0 or len(pdf) < 2:
            return empty
        q = np.vstack(pdf["qvec"].values).astype(np.int64)
        c = np.vstack(corpus["qvec"].values).astype(np.int64)
        qids = pdf[id_col].values.astype(np.int64)
        cids = corpus[id_col].values.astype(np.int64)
        cos = (q @ c.T) / np.sqrt(
            np.outer(
                pdf["norm2"].values.astype(np.float64),
                corpus["norm2"].values.astype(np.float64),
            )
        )
        cos[qids[:, None] == cids[None, :]] = -np.inf
        rows = []
        kk = min(k, len(cids))
        for i in range(len(qids)):
            order = np.lexsort((cids, -cos[i]))[:kk]
            keep = cos[i][order] > -np.inf
            if not keep.any():
                continue
            rows.append(
                pd.DataFrame(
                    {
                        "query_id": qids[i],
                        "neighbor_id": cids[order[keep]],
                        "cos": cos[i][order[keep]],
                    }
                )
            )
        if not rows:
            return empty
        return pd.concat(rows, ignore_index=True)

    return probe_topk


def ivf_centroid(cell: int, j: int) -> int:
    """Deterministic pseudo-random centroid grid: component j of cell
    centroid i — engine-neutral integers matching the quantized
    embedding range (±~500). md5-derived so the seed cells are
    actually spread (the earlier linear-congruential grid made cells
    shifted copies of one progression — near-parallel seeds cluster
    the initial assignment; see hyperplane_bucket_expr)."""
    return stable_hash40_py(f"ivf-{cell}-{j}") % 1001 - 500


def auto_cells(n: int) -> int:
    """IVF cell count ~ sqrt(n) — the classic inverted-file balance.

    Per-cell exact search costs cells x (n/cells)^2 = n^2/cells and
    Lloyd training costs n x cells per iteration; cells = sqrt(n)
    makes BOTH n^1.5, the best joint bound a single knob gives. A
    FIXED cell count degrades quadratically instead, exactly like the
    round-1 fixed-plane LSH (SCALE.md): 10x corpus -> 100x per-cell
    pair work. Demos pin cells to the oracle-generation constant;
    production callers pass cells=None to get this."""
    import math

    return max(1, round(math.sqrt(max(1, n))))


def cosine_near_dup_pairs(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos: float,
    planes: int | None = None,
    dim: int = 64,
    target_bucket: int = 8,
    max_bucket: int | None = None,
    known_n: int | None = None,
    salt_mode: str = "subsample",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs
    whose exact quantized cosine is >= ``min_cos``, candidates bounded
    by the same adaptive hyperplane bucketing (+ optional salting) as
    :func:`lsh_cosine_topk` — the dedup-flavored output shape (pair
    list to feed connected components) rather than per-query top-k.
    All math exact int64, so a SQL oracle reproduces it bit-for-bit.

    ``salt_mode="exact"`` (round 6) upgrades the ``max_bucket`` valve
    to the completeness-preserving block-pair construction: an
    oversized bucket's residents split into r id-hash classes,
    queries replicate to all r, and the kernel emits a pair ONLY
    from the group whose resident side holds the LARGER id
    (query < resident) — every unordered pair surfaces exactly once,
    so the pair set is IDENTICAL to unsalted (property-pinned). The
    default subsample mode keeps the documented drop of cross-class
    pairs inside degenerate buckets.
    """
    import numpy as np
    import pandas as pd

    if planes is None:
        planes = auto_planes(_corpus_n(vectors, known_n), target_bucket)
    coeff = hyperplane_bucket_expr(dim, planes)
    plane_mat = np.array(
        [[coeff(i, j) for j in range(dim)] for i in range(planes)],
        dtype=np.int64,
    )

    def featurize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            Y = V * 1000
            q = (np.sign(Y) * np.floor(np.abs(Y) + 0.5)).astype(np.int64)
            norm2 = (q * q).sum(axis=1)
            sign_dots = q @ plane_mat.T
            bucket = ((sign_dots > 0) << np.arange(planes)).sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "qvec": list(q),
                    "norm2": norm2,
                    "bucket": bucket.astype(np.int32),
                }
            )

    if salt_mode not in ("subsample", "exact"):
        raise ValueError(f"salt_mode must be subsample or exact: {salt_mode}")
    feat_schema = f"{id_col} long, qvec array<long>, norm2 long, bucket int"
    feat = spread_small_input(vectors, id_col).mapInPandas(
        featurize, schema=feat_schema
    )
    threshold = float(min_cos)
    if max_bucket is not None and salt_mode == "exact":
        roled = feat.withColumn("is_corpus", F.lit(True)).withColumn(
            "is_query", F.lit(True)
        )
        roled = _salt_block_pairs(roled, id_col, max_bucket)
        return roled.groupBy("bucket", "__salt").applyInPandas(
            _role_pairs_fn(id_col, threshold),
            schema="id_a long, id_b long, cos_sim double",
        )
    feat = salt_oversized_buckets(feat, id_col, max_bucket)
    group_cols = ["bucket"] if max_bucket is None else ["bucket", "salt"]

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], "cos_sim": []}
        ).astype({"id_a": "int64", "id_b": "int64", "cos_sim": "float64"})
        if n < 2:
            return empty
        q = np.vstack(pdf["qvec"].values).astype(np.int64)
        ids = pdf[id_col].values.astype(np.int64)
        order = np.argsort(ids)
        q, ids = q[order], ids[order]
        n2 = pdf["norm2"].values.astype(np.float64)[order]
        cos = (q @ q.T) / np.sqrt(np.outer(n2, n2))
        iu = np.triu_indices(n, k=1)
        keep = cos[iu] >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "id_a": ids[iu[0][keep]],
                "id_b": ids[iu[1][keep]],
                "cos_sim": cos[iu][keep],
            }
        )

    return feat.groupBy(*group_cols).applyInPandas(
        bucket_pairs, schema="id_a long, id_b long, cos_sim double"
    )


def _role_pairs_fn(id_col: str, threshold: float):
    """Per-group near-dup PAIR kernel for the block-pair valve: a
    pair is emitted only when the QUERY side holds the smaller id —
    with queries replicated to every salt class and residents in
    exactly one, the unordered pair {a, b} (a < b) then surfaces
    only in b's resident class: exactly once, no post-distinct.
    Closure over plain locals (cloudpickle by-value)."""
    import numpy as np
    import pandas as pd

    def role_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], "cos_sim": []}
        ).astype({"id_a": "int64", "id_b": "int64", "cos_sim": "float64"})
        corpus = pdf[pdf["is_corpus"]]
        qs = pdf[pdf["is_query"]]
        if len(corpus) == 0 or len(qs) == 0:
            return empty
        q = np.vstack(qs["qvec"].values).astype(np.int64)
        c = np.vstack(corpus["qvec"].values).astype(np.int64)
        qids = qs[id_col].values.astype(np.int64)
        cids = corpus[id_col].values.astype(np.int64)
        cos = (q @ c.T) / np.sqrt(
            np.outer(
                qs["norm2"].values.astype(np.float64),
                corpus["norm2"].values.astype(np.float64),
            )
        )
        mask = (qids[:, None] < cids[None, :]) & (cos >= threshold)
        if not mask.any():
            return empty
        qi, ci = np.nonzero(mask)
        return pd.DataFrame(
            {
                "id_a": qids[qi],
                "id_b": cids[ci],
                "cos_sim": cos[qi, ci],
            }
        )

    return role_pairs


def train_ivf_centroids(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    cells: int | None = 8,
    iters: int = 3,
    dim: int = 64,
    train_mod: int | None = None,
    known_n: int | None = None,
) -> list[list[int]]:
    """Distributed Lloyd's k-means over the quantized vectors — the
    IVF training pass. Fully deterministic so a trained index is
    reproducible (and oracle-expressible) anywhere:

    - init: the grid centroids (:func:`ivf_centroid`), the same seed
      the untrained path uses;
    - assign: exact int64 squared-L2, ties to the lowest cell id;
    - update: per-cell component-wise integer mean (exact int sums,
      floor division) — independent of partitioning and row order.

    The corpus is quantized ONCE into a persisted (qvec) frame; each
    Lloyd iteration is then one SINGLE-STAGE job over it: assignment
    + partial int sums per partition (mapInPandas), collected and
    reduced on the driver — no shuffle at all. The collect is bounded
    at cells x num_partitions rows of dim int64s (8 cells x 1000
    executors x 64 dims = 512k ints — constant in n), so the
    driver-side reduce is scale-safe; integer partial sums commute,
    so the result is independent of partitioning and row order.
    MEMORY_AND_DISK persist so a corpus bigger than cluster memory
    spills rather than OOMs — qvec is 8*dim B/row, about the raw
    fp32 array + row overhead. Empty cells keep their previous
    centroid. Returns a plain int matrix usable as
    ``ivf_cosine_topk(centroids=...)`` or to generate oracle SQL.

    ``cells=None`` derives the count via :func:`auto_cells` (one
    count() job); ``train_mod=s`` trains on the deterministic 1-in-s
    id-hash sample — the 100 TB path, where a full-corpus Lloyd pass
    is wasted precision for centroid estimation.
    """
    import numpy as np
    from pyspark import StorageLevel

    if cells is None:
        cells = auto_cells(_corpus_n(vectors, known_n))
    src = vectors
    if train_mod is not None and train_mod > 1:
        # deterministic 1/train_mod hash-sample for the training pass
        # only (centroid quality needs a representative sample, not
        # every row) — the full corpus is still indexed/probed.
        # Partition/order-invariant: membership depends on the id hash.
        src = src.where(
            F.pmod(
                stable_hash40(F.col(id_col).cast("string")),
                F.lit(train_mod),
            )
            == 0
        )
    cent = np.array(
        [[ivf_centroid(i, j) for j in range(dim)] for i in range(cells)],
        dtype=np.int64,
    )

    def quantize_batches(batches):
        import pandas as pd_

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            Y = V * 1000
            q = (np.sign(Y) * np.floor(np.abs(Y) + 0.5)).astype(np.int64)
            yield pd_.DataFrame({"qvec": list(q)})

    # quantization is map-side — no repartition: the Lloyd partials
    # are commutative integer sums reduced on the driver, so the
    # result is identical under ANY partitioning, and a shuffle here
    # would move every training vector for nothing
    quant = (
        src.select(F.col(id_col), F.col(vec_col))
        .mapInPandas(quantize_batches, schema="qvec array<long>")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        for _ in range(iters):
            cmat = cent.copy()

            def partials(batches):
                import pandas as pd_

                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    q = np.vstack(pdf["qvec"].values).astype(np.int64)
                    d2 = ((q[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
                    cell = d2.argmin(axis=1)
                    rows = []
                    for c in np.unique(cell):
                        sel = q[cell == c]
                        rows.append(
                            (int(c), [int(x) for x in sel.sum(axis=0)], len(sel))
                        )
                    yield pd_.DataFrame(
                        rows, columns=["cell", "sums", "cnt"]
                    )

            parts = quant.mapInPandas(
                partials, schema="cell int, sums array<long>, cnt long"
            ).collect()
            sums = np.zeros((cells, dim), dtype=np.int64)
            cnts = np.zeros(cells, dtype=np.int64)
            for row in parts:
                sums[row["cell"]] += np.array(row["sums"], dtype=np.int64)
                cnts[row["cell"]] += row["cnt"]
            new_cent = cent.copy()
            nonempty = cnts > 0
            new_cent[nonempty] = sums[nonempty] // cnts[nonempty, None]
            cent = new_cent
    finally:
        quant.unpersist()
    return [[int(x) for x in row] for row in cent]


def ivf_cosine_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    cells: int | None = 8,
    dim: int = 64,
    centroids: list[list[int]] | None = None,
    nprobe: int = 1,
    known_n: int | None = None,
) -> DataFrame:
    """IVF-style ANN: assign each vector to its nearest centroid
    (exact integer squared-L2, ties to the lowest cell id), then exact
    cosine top-k within the cell — the inverted-file counterpart of
    the hyperplane LSH path. ``centroids`` takes a trained matrix
    from :func:`train_ivf_centroids`; default is the deterministic
    grid, which the demo keeps so its SQL oracle stays a fixed text.
    ``cells=None`` sizes the grid via :func:`auto_cells` (~sqrt(n),
    one count() job) — the scale path: a FIXED cell count makes the
    per-cell exact search degrade quadratically with corpus growth.

    ``nprobe`` is the standard IVF recall lever: each vector probes
    its nprobe nearest cells as a query while remaining corpus in
    only its own cell (so every (query, neighbor) pair is scored at
    most once), with a global per-query re-rank after the bucket
    stage. nprobe=1 is the original single-cell path (the demo's
    oracle shape); nprobe=cells degenerates to exact brute force —
    property-tested equal to cosine_topk. Cost grows linearly in
    nprobe (query rows duplicate, corpus doesn't).
    """
    import numpy as np
    import pandas as pd

    if centroids is not None:
        cent = np.array(centroids, dtype=np.int64)
    else:
        if cells is None:
            cells = auto_cells(_corpus_n(vectors, known_n))
        cent = np.array(
            [[ivf_centroid(i, j) for j in range(dim)] for i in range(cells)],
            dtype=np.int64,
        )

    nprobe = max(1, min(nprobe, len(cent)))

    def featurize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            Y = V * 1000
            q = (np.sign(Y) * np.floor(np.abs(Y) + 0.5)).astype(np.int64)
            norm2 = (q * q).sum(axis=1)
            # exact int64 squared distances to every centroid;
            # argmin returns the FIRST minimum = lowest cell id,
            # matching the oracle's (dist, cell) ordering
            d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            cell = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "qvec": list(q),
                    "norm2": norm2,
                    "bucket": cell.astype(np.int32),
                }
            )

    def featurize_probe(batches):
        # like featurize, but each vector ALSO probes its nprobe
        # nearest cells as a query (is_corpus only in its own cell,
        # so a neighbor is found exactly once). Stable argsort →
        # equal distances keep ascending cell order, deterministic.
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            Y = V * 1000
            q = (np.sign(Y) * np.floor(np.abs(Y) + 0.5)).astype(np.int64)
            norm2 = (q * q).sum(axis=1)
            d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
            frames = []
            for j in range(nprobe):
                frames.append(
                    pd.DataFrame(
                        {
                            id_col: pdf[id_col].values,
                            "qvec": list(q),
                            "norm2": norm2,
                            "bucket": order[:, j].astype(np.int32),
                            "is_corpus": j == 0,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    part = spread_small_input(vectors, id_col)
    if nprobe == 1:
        feat_schema = (
            f"{id_col} long, qvec array<long>, norm2 long, bucket int"
        )
        return _grouped_topk(
            part.mapInPandas(featurize, schema=feat_schema), id_col, k
        )

    probe_schema = (
        f"{id_col} long, qvec array<long>, norm2 long, bucket int, "
        "is_corpus boolean"
    )
    feat = part.mapInPandas(featurize_probe, schema=probe_schema)

    local = feat.groupBy("bucket").applyInPandas(
        _probe_topk_fn(id_col, k),
        schema="query_id long, neighbor_id long, cos double",
    )
    # global re-rank across the nprobe probed cells; each neighbor
    # appears at most once (corpus membership is single-cell)
    return _rank_topk(local, k)


def semantic_dedup(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos: float,
    cells: int | None = 8,
    iters: int = 3,
    dim: int = 64,
    centroids: list[list[int]] | None = None,
    train_mod: int | None = None,
    max_cell: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus embeddings with k-means,
    then inside each cluster drop every vector whose exact quantized
    cosine with a LOWER-id cluster member is >= ``min_cos`` — the
    cluster-wide min-id representative convention shared with
    dedup_clusters/incremental dedup (not sequential admission).

    Returns one row per input vector: (id, cell, keep boolean).

    Scale shape: training is :func:`train_ivf_centroids` (single-
    stage partial-sums jobs, bounded driver reduce — pass
    ``train_mod`` to hash-sample the training pass at corpus scale);
    assignment + quantization are one map-side pass; the only
    pairwise work is within a cell, so sizing ``cells ~ n /
    target_cell_size`` bounds every task. A pathologically dense
    cluster can be split with ``max_cell`` (deterministic id-hash
    salting, same helper as the LSH paths) at the documented cost of
    missing cross-salt pairs. Everything is exact int64 / IEEE-double
    arithmetic with deterministic tie-breaks, so a SQL oracle
    reproduces the output bit-for-bit (the Lloyd iterations are
    SQL-expressible — see plans/completion.py semantic_dedup_sql).
    """
    import numpy as np
    import pandas as pd

    if centroids is None:
        centroids = train_ivf_centroids(
            vectors, id_col, vec_col,
            cells=cells, iters=iters, dim=dim, train_mod=train_mod,
        )
    cent = np.array(centroids, dtype=np.int64)

    def featurize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            Y = V * 1000
            q = (np.sign(Y) * np.floor(np.abs(Y) + 0.5)).astype(np.int64)
            # exact int64 squared-L2; argmin ties -> lowest cell id,
            # matching the trainer and its local replica
            d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "qvec": list(q),
                    "norm2": (q * q).sum(axis=1),
                    "bucket": d2.argmin(axis=1).astype(np.int32),
                }
            )

    feat_schema = f"{id_col} long, qvec array<long>, norm2 long, bucket int"
    feat = spread_small_input(vectors, id_col).mapInPandas(
        featurize, schema=feat_schema
    )
    feat = salt_oversized_buckets(feat, id_col, max_cell)
    group_cols = ["bucket"] if max_cell is None else ["bucket", "salt"]
    threshold = float(min_cos)

    def cell_keep(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].values.astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        cell = pdf["bucket"].values.astype(np.int32)[order]
        n = len(ids)
        if n == 1:
            return pd.DataFrame(
                {id_col: ids, "cell": cell, "keep": [True]}
            )
        q = np.vstack(pdf["qvec"].values).astype(np.int64)[order]
        n2 = pdf["norm2"].values.astype(np.float64)[order]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = (q @ q.T) / np.sqrt(np.outer(n2, n2))
        # keep[i] iff no lower-id member matches (NaN from a zero
        # vector compares False, mirroring SQL)
        dup = np.tril(cos >= threshold, k=-1).any(axis=1)
        return pd.DataFrame(
            {id_col: ids, "cell": cell, "keep": ~dup}
        )

    return feat.groupBy(*group_cols).applyInPandas(
        cell_keep, schema=f"{id_col} long, cell int, keep boolean"
    )


def decontaminate_embeddings(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos: float,
    dim: int = 64,
) -> DataFrame:
    """Embedding-based benchmark decontamination — the SEMANTIC
    complement of the exact n-gram pass (operators/corpus.py
    decontaminate / decontaminate_bloom): a corpus document is
    contaminated when its embedding's max cosine against ANY
    benchmark embedding reaches ``min_cos``, catching paraphrased
    or reformatted benchmark leakage that shingle overlap misses.

    Returns one row per corpus vector: (id, max_cos, keep) —
    ``keep`` false means "drop before training".

    100 TB shape: benchmark suites are bounded by nature (evaluation
    sets, not corpora), so the bench side broadcasts whole —
    quantized vectors + norms — and the corpus is read in ONE scan
    whose per-row work is |bench| exact int64 dot products inside
    whole-stage codegen (the unrolled ``_dot_expr``; a deliberate
    broadcast nested-loop, whitelisted like hard_negative_topk's).
    The per-corpus-row max then map-side-combines, so the only
    shuffle carries one row per corpus vector. If the benchmark
    side outgrows broadcast, use
    :func:`decontaminate_embeddings_lsh` — the shared bucketed
    kernel with corpus rows as queries and the benchmark as
    residents, k=1; this exact form stays as its oracle-able
    recall baseline.

    Exactness: cosine is int64 dot / sqrt(int64 norm product) in
    IEEE double — bit-identical in Spark and DuckDB (the
    dedup_embedding convention), so MAX and the threshold compare
    agree exactly; no epsilon.
    """
    b = _with_qvec(bench, id_col, vec_col, dim).select(
        F.col(id_col).alias("__bid"),
        F.col("qvec").alias("bvec"),
        F.col("norm2").alias("bnorm2"),
    )
    c = _with_qvec(corpus, id_col, vec_col, dim)
    cos = _dot_expr("qvec", "bvec", dim).cast("double") / F.sqrt(
        (F.col("norm2") * F.col("bnorm2")).cast("double")
    )
    scored = c.crossJoin(F.broadcast(b)).select(
        F.col(id_col), cos.alias("__cos")
    )
    agg = scored.groupBy(id_col).agg(F.max("__cos").alias("max_cos"))
    # corpus-anchored output: an EMPTY benchmark means "nothing to
    # decontaminate — keep everything", not "drop everything" (the
    # fail-open-vs-vanish hazard class the ingest loop's
    # path-not-found fix addressed); the left join is id-keyed on
    # both sides and a no-op row-wise when bench is non-empty
    return (
        c.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            "max_cos",
            (
                F.col("max_cos").isNull()
                | (F.col("max_cos") < F.lit(min_cos))
            ).alias("keep"),
        )
    )


def decontaminate_embeddings_sql(
    corpus_where: str,
    bench_where: str,
    min_cos: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`decontaminate_embeddings` over one
    ``table`` split by the two WHERE predicates (each may reference
    only ``id_col`` — they are applied to both the long-form comps
    CTE and the corpus-anchor subquery) — long-form comps join for
    the exact int64 dots (the dedup_embedding oracle shape),
    identical double cosine, MAX, threshold compare, and the same
    corpus-anchored LEFT JOIN (empty benchmark keeps all)."""
    return f"""
WITH __qv AS (
  SELECT {id_col},
         list_transform({vec_col},
             x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM {table}),
__comps AS (
  SELECT {id_col}, unnest(generate_series(1, len(v))) AS pos,
         unnest(v) AS comp
  FROM __qv),
__norms AS (
  SELECT {id_col}, SUM(comp * comp) AS norm2
  FROM __comps GROUP BY 1),
__dots AS (
  SELECT c.{id_col} AS cid, b.{id_col} AS bid,
         SUM(c.comp * b.comp) AS dot
  FROM (SELECT * FROM __comps WHERE {corpus_where}) c
  JOIN (SELECT * FROM __comps WHERE {bench_where}) b
    ON c.pos = b.pos
  GROUP BY 1, 2),
__scored AS (
  SELECT cid,
         CAST(dot AS DOUBLE)
           / sqrt(CAST(nc.norm2 * nb.norm2 AS DOUBLE)) AS cos
  FROM __dots
  JOIN __norms nc ON nc.{id_col} = cid
  JOIN __norms nb ON nb.{id_col} = bid),
__agg AS (
  SELECT cid, MAX(cos) AS max_cos FROM __scored GROUP BY 1)
SELECT q.{id_col}, a.max_cos,
       (a.max_cos IS NULL OR a.max_cos < {min_cos}) AS keep
FROM (SELECT {id_col} FROM __qv WHERE {corpus_where}) q
LEFT JOIN __agg a ON a.cid = q.{id_col}
"""


def decontaminate_embeddings_lsh(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos: float,
    planes: int | None = 4,
    dim: int = 64,
    nprobe: int = 1,
    target_bucket: int = 8,
    known_n: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Bucketed form of :func:`decontaminate_embeddings` for when
    the benchmark side outgrows broadcast (a union of every eval
    suite ever shipped, or decontaminating against another CORPUS).

    A thin role-flip over the shared bucketed kernel
    (:func:`_bucketed_role_topk` via :func:`hard_negative_topk_lsh`):
    benchmark vectors are the bucket RESIDENTS (labeled ``b``),
    corpus vectors probe as QUERIES (labeled ``c``) with k=1 — the
    per-corpus-row top-1 cosine against probed benchmark residents
    IS this op's approximate ``max_cos``. ``nprobe`` is the recall
    lever (monotone, property-tested on the shared kernel);
    ``max_bucket`` the completeness-preserving skew valve. Ids must
    be distinct across the two frames (the kernel's same-id mask —
    shared with the queries form of hard-negative mining).

    APPROXIMATE and fail-open by construction: a contaminated
    vector whose benchmark twin lands outside its probed buckets is
    KEPT (max_cos null or under-estimated) — the standard ANN
    decontamination tradeoff; calibrate nprobe/planes against the
    exact form (SCALE.md carries the recall table). The exact
    :func:`decontaminate_embeddings` stays as the oracle-able
    baseline, like cosine_topk beside lsh_cosine_topk.
    """
    top1 = hard_negative_topk_lsh(
        bench.withColumn("__side", F.lit("b")),
        id_col,
        vec_col,
        "__side",
        k=1,
        planes=planes,
        dim=dim,
        nprobe=nprobe,
        target_bucket=target_bucket,
        known_n=known_n,
        queries=corpus.withColumn("__side", F.lit("c")),
        max_bucket=max_bucket,
    )
    return (
        corpus.select(id_col)
        .join(
            top1.select(
                F.col("query_id").alias(id_col),
                F.col("cos_sim").alias("max_cos"),
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            "max_cos",
            (
                F.col("max_cos").isNull()
                | (F.col("max_cos") < F.lit(min_cos))
            ).alias("keep"),
        )
    )


def decontaminate_embeddings_ivf(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos: float,
    cells: int | None = 8,
    dim: int = 64,
    centroids: list[list[int]] | None = None,
    nprobe: int = 1,
    known_n: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Inverted-file sibling of :func:`decontaminate_embeddings_lsh`
    (same role flip over the shared kernel, via
    :func:`hard_negative_topk_ivf`): benchmark vectors assign to
    their nearest centroid as residents, corpus vectors probe their
    ``nprobe`` nearest cells — nprobe = cells degenerates to the
    exact result (the kernel's property), making recall directly
    purchasable. Same fail-open guarantee and id-distinctness
    requirement as the LSH form. Note ``known_n`` sizes auto_cells
    from the BENCH side (the resident side) when ``cells=None``.
    """
    top1 = hard_negative_topk_ivf(
        bench.withColumn("__side", F.lit("b")),
        id_col,
        vec_col,
        "__side",
        k=1,
        cells=cells,
        dim=dim,
        centroids=centroids,
        nprobe=nprobe,
        known_n=known_n,
        queries=corpus.withColumn("__side", F.lit("c")),
        max_bucket=max_bucket,
    )
    return (
        corpus.select(id_col)
        .join(
            top1.select(
                F.col("query_id").alias(id_col),
                F.col("cos_sim").alias("max_cos"),
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            "max_cos",
            (
                F.col("max_cos").isNull()
                | (F.col("max_cos") < F.lit(min_cos))
            ).alias("keep"),
        )
    )
