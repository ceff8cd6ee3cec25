"""Product quantization (PQ): the memory-bounded ANN path.

At 100 TB the index, not the scan, is what breaks ANN: 64-dim fp32
embeddings cost 256 B/vector, so a 10^11-vector corpus needs ~25 TB
of vector bytes resident wherever scoring happens. PQ stores each
vector as ``m`` one-byte codes (m=8 → 8 B/vector, 32x less) and
scores queries against codes with an ADC (asymmetric distance
computation) lookup — the standard inverted-file companion
(IVF-PQ): coarse cells from operators/similarity.train_ivf_centroids
bound WHO is scored, PQ bounds what scoring COSTS.

Determinism contract (same as the IVF trainer): integer-only math
everywhere — quantized vectors, integer centroid updates with floor
division, ties to the lowest code — so training, encoding and ADC
scores are bit-identical across engines, partitionings and row
orders, and every stage is testable against a plain-Python replica.

Scale shape: training is one persisted quantized frame + one
SINGLE-STAGE partial-sums job per Lloyd iteration (all ``m``
subspaces in the same pass; driver reduce bounded at
m x k x partitions rows). Encoding is a map-only pass. ADC scoring
broadcasts the per-query lookup tables (m x k ints each) and scans
the codes table once; the only shuffle is the per-query top-k
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import stable_hash40, stable_hash40_py


def pq_seed(m: int, i: int, j: int) -> int:
    """Deterministic init for component ``j`` of codeword ``i`` in
    subspace ``m`` — engine-neutral integers in the quantized value
    range, md5-derived like similarity.ivf_centroid (a linear-
    congruential grid makes codewords shifted copies of one
    progression — near-parallel codebooks)."""
    return stable_hash40_py(f"pq-{m}-{i}-{j}") % 2001 - 1000


def _quantize_np(vec_series):
    import numpy as np

    V = np.vstack(vec_series.values).astype(np.float64)
    Y = V * 1000
    return (np.sign(Y) * np.floor(np.abs(Y) + 0.5)).astype(np.int64)


def _map_in_pandas_by_value(df, fn, schema):
    """mapInPandas with this module registered by value: the worker
    closures call module-level ``_quantize_np``, and executor pythons
    may not have the repo on sys.path (the grading driver loads
    ``__spark_entry__`` by file path). Must be PYSPARK's bundled
    cloudpickle and must wrap the CALL — UDFs pickle at plan
    construction, not at the action."""
    from pyspark import cloudpickle

    import umls2rdf_spark.operators.pq as _selfmod

    cloudpickle.register_pickle_by_value(_selfmod)
    try:
        return df.mapInPandas(fn, schema=schema)
    finally:
        cloudpickle.unregister_pickle_by_value(_selfmod)


def train_pq_codebooks(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    dim: int = 64,
    train_mod: int | None = None,
) -> list[list[list[int]]]:
    """Train the ``m`` subspace codebooks (k codewords of dim/m
    components each) with deterministic integer Lloyd's.

    One persisted quantized frame; each iteration is a single
    map-only job emitting per-partition partial sums for ALL
    subspaces at once — (m, code, sums, cnt) rows, bounded at
    m x k x partitions — reduced on the driver (integer partials
    commute: order-invariant). Empty codes keep their previous
    codeword. ``train_mod=s`` trains on a deterministic 1-in-s
    id-hash sample (the 100 TB path).

    Returns a plain m x k x (dim//m) int matrix.
    """
    import numpy as np
    from pyspark import StorageLevel

    if dim % m != 0:
        raise ValueError("dim must be divisible by m")
    sub = dim // m
    src = vectors
    if train_mod is not None and train_mod > 1:
        src = src.where(
            F.pmod(
                stable_hash40(F.col(id_col).cast("string")),
                F.lit(train_mod),
            )
            == 0
        )
    books = np.array(
        [
            [[pq_seed(mm, i, j) for j in range(sub)] for i in range(k)]
            for mm in range(m)
        ],
        dtype=np.int64,
    )

    def quantize_batches(batches):
        import pandas as pd_

        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = _quantize_np(pdf[vec_col])
            yield pd_.DataFrame({"qvec": list(q)})

    # map-side quantization, no repartition: codebook partials are
    # commutative integer sums — identical result under any
    # partitioning, and the shuffle would move every training vector
    quant = _map_in_pandas_by_value(
        src.select(F.col(id_col), F.col(vec_col)),
        quantize_batches,
        "qvec array<long>",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for _ in range(iters):
            bmat = books.copy()

            def partials(batches):
                import pandas as pd_

                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    q = np.vstack(pdf["qvec"].values).astype(np.int64)
                    rows = []
                    for mm in range(m):
                        qs = q[:, mm * sub:(mm + 1) * sub]
                        d2 = (
                            (qs[:, None, :] - bmat[mm][None, :, :]) ** 2
                        ).sum(axis=2)
                        code = d2.argmin(axis=1)  # first minimum: lowest code
                        for c in np.unique(code):
                            sel = qs[code == c]
                            rows.append(
                                (
                                    int(mm),
                                    int(c),
                                    [int(x) for x in sel.sum(axis=0)],
                                    len(sel),
                                )
                            )
                    yield pd_.DataFrame(
                        rows, columns=["m", "code", "sums", "cnt"]
                    )

            parts = _map_in_pandas_by_value(
                quant,
                partials,
                "m int, code int, sums array<long>, cnt long",
            ).collect()
            sums = np.zeros((m, k, sub), dtype=np.int64)
            cnts = np.zeros((m, k), dtype=np.int64)
            for row in parts:
                sums[row["m"], row["code"]] += np.array(
                    row["sums"], dtype=np.int64
                )
                cnts[row["m"], row["code"]] += row["cnt"]
            new_books = books.copy()
            nonempty = cnts > 0
            new_books[nonempty] = (
                sums[nonempty] // cnts[nonempty][:, None]
            )
            books = new_books
    finally:
        quant.unpersist()
    return [
        [[int(x) for x in code] for code in book] for book in books
    ]


def pq_encode(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[int]]],
    dim: int = 64,
) -> DataFrame:
    """Encode every vector as its ``m`` nearest-codeword indices
    (exact integer squared-L2 per subspace, ties to the lowest code).
    Map-only pass; output (id, codes array<int>) — the 8-byte-per-
    vector index table that replaces the 256-byte raw vectors."""
    import numpy as np

    books = np.array(codebooks, dtype=np.int64)
    m, _k, sub = books.shape
    if m * sub != dim:
        raise ValueError("codebook shape does not cover dim")

    def encode(batches):
        import pandas as pd_

        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = _quantize_np(pdf[vec_col])
            codes = np.empty((len(q), m), dtype=np.int32)
            for mm in range(m):
                qs = q[:, mm * sub:(mm + 1) * sub]
                d2 = ((qs[:, None, :] - books[mm][None, :, :]) ** 2).sum(
                    axis=2
                )
                codes[:, mm] = d2.argmin(axis=1)
            yield pd_.DataFrame(
                {id_col: pdf[id_col].values, "codes": list(codes)}
            )

    id_type = dict(vectors.dtypes)[id_col]
    return _map_in_pandas_by_value(
        vectors.select(F.col(id_col), F.col(vec_col)),
        encode,
        f"{id_col} {id_type}, codes array<int>",
    )


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[int]]],
    centroids: list[list[int]],
    k: int = 3,
    dim: int = 64,
    nprobe: int = 1,
    rerank: int = 0,
) -> DataFrame:
    """The full IVF-PQ stack: coarse cells bound WHO gets scored,
    PQ codes bound what scoring COSTS.

    ``rerank > 0`` adds the exact re-rank stage (the FAISS IVFPQR
    shape): the top-``rerank`` ADC candidates per query are re-scored
    with the EXACT quantized cosine and the final top-``k`` is taken
    from those — output (query_id, neighbor_id, rank, cos_sim), the
    cosine_topk schema. This is the production answer to ADC code
    collapse: when true neighbors sit within quantization noise of
    each other (tight clusters), every cluster member encodes to the
    same m bytes, ADC distances tie, and the byte-level top-k is
    arbitrary-but-deterministic among them — measured at 1M clustered
    vectors as recall@10 ≈ 0.04 FLAT in nprobe (SCALE.md). Re-ranking
    restores exactness for whatever the candidate set contains while
    keeping the scan cost byte-bounded. Scale shape: the candidate
    list is |queries| x rerank rows (bounded — queries are bounded by
    nature here), broadcast against ONE corpus scan, so the corpus is
    never shuffled for the re-score.

    Corpus pass (map-only): assign each vector to its nearest
    centroid (exact int64 L2, ties to the lowest cell) and encode its
    PQ codes — the stored index is (id, cell, m bytes). Query pass
    (map-only over the small side): build the ADC LUT and duplicate
    each query into its ``nprobe`` nearest cells (stable argsort —
    deterministic). Scoring joins on the cell (the only
    corpus-shuffle, bounded by cell sizes), scores pairs with the
    unrolled ``luts[m][codes[m]]`` sum, and a global per-query window
    re-ranks across probed cells. Each (query, neighbor) pair is
    scored at most once: a neighbor lives in exactly one cell.

    ``nprobe=len(centroids)`` degenerates to :func:`pq_topk` exactly
    (every pair scored) — property-tested equal.
    """
    import numpy as np

    books = np.array(codebooks, dtype=np.int64)
    cent = np.array(centroids, dtype=np.int64)
    m, _k, sub = books.shape
    if m * sub != dim:
        raise ValueError("codebook shape does not cover dim")
    nprobe = max(1, min(nprobe, len(cent)))

    def corpus_feat(batches):
        import pandas as pd_

        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = _quantize_np(pdf[vec_col])
            d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            cell = d2.argmin(axis=1)
            codes = np.empty((len(q), m), dtype=np.int32)
            for mm in range(m):
                qs = q[:, mm * sub:(mm + 1) * sub]
                dd = ((qs[:, None, :] - books[mm][None, :, :]) ** 2).sum(
                    axis=2
                )
                codes[:, mm] = dd.argmin(axis=1)
            yield pd_.DataFrame(
                {
                    "neighbor_id": pdf[id_col].values,
                    "cell": cell.astype(np.int32),
                    "codes": list(codes),
                }
            )

    def query_feat(batches):
        import pandas as pd_

        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = _quantize_np(pdf[vec_col])
            d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
            luts = [
                [
                    [
                        int(row[mm * sub:(mm + 1) * sub] @ books[mm][c])
                        for c in range(_k)
                    ]
                    for mm in range(m)
                ]
                for row in q
            ]
            frames = []
            for j in range(nprobe):
                frames.append(
                    pd_.DataFrame(
                        {
                            "query_id": pdf[id_col].values,
                            "cell": order[:, j].astype(np.int32),
                            "luts": luts,
                        }
                    )
                )
            yield pd_.concat(frames, ignore_index=True)

    id_type = dict(vectors.dtypes)[id_col]
    corpus = _map_in_pandas_by_value(
        vectors.select(F.col(id_col), F.col(vec_col)),
        corpus_feat,
        f"neighbor_id {id_type}, cell int, codes array<int>",
    )
    qs = _map_in_pandas_by_value(
        queries.select(F.col(id_col), F.col(vec_col)),
        query_feat,
        f"query_id {id_type}, cell int, luts array<array<bigint>>",
    )
    score = F.expr(
        " + ".join(f"luts[{mm}][codes[{mm}]]" for mm in range(m))
    ).alias("adc")
    scored = (
        corpus.join(F.broadcast(qs), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    if rerank <= 0:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "query_id", "neighbor_id", "rank",
                F.col("adc").alias("adc_score"),
            )
        )
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    from umls2rdf_spark.operators.similarity import (
        _dot_expr,
        _with_qvec,
    )

    cand = (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= rerank)
        .select("query_id", "neighbor_id")
    )
    cvec = _with_qvec(vectors, id_col, vec_col, dim).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("nvec"),
        F.col("norm2").alias("nn2"),
    )
    qvec = _with_qvec(queries, id_col, vec_col, dim).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qv"),
        F.col("norm2").alias("qn2"),
    )
    cos = _dot_expr("qv", "nvec", dim).cast("double") / F.sqrt(
        (F.col("qn2") * F.col("nn2")).cast("double")
    )
    rescored = (
        cvec.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            F.col("cos").alias("cos_sim"),
        )
    )


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[int]]],
    k: int = 3,
    dim: int = 64,
) -> DataFrame:
    """ADC top-k: score every (query, corpus) pair as the approximate
    inner product ``sum_m LUT_q[m][code_m]`` where
    ``LUT_q[m][c] = <q_sub_m, codebook[m][c]>`` (exact int64 on the
    quantized query — the only approximation is the codes).

    The corpus side is the ENCODED table — the point of PQ: scoring
    reads m bytes per vector, never the raw embedding. Per-query LUTs
    (m x k ints) are computed map-side on the query frame and
    broadcast; the score is an unrolled ``luts[m][codes[m]]`` sum
    that stays in whole-stage codegen. Only the per-query top-k
    window shuffles.

    Output: (query_id, neighbor_id, rank, adc_score).
    """
    import numpy as np

    books = np.array(codebooks, dtype=np.int64)
    m, _k, sub = books.shape
    if m * sub != dim:
        raise ValueError("codebook shape does not cover dim")
    codes = pq_encode(vectors, id_col, vec_col, codebooks, dim).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )

    def luts(batches):
        import pandas as pd_

        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = _quantize_np(pdf[vec_col])
            out = []
            for row in q:
                t = [
                    [
                        int(row[mm * sub:(mm + 1) * sub] @ books[mm][c])
                        for c in range(_k)
                    ]
                    for mm in range(m)
                ]
                out.append(t)
            yield pd_.DataFrame(
                {"query_id": pdf[id_col].values, "luts": out}
            )

    id_type = dict(queries.dtypes)[id_col]
    qluts = _map_in_pandas_by_value(
        queries.select(F.col(id_col), F.col(vec_col)),
        luts,
        f"query_id {id_type}, luts array<array<bigint>>",
    )
    score = F.expr(
        " + ".join(f"luts[{mm}][codes[{mm}]]" for mm in range(m))
    ).alias("adc")
    scored = codes.join(
        F.broadcast(qluts),
        F.col("query_id") != F.col("neighbor_id"),
        "inner",
    ).select("query_id", "neighbor_id", score)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            F.col("adc").alias("adc_score"),
        )
    )
