"""Product-quantization tests: replica-exact training, constructed
encode/ADC exactness, recall vs the exact inner-product baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _py_quantize(vec):
    import math

    return [
        int(math.copysign(math.floor(abs(x * 1000) + 0.5), x * 1000))
        for x in vec
    ]


def _py_train(rows, m, k, iters, dim):
    """Plain-Python replica of train_pq_codebooks (quantize → assign
    exact L2 ties-lowest → floor-div integer update)."""
    from umls2rdf_spark.operators.pq import pq_seed

    sub = dim // m
    qs = [_py_quantize(v) for v in rows]
    books = [
        [[pq_seed(mm, i, j) for j in range(sub)] for i in range(k)]
        for mm in range(m)
    ]
    for _ in range(iters):
        new_books = []
        for mm in range(m):
            sums = [[0] * sub for _ in range(k)]
            cnts = [0] * k
            for q in qs:
                s = q[mm * sub:(mm + 1) * sub]
                best, best_d = 0, None
                for c in range(k):
                    d = sum(
                        (s[j] - books[mm][c][j]) ** 2 for j in range(sub)
                    )
                    if best_d is None or d < best_d:
                        best, best_d = c, d
                cnts[best] += 1
                for j in range(sub):
                    sums[best][j] += s[j]
            nb = []
            for c in range(k):
                if cnts[c] > 0:
                    nb.append([sums[c][j] // cnts[c] for j in range(sub)])
                else:
                    nb.append(list(books[mm][c]))
            new_books.append(nb)
        books = new_books
    return books


def test_pq_train_matches_python_replica(spark):
    from umls2rdf_spark.operators.pq import train_pq_codebooks

    vecs = [
        [0.5, -0.25, 0.125, 1.0],
        [0.4, -0.2, 0.1, 0.9],
        [-0.5, 0.25, -0.125, -1.0],
        [-0.4, 0.2, -0.1, -0.9],
        [0.05, 0.05, 0.05, 0.05],
        [1.5, 1.5, -1.5, -1.5],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    got = train_pq_codebooks(
        df, "vec_id", "embedding", m=2, k=2, iters=2, dim=4
    )
    # float32 storage perturbs the quantized ints? no: all the test
    # components are exactly representable in float32
    want = _py_train(vecs, m=2, k=2, iters=2, dim=4)
    assert got == want

    # determinism across repartitionings
    again = train_pq_codebooks(
        df.repartition(7), "vec_id", "embedding", m=2, k=2, iters=2, dim=4
    )
    assert again == got


def test_pq_encode_and_adc_exact(spark):
    """Vectors placed exactly AT codewords must encode to those codes,
    and the ADC score must equal the exact quantized inner product —
    zero reconstruction error means ADC degenerates to exact scoring."""
    from umls2rdf_spark.operators.pq import pq_encode, pq_seed, pq_topk

    m, k, dim = 2, 4, 4
    sub = dim // m
    books = [
        [[pq_seed(mm, i, j) for j in range(sub)] for i in range(k)]
        for mm in range(m)
    ]
    # vector i uses codeword (i % k) in subspace 0 and ((i+1) % k) in 1
    choices = [(i % k, (i + 1) % k) for i in range(5)]
    vecs = [
        [c / 1000.0 for c in books[0][c0] + books[1][c1]]
        for c0, c1 in choices
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(df, "vec_id", "embedding", books, dim=dim).collect()
    }
    assert codes == {i: list(c) for i, c in enumerate(choices)}

    qvecs = [books[0][c0] + books[1][c1] for c0, c1 in choices]
    expect_dot = {
        (qi, ni): sum(a * b for a, b in zip(qvecs[qi], qvecs[ni]))
        for qi in range(5)
        for ni in range(5)
        if qi != ni
    }
    got = pq_topk(
        df, df, "vec_id", "embedding", books, k=4, dim=dim
    ).collect()
    assert len(got) == 5 * 4
    for r in got:
        assert r["adc_score"] == expect_dot[
            (r["query_id"], r["neighbor_id"])
        ]


def test_pq_recall_vs_exact_dot_baseline(spark):
    """Rank-1 recall of ADC scoring against the exact quantized
    inner-product ranking on the embeddings table — PQ approximates
    the DOT, so the baseline is the dot ranking (the cosine tests
    cover the normalized variants). Must beat random by a wide
    margin on the near-uniform corpus."""
    import numpy as np

    from umls2rdf_spark.operators.pq import pq_topk, train_pq_codebooks
    from umls2rdf_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.vstack([r["embedding"] for r in rows]).astype(np.float64)
    Q = (np.sign(V * 1000) * np.floor(np.abs(V * 1000) + 0.5)).astype(
        np.int64
    )
    dots = Q @ Q.T
    np.fill_diagonal(dots, np.iinfo(np.int64).min)
    # ties broken by lowest neighbor id, matching the operator
    exact_nn = {}
    for i in range(len(ids)):
        best = np.flatnonzero(dots[i] == dots[i].max())
        exact_nn[int(ids[i])] = int(ids[best.min()])

    books = train_pq_codebooks(
        emb, "vec_id", "embedding", m=8, k=16, iters=2
    )
    got = {
        r["query_id"]: r["neighbor_id"]
        for r in pq_topk(emb, emb, "vec_id", "embedding", books, k=1)
        .where(F.col("rank") == 1)
        .collect()
    }
    hit = sum(1 for q, n in got.items() if exact_nn.get(q) == n)
    recall = hit / len(exact_nn)
    # random pick recalls ~1/(n-1) ≈ 0.2% at sf0.001
    assert recall >= 0.05, recall


def test_ivf_pq_full_probe_equals_pq_topk(spark):
    """nprobe = all cells scores every pair exactly once, so the full
    IVF-PQ stack must equal plain PQ ADC scoring row-for-row — the
    cell routing can change WHICH pairs are scored, never a score."""
    from umls2rdf_spark.operators.pq import (
        ivf_pq_topk,
        pq_topk,
        train_pq_codebooks,
    )
    from umls2rdf_spark.operators.similarity import train_ivf_centroids
    from umls2rdf_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 30)
    books = train_pq_codebooks(
        emb, "vec_id", "embedding", m=4, k=8, iters=1
    )
    cent = train_ivf_centroids(emb, "vec_id", "embedding", cells=8, iters=1)
    full = sorted(
        map(
            tuple,
            ivf_pq_topk(
                emb, queries, "vec_id", "embedding", books, cent,
                k=3, nprobe=8,
            ).collect(),
        )
    )
    plain = sorted(
        map(
            tuple,
            pq_topk(emb, queries, "vec_id", "embedding", books, k=3)
            .collect(),
        )
    )
    assert full == plain and len(full) == 30 * 3


def test_ivf_pq_nprobe_monotone_and_bounded(spark):
    """More probed cells can only improve the best ADC hit per query
    (monotone recall lever), and single-probe scores stay a subset of
    the full scoring."""
    from umls2rdf_spark.operators.pq import ivf_pq_topk, train_pq_codebooks
    from umls2rdf_spark.operators.similarity import train_ivf_centroids
    from umls2rdf_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 50)
    books = train_pq_codebooks(
        emb, "vec_id", "embedding", m=4, k=8, iters=1
    )
    cent = train_ivf_centroids(emb, "vec_id", "embedding", cells=8, iters=1)

    def best(nprobe):
        return {
            r["query_id"]: r["adc_score"]
            for r in ivf_pq_topk(
                emb, queries, "vec_id", "embedding", books, cent,
                k=1, nprobe=nprobe,
            ).collect()
        }

    b1, b4 = best(1), best(4)
    assert set(b1) <= set(b4)  # probing more cells never loses a query
    for q, s in b1.items():
        assert b4[q] >= s, (q, b4[q], s)
