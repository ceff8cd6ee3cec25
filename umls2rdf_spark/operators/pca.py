"""Distributed PCA whitening for embedding columns — the
preprocessing step the embedding family (C5/C6 ANN, C30 SemDeDup,
C43 decontamination) assumes away: raw encoder embeddings have
anisotropic spectra (a few directions carry most variance), which
makes cosine thresholds direction-dependent and LSH hyperplane
buckets uneven. Whitening (project onto the top-k principal
directions, scale each to unit variance) fixes both, and is the
standard trick behind "remove the top principal components"
post-processing (Mu & Viswanath 2018) and FAISS's OPQ-style
pre-rotations.

Spark-first decomposition of the classic two-pass PCA:

1. ``gram_partials`` — ONE pass over the vectors: each Arrow batch
   contributes its partial second-moment matrix X^T X, its partial
   sum vector and count via ``mapInPandas`` (numpy does the d×d
   multiply per batch — the sanctioned vectorized-Python path; a
   JVM expression tree over d^2 = thousands of products per row is
   codegen-hostile). The shuffle payload is (d^2 + d + 1) doubles
   PER PARTITION, independent of row count — a 100 TB corpus ships
   kilobytes per task.
2. driver: assemble covariance from the summed partials
   (Cov = E[xx^T] − μμ^T), ``numpy.linalg.eigh`` on the d×d matrix
   (d is an embedding width — 64/768/4096 — so this is
   milliseconds), deterministic sign convention (each eigenvector's
   largest-|component| entry made positive, ties broken by lowest
   index) so reruns and replicas agree bit-for-bit.
3. ``pca_project`` — the rotation is broadcast back as a LITERAL
   column expression: k dot products per row via ``aggregate`` over
   ``zip_with``, pure JVM codegen (no Python on the hot path), with
   optional 1/sqrt(eigenvalue) whitening scales folded into the
   rotation rows on the driver.

No DuckDB twin: eigendecomposition is not SQL — this is a
tests-only capability (the C13 discipline) verified against an
exact numpy replica (same partials, same eigh, same sign rule) plus
algebraic invariants (orthonormal rotation, whitened covariance =
identity, captured variance = top-k eigenvalue mass).

Reference parity: none (the reference has no vector math);
LLM-pipeline surface (SURVEY §2 C69).
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAM_SCHEMA = "idx int, val double, cnt bigint"


def gram_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """(idx, val, cnt) rows: per-batch partial sums of the flattened
    second-moment matrix (idx 0..d^2-1), the mean vector
    (idx d^2..d^2+d-1) and the row count (idx = -1, val = 0).
    Summing ``val`` per ``idx`` over all partitions yields the exact
    full-corpus statistics (floating-point association aside —
    batch-order nondeterminism is bounded by fp addition error, the
    same contract as Spark's own float SUM)."""

    def partial(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vecs = pdf[vec_col].tolist()
            if not vecs:
                continue
            x = np.asarray(vecs, dtype=np.float64)
            if x.ndim != 2 or x.shape[1] != dim:
                raise ValueError(
                    f"gram_partials: expected {dim}-wide vectors, "
                    f"got shape {x.shape}"
                )
            g = (x.T @ x).ravel()
            s = x.sum(axis=0)
            n = float(x.shape[0])
            idx = list(range(dim * dim + dim)) + [-1]
            val = list(g) + list(s) + [0.0]
            cnt = [0] * (dim * dim + dim) + [int(n)]
            yield pd.DataFrame(
                {"idx": idx, "val": val, "cnt": cnt}
            )

    out = df.select(vec_col).mapInPandas(partial, schema=GRAM_SCHEMA)
    return out.groupBy("idx").agg(
        F.sum("val").alias("val"), F.sum("cnt").alias("cnt")
    )


def fit_pca(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int,
    whiten: bool = True,
    eps: float = 1e-9,
) -> tuple[list[list[float]], list[float], list[float]]:
    """Driver-side finish: collect the (d^2 + d + 1)-row partials
    frame (bounded by the embedding width, NEVER the corpus), eigh
    the covariance, return (rows, eigenvalues, mean) where ``rows``
    is the k×d projection matrix — eigenvectors scaled by
    1/sqrt(eigenvalue + eps) when ``whiten``. Deterministic sign:
    each eigenvector's largest-|component| entry is made positive
    (lowest index on exact ties)."""
    import numpy as np

    if not 1 <= k <= dim:
        raise ValueError(f"fit_pca: need 1 <= k <= dim, got k={k}")
    rows = gram_partials(df, vec_col, dim).collect()
    n = sum(r["cnt"] for r in rows if r["idx"] == -1)
    if n < 2:
        raise ValueError(f"fit_pca: need >= 2 vectors, got {n}")
    flat = {r["idx"]: r["val"] for r in rows}
    g = np.array(
        [[flat[i * dim + j] for j in range(dim)] for i in range(dim)]
    )
    mu = np.array([flat[dim * dim + i] for i in range(dim)]) / n
    cov = g / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    evals, evecs = vals[order], vecs[:, order]
    for c in range(evecs.shape[1]):
        j = int(np.argmax(np.abs(evecs[:, c])))
        if evecs[j, c] < 0:
            evecs[:, c] = -evecs[:, c]
    proj = evecs.T.copy()
    if whiten:
        proj = proj / np.sqrt(evals + eps)[:, None]
    return (
        [[float(v) for v in row] for row in proj],
        [float(v) for v in evals],
        [float(v) for v in mu],
    )


def pca_project(
    df: DataFrame,
    vec_col: str,
    proj_rows: list[list[float]],
    mean: list[float],
    out_col: str = "pca_vec",
) -> DataFrame:
    """Append ``out_col``: the centered input projected through the
    fitted rows — k dot products per row as a pure JVM expression
    (literal rotation arrays; ``aggregate`` over ``zip_with``), no
    Python on the per-row path."""
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(m) for m in mean]),
        lambda v, m: v - m,
    )
    comps = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(w) for w in row]),
                lambda v, w: v * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for row in proj_rows
    ]
    return df.withColumn(out_col, F.array(*comps))


def numpy_pca_replica(
    x, k: int, whiten: bool = True, eps: float = 1e-9
):
    """Plain-numpy twin of fit_pca + projection for replica tests:
    same covariance form, same eigh, same sign rule."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    mu = x.mean(axis=0)
    cov = (x.T @ x) / x.shape[0] - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    evals, evecs = vals[order], vecs[:, order]
    for c in range(evecs.shape[1]):
        j = int(np.argmax(np.abs(evecs[:, c])))
        if evecs[j, c] < 0:
            evecs[:, c] = -evecs[:, c]
    proj = evecs.T.copy()
    if whiten:
        proj = proj / np.sqrt(evals + eps)[:, None]
    return (x - mu) @ proj.T, proj, evals, mu
