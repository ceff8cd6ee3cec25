"""C69 PCA whitening: exact agreement with the plain-numpy replica,
algebraic invariants (orthonormality before whitening, identity
covariance after), captured-variance ordering, and the projection
expression staying JVM-side."""

from __future__ import annotations

import numpy as np
import pytest

from umls2rdf_spark.operators.pca import (
    fit_pca,
    numpy_pca_replica,
    pca_project,
)
from tests.conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _dim(spark):
    r = _emb(spark).select("embedding").first()
    return len(r["embedding"])


def test_fit_matches_numpy_replica(spark):
    emb = _emb(spark)
    dim = _dim(spark)
    x = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    proj, evals, mu = fit_pca(emb, "embedding", dim, k=4)
    _, rproj, revals, rmu = numpy_pca_replica(x, k=4)
    assert np.allclose(mu, rmu, atol=1e-9)
    assert np.allclose(evals, revals, rtol=1e-8)
    assert np.allclose(proj, rproj, rtol=1e-6, atol=1e-9)


def test_whitened_covariance_is_identity(spark):
    emb = _emb(spark)
    dim = _dim(spark)
    proj, _, mu = fit_pca(emb, "embedding", dim, k=4, whiten=True)
    out = pca_project(emb, "embedding", proj, mu)
    y = np.array([r["pca_vec"] for r in out.collect()])
    cov = (y.T @ y) / y.shape[0] - np.outer(y.mean(0), y.mean(0))
    assert np.allclose(cov, np.eye(4), atol=1e-6)


def test_unwhitened_rotation_orthonormal_and_variance_ordered(spark):
    emb = _emb(spark)
    dim = _dim(spark)
    proj, evals, mu = fit_pca(emb, "embedding", dim, k=5, whiten=False)
    w = np.array(proj)
    assert np.allclose(w @ w.T, np.eye(5), atol=1e-9)
    # eigenvalues descending, and projected variances match them
    assert all(a >= b for a, b in zip(evals, evals[1:]))
    out = pca_project(emb, "embedding", proj, mu)
    y = np.array([r["pca_vec"] for r in out.collect()])
    var = y.var(axis=0)
    assert np.allclose(var, evals, rtol=1e-6)


def test_projection_stays_jvm_side(spark):
    emb = _emb(spark)
    dim = _dim(spark)
    proj, _, mu = fit_pca(emb, "embedding", dim, k=3)
    plan = (
        pca_project(emb, "embedding", proj, mu)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the fit uses mapInPandas (sanctioned); the per-row projection
    # must not — no Python eval nodes in its plan
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_fit_validation(spark):
    emb = _emb(spark)
    dim = _dim(spark)
    with pytest.raises(ValueError, match="1 <= k <= dim"):
        fit_pca(emb, "embedding", dim, k=0)
    with pytest.raises(Exception, match="expected"):
        fit_pca(emb, "embedding", dim + 1, k=2)
