"""Numpy-replay tests for the distributed PCA operators."""

from __future__ import annotations

import numpy as np
import pytest

from python_vector_db___ai_spark.operators.pca import (
    covariance_matrix,
    pca_fit,
    pca_project,
    pca_variance_report,
)
from python_vector_db___ai_spark.session import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_covariance_matches_numpy(emb, X):
    got = {(r["i"], r["j"]): r["cov"]
           for r in covariance_matrix(emb).collect()}
    want = np.cov(X, rowvar=False)  # sample covariance, ddof=1
    d = X.shape[1]
    assert len(got) == d * d
    for i in range(d):
        for j in range(d):
            assert got[(i + 1, j + 1)] == pytest.approx(
                round(want[i, j], 6), abs=2e-6)


def test_covariance_is_deterministic(emb):
    a = sorted(map(tuple, covariance_matrix(emb).collect()))
    b = sorted(map(tuple, covariance_matrix(emb).collect()))
    assert a == b


def test_pca_fit_matches_numpy_eigh(emb, X):
    mean, comps, eig = pca_fit(emb, k=5)
    w = np.linalg.eigvalsh(np.cov(X, rowvar=False))[::-1][:5]
    assert np.allclose(eig, w, rtol=1e-8)
    assert np.allclose(mean, X.mean(axis=0), rtol=1e-8)
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(5), atol=1e-9)


def test_pca_projection_matches_numpy(emb, X):
    mean, comps, _ = pca_fit(emb, k=4)
    got = {r["vec_id"]: np.array(r["proj"]) for r in
           pca_project(emb, mean, comps).collect()}
    want = (X - X.mean(axis=0)) @ comps.T
    for vid, p in got.items():
        assert np.allclose(p, want[vid], atol=1e-9)


def test_pca_variance_report_self_validates(emb):
    rows = pca_variance_report(emb, k=8).orderBy("component").collect()
    assert len(rows) == 8
    assert all(r["var_matches_eigen"] for r in rows)
    assert all(r["orthonormal_ok"] for r in rows)
    eigs = [r["eigenvalue"] for r in rows]
    assert eigs == sorted(eigs, reverse=True)
    assert 0 < sum(r["explained_ratio"] for r in rows) <= 1.0 + 1e-9


def test_covariance_requires_two_rows(spark):
    import pytest as _pt

    from python_vector_db___ai_spark.operators.pca import _cov_numpy

    one = spark.createDataFrame([(0, [1.0, 2.0])], ["vec_id", "embedding"])
    with _pt.raises(ValueError, match="at least 2 rows"):
        _cov_numpy(one, "embedding")


def test_pca_projection_variance_decreases_with_rank(emb):
    rows = pca_variance_report(emb, k=8).orderBy("component").collect()
    pv = [r["projected_variance"] for r in rows]
    assert pv == sorted(pv, reverse=True)
