"""Unit tests for functions/vector.py against NumPy ground truth,
mirroring the reference's inline cross-validation
(day_2/noramalization.py:153-161 manual-vs-scipy cosine check)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.vector import (
    cosine_similarity,
    euclidean_similarity,
    l2_distance,
    l2_normalize,
    neg_inner_product,
    vec_dot,
    vec_norm,
)

VECS = [
    ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
    ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),   # zero-vector guard
    ([-1.0, 0.5, 2.5], [3.0, -2.0, 0.0]),
    ([1e-3, 1e-3, 1e-3], [1e3, 1e3, 1e3]),
]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(VECS)], ["id", "a", "b"])


def _np_cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na < 1e-12 or nb < 1e-12:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def test_dot_norm_cosine_l2(pairs_df):
    rows = pairs_df.select(
        "id",
        vec_dot(F.col("a"), F.col("b")).alias("dot"),
        vec_norm(F.col("a")).alias("na"),
        cosine_similarity(F.col("a"), F.col("b")).alias("cos"),
        l2_distance(F.col("a"), F.col("b")).alias("l2"),
        neg_inner_product(F.col("a"), F.col("b")).alias("nip"),
        euclidean_similarity(F.col("a"), F.col("b")).alias("esim"),
    ).collect()
    for r in rows:
        a, b = np.array(VECS[r.id][0]), np.array(VECS[r.id][1])
        assert r.dot == pytest.approx(float(np.dot(a, b)), abs=1e-9)
        assert r.na == pytest.approx(float(np.linalg.norm(a)), abs=1e-9)
        assert r.cos == pytest.approx(_np_cos(a, b), abs=1e-9)
        assert r.l2 == pytest.approx(float(np.linalg.norm(a - b)), abs=1e-9)
        assert r.nip == pytest.approx(-float(np.dot(a, b)), abs=1e-9)
        assert r.esim == pytest.approx(1.0 / (1.0 + np.linalg.norm(a - b)), abs=1e-9)


def test_l2_normalize_invariant(pairs_df):
    # ||l2_normalize(v)|| == 1 for non-zero v; zero vector passes through
    # (day_2/noramalization.py:96,74).
    rows = pairs_df.select(
        "id", vec_norm(l2_normalize(F.col("a"))).alias("n")).collect()
    for r in rows:
        a = np.array(VECS[r.id][0])
        expected = 0.0 if np.linalg.norm(a) < 1e-12 else 1.0
        assert r.n == pytest.approx(expected, abs=1e-9)


def test_cosine_self_is_one(pairs_df):
    rows = pairs_df.select(
        "id", cosine_similarity(F.col("a"), F.col("a")).alias("c")).collect()
    for r in rows:
        a = np.array(VECS[r.id][0])
        expected = 0.0 if np.linalg.norm(a) < 1e-12 else 1.0
        assert r.c == pytest.approx(expected, abs=1e-9)


def test_embedding_outlier_zscores(spark):
    from python_vector_db___ai_spark.operators.embedding import (
        embedding_outlier_zscores,
    )

    # cluster 0: nine vectors near the origin plus one far outlier
    rows = [(i, [0.0, float(i % 3) * 0.1], 0) for i in range(9)]
    rows.append((9, [50.0, 50.0], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = embedding_outlier_zscores(emb, z_threshold=2.0, k=5).collect()
    assert [r.vec_id for r in out] == [9]
    assert out[0].z > 2.0
