"""Tests for operators/search.py: kNN correctness vs NumPy brute force
(the day-6 exact-oracle pattern, day_6/day6_complete.py:249-263)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.search import (
    knn_join,
    search,
    similarity_matrix,
    topk_pairs,
)
from python_vector_db___ai_spark.session import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    return (np.array([r.vec_id for r in rows]),
            np.array([r.embedding for r in rows], dtype=np.float64))


def test_knn_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))
    got = knn_join(queries, emb, k=10, metric="cosine", corpus_id="vec_id")
    got_rows = {(r.query_id, r.rank): r.vec_id for r in got.collect()}

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    normed = mat / np.clip(norms, 1e-12, None)
    for qi in range(5):
        sims = np.round(normed @ normed[qi], 6)
        # sort by (-score, id) to mirror the deterministic tie-break
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))[:10]
        for rank, idx in enumerate(order, 1):
            assert got_rows[(qi, rank)] == ids[idx], (qi, rank)


def test_search_single_query_topk(spark, emb, emb_np):
    ids, mat = emb_np
    qv = mat[7].tolist()
    got = search(emb, qv, k=5, metric="l2", corpus_id="vec_id").collect()
    dists = np.linalg.norm(mat - mat[7], axis=1)
    expect = [ids[i] for i in np.argsort(dists, kind="stable")[:5]]
    assert [r.vec_id for r in got] == expect
    assert got[0].vec_id == 7   # self is nearest under L2


def test_topk_pairs_upper_triangle(spark, emb):
    small = emb.filter(F.col("vec_id") < 50)
    rows = topk_pairs(small, k=5, metric="cosine",
                      id_col="vec_id", vec_col="embedding").collect()
    assert len(rows) == 5
    assert all(r.i < r.j for r in rows)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_similarity_matrix_invariants(spark, emb):
    # diagonal == 1, symmetric (day_2/noramalization.py:196-205)
    small = emb.filter(F.col("vec_id") < 10)
    m = {(r.i, r.j): r.sim
         for r in similarity_matrix(small, id_col="vec_id").collect()}
    for i in range(10):
        assert m[(i, i)] == pytest.approx(1.0, abs=1e-9)
        for j in range(10):
            assert m[(i, j)] == pytest.approx(m[(j, i)], abs=1e-9)


def test_knn_multi_metric_equals_single_metric(spark):
    """One-matmul multi-metric kNN is row-identical to three separate
    single-metric BLAS scans."""
    from python_vector_db___ai_spark.operators.search import (
        knn_join_blas,
        knn_join_blas_multi,
    )
    from python_vector_db___ai_spark.session import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    multi = {(r.metric, r.query_id, r.rank): (r.vec_id, r.score) for r in
             knn_join_blas_multi(q, emb, k=7, corpus_id="vec_id").collect()}
    for metric, label in (("cosine", "cosine"), ("l2", "l2"),
                          ("inner_product", "dot")):
        single = {(label, r.query_id, r.rank): (r.vec_id, r.score) for r in
                  knn_join_blas(q, emb, k=7, metric=metric,
                                corpus_id="vec_id").collect()}
        for key, val in single.items():
            assert multi[key] == val, (key, val, multi.get(key))
    assert len(multi) == 3 * 5 * 7
