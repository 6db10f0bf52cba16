"""Product-quantization tier: deterministic codebooks, encode shape,
reconstruction-error behavior, and ADC search recall vs the exact scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.ivf import recall_against_exact
from python_vector_db___ai_spark.operators.pq import (
    pq_adc_search,
    pq_encode,
    pq_reconstruction_error,
    pq_train,
)
from python_vector_db___ai_spark.operators.search import knn_join_blas
from python_vector_db___ai_spark.session import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return (emb.filter(F.col("vec_id") < 20)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec")))


def test_pq_train_deterministic_and_encode_shape(emb):
    from python_vector_db___ai_spark.operators.pq import _unpack_codes
    import numpy as np

    m1 = pq_train(emb, m=8, n_codes=16, iters=5)
    m2 = pq_train(emb, m=8, n_codes=16, iters=5)
    assert (m1[2] == m2[2]).all()           # same seed -> same codebooks
    rows = pq_encode(emb, m1).collect()
    packed = np.array([r.pq_code for r in rows], dtype=np.int64)
    codes = _unpack_codes(packed, 8)
    assert codes.shape == (emb.count(), 8)
    assert ((codes >= 0) & (codes < 16)).all()


def test_pq_reconstruction_error_shrinks_with_codes(emb):
    small = pq_train(emb, m=8, n_codes=4, iters=5)
    big = pq_train(emb, m=8, n_codes=64, iters=5)
    e_small = (pq_reconstruction_error(emb, small)
               .agg(F.avg("l2_error")).collect()[0][0])
    e_big = (pq_reconstruction_error(emb, big)
             .agg(F.avg("l2_error")).collect()[0][0])
    assert e_big < e_small          # more codes -> strictly better fit
    assert e_big > 0.0              # lossy, not magic


def test_pq_adc_recall_and_ordering(emb, queries):
    books = pq_train(emb, m=8, n_codes=64, iters=8)
    encoded = pq_encode(emb, books).cache()
    adc = pq_adc_search(queries, encoded, books, k=10)
    rows = adc.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists)
        # a query that IS a corpus vector quantizes to its own code, so
        # its ADC self-distance is the reconstruction floor -> rank 1
        assert rs[0].vec_id == q
    # PQ is a candidate filter: with a 5x over-fetch the 8-byte codes
    # recover most true L2 neighbors even on this worst-case
    # (unstructured) corpus, and over-fetching strictly helps.
    exact = knn_join_blas(queries, emb, k=10, metric="l2",
                          corpus_id="vec_id")
    truth = {(r.query_id, r.vec_id) for r in exact.collect()}

    def cand_recall(kk):
        cand = {(r.query_id, r.vec_id) for r in
                pq_adc_search(queries, encoded, books, k=kk).collect()}
        return len(truth & cand) / len(truth)

    r10, r50 = cand_recall(10), cand_recall(50)
    assert r50 > r10
    assert r50 >= 0.75, (r10, r50)


def test_pq_rerank_end_to_end(emb, queries):
    """ADC filter + exact re-rank: results are a subset of the ADC
    candidates with true L2 scores, self-hit at rank 1."""
    from python_vector_db___ai_spark.operators.pq import pq_search_rerank

    books = pq_train(emb, m=8, n_codes=64, iters=8)
    encoded = pq_encode(emb, books).cache()
    got = pq_search_rerank(queries, emb, encoded, books, k=5, overfetch=6,
                           metric="l2")
    rows = got.collect()
    top = {r.query_id: r for r in rows if r.rank == 1}
    for qid, r in top.items():
        assert r.vec_id == qid           # exact self-match survives
        assert r.score == pytest.approx(0.0, abs=1e-6)
    exact = {(r.query_id, r.vec_id): r.score for r in
             knn_join_blas(queries, emb, k=200, metric="l2",
                           corpus_id="vec_id").collect()}
    for r in rows:                       # re-ranked scores are true L2
        assert exact[(r.query_id, r.vec_id)] == pytest.approx(
            r.score, abs=1e-6)


def test_ivfpq_full_probe_equals_flat_pq(emb, queries):
    """Probing every cluster makes IVFPQ degenerate to flat PQ+re-rank
    — identical results; with few probes it returns a valid per-query
    top-k with true scores and the self-hit at rank 1."""
    from python_vector_db___ai_spark.operators.ivf import (
        assign_clusters,
        kmeans_centroids,
    )
    from python_vector_db___ai_spark.operators.pq import (
        ivfpq_search,
        pq_search_rerank,
    )

    books = pq_train(emb, m=8, n_codes=64, iters=8, normalize=True)
    encoded = pq_encode(emb, books).cache()
    cents = kmeans_centroids(emb, nlist=8, seed=42).cache()
    assigned = assign_clusters(emb, cents, spill=2,
                               cluster_col="cluster_id")
    ea = assigned.select("vec_id", "cluster_id") \
        .join(encoded, "vec_id").cache()

    flat = {(r.query_id, r.rank): (r.vec_id, r.score) for r in
            pq_search_rerank(queries, emb, encoded, books, k=5,
                             overfetch=6, metric="cosine").collect()}
    full = {(r.query_id, r.rank): (r.vec_id, r.score) for r in
            ivfpq_search(queries, emb, ea, cents, books, nprobe=8,
                         k=5, overfetch=6).collect()}
    assert flat == full

    few = ivfpq_search(queries, emb, ea, cents, books, nprobe=3,
                       k=5, overfetch=6).collect()
    by_q = {}
    for r in few:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert sorted(r.rank for r in rs) == list(range(1, len(rs) + 1))
        top = min(rs, key=lambda r: r.rank)
        assert top.vec_id == q and top.score == pytest.approx(1.0, 1e-6)


def test_pq_adc_empty_queries_returns_empty(emb, queries):
    books = pq_train(emb, m=8, n_codes=16, iters=3)
    encoded = pq_encode(emb, books)
    none = queries.filter(F.col("query_id") < 0)
    out = pq_adc_search(none, encoded, books, k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "adc_dist", "rank"]


@pytest.mark.parametrize("seed", [0, 7, 123])
def test_pq_adc_matches_numpy_replay(spark, seed):
    """Differential test: the distributed ADC pipeline — Spark-side
    encode (expanded-form argmin, little-endian bigint packing), LUT
    gather over Arrow batches, local top-k, window merge — must equal
    an independent NumPy replay that encodes with direct
    ``||x - c||^2`` argmin and ranks by (rounded dist, vec_id).  The
    two encode forms differ by float-eps only, so any divergence is a
    packing/gather/ranking bug, not numerics."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n, d, m, n_codes = 30, 8, 4, 8
    V = rng.standard_normal((n, d))
    Qm = V[:3] + 0.05 * rng.standard_normal((3, d))

    corpus = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(100 + qi, [float(x) for x in Qm[qi]]) for qi in range(3)],
        "query_id long, query_vec array<double>")

    books = pq_train(corpus, m=m, n_codes=n_codes, iters=4,
                     normalize=False)
    enc = pq_encode(corpus, books)
    got = pq_adc_search(queries, enc, books, k=n).collect()

    B = books[2]                      # (m, n_codes, d/m)
    sub = d // m
    codes = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        diff = V[:, j * sub:(j + 1) * sub][:, None, :] - B[j][None, :, :]
        codes[:, j] = (diff ** 2).sum(-1).argmin(1)
    want = {}
    for qi in range(3):
        dist = np.zeros(n)
        for j in range(m):
            lut = ((Qm[qi, j * sub:(j + 1) * sub][None, :]
                    - B[j]) ** 2).sum(-1)
            dist += lut[codes[:, j]]
        dist = np.round(np.sqrt(np.clip(dist, 0.0, None)), 6)
        order = sorted(range(n), key=lambda i: (dist[i], i))
        for rank, i in enumerate(order, start=1):
            want[(100 + qi, i)] = (float(dist[i]), rank)

    assert len(got) == 3 * n
    for r in got:
        wd, wr = want[(r.query_id, r.vec_id)]
        assert r.adc_dist == pytest.approx(wd, abs=1e-9)
        assert r.rank == wr
