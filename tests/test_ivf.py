"""IVF / recall-harness tests (the day-6 exact-oracle pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.ivf import (
    build_centroids,
    ivf_search,
    recall_against_exact,
)
from python_vector_db___ai_spark.operators.search import knn_join
from python_vector_db___ai_spark.session import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return (emb.filter(F.col("vec_id") < 10)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec")))


def test_centroids_simple(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 3.0]), (0, [3.0, 5.0]), (1, [10.0, 10.0])],
        ["label", "embedding"])
    got = {r.label: r.centroid for r in build_centroids(df).collect()}
    assert got[0] == [2.0, 4.0]
    assert got[1] == [10.0, 10.0]


def test_recall_of_exact_vs_itself_is_one(emb, queries):
    exact = knn_join(queries, emb, k=10, corpus_id="vec_id")
    rec = recall_against_exact(exact, exact, corpus_id="vec_id").collect()
    assert len(rec) == 10
    assert all(r.recall == 1.0 and r.n_exact == 10 for r in rec)


def test_ivf_full_probe_equals_exact(emb, queries):
    # probing ALL clusters makes IVF exact: recall must be 1.0
    approx = ivf_search(queries, emb, nprobe=10, k=10,
                        corpus_id="vec_id", cluster_col="label")
    exact = knn_join(queries, emb, k=10, corpus_id="vec_id")
    rec = recall_against_exact(approx, exact, corpus_id="vec_id").collect()
    assert all(r.recall == 1.0 for r in rec)


def test_ivf_pruned_recall_reasonable(emb, queries):
    approx = ivf_search(queries, emb, nprobe=3, k=10,
                        corpus_id="vec_id", cluster_col="label")
    exact = knn_join(queries, emb, k=10, corpus_id="vec_id")
    rec = recall_against_exact(approx, exact, corpus_id="vec_id")
    mean = rec.agg(F.avg("recall")).collect()[0][0]
    assert 0.2 <= mean <= 1.0   # reported, not assumed (SURVEY §7)
    # every query still returns k results
    counts = approx.groupBy("query_id").count().collect()
    assert all(c["count"] == 10 for c in counts)


def test_kmeans_silhouette_invariants(spark):
    """The MLlib sweep has no SQL oracle; its self-checked invariant
    columns (silhouette in [-1,1], inertia non-increasing in k) must be
    uniformly true on the seeded sweep."""
    from python_vector_db___ai_spark.operators.ivf import kmeans_silhouette_sweep
    from python_vector_db___ai_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = kmeans_silhouette_sweep(emb, k_values=range(2, 6)).collect()
    assert len(rows) == 4
    assert all(r.silhouette_in_range for r in rows)
    assert all(r.inertia_non_increasing for r in rows)
    assert all(-1.0 <= r.silhouette <= 1.0 for r in rows)


def test_silhouette_matches_independent_numpy(spark):
    """r10 (r9 directive #6b): the silhouette number the rows-only
    sweep reports is recomputed INDEPENDENTLY from the cluster
    assignments with the published squared-Euclidean closed form
    (a(i)/b(i) as average squared distances expressed through each
    cluster's count, vector sum and squared-norm sum; s(i) =
    (b-a)/max(a,b), mean over points) — the strongest check available
    for an iterative MLlib-internal metric with no SQL oracle."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.evaluation import ClusteringEvaluator
    from pyspark.ml.functions import array_to_vector
    from python_vector_db___ai_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    feats = emb.withColumn(
        "_features", array_to_vector(F.col("embedding").cast("array<double>")))
    model = KMeans(k=4, seed=42, featuresCol="_features",
                   predictionCol="_p").fit(feats)
    pred = model.transform(feats)
    mllib_sil = float(ClusteringEvaluator(
        featuresCol="_features", predictionCol="_p",
        metricName="silhouette").evaluate(pred))

    rows = pred.select("embedding", "_p").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    lab = np.array([r["_p"] for r in rows])
    ks = np.unique(lab)
    stats = {int(k): (int((lab == k).sum()),
                      X[lab == k].sum(axis=0),
                      float((X[lab == k] ** 2).sum())) for k in ks}

    def avg_sq_dist(x, k):
        n, y, psi = stats[k]
        return psi / n - 2.0 * (x @ y) / n + float(x @ x)

    s_vals = []
    for x, own in zip(X, lab):
        n_own = stats[int(own)][0]
        if n_own == 1:
            s_vals.append(0.0)
            continue
        # own-cluster average excludes the point itself: its squared
        # self-distance is 0, so the average over the OTHER n-1
        # points is the include-self average rescaled by n/(n-1)
        a = avg_sq_dist(x, int(own)) * n_own / (n_own - 1)
        b = min(avg_sq_dist(x, int(k)) for k in ks if k != own)
        s_vals.append((b - a) / max(a, b))
    assert abs(float(np.mean(s_vals)) - mllib_sil) < 1e-6, \
        (float(np.mean(s_vals)), mllib_sil)
