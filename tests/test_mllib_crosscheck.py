"""W2 cross-check (SURVEY §7 step 7): our window-based ranking metrics
must agree with MLlib's RankingMetrics on MAP and NDCG."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.metrics import (
    mean_metrics,
    ranking_metrics,
)

RETRIEVED = {
    "q1": ["d1", "d3", "d2", "d9"],
    "q2": ["d7", "d1", "d5"],
    "q3": ["d2", "d4", "d6", "d8", "d1"],
}
RELEVANT = {
    "q1": ["d1", "d2"],
    "q2": ["d1"],
    "q3": ["d6", "d1", "d99"],
}
K = 10


@pytest.fixture(scope="module")
def ours(spark):
    res = spark.createDataFrame(
        [(q, d, i + 1) for q, ds in RETRIEVED.items() for i, d in enumerate(ds)],
        ["query_id", "doc_id", "rank"])
    rel = spark.createDataFrame(
        [(q, d) for q, ds in RELEVANT.items() for d in ds],
        ["query_id", "doc_id"])
    return mean_metrics(ranking_metrics(res, rel, k=K)).collect()[0]


def test_map_matches_mllib(spark, ours):
    from pyspark.mllib.evaluation import RankingMetrics

    pairs = [(RETRIEVED[q], RELEVANT[q]) for q in RETRIEVED]
    rm = RankingMetrics(spark.sparkContext.parallelize(pairs))
    assert ours.mean_avg_precision == pytest.approx(rm.meanAveragePrecision,
                                                    abs=1e-6)


def test_ndcg_matches_mllib(spark, ours):
    from pyspark.mllib.evaluation import RankingMetrics

    pairs = [(RETRIEVED[q], RELEVANT[q]) for q in RETRIEVED]
    rm = RankingMetrics(spark.sparkContext.parallelize(pairs))
    assert ours.mean_ndcg_at_k == pytest.approx(rm.ndcgAt(K), abs=1e-6)


def test_precision_at_k_matches_mllib(spark):
    # MLlib divides P@k by k; the reference divides by
    # min(k, n_retrieved) (day_13/src/main.py:143).  The conventions
    # coincide when every result list has >= k entries — compare there.
    from pyspark.mllib.evaluation import RankingMetrics

    k = 3   # all RETRIEVED lists have >= 3 entries
    res = spark.createDataFrame(
        [(q, d, i + 1) for q, ds in RETRIEVED.items()
         for i, d in enumerate(ds)],
        ["query_id", "doc_id", "rank"])
    rel = spark.createDataFrame(
        [(q, d) for q, ds in RELEVANT.items() for d in ds],
        ["query_id", "doc_id"])
    ours_k3 = mean_metrics(ranking_metrics(res, rel, k=k)).collect()[0]
    pairs = [(RETRIEVED[q], RELEVANT[q]) for q in RETRIEVED]
    rm = RankingMetrics(spark.sparkContext.parallelize(pairs))
    assert ours_k3.mean_precision_at_k == pytest.approx(rm.precisionAt(k),
                                                        abs=1e-6)
