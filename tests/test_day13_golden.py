"""Golden parity test: the reference's committed evaluation results
(day_13/results/evaluation_summary.csv) reproduced bit-for-bit from its
exact simulated-retrieval fixture (day_13/src/main.py:446-574).

| K  | P      | R      | F1     | MAP    | MRR | NDCG   | HitRate |
| 1  | 1.0000 | 0.7083 | 0.7917 | 0.9375 | 1.0 | 1.0000 | 1.0     |
| 3  | 0.5000 | 0.9167 | 0.6167 | 0.9375 | 1.0 | 0.9213 | 1.0     |
| 5  | 0.3500 | 1.0000 | 0.4970 | 0.9375 | 1.0 | 0.9718 | 1.0     |
| 10 | 0.3500 | 1.0000 | 0.4970 | 0.9375 | 1.0 | 0.9718 | 1.0     |
"""

from __future__ import annotations

import pytest

from python_vector_db___ai_spark.operators.crud import query_history_stats
from python_vector_db___ai_spark.operators.metrics import (
    mean_metrics,
    ranking_metrics,
)

# The reference's simulated ranked results (doc ids in rank order).
RETRIEVED = {
    "query_1": ["doc_1", "doc_2", "doc_5", "doc_3", "doc_4"],
    "query_2": ["doc_2", "doc_1", "doc_6", "doc_7", "doc_4"],
    "query_3": ["doc_5", "doc_6", "doc_1", "doc_7", "doc_2"],
    "query_4": ["doc_3", "doc_1", "doc_2", "doc_4", "doc_5"],
}
RELEVANT = {
    "query_1": ["doc_1", "doc_5"],
    "query_2": ["doc_2"],
    "query_3": ["doc_5", "doc_6", "doc_7"],
    "query_4": ["doc_3"],
}
RETRIEVAL_TIME = {"query_1": 0.045, "query_2": 0.038,
                  "query_3": 0.052, "query_4": 0.041}

GOLDEN = {
    1: (1.0000, 0.7083, 0.7917, 0.9375, 1.0, 1.0000, 1.0),
    3: (0.5000, 0.9167, 0.6167, 0.9375, 1.0, 0.9213, 1.0),
    5: (0.3500, 1.0000, 0.4970, 0.9375, 1.0, 0.9718, 1.0),
    10: (0.3500, 1.0000, 0.4970, 0.9375, 1.0, 0.9718, 1.0),
}


@pytest.fixture(scope="module")
def frames(spark):
    res = spark.createDataFrame(
        [(q, d, i + 1) for q, ds in RETRIEVED.items()
         for i, d in enumerate(ds)],
        ["query_id", "doc_id", "rank"])
    rel = spark.createDataFrame(
        [(q, d) for q, ds in RELEVANT.items() for d in ds],
        ["query_id", "doc_id"])
    return res, rel


@pytest.mark.parametrize("k", [1, 3, 5, 10])
def test_reference_golden_values(spark, frames, k):
    res, rel = frames
    m = mean_metrics(ranking_metrics(res, rel, k=k)).collect()[0]
    p, r, f1, mapv, mrr, ndcg, hit = GOLDEN[k]
    assert m.mean_precision_at_k == pytest.approx(p, abs=5e-5)
    assert m.mean_recall_at_k == pytest.approx(r, abs=5e-5)
    assert m.mean_f1_at_k == pytest.approx(f1, abs=5e-5)
    assert m.mean_avg_precision == pytest.approx(mapv, abs=5e-5)
    assert m.mean_reciprocal_rank == pytest.approx(mrr, abs=5e-5)
    assert m.mean_ndcg_at_k == pytest.approx(ndcg, abs=5e-5)
    assert m.mean_hit_rate_at_k == pytest.approx(hit, abs=5e-5)


def test_reference_qps(spark):
    # day_13/src/main.py:310-319: qps = n / total_time ≈ 22.7 q/s
    log = spark.createDataFrame(
        [(q, t) for q, t in RETRIEVAL_TIME.items()],
        ["query_id", "retrieval_time"])
    s = query_history_stats(log).collect()[0]
    assert s.qps == pytest.approx(22.7, abs=0.05)
    assert s.avg_time_sec == pytest.approx(0.044, abs=1e-9)
