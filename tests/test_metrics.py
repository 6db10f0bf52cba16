"""Golden-value tests for operators/metrics.py.

Expected values come from the reference's metric spec
(day_13/test/test_evaluation.py:121-200) — e.g. AP([d1,d3,d2] vs
{d1,d2}) = (1/1 + 2/3)/2 — and hand-computed NDCG.
"""

from __future__ import annotations

import math

import pytest

from python_vector_db___ai_spark.operators.metrics import (
    mean_metrics,
    ranking_metrics,
)


def _run(spark, retrieved: dict[str, list[str]], relevant: dict[str, list[str]],
         k: int):
    res_rows = [(q, d, i + 1) for q, docs in retrieved.items()
                for i, d in enumerate(docs)]
    rel_rows = [(q, d) for q, docs in relevant.items() for d in docs]
    results = spark.createDataFrame(res_rows, ["query_id", "doc_id", "rank"])
    truth = spark.createDataFrame(rel_rows, ["query_id", "doc_id"])
    return {r.query_id: r.asDict()
            for r in ranking_metrics(results, truth, k=k).collect()}


def test_golden_values_from_reference_spec(spark):
    m = _run(
        spark,
        retrieved={
            "perfect": ["d1", "d2", "d3"],      # relevant {d1,d2}
            "imperfect": ["d1", "d3", "d2"],    # relevant {d1,d2}
            "third": ["d3", "d4", "d1"],        # relevant {d1}
            "miss": ["d3", "d4", "d5"],         # relevant {d1}
        },
        relevant={"perfect": ["d1", "d2"], "imperfect": ["d1", "d2"],
                  "third": ["d1"], "miss": ["d1"]},
        k=3,
    )
    # test_precision_calculation: partial case 2/3
    assert m["imperfect"]["precision_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    # test_average_precision: perfect (1/1+2/2)/2=1.0; imperfect (1/1+2/3)/2
    assert m["perfect"]["avg_precision"] == pytest.approx(1.0, abs=1e-6)
    assert m["imperfect"]["avg_precision"] == pytest.approx((1 + 2 / 3) / 2, abs=1e-4)
    # test_reciprocal_rank: first=1.0, third=1/3, not-found=0.0
    assert m["perfect"]["reciprocal_rank"] == pytest.approx(1.0)
    assert m["third"]["reciprocal_rank"] == pytest.approx(1 / 3, abs=1e-4)
    assert m["miss"]["reciprocal_rank"] == 0.0
    # recall: perfect 1.0; miss 0.0
    assert m["perfect"]["recall_at_k"] == pytest.approx(1.0)
    assert m["miss"]["recall_at_k"] == 0.0
    # hit rate
    assert m["perfect"]["hit_rate_at_k"] == 1.0
    assert m["miss"]["hit_rate_at_k"] == 0.0
    # NDCG: perfect ranking = 1.0; imperfect = (1 + 1/log2(4)) / (1 + 1/log2(3))
    assert m["perfect"]["ndcg_at_k"] == pytest.approx(1.0, abs=1e-6)
    exp_ndcg = (1 + 1 / math.log2(4)) / (1 + 1 / math.log2(3))
    assert m["imperfect"]["ndcg_at_k"] == pytest.approx(exp_ndcg, abs=1e-4)
    # F1 from P and R: imperfect P=2/3 R=1 → 0.8
    assert m["imperfect"]["f1_at_k"] == pytest.approx(0.8, abs=1e-4)


def test_mean_metrics(spark):
    res = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q2", "d9", 1), ("q2", "d1", 2)],
        ["query_id", "doc_id", "rank"])
    truth = spark.createDataFrame(
        [("q1", "d1"), ("q2", "d1")], ["query_id", "doc_id"])
    row = mean_metrics(ranking_metrics(res, truth, k=2)).collect()[0]
    assert row.n_queries == 2
    # q1: P@2=0.5 RR=1; q2: P@2=0.5 RR=0.5
    assert row.mean_precision_at_k == pytest.approx(0.5)
    assert row.mean_reciprocal_rank == pytest.approx(0.75)


def test_zero_relevant_and_zero_retrieved_queries(spark):
    """A query with no ground truth must not crash the IDCG closed
    form (ANSI divide-by-zero), and a query with ground truth but no
    retrieved rows must still emit an all-zero row so means are not
    inflated."""
    from python_vector_db___ai_spark.operators.metrics import (
        mean_metrics,
        ranking_metrics,
    )

    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2),       # q1: retrieved, has truth
         (2, 20, 1)],                  # q2: retrieved, NO truth
        "query_id long, doc_id long, rank long")
    relevant = spark.createDataFrame(
        [(1, 10), (3, 30)],            # q3: truth, NOTHING retrieved
        "query_id long, doc_id long")
    rows = {r.query_id: r for r in
            ranking_metrics(results, relevant, k=5).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].ndcg_at_k == 0.0 and rows[2].n_relevant == 0
    assert rows[3].precision_at_k == 0.0
    assert rows[3].recall_at_k == 0.0
    assert rows[3].n_relevant == 1
    assert rows[1].precision_at_k == 0.5
    mean = mean_metrics(ranking_metrics(results, relevant, k=5)).collect()[0]
    assert mean.n_queries == 3          # zero-retrieved query counted
