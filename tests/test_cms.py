"""Count-min sketch invariants: one-sided error, merge correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.cms import (
    cms_build,
    cms_estimate,
)


def test_cms_estimates_are_one_sided_and_tight_on_small_vocab(spark):
    rows = [("a",)] * 100 + [("b",)] * 37 + [("c",)] * 5
    toks = spark.createDataFrame(rows, ["token"]).repartition(4)
    table, n = cms_build(toks)
    assert n == 142
    exact = {"a": 100, "b": 37, "c": 5}
    for w, c in exact.items():
        est = cms_estimate(table, w)
        assert est >= c                      # collisions only add
        assert est <= c + (2.718281828 / table.shape[1]) * n + 1
    # 3 keys in 1024 cells: min over 4 rows is almost surely exact
    assert cms_estimate(table, "a") == 100


def test_cms_partition_merge_equals_single_partition(spark):
    rows = [(f"w{i % 7}",) for i in range(1000)]
    t1, n1 = cms_build(
        spark.createDataFrame(rows, ["token"]).repartition(8))
    t2, n2 = cms_build(
        spark.createDataFrame(rows, ["token"]).coalesce(1))
    assert n1 == n2 == 1000
    assert (t1 == t2).all()   # element-wise merge == one-shot build


def test_cms_unseen_key_estimate_is_spurious_only(spark):
    toks = spark.createDataFrame([("x",)] * 50, ["token"])
    table, n = cms_build(toks)
    # an unseen key's estimate is only collision mass: 0 or 50 here,
    # and never negative
    est = cms_estimate(table, "never-seen")
    assert est in (0, 50)
