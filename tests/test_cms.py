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


def test_cms_eps_n_bound_holds_on_testdata_corpus(spark):
    """ADVISORY invariant (round-6 ADVICE): the eps-N upper bound is
    probabilistic per key (w.p. ~1 - e^-depth over hash draws), so it
    is asserted here — where the fixed md5 hashes make it a
    reproducible fact of this corpus — instead of being a hash-checked
    oracle column in ``words_heavy_hitters_cms``."""
    from python_vector_db___ai_spark.operators.dedup import words_col
    from python_vector_db___ai_spark.session import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    words = docs.select(F.explode(words_col(F.col("text"))).alias("word"))
    table, n = cms_build(words, token_col="word")
    eps_n = 2.718281828 / table.shape[1] * n
    top = (words.groupBy("word").agg(F.count("*").alias("c"))
           .orderBy(F.col("c").desc(), F.col("word").asc())
           .limit(20).collect())
    for r in top:
        est = cms_estimate(table, r["word"])
        assert est >= r["c"]               # deterministic one-sided
        assert est <= r["c"] + eps_n       # advisory eps-N bound


def test_cms_unseen_key_estimate_is_spurious_only(spark):
    toks = spark.createDataFrame([("x",)] * 50, ["token"])
    table, n = cms_build(toks)
    # an unseen key's estimate is only collision mass: 0 or 50 here,
    # and never negative
    est = cms_estimate(table, "never-seen")
    assert est in (0, 50)
