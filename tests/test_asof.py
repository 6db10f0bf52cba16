"""asof_join semantics: backward inclusive match, null for unmatched,
latest-wins, and the linear (single-shuffle) plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 10:00:00")),   # matches r2 (09:59)
         (2, 7, _ts("2024-01-01 09:00:00")),   # before any right -> null
         (3, 7, _ts("2024-01-01 09:30:00")),   # equal ts -> inclusive
         (4, 8, _ts("2024-01-01 12:00:00"))],  # other key, one match
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(7, _ts("2024-01-01 09:30:00"), 100),
         (7, _ts("2024-01-01 09:59:00"), 101),
         (8, _ts("2024-01-01 11:00:00"), 102)],
        "user_id long, ts timestamp, rid long")
    out = {r.event_id: r.asof_rid
           for r in asof_join(left, right, on="user_id",
                              right_cols=["rid"]).collect()}
    assert out == {1: 101, 2: None, 3: 100, 4: 102}


def test_asof_keeps_left_columns_and_match_ts(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 10:00:00"), 3.5)],
        "event_id long, user_id long, ts timestamp, value double")
    right = spark.createDataFrame(
        [(7, _ts("2024-01-01 09:00:00"), 100)],
        "user_id long, ts timestamp, rid long")
    r = asof_join(left, right, on="user_id", right_cols=["rid"]).collect()[0]
    assert (r.event_id, r.value, r.asof_rid) == (1, 3.5, 100)
    assert r.asof_ts == _ts("2024-01-01 09:00:00")
    assert r.ts == _ts("2024-01-01 10:00:00")


def test_asof_single_shuffle(spark):
    """The union-and-carry plan must shuffle ONCE (on the key) — no
    inequality join, no second exchange."""
    from python_vector_db___ai_spark.plans.explain import count_exchanges

    left = spark.range(10).select(
        F.col("id").alias("event_id"), (F.col("id") % 3).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"))
    right = spark.range(5).select(
        (F.col("id") % 3).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 100).alias("ts"),
        F.col("id").alias("rid"))
    out = asof_join(left, right, on="user_id", right_cols=["rid"])
    assert count_exchanges(out) <= 2  # one per union leg, same key, no more
    assert "Join" not in out._jdf.queryExecution().executedPlan().toString()
