"""foreachBatch MERGE ingest (S9/S10): the standing-table reduction is
associative (so the final state cannot depend on how the engine split
the stream into micro-batches), and the drained final state equals a
direct batch computation over the same events."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from python_vector_db___ai_spark.session import load_table
from python_vector_db___ai_spark.streaming.ingest import (
    _INGEST_STATE_SCHEMA,
    _ingest_reduce,
    ingest_foreachbatch,
)
from tests.conftest import SF_DIR

_RAW_SCHEMA = ("user_id long, "
               "s struct<last_ts_us:long, last_event_id:long, "
               "last_event_type:string, last_value:double, "
               "last_e0:double>, n_events long")


def _row(u, ts, eid, etype, val, e0, n=1):
    return (u, (ts, eid, etype, val, e0), n)


def test_ingest_reduce_is_batching_invariant(spark):
    """reduce(reduce(A) ∪ reduce(B)) == reduce(A ∪ B): the property
    that makes the final table state independent of micro-batch
    boundaries."""
    a = [_row(1, 100, 1, "click", 1.0, 0.1),
         _row(1, 200, 2, "view", 2.0, 0.2),
         _row(2, 150, 3, "click", 3.0, 0.3)]
    b = [_row(1, 200, 4, "purchase", 4.0, 0.4),   # ts tie, higher id wins
         _row(2, 120, 5, "view", 5.0, 0.5),       # older -> loses
         _row(3, 999, 6, "click", 6.0, 0.6)]
    fa = spark.createDataFrame(a, _RAW_SCHEMA)
    fb = spark.createDataFrame(b, _RAW_SCHEMA)
    split = _ingest_reduce(_ingest_reduce(fa).unionByName(_ingest_reduce(fb)))
    whole = _ingest_reduce(fa.unionByName(fb))
    key = lambda r: r["user_id"]  # noqa: E731
    assert sorted(split.collect(), key=key) == sorted(whole.collect(),
                                                      key=key)
    got = {r["user_id"]: r for r in whole.collect()}
    assert got[1]["s"]["last_event_id"] == 4 and got[1]["n_events"] == 3
    assert got[2]["s"]["last_event_id"] == 3 and got[2]["n_events"] == 2


def test_ingest_final_state_equals_batch(spark):
    """End-to-end: the drained standing table equals the last-write-
    wins window + count groupBy computed directly on the batch read —
    the same replay the DuckDB oracle runs."""
    from python_vector_db___ai_spark.operators.embedding import mock_embedding

    got = sorted(ingest_foreachbatch(spark, SF_DIR).collect(),
                 key=lambda r: r["user_id"])
    ev = load_table(spark, SF_DIR, "events")
    emb = mock_embedding(F.col("props"), dim=8)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                              F.col("event_id").desc())
    last = (ev.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("user_id",
                    F.unix_micros("ts").alias("last_ts_us"),
                    F.col("event_id").alias("last_event_id"),
                    F.col("event_type").alias("last_event_type"),
                    F.round("value", 6).alias("last_value"),
                    F.round(F.element_at(emb, 1), 6).alias("last_e0")))
    counts = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"))
    want_df = spark.createDataFrame(
        last.join(counts, "user_id")
        .select("user_id", "last_ts_us", "last_event_id",
                "last_event_type", "last_value", "last_e0",
                "n_events").collect(),
        _INGEST_STATE_SCHEMA)
    want = sorted(want_df.collect(), key=lambda r: r["user_id"])
    assert got == want
    assert len(got) > 0


def test_fold_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a micro-batch whose
    generation already committed must not re-merge it (the reduction is
    associative but not idempotent — n_events would double-count)."""
    from python_vector_db___ai_spark.streaming.ingest import _fold_batch

    def upd(user_id, ts_us, n):
        return spark.createDataFrame(
            [(user_id, (ts_us, 1, "click", 1.0, 0.5), n)],
            "user_id long, s struct<last_ts_us:long, last_event_id:long, "
            "last_event_type:string, last_value:double, last_e0:double>, "
            "n_events long")

    root = str(tmp_path)
    state: dict = {"path": None}
    _fold_batch(spark, root, state, upd(1, 100, 2), 0)
    path_after_b0 = state["path"]
    # replay of batch 0 — generation exists, merge must be skipped
    _fold_batch(spark, root, state, upd(1, 100, 2), 0)
    assert state["path"] == path_after_b0
    got = spark.read.parquet(state["path"]).collect()
    assert len(got) == 1 and got[0]["n_events"] == 2

    _fold_batch(spark, root, state, upd(1, 200, 3), 1)
    # replay of batch 1 after its commit
    _fold_batch(spark, root, state, upd(1, 200, 3), 1)
    got = spark.read.parquet(state["path"]).collect()
    assert len(got) == 1
    assert got[0]["n_events"] == 5
    assert got[0]["s"]["last_ts_us"] == 200


def test_fold_batch_idempotence_survives_missing_success_marker(
        spark, tmp_path):
    """The replay gate is OUR sentinel, not Hadoop's optional _SUCCESS
    (r10 ADVICE #1: with marksuccessfuljobs disabled there is no
    _SUCCESS, and gating on it would re-merge every replay).  Deleting
    _SUCCESS must not re-open the generation; deleting the sentinel
    (a torn write) must make the replay recompute the merge."""
    import os

    from python_vector_db___ai_spark.streaming.ingest import (
        _COMMIT_SENTINEL,
        _fold_batch,
    )

    def upd(user_id, ts_us, n):
        return spark.createDataFrame(
            [(user_id, (ts_us, 1, "click", 1.0, 0.5), n)],
            "user_id long, s struct<last_ts_us:long, last_event_id:long, "
            "last_event_type:string, last_value:double, last_e0:double>, "
            "n_events long")

    root = str(tmp_path)
    state: dict = {"path": None}
    _fold_batch(spark, root, state, upd(1, 100, 2), 0)
    gen0 = state["path"]
    success = os.path.join(gen0, "_SUCCESS")
    if os.path.exists(success):  # prod configs may disable the marker
        os.remove(success)
    _fold_batch(spark, root, state, upd(1, 100, 2), 0)
    got = spark.read.parquet(state["path"]).collect()
    assert len(got) == 1 and got[0]["n_events"] == 2  # NOT 4

    # torn write: batch 1's parquet landed but the process died before
    # the sentinel — the restarted query's state still points at gen0
    # and the replay must recompute the merge exactly once.
    _fold_batch(spark, root, state, upd(1, 200, 3), 1)
    gen1 = state["path"]
    os.remove(os.path.join(gen1, _COMMIT_SENTINEL))
    state = {"path": gen0}
    _fold_batch(spark, root, state, upd(1, 200, 3), 1)
    assert state["path"] == gen1
    assert os.path.exists(os.path.join(gen1, _COMMIT_SENTINEL))
    got = spark.read.parquet(gen1).collect()
    assert len(got) == 1
    assert got[0]["n_events"] == 5
    assert got[0]["s"]["last_ts_us"] == 200
