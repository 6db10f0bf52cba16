"""applyInPandasWithState + salted aggregation tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.crud import salted_agg
from python_vector_db___ai_spark.session import load_table
from python_vector_db___ai_spark.streaming.ingest import read_events_stream
from python_vector_db___ai_spark.streaming.stateful import (
    run_stateful_to_completion,
    running_user_totals,
)
from tests.conftest import SF_DIR


def test_stateful_totals_match_batch(spark):
    stateful = run_stateful_to_completion(
        running_user_totals(read_events_stream(spark, SF_DIR)),
        query_name="t_state")
    batch = (load_table(spark, SF_DIR, "events")
             .groupBy("user_id")
             .agg(F.count("*").cast("long").alias("n_events"),
                  F.round(F.sum("value"), 6).alias("value_sum")))
    got = {r.user_id: (r.n_events, r.value_sum) for r in stateful.collect()}
    want = {r.user_id: (r.n_events, r.value_sum) for r in batch.collect()}
    assert got == want


def test_salted_agg_matches_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    salted = salted_agg(ev, "event_type",
                        {"value": "sum", "event_id": "count"}, n_salts=8)
    plain = (ev.groupBy("event_type")
             .agg(F.sum("value").alias("sum_value"),
                  F.count("event_id").cast("long").alias("count_event_id")))
    got = {r.event_type: (round(r.sum_value, 6), r.count_event_id)
           for r in salted.collect()}
    want = {r.event_type: (round(r.sum_value, 6), r.count_event_id)
            for r in plain.collect()}
    assert got == want


def test_salted_agg_rejects_non_decomposable(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError):
        salted_agg(ev, "event_type", {"value": "median"})


def test_stream_sessionization_matches_batch(spark):
    """The stateful sessionizer drained with availableNow must equal
    the batch lag-window sessionization."""
    from pyspark.sql import Window

    from python_vector_db___ai_spark.streaming.stateful import (
        sessionize_stream,
    )

    ev = (read_events_stream(spark, SF_DIR)
          .select("user_id", F.unix_micros("ts").alias("tsec"),
                  "event_id"))
    final = run_stateful_to_completion(sessionize_stream(ev, gap_min=30),
                                       query_name="t_sess")
    got = {r.user_id: (r.n_sessions, r.n_events,
                       round(r.avg_events_per_session, 6))
           for r in final.collect()}

    batch = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = batch.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
              > 30 * 60 * 1_000_000, 1).otherwise(0))
    want = {r.user_id: (r.n_sessions, r.n_events, r.avg)
            for r in (marked.groupBy("user_id")
                      .agg(F.sum("new_session").cast("long")
                           .alias("n_sessions"),
                           F.count("*").cast("long").alias("n_events"),
                           F.round(F.count("*") / F.sum("new_session"), 6)
                           .alias("avg"))).collect()}
    assert got == want


def test_session_updater_across_batches():
    """The raw updater must carry state across micro-batches: a gap
    inside batch 2 opens a session, continuity across the batch
    boundary does not."""
    import pandas as pd

    from python_vector_db___ai_spark.streaming.stateful import (
        _make_session_updater,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    upd = _make_session_updater(gap=1800)
    st = FakeState()
    b1 = pd.DataFrame({"tsec": [1000, 2000], "event_id": [1, 2]})
    out1 = list(upd((7,), [b1], st))[0]
    assert (out1.n_sessions[0], out1.n_events[0]) == (1, 2)
    # batch 2: first event within gap of batch 1's last (2000+1800),
    # second far beyond -> exactly one new session
    b2 = pd.DataFrame({"tsec": [3000, 99000], "event_id": [3, 4]})
    out2 = list(upd((7,), [b2], st))[0]
    assert (out2.n_sessions[0], out2.n_events[0]) == (2, 4)
    assert st._v == (99000, 2, 4)
