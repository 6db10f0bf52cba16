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
