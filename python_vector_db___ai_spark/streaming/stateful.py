"""Custom stateful streaming operator via ``applyInPandasWithState``.

The Spark-native tool for operators the built-in streaming aggregations
can't express (SURVEY §2.10 notes the reference has no true streaming;
this is the additive scale path for continuous ingest monitoring):
per-user running counters that survive across micro-batches.

State shape: (n_events, value_sum) per user_id.  With
``GroupStateTimeout.NoTimeout`` state lives for the stream's lifetime;
production deployments set a timeout to bound state (the watermark
analog for arbitrary state).
"""

from __future__ import annotations

import tempfile
import uuid
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id long, n_events long, value_sum double"
_STATE_SCHEMA = "n long, s double"


def _update_user_state(key: tuple, pdfs: Iterable[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                       "value_sum": [round(s, 6)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals over a streaming events frame."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user_state,
                outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


_SESS_OUT = ("user_id long, n_sessions long, n_events long, "
             "avg_events_per_session double")
_SESS_STATE = "last_ts long, n_sessions long, n_events long"


def _make_session_updater(gap: int):
    """``gap`` is in the same unit as the incoming ``tsec`` column
    (epoch microseconds in the registered query — full timestamp
    precision, so a gap of 1800.5s correctly exceeds a 30-min bound
    where second-truncated arithmetic would not)."""
    def update(key: tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        last_ts, ns, ne = state.get if state.exists else (-1, 0, 0)
        rows = [p for p in pdfs if not p.empty]
        if rows:
            pdf = (pd.concat(rows, ignore_index=True)
                   .sort_values(["tsec", "event_id"]))
            for t in pdf["tsec"].astype("int64"):
                t = int(t)
                if last_ts < 0 or t - last_ts > gap:
                    ns += 1
                ne += 1
                last_ts = t
        state.update((last_ts, ns, ne))
        # avg left UNROUNDED: the caller rounds with F.round (HALF_UP)
        # so the value matches the batch/oracle rounding, not Python's
        # banker's rounding.
        yield pd.DataFrame({
            "user_id": [key[0]], "n_sessions": [ns], "n_events": [ne],
            "avg_events_per_session": [ne / ns if ns else 0.0]})

    return update


def sessionize_stream(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """Gap-based sessionization as a custom stateful operator — the
    canonical ``applyInPandasWithState`` use: per-user state is
    (last event time, session count, event count); an event more than
    ``gap_min`` after the previous one opens a new session.

    ``events`` must carry ``(user_id, tsec long, event_id)`` with
    ``tsec`` = event time in epoch MICROseconds (``F.unix_micros``,
    JVM-side, so state holds plain longs at full timestamp precision —
    matching the oracle's ``ts - lag(ts) > INTERVAL`` arithmetic even
    when the true gap straddles the boundary by a fraction of a
    second).  Exact whenever each user's events arrive
    event-time-ordered across micro-batches (true for the single-file
    availableNow drain the registered query uses; events within one
    batch are sorted here).  A production deployment adds
    ``GroupStateTimeout.EventTimeTimeout`` + a watermark to close idle
    sessions and bound state.
    """
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_session_updater(gap_min * 60 * 1_000_000),
                outputStructType=_SESS_OUT,
                stateStructType=_SESS_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_stateful_to_completion(stateful_df: DataFrame,
                               query_name: str | None = None) -> DataFrame:
    """Drain with availableNow; returns the LAST update per user (the
    final running totals) as a batch DataFrame."""
    from pyspark.sql import functions as F

    import shutil

    name = query_name or f"st_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_state_")
    try:
        q = (stateful_df.writeStream
             .format("memory")
             .queryName(name)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    spark = stateful_df.sparkSession
    all_updates = spark.table(name)
    # keep the final (max n_events) update per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (all_updates
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))
