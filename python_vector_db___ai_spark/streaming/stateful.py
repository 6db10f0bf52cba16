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
