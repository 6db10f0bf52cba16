"""Watermark semantics of the streaming ingest path (SURVEY §2.10):
late events behind the watermark are dropped, finalized windows are
emitted exactly once across restarts, and state is bounded.

Driven end-to-end through the micro-batch engine: a file-source stream
drained with availableNow into an append-mode parquet sink, restarted
from its checkpoint with a late file — the production restart shape.
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.streaming.ingest import hourly_event_counts

SCHEMA = "ts timestamp, event_type string, value double"


def _h(hour: int, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute)


def _write_file(spark, base: str, src: str, rows, name: str) -> None:
    df = spark.createDataFrame(rows, SCHEMA)
    tmp = os.path.join(base, "stage_" + name)
    df.coalesce(1).write.parquet(tmp)
    os.rename(glob.glob(tmp + "/part-*.parquet")[0],
              os.path.join(src, name + ".parquet"))


def _drain(spark, src: str, out: str, ckpt: str):
    stream = (spark.readStream.schema(SCHEMA).format("parquet").load(src))
    agg = hourly_event_counts(stream, watermark="1 hour")
    q = (agg.writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return sorted((r.window_start.hour, r.event_type, r.n_events,
                   r.value_sum)
                  for r in spark.read.parquet(out).collect())


def test_late_rows_behind_watermark_are_dropped(spark, tmp_path):
    base = str(tmp_path)
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    _write_file(spark, base, src,
                [(_h(0, 10), "click", 1.0), (_h(0, 40), "click", 1.0),
                 (_h(1, 10), "click", 1.0), (_h(2, 10), "click", 1.0),
                 (_h(3, 30), "click", 1.0)], "f1")
    run1 = _drain(spark, src, out, ckpt)
    # watermark = max(ts) - 1h = 2:30 -> windows h0, h1 finalized
    assert run1 == [(0, "click", 2, 2.0), (1, "click", 1, 1.0)]

    # A late row an hour behind the checkpointed watermark plus fresh
    # rows that advance it past windows h2/h3.
    _write_file(spark, base, src,
                [(_h(0, 30), "click", 100.0),     # LATE: must be dropped
                 (_h(5, 30), "click", 1.0)], "f2")
    run2 = _drain(spark, src, out, ckpt)
    # h0 is emitted exactly once and still counts 2 — the late row
    # (value 100) never reached the finalized window; h2/h3 newly final.
    assert run2 == [(0, "click", 2, 2.0), (1, "click", 1, 1.0),
                    (2, "click", 1, 1.0), (3, "click", 1, 1.0)]


def test_stream_restart_emits_each_window_once(spark, tmp_path):
    base = str(tmp_path)
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    _write_file(spark, base, src,
                [(_h(0, 5), "a", 1.0), (_h(2, 5), "a", 1.0)], "f1")
    _drain(spark, src, out, ckpt)
    _write_file(spark, base, src, [(_h(4, 5), "a", 1.0)], "f2")
    got = _drain(spark, src, out, ckpt)
    starts = [(h, et) for h, et, _, _ in got]
    assert len(starts) == len(set(starts)), got     # no duplicate windows
