"""VersionedTable (Delta-lite) tests: mutations as versions, time
travel, partition-pruned version reads, multi-batch incremental stream."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.plans.explain import formatted_plan
from python_vector_db___ai_spark.sources.versioned import VersionedTable


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "docs_table"))
    base = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], ["doc_id", "text"])
    t.create(base)
    return t


def test_create_and_read_latest(table):
    assert table.latest_version() == 0
    assert table.read().count() == 10


def test_upsert_creates_new_version_and_time_travel(table, spark):
    updates = spark.createDataFrame(
        [(1, "doc 1 v2"), (100, "new doc")], ["doc_id", "text"])
    v = table.upsert(updates)
    assert v == 1
    latest = {r.doc_id: r.text for r in table.read().collect()}
    assert latest[1] == "doc 1 v2" and latest[100] == "new doc"
    assert len(latest) == 11
    # time travel: version 0 is untouched
    v0 = {r.doc_id: r.text for r in table.read(0).collect()}
    assert v0[1] == "doc 1" and 100 not in v0


def test_delete_version(table):
    table.delete([0, 1, 2])
    assert table.read().count() == 7
    assert table.read(0).count() == 10
    hist = {r.version: r.n_rows for r in table.history().collect()}
    assert hist == {0: 10, 1: 7}


def test_version_read_prunes_partitions(table, spark):
    table.delete([0])
    df = table.spark.read.parquet(table.path).filter(F.col("_version") == 1)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    files = {os.path.dirname(r[0]) for r in
             df.select(F.input_file_name()).distinct().collect()}
    assert all("_version=1" in f for f in files)


def test_incremental_stream_multiple_batches(spark, tmp_path):
    # Real incremental semantics: 3 files arriving -> 3 micro-batches
    # with maxFilesPerTrigger=1 through foreachBatch.
    src = tmp_path / "incoming"
    src.mkdir()
    for i in range(3):
        spark.createDataFrame(
            [(i * 10 + j, float(j)) for j in range(5)], ["id", "value"]
        ).coalesce(1).write.parquet(str(src / f"batch_{i}"))

    batches = []

    def handle(df, bid):
        batches.append((int(bid), df.count()))

    schema = "id long, value double"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    q = (stream.writeStream.foreachBatch(handle)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert len(batches) == 3
    assert sum(n for _, n in batches) == 15
