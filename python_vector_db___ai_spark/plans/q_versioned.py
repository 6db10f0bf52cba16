"""End-to-end CRUD lifecycle query over the versioned table: create ->
upsert -> delete, then return the version history.  The oracle computes
the expected row counts per version relationally from the same inputs."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.plans.q_crud import _updates
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table
from python_vector_db___ai_spark.sources.versioned import VersionedTable


@register(
    "versioned_crud_lifecycle",
    oracle="""
WITH v0 AS (SELECT count(*)::BIGINT AS c FROM documents),
v1 AS (SELECT c + 20 AS c FROM v0),
deleted AS (
  SELECT count(*)::BIGINT AS d FROM (
    SELECT doc_id FROM documents
    UNION ALL
    SELECT doc_id + 1000000 FROM documents WHERE doc_id < 20
  ) WHERE doc_id % 10 = 0
)
SELECT 0::BIGINT AS version, (SELECT c FROM v0) AS n_rows
UNION ALL SELECT 1::BIGINT, (SELECT c FROM v1)
UNION ALL SELECT 2::BIGINT, (SELECT c FROM v1) - (SELECT d FROM deleted)
""",
    doc="S9-S11/J5/J6 full CRUD lifecycle on the versioned table: "
        "create, MERGE-style upsert, anti-join delete, DESCRIBE HISTORY",
)
def versioned_crud_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    table = VersionedTable(spark, tempfile.mkdtemp(prefix="vtab_"))
    table.create(docs)
    table.upsert(_updates(load_table(spark, sf_dir, "documents"))
                 .select("doc_id", "text"))
    doomed = table.read().filter(F.col("doc_id") % 10 == 0).select("doc_id")
    table.delete(doomed)
    return table.history()
