"""CRUD queries: upsert emulation, anti-join delete, point lookup,
insert tally, collection stats (day_8/day_9 API semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.hashing import md5_hex
from python_vector_db___ai_spark.operators.crud import (
    collection_stats,
    delete_ids,
    get_by_ids,
    insert_tally,
    upsert,
)
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table


def _updates(docs: DataFrame) -> DataFrame:
    """Deterministic update set: rewrite docs < 50, insert 20 new ids."""
    modified = (docs.filter(F.col("doc_id") < 50)
                .withColumn("text", F.concat(F.lit("updated: "), F.col("text"))))
    inserted = (docs.filter(F.col("doc_id") < 20)
                .withColumn("doc_id", F.col("doc_id") + 1000000)
                .withColumn("text", F.concat(F.lit("new: "), F.col("text"))))
    return modified.unionByName(inserted)


_UPDATES_SQL = """
  SELECT doc_id, concat('updated: ', text) AS text, lang, source, n_chars
  FROM documents WHERE doc_id < 50
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, concat('new: ', text) AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id < 20
"""


@register(
    "crud_upsert",
    oracle=f"""
WITH updates AS ({_UPDATES_SQL}),
merged AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY _prio DESC) AS _rn
  FROM (
    SELECT doc_id, text, 0 AS _prio FROM documents
    UNION ALL
    SELECT doc_id, text, 1 AS _prio FROM updates
  )
)
SELECT doc_id, md5(text) AS content_hash,
       (_prio = 1) AS was_upserted
FROM merged WHERE _rn = 1
""",
    doc="S10/J6 upsert as union + per-key row_number (MERGE INTO emulation "
        "on plain parquet; Delta MERGE at scale)",
)
def crud_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    updates = _updates(load_table(spark, sf_dir, "documents")) \
        .select("doc_id", "text")
    merged = upsert(docs.withColumn("_src", F.lit(0)),
                    updates.withColumn("_src", F.lit(1)))
    return merged.select("doc_id", md5_hex(F.col("text")).alias("content_hash"),
                         (F.col("_src") == 1).alias("was_upserted"))


@register(
    "crud_mutation_stats",
    oracle=f"""
WITH remaining AS (
  SELECT * FROM documents WHERE doc_id % 10 <> 0
), del_stats AS (
  SELECT count(*)::BIGINT AS total_documents,
         count(DISTINCT doc_id)::BIGINT AS unique_ids,
         round(avg(length(text)), 6) AS avg_content_length,
         min(length(text))::BIGINT AS min_content_length,
         max(length(text))::BIGINT AS max_content_length
  FROM remaining
), updates AS ({_UPDATES_SQL}),
checked AS (
  SELECT CASE WHEN n_chars < 60 THEN NULL ELSE text END AS text, doc_id
  FROM updates
), ins_stats AS (
  SELECT count(*)::BIGINT AS ins_total,
         sum(CASE WHEN doc_id IS NOT NULL AND text IS NOT NULL
                       AND length(text) > 0 THEN 1 ELSE 0 END)::BIGINT
           AS ins_successful,
         sum(CASE WHEN doc_id IS NULL OR text IS NULL
                      OR length(text) = 0 THEN 1 ELSE 0 END)::BIGINT AS ins_failed
  FROM checked
)
SELECT * FROM del_stats CROSS JOIN ins_stats
""",
    doc="S11/J5 anti-join delete + A1-A3 collection stats, plus the A6 "
        "batch-insert success/fail tally (short docs simulated invalid) "
        "— both 1-row aggregates, one cross-joined check",
)
def crud_mutation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    doomed = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    del_stats = collection_stats(delete_ids(docs, doomed))
    updates = _updates(load_table(spark, sf_dir, "documents"))
    checked = updates.withColumn(
        "text", F.when(F.col("n_chars") < 60, F.lit(None)).otherwise(F.col("text")))
    ins = insert_tally(checked).select(
        F.col("total").alias("ins_total"),
        F.col("successful").alias("ins_successful"),
        F.col("failed").alias("ins_failed"))
    return del_stats.crossJoin(F.broadcast(ins))


@register(
    "crud_point_lookup",
    oracle="""
SELECT doc_id, lang, source, length(text)::BIGINT AS content_length
FROM documents WHERE doc_id IN (3, 17, 42, 99, 123456789)
""",
    doc="P7 point lookup by id list (pushed to the parquet scan)",
)
def crud_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return get_by_ids(docs, [3, 17, 42, 99, 123456789]) \
        .select("doc_id", "lang", "source",
                F.length("text").cast("long").alias("content_length"))
