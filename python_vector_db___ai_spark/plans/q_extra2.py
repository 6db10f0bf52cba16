"""Additional checked coverage: exact quantiles, edit-distance near-dup,
and the hybrid chunker's two-branch oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.chunking import chunk_hybrid
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table


@register(
    "events_type_stats",
    oracle="""
SELECT event_type,
       count(*)::BIGINT AS n_events,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS max_k
FROM events GROUP BY event_type
""",
    doc="per-type stats: exact interpolated quantiles (percentile_approx "
        "swaps in at 100 TB) + P4-style JSON payload extraction "
        "(get_json_object) — one aggregation pass, one check",
)
def events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.withColumn("k", k)
            .groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
                 F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
                 F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
                 F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
                 F.round(F.avg("k"), 6).alias("avg_k"),
                 F.min("k").cast("long").alias("min_k"),
                 F.max("k").cast("long").alias("max_k")))


_LEV_DOCS = 80
_LEV_PREFIX = 40
_LEV_TOPK = 20


@register(
    "dedup_levenshtein",
    oracle=f"""
WITH d AS (
  SELECT doc_id, substr(text, 1, {_LEV_PREFIX}) AS prefix
  FROM documents WHERE doc_id < {_LEV_DOCS}
)
SELECT a.doc_id AS i, b.doc_id AS j,
       levenshtein(a.prefix, b.prefix)::BIGINT AS edit_distance
FROM d a JOIN d b ON a.doc_id < b.doc_id
ORDER BY edit_distance ASC, i ASC, j ASC
LIMIT {_LEV_TOPK}
""",
    doc="edit-distance near-dup on content prefixes (levenshtein is "
        "JVM-built-in; prefix cap bounds the O(len^2) kernel)",
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _LEV_DOCS)
            .select("doc_id",
                    F.substring("text", 1, _LEV_PREFIX).alias("prefix")))
    a = docs.select(F.col("doc_id").alias("i"), F.col("prefix").alias("pa"))
    b = docs.select(F.col("doc_id").alias("j"), F.col("prefix").alias("pb"))
    return (a.join(b, F.col("i") < F.col("j"))
            .select("i", "j",
                    F.levenshtein("pa", "pb").cast("long")
                    .alias("edit_distance"))
            .orderBy(F.col("edit_distance").asc(), F.col("i").asc(),
                     F.col("j").asc())
            .limit(_LEV_TOPK))


# Hybrid chunker oracle: replicate the dispatch (code/table -> paragraph
# branch, else sentence branch) and both branch chunkers in SQL.
_HYBRID_ORACLE = """
WITH typed AS (
  SELECT doc_id, text,
         CASE WHEN contains(text, '```')
                   OR regexp_matches(text, '(?m)^(def |class |import |from \\w+ import)')
              THEN 'code'
              WHEN regexp_matches(text, '(?m)^\\|.*\\|') THEN 'table'
              ELSE 'other' END AS ct
  FROM documents
), para_src AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '\\n\\n+'),
                                    x -> trim(x)),
                     x -> length(x) >= 1) AS paras
  FROM typed WHERE ct IN ('code', 'table')
), para_n AS (
  SELECT doc_id, paras,
         CAST(ceil(len(paras) * 1.0 / 3) AS INT) AS n_chunks
  FROM para_src WHERE len(paras) > 0
), para_chunks AS (
  SELECT doc_id, unnest(range(0, n_chunks))::BIGINT AS chunk_id, paras
  FROM para_n
), para_out AS (
  SELECT doc_id, chunk_id,
         array_to_string(paras[chunk_id * 3 + 1 : chunk_id * 3 + 3],
                         chr(10) || chr(10)) AS chunk_text,
         'paragraph' AS strategy
  FROM para_chunks
), sent_src AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '[.!?]\\s+'),
                                    x -> trim(x)),
                     x -> length(x) >= 10) AS sents
  FROM typed WHERE ct NOT IN ('code', 'table')
), sent_n AS (
  SELECT doc_id, sents,
         CASE WHEN len(sents) <= 5 THEN 1
              ELSE CAST(ceil((len(sents) - 5) * 1.0 / 4) AS INT) + 1
         END AS n_chunks
  FROM sent_src WHERE len(sents) > 0
), sent_chunks AS (
  SELECT doc_id, unnest(range(0, n_chunks))::BIGINT AS chunk_id, sents
  FROM sent_n
), sent_out AS (
  SELECT doc_id, chunk_id,
         array_to_string(sents[chunk_id * 4 + 1 : chunk_id * 4 + 5], ' ')
           AS chunk_text,
         'sentence' AS strategy
  FROM sent_chunks
)
SELECT * FROM para_out UNION ALL SELECT * FROM sent_out
"""


@register(
    "chunk_hybrid_checked",
    oracle=_HYBRID_ORACLE,
    doc="F8/F15 hybrid dispatch with a full two-branch SQL oracle",
)
def chunk_hybrid_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_hybrid(docs)
