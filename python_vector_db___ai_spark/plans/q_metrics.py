"""Retrieval-quality evaluation queries (SURVEY §2.6, day_13).

Ground truth is label-based: for query vector ``q`` (the first 20 corpus
vectors), every other vector sharing ``q``'s cluster label is relevant —
the relational form of ``Query.relevant_doc_ids``
(day_13/src/main.py:43-57).  Retrieval is exact kNN with the source
vector excluded (P8), so recall measures cluster coherence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.metrics import (
    mean_metrics,
    ranking_metrics,
)
from python_vector_db___ai_spark.operators.search import knn_join_blas
from python_vector_db___ai_spark.plans.q_vector import N_QUERIES, _cos_sql
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table

K = 10

# Shared oracle CTE chain: ranked results + relevance flags + per-query
# aggregates, mirroring operators/metrics.py step for step.
_PERQ_CTE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cv, label FROM embeddings
), ranked AS (
  SELECT query_id, qlabel, vec_id, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round({_cos_sql('qv', 'cv')}, 6) DESC,
                                     vec_id ASC) AS rank
  FROM q CROSS JOIN c
  WHERE c.vec_id <> q.query_id
), res AS (
  SELECT query_id, rank,
         CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
         sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
           OVER (PARTITION BY query_id ORDER BY rank
                 ROWS UNBOUNDED PRECEDING) AS cum_rel
  FROM ranked WHERE rank <= {K}
), nrel AS (
  SELECT q.query_id, count(*)::BIGINT AS n_relevant
  FROM q JOIN c ON c.label = q.qlabel AND c.vec_id <> q.query_id
  GROUP BY q.query_id
), perq_raw AS (
  SELECT r.query_id, n.n_relevant,
         sum(rel)::BIGINT AS rel_at_k,
         count(*)::BIGINT AS n_at_k,
         coalesce(sum(CASE WHEN rel = 1 THEN cum_rel * 1.0 / rank END), 0.0) AS ap_num,
         coalesce(max(CASE WHEN rel = 1 THEN 1.0 / rank END), 0.0) AS rr,
         coalesce(sum(CASE WHEN rel = 1 THEN 1.0 / log2(rank + 1) END), 0.0) AS dcg,
         CAST(max(rel) AS DOUBLE) AS hit
  FROM res r JOIN nrel n USING (query_id)
  GROUP BY r.query_id, n.n_relevant
), perq AS (
  SELECT query_id, n_relevant,
         round(rel_at_k / {K}.0, 6) AS precision_at_k,
         round(CASE WHEN n_relevant > 0 THEN rel_at_k * 1.0 / n_relevant
                    ELSE 0.0 END, 6) AS recall_at_k,
         round(CASE WHEN rel_at_k / {K}.0
                         + CASE WHEN n_relevant > 0
                                THEN rel_at_k * 1.0 / n_relevant ELSE 0.0 END > 0
               THEN 2 * (rel_at_k / {K}.0)
                      * (rel_at_k * 1.0 / n_relevant)
                      / (rel_at_k / {K}.0 + rel_at_k * 1.0 / n_relevant)
               ELSE 0.0 END, 6) AS f1_at_k,
         round(CASE WHEN n_relevant > 0 THEN ap_num / n_relevant
                    ELSE 0.0 END, 6) AS avg_precision,
         round(rr, 6) AS reciprocal_rank,
         round(CASE WHEN list_sum(list_transform(
                        range(1, least(n_relevant, {K}) + 1),
                        i -> 1.0 / log2(i + 1))) > 0
               THEN dcg / list_sum(list_transform(
                        range(1, least(n_relevant, {K}) + 1),
                        i -> 1.0 / log2(i + 1)))
               ELSE 0.0 END, 6) AS ndcg_at_k,
         round(hit, 6) AS hit_rate_at_k
  FROM perq_raw
)
"""


def _results_and_truth(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec"),
                       F.col("label").alias("qlabel")))
    results = knn_join_blas(queries.select("query_id", "query_vec"), emb, k=K,
                            metric="cosine", corpus_id="vec_id",
                            exclude_self=True)
    truth = (queries.select("query_id", "qlabel")
             .join(emb.select(F.col("vec_id"), F.col("label")),
                   F.col("label") == F.col("qlabel"))
             .filter(F.col("vec_id") != F.col("query_id"))
             .select("query_id", F.col("vec_id").alias("doc_id")))
    return results.withColumnRenamed("vec_id", "doc_id"), truth


@register(
    "ir_metrics_per_query",
    oracle=_PERQ_CTE + "SELECT * FROM perq",
    doc="W1-W6 per-query P/R/F1/AP/RR/NDCG/hit-rate@10 (day_13/src/main.py:126-208)",
)
def ir_metrics_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    results, truth = _results_and_truth(spark, sf_dir)
    return ranking_metrics(results, truth, k=K)


@register(
    "ir_metrics_mean",
    oracle=_PERQ_CTE + f"""
SELECT count(*)::BIGINT AS n_queries,
       round(avg(precision_at_k), 6) AS mean_precision_at_k,
       round(avg(recall_at_k), 6) AS mean_recall_at_k,
       round(avg(f1_at_k), 6) AS mean_f1_at_k,
       round(avg(avg_precision), 6) AS mean_avg_precision,
       round(avg(reciprocal_rank), 6) AS mean_reciprocal_rank,
       round(avg(ndcg_at_k), 6) AS mean_ndcg_at_k,
       round(avg(hit_rate_at_k), 6) AS mean_hit_rate_at_k
FROM perq
""",
    doc="A7 mean metrics across queries (day_13/src/main.py:210-237)",
)
def ir_metrics_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    results, truth = _results_and_truth(spark, sf_dir)
    return mean_metrics(ranking_metrics(results, truth, k=K))
