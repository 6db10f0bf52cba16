"""Remaining reference-parity queries: day-6 perturbed query
generation, day-3 dummy predictors."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.hashing import stable_hash_sql, stable_hash64
from python_vector_db___ai_spark.operators.search import knn_join_blas
from python_vector_db___ai_spark.plans.q_vector import _cos_sql
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table

_NQ = 10
_NOISE = 0.1
_DIM = 64
_K = 10


def _noise_sql(qid: str, i: str) -> str:
    h = stable_hash_sql(f"concat({qid}, ':', {i})")
    return f"(({h} % 2000) / 1000.0 - 1.0) * {_NOISE}"


@register(
    "knn_perturbed_queries",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(range(1, {_DIM} + 1),
                        i -> embedding[i]::DOUBLE + {_noise_sql('vec_id', 'i')})
           AS qv
  FROM embeddings WHERE vec_id < {_NQ}
), scored AS (
  SELECT q.query_id, c.vec_id,
         round({_cos_sql('qv', 'cv')}, 6) AS score
  FROM q CROSS JOIN
       (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings) c
), ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {_K}
""",
    doc="day-6 query generation parity: queries are corpus vectors "
        "perturbed by deterministic noise (day_6/day6_complete.py:54-63), "
        "then exact kNN — the perturbed source should surface near rank 1",
)
def knn_perturbed_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def noise(i):
        return ((stable_hash64(
            F.concat(F.col("vec_id").cast("string"), F.lit(":"),
                     i.cast("string"))) % 2000) / F.lit(1000.0) - 1.0) * _NOISE

    perturbed = (emb.filter(F.col("vec_id") < _NQ)
                 .select(F.col("vec_id").alias("query_id"),
                         F.transform(
                             F.sequence(F.lit(1), F.lit(_DIM)),
                             lambda i: F.element_at(
                                 F.col("embedding"), i).cast("double")
                             + noise(i)).alias("query_vec")))
    return knn_join_blas(perturbed, emb, k=_K, metric="cosine",
                         corpus_id="vec_id")


@register(
    "dummy_models",
    oracle="""
WITH reg_model AS (
  SELECT avg(value) AS mean_pred FROM events        -- DummyRegressor(mean)
), reg AS (
  SELECT 'regress' AS task, e.event_type,
         count(*)::BIGINT AS n,
         round(any_value(m.mean_pred), 6) AS predicted_num,
         CAST(NULL AS VARCHAR) AS predicted_cat,
         round(avg(abs(e.value - m.mean_pred)), 6) AS err
  FROM events e CROSS JOIN reg_model m
  GROUP BY e.event_type
), cls_model AS (
  SELECT event_type AS majority FROM events        -- DummyClassifier(mode)
  GROUP BY event_type ORDER BY count(*) DESC, event_type ASC LIMIT 1
), cls AS (
  SELECT 'classify' AS task, e.event_type,
         count(*)::BIGINT AS n,
         CAST(NULL AS DOUBLE) AS predicted_num,
         any_value(m.majority) AS predicted_cat,
         CAST(e.event_type = any_value(m.majority) AS INT)::DOUBLE AS err
  FROM events e CROSS JOIN cls_model m
  GROUP BY e.event_type
)
SELECT * FROM reg UNION ALL SELECT * FROM cls
""",
    doc="day-3 parity: sklearn DummyRegressor(strategy=mean) with MAE and "
        "DummyClassifier(strategy=most_frequent) — both are a global "
        "aggregate broadcast back over the table, unioned into one check",
)
def dummy_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    reg_model = ev.agg(F.avg("value").alias("mean_pred"))
    reg = (ev.crossJoin(F.broadcast(reg_model))
           .groupBy("event_type")
           .agg(F.count("*").cast("long").alias("n"),
                F.round(F.first("mean_pred"), 6).alias("predicted_num"),
                F.round(F.avg(F.abs(F.col("value") - F.col("mean_pred"))), 6)
                .alias("err"))
           .select(F.lit("regress").alias("task"), "event_type", "n",
                   "predicted_num",
                   F.lit(None).cast("string").alias("predicted_cat"), "err"))
    majority = (ev.groupBy("event_type").count()
                .orderBy(F.col("count").desc(), F.col("event_type").asc())
                .limit(1)
                .select(F.col("event_type").alias("majority")))
    cls = (ev.crossJoin(F.broadcast(majority))
           .groupBy("event_type")
           .agg(F.count("*").cast("long").alias("n"),
                F.first("majority").alias("predicted_cat"))
           .select(F.lit("classify").alias("task"), "event_type", "n",
                   F.lit(None).cast("double").alias("predicted_num"),
                   "predicted_cat",
                   (F.col("event_type") == F.col("predicted_cat"))
                   .cast("int").cast("double").alias("err")))
    return reg.unionByName(cls)
