"""Remaining reference-parity queries: day-3 dummy predictors.
(The day-6 perturbed-query parity lives as the cosine_perturbed
branch of knn_exact_batch in q_vector.py.)"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table


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
