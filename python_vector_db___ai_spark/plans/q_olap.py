"""OLAP-surface queries beyond the reference's own operators: rollup,
JSON extraction, range-frame moving averages, distinct counts — the
aggregation vocabulary a training-data pipeline's reporting layer needs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table


@register(
    "events_rollup",
    oracle="""
SELECT event_type,
       CAST(extract(hour FROM ts) AS INT) AS hour_of_day,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS value_sum
FROM events
GROUP BY ROLLUP(event_type, CAST(extract(hour FROM ts) AS INT))
""",
    doc="ROLLUP aggregation: (type, hour) -> (type) -> grand total in one pass",
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (ev.withColumn("hour_of_day", F.hour("ts").cast("int"))
            .rollup("event_type", "hour_of_day")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("value_sum")))


# NB: JSON payload extraction (get_json_object) merged into
# q_extra2.events_type_stats alongside the exact quantiles — one
# per-type aggregation pass covers both.


@register(
    "events_moving_avg",
    oracle="""
SELECT event_id, user_id,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 6)
         AS value_ma_1h
FROM events
WHERE user_id < 20
""",
    doc="RANGE-frame window: per-user 1-hour trailing moving average",
)
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts").cast("long"))
         .rangeBetween(-3600, 0))
    return ev.select("event_id", "user_id",
                     F.round(F.avg("value").over(w), 6).alias("value_ma_1h"))


# NB: A3 per-lang distinct-count statistics merged into
# q_text.text_profile (lang_n_docs / lang_n_sources /
# lang_n_unique_contents columns) — the freed registry slot holds the
# decontamination query in q_dedup.
