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


_HIST_WIDTH = 10.0


@register(
    "events_value_histogram",
    oracle=f"""
WITH binned AS (
  SELECT event_type,
         CAST(floor(value / {_HIST_WIDTH}) AS BIGINT) AS bin,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
), totals AS (
  SELECT event_type, sum(n) AS total FROM binned GROUP BY event_type
)
SELECT b.event_type, bin,
       round(bin::DOUBLE * {_HIST_WIDTH}, 6) AS bin_lo,
       round((bin + 1)::DOUBLE * {_HIST_WIDTH}, 6) AS bin_hi,
       n, round(n * 1.0 / total, 6) AS share
FROM binned b JOIN totals t ON t.event_type = b.event_type
""",
    doc="fixed-width value histogram per event type (floor-binning in "
        "one hash agg + broadcast per-type totals) — the distribution "
        "profile a monitoring layer reads; bins are data-independent so "
        "partial aggregation is map-side at any scale",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    binned = (ev.groupBy("event_type",
                         F.floor(F.col("value") / _HIST_WIDTH).cast("long")
                         .alias("bin"))
              .agg(F.count("*").cast("long").alias("n")))
    totals = binned.groupBy("event_type").agg(F.sum("n").alias("total"))
    return (binned.join(F.broadcast(totals), "event_type")
            .select("event_type", "bin",
                    F.round(F.col("bin") * _HIST_WIDTH, 6).alias("bin_lo"),
                    F.round((F.col("bin") + 1) * _HIST_WIDTH, 6)
                    .alias("bin_hi"),
                    "n",
                    F.round(F.col("n") / F.col("total"), 6).alias("share")))


_PSI_WIDTH = 10.0
_PSI_EPS = 1e-6
_PSI_SPLIT = "2024-01-16"


@register(
    "events_value_drift_psi",
    oracle=f"""
WITH tagged AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 'ref' ELSE 'cur' END
           AS half,
         CAST(floor(value / {_PSI_WIDTH}) AS BIGINT) AS bin
  FROM events
), binned AS (
  SELECT event_type, half, bin, count(*)::BIGINT AS n
  FROM tagged GROUP BY 1, 2, 3
), tot AS (
  SELECT event_type, half, sum(n) AS total FROM binned GROUP BY 1, 2
), shares AS (
  SELECT b.event_type, b.bin,
         max(CASE WHEN b.half = 'ref' THEN n * 1.0 / total END) AS p_ref,
         max(CASE WHEN b.half = 'cur' THEN n * 1.0 / total END) AS p_cur
  FROM binned b JOIN tot t ON t.event_type = b.event_type
                          AND t.half = b.half
  GROUP BY 1, 2
), terms AS (
  SELECT event_type,
         (coalesce(p_cur, 0) - coalesce(p_ref, 0))
           * ln((coalesce(p_cur, 0) + {_PSI_EPS})
                / (coalesce(p_ref, 0) + {_PSI_EPS})) AS term
  FROM shares
)
SELECT event_type, round(sum(term), 6) AS psi,
       count(*)::BIGINT AS n_bins
FROM terms GROUP BY event_type
""",
    doc="population-stability-index drift report: value distribution of "
        "each event type, first half-month vs second, fixed-width bins "
        "— two hash aggs and a bounded pivot; the epsilon-smoothed PSI "
        "is the standard drift gate a feature-monitoring layer alarms on",
)
def events_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp"), "ref")
        .otherwise("cur").alias("half"),
        F.floor(F.col("value") / _PSI_WIDTH).cast("long").alias("bin"))
    binned = (tagged.groupBy("event_type", "half", "bin")
              .agg(F.count("*").cast("long").alias("n")))
    tot = binned.groupBy("event_type", "half").agg(F.sum("n").alias("total"))
    shares = (binned.join(F.broadcast(tot), ["event_type", "half"])
              .groupBy("event_type", "bin")
              .agg(F.max(F.when(F.col("half") == "ref",
                                F.col("n") / F.col("total"))).alias("p_ref"),
                   F.max(F.when(F.col("half") == "cur",
                                F.col("n") / F.col("total"))).alias("p_cur")))
    p_ref = F.coalesce("p_ref", F.lit(0.0))
    p_cur = F.coalesce("p_cur", F.lit(0.0))
    term = (p_cur - p_ref) * F.log((p_cur + _PSI_EPS) / (p_ref + _PSI_EPS))
    return (shares.select("event_type", term.alias("term"))
            .groupBy("event_type")
            .agg(F.round(F.sum("term"), 6).alias("psi"),
                 F.count("*").cast("long").alias("n_bins")))
