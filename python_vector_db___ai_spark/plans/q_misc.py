"""Streaming, multimodal, sessionization, and classic relational
queries (operator-coverage complements: aggregations, joins, windows,
event-time processing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.multimodal import (
    decode_features,
    to_multimodal,
)
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table
from python_vector_db___ai_spark.streaming.ingest import (
    hourly_event_counts,
    ingest_foreachbatch,
    read_events_stream,
    run_stream_to_completion,
)


@register(
    "events_hourly_stream",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS value_sum
FROM events GROUP BY 1, 2
""",
    doc="§2.10 streaming: tumbling 1h event-time windows drained with "
        "Trigger.availableNow — must equal the batch answer",
)
def events_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    return run_stream_to_completion(hourly_event_counts(stream),
                                    query_name="hourly_events")


def _ingest_oracle() -> str:
    from python_vector_db___ai_spark.operators.embedding import (
        mock_embedding_sql,
    )

    return f"""
WITH ranked AS (
  SELECT user_id, epoch_us(ts) AS last_ts_us,
         event_id AS last_event_id, event_type AS last_event_type,
         round(value, 6) AS last_value,
         round(({mock_embedding_sql('props')})[1], 6) AS last_e0,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), counts AS (
  SELECT user_id, count(*)::BIGINT AS n_events
  FROM events GROUP BY user_id
)
SELECT r.user_id, r.last_ts_us, r.last_event_id, r.last_event_type,
       r.last_value, r.last_e0, c.n_events
FROM ranked r JOIN counts c USING (user_id)
WHERE rn = 1
"""


@register(
    "stream_ingest_foreachbatch",
    oracle=_ingest_oracle(),
    doc="S9/S10 streaming ingest via foreachBatch: each micro-batch is "
        "mock-embedded and MERGED into a standing per-user table "
        "(last write wins on (ts, event_id), cumulative counts) — the "
        "returned FINAL table state is batching-invariant (associative "
        "merge), so a DuckDB window/groupBy replay of the MERGE over "
        "the raw events hash-matches it (r8 directive #2c; upgraded "
        "from the rows-only per-batch tally)",
)
def stream_ingest_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ingest_foreachbatch(spark, sf_dir)


@register(
    "stream_stateful_user_totals",
    oracle="""
SELECT user_id, count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS value_sum
FROM events GROUP BY user_id
""",
    doc="custom stateful streaming operator (applyInPandasWithState): "
        "per-user running totals, final state must equal the batch agg",
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.streaming.stateful import (
        run_stateful_to_completion,
        running_user_totals,
    )
    from python_vector_db___ai_spark.streaming.ingest import read_events_stream

    return run_stateful_to_completion(
        running_user_totals(read_events_stream(spark, sf_dir)))


@register(
    "stream_sessionization",
    oracle=f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL THEN 1
              WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS new_session
  FROM events
)
SELECT user_id,
       sum(new_session)::BIGINT AS n_sessions,
       count(*)::BIGINT AS n_events,
       round(count(*) * 1.0 / sum(new_session), 6) AS avg_events_per_session
FROM marked GROUP BY user_id
""",
    doc="§2.10 custom stateful operator #2: gap-based sessionization "
        "under the micro-batch planner (applyInPandasWithState; "
        "per-user (last_ts, sessions, events) state) — the streaming "
        "twin of events_sessionization, hash-checked against the same "
        "batch-SQL oracle",
)
def stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.streaming.stateful import (
        run_stateful_to_completion,
        sessionize_stream,
    )

    ev = (read_events_stream(spark, sf_dir)
          .select("user_id", F.unix_micros("ts").alias("tsec"),
                  "event_id"))
    final = run_stateful_to_completion(sessionize_stream(ev, gap_min=30))
    return final.select(
        "user_id", "n_sessions", "n_events",
        F.round("avg_events_per_session", 6).alias("avg_events_per_session"))


def _md5_byte(expr: str, i: int) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), {2 * i + 1}, 2)) AS INT)"


@register(
    "multimodal_decode_stats",
    oracle=f"""
WITH mm AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         text,
         octet_length(encode(text)) AS nb
  FROM documents
)
SELECT doc_id, modality,
       nb::BIGINT AS n_bytes,
       (16 + {_md5_byte('text', 0)} % 240)::BIGINT AS width,
       (16 + {_md5_byte('text', 1)} % 240)::BIGINT AS height,
       round({_md5_byte('text', 2)} / 255.0, 6) AS f0,
       round({_md5_byte('text', 3)} / 255.0, 6) AS f1,
       round({_md5_byte('text', 4)} / 255.0, 6) AS f2,
       round({_md5_byte('text', 5)} / 255.0, 6) AS f3,
       count(*) OVER (PARTITION BY modality)::BIGINT AS modality_items,
       round(avg(nb) OVER (PARTITION BY modality), 6) AS modality_avg_bytes,
       min(nb) OVER (PARTITION BY modality)::BIGINT AS modality_min_bytes,
       max(nb) OVER (PARTITION BY modality)::BIGINT AS modality_max_bytes
FROM mm
""",
    doc="multimodal decode/feature-extract via mapInPandas (md5-seeded "
        "stub kernels, real Arrow batch plumbing; features emitted as "
        "scalar f0..f3 so driver-side canonicalization can sort rows) + "
        "the per-modality payload statistics pass, windowed onto each "
        "row — one check covers decode and stats",
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = decode_features(to_multimodal(docs))
    w = Window.partitionBy("modality")
    return feats.select(
        "doc_id", "modality", "n_bytes",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        *[F.round(F.col("features")[i], 6).alias(f"f{i}") for i in range(4)],
        F.count("*").over(w).cast("long").alias("modality_items"),
        F.round(F.avg("n_bytes").over(w), 6).alias("modality_avg_bytes"),
        F.min("n_bytes").over(w).cast("long").alias("modality_min_bytes"),
        F.max("n_bytes").over(w).cast("long").alias("modality_max_bytes"))


@register(
    "tpch_q1_pricing",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="classic pricing-summary aggregation (filter pushdown + partial agg)",
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 # sums of ~1e9 magnitude: 6-decimal rounding exceeds
                 # double precision and breaks under partial-sum
                 # reordering — 2 decimals is the stable choice
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").cast("long").alias("count_order")))


@register(
    "tpch_q3_topk",
    oracle="""
SELECT l.l_orderkey AS orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
       o.o_orderdate AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
""",
    doc="three-way join + agg + top-k (broadcast dims, shuffle on orderkey)",
)
def tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    return (li.filter(F.col("l_shipdate") > cutoff)
            .join(orders.filter(F.col("o_orderdate") < cutoff),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy(F.col("l_orderkey").alias("orderkey"),
                     F.col("o_orderdate").alias("orderdate"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 6).alias("revenue"))
            .select("orderkey", "revenue", "orderdate")
            .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
            .limit(10))


_GAP_MIN = 30


@register(
    "events_sessionization",
    oracle=f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL THEN 1
              WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {_GAP_MIN} MINUTE THEN 1
              ELSE 0 END AS new_session
  FROM events
)
SELECT user_id,
       sum(new_session)::BIGINT AS n_sessions,
       count(*)::BIGINT AS n_events,
       round(count(*) * 1.0 / sum(new_session), 6) AS avg_events_per_session
FROM marked GROUP BY user_id
""",
    doc="gap-based sessionization: lag + cumulative flags (lead/lag window "
        "coverage; session_window at streaming scale)",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
              > _GAP_MIN * 60 * 1_000_000, 1)
        .otherwise(0))
    return (marked.groupBy("user_id")
            .agg(F.sum("new_session").cast("long").alias("n_sessions"),
                 F.count("*").cast("long").alias("n_events"),
                 F.round(F.count("*") / F.sum("new_session"), 6)
                 .alias("avg_events_per_session")))


@register(
    "events_asof_attribution",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, min(event_id)::BIGINT AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, round(p.value, 6) AS value,
       c.click_event_id,
       round(epoch_us(p.ts - c.ts) / 1000000.0, 6) AS gap_sec
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    doc="backward as-of join (operators/asof.py): every purchase "
        "attributed to the user's most recent prior-or-equal click — "
        "the temporal join Spark SQL lacks natively, expressed as the "
        "union-and-carry pattern (ONE shuffle on the key, a per-key "
        "sort, last(ignorenulls) carry — linear, no inequality "
        "theta-join); oracle is DuckDB's native ASOF JOIN.  The right "
        "side is deduped to one row per (user, ts) with min(event_id) "
        "in both engines, since an as-of match under ties is "
        "ill-defined.",
)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts", "value"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.min("event_id").cast("long").alias("click_event_id")))
    joined = asof_join(purchases, clicks, on="user_id",
                       left_ts="ts", right_ts="ts",
                       right_cols=["click_event_id"])
    return joined.select(
        "event_id", "user_id",
        F.round("value", 6).alias("value"),
        F.col("asof_click_event_id").alias("click_event_id"),
        F.round((F.unix_micros("ts") - F.unix_micros(F.col("asof_ts")))
                / 1_000_000.0, 6).alias("gap_sec"))


_RANGE_MIN = 5


@register(
    "events_range_join_counts",
    oracle=f"""
SELECT e.event_id, e.user_id,
       (SELECT count(*) FROM events c
        WHERE c.event_type = 'click' AND c.user_id = e.user_id
          AND c.ts >= e.ts - INTERVAL {_RANGE_MIN} MINUTE
          AND c.ts < e.ts)::BIGINT AS n_recent_clicks
FROM events e WHERE e.event_type = 'error'
""",
    doc="bin-blocked range join: per error event, how many clicks the "
        "same user made in the preceding 5 minutes.  The naive form is "
        "an inequality theta-join; the Spark-native shape buckets both "
        "sides into window-width time bins and equi-joins on "
        "(user, bin) with each click exploded into the 2 bins it can "
        "serve — bounded fan-out, one shuffle, then an exact range "
        "filter.  Oracle is the correlated-subquery formulation.",
)
def events_range_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_us = _RANGE_MIN * 60 * 1_000_000
    err = (ev.filter(F.col("event_type") == "error")
           .select("event_id", "user_id",
                   F.unix_micros("ts").alias("tus"))
           .withColumn("bin", F.floor(F.col("tus") / w_us)))
    clk = (ev.filter(F.col("event_type") == "click")
           .select("user_id", F.unix_micros("ts").alias("cus"))
           .withColumn("cbin", F.floor(F.col("cus") / w_us)))
    clk_b = clk.select(
        "user_id", "cus",
        F.explode(F.array(F.col("cbin"), F.col("cbin") + 1)).alias("bin"))
    hit = ((F.col("cus") >= F.col("tus") - w_us)
           & (F.col("cus") < F.col("tus")))
    return (err.join(clk_b, ["user_id", "bin"], "left")
            .groupBy("event_id", "user_id")
            .agg(F.sum(F.when(hit, 1).otherwise(0)).cast("long")
                 .alias("n_recent_clicks")))


@register(
    "events_value_percentiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type
""",
    doc="per-type exact value percentiles (p50/p90/p99, linear "
        "interpolation in both engines).  At 100 TB the drop-in scale "
        "path is approx_percentile (t-digest, mergeable partial aggs) "
        "at a stated error bound; the exact form is the oracle-checkable "
        "contract.",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9),
                                        F.lit(0.99)))
    return (ev.groupBy("event_type")
            .agg(F.round(pct[0], 6).alias("p50"),
                 F.round(pct[1], 6).alias("p90"),
                 F.round(pct[2], 6).alias("p99"),
                 F.round(F.min("value"), 6).alias("min_value"),
                 F.round(F.max("value"), 6).alias("max_value"),
                 F.count("*").cast("long").alias("n")))


_ATTR_LOOKBACK = "2 hours"


@register(
    "stream_attribution_join",
    oracle=f"""
SELECT p.event_id AS conv_id, c.event_id AS trigger_id, p.user_id,
       round((epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0, 6)
         AS secs_before
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 2 HOUR
""",
    doc="§2.10 stream-stream interval self-join: purchases joined to "
        "the same user's clicks in the trailing 2h, drained with "
        "availableNow in append mode — watermarks bound the join state; "
        "must equal the batch interval join",
)
def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.streaming.ingest import (
        run_stream_to_completion,
        stream_stream_attribution_join,
    )

    joined = stream_stream_attribution_join(
        spark, sf_dir, lookback=_ATTR_LOOKBACK)
    out = joined.select("conv_id", "trigger_id", "user_id",
                        F.round("secs_before", 6).alias("secs_before"))
    return run_stream_to_completion(out, query_name="attribution_join",
                                    output_mode="append")
