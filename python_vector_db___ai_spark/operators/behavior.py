"""Behavioral event analytics: sequential funnels, cohort retention,
and event-transition matrices.

These extend the engine past the reference's own surface (the reference
stores query logs, day_8/monitoring.py, but never analyzes sequences)
into the event-analytics vocabulary every product/training-data
pipeline needs on its telemetry tables.

Scale notes (100 TB):
* every stage here shuffles on ``user_id`` exactly once and reuses that
  partitioning across the chained aggregations — the funnel's N steps
  are N hash-aggregations co-partitioned by user, not N sorts;
* the final reports aggregate to tiny frames (steps × 1, cohorts ×
  offsets, types × types), so the driver only ever sees bounded output;
* per-user event counts bound window state in the transition matrix —
  the lag() window is per-user and streams within each partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(events: DataFrame, steps: Sequence[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Strict sequential funnel: a user reaches step k only with an
    event of type ``steps[k]`` strictly after their step-(k-1) time,
    taking the earliest qualifying timestamp at every step.

    One repartition on ``user_col``; each step is a co-partitioned
    aggregate + join on the same key, so AQE plans N-1 shuffle-free
    joins after the first exchange.  The per-step user sets union into
    ONE job (no driver-side counting loop).  Returns one row per step:
    (step_order, step, n_users, conv_from_prev, conv_from_first).
    """
    ev = events.select(user_col, ts_col, type_col) \
               .repartition(user_col)
    # reached[k]: per-user earliest qualifying ts for step k
    reached = (ev.filter(F.col(type_col) == steps[0])
               .groupBy(user_col)
               .agg(F.min(ts_col).alias("t0")))
    per_step = [reached]
    for k, step in enumerate(steps[1:], start=1):
        prev = per_step[-1]
        nxt = (ev.filter(F.col(type_col) == step)
               .join(prev.select(user_col, F.col(f"t{k-1}")), user_col)
               .filter(F.col(ts_col) > F.col(f"t{k-1}"))
               .groupBy(user_col)
               .agg(F.min(ts_col).alias(f"t{k}")))
        # carry all previous step times forward for the next filter
        per_step.append(prev.join(nxt, user_col).select(
            user_col, *[f"t{i}" for i in range(k + 1)]))
    counts = None
    for k, (step, df) in enumerate(zip(steps, per_step)):
        # global agg yields one row even for an empty step frame, so
        # zero-conversion steps still appear in the report
        t = df.agg(F.count("*").cast("long").alias("n_users")) \
              .select(F.lit(k).alias("step_order"),
                      F.lit(step).alias("step"), "n_users")
        counts = t if counts is None else counts.unionByName(t)
    # 4-row report frame: the unpartitioned lag window is fine here
    w = Window.orderBy("step_order")
    first = Window.orderBy("step_order") \
                  .rowsBetween(Window.unboundedPreceding,
                               Window.currentRow)
    prev_n = F.coalesce(F.lag("n_users").over(w), F.col("n_users"))
    first_n = F.first("n_users").over(first)
    return counts.select(
        "step_order", "step", "n_users",
        F.when(prev_n > 0,
               F.round(F.col("n_users") / prev_n, 6))
        .alias("conv_from_prev"),
        F.when(first_n > 0,
               F.round(F.col("n_users") / first_n, 6))
        .alias("conv_from_first"))


def retention_cohorts(events: DataFrame, max_offset_days: int = 30,
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Classic cohort retention: cohort = a user's first active date;
    for each (cohort, day-offset) count the distinct users active that
    day and their share of the cohort.

    Two shuffles: the per-user first-date aggregate (key: user) and the
    (cohort, offset) count-distinct (key: cohort×offset — bounded by
    days², tiny).  The join back to events is co-partitioned with the
    first aggregate's key.
    """
    ev = events.select(user_col, F.to_date(ts_col).alias("d"))
    first = ev.groupBy(user_col).agg(F.min("d").alias("cohort_d"))
    sizes = first.groupBy("cohort_d").agg(
        F.countDistinct(user_col).alias("cohort_size"))
    active = (ev.join(first, user_col)
              .withColumn("day_offset",
                          F.datediff(F.col("d"), F.col("cohort_d"))
                          .cast("long"))
              .filter(F.col("day_offset") <= max_offset_days)
              .groupBy("cohort_d", "day_offset")
              .agg(F.countDistinct(user_col).alias("n_active")))
    return (active.join(F.broadcast(sizes), "cohort_d")
            .select(F.date_format("cohort_d", "yyyy-MM-dd")
                    .alias("cohort_day"),
                    "day_offset", "n_active",
                    F.col("cohort_size").cast("long").alias("cohort_size"),
                    F.round(F.col("n_active") / F.col("cohort_size"), 6)
                    .alias("retention")))


def transition_matrix(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """Per-user event-type bigram transitions (a first-order Markov
    view of behavior): order each user's events by (ts, id), lag the
    type, count (prev → cur) pairs, and normalize rows to
    P(cur | prev).

    One shuffle for the per-user window (state streams within the
    partition), one bounded hash-agg on the types×types key, and the
    per-prev normalizer is a broadcast join on ≤|types| rows.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (events
             .select(user_col, ts_col, id_col,
                     F.col(type_col).alias("cur_type"),
                     F.lag(type_col).over(w).alias("prev_type"))
             .filter(F.col("prev_type").isNotNull())
             .groupBy("prev_type", "cur_type")
             .agg(F.count("*").cast("long").alias("n_transitions")))
    totals = pairs.groupBy("prev_type").agg(
        F.sum("n_transitions").alias("n_from_prev"))
    return (pairs.join(F.broadcast(totals), "prev_type")
            .select("prev_type", "cur_type", "n_transitions",
                    F.round(F.col("n_transitions") / F.col("n_from_prev"), 6)
                    .alias("p_next")))


def rolling_active_users(events: DataFrame, window_days: int = 7,
                         user_col: str = "user_id",
                         ts_col: str = "ts") -> DataFrame:
    """DAU / trailing-WAU per day with exact distinct counts.

    A sliding COUNT(DISTINCT) cannot be windowed directly, and a
    day-range θ-join explodes; instead each distinct (user, day) pair
    fans out to the ``window_days`` report days it contributes to — a
    BOUNDED explode (×7) followed by one hash count-distinct on the
    day key.  That is the 100-TB shape: linear in distinct user-days,
    no inequality join, no giant window state.  Report days past the
    last observed day are clipped via a broadcast 1-row max.

    Returns ``(day, dau, wau, dau_wau_ratio)`` where ``wau`` counts
    users active in the ``window_days`` ending that day.
    """
    user_days = (events
                 .select(F.col(user_col), F.to_date(ts_col).alias("d"))
                 .distinct())
    bounds = events.agg(F.max(F.to_date(ts_col)).alias("max_d"))
    contrib = (user_days
               .select(user_col, "d",
                       F.explode(F.sequence(F.lit(0),
                                            F.lit(window_days - 1)))
                       .alias("off"))
               .select(user_col,
                       F.date_add(F.col("d"), F.col("off"))
                       .alias("report_day")))
    wau = (contrib.crossJoin(F.broadcast(bounds))
           .filter(F.col("report_day") <= F.col("max_d"))
           .groupBy("report_day")
           .agg(F.countDistinct(user_col).alias("wau")))
    dau = (user_days.groupBy(F.col("d").alias("report_day"))
           .agg(F.countDistinct(user_col).alias("dau")))
    return (wau.join(dau, "report_day", "left")
            .select(F.date_format("report_day", "yyyy-MM-dd").alias("day"),
                    F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
                    F.col("wau").cast("long").alias("wau"),
                    F.round(F.coalesce("dau", F.lit(0)) / F.col("wau"), 6)
                    .alias("dau_wau_ratio")))
