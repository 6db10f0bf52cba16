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

from python_vector_db___ai_spark.functions.inline import inline_table


def funnel_steps(events: DataFrame, steps: Sequence[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Strict sequential funnel: a user reaches step k only with an
    event of type ``steps[k]`` strictly after their step-(k-1) time,
    taking the earliest qualifying timestamp at every step.

    Single-pass shape: a naive chain of per-step joins re-embeds every
    earlier step's subplan (the 4-step chain planned 26 scans of
    ``events``); instead each user's funnel-typed events sort into one
    array and a single ``aggregate()`` walk carries the per-step
    first-reach times as its state — ONE scan, one shuffle on
    ``user_col``, one bounded aggregate on the step key, all JVM
    expressions.  The per-user array holds only funnel-typed events
    (pre-filtered); a pathological user with millions of them would
    spill — at that point the chained-aggregate form (or a stateful
    streaming walk) is the fallback.

    Returns one row per step:
    (step_order, step, n_users, conv_from_prev, conv_from_first).
    """
    n_steps = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = (events
          .filter(F.col(type_col).isin(list(steps)))
          .select(F.col(user_col),
                  F.struct(F.unix_micros(ts_col).alias("t"),
                           F.col(type_col).alias("y")).alias("e")))
    # ascending (ts, type) walk; state[k] = micros of first reach of
    # step k (null until reached).  An event of type steps[k] fills
    # slot k when the slot is empty and slot k-1 was reached strictly
    # earlier (k=0 needs no predecessor).
    init = F.array(*[F.lit(None).cast("long") for _ in range(n_steps)])
    walk = F.aggregate(
        F.array_sort(F.collect_list("e")),
        init,
        lambda st, e: F.transform(
            st,
            lambda t, k: F.coalesce(
                t,
                F.when(
                    (e["y"] == F.element_at(steps_arr, k + 1))
                    & ((k == 0)
                       # greatest(k,1): never index slot 0 with 0 —
                       # ANSI element_at is 1-based and would throw;
                       # when k=0 the first disjunct already decides
                       | (F.element_at(st, F.greatest(k, F.lit(1)))
                          < e["t"])),
                    e["t"]))))
    reached = (ev.groupBy(user_col)
               .agg(walk.alias("st"))
               .select(F.posexplode("st").alias("step_order", "t")))
    got = (reached.groupBy("step_order")
           .agg(F.count("t").cast("long").alias("n_users")))
    # literal step spine: every step appears in the report even when
    # nobody (or no event at all) reached it.  VALUES-inlined (stable
    # canonicalization, no RDD job) — see functions/inline.py.
    spine = inline_table(
        events.sparkSession,
        [(k, s) for k, s in enumerate(steps)],
        "step_order int, step string")
    counts = (spine.join(got, "step_order", "left")
              .select("step_order", "step",
                      F.coalesce("n_users", F.lit(0)).cast("long")
                      .alias("n_users")))
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
    day-range θ-join explodes.  Since r14 the plan is ONE user-keyed
    aggregation feeding two COUNT-free reports (guide §2.3/2.4 — the
    r13 form exploded every distinct (user, day) pair ×window_days and
    paid a corpus-sized (report_day, user) distinct-aggregation
    exchange):

    * per user, ``array_sort(collect_set(day))`` — the only shuffle
      that carries user-sized data, with map-side set dedup;
    * each user's contributed report days are a UNION OF INTERVALS
      ``[d, d+window-1]``; merging overlaps per user in one indexed
      ``transform`` (start at ``max(d_i, d_{i-1}+window)``) emits each
      report day AT MOST ONCE per user, so ``wau`` is a plain
      ``count(*)`` — no second distinct over the ×window fan-out;
    * ``dau`` is a plain count over the exploded per-user day sets
      (already distinct by construction).

    Exact same counts as the distinct-based form (COUNT(DISTINCT)
    ignores NULL users, so NULL users are filtered up front); report
    days past the last observed day are clipped via a broadcast 1-row
    max.

    Returns ``(day, dau, wau, dau_wau_ratio)`` where ``wau`` counts
    users active in the ``window_days`` ending that day.
    """
    bounds = events.agg(F.max(F.to_date(ts_col)).alias("max_d"))
    day_sets = (events
                .filter(F.col(user_col).isNotNull())
                .select(F.col(user_col), F.to_date(ts_col).alias("d"))
                .filter(F.col("d").isNotNull())
                .groupBy(user_col)
                .agg(F.array_sort(F.collect_set("d")).alias("days"))
                .cache())
    # merged-interval report days: day i contributes
    # [max(d_i, d_{i-1} + window), d_i + window - 1]; sorted distinct
    # days make the start never exceed the end (d_i >= d_{i-1} + 1).
    days_col = F.col("days")
    rds = F.flatten(F.transform(
        days_col,
        lambda d, i: F.sequence(
            # greatest(i, 1): ANSI element_at is 1-based and index 0
            # would throw; at i=0 the when() already decides (same
            # guard convention as funnel_steps above).
            F.when(i == 0, d).otherwise(
                F.greatest(d, F.date_add(
                    F.element_at(days_col, F.greatest(i, F.lit(1))),
                    window_days))),
            F.date_add(d, window_days - 1))))
    wau = (day_sets
           .select(F.explode(rds).alias("report_day"))
           .crossJoin(F.broadcast(bounds))
           .filter(F.col("report_day") <= F.col("max_d"))
           .groupBy("report_day")
           .agg(F.count("*").cast("long").alias("wau")))
    dau = (day_sets
           .select(F.explode("days").alias("report_day"))
           .groupBy("report_day")
           .agg(F.count("*").cast("long").alias("dau")))
    out = (wau.join(dau, "report_day", "left")
           .select(F.date_format("report_day", "yyyy-MM-dd").alias("day"),
                   F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
                   F.col("wau").cast("long").alias("wau"),
                   F.round(F.coalesce("dau", F.lit(0)) / F.col("wau"), 6)
                   .alias("dau_wau_ratio")))
    # Teardown handle (same convention as dedup's _cached_frames): the
    # cache manager matches canonicalized plans, so a repeated-trial
    # bench would silently read rep 1's day_sets in reps 2-3 unless it
    # can unpersist between reps.
    out._cached_frames = [day_sets]
    return out
