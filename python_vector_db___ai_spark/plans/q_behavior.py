"""Behavioral analytics queries over ``events``: sequential funnel,
cohort retention, and the event-type transition matrix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_vector_db___ai_spark.operators.behavior import (
    funnel_steps,
    retention_cohorts,
    transition_matrix,
)
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table

_FUNNEL = ("signup", "view", "click", "purchase")


def _funnel_oracle() -> str:
    ctes = [f"""s0 AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = '{_FUNNEL[0]}' GROUP BY user_id
)"""]
    for k, step in enumerate(_FUNNEL[1:], start=1):
        ctes.append(f"""s{k} AS (
  SELECT e.user_id, min(e.ts) AS t{k}
  FROM events e JOIN s{k - 1} p ON e.user_id = p.user_id
  WHERE e.event_type = '{step}' AND e.ts > p.t{k - 1}
  GROUP BY e.user_id
)""")
    counts = "\n  UNION ALL ".join(
        f"SELECT {k} AS step_order, '{s}' AS step, count(*)::BIGINT AS n_users "
        f"FROM s{k}"
        for k, s in enumerate(_FUNNEL))
    return f"""
WITH {', '.join(ctes)}, counts AS (
  {counts}
)
SELECT step_order, step, n_users,
       CASE WHEN coalesce(
              lag(n_users) OVER (ORDER BY step_order), n_users) > 0
            THEN round(n_users * 1.0 / coalesce(
              lag(n_users) OVER (ORDER BY step_order), n_users), 6)
       END AS conv_from_prev,
       CASE WHEN first_value(n_users) OVER (
              ORDER BY step_order
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
            THEN round(n_users * 1.0 / first_value(n_users) OVER (
              ORDER BY step_order
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
       END AS conv_from_first
FROM counts
"""


@register(
    "events_funnel_steps",
    oracle=_funnel_oracle(),
    doc="strict sequential conversion funnel signup→view→click→purchase: "
        "each step's earliest event must be strictly after the previous "
        "step's — chained co-partitioned min-aggregates on user_id, one "
        "exchange reused across all steps",
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return funnel_steps(ev, _FUNNEL)


_RET_MAX_OFFSET = 30


@register(
    "events_retention_cohorts",
    oracle=f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d FROM events
), firstd AS (
  SELECT user_id, min(d) AS cohort_d FROM ev GROUP BY user_id
), sizes AS (
  SELECT cohort_d, count(DISTINCT user_id)::BIGINT AS cohort_size
  FROM firstd GROUP BY cohort_d
), active AS (
  SELECT cohort_d, (d - cohort_d)::BIGINT AS day_offset,
         count(DISTINCT e.user_id)::BIGINT AS n_active
  FROM ev e JOIN firstd USING (user_id)
  WHERE (d - cohort_d) <= {_RET_MAX_OFFSET}
  GROUP BY cohort_d, day_offset
)
SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_day, day_offset,
       n_active, cohort_size,
       round(n_active * 1.0 / cohort_size, 6) AS retention
FROM active JOIN sizes USING (cohort_d)
""",
    doc="daily cohort retention: cohort = first-active date, distinct "
        "active users per (cohort, day-offset) with cohort-share — two "
        "bounded shuffles, broadcast cohort sizes",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return retention_cohorts(ev, max_offset_days=_RET_MAX_OFFSET)


@register(
    "events_transition_matrix",
    oracle="""
WITH lagged AS (
  SELECT event_type AS cur_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, cur_type, count(*)::BIGINT AS n_transitions
  FROM lagged WHERE prev_type IS NOT NULL
  GROUP BY prev_type, cur_type
), totals AS (
  SELECT prev_type, sum(n_transitions) AS n_from_prev
  FROM pairs GROUP BY prev_type
)
SELECT prev_type, cur_type, n_transitions,
       round(n_transitions * 1.0 / n_from_prev, 6) AS p_next
FROM pairs JOIN totals USING (prev_type)
""",
    doc="first-order Markov transition matrix of event types per user "
        "(lag window ordered by ts,event_id; types×types hash-agg; "
        "broadcast row normalizer)",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return transition_matrix(ev)


_WAU_DAYS = 7


@register(
    "events_active_users_rolling",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), mx AS (
  SELECT max(CAST(ts AS DATE)) AS max_d FROM events
), contrib AS (
  SELECT user_id, d + off::INTEGER AS report_day
  FROM ud CROSS JOIN generate_series(0, {_WAU_DAYS - 1}) AS t(off)
), wau AS (
  SELECT report_day, count(DISTINCT user_id)::BIGINT AS wau
  FROM contrib CROSS JOIN mx
  WHERE report_day <= max_d
  GROUP BY report_day
), dau AS (
  SELECT d AS report_day, count(DISTINCT user_id)::BIGINT AS dau
  FROM ud GROUP BY d
)
SELECT strftime(w.report_day, '%Y-%m-%d') AS day,
       coalesce(dau, 0)::BIGINT AS dau, wau,
       round(coalesce(dau, 0) * 1.0 / wau, 6) AS dau_wau_ratio
FROM wau w LEFT JOIN dau d ON d.report_day = w.report_day
""",
    doc="exact DAU / trailing-7d-WAU per day: each distinct (user, day) "
        "fans out to the bounded 7 report days it contributes to — "
        "linear in user-days, one hash count-distinct, no inequality "
        "join, no sliding-distinct window state",
)
def events_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.operators.behavior import (
        rolling_active_users,
    )

    ev = load_table(spark, sf_dir, "events")
    return rolling_active_users(ev, window_days=_WAU_DAYS)
