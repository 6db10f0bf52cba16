"""Funnel / retention / transition semantics on hand-built event frames."""

from __future__ import annotations

from datetime import datetime

from python_vector_db___ai_spark.operators.behavior import (
    funnel_steps,
    retention_cohorts,
    transition_matrix,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")


def test_funnel_strict_ordering(spark):
    # u1 completes a->b->c in order; u2 has b BEFORE a (must not count
    # at step b); u3 stops after a.
    ev = _events(spark, [
        (1, 1, _ts("2024-01-01 10:00:00"), "a"),
        (2, 1, _ts("2024-01-01 11:00:00"), "b"),
        (3, 1, _ts("2024-01-01 12:00:00"), "c"),
        (4, 2, _ts("2024-01-01 09:00:00"), "b"),
        (5, 2, _ts("2024-01-01 10:00:00"), "a"),
        (6, 3, _ts("2024-01-01 10:00:00"), "a"),
    ])
    out = {r.step: r for r in funnel_steps(ev, ["a", "b", "c"]).collect()}
    assert out["a"].n_users == 3
    assert out["b"].n_users == 1          # only u1: u2's b precedes a
    assert out["c"].n_users == 1
    assert out["b"].conv_from_first == round(1 / 3, 6)
    assert out["c"].conv_from_prev == 1.0


def test_funnel_equal_ts_not_counted(spark):
    # strictly-after: b at the same instant as a does not advance
    ev = _events(spark, [
        (1, 1, _ts("2024-01-01 10:00:00"), "a"),
        (2, 1, _ts("2024-01-01 10:00:00"), "b"),
    ])
    out = {r.step: r.n_users for r in funnel_steps(ev, ["a", "b"]).collect()}
    assert out == {"a": 1, "b": 0}


def test_retention_offsets(spark):
    # u1 first on day 0 and active day 0 and day 2; u2 only day 0
    ev = _events(spark, [
        (1, 1, _ts("2024-01-01 10:00:00"), "x"),
        (2, 1, _ts("2024-01-03 10:00:00"), "x"),
        (3, 2, _ts("2024-01-01 10:00:00"), "x"),
    ])
    rows = {(r.cohort_day, r.day_offset): r
            for r in retention_cohorts(ev).collect()}
    assert rows[("2024-01-01", 0)].n_active == 2
    assert rows[("2024-01-01", 0)].retention == 1.0
    assert rows[("2024-01-01", 2)].n_active == 1
    assert rows[("2024-01-01", 2)].retention == 0.5
    assert len(rows) == 2


def test_transition_counts_and_probs(spark):
    # u1: a->b->a ; u2: a->b  => from a: {b:2}, from b: {a:1, b... none}
    ev = _events(spark, [
        (1, 1, _ts("2024-01-01 10:00:00"), "a"),
        (2, 1, _ts("2024-01-01 11:00:00"), "b"),
        (3, 1, _ts("2024-01-01 12:00:00"), "a"),
        (4, 2, _ts("2024-01-01 10:00:00"), "a"),
        (5, 2, _ts("2024-01-01 11:00:00"), "b"),
    ])
    rows = {(r.prev_type, r.cur_type): r
            for r in transition_matrix(ev).collect()}
    assert rows[("a", "b")].n_transitions == 2
    assert rows[("a", "b")].p_next == 1.0
    assert rows[("b", "a")].n_transitions == 1
    assert rows[("b", "a")].p_next == 1.0
    assert len(rows) == 2


def test_transition_tiebreak_on_event_id(spark):
    # same ts: order falls back to event_id, deterministically
    ev = _events(spark, [
        (2, 1, _ts("2024-01-01 10:00:00"), "b"),
        (1, 1, _ts("2024-01-01 10:00:00"), "a"),
        (3, 1, _ts("2024-01-01 11:00:00"), "c"),
    ])
    rows = {(r.prev_type, r.cur_type)
            for r in transition_matrix(ev).collect()}
    assert rows == {("a", "b"), ("b", "c")}


def test_rolling_active_users(spark):
    # u1 active day1+day3, u2 active day1: DAU(1)=2, DAU(2)=0, DAU(3)=1;
    # WAU window 2 days: WAU(1)=2, WAU(2)=2 (carry), WAU(3)=1
    ev = _events(spark, [
        (1, 1, _ts("2024-01-01 10:00:00"), "x"),
        (2, 2, _ts("2024-01-01 11:00:00"), "x"),
        (3, 1, _ts("2024-01-03 10:00:00"), "x"),
    ])
    from python_vector_db___ai_spark.operators.behavior import (
        rolling_active_users,
    )

    rows = {r.day: r for r in rolling_active_users(ev, window_days=2).collect()}
    assert rows["2024-01-01"].dau == 2 and rows["2024-01-01"].wau == 2
    assert rows["2024-01-02"].dau == 0 and rows["2024-01-02"].wau == 2
    assert rows["2024-01-03"].dau == 1 and rows["2024-01-03"].wau == 1
    assert rows["2024-01-02"].dau_wau_ratio == 0.0
    assert len(rows) == 3


def test_behavior_plan_shapes(spark):
    """The scale claims in operators/behavior.py, asserted on plans."""
    from python_vector_db___ai_spark.operators.behavior import (
        rolling_active_users,
        transition_matrix,
    )
    from python_vector_db___ai_spark.plans.explain import formatted_plan
    from python_vector_db___ai_spark.session import load_table
    from tests.conftest import SF_DIR

    import re

    ev = load_table(spark, SF_DIR, "events")
    # WAU: the bounded explode + equi-agg shape — no theta join, no
    # cartesian product; the single nested-loop node is the 1-row
    # broadcast max-day bound, never a data-sized side
    wau_plan = formatted_plan(rolling_active_users(ev))
    assert "CartesianProduct" not in wau_plan
    bnlj_nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", wau_plan)
    assert len(bnlj_nodes) <= 1, wau_plan
    # transition matrix: the types-squared aggregate joins its row
    # normalizer by broadcast, never a shuffle join
    tm_plan = formatted_plan(transition_matrix(ev))
    assert "BroadcastHashJoin" in tm_plan or "BroadcastExchange" in tm_plan
    assert "SortMergeJoin" not in tm_plan


def test_funnel_single_pass_plan(spark):
    """The funnel rewrite's claim: ONE scan of events (+ the literal
    step spine) and a bounded exchange count — the chained-join form
    planned 26 scans / 30 exchanges."""
    import re

    from python_vector_db___ai_spark.operators.behavior import funnel_steps
    from python_vector_db___ai_spark.plans.explain import formatted_plan
    from python_vector_db___ai_spark.session import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    plan = formatted_plan(funnel_steps(ev, ["signup", "view", "click",
                                            "purchase"]))
    scans = re.findall(r"\(\d+\) Scan", plan)
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(scans) <= 2, plan     # events + the 4-row step spine
    assert len(exchanges) <= 4, plan
