"""Product-analytics operators (funnel / cohorts / SCD2): edge cases
the synthetic oracle corpus never produces — every sf* user happens to
have a 'view' event, so the parity gate cannot catch ordered-funnel
boundary bugs (r5 review: element_at on an empty array aborts under
Spark 4's default ANSI mode)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _events(spark, rows):
    # rows: (user_id, event_type, second_offset)
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=s), u, et, 1.0, "{}")
            for i, (u, et, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _funnel(spark, df):
    import cloudfront_kinesis_log_lambda_spark.operators.relational as R

    orig = R.load
    try:
        R.load = lambda spark, sf_dir, name: df
        return {
            r["stage"]: r["n_users"]
            for r in R.events_funnel(spark, "unused").collect()
        }
    finally:
        R.load = orig


def test_funnel_user_without_view_does_not_crash_and_counts_out(spark):
    rows = [
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),  # full funnel
        (2, "click", 0), (2, "purchase", 10),                   # no view at all
        (3, "view", 0),                                         # view only
    ]
    got = _funnel(spark, _events(spark, rows))
    assert got == {"1_view": 2, "2_click": 1, "3_purchase": 1}


def test_funnel_ordering_is_strict(spark):
    # click BEFORE the first view must not count; purchase before the
    # qualifying click must not count
    rows = [
        (1, "click", 0), (1, "view", 10), (1, "purchase", 20),
        (2, "view", 0), (2, "purchase", 5), (2, "click", 10),
    ]
    got = _funnel(spark, _events(spark, rows))
    # user 1: view@10, no click after it → stops at stage 1
    # user 2: view@0, click@10, purchase@5 is before the click → stage 2
    assert got == {"1_view": 2, "2_click": 1, "3_purchase": 0}


def test_funnel_single_exchange(spark, sf_dir):
    from cloudfront_kinesis_log_lambda_spark.operators.relational import (
        events_funnel,
    )

    plan = (
        events_funnel(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the three chained windows + per-user fold share ONE user_id
    # exchange; the stage rollup adds its single-row exchange at most
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_scd2_and_cohorts_plan_shapes(spark, sf_dir):
    from cloudfront_kinesis_log_lambda_spark.operators.relational import (
        events_pattern_match,
        events_retention_cohorts,
        user_value_scd2,
    )

    # SCD2: two keyed exchanges are inherent — the (user_id, day)
    # aggregate's and the lead() window's (user_id) repartition (the
    # finer agg partitioning does NOT satisfy the window's coarser
    # distribution); the gate guards against any THIRD exchange creeping
    # in (e.g. a stray repartition or a join rewrite)
    plan = (
        user_value_scd2(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning(user_id") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # top-k compiles to TakeOrderedAndProject, never a global sort
    plan = (
        events_pattern_match(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan

    # cohorts: the compact (user, cohort_day) side must broadcast — a
    # SortMergeJoin regression would mean two extra full shuffles
    plan = (
        events_retention_cohorts(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_analytics_ops_on_empty_events(spark):
    """Empty events must yield empty results (filters routinely drain a
    partition at scale) — not a NULL-propagation crash in the day-0
    anchor, the cohort join, or the window chain."""
    import cloudfront_kinesis_log_lambda_spark.operators.relational as R

    empty = _events(spark, [])
    orig = R.load
    try:
        R.load = lambda spark, sf_dir, name: empty
        assert R.events_retention_cohorts(spark, "unused").count() == 0
        assert R.user_value_scd2(spark, "unused").count() == 0
        assert R.events_pattern_match(spark, "unused").count() == 0
        funnel = {
            r["stage"]: r["n_users"]
            for r in R.events_funnel(spark, "unused").collect()
        }
        assert funnel == {"1_view": 0, "2_click": 0, "3_purchase": 0}
    finally:
        R.load = orig
