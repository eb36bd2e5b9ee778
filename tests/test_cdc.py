"""Snapshot-diff contracts: every change_type reachable (including
'removed', impossible on append-only orders data), null-metric
rendering, and the pre-aggregated-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import cdc as CDC


def test_snapshot_diff_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, 2, 10.0), (2, 1, 5.0), (3, 4, 9.0)],
        "custkey long, n_orders long, total double",
    )
    new = spark.createDataFrame(
        [(1, 2, 10.0), (3, 5, 12.0), (4, 1, 3.0)],
        "custkey long, n_orders long, total double",
    )
    got = {
        r["custkey"]: r["change_type"]
        for r in CDC.snapshot_diff(
            old, new, "custkey", ["n_orders", "total"]
        ).collect()
    }
    assert got == {1: "unchanged", 2: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_metric_change_without_count_change(spark):
    # same n_orders, different total → 'changed' (all metrics compared)
    old = spark.createDataFrame([(1, 2, 10.0)], "k long, n long, t double")
    new = spark.createDataFrame([(1, 2, 11.0)], "k long, n long, t double")
    r = CDC.snapshot_diff(old, new, "k", ["n", "t"]).collect()[0]
    assert r["change_type"] == "changed"


def test_customer_rollup_diff_shape(spark, sf_dir):
    rows = CDC.customer_rollup_diff(spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r["change_type"], 0)
        by_type[r["change_type"]] += 1
        if r["change_type"] == "added":
            assert r["old_n_orders"] is None and r["old_total"] is None
            assert r["delta"] == r["new_total"]
        if r["change_type"] == "unchanged":
            assert r["delta"] == 0.0
    # orders are append-only: nothing can be removed
    assert "removed" not in by_type
    # the window between cutoffs contains orders → someone changed/added
    assert by_type.get("changed") or by_type.get("added")


def test_diff_join_runs_on_aggregated_sides(spark, sf_dir):
    """The FULL OUTER join must sit ABOVE both aggregates (one compact
    row per customer per side) — an order-grain join would be the
    scale killer."""
    plan = (
        CDC.customer_rollup_diff(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FullOuter" in plan
    # both HashAggregates appear below the join in the tree dump
    join_pos = plan.index("FullOuter")
    assert plan.count("HashAggregate", join_pos) >= 2
