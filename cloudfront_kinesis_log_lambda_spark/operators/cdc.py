"""Snapshot-diff (CDC-style) operators.

``customer_rollup_diff`` is the snapshot-compare shape (yesterday's
aggregate state vs today's): a keyed FULL OUTER join classifying every
entity as added / removed / changed / unchanged — the audit step
behind incremental MERGE pipelines (streaming/upsert.py holds the
streaming twin of that idea, SCD2 history its windowed cousin).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.relational import load

SNAPSHOT_T1 = datetime.datetime(1998, 1, 1)
SNAPSHOT_T2 = datetime.datetime(2000, 1, 1)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    metrics: list[str],
) -> DataFrame:
    """Generic keyed snapshot diff: FULL OUTER join ``old`` vs ``new``
    on ``key`` and classify each entity by comparing the ``metrics``
    columns (present in both inputs). Output columns: key,
    change_type, old_<m>/new_<m> per metric.

    Both sides should arrive pre-aggregated (one row per key) — the
    join then moves one compact row per entity per side, co-partitioned
    on the key, regardless of the fact-table size underneath.
    """
    o = old.select(
        F.col(key), *[F.col(m).alias(f"old_{m}") for m in metrics]
    )
    n = new.select(
        F.col(key), *[F.col(m).alias(f"new_{m}") for m in metrics]
    )
    j = o.join(n, key, "full_outer")
    same = F.lit(True)
    for m in metrics:
        same = same & (F.col(f"old_{m}") == F.col(f"new_{m}"))
    change = (
        F.when(F.col(f"old_{metrics[0]}").isNull(), F.lit("added"))
        .when(F.col(f"new_{metrics[0]}").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        key,
        change.alias("change_type"),
        *[F.col(f"old_{m}") for m in metrics],
        *[F.col(f"new_{m}") for m in metrics],
    )


def _customer_snapshot(orders: DataFrame, cutoff: datetime.datetime) -> DataFrame:
    return (
        orders.filter(F.col("o_orderdate") < F.lit(cutoff))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def customer_rollup_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff of the per-customer order rollup between two snapshot
    cutoffs: change_type ∈ {added, removed, changed, unchanged} plus
    old/new metrics and the revenue delta.

    Both snapshots aggregate BEFORE the FULL OUTER join, so the join
    carries one compact row per customer per side (never order rows) —
    the standard incremental-audit plan at any scale. 'removed' cannot
    occur on append-only orders data; the synthetic-retraction case is
    covered in tests/test_cdc.py. Metric equality compares the
    ROUND(·,2)-rendered totals — the same quantization the output
    itself carries.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    diff = snapshot_diff(
        _customer_snapshot(orders, SNAPSHOT_T1),
        _customer_snapshot(orders, SNAPSHOT_T2),
        key="custkey",
        metrics=["n_orders", "total"],
    )
    return diff.select(
        "custkey",
        "change_type",
        F.col("old_n_orders"),
        F.col("new_n_orders"),
        F.col("old_total"),
        F.col("new_total"),
        F.round(
            F.coalesce(F.col("new_total"), F.lit(0.0))
            - F.coalesce(F.col("old_total"), F.lit(0.0)),
            2,
        ).alias("delta"),
    )
