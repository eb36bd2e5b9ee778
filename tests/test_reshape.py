"""Reshape-operator contracts: pivot/unpivot/explode are oracle-checked
by the driver gate; here we pin what the oracle can't — sampling rates,
and the range join's equivalence to the naive theta formulation plus its
physical plan (no nested-loop blow-up).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import reshape as RS
from cloudfront_kinesis_log_lambda_spark.operators.relational import load


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_stratified_sample_rates(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    exact = {r["event_type"]: r["n"] for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    sampled = {r["event_type"]: r["n_sampled"] for r in RS.stratified_event_sample(spark, sf_dir).collect()}
    # fraction-1.0 stratum must be kept whole
    assert sampled["error"] == exact["error"]
    for et, n in exact.items():
        if et == "error":
            continue
        # Bernoulli(0.25) on n trials: allow 5 sigma
        expect = 0.25 * n
        sigma = (n * 0.25 * 0.75) ** 0.5
        assert abs(sampled[et] - expect) <= 5 * sigma + 1, (et, sampled[et], expect)


def test_range_join_is_equi_join_not_nested_loop(spark, sf_dir):
    plan = _plan(RS.events_range_join(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_matches_naive_theta_formulation(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts")
    )
    naive = (
        errors.join(
            clicks,
            (errors.user_id == clicks.c_user_id)
            & (clicks.click_ts >= errors.ts)
            & (clicks.click_ts < errors.ts + F.expr("INTERVAL 5 MINUTES")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("click_ts").alias("n_follow"))
    )
    got = {r["event_id"]: r["n_follow"] for r in RS.events_range_join(spark, sf_dir).collect()}
    exp = {r["event_id"]: r["n_follow"] for r in naive.collect()}
    assert got == exp
    assert sum(got.values()) > 0  # the window actually matches something


def test_pivot_unpivot_roundtrip_schema(spark, sf_dir):
    wide = RS.pivot_qty_by_linestatus(spark, sf_dir)
    assert wide.columns == ["l_returnflag", "qty_F", "qty_O"]
    long = RS.unpivot_order_metrics(spark, sf_dir)
    assert long.columns == ["o_orderpriority", "metric", "value"]
    # melt triples the wide row count exactly
    n_wide = load(spark, sf_dir, "orders").select("o_orderpriority").distinct().count()
    assert long.count() == 3 * n_wide


def test_events_gapfill_semantics(spark, tmp_path):
    """Zero-filled gaps, LOCF carry-forward, leading-gap zero, dense
    hourly spine spanning [min, max] per type."""
    import os

    from cloudfront_kinesis_log_lambda_spark.operators.relational import (
        events_gapfill,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 10, "view", 2.0, "{}"),
            (2, "2024-01-01 03:20:00", 10, "view", 4.0, "{}"),
            (3, "2024-01-01 01:00:00", 11, "click", 8.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "events.parquet"))

    rows = {
        (str(r["bucket_ts"]), r["event_type"]): r
        for r in events_gapfill(spark, d).collect()
    }
    # dense spine: 4 hours x 2 types
    assert len(rows) == 8
    v1 = rows[("2024-01-01 01:00:00", "view")]   # gap hour for view
    assert v1["n_events"] == 0 and v1["sum_value"] == 0.0 and v1["locf_sum"] == 2.0
    v3 = rows[("2024-01-01 03:00:00", "view")]
    assert v3["n_events"] == 1 and v3["locf_sum"] == 4.0
    c0 = rows[("2024-01-01 00:00:00", "click")]  # leading gap: zero LOCF
    assert c0["n_events"] == 0 and c0["locf_sum"] == 0.0
    c3 = rows[("2024-01-01 03:00:00", "click")]
    assert c3["locf_sum"] == 8.0


def test_weighted_sample_favors_heavy_docs_and_excludes_zero(spark, tmp_path):
    """A-Res contract: inclusion ∝ weight. 10 docs at weight 10000 vs
    990 at weight 1 → the heavy docs should essentially all make the
    top-50 (deterministic given the md5-derived uniforms); zero-weight
    docs never appear; the plan is a TakeOrderedAndProject (per-
    partition top-k heaps, no global sort)."""
    from cloudfront_kinesis_log_lambda_spark.operators.reshape import (
        WEIGHTED_SAMPLE_K,
        doc_weighted_sample,
    )

    rows = [(i, 10_000) for i in range(10)]
    rows += [(i, 1) for i in range(10, 1000)]
    rows += [(1000, 0), (1001, 0)]
    spark.createDataFrame(rows, "doc_id long, n_chars long").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    df = doc_weighted_sample(spark, str(tmp_path))
    out = df.collect()
    assert len(out) == WEIGHTED_SAMPLE_K
    ids = {r["doc_id"] for r in out}
    assert not ids & {1000, 1001}
    assert len(ids & set(range(10))) >= 8
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1500]
