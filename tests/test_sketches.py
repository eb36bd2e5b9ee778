"""Sketch-aggregate accuracy contracts: approx_count_distinct (HLL++)
and approx_percentile (t-digest) vs their exact counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import relational as R


def test_sketches_within_tolerance_of_exact(spark, sf_dir):
    e = R.load(spark, sf_dir, "events")
    approx = {r["event_type"]: r for r in R.sketch_event_stats(spark, sf_dir).collect()}
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.45)").alias("p45"),
            F.expr("percentile(value, 0.55)").alias("p55"),
            F.expr("percentile(value, 0.98)").alias("p98"),
            F.expr("percentile(value, 0.995)").alias("p995"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        ap = approx[et]
        # HLL at rsd=0.02: demand 5% (2.5 sigma)
        assert abs(ap["approx_users"] - ex["users"]) <= max(1, 0.05 * ex["users"])
        # the sketch guarantee is RANK accuracy, not value accuracy (a few
        # ranks in a heavy tail can move the value a lot): the approx
        # quantile must land inside a ±rank band of the exact distribution
        assert ex["p45"] <= ap["ap50"] <= ex["p55"]
        assert ex["p98"] <= ap["ap99"] <= ex["p995"]
