"""Partitioned analytics-store layout: env/log_day pruning actually prunes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.transforms import transform_cloudfront
from cloudfront_kinesis_log_lambda_spark.sinks.parquet import read_log_store, write_log_store
from cloudfront_kinesis_log_lambda_spark.sources.cloudfront import read_cloudfront_logs
from cloudfront_kinesis_log_lambda_spark.testing.fixtures import write_log_tree


def test_log_store_roundtrip_and_pruning(spark, tmp_path):
    src = tmp_path / "landing"
    store = str(tmp_path / "store")
    write_log_tree(str(src), rows=80, files_per_service=2)  # days 18 and 19
    enriched = transform_cloudfront(read_cloudfront_logs(spark, str(src)))
    write_log_store(enriched, store, mode="overwrite")

    # hive layout: env=<env>/log_day=<day>
    assert any(p.startswith("env=") for p in os.listdir(store))
    back = read_log_store(spark, store)
    assert back.count() == enriched.count()

    # partition pruning: filtering env+day must scan only that partition
    pruned = back.filter("env = 'prod' AND log_day = '2019-01-18'")
    plan = pruned.explain(extended=False) or pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 80  # one file's worth
    # all rows from the pruned read carry the filter values
    vals = pruned.select("env", F.col("log_day").cast("string")).distinct().collect()
    assert [tuple(v) for v in vals] == [("prod", "2019-01-18")]
