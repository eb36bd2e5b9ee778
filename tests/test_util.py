"""ensure_parallelism: the input-layout guard for CPU-bound operators."""

from __future__ import annotations

from cloudfront_kinesis_log_lambda_spark.operators.util import ensure_parallelism


def _n_parts(df) -> int:
    return df.rdd.getNumPartitions()


def test_single_file_scan_gets_repartitioned(spark, sf_dir):
    from cloudfront_kinesis_log_lambda_spark.operators.relational import load

    docs = load(spark, sf_dir, "documents")  # one parquet file at test sf
    assert _n_parts(ensure_parallelism(docs)) >= spark.sparkContext.defaultParallelism


def test_already_repartitioned_plan_not_reshuffled_again(spark, sf_dir):
    from cloudfront_kinesis_log_lambda_spark.operators.relational import load

    docs = load(spark, sf_dir, "documents")
    once = ensure_parallelism(docs)
    twice = ensure_parallelism(once)
    # the short-circuit must return the SAME plan — no second Repartition
    plan = twice._jdf.queryExecution().analyzed().toString()
    assert plan.count("Repartition") == 1


def test_in_memory_frame_repartitioned_once(spark):
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    once = ensure_parallelism(df)
    assert _n_parts(once) >= spark.sparkContext.defaultParallelism
    plan = ensure_parallelism(once)._jdf.queryExecution().analyzed().toString()
    assert plan.count("Repartition") == 1
