"""SparkSession factory with engine-wide defaults.

Reproducibility requirements from the reference pipeline:

- ``spark.sql.session.timeZone=UTC``: the reference calls
  ``datetime.astimezone()`` on a naive CloudFront timestamp
  (cloudfront_kinesis_lambda.py:196-203), which attaches the *host* zone;
  on Lambda that host zone is UTC. Pinning the session zone makes the
  engine deterministic everywhere (SURVEY.md §1.4.4).

Scale defaults:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong for some stage; AQE re-plans.
- Arrow on — every pandas UDF in the engine is Arrow-batched.
- ``spark.sql.shuffle.partitions`` defaults to 32 to match the test
  harness (local[32]); on a real cluster this should be ~2-3× total cores
  and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "cloudfront-kinesis-log-lambda-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and let spark-submit supply it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
        # generous broadcast threshold: all dimension tables here are tiny,
        # and at 100 TB the dims (region/nation/part metadata) still fit.
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.sql.parquet.filterPushdown": "true",
        # testdata events.ts is TIMESTAMP(NANOS): read as long, converted
        # to a proper timestamp in the loader (see relational.load)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # don't let tiny local runs spray hundreds of output files
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.ui.enabled": os.environ.get("SPARK_GRAFT_UI", "false"),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # mark the session tuned: relational._tune_session repairs VANILLA
    # sessions at first load, and without this marker it would clobber
    # deliberate choices made here (e.g. shuffle_partitions /
    # SPARK_GRAFT_SHUFFLE_PARTITIONS) with its own defaults
    spark.conf.set(
        "spark.cloudfront_kinesis_log_lambda_spark.tuned", "true"
    )
    return spark
