from __future__ import annotations

import pytest

from cloudfront_kinesis_log_lambda_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="cfkll-spark-tests",
        master="local[*]",
        shuffle_partitions=32,
        # tiny inputs: stop codegen/AQE from being the bottleneck in tests
        extra_conf={"spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
