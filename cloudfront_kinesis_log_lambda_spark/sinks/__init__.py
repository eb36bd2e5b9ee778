from cloudfront_kinesis_log_lambda_spark.sinks.kinesis import (
    KinesisSink,
    put_records_with_retry,
)
from cloudfront_kinesis_log_lambda_spark.sinks.parquet import write_log_store

__all__ = ["KinesisSink", "put_records_with_retry", "write_log_store"]
