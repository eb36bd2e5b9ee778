from cloudfront_kinesis_log_lambda_spark.sources.cloudfront import (
    read_cloudfront_logs,
    read_cloudfront_logs_stream,
)
from cloudfront_kinesis_log_lambda_spark.sources.events import (
    extract_bucket_key,
    parse_log_key,
)
from cloudfront_kinesis_log_lambda_spark.sources.kinesis import (
    KinesisPyDataSource,
    register_kinesis_source,
)

__all__ = [
    "read_cloudfront_logs",
    "read_cloudfront_logs_stream",
    "extract_bucket_key",
    "parse_log_key",
    "KinesisPyDataSource",
    "register_kinesis_source",
]
