from cloudfront_kinesis_log_lambda_spark.operators.transforms import (
    add_timestamp,
    enrich_metadata,
    strip_fields,
    to_wire_records,
    transform_cloudfront,
    url_unquote,
)

__all__ = [
    "add_timestamp",
    "enrich_metadata",
    "strip_fields",
    "to_wire_records",
    "transform_cloudfront",
    "url_unquote",
]
