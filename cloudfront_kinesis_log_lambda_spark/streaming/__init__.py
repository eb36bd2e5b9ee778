from cloudfront_kinesis_log_lambda_spark.streaming.pipeline import (
    dedup_within_watermark,
    observed_counter,
    session_window_counts,
    stream_cloudfront_wire,
    tumbling_event_counts,
)

__all__ = [
    "dedup_within_watermark",
    "observed_counter",
    "session_window_counts",
    "stream_cloudfront_wire",
    "tumbling_event_counts",
]
