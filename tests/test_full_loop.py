"""Full-loop integration: the reference's entire pipeline PLUS the
engine's analytics upgrade, in one test —

  landing dir (gz TSV) → streaming transform → wire records
    → Kinesis sink (put_records to shard files)
      → kinesis_py source (batch replay of the stream)
        → JSON decode → aggregation

i.e. everything `bmgoau/cloudfront-kinesis-log-lambda` does end-to-end,
then querying the stream it produced — the capability the reference
itself has no answer for.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.sinks.kinesis import KinesisSink
from cloudfront_kinesis_log_lambda_spark.sources.kinesis import (
    FakeKinesisDataPlane,
    register_kinesis_source,
)
from cloudfront_kinesis_log_lambda_spark.streaming.pipeline import (
    stream_cloudfront_wire,
)
from cloudfront_kinesis_log_lambda_spark.testing.fixtures import write_log_tree


def test_reference_pipeline_then_stream_analytics(spark, tmp_path):
    landing = str(tmp_path / "landing")
    stream_dir = str(tmp_path / "stream")
    write_log_tree(landing, rows=40, files_per_service=1)  # prod + stg

    sink = KinesisSink(
        "prod-logs",
        parallelism=4,
        client_factory=lambda: FakeKinesisDataPlane(stream_dir),
    )
    q = stream_cloudfront_wire(
        spark, landing, sink, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.processAllAvailable()
    q.stop()

    register_kinesis_source(spark)
    stream = spark.read.format("kinesis_py").option("fake_dir", stream_dir).load()
    assert stream.count() == 80  # 2 envs × 40 rows, at-least-once with 0 failures

    # analytics over the stream the reference produced: status-class
    # traffic rollup per env — JVM-side JSON extraction, then groupBy
    decoded = stream.select(
        F.get_json_object("Data", "$.env").alias("env"),
        F.get_json_object("Data", "$.http_status").alias("status"),
        F.get_json_object("Data", "$.bytes_sent").cast("long").alias("bytes_sent"),
    )
    rollup = (
        decoded.groupBy("env", F.substring("status", 1, 1).alias("status_class"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("bytes_sent").alias("bytes"))
        .collect()
    )
    by_key = {(r["env"], r["status_class"]): r["n"] for r in rollup}
    assert sum(by_key.values()) == 80
    assert {k[0] for k in by_key} == {"prod", "stg"}
    assert all(k[1] in "2345" for k in by_key)
    assert all(r["bytes"] > 0 for r in rollup)


def test_streaming_window_agg_over_kinesis_stream(spark, tmp_path):
    """readStream from the Kinesis source → event-time tumbling windows:
    the streaming analytics tier running directly on the stream the
    sink produced (reference has no analog)."""
    import json as _json
    import os as _os

    from cloudfront_kinesis_log_lambda_spark.streaming.pipeline import (
        tumbling_event_counts,
    )

    stream_dir = str(tmp_path / "stream")
    _os.makedirs(stream_dir)
    rows = [
        ("2024-01-01 00:01:00", "view", 1.0),
        ("2024-01-01 00:04:00", "view", 2.0),
        ("2024-01-01 00:11:00", "view", 4.0),
        ("2024-01-01 00:02:00", "click", 8.0),
    ]
    with open(_os.path.join(stream_dir, "shard-000.jsonl"), "w") as f:
        for i, (ts, et, v) in enumerate(rows):
            f.write(
                _json.dumps(
                    {
                        "PartitionKey": f"k{i}",
                        "Data": _json.dumps({"ts": ts, "event_type": et, "value": v}),
                    }
                )
                + "\n"
            )

    register_kinesis_source(spark)
    stream = spark.readStream.format("kinesis_py").option("fake_dir", stream_dir).load()
    decoded = stream.select(
        F.to_timestamp(F.get_json_object("Data", "$.ts")).alias("ts"),
        F.get_json_object("Data", "$.event_type").alias("event_type"),
        F.get_json_object("Data", "$.value").cast("double").alias("value"),
    )
    win = tumbling_event_counts(decoded, window="10 minutes")
    q = (
        win.writeStream.format("memory")
        .queryName("kinesis_win")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM kinesis_win").collect()
    }
    q.stop()
    assert got == {
        ("2024-01-01 00:00:00", "view"): (2, 3.0),
        ("2024-01-01 00:10:00", "view"): (1, 4.0),
        ("2024-01-01 00:00:00", "click"): (1, 8.0),
    }
