"""Streaming incremental Holt linear-trend smoothing (the streaming
twin of ``operators/timeseries.py::events_holt``).

Exactly the EWMA twin's shape (streaming/ewma.py) with a RICHER state:
Holt's recursion updates (level, trend) jointly, so the per-user state
is the full accumulator struct (l, b, n) plus the (ts, event_id)
high-water mark. Left-fold composition still holds field-for-field —
the fold over a user's complete series equals the fold over batch
k+1's slice seeded with the stored struct — and the n counter makes
even the TWO-POINT INIT compose: a user whose first batch held a
single event persists n=1, and the next batch's first value triggers
the init branch (b = x₁ − x₀) exactly as the batch fold would.

The batch=<id> overwrite / argmax-merge / as-of-seed retry contract
lives in streaming/foldstate.py (shared with the EWMA twin); the
ordering contract is the EWMA twin's (time-ordered per-user arrival).
Stream == batch is bit-exact (the merge lambda is shared code —
``holt_merge_lambda``), pinned in tests/test_streaming_holt.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.timeseries import (
    holt_merge_lambda,
)
from cloudfront_kinesis_log_lambda_spark.streaming.foldstate import (
    FoldStateStore,
    user_series,
)

_STATE_SCHEMA = (
    "user_id bigint, last_ts timestamp, last_id bigint, "
    "l double, b double, n bigint"
)


class StreamingHolt:
    """``foreachBatch`` callable maintaining per-user (level, trend).

    >>> q = (events_stream.writeStream
    ...      .foreachBatch(StreamingHolt(store_dir))
    ...      .start())

    Query the merged result with :meth:`holt`.
    """

    def __init__(self, store_dir: str) -> None:
        self.store = FoldStateStore(store_dir, _STATE_SCHEMA, ("l", "b", "n"))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        series = user_series(batch_df).withColumn(
            "s",
            F.expr(
                "transform(series, v -> "
                "named_struct('l', v.value, 'b', 0.0D, 'n', 1L))"
            ),
        )
        prior = self.store.state(spark, before_batch=batch_id).select(
            "user_id",
            F.col("l").alias("p_l"),
            F.col("b").alias("p_b"),
            F.col("n").alias("p_n"),
        )
        joined = series.join(prior, "user_id", "left")
        merge = holt_merge_lambda()
        seeded = (
            f"aggregate(s, named_struct('l', p_l, 'b', p_b, 'n', p_n), "
            f"{merge})"
        )
        fresh = f"aggregate(slice(s, 2, size(s) - 1), s[0], {merge})"
        out = joined.withColumn(
            "h",
            F.when(F.col("p_n").isNotNull(), F.expr(seeded)).otherwise(
                F.expr(fresh)
            ),
        ).select(
            "user_id",
            F.element_at("series", -1)["ts"].alias("last_ts"),
            F.element_at("series", -1)["event_id"].alias("last_id"),
            F.col("h.l").alias("l"),
            F.col("h.b").alias("b"),
            F.col("h.n").alias("n"),
        )
        self.store.write(out, batch_id)

    def state(
        self, spark: SparkSession, before_batch: int | None = None
    ) -> DataFrame:
        return self.store.state(spark, before_batch)

    def holt(self, spark: SparkSession) -> DataFrame:
        """Merged result, column-for-column the batch query's output."""
        return self.state(spark).select(
            "user_id",
            F.col("n").alias("n_events"),
            F.round("l", 6).alias("level"),
            F.round("b", 6).alias("trend"),
            F.round(F.col("l") + F.col("b"), 6).alias("forecast"),
        )
