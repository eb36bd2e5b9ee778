"""Streaming incremental EWMA (the streaming twin of
``operators/timeseries.py::events_ewma``).

EWMA is the time-series family's order-DEPENDENT stateful op: unlike
OHLC (all merge laws commutative) the recursion yᵢ = (1−α)·yᵢ₋₁ + α·xᵢ
folds left-to-right, so a micro-batch cannot be merged in after the
fact — it must COMPOSE: the fold over a user's full series equals the
fold over batch k+1's slice seeded with the fold result over batches
≤ k. Per-user state is the running (ewma, n) plus the (ts, event_id)
high-water mark:

  per micro-batch:
    sorted per-user value series       →  one array fold per user
    users with prior state             →  fold seeded by the stored ewma
    new users                          →  fold seeded by their first value
    cumulative (ewma, n, ts, id) rows  →  ``state/batch=<id>``

Reads argmax-merge the state store by (last_ts, last_id) — each state
row carries the CUMULATIVE n and ewma, so the newest row per user IS
the answer. Retries are idempotent because the fold seeds from the
AS-OF read (``read_batch_store_before``): a retried batch recomputes
against exactly the pre-batch state and rewrites ``batch=<id>``
byte-identically (the transition twin's contract,
streaming/transitions.py).

Ordering contract (same as StreamingTransitions): micro-batches arrive
in event-time order per user. A batch whose events precede the stored
high-water mark would seed the fold with a FUTURE smoothed value —
exactly the parity the tests pin with ordered wave splits.

Numerics: the per-batch fold is the SAME sequential IEEE double
``aggregate`` expression as the batch query, and function composition
of left folds is the left fold — so stream == batch is bit-exact, no
tolerance (pinned in tests/test_streaming_ewma.py).

100 TB shape: state is one compact row per ACTIVE user per batch
(foldable by streaming/store.py maintenance); per-user batch arrays
are bounded by per-entity event counts (the house per-user-state
contract shared with sessionize / SCD2 / the batch EWMA).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.timeseries import EWMA_ALPHA
from cloudfront_kinesis_log_lambda_spark.streaming.store import (
    read_batch_store,
    read_batch_store_before,
)

_STATE_SCHEMA = (
    "user_id bigint, last_ts timestamp, last_id bigint, "
    "ewma double, n bigint"
)


class StreamingEWMA:
    """``foreachBatch`` callable maintaining per-user running EWMA.

    >>> q = (events_stream.writeStream
    ...      .foreachBatch(StreamingEWMA(store_dir))
    ...      .start())

    Query the merged result with :meth:`ewma`.
    """

    def __init__(self, store_dir: str, alpha: float = EWMA_ALPHA) -> None:
        self.state_dir = os.path.join(store_dir, "state")
        self.alpha = float(alpha)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        a = self.alpha
        series = (
            batch_df.select("user_id", "ts", "event_id", "value")
            .groupBy("user_id")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "value"))
                ).alias("series")
            )
        )
        prior = self.state(spark, before_batch=batch_id).select(
            "user_id",
            F.col("ewma").alias("prior_ewma"),
            F.col("n").alias("prior_n"),
        )
        joined = series.join(prior, "user_id", "left")
        # the two folds share the batch query's exact step expression
        # (operators/timeseries.py::events_ewma) — left-fold composition
        # keeps stream == batch bit-identical
        step = f"(acc, x) -> acc * {1.0 - a!r}D + x.value * {a!r}D"
        seeded = f"aggregate(series, prior_ewma, {step})"
        fresh = (
            f"aggregate(slice(series, 2, size(series) - 1), "
            f"series[0].value, {step})"
        )
        out = joined.select(
            "user_id",
            F.element_at("series", -1)["ts"].alias("last_ts"),
            F.element_at("series", -1)["event_id"].alias("last_id"),
            F.when(F.col("prior_ewma").isNotNull(), F.expr(seeded))
            .otherwise(F.expr(fresh))
            .alias("ewma"),
            (
                F.coalesce(F.col("prior_n"), F.lit(0))
                + F.size("series")
            )
            .cast("long")
            .alias("n"),
        )
        out.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )

    def state(
        self, spark: SparkSession, before_batch: int | None = None
    ) -> DataFrame:
        """Per-user newest cumulative state: argmax by (last_ts,
        last_id) via struct-MAX — each row is cumulative, so MAX-merge
        is re-delivery-safe. ``before_batch`` gives the AS-OF read a
        retried batch must seed from (see streaming/transitions.py)."""
        if before_batch is None:
            raw = read_batch_store(spark, self.state_dir, _STATE_SCHEMA, -1)
        else:
            raw = read_batch_store_before(
                spark, self.state_dir, _STATE_SCHEMA, before_batch
            )
        return (
            raw.groupBy("user_id")
            .agg(F.max(F.struct("last_ts", "last_id", "ewma", "n")).alias("s"))
            .select(
                "user_id",
                F.col("s.last_ts").alias("last_ts"),
                F.col("s.last_id").alias("last_id"),
                F.col("s.ewma").alias("ewma"),
                F.col("s.n").alias("n"),
            )
        )

    def ewma(self, spark: SparkSession) -> DataFrame:
        """Merged result, column-for-column the batch query's output."""
        return self.state(spark).select(
            "user_id",
            F.col("n").alias("n_events"),
            F.round("ewma", 6).alias("ewma"),
        )
