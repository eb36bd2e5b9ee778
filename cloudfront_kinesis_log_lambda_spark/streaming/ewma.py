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

The batch=<id> overwrite / argmax-merge / as-of-seed retry contract
lives in streaming/foldstate.py (shared with the Holt twin).

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.timeseries import EWMA_ALPHA
from cloudfront_kinesis_log_lambda_spark.streaming.foldstate import (
    FoldStateStore,
    user_series,
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
        self.store = FoldStateStore(store_dir, _STATE_SCHEMA, ("ewma", "n"))
        self.alpha = float(alpha)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        a = self.alpha
        series = user_series(batch_df)
        prior = self.store.state(spark, before_batch=batch_id).select(
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
        self.store.write(out, batch_id)

    def state(
        self, spark: SparkSession, before_batch: int | None = None
    ) -> DataFrame:
        return self.store.state(spark, before_batch)

    def ewma(self, spark: SparkSession) -> DataFrame:
        """Merged result, column-for-column the batch query's output."""
        return self.state(spark).select(
            "user_id",
            F.col("n").alias("n_events"),
            F.round("ewma", 6).alias("ewma"),
        )
