"""Streaming incremental Holt-Winters seasonal smoothing (the
streaming twin of ``operators/timeseries.py::events_holt_winters``).

The fold ELEMENT here is an hourly bucket, not an event — and a batch
boundary can split an hour. So unlike the EWMA/Holt twins, left-fold
composition needs one extra piece of state: the OPEN (latest) hour's
partial DECIMAL(18,9) sum. Each batch folds only CLOSED hours (every
bucket except the newest) into the (l, b, s[24], n) accumulator —
decimal addition makes the split-hour totals compose exactly — and
:meth:`holt_winters` folds the still-open bucket on READ, so the
served result is column-for-column the batch operator's output
without ever committing a bucket that may still grow.

n = 0 encodes "no hour closed yet" (a type whose entire history is
one open bucket): the accumulator struct is a placeholder and the
serve step runs the batch operator's init instead of a fold step.

Ordering contract: time-ordered arrival per type (new events never
belong to an already-CLOSED hour) — the EWMA/Holt twins' contract,
one granularity coarser. The batch=<id> overwrite / argmax-merge /
as-of-seed retry contract is streaming/foldstate.py's, keyed by
event_type; the (last_ts, last_id) high-water mark is the newest raw
EVENT seen, which strictly advances even when only the open bucket's
sum changes (the open_hb timestamp alone would tie across batches and
make the argmax compare accumulator payloads). Stream == batch is
bit-exact (shared ``holt_winters_merge_lambda``), pinned in
tests/test_streaming_holt_winters.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.util import (
    DECIMAL_18_9_BOUND,
    in_decimal_domain,
)
from cloudfront_kinesis_log_lambda_spark.operators.timeseries import (
    HW_PERIOD,
    holt_winters_merge_lambda,
)
from cloudfront_kinesis_log_lambda_spark.streaming.foldstate import (
    FoldStateStore,
)

_STATE_SCHEMA = (
    "event_type string, last_ts timestamp, last_id bigint, "
    "l double, b double, s array<double>, n bigint, "
    "open_hb timestamp, open_xd decimal(18,9)"
)

_ZERO = (
    "named_struct('l', 0.0D, 'b', 0.0D, "
    f"'s', array_repeat(0.0D, {HW_PERIOD}), 'n', 0L)"
)


class StreamingHoltWinters:
    """``foreachBatch`` callable maintaining per-type seasonal state.

    >>> q = (events_stream.writeStream
    ...      .foreachBatch(StreamingHoltWinters(store_dir))
    ...      .start())

    Query the merged result with :meth:`holt_winters`.
    """

    def __init__(self, store_dir: str) -> None:
        self.store = FoldStateStore(
            store_dir,
            _STATE_SCHEMA,
            ("l", "b", "s", "n", "open_hb", "open_xd"),
            key="event_type",
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        buckets = (
            batch_df.select("event_type", "ts", "event_id", "value")
            # decimal-exact domain (r14) + NULL-event-time exclusion
            # (r15), same rules as the batch op
            .filter(
                in_decimal_domain(F.col("value"), DECIMAL_18_9_BOUND)
                & F.col("ts").isNotNull()
            )
            .groupBy(
                "event_type", F.date_trunc("hour", F.col("ts")).alias("hb")
            )
            .agg(
                F.sum(F.col("value").cast("decimal(18,9)"))
                .cast("decimal(18,9)")
                .alias("xd"),
                F.max(F.struct("ts", "event_id")).alias("mk"),
            )
        )
        per = buckets.groupBy("event_type").agg(
            F.sort_array(F.collect_list(F.struct("hb", "xd"))).alias("bl"),
            F.max("mk").alias("mk"),
        )
        prior = self.store.state(spark, before_batch=batch_id).select(
            "event_type",
            F.col("l").alias("p_l"),
            F.col("b").alias("p_b"),
            F.col("s").alias("p_s"),
            F.col("n").alias("p_n"),
            F.col("open_hb").alias("p_open_hb"),
            F.col("open_xd").alias("p_open_xd"),
        )
        joined = per.join(prior, "event_type", "left")
        # merge the prior open bucket into this batch's bucket list:
        # same hour → decimal-add into the first bucket; earlier hour →
        # it closed with no new data, prepend it (ordering contract
        # forbids batch buckets BEFORE the open hour)
        cand = (
            "CASE WHEN p_open_hb IS NULL THEN bl "
            "WHEN bl[0].hb = p_open_hb THEN concat(array(named_struct("
            "'hb', bl[0].hb, "
            "'xd', cast(bl[0].xd + p_open_xd as decimal(18,9)))), "
            "slice(bl, 2, size(bl) - 1)) "
            "ELSE concat(array(named_struct("
            "'hb', p_open_hb, 'xd', p_open_xd)), bl) END"
        )
        merge = holt_winters_merge_lambda()
        fold_from_init = (
            f"CASE WHEN size(elems) = 0 THEN {_ZERO} "
            "ELSE aggregate(slice(elems, 2, size(elems) - 1), "
            "named_struct('l', elems[0].x, 'b', 0.0D, "
            f"'s', array_repeat(0.0D, {HW_PERIOD}), 'n', 1L), "
            f"{merge}) END"
        )
        out = (
            joined.withColumn("cand", F.expr(cand))
            .withColumn(
                "elems",
                F.expr(
                    "transform(slice(cand, 1, size(cand) - 1), c -> "
                    "named_struct('x', cast(c.xd as double), "
                    "'p', cast(hour(c.hb) as int)))"
                ),
            )
            .withColumn(
                "acc",
                F.expr(
                    f"CASE WHEN p_n IS NULL OR p_n = 0L "
                    f"THEN {fold_from_init} "
                    "ELSE aggregate(elems, named_struct("
                    "'l', p_l, 'b', p_b, 's', p_s, 'n', p_n), "
                    f"{merge}) END"
                ),
            )
            .select(
                "event_type",
                F.col("mk.ts").alias("last_ts"),
                F.col("mk.event_id").alias("last_id"),
                F.col("acc.l").alias("l"),
                F.col("acc.b").alias("b"),
                F.col("acc.s").alias("s"),
                F.col("acc.n").alias("n"),
                F.expr("element_at(cand, -1).hb").alias("open_hb"),
                F.expr("element_at(cand, -1).xd").alias("open_xd"),
            )
        )
        self.store.write(out, batch_id)

    def state(
        self, spark: SparkSession, before_batch: int | None = None
    ) -> DataFrame:
        return self.store.state(spark, before_batch)

    def holt_winters(self, spark: SparkSession) -> DataFrame:
        """Merged result, column-for-column the batch query's output:
        folds the still-open hour on read (batch-operator init when no
        hour has closed yet)."""
        merge = holt_winters_merge_lambda()
        final = (
            "CASE WHEN n = 0L THEN named_struct("
            "'l', cast(open_xd as double), 'b', 0.0D, "
            f"'s', array_repeat(0.0D, {HW_PERIOD}), 'n', 1L) "
            "ELSE aggregate(array(named_struct("
            "'x', cast(open_xd as double), "
            "'p', cast(hour(open_hb) as int))), "
            "named_struct('l', l, 'b', b, 's', s, 'n', n), "
            f"{merge}) END"
        )
        return (
            self.state(spark)
            .withColumn("fin", F.expr(final))
            .withColumn(
                "p_next",
                F.expr(f"cast((hour(open_hb) + 1) % {HW_PERIOD} as int)"),
            )
            .select(
                "event_type",
                F.col("fin.n").alias("n_buckets"),
                F.round(F.col("fin.l"), 6).alias("level"),
                F.round(F.col("fin.b"), 6).alias("trend"),
                F.round(
                    F.element_at(F.col("fin.s"), F.col("p_next") + 1), 6
                ).alias("season_next"),
                F.round(
                    F.col("fin.l")
                    + F.col("fin.b")
                    + F.element_at(F.col("fin.s"), F.col("p_next") + 1),
                    6,
                ).alias("forecast"),
            )
        )
