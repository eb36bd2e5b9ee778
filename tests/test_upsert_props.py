"""Hypothesis property for the bucketed upsert store's exactly-once
MERGE (streaming/upsert.py) over random crash/retry schedules.

The deterministic tests pin single shapes (one partial-failure retry,
one non-idempotent double-apply probe). This property randomizes the
whole schedule — batch contents, partial-bucket crash attempts, retry
counts — against the merge class where any contract violation is
ARITHMETICALLY visible: a counter merge (SUM of deltas), which is
non-idempotent, so a bucket that applies a batch twice (or zero times)
lands on the wrong total, not silently on the same rows.

Law: after any schedule of [partial-crash attempt?] + full apply +
[full retries...] per batch id, the store equals the dict replay
{key: Σ deltas} — each bucket applied each batch exactly once.
"""

from __future__ import annotations

import shutil
import tempfile
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.streaming.upsert import (
    BucketedUpsertStore,
)

SCHEMA = "user_id long, total long"


def _counter_merge(current, incoming):
    return (
        current.unionByName(incoming)
        .groupBy("user_id", "bucket")
        .agg(F.sum("total").alias("total"))
        .select("user_id", "total", "bucket")
    )


def _df(spark, rows):
    return (
        spark.createDataFrame([(u, int(d)) for u, d in rows], SCHEMA)
        if rows
        else spark.createDataFrame([], SCHEMA)
    )


_batch_st = st.tuples(
    st.lists(  # rows: (user, delta)
        st.tuples(st.integers(1, 8), st.integers(1, 9)),
        min_size=1,
        max_size=5,
    ),
    st.sets(st.integers(0, 3), max_size=2),  # crash attempt's buckets
    st.integers(0, 1),  # full retries after the successful apply
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_batch_st, min_size=2, max_size=3))
def test_upsert_counter_survives_crash_retry_schedules(spark, schedule):
    d = tempfile.mkdtemp(prefix="upsertprop-")
    try:
        store = BucketedUpsertStore(d, "user_id", n_buckets=4)
        want = Counter()
        for bid, (rows, crash_buckets, n_retry) in enumerate(schedule):
            for u, delta in rows:
                want[u] += delta
            df = _df(spark, rows)
            if crash_buckets:
                # a crashed first attempt that only reached some buckets
                partial = (
                    df.withColumn("bk", store._bucket())
                    .filter(F.col("bk").isin(sorted(crash_buckets)))
                    .drop("bk")
                )
                store.apply(partial, bid, _counter_merge)
            store.apply(df, bid, _counter_merge)  # the (re)delivery
            for _ in range(n_retry):
                store.apply(df, bid, _counter_merge)  # foreachBatch retry
        got = {
            r["user_id"]: r["total"]
            for r in store.read(spark, SCHEMA).collect()
        }
        assert got == dict(want), schedule
    finally:
        shutil.rmtree(d, ignore_errors=True)
