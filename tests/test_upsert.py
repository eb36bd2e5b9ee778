"""Bucketed copy-on-write upsert store: incremental SCD2 maintenance
must equal the batch operator over the full history (keyed MERGE is
deterministic — equality contract), with per-bucket exactly-once batch
application across retries."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.streaming.upsert import (
    BucketedUpsertStore,
    scd2_merge,
)

SCD2_SCHEMA = (
    "user_id long, n_events long, day_value double, valid_from string, "
    "valid_to string, is_current int"
)


def _daily(spark, rows):
    # rows: (user_id, day, n_events, day_value) — one incoming SCD2 row
    return spark.createDataFrame(
        [(u, n, v, d, "9999-12-31", 1) for u, d, n, v in rows],
        SCD2_SCHEMA,
    )


def _events_df(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(days=d, seconds=i), u, "view", v, "{}")
            for i, (u, d, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@pytest.fixture()
def applied(spark, tmp_path):
    store = BucketedUpsertStore(str(tmp_path / "scd2"), "user_id", n_buckets=4)
    merge = scd2_merge()
    # three daily micro-batches; users 1..6 so several buckets touched
    batches = [
        [(u, "2024-01-01", 2, 10.0 + u) for u in (1, 2, 3)],
        [(u, "2024-01-02", 1, 20.0 + u) for u in (1, 4, 5)],
        [(u, "2024-01-03", 3, 30.0 + u) for u in (2, 6)],
    ]
    for bid, rows in enumerate(batches):
        store.apply(_daily(spark, rows), bid, merge)
    return store, merge, batches


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_scd2_matches_batch_operator(spark, applied, tmp_path):
    import cloudfront_kinesis_log_lambda_spark.operators.relational as R

    store, _, batches = applied
    # the same history through the BATCH operator
    ev = []
    for rows in batches:
        for u, day, n, v in rows:
            d = int(day[-2:]) - 1
            # n events of value v/n each day → n_events=n, day_value≈v
            ev += [(u, d, round(v / n, 10))] * n
    events = _events_df(spark, ev)
    orig = R.load
    try:
        R.load = lambda spark, sf_dir, name: events
        expect = _rows(
            R.user_value_scd2(spark, "unused").select(
                "user_id", "n_events", "valid_from", "valid_to", "is_current"
            )
        )
    finally:
        R.load = orig
    got = _rows(
        store.read(spark, SCD2_SCHEMA).select(
            "user_id", "n_events", "valid_from", "valid_to", "is_current"
        )
    )
    assert got == expect
    # history semantics: exactly one current row per user
    cur = store.read(spark, SCD2_SCHEMA).filter(F.col("is_current") == 1)
    assert cur.count() == 6
    assert cur.groupBy("user_id").count().filter("count > 1").count() == 0


def test_retry_skips_applied_buckets(spark, applied):
    store, merge, batches = applied
    before = _rows(store.read(spark, SCD2_SCHEMA))
    # full retry of the last batch: every touched bucket already applied
    rewritten = store.apply(_daily(spark, batches[2]), 2, merge)
    assert rewritten == []
    assert _rows(store.read(spark, SCD2_SCHEMA)) == before
    # a NEW batch still applies (watermark is per-bucket, not global)
    rewritten = store.apply(
        _daily(spark, [(1, "2024-01-04", 1, 40.0)]), 3, merge
    )
    assert rewritten != []
    cur = (
        store.read(spark, SCD2_SCHEMA)
        .filter((F.col("user_id") == 1) & (F.col("is_current") == 1))
        .collect()
    )
    assert len(cur) == 1 and cur[0]["valid_from"] == "2024-01-04"


def test_partial_failure_retry_converges(spark, tmp_path):
    """Simulate a crash that applied batch 1 to SOME buckets: the retry
    must merge only the unapplied buckets and converge to the same
    state as a clean run."""
    merge = scd2_merge()
    a = BucketedUpsertStore(str(tmp_path / "a"), "user_id", n_buckets=4)
    b = BucketedUpsertStore(str(tmp_path / "b"), "user_id", n_buckets=4)
    b0 = [(u, "2024-01-01", 1, 1.0 * u) for u in range(1, 9)]
    b1 = [(u, "2024-01-02", 2, 2.0 * u) for u in range(1, 9)]
    for s in (a, b):
        s.apply(_daily(spark, b0), 0, merge)
    # clean run on a
    a.apply(_daily(spark, b1), 1, merge)
    # crashed run on b: only users hashing to ONE bucket got applied
    probe = b._bucket()
    one_bucket = (
        _daily(spark, b1).withColumn("bk", probe).filter(F.col("bk") == 0)
        .drop("bk")
    )
    b.apply(one_bucket, 1, merge)  # the partial attempt
    b.apply(_daily(spark, b1), 1, merge)  # the retry over the full batch
    assert _rows(a.read(spark, SCD2_SCHEMA)) == _rows(b.read(spark, SCD2_SCHEMA))


def test_crashed_swap_recovers_bucket_history(spark, tmp_path):
    """The worst swap window — bucket renamed to trash, replacement not
    yet in place — must be healed by _recover() on the next apply/read,
    not rebuilt-from-empty by the retry (which would silently drop the
    bucket's entire history)."""
    import os
    import shutil

    merge = scd2_merge()
    store = BucketedUpsertStore(str(tmp_path / "s"), "user_id", n_buckets=2)
    store.apply(_daily(spark, [(u, "2024-01-01", 1, 1.0) for u in (1, 2, 3)]), 0, merge)
    before = _rows(store.read(spark, SCD2_SCHEMA))
    # simulate the crash: some bucket vanishes into a dot-trash dir
    b = next(e for e in os.listdir(store.path) if e.startswith("bucket="))
    os.rename(
        os.path.join(store.path, b), os.path.join(store.path, f".{b}.old-123")
    )
    assert _rows(store.read(spark, SCD2_SCHEMA)) == before  # healed
    # and a crash AFTER the swap (trash left behind) is swept, not read
    shutil.copytree(
        os.path.join(store.path, b), os.path.join(store.path, f".{b}.old-456")
    )
    assert _rows(store.read(spark, SCD2_SCHEMA)) == before  # no doubles


def test_reopening_with_different_layout_is_refused(spark, tmp_path):
    BucketedUpsertStore(str(tmp_path / "s"), "user_id", n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        BucketedUpsertStore(str(tmp_path / "s"), "user_id", n_buckets=16)


def test_same_day_correction_is_deterministically_applied(spark, tmp_path):
    """MERGE semantics: a re-emitted (key, day) observation replaces the
    stored one — never an arbitrary survivor."""
    merge = scd2_merge()
    store = BucketedUpsertStore(str(tmp_path / "s"), "user_id", n_buckets=2)
    store.apply(_daily(spark, [(1, "2024-01-01", 1, 10.0)]), 0, merge)
    store.apply(_daily(spark, [(1, "2024-01-01", 2, 20.0)]), 1, merge)
    rows = store.read(spark, SCD2_SCHEMA).collect()
    assert len(rows) == 1
    assert rows[0]["n_events"] == 2 and rows[0]["day_value"] == 20.0
