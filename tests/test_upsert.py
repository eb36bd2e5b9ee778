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
    yet in place — must not drop the bucket's history: read() (which is
    READ-ONLY so it can race a live writer) serves the trash copy
    without touching the filesystem; the writer-side _recover() at the
    next apply() physically restores it."""
    import os
    import shutil

    merge = scd2_merge()
    store = BucketedUpsertStore(str(tmp_path / "s"), "user_id", n_buckets=2)
    store.apply(_daily(spark, [(u, "2024-01-01", 1, 1.0) for u in (1, 2, 3)]), 0, merge)
    before = _rows(store.read(spark, SCD2_SCHEMA))
    # simulate the crash: some bucket vanishes into a dot-trash dir
    b = next(e for e in os.listdir(store.path) if e.startswith("bucket="))
    live = os.path.join(store.path, b)
    os.rename(live, os.path.join(store.path, f".{b}.old-123"))
    assert _rows(store.read(spark, SCD2_SCHEMA)) == before  # trash fallback
    assert not os.path.isdir(live)  # ...without renaming anything
    store._recover()  # what the next apply() runs first
    assert os.path.isdir(live)  # physically restored
    assert _rows(store.read(spark, SCD2_SCHEMA)) == before
    # a crash AFTER the swap leaves a grace trash copy next to the live
    # dir: readers must prefer the live dir (no doubles), the writer's
    # next _recover sweeps it
    grace = os.path.join(store.path, f".{b}.old-456")
    shutil.copytree(live, grace)
    assert _rows(store.read(spark, SCD2_SCHEMA)) == before  # no doubles
    store._recover()
    assert not os.path.isdir(grace)  # swept by the writer, not readers


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


def test_nonidempotent_merge_is_never_double_applied(spark, tmp_path):
    """The exactly-once contract must hold for merges that are
    deterministic but NOT idempotent (additive counters): the _applied
    marker commits in the SAME rename as the bucket data, so no crash
    or retry ordering can apply a batch twice. A marker written after
    the swap (the pre-fix design) silently doubles these counters on a
    crash between rename and marker write."""
    schema = "user_id long, n long"

    def add_merge(current, incoming):
        return (
            current.unionByName(incoming)
            .groupBy("user_id", "bucket")
            .agg(F.sum("n").alias("n"))
            .select("user_id", "n", "bucket")
        )

    store = BucketedUpsertStore(str(tmp_path / "c"), "user_id", n_buckets=2)
    d0 = spark.createDataFrame([(1, 10), (2, 5)], schema)
    d1 = spark.createDataFrame([(1, 1), (2, 2)], schema)
    store.apply(d0, 0, add_merge)
    store.apply(d1, 1, add_merge)
    store.apply(d1, 1, add_merge)  # full-batch retry: must be a no-op
    assert _rows(store.read(spark, schema)) == [(1, 11), (2, 7)]
    # marker lives inside the bucket dir it describes (committed by the
    # same rename), never written separately afterwards
    import os

    for e in os.listdir(store.path):
        if e.startswith("bucket="):
            assert os.path.isfile(os.path.join(store.path, e, "_applied.json"))


def test_fold_rejects_keep_last_zero_and_legacy_layout(spark, tmp_path):
    """keep_last=0 would fold the current (retryable) batch beyond the
    reach of the exclude-current filter; a retired manifest-layout store
    must be refused, not misread (its crash states aren't decodable
    under pointer semantics)."""
    import json
    import os

    from cloudfront_kinesis_log_lambda_spark.streaming.store import (
        fold_batch_store,
        read_batch_store,
    )

    p = str(tmp_path / "s")
    os.makedirs(p)
    with pytest.raises(ValueError, match="keep_last"):
        fold_batch_store(spark, p, "x long", keep_last=0)
    with open(os.path.join(p, "_fold_manifest.json"), "w") as f:
        json.dump({"legacy": True}, f)
    with pytest.raises(ValueError, match="retired"):
        read_batch_store(spark, p, "x long", exclude_batch=0)


def test_read_retries_when_snapshot_tears(spark, tmp_path, monkeypatch):
    """A listdir snapshot that names a bucket dir which has since
    vanished (a swap's rename-away landing after the snapshot) must be
    RE-TAKEN, not resolved — resolving it would silently drop the
    bucket (r6 ADVICE + review finding). Simulate the tear by injecting
    a phantom live dir into the first snapshot only."""
    import os as _os

    store = BucketedUpsertStore(str(tmp_path / "s"), "user_id", n_buckets=4)
    batch = _daily(spark, [(1, "2024-01-01", 3, 1.0), (2, "2024-01-01", 5, 2.0)])
    store.apply(batch, 1, scd2_merge())
    real_listdir = _os.listdir
    calls = {"n": 0}

    def tearing_listdir(path="."):
        out = real_listdir(path)
        if _os.path.abspath(str(path)) == _os.path.abspath(store.path) and calls["n"] == 0:
            calls["n"] += 1
            return list(out) + ["bucket=99"]  # listed, but already gone
        return out

    monkeypatch.setattr(_os, "listdir", tearing_listdir)
    rows = store.read(spark, SCD2_SCHEMA).collect()
    assert calls["n"] == 1  # the torn snapshot was taken...
    assert {r["user_id"] for r in rows} == {1, 2}  # ...and re-taken cleanly


def test_read_raises_when_snapshot_never_settles(spark, tmp_path, monkeypatch):
    """If every snapshot keeps naming vanished dirs (writer swapping
    faster than read can list, or the store being deleted), read() must
    raise — never return a silently incomplete frame."""
    import os as _os

    store = BucketedUpsertStore(str(tmp_path / "s"), "user_id", n_buckets=4)
    store.apply(_daily(spark, [(1, "2024-01-01", 3, 1.0)]), 1, scd2_merge())
    real_listdir = _os.listdir

    def always_torn(path="."):
        out = real_listdir(path)
        if _os.path.abspath(str(path)) == _os.path.abspath(store.path):
            return list(out) + ["bucket=99"]
        return out

    monkeypatch.setattr(_os, "listdir", always_torn)
    with pytest.raises(RuntimeError, match="vanishing"):
        store.read(spark, SCD2_SCHEMA)


def test_read_retries_when_trash_only_bucket_vanishes(spark, tmp_path, monkeypatch):
    """The fallback path tears too: a trash-only bucket whose dir is
    swept (the writer's next apply) between snapshot and resolve must
    trigger a re-list — the fresh snapshot holds the bucket's new live
    dir (r6 review finding: the first retry loop guarded live dirs
    only)."""
    import os as _os

    store = BucketedUpsertStore(str(tmp_path / "s"), "user_id", n_buckets=4)
    store.apply(_daily(spark, [(1, "2024-01-01", 3, 1.0)]), 1, scd2_merge())
    real_listdir = _os.listdir
    calls = {"n": 0}
    # find a bucket that actually holds data
    [some_bucket] = [
        e for e in real_listdir(store.path) if e.startswith("bucket=")
    ][:1]

    def tearing_listdir(path="."):
        out = real_listdir(path)
        if _os.path.abspath(str(path)) == _os.path.abspath(store.path) and calls["n"] == 0:
            calls["n"] += 1
            # snapshot claims the bucket is mid-swap (trash-only) with a
            # trash dir that does not exist — the swept-trash tear
            out = [e for e in out if e != some_bucket]
            return out + [f".{some_bucket}.old-0"]
        return out

    monkeypatch.setattr(_os, "listdir", tearing_listdir)
    rows = store.read(spark, SCD2_SCHEMA).collect()
    assert calls["n"] == 1
    assert {r["user_id"] for r in rows} == {1}  # nothing silently dropped
