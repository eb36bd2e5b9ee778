"""Streaming Markov-transition twin: stream==batch parity with pairs
planted ACROSS wave boundaries (the stateful part), users skipping
waves, retry idempotence under the batch=<id> overwrite contract, and
the writeStream leg."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import timeseries as TS
from cloudfront_kinesis_log_lambda_spark.streaming.transitions import (
    StreamingTransitions,
)


def _events(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=s), u, et, 1.0, "{}")
            for (i, u, et, s) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _batch_matrix(spark, df, monkeypatch):
    monkeypatch.setattr(TS, "load", lambda s, sf, name: df)
    return {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in TS.event_transitions(spark, "unused").collect()
    }


def _stream_matrix(spark, st):
    return {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in st.transitions(spark).collect()
    }


# rows: user 1 alternates a/b across all three waves (every boundary
# produces a pair); user 2 appears in waves 0 and 2 ONLY (state must
# survive an absent wave); user 3 lives inside wave 1 alone.
ROWS = [
    # wave 0: seconds 0..99
    (0, 1, "a", 0), (1, 1, "b", 10), (2, 2, "x", 20), (3, 2, "y", 30),
    # wave 1: seconds 100..199
    (4, 1, "a", 100), (5, 3, "p", 110), (6, 3, "q", 120), (7, 1, "b", 130),
    # wave 2: seconds 200..299
    (8, 1, "a", 200), (9, 2, "x", 210),
]
WAVES = [(0, 100), (100, 200), (200, 300)]


def _drive(spark, st, df, waves=WAVES, ids=None):
    for i, (lo, hi) in enumerate(waves):
        bid = ids[i] if ids else i
        st(
            df.filter(
                (F.col("ts") >= datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(seconds=lo))
                & (F.col("ts") < datetime.datetime(2024, 1, 1)
                   + datetime.timedelta(seconds=hi))
            ),
            bid,
        )


def test_stream_equals_batch_with_boundary_pairs(spark, tmp_path, monkeypatch):
    df = _events(spark, ROWS)
    st = StreamingTransitions(str(tmp_path))
    _drive(spark, st, df)
    got = _stream_matrix(spark, st)
    want = _batch_matrix(spark, df, monkeypatch)
    assert got == want
    # the cross-wave pairs really exist: b->a (wave0→1 for user 1),
    # y->x (user 2 skipping wave 1), b->a again (wave1→2)
    assert got[("b", "a")][0] == 2
    assert got[("y", "x")][0] == 1


def test_dropping_state_loses_exactly_boundary_pairs(spark, tmp_path, monkeypatch):
    """Negative control: a stateless rerun (fresh store per wave) must
    miss precisely the boundary pairs — proving the state store is
    load-bearing, not decorative."""
    import shutil

    df = _events(spark, ROWS)
    total = sum(
        n for (n, _) in _batch_matrix(spark, df, monkeypatch).values()
    )
    stateless_pairs = 0
    for i, (lo, hi) in enumerate(WAVES):
        root = str(tmp_path / f"w{i}")
        st = StreamingTransitions(root)
        _drive(spark, st, df, waves=[(lo, hi)], ids=[0])
        stateless_pairs += sum(
            r["n"] for r in st.transitions(spark).collect()
        )
        shutil.rmtree(root)
    # boundary pairs: u1 w0→1, u1 w1→2, u2 w0→2 = 3
    assert total - stateless_pairs == 3


def test_retry_same_batch_is_idempotent(spark, tmp_path):
    df = _events(spark, ROWS)
    st = StreamingTransitions(str(tmp_path))
    _drive(spark, st, df)
    before = _stream_matrix(spark, st)
    # re-deliver wave 1 under its own batch id (the retry contract)
    _drive(spark, st, df, waves=[WAVES[1]], ids=[1])
    assert _stream_matrix(spark, st) == before


def test_state_argmax_per_user(spark, tmp_path):
    df = _events(spark, ROWS)
    st = StreamingTransitions(str(tmp_path))
    _drive(spark, st, df)
    state = {r["user_id"]: r for r in st.state(spark).collect()}
    assert state[1]["last_type"] == "a" and state[1]["last_id"] == 8
    assert state[2]["last_type"] == "x" and state[2]["last_id"] == 9
    assert state[3]["last_type"] == "q"


def test_writestream_leg(spark, tmp_path):
    """The callable really runs under foreachBatch on a live stream,
    with the boundary pair forming across two micro-batches. Each wave
    is ONE file written oldest-first (maxFilesPerTrigger=1 processes by
    mod time) — per-user event-time order across batches is the
    documented source contract."""
    import time

    src = tmp_path / "src"
    src.mkdir()
    df = _events(spark, ROWS)
    df.filter(F.col("event_id") <= 2).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "w0"))
    time.sleep(0.05)
    df.filter(F.col("event_id") == 3).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "w1"))
    st = StreamingTransitions(str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(st).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = _stream_matrix(spark, st)
    assert got[("a", "b")][0] == 1   # within wave 0
    assert got[("x", "y")][0] == 1   # boundary: x in wave 0, y in wave 1
