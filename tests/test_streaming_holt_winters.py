"""Streaming Holt-Winters twin: stream==batch BIT-EXACT parity
including an HOUR SPLIT across a batch boundary (the open-bucket
decimal merge no other twin exercises), the n=0 never-closed-an-hour
state, retry idempotence, and the writeStream leg."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import timeseries as TS
from cloudfront_kinesis_log_lambda_spark.streaming.holt_winters import (
    StreamingHoltWinters,
)


def _events(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=s), 1, et, v, "{}")
            for (i, et, v, s) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _batch(spark, df, monkeypatch):
    monkeypatch.setattr(TS, "load", lambda s, sf, name: df)
    return {
        r["event_type"]: (
            r["n_buckets"], r["level"], r["trend"],
            r["season_next"], r["forecast"],
        )
        for r in TS.events_holt_winters(spark, "unused").collect()
    }


def _stream(spark, st):
    return {
        r["event_type"]: (
            r["n_buckets"], r["level"], r["trend"],
            r["season_next"], r["forecast"],
        )
        for r in st.holt_winters(spark).collect()
    }


# type "a": hours 0/1/2, with hour 1 SPLIT across waves 0 and 1 (its
# decimal partial must compose) and hour 0 closing only when hour 1
# appears; type "b": all events in ONE hour spread over two waves —
# the n=0 state (no hour ever closes) served via the init path.
ROWS = [
    (0, "a", 10.0, 0), (1, "a", 7.5, 600),          # hour 0
    (2, "b", 4.25, 100),
    (3, "a", 3.125, 3700),                            # hour 1, part 1
    (4, "a", 9.0, 4800), (5, "b", 6.5, 1800),        # hour 1, part 2
    (6, "a", 2.5, 7300), (7, "a", 0.5, 8000),        # hour 2
]
WAVES = [(0, 4500), (4500, 7200), (7200, 10800)]


def _drive(spark, st, df, waves=WAVES, ids=None):
    base = datetime.datetime(2024, 1, 1)
    for i, (lo, hi) in enumerate(waves):
        st(
            df.filter(
                (F.col("ts") >= base + datetime.timedelta(seconds=lo))
                & (F.col("ts") < base + datetime.timedelta(seconds=hi))
            ),
            ids[i] if ids else i,
        )


def test_stream_equals_batch_bit_exact(spark, tmp_path, monkeypatch):
    df = _events(spark, ROWS)
    st = StreamingHoltWinters(str(tmp_path))
    _drive(spark, st, df)
    got = _stream(spark, st)
    want = _batch(spark, df, monkeypatch)
    assert got == want
    # the split hour really composed: type a saw 3 buckets
    assert got["a"][0] == 3
    # the never-closed type is served through the init path: level is
    # the full single-bucket total, trend/season zero
    assert got["b"] == (1, 10.75, 0.0, 0.0, 10.75)


def test_retry_same_batch_is_idempotent(spark, tmp_path):
    df = _events(spark, ROWS)
    st = StreamingHoltWinters(str(tmp_path))
    _drive(spark, st, df)
    before = _stream(spark, st)
    _drive(spark, st, df, waves=[WAVES[1]], ids=[1])
    assert _stream(spark, st) == before


def test_writestream_leg(spark, tmp_path, monkeypatch):
    import time

    src = tmp_path / "src"
    src.mkdir()
    df = _events(spark, ROWS)
    df.filter(F.col("event_id") <= 3).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "w0"))
    time.sleep(0.05)
    df.filter(F.col("event_id") > 3).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "w1"))
    st = StreamingHoltWinters(str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(st).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert _stream(spark, st) == _batch(spark, df, monkeypatch)
