"""Streaming linear-trend twin: stream==batch exact parity (moment
sums commute), retry idempotence, and the writeStream leg."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import timeseries as TS
from cloudfront_kinesis_log_lambda_spark.streaming.lintrend import (
    StreamingLinearTrend,
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
        r["event_type"]: tuple(r)[1:]
        for r in TS.events_linear_trend(spark, "unused").collect()
    }


def _stream(spark, st):
    return {
        r["event_type"]: tuple(r)[1:] for r in st.trend(spark).collect()
    }


# type "a": clean upward drift over 6 hours split across waves;
# type "b": all events in ONE hour (den = 0 → slope/intercept NULL);
# type "c": constant value over hours (syc = 0 → r2 NULL).
ROWS = [
    (0, "a", 10.0, 0), (1, "a", 12.5, 3600), (2, "b", 4.25, 100),
    (3, "a", 14.0, 7200), (4, "b", 6.5, 1800), (5, "c", 3.0, 0),
    (6, "a", 17.5, 10800), (7, "c", 3.0, 3600),
    (8, "a", 19.0, 14400), (9, "a", 22.0, 18000), (10, "c", 3.0, 7200),
]
WAVES = [(0, 4000), (4000, 9000), (9000, 19000)]


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


def test_stream_equals_batch_exact(spark, tmp_path, monkeypatch):
    df = _events(spark, ROWS)
    st = StreamingLinearTrend(str(tmp_path))
    _drive(spark, st, df)
    got = _stream(spark, st)
    want = _batch(spark, df, monkeypatch)
    assert got == want
    # the drifting type really regressed: ~2.3/hour upward, high R²
    n, slope, intercept, r2 = got["a"]
    assert n == 6 and 2.0 < slope < 2.6 and r2 > 0.95
    # single-hour type: no x variance → NULL slope/intercept
    assert got["b"][1] is None and got["b"][2] is None
    # constant type: zero y variance → NULL r2, slope exactly 0
    assert got["c"][1] == 0.0 and got["c"][3] is None


def test_retry_same_batch_is_idempotent(spark, tmp_path):
    df = _events(spark, ROWS)
    st = StreamingLinearTrend(str(tmp_path))
    _drive(spark, st, df)
    before = _stream(spark, st)
    _drive(spark, st, df, waves=[WAVES[1]], ids=[1])
    assert _stream(spark, st) == before


def test_writestream_leg(spark, tmp_path, monkeypatch):
    import time

    src = tmp_path / "src"
    src.mkdir()
    df = _events(spark, ROWS)
    df.filter(F.col("event_id") <= 4).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "w0"))
    time.sleep(0.05)
    df.filter(F.col("event_id") > 4).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "w1"))
    st = StreamingLinearTrend(str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(st).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert _stream(spark, st) == _batch(spark, df, monkeypatch)
