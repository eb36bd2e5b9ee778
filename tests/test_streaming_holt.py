"""Streaming Holt twin: stream==batch BIT-EXACT parity including the
two-point init split across a batch boundary (the n=1 state case no
other twin exercises), retry idempotence, and the writeStream leg."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import timeseries as TS
from cloudfront_kinesis_log_lambda_spark.streaming.holt import StreamingHolt


def _events(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=s), u, "t", v, "{}")
            for (i, u, v, s) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _batch(spark, df, monkeypatch):
    monkeypatch.setattr(TS, "load", lambda s, sf, name: df)
    return {
        r["user_id"]: (r["n_events"], r["level"], r["trend"], r["forecast"])
        for r in TS.events_holt(spark, "unused").collect()
    }


def _stream(spark, st):
    return {
        r["user_id"]: (r["n_events"], r["level"], r["trend"], r["forecast"])
        for r in st.holt(spark).collect()
    }


# user 1 spans all waves; user 2 has exactly ONE event in wave 0 (the
# stored n=1 state: the init step b = x1 - x0 must fire across the
# batch boundary); user 3 lives in one wave; user 4 stays single-event.
ROWS = [
    (0, 1, 10.0, 0), (1, 1, 7.5, 10), (2, 2, 4.0, 20), (3, 4, 9.0, 30),
    (4, 1, 3.125, 100), (5, 3, 2.5, 110), (6, 3, 0.5, 120),
    (7, 2, 6.0, 130),
    (8, 1, 9.0, 200), (9, 2, 8.125, 210),
]
WAVES = [(0, 100), (100, 200), (200, 300)]


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
    st = StreamingHolt(str(tmp_path))
    _drive(spark, st, df)
    got = _stream(spark, st)
    want = _batch(spark, df, monkeypatch)
    assert got == want
    # the boundary-init user really initialized: trend = x1 - x0 folded on
    assert got[2][0] == 3
    # the single-event user stayed in init state
    assert got[4] == (1, 9.0, 0.0, 9.0)


def test_retry_same_batch_is_idempotent(spark, tmp_path):
    df = _events(spark, ROWS)
    st = StreamingHolt(str(tmp_path))
    _drive(spark, st, df)
    before = _stream(spark, st)
    _drive(spark, st, df, waves=[WAVES[1]], ids=[1])
    assert _stream(spark, st) == before


def test_writestream_leg(spark, tmp_path):
    import time

    src = tmp_path / "src"
    src.mkdir()
    df = _events(spark, ROWS)
    df.filter(F.col("event_id") <= 3).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "w0"))
    time.sleep(0.05)
    df.filter((F.col("event_id") > 3) & (F.col("event_id") <= 7)).coalesce(
        1
    ).write.mode("overwrite").parquet(str(src / "w1"))
    st = StreamingHolt(str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(st).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = _stream(spark, st)
    # user 1: 10, 7.5, 3.125 across the two micro-batches
    a, b_ = TS.HOLT_ALPHA, TS.HOLT_BETA
    l, b = 7.5, -2.5
    nl = a * 3.125 + (1 - a) * (l + b)
    b = b_ * (nl - l) + (1 - b_) * b
    assert got[1] == (3, round(nl, 6), round(b, 6), round(nl + b, 6))
