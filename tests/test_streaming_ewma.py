"""Streaming EWMA twin: stream==batch BIT-EXACT parity with users
sliced across wave boundaries (the order-dependent stateful part),
users skipping waves, single-event batches, retry idempotence under
the batch=<id> overwrite + as-of seed contract, and the writeStream
leg."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import timeseries as TS
from cloudfront_kinesis_log_lambda_spark.streaming.ewma import StreamingEWMA


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
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in TS.events_ewma(spark, "unused").collect()
    }


def _stream(spark, st):
    return {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in st.ewma(spark).collect()
    }


# rows: (event_id, user_id, value, seconds). User 1 spans all three
# waves (the seeded fold runs twice); user 2 appears in waves 0 and 2
# only (state survives an absent wave); user 3 lives in wave 1 alone
# (fresh fold, never seeded); user 4 has ONE event per wave (every
# batch is a single-element fold — the slice/seed edge case).
ROWS = [
    # wave 0: seconds 0..99
    (0, 1, 10.0, 0), (1, 1, 7.5, 10), (2, 2, 1.25, 20), (3, 2, 4.0, 30),
    (4, 4, 100.0, 40),
    # wave 1: seconds 100..199
    (5, 1, 3.125, 100), (6, 3, 2.5, 110), (7, 3, 0.5, 120),
    (8, 1, 9.0, 130), (9, 4, 50.0, 140),
    # wave 2: seconds 200..299
    (10, 1, 6.25, 200), (11, 2, 8.125, 210), (12, 4, 25.0, 220),
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
    st = StreamingEWMA(str(tmp_path))
    _drive(spark, st, df)
    got = _stream(spark, st)
    want = _batch(spark, df, monkeypatch)
    assert got == want  # exact equality: left-fold composition, no tol
    assert set(got) == {1, 2, 3, 4}
    assert got[1][0] == 5 and got[4][0] == 3


def test_order_dependence_is_real(spark, tmp_path, monkeypatch):
    """Negative control: EWMA is NOT commutative — replaying user 1's
    waves in the wrong order must give a different answer (this is what
    separates the twin from the OHLC merge laws and makes the as-of
    seed contract load-bearing)."""
    df = _events(spark, [r for r in ROWS if r[1] == 1])
    st = StreamingEWMA(str(tmp_path))
    # waves delivered 1, 0, 2 — violating the ordering contract;
    # batch ids must still INCREASE (2-retry semantics aside, the ids
    # identify delivery order for the as-of read)
    _drive(spark, st, df, waves=[WAVES[1], WAVES[0], WAVES[2]], ids=[0, 1, 2])
    got = _stream(spark, st)
    want = _batch(spark, df, monkeypatch)
    assert got[1] != want[1]


def test_retry_same_batch_is_idempotent(spark, tmp_path):
    df = _events(spark, ROWS)
    st = StreamingEWMA(str(tmp_path))
    _drive(spark, st, df)
    before = _stream(spark, st)
    # re-deliver wave 1 under its own batch id: the as-of seed must
    # recompute against the pre-batch state, not its own output
    _drive(spark, st, df, waves=[WAVES[1]], ids=[1])
    assert _stream(spark, st) == before


def test_single_event_batches_chain(spark, tmp_path, monkeypatch):
    """Every batch holds exactly one event for one user: the seeded
    fold reduces to one recursion step per batch; n accumulates."""
    rows = [(i, 7, float(2 ** (4 - i)), i * 10) for i in range(5)]
    df = _events(spark, rows)
    st = StreamingEWMA(str(tmp_path))
    _drive(
        spark, st, df, waves=[(i * 10, i * 10 + 10) for i in range(5)]
    )
    got = _stream(spark, st)
    want = _batch(spark, df, monkeypatch)
    assert got == want
    assert got[7][0] == 5


def test_writestream_leg(spark, tmp_path):
    """The callable runs under foreachBatch on a live stream with a
    user split across two micro-batches (files processed oldest-first
    via maxFilesPerTrigger=1 — the documented source order contract)."""
    import time

    src = tmp_path / "src"
    src.mkdir()
    df = _events(spark, ROWS)
    df.filter(F.col("event_id") <= 4).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "w0"))
    time.sleep(0.05)
    df.filter((F.col("event_id") > 4) & (F.col("event_id") <= 9)).coalesce(
        1
    ).write.mode("overwrite").parquet(str(src / "w1"))
    st = StreamingEWMA(str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(st).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = _stream(spark, st)
    # user 1 spans both micro-batches: 4 events total
    assert got[1][0] == 4
    # hand-computed fold: 10, 7.5, 3.125, 9 under alpha=0.3
    y = 10.0
    for x in (7.5, 3.125, 9.0):
        y = y * 0.7 + x * 0.3
    assert got[1][1] == round(y, 6)
