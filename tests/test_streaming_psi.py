"""Streaming PSI: the accumulated bin-count store must score
BIT-IDENTICALLY to the batch operator over the union of arrived rows
(SUM-merge law against a frozen reference geometry), including types
split across batches, retry re-writes under the same batch id, and
the writeStream-driven leg."""

from __future__ import annotations

import datetime
import json
import os
import time

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import quality as Q
from cloudfront_kinesis_log_lambda_spark.streaming.psi import StreamingPSI

SPLIT = datetime.datetime(2024, 1, 16)
REF_TS = "2024-01-10T00:00:00"
CUR_TS = "2024-01-20T00:00:00"

SCHEMA = "event_type string, ts timestamp, value double"


def _df(spark, rows):
    return spark.createDataFrame(
        [(t, datetime.datetime.fromisoformat(ts), v) for t, ts, v in rows],
        SCHEMA,
    )


def _batch_psi(spark, rows):
    df = _df(spark, rows)
    stats = Q.psi_ref_stats(
        df.filter(F.col("ts") < F.lit(SPLIT)), "event_type", "value"
    )
    return Q.psi_from_counts(Q.psi_bin_counts(df, stats, SPLIT), stats)


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("event_type").collect()]


WAVES = [
    # wave 0: type a reference only
    [("a", REF_TS, float(v)) for v in range(20)],
    # wave 1: type a current (drifts high) + type b reference
    [("a", CUR_TS, 19.0)] * 10 + [("b", REF_TS, float(v)) for v in range(10)],
    # wave 2: stragglers for both types and both windows
    [("a", REF_TS, 3.0), ("a", CUR_TS, 0.5), ("b", CUR_TS, 2.0)],
]


def test_stream_equals_batch_across_waves(spark, tmp_path):
    mon = StreamingPSI(str(tmp_path / "psi"), split=SPLIT)
    all_rows = [r for w in WAVES for r in w]
    mon.freeze_reference(
        _df(spark, [r for r in all_rows if r[1] == REF_TS])
    )
    for i, wave in enumerate(WAVES):
        mon(_df(spark, wave), i)
        arrived = [r for w in WAVES[: i + 1] for r in w]
        got = _sorted_rows(mon.psi(spark))
        # batch twin over arrived rows, binned against the SAME frozen
        # full-reference geometry (the monitor's contract: geometry
        # from the reference dataset, counts from what has arrived)
        stats = Q.psi_ref_stats(
            _df(spark, [r for r in all_rows if r[1] == REF_TS]),
            "event_type",
            "value",
        )
        want = _sorted_rows(
            Q.psi_from_counts(
                Q.psi_bin_counts(_df(spark, arrived), stats, SPLIT), stats
            )
        )
        assert got == want, f"divergence after wave {i}"


def test_final_psi_matches_single_batch_operator(spark, tmp_path):
    """After all waves the monitor must equal the pure batch operator
    run once over everything (geometry frozen from the same full
    reference window)."""
    mon = StreamingPSI(str(tmp_path / "psi"), split=SPLIT)
    all_rows = [r for w in WAVES for r in w]
    mon.freeze_reference(_df(spark, [r for r in all_rows if r[1] == REF_TS]))
    for i, wave in enumerate(WAVES):
        mon(_df(spark, wave), i)
    assert _sorted_rows(mon.psi(spark)) == _sorted_rows(
        _batch_psi(spark, all_rows)
    )
    # and the planted drift actually registers
    by_type = {r[0]: r for r in _sorted_rows(mon.psi(spark))}
    assert by_type["a"][3] > 0.2  # psi column


def test_retry_rewrite_is_idempotent(spark, tmp_path):
    mon = StreamingPSI(str(tmp_path / "psi"), split=SPLIT)
    mon.freeze_reference(_df(spark, WAVES[0]))
    mon(_df(spark, WAVES[0]), 0)
    once = _sorted_rows(mon.psi(spark))
    # same batch id re-delivered (writer crash before commit): the
    # batch=<id> overwrite must leave the store unchanged
    mon(_df(spark, WAVES[0]), 0)
    assert _sorted_rows(mon.psi(spark)) == once
    # but a NEW batch id with the same rows double-counts — SUM is not
    # idempotent; exactly-once relies on stable batch ids
    mon(_df(spark, WAVES[0]), 1)
    assert _sorted_rows(mon.psi(spark)) != once


def test_refreeze_refused(spark, tmp_path):
    mon = StreamingPSI(str(tmp_path / "psi"), split=SPLIT)
    mon.freeze_reference(_df(spark, WAVES[0]))
    with pytest.raises(Exception):
        mon.freeze_reference(_df(spark, WAVES[0]))


def test_writestream_driven(spark, tmp_path):
    """The real writeStream path: JSON files land, foreachBatch feeds
    the monitor, psi-on-read equals the batch operator."""
    land = str(tmp_path / "land")
    os.makedirs(land)
    now = time.time()
    for i, wave in enumerate(WAVES):
        with open(os.path.join(land, f"b{i}.json"), "w") as f:
            for t, ts, v in wave:
                f.write(
                    json.dumps(
                        {"event_type": t, "ts": ts, "value": v}
                    )
                    + "\n"
                )
        os.utime(os.path.join(land, f"b{i}.json"), (now - 30 + i, now - 30 + i))
    mon = StreamingPSI(str(tmp_path / "psi"), split=SPLIT)
    all_rows = [r for w in WAVES for r in w]
    mon.freeze_reference(_df(spark, [r for r in all_rows if r[1] == REF_TS]))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(land)
    )
    q = stream.writeStream.foreachBatch(mon).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    assert _sorted_rows(mon.psi(spark)) == _sorted_rows(
        _batch_psi(spark, all_rows)
    )
