"""Streaming incremental DDSketch: the SUM-merged histogram over
micro-batches must equal the batch histogram bit-for-bit, so quantile
reads match the batch sketch exactly; retries idempotent via
batch=<id> overwrite; per-batch state bounded by the bucket range."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import sketch as SK
from cloudfront_kinesis_log_lambda_spark.streaming.ddsketch import (
    StreamingDDSketch,
)

SCHEMA = "event_type string, value double"


def _rows():
    # two groups, heavy-tailed values, plus non-positive values that
    # must be excluded (the DDSketch positive-store contract)
    vals = [0.01 * (1.18 ** i) for i in range(60)]
    rows = [("click", v) for v in vals] + [("view", v * 3.7) for v in vals]
    return rows + [("click", 0.0), ("view", -1.5)]


def _write_batch(dir_, name, rows, mtime):
    os.makedirs(dir_, exist_ok=True)
    path = os.path.join(dir_, name)
    with open(path, "w") as f:
        for et, v in rows:
            f.write(json.dumps({"event_type": et, "value": v}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def streamed(spark, tmp_path):
    rows = _rows()
    land = str(tmp_path / "events")
    store = str(tmp_path / "dd")
    now = time.time()
    _write_batch(land, "b0.json", rows[:40], now - 30)
    _write_batch(land, "b1.json", rows[40:90], now - 20)
    _write_batch(land, "b2.json", rows[90:], now - 10)
    dd = StreamingDDSketch(store, ["event_type"])
    q = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(SCHEMA)
        .json(land)
        .writeStream.foreachBatch(dd)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return rows, dd


def _q(df):
    return sorted(
        (r["event_type"], r["n_values"], r["p50"], r["p95"], r["p99"])
        for r in df.collect()
    )


def _batch_quantiles(spark, rows, tmp_path):
    d = str(tmp_path / "bt")
    full = spark.createDataFrame(
        [(i, "2026-01-01 00:00:00", et, v) for i, (et, v) in enumerate(rows)],
        "event_id long, ts string, event_type string, value double",
    ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type", "value")
    full.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return SK.events_value_ddsketch(spark, d)


def test_stream_quantiles_equal_batch_sketch_exactly(spark, streamed, tmp_path):
    rows, dd = streamed
    assert _q(dd.quantiles(spark)) == _q(_batch_quantiles(spark, rows, tmp_path))


def test_nonpositive_values_excluded(spark, streamed):
    rows, dd = streamed
    n_pos = sum(1 for _, v in rows if v > 0)
    got = {r["event_type"]: r["n_values"] for r in dd.quantiles(spark).collect()}
    assert sum(got.values()) == n_pos


def test_retry_is_idempotent(spark, streamed):
    rows, dd = streamed
    before = _q(dd.quantiles(spark))
    dd(spark.createDataFrame(rows[90:], SCHEMA), 2)  # same batch id
    assert _q(dd.quantiles(spark)) == before
    # SUM store: a NEW batch id re-delivering old rows must move counts
    dd(spark.createDataFrame(rows[:5], SCHEMA), 3)
    assert _q(dd.quantiles(spark)) != before


def test_per_batch_state_is_bounded_by_buckets(spark, streamed):
    _, dd = streamed
    for b in os.listdir(dd.hist_dir):
        if not b.startswith("batch="):
            continue
        n = spark.read.parquet(os.path.join(dd.hist_dir, b)).count()
        # 2 groups × the log-γ bucket span of the value range
        assert n <= 2 * 1500


def test_nonstring_group_ddl(spark, tmp_path):
    dd = StreamingDDSketch(
        str(tmp_path / "d"), ["day"], group_ddl="day date"
    )
    df = spark.createDataFrame(
        [("2026-02-01", 10.0), ("2026-02-01", 20.0)], "day string, value double"
    ).select(F.to_date("day").alias("day"), "value")
    dd(df, 0)
    out = dd.quantiles(spark).collect()
    assert len(out) == 1 and out[0]["n_values"] == 2
