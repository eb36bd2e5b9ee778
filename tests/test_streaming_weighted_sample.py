"""Streaming incremental A-Res sampling: the top-k over stored
per-batch candidate sets must equal the batch sample bit-for-bit
(top-k merge law — every global top-k member is in its batch's
top-k), retries and re-delivery must be harmless (deterministic keys
+ distinct), and per-batch state must stay bounded by k."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.reshape import (
    doc_weighted_sample,
)
from cloudfront_kinesis_log_lambda_spark.streaming.weighted_sample import (
    StreamingWeightedSample,
)

SCHEMA = "doc_id long, n_chars long"
K = 10


def _rows():
    # weights 1..60 plus two zero-weight rows that must never appear
    return [(i, (i * 37) % 60 + 1) for i in range(60)] + [(100, 0), (101, 0)]


def _write_batch(dir_, name, rows, mtime):
    os.makedirs(dir_, exist_ok=True)
    path = os.path.join(dir_, name)
    with open(path, "w") as f:
        for i, w in rows:
            f.write(json.dumps({"doc_id": i, "n_chars": w}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def streamed(spark, tmp_path):
    rows = _rows()
    land = str(tmp_path / "docs")
    store = str(tmp_path / "ws")
    now = time.time()
    _write_batch(land, "b0.json", rows[:20], now - 30)
    _write_batch(land, "b1.json", rows[20:40], now - 20)
    _write_batch(land, "b2.json", rows[40:], now - 10)
    ws = StreamingWeightedSample(store, k=K)
    q = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(SCHEMA)
        .json(land)
        .writeStream.foreachBatch(ws)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return rows, ws


def _sample_rows(df):
    return [
        (r["doc_id"], r["n_chars"], r["sample_key"]) for r in df.collect()
    ]


def _batch_sample(spark, rows, tmp_path):
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    # the batch operator's fixed K is 50; re-select top-K for parity
    full = doc_weighted_sample(spark, str(tmp_path))
    return full.orderBy(
        F.col("sample_key").desc(), F.col("doc_id").asc()
    ).limit(K)


def test_stream_sample_equals_batch_sample_exactly(
    spark, streamed, tmp_path
):
    rows, ws = streamed
    batch = _batch_sample(spark, rows, tmp_path / "b")
    assert _sample_rows(ws.sample(spark)) == _sample_rows(batch)


def test_zero_weights_never_sampled(spark, streamed):
    _, ws = streamed
    ids = {r["doc_id"] for r in ws.sample(spark).collect()}
    assert not ids & {100, 101}


def test_retry_and_redelivery_cannot_change_the_sample(spark, streamed):
    rows, ws = streamed
    before = _sample_rows(ws.sample(spark))
    ws(spark.createDataFrame(rows[40:], SCHEMA), 2)  # retry, same id
    assert _sample_rows(ws.sample(spark)) == before
    # new batch id re-delivering old rows: deterministic keys →
    # duplicate candidate rows → distinct() collapses them
    ws(spark.createDataFrame(rows[:20], SCHEMA), 3)
    assert _sample_rows(ws.sample(spark)) == before


def test_per_batch_state_bounded_by_k(spark, streamed):
    _, ws = streamed
    for b in os.listdir(ws.candidates_dir):
        if not b.startswith("batch="):
            continue
        n = spark.read.parquet(os.path.join(ws.candidates_dir, b)).count()
        assert n <= K


def test_k_larger_than_corpus_returns_everything_weighted(spark, tmp_path):
    """k > positive-weight rows: the sample is simply all of them —
    the candidate union is the whole (keyed) corpus."""
    ws = StreamingWeightedSample(str(tmp_path / "s"), k=100)
    ws(spark.createDataFrame([(1, 5), (2, 9), (3, 0)], SCHEMA), 0)
    out = ws.sample(spark).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]
