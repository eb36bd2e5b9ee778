"""Streaming per-source admission quota: first-come admission over
micro-batches must EXACTLY match source_quota(priority='arrival') on
the full corpus for doc_id-ordered arrival (admission is deterministic
— equality contract, not recall), with sources filling up ACROSS
batches; batch=<id> overwrites make retries idempotent."""

from __future__ import annotations

import json
import os
import time

import pytest

from cloudfront_kinesis_log_lambda_spark.operators.corpus import source_quota
from cloudfront_kinesis_log_lambda_spark.streaming.quota import (
    StreamingSourceQuota,
    admission_log,
)

DOC_SCHEMA = "doc_id long, text string, source string"
CAP = 3


def _corpus():
    # src0: 5 docs spread over batches (fills up mid-batch-1)
    # src1: 4 docs, the 4th arriving alone in batch 2 (over cap)
    # src2: 2 docs (never fills)
    rows = [
        (1, "a", "src0"), (2, "b", "src1"), (3, "c", "src0"),
        (4, "d", "src2"), (5, "e", "src1"),
        (6, "f", "src0"), (7, "g", "src0"), (8, "h", "src1"),
        (9, "i", "src2"),
        (10, "j", "src0"), (11, "k", "src1"),
    ]
    batches = [rows[:5], rows[5:9], rows[9:]]
    return rows, batches


def _write_batch(dir_, name, rows, mtime):
    os.makedirs(dir_, exist_ok=True)
    path = os.path.join(dir_, name)
    with open(path, "w") as f:
        for d, t, s in rows:
            f.write(json.dumps({"doc_id": d, "text": t, "source": s}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def streamed(spark, tmp_path):
    rows, batches = _corpus()
    land = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    out = str(tmp_path / "admit")
    now = time.time()
    for i, b in enumerate(batches):
        _write_batch(land, f"b{i}.json", b, now - 30 + 10 * i)
    gate = StreamingSourceQuota(store, out, cap=CAP)
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(DOC_SCHEMA)
        .json(land)
    )
    q = stream.writeStream.foreachBatch(gate).start()
    q.processAllAvailable()
    q.stop()
    return rows, batches, out, gate


def test_stream_matches_batch_arrival_quota(spark, streamed):
    rows, _, out, _ = streamed
    full = spark.createDataFrame(
        [(d, t, "en", s, len(t)) for d, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    batch_kept = {
        r["doc_id"]
        for r in source_quota(full, cap=CAP, priority="arrival").collect()
        if r["kept"] == 1
    }
    log = admission_log(spark, out).collect()
    stream_admitted = {r["doc_id"] for r in log if r["admitted"] == 1}
    assert stream_admitted == batch_kept
    assert len(log) == len(rows)  # every doc got a decision row


def test_sources_fill_up_across_batches(spark, streamed):
    _, _, out, _ = streamed
    got = {r["doc_id"]: r["admitted"] for r in admission_log(spark, out).collect()}
    # src0 arrivals: 1,3 (batch 0), 6,7 (batch 1), 10 (batch 2) — cap 3
    assert [got[i] for i in (1, 3, 6, 7, 10)] == [1, 1, 1, 0, 0]
    # src1 fills on its 4th arrival, which lands in the LAST batch
    assert [got[i] for i in (2, 5, 8, 11)] == [1, 1, 1, 0]
    # src2 never fills
    assert [got[i] for i in (4, 9)] == [1, 1]


def test_retry_of_last_batch_is_idempotent(spark, streamed):
    _, batches, out, gate = streamed
    before = sorted(
        (r["doc_id"], r["admitted"]) for r in admission_log(spark, out).collect()
    )
    retry_df = spark.createDataFrame(batches[2], "doc_id long, text string, source string")
    gate(retry_df, 2)  # same batch_id → overwrite, counts not double-added
    after = sorted(
        (r["doc_id"], r["admitted"]) for r in admission_log(spark, out).collect()
    )
    assert after == before
