"""Streaming incremental Count-Min: the SUM-merged counter matrix over
micro-batches must equal the batch matrix bit-for-bit (sum-merge law),
probes must reproduce the batch query's estimates exactly, retries must
be idempotent via batch=<id> overwrite — and, unlike the HLL store,
re-delivery under a NEW batch id MUST over-count (SUM is not
idempotent), pinning why the exclude-current-batch contract is
load-bearing for sum-based stores."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import sketch as SK
from cloudfront_kinesis_log_lambda_spark.streaming.countmin import (
    StreamingCountMin,
)

SCHEMA = "doc_id long, text string"
DOCS = [
    (0, "spark spark stream batch"),
    (1, "spark batch batch"),
    (2, "stream merge law spark"),
    (3, "law law law spark batch"),
    (4, "merge"),
    (5, ""),
]


def _write_batch(dir_, name, rows, mtime):
    os.makedirs(dir_, exist_ok=True)
    path = os.path.join(dir_, name)
    with open(path, "w") as f:
        for i, t in rows:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def streamed(spark, tmp_path):
    land = str(tmp_path / "docs")
    store = str(tmp_path / "cms")
    now = time.time()
    _write_batch(land, "b0.json", DOCS[:2], now - 30)
    _write_batch(land, "b1.json", DOCS[2:4], now - 20)
    _write_batch(land, "b2.json", DOCS[4:], now - 10)
    cms = StreamingCountMin(store)
    q = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(SCHEMA)
        .json(land)
        .writeStream.foreachBatch(cms)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return cms


def _batch_counters(spark):
    full = spark.createDataFrame(DOCS, SCHEMA)
    return (
        full.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.explode(SK.cms_cells_expr("word")).alias("c"), "n")
        .groupBy(F.col("c.r").alias("r"), F.col("c.col").alias("col"))
        .agg(F.sum("n").cast("long").alias("cell_n"))
    )


def _cells(df):
    return sorted((r["r"], r["col"], r["cell_n"]) for r in df.collect())


def test_stream_counters_equal_batch_matrix(spark, streamed):
    assert _cells(streamed.counters(spark)) == _cells(_batch_counters(spark))


def test_probe_estimates_exact_on_this_vocab(spark, streamed):
    words = spark.createDataFrame(
        [("spark",), ("batch",), ("law",), ("merge",), ("stream",)],
        "word string",
    )
    got = {r["word"]: r["cms_est"] for r in streamed.probe(words).collect()}
    assert got == {"spark": 5, "batch": 4, "law": 4, "merge": 2, "stream": 2}


def test_retry_is_idempotent_but_redelivery_overcounts(spark, streamed):
    before = _cells(streamed.counters(spark))
    last = spark.createDataFrame(DOCS[4:], SCHEMA)
    streamed(last, 2)  # same batch id → overwrite, no change
    assert _cells(streamed.counters(spark)) == before
    # SUM is NOT idempotent: a new batch id re-delivering old rows must
    # move the counters — the behavioral line between this store and
    # the MAX-merged HLL one
    streamed(spark.createDataFrame(DOCS[:1], SCHEMA), 3)
    assert _cells(streamed.counters(spark)) != before


def test_per_batch_state_bounded_by_matrix_size(spark, streamed):
    for b in os.listdir(streamed.counters_dir):
        if not b.startswith("batch="):
            continue
        n = spark.read.parquet(os.path.join(streamed.counters_dir, b)).count()
        assert n <= SK.CMS_DEPTH * SK.CMS_WIDTH


def test_probe_unseen_word_estimates_zero_not_dropped(spark, streamed):
    """r6 review finding: only incremented cells exist in the store, so
    an inner join dropped never-seen words entirely (or, worse, took
    the MIN over only the colliding subset of cells, inventing a
    positive count). The CMS answer for an unseen word is 0."""
    words = spark.createDataFrame(
        [("spark",), ("neverseenword",), ("alsounseen",)], "word string"
    )
    got = {r["word"]: r["cms_est"] for r in streamed.probe(words).collect()}
    assert got["spark"] == 5
    assert got["neverseenword"] == 0
    assert got["alsounseen"] == 0


def test_probe_rejects_reserved_column_names(spark, streamed):
    """r6 advice: the probe joins/aggregates on generated columns
    (r, col, cell_n, cms_est); a probe input already carrying one of
    those would silently corrupt every estimate. The contract is a
    loud ValueError, matching the as-of / stream-stream guards."""
    import pytest

    bad = spark.createDataFrame([("spark", 1)], "word string, col int")
    with pytest.raises(ValueError, match="reserved"):
        streamed.probe(bad)
    bad2 = spark.createDataFrame([("spark", 1)], "word string, cms_est int")
    with pytest.raises(ValueError, match="reserved"):
        streamed.probe(bad2)
