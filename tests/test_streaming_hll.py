"""Streaming incremental HLL: the register store accumulated over
micro-batches must estimate BIT-IDENTICALLY to the batch sketch over
the union of arrived rows (merge law — an equality contract, not a
tolerance band), including keys repeating across batches; batch=<id>
overwrite + MAX-idempotence make retries and even double-merges
harmless."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import sketch as SK
from cloudfront_kinesis_log_lambda_spark.streaming.hll import StreamingHLL

SCHEMA = "event_type string, user_id long"


def _rows(ids_by_type):
    out = []
    for et, ids in ids_by_type.items():
        out += [(et, i) for i in ids]
    return out


def _write_batch(dir_, name, rows, mtime):
    os.makedirs(dir_, exist_ok=True)
    path = os.path.join(dir_, name)
    with open(path, "w") as f:
        for et, uid in rows:
            f.write(json.dumps({"event_type": et, "user_id": uid}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def streamed(spark, tmp_path):
    land = str(tmp_path / "events")
    store = str(tmp_path / "hll")
    now = time.time()
    # user 7 appears in every batch (cross-batch repeat must not
    # inflate); batch 2 adds a NULL key (excluded) and a new type
    b0 = _rows({"view": range(0, 40), "click": range(0, 10)})
    b1 = _rows({"view": range(30, 80), "click": [7]})
    b2 = _rows({"view": [7], "signup": range(0, 5)}) + [("view", None)]
    _write_batch(land, "b0.json", b0, now - 30)
    _write_batch(land, "b1.json", b1, now - 20)
    _write_batch(land, "b2.json", b2, now - 10)
    sk = StreamingHLL(store, ["event_type"], "user_id")
    q = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(SCHEMA)
        .json(land)
        .writeStream.foreachBatch(sk)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return b0 + b1 + b2, store, sk


def _est(df):
    return sorted(
        (r["event_type"], r["n_registers"], r["v_zero"], r["approx_distinct"])
        for r in df.collect()
    )


def test_stream_estimate_equals_batch_sketch_exactly(spark, streamed):
    rows, _, sk = streamed
    full = spark.createDataFrame(rows, SCHEMA)
    batch = SK.hll_estimate(
        SK.hll_registers(full, ["event_type"], "user_id"), ["event_type"]
    )
    assert _est(sk.estimate(spark)) == _est(batch)


def test_estimate_tracks_exact_counts(spark, streamed):
    rows, _, sk = streamed
    exact = {}
    for et, uid in rows:
        if uid is not None:
            exact.setdefault(et, set()).add(uid)
    est = {r["event_type"]: r["approx_distinct"] for r in sk.estimate(spark).collect()}
    assert set(est) == set(exact)  # NULL-only groups would be absent
    for et, ids in exact.items():
        # linear-counting regime at these cardinalities: tight
        assert abs(est[et] - len(ids)) <= max(2.0, 0.15 * len(ids)), (
            et, est[et], len(ids),
        )


def test_retry_and_double_merge_are_harmless(spark, streamed):
    rows, _, sk = streamed
    before = _est(sk.estimate(spark))
    # retried micro-batch: same batch_id → overwrite, no change
    last = [(et, uid) for et, uid in rows if et == "signup" or uid == 7]
    sk(spark.createDataFrame(last, SCHEMA), 2)
    assert _est(sk.estimate(spark)) == before
    # MAX-idempotence: even re-delivering old rows under a NEW batch id
    # (at-least-once delivery) cannot move any estimate
    sk(spark.createDataFrame(rows[:20], SCHEMA), 3)
    assert _est(sk.estimate(spark)) == before


def test_per_batch_state_is_bounded_by_registers(spark, streamed):
    _, store, sk = streamed
    for b in os.listdir(os.path.join(store, "registers")):
        if not b.startswith("batch="):
            continue
        n = spark.read.parquet(os.path.join(store, "registers", b)).count()
        assert n <= 3 * SK.HLL_M  # ≤ groups × m, never batch row count


def test_nonstring_group_ddl(spark, tmp_path):
    sk = StreamingHLL(
        str(tmp_path / "h"), ["day"], "k", group_ddl="day date"
    )
    df = spark.createDataFrame([("2026-01-01", 5)], "day string, k long").select(
        F.to_date("day").alias("day"), "k"
    )
    sk(df, 0)
    est = sk.estimate(spark).collect()
    assert len(est) == 1 and est[0]["n_registers"] == 1


def test_empty_batch_write_is_harmless(spark, streamed):
    """A wave whose filter matches nothing writes an empty batch=<id>
    partition; the merged read and every estimate must be unaffected."""
    _, _, sk = streamed
    before = _est(sk.estimate(spark))
    sk(spark.createDataFrame([], SCHEMA), 7)
    assert _est(sk.estimate(spark)) == before
