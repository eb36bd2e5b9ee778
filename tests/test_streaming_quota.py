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


# --- StreamingMixture (token-budget admission) ------------------------------


def _mix_corpus():
    # src0 budget 400 (k%4=0): docs of 150 tokens → 2 admitted, rest out
    # src1 budget 450: docs of 100 tokens → 4 admitted
    rows = []
    doc_id = 1
    for s, tok, n in ((0, 150, 4), (1, 100, 6)):
        for _ in range(n):
            rows.append((doc_id, ("tok " * tok).strip(), f"src{s}"))
            doc_id += 1
    return rows


@pytest.fixture()
def mix_streamed(spark, tmp_path):
    from cloudfront_kinesis_log_lambda_spark.streaming.quota import (
        StreamingMixture,
    )

    rows = _mix_corpus()
    land = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    out = str(tmp_path / "mix")
    now = time.time()
    third = len(rows) // 3
    _write_batch(land, "b0.json", rows[:third], now - 30)
    _write_batch(land, "b1.json", rows[third : 2 * third], now - 20)
    _write_batch(land, "b2.json", rows[2 * third :], now - 10)
    gate = StreamingMixture(store, out)
    q = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(DOC_SCHEMA)
        .json(land)
        .writeStream.foreachBatch(gate)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return rows, store, out, gate


def test_streaming_mixture_matches_batch_operator(spark, mix_streamed):
    from cloudfront_kinesis_log_lambda_spark.operators.corpus import (
        mixture_sample,
    )
    from cloudfront_kinesis_log_lambda_spark.streaming.quota import mixture_log

    rows, _, out, _ = mix_streamed
    full = spark.createDataFrame(
        [(d, t, "en", s, len(t)) for d, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    batch = sorted(
        (r["doc_id"], r["source"], r["n_tokens"], r["cum_tokens"], r["budget"])
        for r in mixture_sample(full).collect()
    )
    log = mixture_log(spark, out)
    stream = sorted(
        (r["doc_id"], r["source"], r["n_tokens"], r["cum_tokens"], r["budget"])
        for r in log.collect()
        if r["admitted"] == 1
    )
    assert stream == batch
    assert log.count() == len(rows)  # every doc decided
    # skipped docs still consumed budget: src0's later docs stay out
    assert any(r[1] == "src0" for r in batch) and len(
        [r for r in batch if r[1] == "src0"]
    ) == 2


def test_fold_batch_store_preserves_admissions(spark, mix_streamed):
    from cloudfront_kinesis_log_lambda_spark.streaming.quota import (
        _TOKENS_SCHEMA,
        mixture_log,
    )
    from cloudfront_kinesis_log_lambda_spark.streaming.store import (
        fold_batch_store,
        read_batch_store,
    )

    rows, store, out, gate = mix_streamed
    counts = os.path.join(store, "token_counts")
    before = sorted(
        map(tuple, read_batch_store(spark, counts, _TOKENS_SCHEMA, -1).collect())
    )
    n = fold_batch_store(spark, counts, _TOKENS_SCHEMA, keep_last=1)
    assert n == 2  # batches 0,1 folded; latest kept for retry safety
    after = sorted(
        map(tuple, read_batch_store(spark, counts, _TOKENS_SCHEMA, -1).collect())
    )
    assert after == before
    # a retry of the last batch AFTER folding still lands identically
    decisions = sorted(
        (r["doc_id"], r["admitted"]) for r in mixture_log(spark, out).collect()
    )
    third = len(rows) // 3
    retry_df = spark.createDataFrame(rows[2 * third :], DOC_SCHEMA)
    gate(retry_df, 2)
    assert (
        sorted((r["doc_id"], r["admitted"]) for r in mixture_log(spark, out).collect())
        == decisions
    )


def test_fold_crash_recovery_no_loss_no_double_count(spark, mix_streamed):
    """Generational-pointer fold: every crash point and reader
    interleaving must neither lose nor double-count rows.

    (a) a fold that crashed BEFORE the pointer flip leaves an orphan
        _fold-<g> dir: readers ignore it (pointer unreferenced), the
        next fold sweeps it;
    (b) a fold that crashed AFTER the flip but before the delta deletes
        leaves absorbed delta dirs on disk: readers exclude them via
        the pointer's folded list — no double count."""
    import json

    from cloudfront_kinesis_log_lambda_spark.streaming.quota import (
        _TOKENS_SCHEMA,
    )
    from cloudfront_kinesis_log_lambda_spark.streaming import store as S

    rows, store, out, gate = mix_streamed
    counts = os.path.join(store, "token_counts")
    before = sorted(
        map(tuple, S.read_batch_store(spark, counts, _TOKENS_SCHEMA, -1).collect())
    )
    fold_dirs = sorted(
        e for e in os.listdir(counts) if e.startswith("batch=")
    )[:2]
    folded = (
        spark.read.schema(_TOKENS_SCHEMA + ", batch long")
        .option("basePath", counts)
        .parquet(*[os.path.join(counts, e) for e in fold_dirs])
        .drop("batch")
    )
    # (a) crash BEFORE the flip: orphan generation dir, no pointer
    folded.write.mode("overwrite").parquet(os.path.join(counts, "_fold-1"))
    assert sorted(
        map(tuple, S.read_batch_store(spark, counts, _TOKENS_SCHEMA, -1).collect())
    ) == before
    # (b) crash AFTER the flip, deltas not yet deleted
    S.atomic_write_json(
        os.path.join(counts, "_fold_pointer.json"),
        {"gen": 1, "dir": "_fold-1", "folded": fold_dirs,
         "just_folded": fold_dirs, "prev_dir": None},
    )
    assert sorted(
        map(tuple, S.read_batch_store(spark, counts, _TOKENS_SCHEMA, -1).collect())
    ) == before
    # the next fold call sweeps and keeps working; reads still agree
    S.fold_batch_store(spark, counts, _TOKENS_SCHEMA, keep_last=1)
    after = sorted(
        map(tuple, S.read_batch_store(spark, counts, _TOKENS_SCHEMA, -1).collect())
    )
    assert after == before
