"""Streaming incremental near-dup detection: micro-batched corpus must
yield the SAME verified pair set as the batch MinHash-LSH operator over
the full corpus, including pairs whose members arrive in different
micro-batches; batch=<id> overwrite writes must make retries idempotent.
"""

from __future__ import annotations

import json
import os
import random

import pytest

from cloudfront_kinesis_log_lambda_spark.operators.dedup import minhash_lsh_pairs
from cloudfront_kinesis_log_lambda_spark.streaming.dedup import (
    StreamingNearDup,
    near_dup_pair_log,
)

DOC_SCHEMA = "doc_id long, text string"


def _corpus():
    """12 docs: (1,2) near-identical split ACROSS batches, (3,4)
    near-identical within one batch, the rest distinct noise."""
    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(400)]

    def doc(words):
        return " ".join(words)

    base_a = [rng.choice(vocab) for _ in range(60)]
    base_b = [rng.choice(vocab) for _ in range(60)]
    docs = {
        1: doc(base_a),
        2: doc(base_a[:57] + ["x1", "x2", "x3"]),      # ~0.8 Jaccard vs 1
        3: doc(base_b),
        4: doc(base_b[:57] + ["y1", "y2", "y3"]),      # ~0.8 Jaccard vs 3
    }
    for i in range(5, 13):
        docs[i] = doc([rng.choice(vocab) for _ in range(60)])
    return docs


def _write_batch(dir_, name, docs, ids, mtime):
    """The file source orders micro-batches by file MODIFICATION TIME,
    not name — same-second writes tie and the batch→file mapping becomes
    arbitrary (it permuted under full-suite timing). Pin distinct mtimes
    so batch ids are deterministic."""
    os.makedirs(dir_, exist_ok=True)
    path = os.path.join(dir_, name)
    with open(path, "w") as f:
        for i in ids:
            f.write(json.dumps({"doc_id": i, "text": docs[i]}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def streamed(spark, tmp_path):
    docs = _corpus()
    land = str(tmp_path / "docs")
    store = str(tmp_path / "store")
    out = str(tmp_path / "pairs")
    # doc 1 in batch 0; its near-dup 2 arrives two batches later;
    # (3,4) land together in batch 0
    import time

    now = time.time()
    _write_batch(land, "b0.json", docs, [1, 3, 4, 5, 6], now - 30)
    _write_batch(land, "b1.json", docs, [7, 8], now - 20)
    _write_batch(land, "b2.json", docs, [2, 9, 10, 11, 12], now - 10)
    detector = StreamingNearDup(store, out, threshold=0.5)
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(DOC_SCHEMA)
        .json(land)
    )
    q = stream.writeStream.foreachBatch(detector).start()
    q.processAllAvailable()
    q.stop()
    return docs, land, store, out, detector


def test_stream_matches_batch_operator(spark, streamed):
    docs, _, _, out, _ = streamed
    full = spark.createDataFrame(sorted(docs.items()), DOC_SCHEMA)
    batch_pairs = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_pairs(full, threshold=0.5).collect()
    }
    stream_pairs = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in near_dup_pair_log(spark, out).collect()
    }
    assert stream_pairs == batch_pairs
    ids = {(a, b) for a, b, _ in stream_pairs}
    assert (1, 2) in ids  # members arrived 2 micro-batches apart
    assert (3, 4) in ids  # members arrived in the same micro-batch


def test_retry_of_last_batch_is_idempotent(spark, streamed):
    docs, _, _, out, detector = streamed
    before = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in near_dup_pair_log(spark, out).collect()
    )
    # simulate a foreachBatch retry: re-run the final micro-batch's
    # payload under the same batch_id — every store path is a batch=<id>
    # overwrite, so nothing may duplicate or change
    retry_df = spark.createDataFrame(
        [(i, docs[i]) for i in [2, 9, 10, 11, 12]], DOC_SCHEMA
    )
    detector(retry_df, 2)
    after = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in near_dup_pair_log(spark, out).collect()
    )
    assert after == before


def test_over_cap_bucket_documents_intended_stream_batch_divergence(
    spark, tmp_path
):
    """INTENDED divergence above max_bucket_size (streaming/dedup.py
    module docstring, 'Semantics note'; ADVICE r4): the stream caps a
    bucket at DETECTION time — pairs emitted while the bucket was under
    the cap stay in the log after it grows past the cap — while the
    batch operator sees only the final size and suppresses the bucket
    entirely. Both are boilerplate guards, not recall contracts; this
    test pins the asymmetry so it can't drift silently.

    Six identical docs, cap 4: batch 0 (docs 1-3) has every band bucket
    at size 3 → 3 pairs emitted; batch 1 (docs 4-6) grows the cumulative
    buckets to 6 > cap → zero NEW pairs; the batch operator over all six
    suppresses everything."""
    text = " ".join(f"tok{i}" for i in range(30))
    store, out = str(tmp_path / "store"), str(tmp_path / "pairs")
    detector = StreamingNearDup(store, out, threshold=0.5, max_bucket_size=4)
    detector(
        spark.createDataFrame([(i, text) for i in (1, 2, 3)], DOC_SCHEMA), 0
    )
    detector(
        spark.createDataFrame([(i, text) for i in (4, 5, 6)], DOC_SCHEMA), 1
    )
    stream_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in near_dup_pair_log(spark, out).collect()
    }
    assert stream_pairs == {(1, 2), (1, 3), (2, 3)}  # early pairs survive
    batch_pairs = minhash_lsh_pairs(
        spark.createDataFrame([(i, text) for i in range(1, 7)], DOC_SCHEMA),
        max_bucket_size=4,
    ).collect()
    assert batch_pairs == []  # final-size cap suppresses the whole bucket
