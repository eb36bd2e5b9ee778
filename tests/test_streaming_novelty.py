"""Streaming incremental gram novelty: micro-batched corpus must score
EXACTLY as the batch operator over the full corpus when documents arrive
in ascending doc_id order (novelty is deterministic — this is an
equality contract, not a recall gate), including grams whose first and
repeat occurrences arrive batches apart; batch=<id> overwrite writes
must make retries idempotent."""

from __future__ import annotations

import json
import os
import random
import time

import pytest

from cloudfront_kinesis_log_lambda_spark.operators.corpus import gram_novelty
from cloudfront_kinesis_log_lambda_spark.streaming.novelty import (
    StreamingNovelty,
    novelty_log,
)

DOC_SCHEMA = "doc_id long, text string"


def _corpus():
    """10 docs: 4 is a verbatim copy of 1 (arriving two batches later),
    6 shares a half-overlap with 2 (same batch), rest distinct noise."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(300)]

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(40))

    docs = {i: doc() for i in range(1, 11)}
    docs[4] = docs[1]  # exact cross-batch repeat → novelty 0
    docs[6] = docs[2].rsplit(" ", 20)[0] + " " + doc()  # partial overlap
    return docs


def _write_batch(dir_, name, docs, ids, mtime):
    # file-source micro-batch order follows mtime; pin distinct mtimes
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
    out = str(tmp_path / "novelty")
    now = time.time()
    # ascending doc_id order across batches — the ordering under which
    # stream == batch exactly
    _write_batch(land, "b0.json", docs, [1, 2, 3], now - 30)
    _write_batch(land, "b1.json", docs, [4, 5, 6], now - 20)
    _write_batch(land, "b2.json", docs, [7, 8, 9, 10], now - 10)
    scorer = StreamingNovelty(store, out)
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(DOC_SCHEMA)
        .json(land)
    )
    q = stream.writeStream.foreachBatch(scorer).start()
    q.processAllAvailable()
    q.stop()
    return docs, store, out, scorer


def _rows(df):
    return sorted(
        (r["doc_id"], r["n_grams"], r["n_novel"], r["novelty"])
        for r in df.collect()
    )


def test_stream_matches_batch_operator_exactly(spark, streamed):
    docs, _, out, _ = streamed
    full = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in sorted(docs.items())],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert _rows(novelty_log(spark, out)) == _rows(gram_novelty(full))


def test_cross_batch_repeat_scores_zero(spark, streamed):
    _, _, out, _ = streamed
    by_id = {r["doc_id"]: r for r in novelty_log(spark, out).collect()}
    assert by_id[1]["novelty"] == 1.0  # first occurrence wins
    assert by_id[4]["novelty"] == 0.0  # verbatim copy, 2 batches later
    assert by_id[6]["novelty"] < 1.0  # in-batch partial overlap with 2
    assert len(by_id) == 10  # every doc scored exactly once


def test_retry_of_last_batch_is_idempotent(spark, streamed):
    docs, _, out, scorer = streamed
    before = _rows(novelty_log(spark, out))
    retry_df = spark.createDataFrame(
        [(i, docs[i]) for i in [7, 8, 9, 10]], DOC_SCHEMA
    )
    scorer(retry_df, 2)  # same batch_id → batch=2 overwrite, no change
    assert _rows(novelty_log(spark, out)) == before
