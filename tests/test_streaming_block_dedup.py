"""Streaming incremental block dedup: micro-batched rewrite must equal
the batch operator over the full corpus when documents arrive in
ascending doc_id order (block dedup is deterministic — equality
contract, not a recall gate), including blocks whose first and repeat
occurrences arrive batches apart; batch=<id> overwrite writes must make
retries idempotent."""

from __future__ import annotations

import json
import os
import random
import time

import pytest

from cloudfront_kinesis_log_lambda_spark.operators.corpus import block_dedup
from cloudfront_kinesis_log_lambda_spark.streaming.block_dedup import (
    StreamingBlockDedup,
    block_dedup_log,
)

DOC_SCHEMA = "doc_id long, text string"
B = 4  # block_tokens: small so repeats are easy to plant


def _corpus():
    """10 docs built from 4-token blocks: 4 is a verbatim copy of 1
    (arriving two batches later → fully deleted), 6 repeats a block of
    2 (same batch), and 3/9 end in the SAME 2-token partial tail block
    (cross-batch repeat of a sub-block_tokens block: 9's tail must be
    deleted as a dup of 3's)."""
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(50)]

    def block():
        return " ".join(rng.choice(vocab) for _ in range(B))

    docs = {i: " ".join(block() for _ in range(3)) for i in range(1, 11)}
    docs[4] = docs[1]  # exact cross-batch repeat → dedup_text ""
    b2 = docs[2].split(" ")
    docs[6] = " ".join(b2[:B]) + " " + block() + " " + block()
    docs[3] = block() + " pt1 pt2"  # partial 2-token tail block...
    docs[9] = block() + " pt1 pt2"  # ...repeated two batches later
    return docs


def _write_batch(dir_, name, docs, ids, mtime):
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
    out = str(tmp_path / "blockdedup")
    now = time.time()
    _write_batch(land, "b0.json", docs, [1, 2, 3], now - 30)
    _write_batch(land, "b1.json", docs, [4, 5, 6], now - 20)
    _write_batch(land, "b2.json", docs, [7, 8, 9, 10], now - 10)
    writer = StreamingBlockDedup(store, out, block_tokens=B)
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(DOC_SCHEMA)
        .json(land)
    )
    q = stream.writeStream.foreachBatch(writer).start()
    q.processAllAvailable()
    q.stop()
    return docs, store, out, writer


def _rows(df):
    return sorted(
        (r["doc_id"], r["n_blocks"], r["n_kept"], r["dedup_text"])
        for r in df.collect()
    )


def _full(spark, docs):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in sorted(docs.items())],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_stream_matches_batch_operator_exactly(spark, streamed):
    docs, _, out, _ = streamed
    assert _rows(block_dedup_log(spark, out)) == _rows(
        block_dedup(_full(spark, docs), block_tokens=B)
    )


def test_cross_batch_repeat_is_fully_deleted(spark, streamed):
    _, _, out, _ = streamed
    by_id = {r["doc_id"]: r for r in block_dedup_log(spark, out).collect()}
    assert by_id[1]["dedup_text"]  # first occurrence survives intact
    assert by_id[1]["n_kept"] == by_id[1]["n_blocks"]
    assert by_id[4]["dedup_text"] == ""  # verbatim copy, 2 batches later
    assert by_id[4]["n_kept"] == 0
    assert by_id[6]["n_kept"] < by_id[6]["n_blocks"]  # in-batch repeat
    # 9's partial 2-token tail block duplicates 3's (two batches
    # earlier): sub-block_tokens blocks must dedup like full ones
    assert by_id[3]["dedup_text"].endswith("pt1 pt2")
    assert by_id[9]["n_kept"] == by_id[9]["n_blocks"] - 1
    assert not by_id[9]["dedup_text"].endswith("pt1 pt2")
    assert len(by_id) == 10  # every doc rewritten exactly once


def test_retry_of_last_batch_is_idempotent(spark, streamed):
    docs, _, out, writer = streamed
    before = _rows(block_dedup_log(spark, out))
    retry_df = spark.createDataFrame(
        [(i, docs[i]) for i in [7, 8, 9, 10]], DOC_SCHEMA
    )
    writer(retry_df, 2)  # same batch_id → batch=2 overwrite, no change
    assert _rows(block_dedup_log(spark, out)) == before


def test_out_of_order_arrival_documents_first_arrival_semantics(spark, tmp_path):
    """INTENDED divergence under out-of-order arrival (module docstring:
    parity is guaranteed for ascending doc_id order): when a HIGHER
    doc_id's copy arrives first, the stream keeps the first ARRIVAL
    while the batch operator keeps the min doc_id — an unbounded stream
    can only honor arrival order. Both sides still keep exactly one
    copy."""
    text = "a b c d e f g h"
    land = str(tmp_path / "docs")
    now = time.time()
    _write_batch(land, "b0.json", {2: text}, [2], now - 20)  # copy first
    _write_batch(land, "b1.json", {1: text}, [1], now - 10)  # original later
    writer = StreamingBlockDedup(
        str(tmp_path / "store"), str(tmp_path / "out"), block_tokens=B
    )
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(DOC_SCHEMA)
        .json(land)
    )
    q = stream.writeStream.foreachBatch(writer).start()
    q.processAllAvailable()
    q.stop()
    by_id = {
        r["doc_id"]: r["dedup_text"]
        for r in block_dedup_log(spark, str(tmp_path / "out")).collect()
    }
    assert by_id == {2: text, 1: ""}  # stream: first arrival wins
    batch = {
        r["doc_id"]: r["dedup_text"]
        for r in block_dedup(
            _full(spark, {1: text, 2: text}), block_tokens=B
        ).collect()
    }
    assert batch == {1: text, 2: ""}  # batch: min doc_id wins


def test_hashed_mode_matches_string_mode(spark, tmp_path):
    docs = _corpus()
    full = _full(spark, docs)
    outs = []
    for mode, hash_blocks in (("s", False), ("h", True)):
        land = str(tmp_path / f"docs-{mode}")
        now = time.time()
        _write_batch(land, "b0.json", docs, [1, 2, 3, 4, 5], now - 20)
        _write_batch(land, "b1.json", docs, [6, 7, 8, 9, 10], now - 10)
        writer = StreamingBlockDedup(
            str(tmp_path / f"store-{mode}"),
            str(tmp_path / f"out-{mode}"),
            block_tokens=B,
            hash_blocks=hash_blocks,
        )
        stream = (
            spark.readStream.option("maxFilesPerTrigger", 1)
            .schema(DOC_SCHEMA)
            .json(land)
        )
        q = stream.writeStream.foreachBatch(writer).start()
        q.processAllAvailable()
        q.stop()
        outs.append(_rows(block_dedup_log(spark, str(tmp_path / f"out-{mode}"))))
    assert outs[0] == outs[1] == _rows(block_dedup(full, block_tokens=B))
