"""Streaming inverted-index/BM25 twin: stream==batch parity over wave
splits (commutative SUM merges — residue split, no ordering contract),
split-document delivery, retry idempotence, and the writeStream leg."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import retrieval as RT
from cloudfront_kinesis_log_lambda_spark.streaming.retrieval import (
    StreamingInvertedIndex,
)

SCHEMA = "doc_id long, text string"


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _index_rows(df):
    return {
        r["word"]: (r["n_docs"], r["total_tf"], r["postings_csv"])
        for r in df.collect()
    }


def _bm25_rows(df):
    return [(r["doc_id"], r["doc_len"], r["bm25"]) for r in df.collect()]


# 130 docs so 'x' clears INDEX_MIN_DF=100; tf varies (doc_id % 5 + 1);
# a sprinkling of BM25 query terms with varying tf and lengths.
ROWS = [
    (i, " ".join(["x"] * (i % 5 + 1)) + " join" * (i % 3 == 0) + " filler")
    for i in range(130)
]
ROWS += [(200, "join hash join vector slow"), (201, "vector vector pad pad")]


def _drive(st, df, n_waves=3, ids=None):
    for w in range(n_waves):
        st(df.filter(F.col("doc_id") % n_waves == w), ids[w] if ids else w)


def test_stream_index_equals_batch(spark, tmp_path, monkeypatch):
    df = _docs_df(spark, ROWS)
    monkeypatch.setattr(RT, "load", lambda s, sf, name: df)
    st = StreamingInvertedIndex(str(tmp_path))
    _drive(st, df)
    got = _index_rows(st.index(spark))
    want = _index_rows(RT.doc_inverted_index(spark, "unused"))
    assert got == want and "x" in got


def test_stream_bm25_equals_batch(spark, tmp_path, monkeypatch):
    df = _docs_df(spark, ROWS)
    monkeypatch.setattr(RT, "load", lambda s, sf, name: df)
    st = StreamingInvertedIndex(str(tmp_path))
    _drive(st, df)
    got = _bm25_rows(st.bm25_topk(spark))
    want = _bm25_rows(RT.doc_bm25_topk(spark, "unused"))
    assert got == want and len(got) > 0


def test_split_document_sums_exactly(spark, tmp_path):
    """A document whose text arrives in TWO pieces across batches must
    index as if delivered whole — tf and dl are SUM merges."""
    st = StreamingInvertedIndex(str(tmp_path))
    st(_docs_df(spark, [(1, "a a b"), (2, "c")]), 0)
    st(_docs_df(spark, [(1, "a b b")]), 1)  # doc 1 continues
    idx = _index_rows(st.index(spark, min_df=1))
    assert idx["a"] == (1, 3, "1")
    assert idx["b"] == (1, 3, "1")
    assert idx["c"] == (1, 1, "2")


def test_retry_same_batch_is_idempotent(spark, tmp_path):
    df = _docs_df(spark, ROWS)
    st = StreamingInvertedIndex(str(tmp_path))
    _drive(st, df)
    before = _index_rows(st.index(spark, min_df=2))
    _drive(st, df.filter(F.col("doc_id") % 3 == 1), n_waves=1, ids=[1])
    assert _index_rows(st.index(spark, min_df=2)) == before


def test_writestream_leg(spark, tmp_path):
    import time

    src = tmp_path / "src"
    src.mkdir()
    df = _docs_df(spark, ROWS)
    df.filter(F.col("doc_id") < 100).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "w0"))
    time.sleep(0.05)
    df.filter(F.col("doc_id") >= 100).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "w1"))
    st = StreamingInvertedIndex(str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(st).trigger(availableNow=True).start()
    q.awaitTermination(120)
    idx = _index_rows(st.index(spark))
    assert idx["x"][0] == 130  # all docs containing 'x' arrived
