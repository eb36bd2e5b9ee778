"""Hypothesis property: the streaming inverted-index twin equals the
batch build under ANY partition of the corpus into micro-batches.

The deterministic parity tests use a fixed modulo-3 split; the twin's
actual law is stronger — its tf/dl stores are commutative SUM partials,
so EVERY assignment of rows to waves (any wave count, any non-
contiguous batch ids) must produce the identical index and BM25
serving results. A violation means some batch-boundary-dependent logic
leaked into the write side (e.g. min_df filtering applied per-batch,
or a posting cut computed before the merge)."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import retrieval as RT
from cloudfront_kinesis_log_lambda_spark.streaming.retrieval import (
    StreamingInvertedIndex,
)

SCHEMA = "doc_id long, text string"

# compact corpus that still clears INDEX_MIN_DF=100 for 'x' and plants
# BM25 query terms at varying tf/length
ROWS = [
    (i, " ".join(["x"] * (i % 5 + 1)) + " join" * (i % 3 == 0) + " filler")
    for i in range(120)
]
ROWS += [(200, "join hash join vector slow"), (201, "vector vector pad pad")]


def _index_rows(df):
    return {
        r["word"]: (r["n_docs"], r["total_tf"], r["postings_csv"])
        for r in df.collect()
    }


@settings(max_examples=fuzz_examples(4), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.integers(0, 3), min_size=len(ROWS), max_size=len(ROWS)
    ),
    st.lists(
        st.integers(0, 50), min_size=4, max_size=4, unique=True
    ),
)
def test_any_wave_partition_equals_batch_build(spark, waves, raw_ids):
    df = spark.createDataFrame(ROWS, SCHEMA)
    assign = spark.createDataFrame(
        [(ROWS[i][0], w) for i, w in enumerate(waves)], "doc_id long, wv int"
    )
    ids = sorted(raw_ids)  # non-contiguous, increasing batch ids
    orig = RT.load
    d = tempfile.mkdtemp(prefix="retrprop-")
    try:
        RT.load = lambda s, sf, name: df
        stream = StreamingInvertedIndex(d)
        tagged = df.join(assign, "doc_id")
        for w in range(4):
            stream(tagged.filter(F.col("wv") == w).drop("wv"), ids[w])
        got_index = _index_rows(stream.index(spark))
        want_index = _index_rows(RT.doc_inverted_index(spark, "unused"))
        assert got_index == want_index and "x" in got_index
        got = [
            (r["doc_id"], r["doc_len"], r["bm25"])
            for r in stream.bm25_topk(spark).collect()
        ]
        want = [
            (r["doc_id"], r["doc_len"], r["bm25"])
            for r in RT.doc_bm25_topk(spark, "unused").collect()
        ]
        assert got == want and got
    finally:
        RT.load = orig
        shutil.rmtree(d, ignore_errors=True)
