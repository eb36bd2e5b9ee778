"""Streaming vector index: micro-batched ingest must serve top-k from
the (cid, codes, nrm) code table alone, with frozen-centroid geometry,
partition-pruned probes, and idempotent batch retries."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import relational as R
from cloudfront_kinesis_log_lambda_spark.operators.similarity import cosine_topk
from cloudfront_kinesis_log_lambda_spark.streaming.vector_index import (
    StreamingVectorIndex,
    index_topk,
)


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    """Ingest the embeddings table as two micro-batches (direct calls —
    the foreachBatch contract; the JSON-landing streaming transport is
    exercised by test_streaming_dedup for the same pattern)."""
    store = str(tmp_path_factory.mktemp("vecidx") / "store")
    emb = R.load(spark, sf_dir, "embeddings")
    idx = StreamingVectorIndex(store)
    idx(emb.filter(F.col("vec_id") % 2 == 0), 0)
    idx(emb.filter(F.col("vec_id") % 2 == 1), 1)
    return store, emb, idx


def _query_vec(emb, vec_id=0):
    [row] = emb.filter(F.col("vec_id") == vec_id).select("embedding").collect()
    return [float(x) for x in row[0]]


def test_index_topk_tracks_exact_cosine(spark, built):
    store, emb, _ = built
    qv = _query_vec(emb)
    # all cells probed → only int8 quantization separates this from
    # exact cosine; demand high top-10 agreement
    got = [
        r["vec_id"]
        for r in index_topk(spark, store, qv, k=10, nprobe=16, exclude_id=0).collect()
    ]
    exact = [r["vec_id"] for r in cosine_topk(emb, 0, 10).collect()]
    assert len(set(got) & set(exact)) >= 8


def test_query_prunes_partitions_and_reads_no_vectors(spark, built):
    store, emb, _ = built
    qv = _query_vec(emb)
    df = index_topk(spark, store, qv, k=10, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # cid is a partition column: the probe filter must prune at the
    # file-listing level, and the scan must not read an embedding column
    assert "PartitionFilters" in plan and "cid" in plan.split("PartitionFilters")[1][:200]
    assert "embedding" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_frozen_centroids_and_idempotent_retry(spark, built):
    store, emb, idx = built
    with open(os.path.join(store, "centroids.json")) as f:
        before_geom = json.load(f)
    qv = _query_vec(emb)
    before = [(r["vec_id"], r["cos"]) for r in index_topk(spark, store, qv, 10, 16).collect()]
    # retry the last batch: same batch_id, same payload → same index
    idx(emb.filter(F.col("vec_id") % 2 == 1), 1)
    with open(os.path.join(store, "centroids.json")) as f:
        assert json.load(f) == before_geom  # geometry never retrains
    after = [(r["vec_id"], r["cos"]) for r in index_topk(spark, store, qv, 10, 16).collect()]
    assert after == before


def test_serving_guards_empty_store_and_uncommitted_batches(spark, tmp_path, built):
    """index_topk must behave like the sibling log readers: an absent
    store yields an empty frame (not FileNotFoundError), and a crashed
    micro-batch's partial files (batch dir without _SUCCESS) are never
    served."""
    import shutil

    # absent store
    assert index_topk(spark, str(tmp_path / "nope"), [1.0, 0.0], k=5).count() == 0

    store, emb, _ = built
    qv = _query_vec(emb)
    full = {r["vec_id"] for r in index_topk(spark, store, qv, 10, 16).collect()}
    # simulate a crashed write: copy a committed batch to a new id and
    # strip its _SUCCESS marker — its vectors must disappear from serving
    idx_dir = os.path.join(store, "index")
    src = next(e for e in os.listdir(idx_dir) if e.startswith("batch="))
    crashed = os.path.join(idx_dir, "batch=999")
    shutil.copytree(os.path.join(idx_dir, src), crashed)
    os.remove(os.path.join(crashed, "_SUCCESS"))
    after = {r["vec_id"] for r in index_topk(spark, store, qv, 10, 16).collect()}
    assert after == full  # the uncommitted copy neither adds nor doubles
    shutil.rmtree(crashed)
