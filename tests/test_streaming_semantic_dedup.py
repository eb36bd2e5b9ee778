"""Streaming incremental semantic dedup: micro-batched embeddings must
yield the SAME canonical assignment as the batch SemDeDup operator
injected with the stream's frozen centroid geometry — including
duplicates whose members arrive batches apart — and batch=<id>
overwrite writes must make retries idempotent."""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pytest

from cloudfront_kinesis_log_lambda_spark.operators.similarity import semantic_dedup
from cloudfront_kinesis_log_lambda_spark.streaming.semantic_dedup import (
    StreamingSemanticDedup,
    semantic_assignment,
    semantic_pair_log,
)

EMB_SCHEMA = "vec_id long, embedding array<float>"
DIM = 16


def _corpus():
    """12 vectors: (1,2) near-identical split ACROSS batches, (3,4)
    near-identical within one batch, the rest random directions (random
    16-dim pairs land far below any dedup threshold)."""
    rng = np.random.default_rng(42)
    vecs = {}
    base_a = rng.normal(size=DIM)
    base_b = rng.normal(size=DIM)
    vecs[1] = base_a
    vecs[2] = base_a + 0.01 * rng.normal(size=DIM)  # cos ≈ 0.9999 vs 1
    vecs[3] = base_b
    vecs[4] = base_b + 0.01 * rng.normal(size=DIM)  # cos ≈ 0.9999 vs 3
    for i in range(5, 13):
        vecs[i] = rng.normal(size=DIM)
    return {k: [float(x) for x in v] for k, v in vecs.items()}


def _write_batch(dir_, name, vecs, ids, mtime):
    """File-source micro-batch order follows file mtime — pin distinct
    mtimes so batch ids are deterministic (test_streaming_dedup note)."""
    os.makedirs(dir_, exist_ok=True)
    path = os.path.join(dir_, name)
    with open(path, "w") as f:
        for i in ids:
            f.write(json.dumps({"vec_id": i, "embedding": vecs[i]}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def streamed(spark, tmp_path):
    vecs = _corpus()
    land = str(tmp_path / "emb")
    store = str(tmp_path / "store")
    out = str(tmp_path / "pairs")
    now = time.time()
    # 1 lands in batch 0; its duplicate 2 arrives two batches later;
    # (3,4) land together in batch 0
    _write_batch(land, "b0.json", vecs, [1, 3, 4, 5, 6], now - 30)
    _write_batch(land, "b1.json", vecs, [7, 8], now - 20)
    _write_batch(land, "b2.json", vecs, [2, 9, 10, 11, 12], now - 10)
    detector = StreamingSemanticDedup(
        store, out, threshold=0.92, n_centroids=2
    )
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(EMB_SCHEMA)
        .json(land)
    )
    q = stream.writeStream.foreachBatch(detector).start()
    q.processAllAvailable()
    q.stop()
    return vecs, land, store, out, detector


def test_stream_matches_batch_operator_on_frozen_geometry(spark, streamed):
    vecs, _, _, out, detector = streamed
    full = spark.createDataFrame(sorted(vecs.items()), EMB_SCHEMA)
    cents = detector.frozen_centroids()
    assert cents is not None and len(cents) == 2
    batch_assign = {
        (r["vec_id"], r["canon_id"])
        for r in semantic_dedup(
            full, threshold=0.92, centroids=cents
        ).collect()
    }
    stream_assign = {
        (r["vec_id"], r["canon_id"])
        for r in semantic_assignment(spark, out, full).collect()
    }
    assert stream_assign == batch_assign
    d = dict(stream_assign)
    assert d[2] == 1  # members arrived 2 micro-batches apart
    assert d[4] == 3  # members arrived in the same micro-batch
    assert d[5] == 5  # noise keeps itself


def test_cross_batch_pair_found_via_index_probe(spark, streamed):
    _, _, _, out, _ = streamed
    pairs = {
        (r["vec_a"], r["vec_b"]) for r in semantic_pair_log(spark, out).collect()
    }
    assert (1, 2) in pairs
    assert (3, 4) in pairs
    # no false positives among the random-direction noise
    assert pairs == {(1, 2), (3, 4)}


def test_retry_of_last_batch_is_idempotent(spark, streamed):
    vecs, _, _, out, detector = streamed
    before = sorted(
        (r["vec_a"], r["vec_b"], round(r["cos"], 6))
        for r in semantic_pair_log(spark, out).collect()
    )
    retry_df = spark.createDataFrame(
        [(i, vecs[i]) for i in [2, 9, 10, 11, 12]], EMB_SCHEMA
    )
    detector(retry_df, 2)  # same batch_id → batch=<id> overwrite
    after = sorted(
        (r["vec_a"], r["vec_b"], round(r["cos"], 6))
        for r in semantic_pair_log(spark, out).collect()
    )
    assert after == before


def test_over_cap_cell_stops_yielding_new_pairs(spark, tmp_path):
    """Detection-time cap (module docstring semantics note): pairs
    emitted while the cell was under max_cell_size stay in the log;
    once cumulative membership exceeds the cap, later arrivals yield
    nothing new — while the batch operator, seeing only the final size,
    suppresses the cell entirely. Pin the asymmetry."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=DIM)
    mk = lambda: [float(x) for x in (base + 0.01 * rng.normal(size=DIM))]
    store, out = str(tmp_path / "s"), str(tmp_path / "o")
    detector = StreamingSemanticDedup(
        store, out, threshold=0.92, n_centroids=1, max_cell_size=4
    )
    b0 = spark.createDataFrame([(i, mk()) for i in [1, 2, 3]], EMB_SCHEMA)
    detector(b0, 0)
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "vec_id long")
    assign0 = dict(
        (r["vec_id"], r["canon_id"])
        for r in semantic_assignment(spark, out, ids).collect()
    )
    assert assign0[2] == 1 and assign0[3] == 1  # 3 ≤ cap: pairs found
    b1 = spark.createDataFrame([(i, mk()) for i in [4, 5, 6]], EMB_SCHEMA)
    detector(b1, 1)  # cumulative cell = 6 > cap → no NEW pairs
    assign1 = dict(
        (r["vec_id"], r["canon_id"])
        for r in semantic_assignment(spark, out, ids).collect()
    )
    assert assign1[2] == 1 and assign1[3] == 1  # earlier pairs persist
    assert assign1[4] == 4 and assign1[5] == 5 and assign1[6] == 6


def test_centroid_write_leaves_foreign_tmps_alone(spark, tmp_path):
    """The orphan-tmp sweep is pid-scoped: a tmp file belonging to
    another process (by name) must survive geometry training — sweeping
    it would crash that process's atomic rename mid-write (r6 review
    finding). Single-writer is the documented contract; this guards the
    blast radius of a violated one."""
    store, out = str(tmp_path / "s"), str(tmp_path / "o")
    os.makedirs(store)
    foreign = os.path.join(store, "centroids.json.tmp-999999999")
    with open(foreign, "w") as f:
        f.write("{}")
    detector = StreamingSemanticDedup(store, out, n_centroids=1)
    rng = np.random.default_rng(3)
    b0 = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=DIM)]) for i in range(3)],
        EMB_SCHEMA,
    )
    detector(b0, 0)
    assert os.path.exists(foreign)  # not swept
    assert detector.frozen_centroids() is not None  # and geometry landed


def test_redelivered_vec_id_emits_no_self_pair(spark, tmp_path):
    """At-least-once sources can redeliver a vec_id that earlier batches
    already persisted to the index: the copy arrives is_new=True, lands
    in the same frozen-geometry cell as its is_new=False twin, and the
    pair kernel must NOT log a (X, X, cos=1.0) self-edge (ADVICE r12 —
    the positional upper triangle did; id-valued comparison doesn't).
    Legit cross-batch pairs and the final assignment stay intact."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=DIM)
    vecs = {
        1: base,
        2: base + 0.01 * rng.normal(size=DIM),  # near-dup of 1
        3: rng.normal(size=DIM),
        4: rng.normal(size=DIM),
    }
    vecs = {k: [float(x) for x in v] for k, v in vecs.items()}
    store, out = str(tmp_path / "s"), str(tmp_path / "o")
    detector = StreamingSemanticDedup(store, out, threshold=0.92, n_centroids=1)
    b0 = spark.createDataFrame([(i, vecs[i]) for i in [1, 3, 4]], EMB_SCHEMA)
    detector(b0, 0)
    # batch 1 REDELIVERS id 1 (byte-identical vector) alongside its
    # genuine near-dup 2 — a new batch_id, so this is not the retry
    # overwrite path; the duplicate coexists with the indexed copy
    b1 = spark.createDataFrame([(i, vecs[i]) for i in [1, 2]], EMB_SCHEMA)
    detector(b1, 1)
    pairs = semantic_pair_log(spark, out).collect()
    assert all(r["vec_a"] < r["vec_b"] for r in pairs)  # no self-edges
    assert {(r["vec_a"], r["vec_b"]) for r in pairs} == {(1, 2)}
    ids = spark.createDataFrame([(i,) for i in vecs], "vec_id long")
    assign = {
        r["vec_id"]: r["canon_id"]
        for r in semantic_assignment(spark, out, ids).collect()
    }
    assert assign == {1: 1, 2: 1, 3: 3, 4: 4}
