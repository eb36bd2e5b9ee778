"""Streaming embedding drift: exact decimal sums + cohort counts must
reproduce the batch monitor BIT-IDENTICALLY over the union of arrived
rows — labels split across batches, a label becoming two-sided only
after a later wave, and same-id retry overwrites."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import quality as Q
from cloudfront_kinesis_log_lambda_spark.streaming.embedding_drift import (
    StreamingEmbeddingDrift,
)

WAVES = [
    # label 0 ref-only so far
    [(0, 0, [1.0, 0.0]), (2, 0, [0.8, 0.2])],
    # label 0 gains its current cohort; label 1 arrives complete
    [(1, 0, [0.1, 0.9]), (3, 1, [0.5, 0.5]), (4, 1, [0.4, 0.6])],
    # stragglers for both labels
    [(5, 0, [0.0, 1.0]), (6, 1, [1.0, 0.0])],
]


def _emb(spark, rows):
    return spark.createDataFrame(
        [(v, l, e, v % 2 == 0) for v, l, e in rows],
        "vec_id long, label int, embedding array<float>, is_ref boolean",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_across_waves(spark, tmp_path):
    mon = StreamingEmbeddingDrift(str(tmp_path / "emb"))
    for i, wave in enumerate(WAVES):
        mon(_emb(spark, wave), i)
        arrived = [r for w in WAVES[: i + 1] for r in w]
        got = _rows(mon.drift(spark))
        want = _rows(
            Q.embedding_centroid_drift(
                _emb(spark, arrived).drop("is_ref"),
                F.col("vec_id") % 2 == 0,
            )
        )
        assert got == want, f"divergence after wave {i}"
    # after wave 0 label 0 was one-sided → absent; both present now
    assert {r[0] for r in mon.drift(spark).collect()} == {0, 1}


def test_retry_rewrite_idempotent(spark, tmp_path):
    mon = StreamingEmbeddingDrift(str(tmp_path / "emb"))
    mon(_emb(spark, WAVES[0] + WAVES[1]), 0)
    once = _rows(mon.drift(spark))
    mon(_emb(spark, WAVES[0] + WAVES[1]), 0)  # same-id retry
    assert _rows(mon.drift(spark)) == once
    # new-id re-delivery double-counts: SUM store, not a fact store —
    # cohort counts exactly double (centroids, being sums/counts, are
    # invariant under uniform duplication; the counts betray it)
    mon(_emb(spark, WAVES[0] + WAVES[1]), 1)
    once_by_label = {r[0]: r for r in once}
    for r in mon.drift(spark).collect():
        assert r["n_ref"] == 2 * once_by_label[r["label"]][1]
        assert r["n_cur"] == 2 * once_by_label[r["label"]][2]
