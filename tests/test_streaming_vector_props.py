"""Hypothesis split-invariance properties for the two VECTOR-store
twins the r10 campaign left uncovered (VERDICT r10 item 4): semantic
dedup and the streaming vector index.

Both stores are order-free ONCE THE GEOMETRY IS FIXED (centroids are
train-once-frozen; cell assignment, int8 codes, and pair detection are
then pure per-vector/per-pair functions), so the invariant quantifies
over ANY assignment of vectors to waves — not just ordered cuts: the
accumulated store must equal the twin's own single-wave run under the
same frozen geometry. Every schedule pre-seeds ``centroids.json`` with
the same fixed axes (without that, each schedule would train its own
geometry on a different first wave and the comparison would be
ill-posed). The wave holding vec 1 is always retried, so every example
exercises the batch=<id> overwrite contract.

MUTATION-VERIFIED before claiming (applied to source, test failed):

- semantic dedup: ``(na | nb)`` → ``(na & nb)`` in the pair filter —
  only new×new pairs survive, so duplicates whose members arrive in
  DIFFERENT waves are missed; every single-wave run still passes.
- vector index: ``mode("overwrite")`` → ``mode("append")`` on the
  index write — the forced retry appends duplicate code rows and the
  served ranking repeats vec_ids.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from cloudfront_kinesis_log_lambda_spark.streaming.semantic_dedup import (
    StreamingSemanticDedup,
    semantic_pair_log,
)
from cloudfront_kinesis_log_lambda_spark.streaming.vector_index import (
    StreamingVectorIndex,
    index_topk,
)

_EMB_SCHEMA = "vec_id long, embedding array<float>"

#: fixed frozen geometry: one centroid per axis plane — cluster-c
#: vectors land in cell c by construction
_CENTROIDS = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]

#: in-plane angles per variant: (0°,12°) pairs sit above the 0.92
#: threshold (cos 12° ≈ 0.978), every other pair below (cos 28° ≈ 0.88)
_ANGLES = [0.0, 12.0, 40.0, 80.0]


def _vec(cluster: int, variant: int) -> list[float]:
    th = math.radians(_ANGLES[variant])
    v = [0.0, 0.0, 0.0, 0.0]
    v[2 * cluster] = math.cos(th)
    v[2 * cluster + 1] = math.sin(th)
    return v


def _df(spark, rows):
    return (
        spark.createDataFrame(rows, _EMB_SCHEMA)
        if rows
        else spark.createDataFrame([], _EMB_SCHEMA)
    )


def _freeze(store: str) -> None:
    """Pre-seed the frozen geometry (the format load_centroids reads)."""
    os.makedirs(store, exist_ok=True)
    with open(os.path.join(store, "centroids.json"), "w") as f:
        json.dump({"centroids": _CENTROIDS}, f)


#: per-vector (cluster, variant) draws; vec_ids 1..n
_vecs_st = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 3)), min_size=1, max_size=10
).map(
    lambda cvs: [(i + 1, _vec(c, v)) for i, (c, v) in enumerate(cvs)]
)
_assign_st = st.lists(st.integers(0, 3), min_size=10, max_size=10)
_retries_st = st.sets(st.integers(0, 3), max_size=2)


def _waves(rows, assign):
    waves = [[], [], [], []]
    for i, row in enumerate(rows):
        waves[assign[i]].append(row)
    return waves


def _drive(twin, spark, waves, retries, must_retry: int):
    for bid, wave in enumerate(waves):
        twin(_df(spark, wave), bid)
    for bid in sorted(retries | {must_retry}):
        twin(_df(spark, waves[bid]), bid)  # late replays (idempotence)


@settings(max_examples=fuzz_examples(5), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_vecs_st, _assign_st, _retries_st)
def test_semantic_pair_log_any_assignment_matches_single_wave(
    spark, rows, assign, retries
):
    """Under shared frozen geometry the accumulated pair log is
    schedule-free: pairs meeting within a wave, across waves, and
    through retries all resolve to the single-wave run's log."""
    waves = _waves(rows, assign)

    def run(schedule):
        store = tempfile.mkdtemp(prefix="semprop-s-")
        out = tempfile.mkdtemp(prefix="semprop-o-")
        try:
            _freeze(store)
            twin = StreamingSemanticDedup(
                store, out, threshold=0.92, n_centroids=2
            )
            if schedule is None:
                twin(_df(spark, rows), 0)
            else:
                _drive(twin, spark, schedule, retries, assign[0])
            return sorted(
                (r["vec_a"], r["vec_b"], r["cos"])
                for r in semantic_pair_log(spark, out).collect()
            )
        finally:
            shutil.rmtree(store, ignore_errors=True)
            shutil.rmtree(out, ignore_errors=True)

    want = run(None)
    got = run(waves)
    assert got == want, (assign,)


@settings(max_examples=fuzz_examples(5), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_vecs_st, _assign_st, _retries_st)
def test_vector_index_any_assignment_serves_single_wave_ranking(
    spark, rows, assign, retries
):
    """Under shared frozen geometry the served ranking (k ≥ corpus,
    nprobe = all cells — i.e. the full quantized index content, scores
    included) is schedule-free, and retries never duplicate entries."""
    waves = _waves(rows, assign)
    queries = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]

    def run(schedule):
        store = tempfile.mkdtemp(prefix="vidxprop-")
        try:
            _freeze(store)
            twin = StreamingVectorIndex(store, n_centroids=2)
            if schedule is None:
                twin(_df(spark, rows), 0)
            else:
                _drive(twin, spark, schedule, retries, assign[0])
            return [
                [
                    (r["vec_id"], r["cos"])
                    for r in index_topk(
                        spark, store, qv, k=20, nprobe=2
                    ).collect()
                ]
                for qv in queries
            ]
        finally:
            shutil.rmtree(store, ignore_errors=True)

    want = run(None)
    got = run(waves)
    assert got == want, (assign,)
    # completeness: the full-probe ranking holds every indexed vector
    assert sorted(i for rk in got for (i, _) in rk) == sorted(
        [i for (i, _) in rows] * 2
    )
