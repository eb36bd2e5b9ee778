"""Fuzz the retrieval-evaluation metric core (ranking_metrics) against
a pure-Python MRR / P@k / nDCG reference.

Why: retrieval_eval_metrics was the last registry operator whose ONLY
oracle mirrored the Spark plan's shape — an algebra bug shared by both
engines (off-by-one rank, wrong cutoff edge, dropped quantization)
would hash-match green (r9 VERDICT weak item). The reference below is
written from the metric DEFINITIONS, not from either plan.

Quantization parity notes (the part worth being paranoid about):
- Spark ``round(double, n)`` goes through BigDecimal.valueOf(double)
  (shortest decimal repr) then setScale(n, HALF_UP). Python's
  ``Decimal(repr(x))`` is the same shortest repr, so the replay
  quantizes Decimal(repr(x)) with ROUND_HALF_UP.
- DCG/IDCG terms are quantized at 9 digits THEN summed as
  DECIMAL(18,9) — the replay sums exact Decimals, so any
  float-accumulation divergence in the engine would show.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from cloudfront_kinesis_log_lambda_spark.operators.retrieval import (
    EVAL_CUTOFF,
    ranking_metrics,
)


def _q(x: float, digits: int) -> Decimal:
    """Spark ROUND(double, digits): HALF_UP on the shortest repr."""
    return Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP
    )


def _reference(pool: list[tuple[int, int]], n_total: int, cutoff: int):
    """(rank, rel) pool + corpus-wide relevant count → the six fields.
    Ten lines of metric definitions, no Spark idioms."""
    rel_ranks = [r for r, rel in pool if rel == 1]
    mrr = float(_q(1.0 / min(rel_ranks), 6)) if rel_ranks else 0.0
    hits = sum(rel for r, rel in pool if r <= cutoff)
    p_at_k = float(_q(hits / cutoff, 6))
    dcg = sum(
        (_q(1.0 / math.log2(r + 1.0), 9) for r in rel_ranks if r <= cutoff),
        Decimal(0),
    )
    idcg = sum(
        (_q(1.0 / math.log2(i + 1.0), 9) for i in range(1, min(cutoff, n_total) + 1)),
        Decimal(0),
    )
    ndcg = float(_q(float(dcg) / float(idcg), 6)) if idcg > 0 else None
    n_in_pool = sum(rel for _, rel in pool)
    return (n_total, n_in_pool, mrr, p_at_k, ndcg)


def _run(spark, pool, n_total, pool_k=40):
    ranked = spark.createDataFrame(
        pool or [(None, None)], "r long, rel int"
    )
    if not pool:
        ranked = ranked.filter(ranked.r.isNotNull())
    n_rel = spark.createDataFrame([(n_total,)], "n_relevant_total long")
    row = ranking_metrics(ranked, n_rel, pool_k=pool_k).collect()
    assert len(row) == 1
    r = row[0]
    assert r["k"] == pool_k
    return (
        r["n_relevant_total"],
        r["n_relevant_in_pool"],
        r["mrr"],
        r["precision_at_10"],
        r["ndcg_at_10"],
    )


@settings(max_examples=fuzz_examples(12), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(min_value=0, max_value=1), min_size=0, max_size=25),
    st.integers(min_value=0, max_value=6),
)
def test_ranking_metrics_fuzz_vs_reference(spark, rels, extra_rel):
    pool = [(i + 1, rel) for i, rel in enumerate(rels)]
    n_total = sum(rels) + extra_rel
    got = _run(spark, pool, n_total)
    want = _reference(pool, n_total, EVAL_CUTOFF)
    assert got == want, (pool, n_total, got, want)


def test_ranking_metrics_sparse_ranks(spark):
    """Ranks need not be contiguous (the contract says unique, not
    dense): MRR uses the true minimum relevant rank, the cutoff
    compares against the rank VALUE, not the row position."""
    pool = [(3, 0), (7, 1), (10, 1), (11, 1), (40, 1)]
    got = _run(spark, pool, 9)
    want = _reference(pool, 9, EVAL_CUTOFF)
    assert got == want
    # rank 11 and 40 must NOT count toward p@10/dcg; rank 10 must
    assert got[3] == 0.2  # hits at ranks 7, 10 only
    assert got[2] == float(_q(1.0 / 7.0, 6))


def test_ranking_metrics_cutoff_boundary(spark):
    """r = 10 is in, r = 11 is out — pin the <= cutoff edge both ways."""
    in_edge = _run(spark, [(10, 1)], 1)
    out_edge = _run(spark, [(11, 1)], 1)
    assert in_edge == _reference([(10, 1)], 1, EVAL_CUTOFF)
    assert out_edge == _reference([(11, 1)], 1, EVAL_CUTOFF)
    # ideal puts the relevant at rank 1, so in-edge ndcg is the rank-10
    # discount itself: round(1/log2(11), 6-after-9) — NOT 1.0
    assert in_edge[3] == 0.1 and in_edge[4] == float(
        _q(float(_q(1.0 / math.log2(11.0), 9)), 6)
    )
    assert out_edge[3] == 0.0 and out_edge[4] == 0.0
    # MRR has no cutoff: rank 11 still reciprocates
    assert out_edge[2] == float(_q(1.0 / 11.0, 6))


def test_ranking_metrics_empty_pool_and_zero_relevant(spark):
    """Edges the registry data never exercises: an empty pool yields a
    zeros row (not NULLs), and n_relevant_total = 0 yields ndcg NULL
    (0/0 undefined) — before r10 the idcg spine produced ZERO rows and
    the metrics row silently vanished."""
    assert _run(spark, [], 5) == (5, 0, 0.0, 0.0, 0.0)
    assert _run(spark, [], 0) == (0, 0, 0.0, 0.0, None)
    assert _run(spark, [(1, 0), (2, 0)], 0) == (0, 0, 0.0, 0.0, None)


def test_ranking_metrics_n_rel_contract_guard(spark):
    """r11 (ADVICE): the one-row n_rel contract is ENFORCED, not just
    documented. Empty n_rel coalesces to a single zero row (the metrics
    row must NOT vanish — pre-guard, crossJoin(broadcast(empty)) emitted
    zero rows, so this assertion fails against the old code); a two-row
    n_rel raises at execution time instead of duplicating the output."""
    import pytest

    ranked = spark.createDataFrame([(1, 1), (2, 0)], "r long, rel int")
    empty_n_rel = spark.createDataFrame(
        [(1,)], "n_relevant_total long"
    ).filter("n_relevant_total < 0")
    row = ranking_metrics(ranked, empty_n_rel, pool_k=40).collect()
    assert len(row) == 1  # vanished (0 rows) before the r11 guard
    r = row[0]
    assert r["n_relevant_total"] == 0 and r["ndcg_at_10"] is None
    assert r["mrr"] == 1.0 and r["n_relevant_in_pool"] == 1

    two_rows = spark.createDataFrame([(3,), (4,)], "n_relevant_total long")
    with pytest.raises(Exception, match="exactly one row"):
        ranking_metrics(ranked, two_rows, pool_k=40).collect()

    # a one-row NULL is a broken upstream aggregate, distinct from the
    # empty-input case — it must raise, not coerce to a zeros row
    null_row = spark.createDataFrame([(None,)], "n_relevant_total long")
    with pytest.raises(Exception, match="must not be NULL"):
        ranking_metrics(ranked, null_row, pool_k=40).collect()


def test_ranking_metrics_perfect_ranking(spark):
    """All-relevant prefix: dcg == idcg exactly (same quantized terms),
    so ndcg is exactly 1.0 — any term-level quantization drift between
    the DCG and IDCG paths would break this identity."""
    for n in (1, 3, 10, 15):
        pool = [(i + 1, 1) for i in range(n)]
        got = _run(spark, pool, n)
        assert got[4] == 1.0, (n, got)
