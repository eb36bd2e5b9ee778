"""Streaming association rules: the distinct edge store must
reproduce the batch rule table EXACTLY over the union of arrived
rows — including baskets split across batches (cross-wave pairs
appear only once both halves arrived), cross-batch repeated edges
collapsing, and the store's full idempotence (edges are facts, not
counts: even NEW-id re-delivery is harmless, unlike the SUM twins)."""

from __future__ import annotations

from cloudfront_kinesis_log_lambda_spark.operators import mining as MN
from cloudfront_kinesis_log_lambda_spark.streaming.mining import (
    StreamingBasketRules,
)

WAVES = [
    # basket 1 partial, basket 2 whole
    [(1, "a"), (2, "a"), (2, "b")],
    # basket 1 completes → pair (a,b) for basket 1 appears NOW;
    # duplicate edge (2, 'a') re-arrives and must not double-count
    [(1, "b"), (2, "a")],
    # basket 3 + basket 1 gains a third item (two new cross-pairs)
    [(3, "a"), (3, "b"), (1, "c")],
]


def _items(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def _rules(df_rows):
    return sorted(tuple(r) for r in df_rows)


def test_stream_equals_batch_with_split_baskets(spark, tmp_path):
    sr = StreamingBasketRules(str(tmp_path / "rules"))
    for i, wave in enumerate(WAVES):
        sr(_items(spark, wave), i)
        arrived = [r for w in WAVES[: i + 1] for r in w]
        got = _rules(sr.rules(spark, min_support=0.0).collect())
        want = _rules(
            MN.basket_rules(_items(spark, arrived), min_support=0.0).collect()
        )
        assert got == want, f"divergence after wave {i}"
    # final state: baskets {a,b,c}, {a,b}, {a,b} → (a,b) support 1.0
    final = {
        (r["item_a"], r["item_b"]): r
        for r in sr.rules(spark, min_support=0.0).collect()
    }
    assert final[("a", "b")]["pair_n"] == 3
    assert final[("a", "c")]["pair_n"] == 1  # the late-arriving item


def test_edge_store_idempotent_even_under_new_id(spark, tmp_path):
    """Unlike SUM stores, re-delivering the same edges under a NEW
    batch id changes nothing — DISTINCT makes edges idempotent."""
    sr = StreamingBasketRules(str(tmp_path / "rules"))
    sr(_items(spark, WAVES[0]), 0)
    once = _rules(sr.rules(spark, min_support=0.0).collect())
    sr(_items(spark, WAVES[0]), 0)  # same-id retry
    assert _rules(sr.rules(spark, min_support=0.0).collect()) == once
    sr(_items(spark, WAVES[0]), 1)  # new-id re-delivery
    assert _rules(sr.rules(spark, min_support=0.0).collect()) == once


def test_whale_cap_applies_on_read(spark, tmp_path):
    sr = StreamingBasketRules(str(tmp_path / "rules"))
    rows = [(9, f"i{k}") for k in range(30)] + [(1, "a"), (1, "b")]
    sr(_items(spark, rows), 0)
    got = sr.rules(spark, min_support=0.0, max_basket_size=10).collect()
    assert len(got) == 1  # whale basket dropped, (a, b) survives
