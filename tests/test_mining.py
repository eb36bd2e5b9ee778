"""Association-rule contracts: hand-computed metrics on a toy basket
set, within-basket dedup, the support floor, and the no-self-join
plan shape (pairs expand JVM-side from per-basket arrays)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import mining as MN


def _items(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def test_hand_computed_rules(spark):
    # 4 baskets: {a,b} x3, {a,c} x1 → pair (a,b) support 3/4,
    # conf a→b = 3/4 (a in all 4), conf b→a = 3/3, lift = (3·4)/(4·3)=1
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "a"), (4, "c"),
    ]
    got = {
        (r["item_a"], r["item_b"]): r
        for r in MN.basket_rules(_items(spark, rows), min_support=0.0).collect()
    }
    ab = got[("a", "b")]
    assert ab["pair_n"] == 3
    assert ab["support"] == 0.75
    assert ab["conf_a_to_b"] == 0.75
    assert ab["conf_b_to_a"] == 1.0
    assert ab["lift"] == 1.0
    ac = got[("a", "c")]
    assert ac["pair_n"] == 1 and ac["conf_b_to_a"] == 1.0
    assert ("b", "c") not in got  # never co-occur


def test_within_basket_duplicates_collapse(spark):
    # the same (basket, item) twice must count once per basket
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    got = MN.basket_rules(_items(spark, rows), min_support=0.0).collect()
    assert len(got) == 1
    assert got[0]["pair_n"] == 2 and got[0]["support"] == 1.0


def test_support_floor_prunes(spark):
    rows = [(i, "a") for i in range(10)] + [(i, "b") for i in range(10)]
    rows += [(0, "z")]  # (a,z)/(b,z) support 0.1
    df = _items(spark, rows)
    assert MN.basket_rules(df, min_support=0.5).count() == 1  # only (a,b)
    assert MN.basket_rules(df, min_support=0.05).count() == 3


def test_whale_basket_dropped_by_cap(spark):
    # one whale basket with 30 items, two normal baskets with 2 each:
    # capped at 10, the whale contributes NO pairs and NO supports
    rows = [(99, f"i{k:02d}") for k in range(30)]
    rows += [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = _items(spark, rows)
    got = MN.basket_rules(df, min_support=0.0, max_basket_size=10).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["item_a"], r["item_b"]) == ("a", "b")
    # n_baskets counts retained baskets only → support is 2/2, not 2/3
    assert r["support"] == 1.0
    # uncapped, the whale's 435 pairs appear
    assert (
        MN.basket_rules(df, min_support=0.0, max_basket_size=1000).count()
        == 1 + 435
    )


def test_pair_order_is_lexical(spark):
    rows = [(1, "zz"), (1, "aa")]
    r = MN.basket_rules(_items(spark, rows), min_support=0.0).collect()[0]
    assert (r["item_a"], r["item_b"]) == ("aa", "zz")


def test_no_self_join_in_pair_expansion(spark, sf_dir):
    """Pairs must come from the per-basket array expansion — ONE
    aggregate over the item rows, never an item-table self-join (the
    join would re-shuffle item rows and is the shape that dies on a
    hot basket key at scale)."""
    plan = MN.order_basket_rules(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # every join left in the plan is a broadcast of a tiny side
    assert "ShuffledHashJoin" not in plan


def test_order_basket_rules_runs(spark, sf_dir):
    rows = MN.order_basket_rules(spark, sf_dir).collect()
    for r in rows:
        assert r["item_a"] < r["item_b"]
        assert 0.0 <= r["support"] <= 1.0
        assert 0.0 < r["conf_a_to_b"] <= 1.0
        assert 0.0 < r["conf_b_to_a"] <= 1.0
        assert r["support"] >= MN.MIN_SUPPORT - 1e-9
