"""Frequent-pattern mining: association rules over order baskets.

``order_basket_rules`` is the market-basket shape — which item pairs
co-occur in the same order more often than independence predicts —
with the classic support / confidence / lift metrics. The pipeline
kin: co-occurrence statistics over curated corpora (doc_collocations
is the token-level cousin) and feature cross-correlation audits.

Scale shape (the part that matters at 100 TB of line items):

- Pair generation NEVER self-joins the item table. Each basket's
  distinct items are collected into one sorted array (a single
  hash-partitioned shuffle on the basket key) and the pairs are
  expanded JVM-side with nested ``transform`` + ``flatten`` — per
  basket cost is k·(k−1)/2 with k bounded by the basket's distinct
  item count, and no second exchange ever moves item rows again.
- Item supports are a tiny per-item aggregate (|vocabulary| rows) and
  join the pair counts broadcast-side, twice.
- The basket total is a 1-row broadcast scalar join (the same shape
  as BM25's N/avgdl scalars, operators/retrieval.py).

A support floor (``min_support``, relative) prunes the pair tail
BEFORE the metric joins — at real scale the co-occurrence matrix is
long-tailed and the floor is what keeps the rule table small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.relational import load

# Relative support floor for emitted rules: a pair must appear in at
# least this fraction of baskets. 0.02 keeps the TPC-H brand matrix
# meaningful (25 brands, ~5.5 distinct brands/basket) while exercising
# the pruning path.
MIN_SUPPORT = 0.02
RULE_ROUND = 6
# Hot-basket cap (the max_bucket_size contract, operators/dedup.py):
# a basket with more distinct items than this is DROPPED before pair
# expansion — its k²/2 pairs would dominate the stage, and a whale
# basket (a crawler session, a bulk order) is noise for rule mining
# anyway. Documented recall trade, mirrored in the oracle.
MAX_BASKET_SIZE = 200


def basket_rules(
    items: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
    min_support: float = MIN_SUPPORT,
    max_basket_size: int = MAX_BASKET_SIZE,
) -> DataFrame:
    """Association rules over (basket, item) pairs.

    Emits one row per unordered item pair {a, b} (a < b lexically)
    whose co-occurrence support clears ``min_support``: the pair
    basket count, support, both directional confidences, and lift.

    Input need not be distinct — duplicates within a basket are
    collapsed (``collect_set``) so a basket contributes each pair at
    most once, the standard market-basket contract.

    ``max_basket_size`` bounds the QUADRATIC stage: baskets with more
    distinct items are dropped before pair expansion (documented
    recall trade, the LSH ``max_bucket_size`` contract). The
    per-basket array itself is linear in the basket's distinct-item
    count — the same linear-state contract as the per-user event
    arrays in operators/timeseries.py.
    """
    b = F.col(basket_col)
    it = F.col(item_col)

    # one shuffle: per-basket sorted distinct item array; whale
    # baskets drop here, BEFORE any pair expands (supports and the
    # basket total consistently count retained baskets only).
    # localCheckpoint (r15): three consumers read this table (the
    # basket total, the item supports, the pair expansion) and the
    # un-materialized plan re-ran the fact-scan + collect_set
    # aggregate once PER consumer (4 identical subtrees in the
    # physical plan — AQE reuses the exchange's map side, not the
    # object-hash aggregate above it). One materialization of the
    # array table (linear in baskets, arrays capped by
    # max_basket_size) replaces three re-aggregations of fact rows.
    baskets = (
        items.groupBy(b.alias("basket"))
        .agg(F.array_sort(F.collect_set(it)).alias("arr"))
        .filter(F.size("arr") <= F.lit(max_basket_size))
        .localCheckpoint(eager=True)
    )

    # 1-row scalar + |vocab|-row item supports, both broadcast later
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    item_n = (
        baskets.select(F.explode("arr").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("item_n"))
    )

    # JVM-side pair expansion: for each i, pair arr[i] with every later
    # element — k(k-1)/2 structs per basket, no self-join, no second
    # shuffle of item rows
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "arr",
                    lambda x, i: F.transform(
                        F.slice(F.col("arr"), i + F.lit(2), F.size("arr")),
                        lambda y: F.struct(
                            x.alias("item_a"), y.alias("item_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.item_a", "p.item_b")

    pair_n = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).alias("pair_n")
    )

    scored = (
        pair_n.join(F.broadcast(n_baskets))
        .filter(
            F.col("pair_n").cast("double")
            >= F.lit(min_support) * F.col("n_baskets").cast("double")
        )
        .join(
            F.broadcast(
                item_n.select(
                    F.col("item").alias("item_a"), F.col("item_n").alias("n_a")
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                item_n.select(
                    F.col("item").alias("item_b"), F.col("item_n").alias("n_b")
                )
            ),
            "item_b",
        )
    )
    pn = F.col("pair_n").cast("double")
    return scored.select(
        "item_a",
        "item_b",
        "pair_n",
        F.round(pn / F.col("n_baskets").cast("double"), RULE_ROUND).alias(
            "support"
        ),
        F.round(pn / F.col("n_a").cast("double"), RULE_ROUND).alias(
            "conf_a_to_b"
        ),
        F.round(pn / F.col("n_b").cast("double"), RULE_ROUND).alias(
            "conf_b_to_a"
        ),
        F.round(
            pn
            * F.col("n_baskets").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            RULE_ROUND,
        ).alias("lift"),
    )


def order_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules between part brands co-purchased in one order.

    Baskets are orders, items are the brands of the parts on their
    line items (the part join is keyed; brand is the 25-value TPC-H
    vocabulary, so the rule table is small by construction while the
    per-basket pair expansion exercises the real scale path).
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = li.join(part, li.l_partkey == part.p_partkey).select(
        F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item")
    )
    return basket_rules(items)
