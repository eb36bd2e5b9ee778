"""Deterministic-sketch contracts: HLL accuracy + merge law, Count-Min
over-count guarantee, and the scale-shape of both plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import sketch as SK
from cloudfront_kinesis_log_lambda_spark.operators.relational import load


def test_hll_estimate_within_3_sigma_of_exact(spark, sf_dir):
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in SK.events_hll_users(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    rsd = 1.04 / (SK.HLL_M ** 0.5)  # ~4.6% at p=9
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2.0, 3 * rsd * n), (et, approx[et], n)


def test_hll_daily_merge_equals_direct_sketch(spark, sf_dir):
    """The merge law, bit-exact: element-wise MAX over per-day register
    vectors must reproduce the whole-table registers — this is what
    makes the sketch safe to compute incrementally shard-by-shard at
    scale and combine later."""
    e = load(spark, sf_dir, "events")
    direct = {
        (r["event_type"], r["bucket"]): r["rho"]
        for r in SK.hll_registers(e, ["event_type"], "user_id").collect()
    }
    daily = SK.hll_registers(
        e.withColumn("day", F.to_date("ts")), ["event_type", "day"], "user_id"
    )
    merged = {
        (r["event_type"], r["bucket"]): r["rho"]
        for r in daily.groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    assert merged == direct
    # and the estimates built from either register set agree exactly
    d1 = {
        r["event_type"]: r["approx_distinct"]
        for r in SK.events_hll_users(spark, sf_dir).collect()
    }
    d2 = {
        r["event_type"]: r["approx_distinct"]
        for r in SK.events_hll_daily_merge(spark, sf_dir).collect()
    }
    assert d1 == d2


def test_hll_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2), ("b", None)],
        "g string, k long",
    )
    regs = SK.hll_registers(df, ["g"], "k")
    # b has only NULL keys → no registers at all; a has exactly 2
    by_g = {r["g"] for r in regs.collect()}
    assert by_g == {"a"}
    est = SK.hll_estimate(regs, ["g"]).collect()[0]
    # 2 distinct keys, linear-counting regime: estimate lands near 2
    assert 1.0 <= est["approx_distinct"] <= 4.0


def test_countmin_never_undercounts_and_is_tight_on_real_data(spark, sf_dir):
    rows = SK.word_countmin_topk(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_est"] >= r["n_exact"], r
        # d=4 rows over a few-thousand-word vocabulary: the min over 4
        # independent cells keeps inflation far below one colliding
        # heavy word; pin a loose factor so a hash regression (e.g. all
        # rows degenerating to one slice) fails loudly
        assert r["cms_est"] <= 2 * r["n_exact"], r


def test_countmin_exact_on_collision_free_vocab(spark):
    """7 distinct words in a 4×512 matrix: the md5 slices place them in
    distinct cells (fixed hashes — deterministic), so every estimate is
    exactly the true count."""
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]
    docs = spark.createDataFrame(
        [(i, " ".join([w] * (i + 1))) for i, w in enumerate(words)],
        "doc_id long, text string",
    )
    import tempfile

    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["word"]: r for r in SK.word_countmin_topk(spark, d).collect()}
    assert set(out) == set(words)
    for i, w in enumerate(words):
        assert out[w]["cms_est"] == out[w]["n_exact"] == i + 1


def test_hll_registers_shuffle_stays_compact(spark, sf_dir):
    """The 100 TB contract: the exchange above the partial aggregate
    carries register rows (≤ groups × m), never distinct keys. With
    5 event types and m=512 that is ≤ 2560 rows regardless of input
    size."""
    e = load(spark, sf_dir, "events")
    regs = SK.hll_registers(e, ["event_type"], "user_id")
    assert regs.count() <= 5 * SK.HLL_M
    plan = regs._jdf.queryExecution().executedPlan().toString()
    # partial-agg before the exchange (map-side sketching)
    first_exchange = plan.index("Exchange")
    assert "HashAggregate" in plan[first_exchange:], plan
    assert "partial_max" in plan.lower() or "partial" in plan.lower(), plan
