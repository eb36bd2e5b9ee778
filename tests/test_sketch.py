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


def test_countmin_exact_on_collision_free_vocab(spark, tmp_path):
    """7 distinct words in a 4×512 matrix: the md5 slices place them in
    distinct cells (fixed hashes — deterministic), so every estimate is
    exactly the true count."""
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]
    docs = spark.createDataFrame(
        [(i, " ".join([w] * (i + 1))) for i, w in enumerate(words)],
        "doc_id long, text string",
    )
    d = str(tmp_path)
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


def test_hll_overlap_inclusion_exclusion_on_planted_sets(spark, tmp_path):
    """A≈{0..99} view, B≈{50..149} purchase → |A∩B|=50; the
    register-level inclusion-exclusion estimate must land within the
    compounded 3-sketch error band."""
    rows = [("view", u) for u in range(100)] + [
        ("purchase", u) for u in range(50, 150)
    ]
    df = spark.createDataFrame(
        [(i, "2026-01-01 00:00:00", et, u) for i, (et, u) in enumerate(rows)],
        "event_id long, ts string, event_type string, user_id long",
    ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type", "user_id")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = SK.events_hll_type_overlap(spark, d).collect()[0]
    # three estimates each within ~3σ (σ=4.6%); the difference compounds
    assert abs(out["approx_view"] - 100) <= 15
    assert abs(out["approx_purchase"] - 100) <= 15
    assert abs(out["approx_union"] - 150) <= 20
    assert abs(out["approx_both"] - 50) <= 35


def test_ddsketch_quantiles_within_relative_error(spark, sf_dir):
    """The sketch guarantee is ~1% on the VALUE at a bucketed RANK —
    like the t-digest contract in test_sketches, value accuracy at an
    exact rank is NOT guaranteed when a heavy tail jumps between
    adjacent ranks. Assert each estimate lands inside a ±0.75-rank-%
    band of the exact distribution, widened by the γ bucket width."""
    bands = {"p50": (0.4925, 0.5075), "p95": (0.9425, 0.9575), "p99": (0.9825, 0.9975)}
    exact = {
        r["event_type"]: r
        for r in load(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(
            *[
                F.expr(f"percentile(value, {lo})").alias(f"{q}_lo")
                for q, (lo, _) in bands.items()
            ],
            *[
                F.expr(f"percentile(value, {hi})").alias(f"{q}_hi")
                for q, (_, hi) in bands.items()
            ],
        )
        .collect()
    }
    got = {
        r["event_type"]: r
        for r in SK.events_value_ddsketch(spark, sf_dir).collect()
    }
    assert set(got) == set(exact)
    for et, ex in exact.items():
        for q in bands:
            lo, hi = ex[f"{q}_lo"] * 0.98, ex[f"{q}_hi"] * 1.02
            assert lo <= got[et][q] <= hi, (et, q, got[et][q], lo, hi)


def test_ddsketch_bucket_boundaries_are_ulp_safe(spark, sf_dir):
    """The FLOOR(ROUND(ln-ratio, 9)) portability guard: no value in the
    test tables sits within 1e-9 of a bucket boundary, so a last-ulp
    ln() disagreement between Java and libm cannot flip any bucket."""
    import math

    vals = [
        r["value"]
        for r in load(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .select("value")
        .collect()
    ]
    for v in vals:
        ratio = math.log(v) / math.log(SK.DD_GAMMA)
        assert abs(ratio - round(ratio)) > 1e-6, v


def test_ddsketch_histogram_is_sum_mergeable(spark, sf_dir):
    """Daily partial histograms summed == direct histogram (the
    quantile analogue of the HLL register merge law — what makes the
    sketch safe to build shard-by-shard)."""
    e = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    bucketed = e.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.expr(SK.DD_BUCKET_SQL).alias("bucket"),
    )
    direct = {
        (r["event_type"], r["bucket"]): r["n"]
        for r in bucketed.groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    merged = {
        (r["event_type"], r["bucket"]): r["n"]
        for r in bucketed.groupBy("event_type", "day", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("event_type", "bucket")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert merged == direct


def test_hash_fragment_parity_on_adversarial_keys(spark):
    """The portable-SQL hash fragments must agree between Spark and
    DuckDB for ANY key, not just the test tables' friendly ones:
    negative/zero/huge BIGINTs through the HLL bucket/rho-hash pair,
    and unicode/quote/empty-adjacent words through the CMS md5 slices."""
    import duckdb
    import random

    rng = random.Random(3)
    keys = [0, -1, 1, -(2**63), 2**63 - 1, 42] + [
        rng.randrange(-(2**62), 2**62) for _ in range(200)
    ]
    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    srow = kdf.select(
        "k",
        F.expr(SK.hll_bucket_sql_spark("k")).alias("b"),
        F.expr(SK.hll_h2_sql_spark("k")).alias("h"),
    ).collect()
    con = duckdb.connect()
    drow = con.sql(
        f"SELECT k, {SK.hll_bucket_sql_duck('k')} AS b, "
        f"{SK.hll_h2_sql_duck('k')} AS h "
        "FROM (SELECT UNNEST(?) AS k)",
        params=[keys],
    ).fetchall()
    assert sorted((r["k"], r["b"], r["h"]) for r in srow) == sorted(drow)

    words = ["naïve", "日本語", "it's", "a", "Z" * 100, "x y"] + [
        "".join(rng.choice("abcdefgh'β") for _ in range(rng.randrange(1, 12)))
        for _ in range(120)
    ]
    words = sorted(set(words))
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    sw = wdf.select(
        "w", *[F.expr(SK.md5_hash_sql_spark("w", r)).alias(f"h{r}") for r in range(4)]
    ).collect()
    duck_cols = ", ".join(
        f"{SK.md5_hash_sql_duck('w', r)} AS h{r}" for r in range(4)
    )
    dw = con.sql(
        f"SELECT w, {duck_cols} FROM (SELECT UNNEST(?) AS w)", params=[words]
    ).fetchall()
    assert sorted(tuple(r) for r in sw) == sorted(dw)
