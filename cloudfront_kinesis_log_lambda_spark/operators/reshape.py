"""Reshape operators: pivot, unpivot (melt), explode/UNNEST, interval
range join, and stratified sampling.

The reference (cloudfront_kinesis_lambda.py) has no relational surface at
all (SURVEY.md §2.5); these are the data-layout reshapes a training-data
pipeline leans on constantly — wide↔long conversion for feature matrices,
token explosion for text stats, time-range correlation, class-balanced
sampling.

Scale conventions:

- ``pivot`` always gets an EXPLICIT value list — without one Spark runs a
  separate distinct-values job over the full fact table before the real
  aggregate (two scans of 100 TB instead of one).
- the range join is bucketized: each probe row joins at most 2 time
  buckets, turning an O(n·m) inequality join into one equi-shuffle plus a
  residual filter. The naive theta-join formulation becomes a
  BroadcastNestedLoopJoin that cross-multiplies at scale.
- explode happens AFTER the narrow projection (doc_id + split column
  only) so the token blow-up never carries the full document payload
  through the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.relational import load

# lineitem's linestatus domain is fixed by the generator; enumerating it
# here is what keeps the pivot single-pass.
_LINESTATUS_VALUES = ["F", "O"]


def pivot_qty_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot: one row per returnflag, one qty column per linestatus.

    Explicit ``values=`` list → single scan + single shuffle (no
    distinct-values pre-job), and a schema that is stable no matter which
    partitions happen to contain which statuses.
    """
    li = load(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", _LINESTATUS_VALUES)
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return wide.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    )


def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt via ``DataFrame.unpivot`` (Spark ≥3.4): per-priority
    order metrics flattened to (priority, metric, value) rows.

    unpivot is a zero-shuffle Expand node — the long form costs no extra
    exchange beyond the aggregate that built the wide form.
    """
    o = load(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["sum_price", "avg_price", "n_orders"],
        variableColumnName="metric",
        valueColumnName="value",
    )


def doc_word_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token explosion (UNNEST): split document text on whitespace,
    explode, aggregate corpus-level term stats for terms in ≥100 docs.

    The projection is narrowed to (doc_id, text) BEFORE the explode so
    the ~100× row blow-up shuffles two columns, not the whole table.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    words = d.select(
        "doc_id",
        F.explode(F.split(F.col("text"), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 100)
    )


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join: for every 'error' event, count the same
    user's 'click' events in [ts, ts+5min).

    Formulated scale-first: both sides are bucketed into 5-minute epochs;
    each error row is exploded to its bucket and the next (a window
    spanning <= bucket width straddles at most 2 buckets), the join is a
    plain equi-join on (user_id, bucket) — ONE hash shuffle — and the
    exact interval predicate is applied as a residual filter. The naive
    ``e.join(c, (c.ts >= e.ts) & (c.ts < e.ts + 5min))`` plans a
    BroadcastNestedLoopJoin, which is O(errors × clicks) and unrunnable
    at 100 TB. ``count(click_ts)`` ignores the nulls left joins produce,
    so zero-click errors survive with n_follow = 0.
    """
    e = load(spark, sf_dir, "events")
    bucket_us = 300 * 1_000_000  # 5 min in microseconds
    errors = (
        e.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    (F.unix_micros("ts") / bucket_us).cast("long"),
                    (F.unix_micros("ts") / bucket_us).cast("long") + 1,
                )
            ),
        )
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            (F.unix_micros("ts") / bucket_us).cast("long").alias("c_bucket"),
        )
    )
    joined = errors.join(
        clicks,
        (errors.user_id == clicks.c_user_id)
        & (errors.bucket == clicks.c_bucket)
        & (clicks.click_ts >= errors.ts)
        & (clicks.click_ts < errors.ts + F.expr("INTERVAL 5 MINUTES")),
        "left",
    )
    return joined.groupBy("event_id").agg(
        F.count("click_ts").alias("n_follow")
    )


def stratified_event_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling via ``sampleBy`` (per-stratum Bernoulli
    with a fixed seed): rare classes kept whole, dominant classes thinned.

    sampleBy is a per-row filter — no shuffle, fully pushdown-compatible,
    and the seed makes one run deterministic on a fixed partitioning.
    Cross-engine the RNG differs, so the driver check is rows-only; the
    per-stratum rate contract is pinned by tests/test_reshape.py.
    """
    e = load(spark, sf_dir, "events")
    # build strata from the ACTUAL domain: sampleBy silently samples
    # missing strata at rate 0, so a hardcoded list would make any new
    # event_type vanish from the output without an error (the distinct
    # is a tiny aggregate over one low-cardinality column)
    # None is excluded: sampleBy rejects a None dict key outright
    # (DISALLOWED_TYPE_FOR_CONTAINER — r13 null-table sweep), and a
    # NULL stratum has no meaningful per-class rate anyway; rows with a
    # null event_type fall out exactly like any stratum absent from the
    # fractions dict (sampled at rate 0), documented here instead of
    # crashing the job
    types = [
        r[0]
        for r in e.select("event_type").distinct().collect()
        if r[0] is not None
    ]
    fractions = {t: (1.0 if t == "error" else 0.25) for t in types}
    sample = e.sampleBy("event_type", fractions, seed=42)
    return sample.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


#: sample size for :func:`doc_weighted_sample`
WEIGHTED_SAMPLE_K = 50


def weighted_sample_key_sql(id_sql: str, weight_sql: str, *, duck: bool) -> str:
    """Efraimidis–Spirakis A-Res sampling key, deterministic and
    portable: key = ln(u)/w with u an md5-derived uniform in (0, 1] —
    the top-k rows by key ARE a weight-proportional sample without
    replacement (arXiv:cs/0502078 via the ln-monotone form of u^(1/w)).

    Deterministic u (an md5 slice of the row id) replaces the RNG so
    the sample is reproducible AND exactly replayable in DuckDB; the
    final ROUND(·, 9) + id tiebreak make the top-k ordering immune to
    last-ulp ln() differences between engines (same guard as the
    DDSketch bucket index). +1 on the 32-bit slice keeps u > 0.

    Rounding regime (r6 advice): keys live in (ln(2^-32)/w, 0) ≈
    (-22.18/w, 0), so once w ≳ 2e9 the whole key range collapses below
    the 5e-10 rounding quantum — everything ties and the doc_id ASC
    tiebreak, not A-Res, picks the sample. Weights up to ~1e7 (±22 ulp
    of key spread per unit weight at 9 decimals) are safe; for larger
    weight scales pre-normalize (divide by max weight) rather than
    raising the rounding precision, which would re-expose cross-engine
    ulp drift."""
    from cloudfront_kinesis_log_lambda_spark.operators.sketch import (
        md5_hash_sql_duck,
        md5_hash_sql_spark,
    )

    h = (md5_hash_sql_duck if duck else md5_hash_sql_spark)(
        f"CAST({id_sql} AS VARCHAR)" if duck else f"CAST({id_sql} AS STRING)",
        0,
    )
    u = f"(CAST({h} + 1 AS DOUBLE) / 4294967297.0)"
    return f"ROUND(LN({u}) / CAST({weight_sql} AS DOUBLE), 9)"


def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sample of 50 documents without replacement
    (A-Res): inclusion probability ∝ n_chars, the standard
    size-weighted pick for curation subsets.

    Plan shape: one map-side key projection + TakeOrderedAndProject —
    no global sort, no shuffle beyond the top-k combine; at 100 TB the
    per-partition top-50 heaps are all that moves. Zero-weight (empty)
    docs are excluded — their key is undefined (ln u / 0)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    keyed = d.filter(F.col("n_chars") > 0).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.expr(
            weighted_sample_key_sql("doc_id", "n_chars", duck=False)
        ).alias("sample_key"),
    )
    return keyed.orderBy(
        F.col("sample_key").desc(), F.col("doc_id").asc()
    ).limit(WEIGHTED_SAMPLE_K)
