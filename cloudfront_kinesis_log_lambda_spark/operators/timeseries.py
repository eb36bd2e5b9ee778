"""Time-series / event-sequence operators: EWMA smoothing, OHLC bars,
robust (median/MAD) outlier detection, Markov transition matrices, and
marketing-style last-touch attribution.

These close the gap between the sessionize/funnel family (already in
operators/relational.py) and what a metrics/observability pipeline
runs: per-entity smoothed series, candlestick rollups, and
distribution-robust anomaly flags.

Cross-engine numerics: EWMA is a LEFT FOLD over the per-user
event-ordered value array — both Spark's ``aggregate`` higher-order
function and DuckDB's ``list_reduce`` fold sequentially in IEEE
doubles, so the result is bit-exact without any tolerance (verified in
tests). Medians use exact linear-interpolation percentile
(``percentile`` ↔ ``quantile_cont``), quantized at 9 decimals before
reuse so the derived MAD comparison is identical on both engines.
Extremum-by-key (open/close) uses a zero-padded string composite key
because DuckDB's ``arg_min`` cannot order by a struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloudfront_kinesis_log_lambda_spark.operators.relational import load
from cloudfront_kinesis_log_lambda_spark.operators.util import (
    DECIMAL_18_3_BOUND,
    DECIMAL_18_9_BOUND,
    finite,
    in_decimal_domain,
)

EWMA_ALPHA = 0.3
HOLT_ALPHA = 0.3
HOLT_BETA = 0.2
MAD_SIGMA = 3.0
ATTRIBUTION_WINDOW_DAYS = 3
TOUCH_TYPES = ("view", "click")
CONVERSION_TYPE = "purchase"


#: epoch-µs of 0001-01-01 00:00:00 UTC — subtracted inside
#: ``_event_key`` so the padded key is non-negative for EVERY
#: representable instant. Without it a pre-epoch event's negative
#: epoch-µs breaks the string order (the '-' sign shifts with digit
#: count and digit comparison runs backwards for negatives), silently
#: mis-picking open/close — found by the r15 hostile-dates first-
#: principles audit, INVISIBLE to the hash gate because the oracle
#: shared the same lpad algebra (the known shared-algebra blind spot).
PROLEPTIC_MIN_US = -62_135_596_800_000_000


def _event_key() -> "F.Column":
    """Zero-padded (epoch-µs − proleptic-min, event_id) composite
    string: a total order over events that both engines compare
    identically (string order == numeric order thanks to the offset-
    to-non-negative plus fixed-width pads; max instant 9999-12-31
    gives 18 digits < the 20-wide pad)."""
    return F.concat(
        F.lpad(
            (F.unix_micros(F.col("ts")) - F.lit(PROLEPTIC_MIN_US))
            .cast("string"),
            20,
            "0",
        ),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA (α=0.3) of each user's event-ordered value series:
    y₀ = x₀, yᵢ = (1−α)·yᵢ₋₁ + α·xᵢ.

    The recursion is inherently sequential per user, so it runs as a
    fold over the per-user sorted array — grouped state stays inside
    one task per user, there is exactly one shuffle (the groupBy), and
    nothing is iterative driver-side. The same shape extends to any
    per-entity recursive smoother (Kalman-ish filters, decayed
    counters). Per-user arrays are bounded by per-entity event counts,
    the usual assumption for per-user state (same contract as
    sessionize / SCD2).

    NULL event time (r15 hostile-dates sweep): a row with no timestamp
    has no position in an order-DEPENDENT series — and the engines
    disagree where to put it (Spark sort_array ranks a NULL struct
    field FIRST, so it silently became the EWMA seed; DuckDB's ORDER BY
    ranks it last). Excluded, mirrored in the oracle."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).filter(F.col("ts").isNotNull())
    arr = (
        e.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("series")
        )
    )
    a = float(EWMA_ALPHA)
    fold = (
        f"aggregate(slice(series, 2, size(series) - 1), "
        f"series[0].value, "
        f"(acc, x) -> acc * {1.0 - a!r}D + x.value * {a!r}D)"
    )
    return arr.select(
        "user_id",
        F.size("series").cast("long").alias("n_events"),
        F.round(F.expr(fold), 6).alias("ewma"),
    )


def holt_merge_lambda(
    a: float = HOLT_ALPHA, b: float = HOLT_BETA
) -> str:
    """The Holt step as a fold lambda over (l, b, n) struct
    accumulators — shared by the batch fold and the streaming twin's
    seeded fold so stream == batch stays structural.

    n tracks the init phase: the first merge (n=1 → 2) performs the
    standard two-point init (l₁ = x₁, b₁ = x₁ − x₀); thereafter
    lᵢ = α·xᵢ + (1−α)·(lᵢ₋₁ + bᵢ₋₁), bᵢ = β·(lᵢ − lᵢ₋₁) + (1−β)·bᵢ₋₁.
    The level expression is spelled ONCE and textually duplicated into
    the trend term so both engines evaluate the identical IEEE DAG.
    """
    lvl = f"{a!r}D * x.l + {1.0 - a!r}D * (acc.l + acc.b)"
    return (
        "(acc, x) -> CASE WHEN acc.n = 1L THEN "
        "named_struct('l', x.l, 'b', x.l - acc.l, 'n', 2L) "
        f"ELSE named_struct('l', {lvl}, "
        f"'b', {b!r}D * (({lvl}) - acc.l) + {1.0 - b!r}D * acc.b, "
        "'n', acc.n + 1L) END"
    )


def events_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend (double exponential) smoothing per user:
    final level, trend, and one-step forecast (level + trend) over the
    event-ordered value series — the trend-aware upgrade of
    :func:`events_ewma` (EWMA lags any drifting metric; Holt tracks
    it), and like EWMA an order-DEPENDENT left fold, so the same
    one-shuffle per-user array shape. Cross-engine parity is NOT via
    list_reduce: DuckDB 1.0 mutates struct accumulators field-by-field
    mid-step ('b' would read the already-updated 'l' — see the verified
    divergence note at ORACLE_SQL["events_holt"]), so the oracle
    replays the fold as a recursive CTE with the identical per-step
    IEEE expressions. Single-event users never enter the fold — their
    level is x₀, trend 0. NULL event time is excluded (order-dependent
    fold; the events_ewma contract)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).filter(F.col("ts").isNotNull())
    arr = (
        e.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("series")
        )
        .withColumn(
            "s",
            F.expr(
                "transform(series, v -> "
                "named_struct('l', v.value, 'b', 0.0D, 'n', 1L))"
            ),
        )
    )
    fold = f"aggregate(slice(s, 2, size(s) - 1), s[0], {holt_merge_lambda()})"
    # one fold bound to a column, three getFields — structural single
    # evaluation rather than optimizer-CSE goodwill (the
    # sketch_event_stats convention)
    return (
        arr.withColumn("h", F.expr(fold))
        .select(
            "user_id",
            F.size("series").cast("long").alias("n_events"),
            F.round(F.col("h.l"), 6).alias("level"),
            F.round(F.col("h.b"), 6).alias("trend"),
            F.round(F.col("h.l") + F.col("h.b"), 6).alias("forecast"),
        )
    )


def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) candles per event type — the
    classic downsampling rollup. open/close are extremum-by-composite-
    key (first/last event in the hour, event_id tie-break); one hash
    aggregate, partial+final, no window needed. NULL event time has no
    hour bucket and no position in the open/close order (r15
    hostile-dates: min_by/arg_min treat a NULL key engine-dependently)
    — excluded, mirrored in the oracle."""
    e = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    ).filter(F.col("ts").isNotNull())
    keyed = e.withColumn("k", _event_key()).withColumn(
        "hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00")
    )
    return (
        keyed.groupBy("event_type", "hour")
        .agg(
            F.expr("min_by(value, k)").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr("max_by(value, k)").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier stats per event type: median, MAD (median
    absolute deviation), and how many events sit beyond median ±
    3·MAD. Median/MAD resist the heavy tails that wreck mean/stddev
    z-scores (the events_zscore twin) on production metrics.

    Two exact-percentile aggregates with a broadcast stats join between
    them — the events table streams through twice but never shuffles
    wide; each aggregate's partial state is the percentile buffer.
    Medians are quantized (ROUND 9) before the deviation pass so both
    engines branch identically on the 3·MAD threshold."""
    # robust-stat domain (r14): non-finite readings are missing — a NaN
    # deviation poisons the percentile differently per engine, and an
    # outlier flag on a NaN reading is meaningless (validity checks,
    # not MAD, own that signal)
    e = load(spark, sf_dir, "events").select("event_type", "value").filter(
        finite(F.col("value"))
    )
    med = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5D)"), 9).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.round(F.abs(F.col("value") - F.col("med")), 9)
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(adev, 0.5D)"), 9).alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.max("med").alias("median_value"),
            F.max("mad").alias("mad"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("adev") > F.lit(float(MAD_SIGMA)) * F.col("mad"))
                .cast("long")
            ).alias("n_outliers"),
        )
        .withColumn(
            "outlier_rate",
            F.round(
                F.col("n_outliers").cast("double")
                / F.col("n_events").cast("double"),
                6,
            ),
        )
    )


def events_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal robust outliers: median/MAD baselines per (event_type,
    hour-of-day) — the observability upgrade of
    :func:`events_mad_outliers`, whose per-type GLOBAL baseline calls a
    normal 3 a.m. quiet hour anomalous and misses a value that is wild
    *for 3 a.m.* but ordinary at noon. Same two exact-percentile passes
    and ROUND-9 quantized branch points, keyed one level finer; the
    stats join stays broadcastable (|types|·24 rows no matter the
    corpus size). Deliberately NOT a refactor of events_mad_outliers —
    that entry's implementation is frozen with r7 driver evidence.
    """
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        "value",
    ).filter(finite(F.col("value")))  # robust-stat domain (r14)
    # r15: the med/dev/mad/flag chain re-evaluated its shared subtrees —
    # the before-plan scanned events.parquet FOUR times (med twice, dev
    # twice). Exact MAD fundamentally needs two passes (median first,
    # deviations second); this is now exactly two: pass 1 computes the
    # per-(type, hod) medians (pinned — |types|·24 rows no matter the
    # corpus), pass 2 collects the sorted deviation array per key (the
    # same O(group) buffer the percentile aggregate itself holds) and
    # derives mad + the outlier count from the array in one aggregate.
    # The interpolation replicates Spark's Percentile bit-for-bit:
    # position = 0.5·(n−1) is exactly k or k.5 in binary, so the
    # branch points and (hi−pos)·lo + (pos−lo)·hi products are the
    # identical IEEE DAG, and the ROUND-9 quantization is unchanged.
    med = (
        e.groupBy("event_type", "hod")
        .agg(F.round(F.expr("percentile(value, 0.5D)"), 9).alias("med"))
        .localCheckpoint(eager=True)
    )
    dev = e.join(F.broadcast(med), ["event_type", "hod"]).withColumn(
        "adev", F.round(F.abs(F.col("value") - F.col("med")), 9)
    )
    # Buffer-shape caveat (ADVICE r15): collect_list holds one element
    # per ROW of the group, while the percentile() aggregate it
    # replaced buffers value→count PAIRS — on heavy-tie/low-cardinality
    # groups the list is strictly larger and hits the 2³¹
    # array-element cap sooner. The per-(type, hod) grain bounds a
    # group to one type's hourly slice; if a deployment's per-slice row
    # counts approach 2³¹, fall back to the pre-r15 two-pass
    # percentile formulation rather than raising group memory.
    stats = dev.groupBy("event_type", "hod").agg(
        F.max("med").alias("median_value"),
        F.array_sort(F.collect_list("adev")).alias("_adevs"),
        F.count(F.lit(1)).alias("n_events"),
    )
    pos = F.lit(0.5) * (F.col("n_events") - F.lit(1)).cast("double")
    lo = F.floor(pos)
    hi = F.ceil(pos)
    lo_v = F.element_at("_adevs", (lo + F.lit(1)).cast("int"))
    hi_v = F.element_at("_adevs", (hi + F.lit(1)).cast("int"))
    interp = (
        (hi.cast("double") - pos) * lo_v + (pos - lo.cast("double")) * hi_v
    )
    mad_col = F.round(F.when(lo == hi, lo_v).otherwise(interp), 9)
    return (
        stats.withColumn("mad", mad_col)
        .withColumn(
            "n_outliers",
            F.size(
                F.filter(
                    "_adevs",
                    lambda x: x > F.lit(float(MAD_SIGMA)) * F.col("mad"),
                )
            ).cast("long"),
        )
        .withColumn(
            "outlier_rate",
            F.round(
                F.col("n_outliers").cast("double")
                / F.col("n_events").cast("double"),
                6,
            ),
        )
        .select(
            "event_type",
            "hod",
            "median_value",
            "mad",
            "n_events",
            "n_outliers",
            "outlier_rate",
        )
    )


def transition_pairs(events: DataFrame) -> DataFrame:
    """(from_type, to_type) adjacency pairs per user in event-time
    order — the shared kernel of the batch query and the streaming
    twin's within-batch leg.

    NULL event time has no position in the adjacency order (r15
    hostile-dates: Spark's NULLS-FIRST lead paired it with the FIRST
    event, DuckDB's NULLS-LAST with the last — a corrupt row invents a
    transition edge that never happened) — excluded, mirrored in the
    oracle."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .filter(F.col("ts").isNotNull())
        .withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences:
    count and row-normalized probability for each (from_type, to_type)
    edge. One window pass (user-partitioned lead — the sessionize
    shuffle) plus a tiny |types|² aggregate; the probability
    normalizer is a window over the aggregated matrix, so it costs
    nothing at scale."""
    pairs = transition_pairs(load(spark, sf_dir, "events"))
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wf).cast("double"), 6
        ).alias("prob"),
    )


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent view/click within the 3-day window; purchases with no
    eligible touch report as 'none'. Output per touch type: conversions
    attributed, revenue credited, and mean hours-to-convert.

    Single user-partitioned window pass (IGNORE NULLS last_value over
    strictly-preceding rows) — the same shuffle sessionize pays, no
    self-join. The hours average divides two exact integer sums, so
    both engines render the identical double. NULL event time has no
    position in the carry order and no convert-lag (r15 hostile-dates)
    — excluded, mirrored in the oracle."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*TOUCH_TYPES)
    carried = e.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    window_us = ATTRIBUTION_WINDOW_DAYS * 86_400_000_000
    purchases = carried.filter(
        F.col("event_type") == CONVERSION_TYPE
    ).select(
        "value",
        F.when(
            F.col("touch_ts").isNotNull()
            & (
                F.unix_micros("ts") - F.unix_micros("touch_ts")
                <= F.lit(window_us)
            ),
            F.col("touch_type"),
        )
        .otherwise(F.lit("none"))
        .alias("touch"),
        (F.unix_micros("ts") - F.unix_micros("touch_ts")).alias("lag_us"),
    )
    return purchases.groupBy("touch").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("attributed_value"),
        F.round(
            F.sum(F.when(F.col("touch") != "none", F.col("lag_us")))
            .cast("double")
            / F.sum((F.col("touch") != "none").cast("long")).cast("double")
            / F.lit(3.6e9),
            4,
        ).alias("avg_hours_to_convert"),
    )


SESSION_GAP_S = 1800
PATHS_TOPK = 15


def top_conversion_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common within-session event-type paths that end in a
    purchase: sessionize (the 30-min-gap convention shared with
    sessionize_events), render each converting session's ordered type
    sequence as 'a>b>c', count, keep the top 15 (count desc, path asc).

    The path string is built by an ordered fold inside the per-session
    aggregate (sort_array over (ts, event_id) structs → transform →
    concat_ws) — one user-partitioned window pass for session ids plus
    one session-keyed aggregate; path strings are bounded by session
    length, and only (user, session, type, ts) columns ever shuffle.
    Top-k is TakeOrderedAndProject. NULL event time has no position on
    the session timeline (r15, the sessionize_events rule) — excluded,
    mirrored in the oracle.

    Examined r16, left alone (plans/r16/top_conversion_paths_before.txt):
    1 scan, 2 exchanges — the session aggregate reuses the user_id
    window exchange (hashpartitioning(user_id) satisfies the
    (user_id, session_id) clustering), the partial/final collect_list
    pair runs back-to-back in that stage, and the conversion flag is
    folded into the same aggregate, so no second pass over events
    exists to remove. The only row-level exchange carries 4 narrow
    columns. Already the §2.4 shared-exchange shape."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
            ).alias("path"),
            F.max(
                (F.col("event_type") == CONVERSION_TYPE).cast("int")
            ).alias("converted"),
        )
        .filter(F.col("converted") == 1)
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(PATHS_TOPK)
    )


HW_ALPHA = 0.3
HW_BETA = 0.2
HW_GAMMA = 0.3
HW_PERIOD = 24


def holt_winters_merge_lambda(
    a: float = HW_ALPHA, b: float = HW_BETA, g: float = HW_GAMMA
) -> str:
    """The additive Holt-Winters step as a fold lambda over
    (l, b, s[period], n) struct accumulators; elements are (x, p)
    with p the 0-based season position.

    lᵢ = α·(xᵢ − s_old[p]) + (1−α)·(lᵢ₋₁ + bᵢ₋₁)
    bᵢ = β·(lᵢ − lᵢ₋₁) + (1−β)·bᵢ₋₁
    s[p] ← γ·(xᵢ − lᵢ) + (1−γ)·s_old[p]        (other slots unchanged)

    As with :func:`holt_merge_lambda`, the level expression is spelled
    once and textually duplicated into the trend and seasonal terms so
    both engines evaluate the identical IEEE DAG; the seasonal array
    updates positionally via ``transform``'s 0-based index (the DuckDB
    twin rebuilds the list with 1-based slices — same values)."""
    lvl = (
        f"{a!r}D * (x.x - element_at(acc.s, x.p + 1)) "
        f"+ {1.0 - a!r}D * (acc.l + acc.b)"
    )
    return (
        "(acc, x) -> named_struct("
        f"'l', {lvl}, "
        f"'b', {b!r}D * (({lvl}) - acc.l) + {1.0 - b!r}D * acc.b, "
        "'s', transform(acc.s, (v, i) -> CASE WHEN i = x.p THEN "
        f"{g!r}D * (x.x - ({lvl})) + {1.0 - g!r}D * v ELSE v END), "
        "'n', acc.n + 1L)"
    )


def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple exponential) smoothing of each
    event type's HOURLY total-value series with hour-of-day seasonality
    (period 24): final level, trend, the seasonal component of the next
    hour slot, and the one-step forecast level + trend + season.

    The seasonal upgrade of :func:`events_holt`: a daily-rhythm metric
    (traffic, spend) defeats a trendline; the 24-slot seasonal state
    absorbs it. Zeros-init variant (l₀ = x₀, b₀ = 0, s = 0⃗ — no
    first-season average pass), documented rather than classical, so
    the fold is a pure left fold and the streaming twin can seed it.

    Scale shape: the hourly pre-aggregation is the only wide exchange
    (DECIMAL(18,9) quantized sums → order-free exactness); per-type
    bucket arrays are bounded by hours-in-retention, not event count —
    a year is 8 760 elements. The per-step seasonal array rewrite is
    period-bounded (24 doubles). Cross-engine parity is the recursive-
    CTE replay, as for Holt (multi-field fold; see the list_reduce
    divergence note at ORACLE_SQL["events_holt"]).

    Examined r16, left alone (plans/r16/events_holt_winters_before.txt):
    1 scan + 2 exchanges is the floor — the hourly pre-aggregation is
    the only event-count-sized exchange (partial map-side sums), the
    per-type exchange carries hours-in-retention rows, and the HW fold
    is a codegen expression over the sorted array. The second exchange
    cannot reuse the first (hashpartitioning(type, hb) does not
    satisfy clustering by (type) — superset, not subset)."""
    # decimal-exact domain (r14): out-of-range readings are missing;
    # NULL event time has no hourly bucket (r15, the events_ewma rule)
    e = load(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).filter(
        in_decimal_domain(F.col("value"), DECIMAL_18_9_BOUND)
        & F.col("ts").isNotNull()
    )
    buckets = (
        e.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hb")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,9)")).alias("xd")
        )
        .select(
            "event_type",
            "hb",
            F.col("xd").cast("double").alias("x"),
            # int, not long: element_at's index parameter is INT-typed
            F.hour("hb").cast("int").alias("p"),
        )
    )
    arr = buckets.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("hb", "x", "p"))).alias(
            "series"
        )
    )
    init = (
        "named_struct('l', series[0].x, 'b', 0.0D, "
        f"'s', array_repeat(0.0D, {HW_PERIOD}), 'n', 1L)"
    )
    fold = (
        f"aggregate(slice(series, 2, size(series) - 1), {init}, "
        f"{holt_winters_merge_lambda()})"
    )
    return (
        arr.withColumn("h", F.expr(fold))
        .withColumn(
            "p_next",
            (F.element_at("series", -1).getField("p") + 1) % HW_PERIOD,
        )
        .select(
            "event_type",
            F.size("series").cast("long").alias("n_buckets"),
            F.round(F.col("h.l"), 6).alias("level"),
            F.round(F.col("h.b"), 6).alias("trend"),
            F.round(
                F.element_at(F.col("h.s"), F.col("p_next") + 1), 6
            ).alias("season_next"),
            F.round(
                F.col("h.l")
                + F.col("h.b")
                + F.element_at(F.col("h.s"), F.col("p_next") + 1),
                6,
            ).alias("forecast"),
        )
    )


CUSUM_K = 0.5   # slack, in sigmas: drift below k·sigma accumulates nothing
CUSUM_H = 4.0   # decision threshold, in sigmas


def cusum_merge_lambda(k: float = CUSUM_K, h: float = CUSUM_H) -> str:
    """Two-sided CUSUM step as a fold lambda over
    (sp, sn, na, fa, i) struct accumulators; elements carry x.
    References row columns ``mu`` / ``ks`` / ``hs`` (baseline mean,
    k·sigma, h·sigma) from the enclosing row — Spark resolves outer
    columns inside ``aggregate`` lambdas.

    sp ← max(0, sp + (x − μ − kσ));  sn ← max(0, sn + (μ − x − kσ));
    alarm when either side exceeds hσ. The sp/sn expressions are
    spelled once and textually duplicated into the alarm tests (the
    holt_merge_lambda convention) so both engines evaluate one IEEE
    DAG."""
    sp = "greatest(0.0D, acc.sp + (x.x - mu - ks))"
    sn = "greatest(0.0D, acc.sn + (mu - x.x - ks))"
    alarm = f"(({sp}) > hs OR ({sn}) > hs)"
    return (
        "(acc, x) -> named_struct("
        f"'sp', {sp}, "
        f"'sn', {sn}, "
        f"'na', acc.na + CASE WHEN {alarm} THEN 1L ELSE 0L END, "
        f"'fa', CASE WHEN acc.fa > 0L THEN acc.fa "
        f"WHEN {alarm} THEN acc.i + 1L ELSE 0L END, "
        "'i', acc.i + 1L)"
    )


def events_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoint scan over each event type's hourly
    total-value series: number of alarmed buckets, the first alarm's
    index and hour, and the final cumulative sums.

    The level-SHIFT detector the MAD family can't be: a persistent
    small drift (each point individually inside the robust band)
    accumulates in sp/sn and crosses h·sigma, while a point outlier
    barely moves it — the complementary failure mode to
    :func:`events_mad_outliers`.

    Baseline mu/sigma come from DECIMAL-quantized sums (x and x², both
    order-free exact), so the only order-dependent computation is the
    CUSUM fold itself — replayed in the oracle as a recursive CTE (the
    events_holt pattern; 5-field accumulator). sigma = 0 (constant
    series) makes both thresholds 0 and the strict > never fires.

    Scale shape: identical to the other hourly-series operators — one
    wide exchange (the hourly pre-aggregation), per-type arrays bounded
    by hours-in-retention."""
    # decimal-exact domain (r14): out-of-range readings are missing;
    # NULL event time has no hourly bucket (r15, the events_ewma rule)
    e = load(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).filter(
        in_decimal_domain(F.col("value"), DECIMAL_18_9_BOUND)
        & F.col("ts").isNotNull()
    )
    buckets = (
        e.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hb")
        )
        .agg(F.sum(F.col("value").cast("decimal(18,9)")).alias("xd"))
        .select(
            "event_type",
            "hb",
            "xd",
            F.col("xd").cast("double").alias("x"),
            F.expr(
                "cast(cast(xd as double) * cast(xd as double) "
                "as decimal(28,9))"
            ).alias("xsq"),
        )
    )
    per_type = buckets.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("hb", "x"))).alias("series"),
        F.sum("xd").alias("sx"),
        F.sum("xsq").alias("sxx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    stats = (
        per_type.withColumn("mu", F.expr("cast(sx as double) / n"))
        .withColumn(
            "sigma",
            F.expr(
                "sqrt(greatest(0.0D, cast(sxx as double) / n - mu * mu))"
            ),
        )
        .withColumn("ks", F.expr(f"{CUSUM_K!r}D * sigma"))
        .withColumn("hs", F.expr(f"{CUSUM_H!r}D * sigma"))
    )
    seed = (
        "named_struct('sp', 0.0D, 'sn', 0.0D, "
        "'na', 0L, 'fa', 0L, 'i', 0L)"
    )
    fold = f"aggregate(series, {seed}, {cusum_merge_lambda()})"
    return (
        stats.withColumn("c", F.expr(fold))
        .select(
            "event_type",
            F.col("n").alias("n_buckets"),
            F.col("c.na").alias("n_alarms"),
            F.col("c.fa").alias("first_alarm_idx"),
            F.expr(
                "CASE WHEN c.fa > 0L THEN date_format("
                "element_at(series, cast(c.fa as int)).hb, "
                "'yyyy-MM-dd HH:00') END"
            ).alias("first_alarm_hour"),
            F.round(F.col("c.sp"), 6).alias("cusum_pos"),
            F.round(F.col("c.sn"), 6).alias("cusum_neg"),
        )
    )


# hours since 2024-01-01 00:00 UTC — keeps the regression x small so
# every moment sum stays inside the 2^53 scaled-unit parity bound
# (see events_linear_trend docstring)
TREND_EPOCH_HOURS = 1_704_067_200 // 3600


def linear_trend_final(stats: DataFrame) -> DataFrame:
    """OLS closed form over exact moment sums — shared verbatim by the
    batch operator and the streaming twin's serve step so their final
    IEEE DAGs are identical. Input columns: event_type, n, sx, sxx,
    sy, sxy, syy."""
    return (
        stats.withColumn("nd", F.expr("cast(n as double)"))
        .withColumn(
            "den",
            F.expr(
                "cast(sxx as double) - cast(sx as double) "
                "* cast(sx as double) / nd"
            ),
        )
        .withColumn(
            "num",
            F.expr(
                "cast(sxy as double) - cast(sx as double) "
                "* cast(sy as double) / nd"
            ),
        )
        .withColumn(
            "syc",
            F.expr(
                "cast(syy as double) - cast(sy as double) "
                "* cast(sy as double) / nd"
            ),
        )
        .withColumn(
            "slope", F.expr("CASE WHEN den = 0.0D THEN NULL ELSE num / den END")
        )
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            F.round("slope", 6).alias("slope_per_hour"),
            F.round(
                F.expr(
                    "CASE WHEN den = 0.0D THEN NULL ELSE "
                    "cast(sy as double) / nd "
                    "- (num / den) * (cast(sx as double) / nd) END"
                ),
                6,
            ).alias("intercept"),
            F.round(
                F.expr(
                    "CASE WHEN den = 0.0D OR syc = 0.0D THEN NULL "
                    "ELSE num * num / (den * syc) END"
                ),
                6,
            ).alias("r2"),
        )
    )


def linear_trend_partials(e: DataFrame) -> DataFrame:
    """Per-type exact moment sums for the OLS trend — the map-side
    shape both the batch operator and the streaming twin aggregate
    (partials are plain SUMs, so they merge commutatively across
    batches)."""
    # decimal-exact domain (r14): out-of-range readings are missing —
    # shared by the batch operator AND the streaming twin (both build
    # their partials here)
    prep = e.filter(
        in_decimal_domain(F.col("value"), DECIMAL_18_3_BOUND)
    ).select(
        "event_type",
        F.expr(
            f"unix_micros(ts) div 3600000000 - {TREND_EPOCH_HOURS}L"
        ).alias("x"),
        F.expr("cast(value as decimal(18,3))").alias("yd"),
    )
    return prep.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.expr("sum(x * x)").alias("sxx"),
        F.expr("cast(sum(yd) as decimal(28,3))").alias("sy"),
        F.expr(
            "cast(sum(cast(x as decimal(10,0)) * yd) as decimal(38,3))"
        ).alias("sxy"),
        F.expr(
            "cast(sum(cast(cast(yd as double) * cast(yd as double) "
            "as decimal(24,3))) as decimal(28,3))"
        ).alias("syy"),
    )


def events_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend line over (event hour, value): slope per
    hour, intercept (at the 2024-01-01 epoch), and R² — the
    'is this metric drifting, and how fast' companion to the
    smoothing/changepoint family.

    Pure partial+final aggregation: one shuffle of six moment sums per
    type, no arrays, no window — the best possible 100 TB shape.

    Cross-engine numerics: a decimal→double CAST is only bit-identical
    across engines while the decimal's SCALED units stay under 2^53
    (above it, DuckDB's int128→double-then-divide double-rounds where
    the JVM rounds once — verified with a 1-ulp divergence at
    123456789.987654321 scaled 1e9). So the operator quantizes y at 3
    decimals and measures x in hours since 2024-01-01 (small ints):
    every sum here is orders of magnitude inside the bound at gate
    scale. The closed form then runs in doubles with textually
    identical expressions on both engines (single-hour types: slope
    NULL; constant y: R² NULL)."""
    e = load(spark, sf_dir, "events").select("event_type", "ts", "value")
    return linear_trend_final(linear_trend_partials(e))
