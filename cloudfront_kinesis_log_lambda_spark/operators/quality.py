"""Data-quality operators: distribution-drift monitoring (PSI) and
declarative constraint validation.

``events_psi_drift`` computes the Population Stability Index of the
event value distribution per event type between a REFERENCE window
and a CURRENT window — the standard "has my feature distribution
moved" monitor in front of any model or curation pipeline.

``orders_quality_checks`` is the Deequ-style constraint suite: a
small set of declarative checks (completeness, uniqueness, set
membership, range, referential integrity) evaluated in as few passes
as the checks allow, emitting one (check, metric, passed) row each —
the validation gate a 100 TB ingest runs before promoting a drop.

PSI design choices (all deterministic and engine-portable):

- Equal-WIDTH bins over the reference window's [min, max] per type
  (10 bins). Equal-width is the deterministic PSI variant — quantile
  edges would drag in cross-engine interpolation semantics for no
  monitoring benefit. Current-window values outside the reference
  range clamp into the edge bins (bin 0 / bin 9), which is exactly
  where out-of-range drift should land.
- Additive 0.5 smoothing per bin (p = (n_bin + 0.5)/(n_total + 5)),
  so empty bins are defined and PSI is finite — the add-k choice
  mirrors the bigram LM scorer (operators/corpus.py).
- Drift is only DEFINED for types present in the reference window:
  binning needs reference min/max, so current-only types drop out of
  the inner stats join (documented contract; a brand-new type is a
  schema event, not a drift score).

Scale shape: one tiny per-type stats aggregate, broadcast into a
single full scan that bins every row, then ONE (type, bin) partial
aggregate — 10 rows per type leave the exchange regardless of input
size. The streaming twin (streaming/psi.py) accumulates those same
(type, bin) SUM partials against frozen reference stats, so its
read-side PSI is bit-identical to this batch operator's.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.relational import load
from cloudfront_kinesis_log_lambda_spark.operators.util import (
    DECIMAL_18_9_BOUND,
    finite,
    in_decimal_domain,
)

# events span 2024-01-01..2024-01-30; split the month into a
# reference fortnight and a current fortnight
PSI_SPLIT = datetime.datetime(2024, 1, 16)
PSI_BINS = 10
PSI_ROUND = 6
# textbook thresholds: <0.1 stable, 0.1-0.2 moderate, >0.2 drifted
PSI_DRIFT_THRESHOLD = 0.2


def psi_ref_stats(ref: DataFrame, type_col: str, value_col: str) -> DataFrame:
    """Per-type reference bin geometry: (type, vmin, vmax).

    Non-finite values are excluded (r14 hostile sweep): a single NaN
    reading would poison vmax under both engines' NaN-is-greatest
    aggregation, collapsing every bin expression to NaN."""
    return (
        ref.filter(finite(F.col(value_col)))
        .groupBy(F.col(type_col).alias("event_type"))
        .agg(F.min(value_col).alias("vmin"), F.max(value_col).alias("vmax"))
    )


def psi_bin_expr(value: F.Column, vmin: F.Column, vmax: F.Column) -> F.Column:
    """Equal-width bin index in [0, PSI_BINS-1], clamped at the edges.

    The expression shape ((v - min) / (max - min) * BINS, floor,
    clamp) is mirrored verbatim in the DuckDB oracle — IEEE doubles
    make the division/multiply bit-identical across engines, so the
    integer bin is exactly reproducible. Degenerate ranges
    (vmax == vmin) put everything in bin 0.
    """
    raw = F.floor(
        (value - vmin) / (vmax - vmin) * F.lit(float(PSI_BINS))
    )
    clamped = F.least(
        F.lit(PSI_BINS - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"), raw),
    )
    return F.when(vmax == vmin, F.lit(0).cast("long")).otherwise(clamped)


def psi_bin_counts(
    events: DataFrame,
    stats: DataFrame,
    split: datetime.datetime,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One-scan (event_type, bin, n_ref, n_cur) counts: every row is
    binned against the broadcast reference geometry and counted into
    its window by a conditional aggregate — the only wide exchange in
    the whole operator, carrying 10·|types| partial rows."""
    is_ref = F.col(ts_col) < F.lit(split)
    # non-finite readings have no position on the binned real line —
    # excluded from BOTH windows (same rule as psi_ref_stats, r14)
    binned = (
        events.filter(finite(F.col(value_col)))
        .select(
            F.col(type_col).alias("event_type"),
            F.col(value_col).alias("v"),
            is_ref.alias("is_ref"),
        )
        .join(F.broadcast(stats), "event_type")
    )
    return (
        binned.select(
            "event_type",
            psi_bin_expr(F.col("v"), F.col("vmin"), F.col("vmax")).alias(
                "bin"
            ),
            "is_ref",
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("n_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("n_cur"),
        )
    )


def psi_from_counts(counts: DataFrame, stats: DataFrame) -> DataFrame:
    """PSI per type from (event_type, bin, n_ref, n_cur) counts.

    Expands to the full 10-bin grid per reference type (empty bins
    carry the 0.5 smoothing mass, and asymmetric totals make even an
    all-empty bin contribute), then folds Σ (p_cur − p_ref)·ln(p_cur/
    p_ref). Also reports each type's worst bin by |contribution|.
    """
    grid = stats.select("event_type").select(
        "event_type",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(PSI_BINS - 1).cast("long"))
        ).alias("bin"),
    )
    filled = grid.join(counts, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
    )
    totals = filled.groupBy("event_type").agg(
        F.sum("n_ref").cast("long").alias("t_ref"),
        F.sum("n_cur").cast("long").alias("t_cur"),
    )
    half = F.lit(0.5)
    pad = F.lit(float(PSI_BINS) * 0.5)
    p_ref = (F.col("n_ref").cast("double") + half) / (
        F.col("t_ref").cast("double") + pad
    )
    p_cur = (F.col("n_cur").cast("double") + half) / (
        F.col("t_cur").cast("double") + pad
    )
    contrib = filled.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "bin",
        "n_ref",
        "n_cur",
        "t_ref",
        "t_cur",
        ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("c"),
    )
    # worst_bin rides the SAME aggregate as the psi fold (review
    # finding: a second groupBy + join duplicated the contrib subtree
    # for no gain). Deterministic arg-max: lexicographic struct max
    # breaks |c| ties toward the larger bin (max_by alone is
    # tie-nondeterministic).
    return (
        contrib.groupBy("event_type")
        .agg(
            F.max("t_ref").alias("n_ref"),
            F.max("t_cur").alias("n_cur"),
            F.round(F.sum("c"), PSI_ROUND).alias("psi"),
            F.max(
                F.struct(
                    F.abs(F.col("c")).alias("a"), F.col("bin").alias("b")
                )
            )["b"].alias("worst_bin"),
        )
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            "psi",
            (F.col("psi") > F.lit(PSI_DRIFT_THRESHOLD)).alias("drifted"),
            "worst_bin",
        )
    )


def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of the per-type event value distribution, reference
    fortnight vs current fortnight of the events month."""
    events = load(spark, sf_dir, "events").select("event_type", "ts", "value")
    stats = psi_ref_stats(
        events.filter(F.col("ts") < F.lit(PSI_SPLIT)), "event_type", "value"
    )
    counts = psi_bin_counts(events, stats, PSI_SPLIT)
    return psi_from_counts(counts, stats)


# --- declarative constraint suite ----------------------------------------

# (check name, pass threshold). Metrics are fractions in [0, 1]; a
# check passes when metric >= threshold.
QUALITY_THRESHOLDS = {
    "custkey_complete": 1.0,
    "orderkey_unique": 1.0,
    "status_in_set": 1.0,
    "totalprice_positive": 1.0,
    "priority_format": 1.0,
    "orderdate_in_range": 1.0,
    "custkey_resolves": 1.0,
}


def quality_row_conditions() -> dict[str, F.Column]:
    """The row-local constraint predicates, keyed by check name —
    shared by the batch suite and the streaming twin so the counted
    condition can never drift between them."""
    return {
        "custkey_complete": F.col("o_custkey").isNotNull(),
        "status_in_set": F.col("o_orderstatus").isin("O", "F", "P"),
        "totalprice_positive": F.col("o_totalprice") > 0,
        "priority_format": F.substring("o_orderpriority", 1, 1).isin(
            "1", "2", "3", "4", "5"
        )
        & (F.substring("o_orderpriority", 2, 1) == F.lit("-")),
        "orderdate_in_range": (
            F.col("o_orderdate") >= F.lit(datetime.datetime(1995, 1, 1))
        )
        & (F.col("o_orderdate") < F.lit(datetime.datetime(2002, 1, 1))),
    }


def quality_verdicts(long_rows: DataFrame) -> DataFrame:
    """Attach the pass/fail verdict to long-form (check, metric) rows
    via the threshold map — the shared final step. A NULL metric (no
    data yet) FAILS: a gate that has seen nothing has verified
    nothing, and downstream all(passed) logic needs a real boolean."""
    thresholds = F.create_map(
        *[
            part
            for name, thr in QUALITY_THRESHOLDS.items()
            for part in (F.lit(name), F.lit(thr))
        ]
    )
    return long_rows.select(
        "check",
        "metric",
        F.coalesce(
            F.col("metric") >= thresholds[F.col("check")], F.lit(False)
        ).alias("passed"),
    )


def quality_checks(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Deequ-style validation: one (check, metric, passed) row per
    declared constraint over the orders table.

    Row-local checks (completeness, set membership, range, format)
    evaluate in ONE conditional-aggregate pass; uniqueness rides the
    same pass as a distinct-count; referential integrity is the one
    check that genuinely needs a second input — a keyed LEFT SEMI
    count against customer. Output is long-form so a 100-check suite
    is still one scan + one tiny union, never N scans.
    """
    n = F.count(F.lit(1)).cast("double")

    # zero-guard: an empty input yields NULL metrics (and a failing
    # verdict via quality_verdicts' coalesce), not ANSI DIVIDE_BY_ZERO
    def frac(cond: F.Column) -> F.Column:
        return F.round(
            F.when(
                n > 0,
                F.sum(F.when(cond, 1).otherwise(0)).cast("double") / n,
            ),
            PSI_ROUND,
        )

    conds = quality_row_conditions()
    status_ok = conds["status_in_set"]
    prio_ok = conds["priority_format"]
    date_ok = conds["orderdate_in_range"]

    wide = orders.agg(
        frac(conds["custkey_complete"]).alias("custkey_complete"),
        F.round(
            F.when(
                n > 0, F.count_distinct(F.col("o_orderkey")).cast("double") / n
            ),
            PSI_ROUND,
        ).alias("orderkey_unique"),
        frac(status_ok).alias("status_in_set"),
        frac(conds["totalprice_positive"]).alias("totalprice_positive"),
        frac(prio_ok).alias("priority_format"),
        frac(date_ok).alias("orderdate_in_range"),
        # the count the referential ratio divides by rides the SAME
        # one-pass aggregate (review finding: a dedicated count(*)
        # scan tripled the fact-table passes)
        n.alias("n_all"),
    )
    row_checks = wide.unpivot(
        [], list(QUALITY_THRESHOLDS)[:6], "check", "metric"
    )

    resolved = (
        orders.join(
            customer,
            orders.o_custkey == customer.c_custkey,
            "left_semi",
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n_ok"))
        .join(F.broadcast(wide.select("n_all")))
        .select(
            F.lit("custkey_resolves").alias("check"),
            F.round(
                F.expr("try_divide(n_ok, n_all)"), PSI_ROUND
            ).alias("metric"),
        )
    )

    return quality_verdicts(row_checks.unionByName(resolved))


def orders_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").select("c_custkey")
    return quality_checks(orders, customer)


# --- Benford first-digit audit --------------------------------------------

# log10(1 + 1/d) for d = 1..9 — the Benford reference distribution
BENFORD_ROUND = 6


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution of a positive measure vs
    Benford's law — the classic fabricated-data / unit-mixing audit
    for financial-style columns.

    One row per digit 1-9: observed count and proportion, the Benford
    expectation, and the digit's chi-square contribution; plus the
    table-level chi² statistic and the mean absolute deviation (MAD,
    the Nigrini conformity measure) repeated on every row so the
    long-form output is self-contained.

    The first digit is extracted arithmetically (value / 10^floor(
    log10 v) truncated), never via string formatting — float-to-text
    is an engine-specific rendering. Non-positive values are excluded
    (Benford is defined on positive magnitudes). One conditional-
    aggregate pass over the fact rows; the digit grid joins
    broadcast-side so digits with zero observations still appear.
    """
    spark = df.sparkSession
    v = F.col(value_col)
    digits = df.filter((v > 0) & finite(v)).select(
        benford_digit_expr(v).alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    return benford_from_counts(spark, counts)


def benford_digit_expr(v: F.Column) -> F.Column:
    """First significant digit of a positive value, arithmetically —
    the map-side expression shared by the batch audit and the
    streaming twin (streaming/stats.py).

    Boundary correction (review finding): for values an ulp below a
    power of ten, floor(log10 v) rounds the exponent UP and the
    mantissa ratio lands just under 1 (true digit 9); an ulp above,
    the exponent can round DOWN and the ratio reaches 10 (true digit
    1). Both corrections are pure arithmetic on the same doubles, so
    engine parity holds — without them those observations landed on
    digit 0/10 and silently fell off the 1-9 grid."""
    raw = F.floor(
        v / F.pow(F.lit(10.0), F.floor(F.log10(v)).cast("double"))
    ).cast("long")
    return (
        F.when(raw < 1, F.lit(9).cast("long"))
        .when(raw > 9, F.lit(1).cast("long"))
        .otherwise(raw)
    )


def benford_from_counts(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """Benford finalizer over (digit, n_obs) counts — shared verbatim
    by the batch audit and the streaming twin, so identical merged
    counts yield identical statistics."""
    grid = spark.range(1, 10).select(F.col("id").alias("digit"))
    # r16 (guide §2.4): the 9-row filled grid feeds the n_total
    # aggregate, the χ²/MAD stats aggregate AND the output spine — four
    # copies of the ``counts`` subtree (a full fact scan each in the
    # batch audit) nested through broadcast builds that ReuseExchange
    # cannot all dedupe. Pinning 9 rows makes every consumer read the
    # pin; the fact rows are scanned exactly once, in the pin build.
    # (Streaming twin: digits() is a serve-time call, so the eager
    # 9-row materialization is paid where the serve already executes.)
    filled = (
        grid.join(F.broadcast(counts), "digit", "left")
        .select(
            "digit", F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs")
        )
        .localCheckpoint(eager=True)
    )
    total = filled.agg(F.sum("n_obs").cast("long").alias("n_total"))
    base = filled.join(F.broadcast(total)).select(
        "digit",
        "n_obs",
        "n_total",
        # try_divide: zero positive values in → NULL metrics out, not
        # an ANSI DIVIDE_BY_ZERO (the streaming twin reads before its
        # first positive batch)
        F.expr(
            "try_divide(cast(n_obs as double), cast(n_total as double))"
        ).alias("p_obs_raw"),
        F.log10(
            F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")
        ).alias("p_exp_raw"),
    )
    contrib = base.withColumn(
        "chi2_term",
        F.expr(
            "try_divide("
            "(cast(n_obs as double) - p_exp_raw * cast(n_total as double))"
            " * (cast(n_obs as double)"
            "    - p_exp_raw * cast(n_total as double)), "
            "p_exp_raw * cast(n_total as double))"
        ),
    ).withColumn("abs_dev", F.abs(F.col("p_obs_raw") - F.col("p_exp_raw")))
    stats = contrib.agg(
        F.sum("chi2_term").alias("chi2_raw"),
        (F.sum("abs_dev") / F.lit(9.0)).alias("mad_raw"),
    )
    return contrib.join(F.broadcast(stats)).select(
        "digit",
        "n_obs",
        F.round("p_obs_raw", BENFORD_ROUND).alias("p_obs"),
        F.round("p_exp_raw", BENFORD_ROUND).alias("p_benford"),
        F.round("chi2_term", BENFORD_ROUND).alias("chi2_term"),
        F.round("chi2_raw", BENFORD_ROUND).alias("chi2"),
        F.round("mad_raw", BENFORD_ROUND).alias("mad"),
    )


def orders_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford audit of order totals — synthetic TPC-H prices span
    barely two orders of magnitude, so the audit SHOULD flag
    non-conformity (MAD >> 0.012): the negative control that proves
    the detector isn't vacuously green."""
    return benford_digits(
        load(spark, sf_dir, "orders").select("o_totalprice"), "o_totalprice"
    )


# --- two-sample Kolmogorov-Smirnov drift test ------------------------------

KS_ALPHA_COEF = 1.358  # two-sided alpha = 0.05


def ks_two_sample(
    df: DataFrame,
    type_col: str,
    value_col: str,
    is_ref: F.Column,
    quantize: int | None = 3,
) -> DataFrame:
    """Per-type two-sample Kolmogorov-Smirnov statistic between the
    reference rows (``is_ref`` true) and the rest: D = max |ECDF_ref −
    ECDF_cur|, with the α=0.05 critical value and the drift verdict —
    the unbinned companion to the PSI monitor (PSI sees WHERE mass
    moved; KS is the distribution-free "did it move" test).

    Scale shape: rows collapse to the distinct (type, value) grid in
    ONE aggregate (the only exchange that sees fact rows); the ECDF
    cumulative runs as a per-type window over that grid. The grid —
    not the row count — bounds the window, and ``quantize`` rounds
    values first (mirrored in the oracle) so a continuous column
    cannot make the grid row-grain: the same distinct-domain-bounded
    contract as the n-gram exchanges. D at a quantized grid point is
    the exact D of the quantized distributions.
    """
    v = F.col(value_col)
    if quantize is not None:
        v = F.round(v, quantize)
    grid = (
        df.select(
            F.col(type_col).alias("event_type"),
            v.alias("v"),
            is_ref.alias("is_ref"),
        )
        .groupBy("event_type", "v")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("c_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("c_cur"),
        )
    )
    return ks_from_grid(grid)


def ks_from_grid(grid: DataFrame) -> DataFrame:
    """KS finalizer over an (event_type, v, c_ref, c_cur) grid —
    shared verbatim by the batch test and the streaming twin
    (streaming/stats.py): grid counts are SUM-mergeable, so the
    accumulated store feeds identical integers into identical math."""
    from pyspark.sql.window import Window

    # totals first (KS is undefined for an empty sample: types with
    # either side empty drop out of the inner join)
    totals = grid.groupBy("event_type").agg(
        F.sum("c_ref").cast("long").alias("n_ref"),
        F.sum("c_cur").cast("long").alias("n_cur"),
    ).filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "event_type",
        F.sum("c_ref").over(w).cast("long").alias("cum_ref"),
        F.sum("c_cur").over(w).cast("long").alias("cum_cur"),
    )
    per_type = (
        cum.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            F.abs(
                F.col("cum_ref").cast("double")
                / F.col("n_ref").cast("double")
                - F.col("cum_cur").cast("double")
                / F.col("n_cur").cast("double")
            ).alias("d"),
        )
        .groupBy("event_type")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.max("d").alias("d_raw"),
        )
    )
    crit = F.lit(KS_ALPHA_COEF) * F.sqrt(
        (F.col("n_ref") + F.col("n_cur")).cast("double")
        / (F.col("n_ref").cast("double") * F.col("n_cur").cast("double"))
    )
    return per_type.select(
        "event_type",
        "n_ref",
        "n_cur",
        F.round("d_raw", PSI_ROUND).alias("ks_d"),
        F.round(crit, PSI_ROUND).alias("ks_crit"),
        (F.col("d_raw") > crit).alias("drifted"),
    )


def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS drift test of the per-type event value distribution,
    reference fortnight vs current fortnight (the PSI entry's
    unbinned companion over the same windows)."""
    e = load(spark, sf_dir, "events").select("event_type", "ts", "value")
    return ks_two_sample(
        e, "event_type", "value", F.col("ts") < F.lit(PSI_SPLIT)
    )


# --- embedding (vector-space) drift ----------------------------------------


def embedding_centroid_drift(
    emb: DataFrame, is_ref: F.Column, label_col: str = "label"
) -> DataFrame:
    """Vector-space drift per label between a reference and a current
    cohort: centroid cosine similarity and L2 distance — the
    embedding-column counterpart to the scalar PSI/KS monitors (a
    retrained encoder or upstream content shift moves centroids long
    before any scalar column notices).

    Numerics: per-dimension sums quantize each float at DECIMAL(18,9)
    first (the house order-free exactness tool — float32 carries ~7
    significant digits, so 9 fractional digits lose nothing), making
    the centroid sums exact integers in scaled units; only the final
    mean/cosine math runs in doubles, rounded at the edge.

    Scale shape: one posexplode pass reduces to (label, dim) grain —
    the only exchange that sees vector elements, carrying
    |labels|·|dims| partial rows regardless of corpus size; cohort
    counts ride a separate row-grain aggregate and join broadcast.
    Labels with an empty cohort drop (drift undefined), mirroring the
    PSI/KS contracts.
    """
    counts = (
        emb.select(F.col(label_col).alias("label"), is_ref.alias("is_ref"))
        .groupBy("label")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("n_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("n_cur"),
        )
        .filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
    )
    exploded = emb.select(
        F.col(label_col).alias("label"),
        is_ref.alias("is_ref"),
        F.posexplode("embedding").alias("dim", "val"),
    ).filter(
        # decimal-exact domain (r14): non-representable elements are
        # missing for THIS statistic (per-dim, not whole-vector)
        in_decimal_domain(F.col("val"), DECIMAL_18_9_BOUND)
    ).select(
        "label",
        "dim",
        "is_ref",
        F.expr("cast(val as decimal(18,9))").alias("vd"),
    )
    per_dim = exploded.groupBy("label", "dim").agg(
        F.expr(
            "cast(sum(case when is_ref then vd end) as decimal(28,9))"
        ).alias("s_ref"),
        F.expr(
            "cast(sum(case when not is_ref then vd end) as decimal(28,9))"
        ).alias("s_cur"),
    )
    return centroid_drift_from_sums(per_dim, counts)


def centroid_drift_from_sums(
    per_dim: DataFrame, counts: DataFrame
) -> DataFrame:
    """Drift finalizer over exact per-dimension DECIMAL(28,9) sums
    (label, dim, s_ref, s_cur) and label-grain cohort counts — shared
    verbatim by the batch operator and the streaming twin
    (streaming/embedding_drift.py): decimal sums merge exactly across
    batches, so identical merged sums yield identical centroids."""
    means = per_dim.join(F.broadcast(counts), "label").select(
        "label",
        "n_ref",
        "n_cur",
        (F.expr("cast(s_ref as double)") / F.col("n_ref").cast("double"))
        .alias("m_ref"),
        (F.expr("cast(s_cur as double)") / F.col("n_cur").cast("double"))
        .alias("m_cur"),
    )
    per_label = means.groupBy("label").agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.sum(F.col("m_ref") * F.col("m_cur")).alias("dot"),
        F.sum(F.col("m_ref") * F.col("m_ref")).alias("nr2"),
        F.sum(F.col("m_cur") * F.col("m_cur")).alias("nc2"),
        F.sum(
            (F.col("m_ref") - F.col("m_cur"))
            * (F.col("m_ref") - F.col("m_cur"))
        ).alias("l2sq"),
    )
    return per_label.select(
        "label",
        "n_ref",
        "n_cur",
        F.round(
            F.expr("try_divide(dot, sqrt(nr2) * sqrt(nc2))"), PSI_ROUND
        ).alias("centroid_cosine"),
        F.round(F.sqrt("l2sq"), PSI_ROUND).alias("centroid_l2"),
    )


def embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between the even- and odd-vec_id
    halves of the embeddings table (the deterministic stand-in for
    reference/current time windows)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    return embedding_centroid_drift(emb, F.col("vec_id") % 2 == 0)
