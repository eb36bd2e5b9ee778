"""Deterministic, oracle-checkable distributed sketches.

``relational.sketch_event_stats`` exposes Spark's built-in HLL++ and
t-digest (approx_count_distinct / approx_percentile) — black-box
sketches whose internal randomization makes them checkable only within
tolerance bands. This module implements the two classic sketches FROM
SCRATCH as declarative DataFrame plans with fully deterministic,
SQL-expressible hash functions, so the whole computation — registers,
counters, estimates — replays bit-identically in DuckDB and every query
is exact-hash-checkable by the driver gate.

Why this matters at 100 TB: both sketches are the canonical
*mergeable-partial-aggregate* pattern —

- **HLL** (Flajolet et al. 2007): per-partition register vectors
  combine by element-wise MAX, so distinct-counting 100 TB shuffles at
  most ``groups × m`` compact register rows instead of every distinct
  key. ``hll_registers`` IS the partial state (groupBy bucket → MAX
  rho: Spark's map-side partial aggregation does the per-partition
  sketching for free), and re-aggregating registers across any
  partitioning of the input (days, shards) gives bit-identical
  estimates — ``events_hll_daily_merge`` proves that merge law in the
  driver gate, not just in a unit test.
- **Count-Min** (Cormode & Muthukrishnan 2005): frequency estimates
  from a ``d × w`` counter matrix that is itself a tiny sum-mergeable
  aggregate; the probe side joins against ``d·w`` rows (broadcast), not
  against the corpus.

Hash discipline: every hash is plain integer SQL — an LCG-style
``(a·x + b) mod p`` (p = 2³¹−1, all products < 2⁶², exact in BIGINT on
both engines) for numeric keys, and md5-prefix decoding for strings
(Spark: ``conv(substr(md5(w),…),16,10)``; DuckDB: a generated
hex-digit polynomial over the same md5 — same value, different
spelling). The scalar fragments are built ONCE by the ``*_sql``
helpers below and consumed by BOTH the Spark plan (``F.expr``) and the
DuckDB oracle (functions/oracles.py imports them), so Spark/DuckDB
parity holds by construction.

Float-parity note (house numerics policy, cf. operators/similarity.py):
the only non-integer arithmetic is ``POWER(2.0, -rho)`` — exact binary
fractions whose sums are order-independent (≤ m terms ≥ 2⁻²⁰, total
< 2¹⁰: every partial fits 30 mantissa bits) — plus one final
α·m²/S division and the linear-counting ``m·ln(m/V)``, both computed
from identical doubles on both engines and rounded at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.relational import load
from cloudfront_kinesis_log_lambda_spark.operators.util import finite

# Register-index bits: m = 2^HLL_PRECISION registers (~1.04/sqrt(m)
# relative error — 4.6% at the default 9). RHO_CAP bounds the CASE
# chain; the rho hash is a 32-bit md5 slice, so trailing-zero runs
# beyond 20 are ~2^-21 events that all land in the top register value,
# a standard truncation.
HLL_PRECISION = 9
HLL_M = 1 << HLL_PRECISION
HLL_RHO_CAP = 20

# Count-Min geometry: d independent rows × w counters. Estimate error
# is ≤ total_count·e/w with prob 1 - e^-d per the classic bound.
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOPK = 20


def hll_rho_sql(h2_sql: str) -> str:
    """rho = 1 + trailing zeros of the 32-bit rho-hash value, capped.

    P(rho = r) ≈ 2^-r for a uniform hash — the geometric observable HLL
    maximizes per register. A generated CASE chain keeps it portable
    (no engine-specific ctz builtin); h2 = 0 falls through to the cap.
    Callers materialize the hash into a column first so the chain's 19
    probes test a column, not 19 inlined md5 expressions.
    """
    whens = " ".join(
        f"WHEN {h2_sql} % {1 << (t + 1)} = {1 << t} THEN {t + 1}"
        for t in range(HLL_RHO_CAP - 1)
    )
    return f"(CASE {whens} ELSE {HLL_RHO_CAP} END)"


# Both HLL hashes are md5 slices (rows 0 and 1 of the CMS slicing) over
# the decimal rendering of the key. An LCG-style (a·x+b) mod p hash was
# tried first and is CHEAPER, but on consecutive integer keys it is
# collision-free-by-construction — occupied-register counts then exceed
# the Poisson model linear counting assumes, and the estimate overshot
# exact by 18% on the events table. md5's avalanche restores the model
# (measured: within 1σ on events). Keys render identically on both
# engines (BIGINT → '123'); NULLs are filtered by the caller.


def hll_bucket_sql_spark(key_sql: str) -> str:
    return (
        f"({md5_hash_sql_spark(f'CAST({key_sql} AS STRING)', 0)}"
        f" % {HLL_M})"
    )


def hll_bucket_sql_duck(key_sql: str) -> str:
    return (
        f"({md5_hash_sql_duck(f'CAST({key_sql} AS VARCHAR)', 0)}"
        f" % {HLL_M})"
    )


def hll_h2_sql_spark(key_sql: str) -> str:
    return md5_hash_sql_spark(f"CAST({key_sql} AS STRING)", 1)


def hll_h2_sql_duck(key_sql: str) -> str:
    return md5_hash_sql_duck(f"CAST({key_sql} AS VARCHAR)", 1)


def hll_estimate_sql(n_registers_sql: str, s_present_sql: str) -> str:
    """HLL estimate from (count of non-empty registers, Σ 2^-rho over
    them): raw = α·m²/S with empty registers contributing 2⁻⁰ = 1, and
    the standard small-range linear-counting correction when raw ≤ 2.5m
    and empty registers remain."""
    m = HLL_M
    alpha = f"(0.7213 / (1.0 + 1.079 / {m}.0))"
    v = f"({m} - {n_registers_sql})"
    s = f"({s_present_sql} + CAST({v} AS DOUBLE))"
    raw = f"({alpha} * {m}.0 * {m}.0 / {s})"
    lin = f"({m}.0 * LN({m}.0 / CAST({v} AS DOUBLE)))"
    return (
        f"(CASE WHEN {raw} <= 2.5 * {m}.0 AND {v} > 0 "
        f"THEN {lin} ELSE {raw} END)"
    )


def md5_hash_sql_spark(col: str, row: int) -> str:
    """Row-r string hash for Spark: 8 hex chars of md5 (32 bits, four
    disjoint slices for d ≤ 4) decoded with the built-in conv()."""
    return (
        f"CAST(CONV(SUBSTRING(MD5({col}), {8 * row + 1}, 8), 16, 10) "
        f"AS BIGINT)"
    )


def md5_hash_sql_duck(col: str, row: int) -> str:
    """The same 32-bit md5-slice value for DuckDB, which lacks conv():
    a generated hex-digit polynomial (digits are lowercase on both
    engines; ascii ≥ 97 → a-f)."""
    terms = []
    for i in range(8):
        d = f"ascii(substr(md5({col}), {8 * row + 1 + i}, 1))"
        # BIGINT cast before the power-of-16 multiply: ascii() is INT32
        # and 14 * 16^7 overflows it
        val = (
            f"CAST(CASE WHEN {d} >= 97 THEN {d} - 87 ELSE {d} - 48 END"
            f" AS BIGINT)"
        )
        terms.append(f"{val} * {16 ** (7 - i)}")
    return f"({' + '.join(terms)})"


def hll_registers(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """(group…, bucket, rho) register rows — the mergeable partial
    state. groupBy(bucket) → MAX(rho) makes Spark's map-side partial
    aggregation do the per-partition sketching: the exchange carries at
    most groups × m register rows regardless of input size. NULL keys
    are excluded (standard COUNT(DISTINCT …) semantics)."""
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(
            *group_cols,
            F.expr(hll_bucket_sql_spark(key_col)).alias("bucket"),
            F.expr(hll_h2_sql_spark(key_col)).alias("_h2"),
        )
        .select(
            *group_cols, "bucket", F.expr(hll_rho_sql("_h2")).alias("rho")
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse register rows to (group…, n_registers, v_zero,
    approx_distinct). Accepts the output of :func:`hll_registers` OR any
    MAX-remerge of it across an extra partitioning column — the merge
    law the daily-merge query exercises."""
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_registers"),
            F.sum(F.expr("POWER(2.0, -rho)")).alias("_s"),
        )
        .select(
            *group_cols,
            "n_registers",
            (F.lit(HLL_M) - F.col("n_registers")).cast("long").alias("v_zero"),
            F.round(
                F.expr(hll_estimate_sql("n_registers", "_s")), 4
            ).alias("approx_distinct"),
        )
    )


def events_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via the deterministic HLL.

    cf. reference repo's per-key distinct rollups; at scale this is the
    plan that replaces a COUNT(DISTINCT) whose exchange would carry
    every distinct key: here it carries ≤ 5 × 512 register rows.
    """
    e = load(spark, sf_dir, "events")
    regs = hll_registers(e, ["event_type"], "user_id")
    return hll_estimate(regs, ["event_type"])


def events_hll_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL merge law as a gate-visible query: sketch each day
    independently (the realistic incremental-ingest unit), merge the
    daily register vectors by element-wise MAX, and estimate from the
    merged registers. Bit-identical to sketching the whole table at
    once — asserted in tests/test_sketch.py — because MAX is
    associative-commutative over register rows."""
    e = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = hll_registers(e, ["event_type", "day"], "user_id")
    merged = daily.groupBy("event_type", "bucket").agg(
        F.max("rho").alias("rho")
    )
    days = daily.groupBy("event_type").agg(
        F.countDistinct("day").cast("long").alias("n_days")
    )
    return (
        hll_estimate(merged, ["event_type"])
        .join(days, "event_type")
        .select(
            "event_type", "n_days", "n_registers", "v_zero",
            "approx_distinct",
        )
    )


def cms_cells_expr(word_col: str) -> "Column":
    """The d counter cells of a word: array of (r, col) structs, one
    md5-slice hash per row — shared by the batch query and the
    streaming counter store so both bucket identically."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.expr(
                    f"{md5_hash_sql_spark(word_col, r)} % {CMS_WIDTH}"
                ).alias("col"),
            )
            for r in range(CMS_DEPTH)
        ]
    )


def events_hll_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set INTERSECTION estimate via inclusion-exclusion over
    HLL registers: |view ∩ purchase| ≈ est(view) + est(purchase) −
    est(view ∪ purchase), where the union sketch is just the MAX-merge
    of the two groups' register vectors — no data rescan, the same
    compact register rows three ways (the theta-sketch-style set
    algebra that replaces a distinct self-join at 100 TB)."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    regs = hll_registers(e, ["event_type"], "user_id").localCheckpoint(
        eager=True
    )
    per_type = hll_estimate(regs, ["event_type"])
    union = hll_estimate(
        regs.groupBy("bucket").agg(F.max("rho").alias("rho")), []
    ).select(F.col("approx_distinct").alias("approx_union"))
    wide = (
        per_type.groupBy()
        .pivot("event_type", ["view", "purchase"])
        .agg(F.first("approx_distinct"))
        .select(
            F.col("view").alias("approx_view"),
            F.col("purchase").alias("approx_purchase"),
        )
    )
    return wide.crossJoin(union).select(
        "approx_view",
        "approx_purchase",
        "approx_union",
        F.round(
            F.col("approx_view")
            + F.col("approx_purchase")
            - F.col("approx_union"),
            4,
        ).alias("approx_both"),
    )


# DDSketch (Masson/Rim/Lee 2019, VLDB): relative-error quantiles from
# log-spaced buckets — deterministic given the data, and the bucket
# counts are SUM-mergeable (the quantile analogue of the HLL register
# story; t-digest/KLL centroids are order-dependent, which is why the
# built-in approx_percentile can only ever be tolerance-checked).
# gamma = 1.02 → worst-case relative error (γ−1)/(γ+1) ≈ 1%.
DD_GAMMA = 1.02

# Bucket index = FLOOR(ln(v)/ln(γ)) — but Java's and libm's ln can
# differ in the last ulp, and FLOOR turns a 1-ulp disagreement into a
# different bucket. ROUND to 9 decimals first: a boundary flip now
# needs the true ratio within 5e-10 of an integer (none in the test
# tables — asserted in test_sketch — and at worst a one-bucket shift,
# inside the sketch's error budget, for 1-in-2e9 adversarial values).
def dd_bucket_sql(value_sql: str) -> str:
    return f"CAST(FLOOR(ROUND(LN({value_sql}) / LN({DD_GAMMA}), 9)) AS BIGINT)"


DD_BUCKET_SQL = dd_bucket_sql("value")


def dd_quantile_sql(q: float) -> str:
    """Value estimate for quantile ``q`` from (bucket, n, cum) rows:
    the first bucket whose cumulative count reaches q·total, mapped to
    the bucket's midpoint 2γ^(i+1)/(γ+1). The +1 belongs there: buckets
    use the FLOOR(ln v / ln γ) convention, so bucket i holds values in
    [γ^i, γ^(i+1)) and that interval's log-midpoint is 2γ^(i+1)/(γ+1)
    — do not "fix" the exponent without changing dd_bucket_sql's
    indexing to match (r6 advice). MIN over a CASE keeps it a plain
    aggregate on both engines."""
    return (
        f"ROUND(2.0 * POWER({DD_GAMMA}, MIN(CASE WHEN cum >= {q} * total "
        f"THEN bucket END) + 1) / ({DD_GAMMA} + 1.0), 4)"
    )


def events_value_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of events.value per event type from a DDSketch-style
    log-bucket histogram.

    Plan: one groupBy (event_type, bucket) COUNT — the partial
    aggregate IS the mergeable sketch, ≤ groups × ~1200 buckets on the
    exchange — then a cumulative window over the tiny bucket table and
    one MIN-CASE aggregate per quantile. Positive FINITE values only
    (the standard DDSketch contract; zero/negative go to dedicated
    stores in the paper — absent from this table; NaN/±Inf have no
    log-bucket, and `> 0` alone admits NaN under both engines' NaN
    ordering — r14 hostile sweep)."""
    e = load(spark, sf_dir, "events").filter(
        (F.col("value") > 0) & finite(F.col("value"))
    )
    hist = (
        e.select("event_type", F.expr(DD_BUCKET_SQL).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "event_type",
        "bucket",
        F.sum("n").over(w).alias("cum"),
        F.sum("n")
        .over(Window.partitionBy("event_type"))
        .alias("total"),
    )
    return cum.groupBy("event_type").agg(
        F.max("total").cast("long").alias("n_values"),
        F.expr(dd_quantile_sql(0.5)).alias("p50"),
        F.expr(dd_quantile_sql(0.95)).alias("p95"),
        F.expr(dd_quantile_sql(0.99)).alias("p99"),
    )


def word_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates for the corpus's top-k words,
    alongside their exact counts.

    Plan shape (the 100 TB story): one exchange builds exact word
    counts; the d×w counter matrix is a second exchange over 4
    compact (r, col, n) rows per word — 2048 counter cells total —
    and the probe joins k words against those cells broadcast-style.
    The corpus text itself is never carried past the first aggregate.
    CMS guarantees est ≥ exact always (counters only ever over-count on
    hash collisions); the test pins both the inequality and zero
    inflation on a collision-free synthetic vocabulary.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    words = d.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    # exact counts feed BOTH the counter build and the probe set; the
    # checkpoint stops the explode+aggregate running twice
    wc = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .localCheckpoint(eager=True)
    )
    cells = cms_cells_expr("word")
    counters = (
        wc.select(F.explode(cells).alias("c"), "n_exact")
        .groupBy(F.col("c.r").alias("r"), F.col("c.col").alias("col"))
        .agg(F.sum("n_exact").alias("cell_n"))
    )
    top = wc.orderBy(F.col("n_exact").desc(), F.col("word").asc()).limit(
        CMS_TOPK
    )
    probe = top.select("word", "n_exact", F.explode(cells).alias("c")).select(
        "word", "n_exact", F.col("c.r").alias("r"), F.col("c.col").alias("col")
    )
    return (
        probe.join(F.broadcast(counters), ["r", "col"])
        .groupBy("word", "n_exact")
        .agg(F.min("cell_n").cast("long").alias("cms_est"))
    )
