"""Adversarial probe: single-configuration seams (VERDICT r12 item 7).

The driver's oracle gate always runs one configuration — vanilla
session, container TZ=UTC, ANSI on, Arrow on — so it is structurally
blind to session-config variation. This probe re-runs oracle entries
under deliberately hostile sessions and diffs against the SAME DuckDB
oracle the gate uses:

  tz <zone>   — session timeZone set to a non-UTC zone (probe both a
                whole-hour zone and a half-hour zone: whole-hour shifts
                survive epoch-aligned hour bucketing, half-hour shifts
                do not, so they catch different failure classes)
  ansi-off    — spark.sql.ansi.enabled=false (legacy null-out semantics
                where ANSI would error)
  arrow-off   — spark.sql.execution.arrow.pyspark.enabled=false (only
                affects toPandas/createDataFrame; pandas UDFs are
                always Arrow — expected clean, probed to prove it)

Usage: python tools/probe_session_seams.py <mode> [query ...]
  mode: tz=America/New_York | tz=Asia/Kolkata | ansi-off | arrow-off
      | conf=<key>:<value>   — any single session conf (e.g.
        conf=spark.sql.caseSensitive:true,
        conf=spark.sql.codegen.wholeStage:false); defaults to the
        TZ_SAMPLE ∪ ANSI_SAMPLE union when no queries are given
Prints OK/FAIL per entry + a summary line; exit 1 on any FAIL.

A FAIL here is a *finding*, not automatically a defect: it means the
entry's result depends on session config the docs don't pin. Each
finding gets either a fix + pinning test or a documented contract note.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_correctness import TABLES, normalize  # noqa: E402

# time-centric oracle entries — the surface where session tz can bite
TZ_SAMPLE = [
    "events_hourly",
    "events_ohlc",
    "events_tumbling_windows",
    "events_sliding_windows",
    "events_session_windows",
    "events_interval_join",
    "events_moving_hour_sum",
    "events_gapfill",
    "events_retention_cohorts",
    "user_value_scd2",
    "events_hll_daily_merge",
    "events_ewma",
    "event_transitions",
    "events_range_join",
    "parquet_roundtrip_daily",
    "kinesis_exactly_once_rollup",
    "scd2_incremental_roundtrip",
    "orders_quality_incremental",
    "cloudfront_enriched",
]

# entries whose expressions could null-out/wrap under legacy semantics
ANSI_SAMPLE = [
    "pricing_summary",
    "decimal_revenue_exact",
    "order_price_percentiles",
    "scalar_function_showcase",
    "events_json_props",
    "events_variant_props",
    "doc_token_stats",
    "doc_quality",
    "events_zscore",
    "doc_unigram_logprob",
    "events_funnel",
    "grouping_sets_revenue",
]

# pandas-UDF / Arrow-kernel entries
ARROW_SAMPLE = [
    "events_zscore",
    "events_median_udaf",
    "doc_chunks_udtf",
    "purchases_asof_cogroup",
    "doc_subword_tokens",
    "near_dup_3gram",
    "doc_semantic_dedup",  # rows-only: execution probe only
]


def main() -> int:
    mode = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("PROBE_SF_DIR", "/root/testdata/sf0.01")

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[16]")
        .appName(f"probe-{mode}")
        .config("spark.ui.enabled", "false")
    )
    if mode.startswith("tz="):
        b = b.config("spark.sql.session.timeZone", mode[3:])
        names = names or TZ_SAMPLE
    elif mode == "ansi-off":
        b = b.config("spark.sql.ansi.enabled", "false")
        names = names or ANSI_SAMPLE
    elif mode == "arrow-off":
        b = b.config("spark.sql.execution.arrow.pyspark.enabled", "false")
        names = names or ARROW_SAMPLE
    elif mode.startswith("conf="):
        key, _, val = mode[5:].partition(":")
        b = b.config(key, val)
        names = names or sorted(set(TZ_SAMPLE) | set(ANSI_SAMPLE))
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark = b.getOrCreate()

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = []
    for name in names:
        try:
            got = normalize(queries[name](spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            print(f"FAIL  {name}: spark-side error {type(e).__name__}: {e}"[:300])
            bad.append(name)
            continue
        if name not in oracles:
            print(f"OK?   {name}: executed, {len(got)} rows (rows-only)")
            continue
        exp = normalize(con.execute(oracles[name]).df())
        if list(got.columns) != list(exp.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(exp.columns)}")
            bad.append(name)
        elif len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}")
            bad.append(name)
        elif not got.equals(exp):
            diff_cols = [c for c in got.columns if not got[c].equals(exp[c])]
            print(f"FAIL  {name}: value mismatch in {diff_cols}")
            bad.append(name)
        else:
            print(f"OK    {name}: {len(got)} rows")
    print(f"{len(names) - len(bad)}/{len(names)} clean under {mode}; failing: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
