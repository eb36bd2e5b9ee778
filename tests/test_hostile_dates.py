"""Dates-axis hostile input contracts (r15 differential sweep: the full
registry ran against tables with hostile instants in every timestamp
column — epoch zero, pre-epoch with microseconds, the proleptic
extremes 0001/9999, DST-seam instants, and NULL event times;
tools/make_hostile_sf.py --axis=dates builds them).

At 100 TB a corrupt timestamp exists somewhere in the keyspace with
certainty — a zeroed epoch field, a sentinel 9999-12-31, a null. The
sweep found 19 failures in multi-round-green code, all the same root
class (a corrupt instant breaks a time-axis invariant) in four shapes,
fixed and pinned here:

1. SPINE EXPLOSION: a data-derived bucket grid (gapfill) spanning
   year 0001..9999 is 87.6 M hourly buckets — one ~700 MB sequence
   array that killed the JVM → ``in_ts_spine_domain`` (the ns-interop
   envelope, worst case 5.12 M buckets).
2. WATERMARK POISONING: one year-9999 delivery advances a watermark
   eight millennia and every later record is silently dropped as late
   (observed end to end: the exactly-once rollup lost 80% of its
   rollup) → the same envelope guard BEFORE every watermark.
3. ARROW NS-ENVELOPE CRASHES: instants outside 1677..2262 cannot be
   represented in datetime64[ns]; any applyInPandas kernel or
   toPandas collection that meets one dies worker-side (pyarrow
   raises) → envelope participation domains on Arrow-crossing paths.
4. NULL-ORDERING DIVERGENCE: Spark windows sort NULLS FIRST, DuckDB
   NULLS LAST — a NULL event time silently became the EWMA seed, a
   phantom opening session, a flipped is_current → NULL ts excluded
   from order-dependent operators (no position on a timeline), or the
   convention spelled explicitly on both sides (order windows).
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F

Y0001 = dt.datetime(1, 1, 1, 0, 0, 0)
Y9999 = dt.datetime(9999, 12, 31, 23, 59, 59)
EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    return spark.createDataFrame(
        [(*r, "{}") for r in rows], EVENT_SCHEMA
    )


def _write_events(spark, tmp_path, rows):
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_gapfill_spine_survives_proleptic_extremes(spark, tmp_path):
    """Pre-fix: one year-0001 row beside one year-9999 row derived an
    87.6 M-bucket spine that killed the JVM. Post-fix: out-of-envelope
    instants are missing and the spine spans clean data only."""
    from cloudfront_kinesis_log_lambda_spark.operators.relational import (
        events_gapfill,
    )

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, _m(0), 1, "click", 1.0),
            (2, _m(150), 1, "click", 2.0),  # clean span: 3 hourly buckets
            (3, Y0001, 2, "click", 9.0),
            (4, Y9999, 2, "click", 9.0),
            (5, None, 2, "click", 9.0),
        ],
    )
    got = events_gapfill(spark, sf).collect()
    assert len(got) == 3  # hours 00,01,02 × {click}
    assert sum(r.n_events for r in got) == 2  # hostile rows are missing


def test_tumbling_windows_exclude_out_of_envelope_instants(spark):
    """Batch twin of the watermark-poisoning guard: windows derive only
    from in-envelope instants (a year-9999 window struct also cannot
    cross the Arrow ns boundary at collect time)."""
    from cloudfront_kinesis_log_lambda_spark.streaming.pipeline import (
        tumbling_event_counts,
    )

    e = _events(
        spark,
        [
            (1, _m(1), 1, "click", 1.0),
            (2, _m(4), 1, "click", 2.0),
            (3, Y9999, 1, "click", 9.0),
            (4, Y0001, 1, "click", 9.0),
            (5, None, 1, "click", 9.0),
        ],
    )
    got = tumbling_event_counts(e, window="10 minutes").collect()
    assert len(got) == 1
    assert got[0].n_events == 2 and got[0].sum_value == 3.0


def test_dedup_watermark_not_poisoned_by_future_instant(spark, tmp_path):
    """The end-to-end pin for finding class 2: a year-9999 record in
    micro-batch 0 must NOT advance the dedup watermark past the clean
    records of micro-batch 1 (pre-fix they were silently dropped as
    late — at 100 TB that is total data loss downstream of one corrupt
    row)."""
    from cloudfront_kinesis_log_lambda_spark.streaming.pipeline import (
        dedup_within_watermark,
    )

    land = str(tmp_path / "dups")
    os.makedirs(land)

    def write(name, rows):
        with open(os.path.join(land, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write("b0.json", [
        {"event_id": 1, "ts": "2024-01-01 00:01:00", "user_id": 1,
         "event_type": "a", "value": 1.0, "props": "{}"},
        {"event_id": 666, "ts": "9999-12-31 23:59:59", "user_id": 1,
         "event_type": "a", "value": 9.0, "props": "{}"},
    ])
    write("b1.json", [
        {"event_id": 2, "ts": "2024-01-01 00:02:00", "user_id": 2,
         "event_type": "b", "value": 2.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01 00:02:30", "user_id": 2,
         "event_type": "b", "value": 2.0, "props": "{}"},  # dup delivery
    ])
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(EVENT_SCHEMA)
        .json(land)
    )
    dd = dedup_within_watermark(stream, ["event_id"], watermark="10 minutes")
    q = (
        dd.writeStream.format("memory")
        .queryName("dates_dedup_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    got = spark.sql("SELECT * FROM dates_dedup_t").collect()
    q.stop()
    ids = sorted(r.event_id for r in got)
    assert ids == [1, 2], ids  # 666 excluded, 2's dup collapsed, 2 KEPT


def test_asof_cogroup_survives_ns_envelope(spark):
    """Pre-fix: one year-9999 row killed the whole cogroup join
    worker-side (pyarrow cannot represent it in datetime64[ns]).
    Post-fix: out-of-envelope rows are excluded on both sides and a
    NULL-ts left row keeps its documented no-match row."""
    from cloudfront_kinesis_log_lambda_spark.operators.pandas_grouped import (
        asof_join_cogroup,
    )

    purchases = spark.createDataFrame(
        [
            (1, _m(60), 10, 5.0),
            (2, None, 10, 6.0),      # NULL ts: no-match row, not dropped
            (3, Y9999, 10, 7.0),     # out of envelope: excluded
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    views = spark.createDataFrame(
        [
            (10, _m(0), 1.0),
            (10, Y9999, 2.0),        # out of envelope: never a match
            (10, Y0001, 3.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {r.event_id: r for r in asof_join_cogroup(
        purchases, views, on="user_id", right_cols=["value"]
    ).collect()}
    assert set(got) == {1, 2}
    assert got[1].value_asof == 1.0  # the clean view, not Y9999/Y0001
    assert got[2].ts_asof is None and got[2].value_asof is None


def test_ewma_null_ts_is_not_the_seed(spark, tmp_path):
    """Pre-fix: Spark's sort_array ranks a NULL struct field FIRST, so
    the NULL-ts row silently seeded the fold (DuckDB ranks it last —
    divergence on top of wrongness). Post-fix: no position in an
    ordered series → excluded."""
    from cloudfront_kinesis_log_lambda_spark.operators.timeseries import (
        events_ewma,
    )

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, _m(0), 1, "click", 10.0),
            (2, _m(1), 1, "click", 20.0),
            (3, None, 1, "click", 999.0),
        ],
    )
    got = events_ewma(spark, sf).collect()
    assert len(got) == 1
    assert 10.0 <= got[0].ewma <= 20.0  # 999 never entered the fold


def test_sessionize_null_ts_has_no_phantom_session(spark, tmp_path):
    from cloudfront_kinesis_log_lambda_spark.operators.relational import (
        sessionize_events,
    )

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, _m(0), 1, "click", 1.0),
            (2, _m(10), 1, "click", 1.0),
            (3, None, 1, "click", 1.0),
        ],
    )
    got = sessionize_events(spark, sf).collect()
    assert len(got) == 1 and got[0].n_events == 2


def test_scd2_null_day_not_versioned(spark, tmp_path):
    """Pre-fix: the NULL day sorted first in Spark's lead ordering and
    last in DuckDB's, flipping is_current. Post-fix: no activity day to
    version → excluded."""
    from cloudfront_kinesis_log_lambda_spark.operators.relational import (
        user_value_scd2,
    )

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, dt.datetime(2024, 1, 1, 12), 1, "click", 1.0),
            (2, dt.datetime(2024, 1, 2, 12), 1, "click", 2.0),
            (3, None, 1, "click", 9.0),
        ],
    )
    got = sorted(user_value_scd2(spark, sf).collect(), key=lambda r: r.valid_from)
    assert [r.valid_from for r in got] == ["2024-01-01", "2024-01-02"]
    assert [r.is_current for r in got] == [0, 1]
    assert got[0].valid_to == "2024-01-02"


def test_order_windows_null_date_sorts_first(spark, tmp_path):
    """The pinned convention: an undated order is the FIRST in its
    customer's history on both engines (Spark's ascending default,
    spelled asc_nulls_first / NULLS FIRST)."""
    from cloudfront_kinesis_log_lambda_spark.operators.relational import (
        order_price_delta,
        running_customer_spend,
    )

    spark.createDataFrame(
        [
            (1, 1, None, 100.0, "1-URGENT"),
            (2, 1, dt.datetime(1996, 1, 1), 50.0, "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    sf = str(tmp_path)

    delta = {r.o_orderkey: r.price_delta for r in order_price_delta(spark, sf).collect()}
    assert delta[1] is None and delta[2] == -50.0
    spend = {r.o_orderkey: r.running_spend for r in running_customer_spend(spark, sf).collect()}
    assert spend[1] == 100.0 and spend[2] == 150.0


def test_transitions_null_ts_invents_no_edge(spark):
    """The coincidence-masked finding: a NULL-ts event paired with the
    FIRST event under Spark's NULLS-FIRST lead (and with the LAST under
    DuckDB's NULLS-LAST) — a corrupt row invented a transition edge
    that never happened. No position in the adjacency order →
    excluded."""
    from cloudfront_kinesis_log_lambda_spark.operators.timeseries import (
        transition_pairs,
    )

    e = _events(
        spark,
        [
            (1, _m(0), 1, "a", 1.0),
            (2, _m(1), 1, "b", 1.0),
            (3, None, 1, "c", 1.0),
        ],
    )
    got = {(r.from_type, r.to_type) for r in transition_pairs(e).collect()}
    assert got == {("a", "b")}


def test_ohlc_pre_epoch_open_close_order(spark, tmp_path):
    """The shared-algebra blind spot: the OHLC composite key's lpad of
    a NEGATIVE epoch compares digits backwards (-14182799 sorted AFTER
    -14179201 as strings), silently swapping open and close for any
    pre-epoch hour — and the oracle shared the same algebra, so the
    hash gate stayed green. The proleptic offset restores the total
    order; this pin holds the fix with no engine in the oracle loop."""
    from cloudfront_kinesis_log_lambda_spark.operators.timeseries import (
        events_ohlc,
    )

    early = dt.datetime(1969, 7, 20, 20, 0, 1)   # epoch -14182799 s
    late = dt.datetime(1969, 7, 20, 20, 59, 59)  # epoch -14179201 s
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, early, 1, "click", 111.0),
            (2, late, 1, "click", 222.0),
        ],
    )
    got = events_ohlc(spark, sf).collect()
    assert len(got) == 1
    assert got[0].open == 111.0 and got[0].close == 222.0
