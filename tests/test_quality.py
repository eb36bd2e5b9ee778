"""Data-quality contracts: PSI detects planted drift and reads zero on
identical windows, edge-bin clamping, degenerate ranges, the
reference-only-type contract, and the constraint suite's planted
failure modes."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import quality as Q

REF = datetime.datetime(2024, 1, 10)
CUR = datetime.datetime(2024, 1, 20)


def _events(spark, rows):
    # rows: (event_type, ts, value)
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )


def _psi(spark, rows, split=Q.PSI_SPLIT):
    df = _events(spark, rows)
    stats = Q.psi_ref_stats(
        df.filter(F.col("ts") < F.lit(split)), "event_type", "value"
    )
    return Q.psi_from_counts(
        Q.psi_bin_counts(df, stats, split), stats
    ).collect()


def test_identical_windows_zero_psi(spark):
    rows = []
    for v in range(100):
        rows.append(("t", REF, float(v)))
        rows.append(("t", CUR, float(v)))
    (r,) = _psi(spark, rows)
    assert r["psi"] == 0.0
    assert not r["drifted"]
    assert r["n_ref"] == 100 and r["n_cur"] == 100


def test_planted_drift_detected(spark):
    # reference uniform over [0, 100); current collapsed onto one edge
    rows = [("t", REF, float(v)) for v in range(100)]
    rows += [("t", CUR, 99.0)] * 100
    (r,) = _psi(spark, rows)
    assert r["psi"] > Q.PSI_DRIFT_THRESHOLD
    assert r["drifted"]
    assert r["worst_bin"] == Q.PSI_BINS - 1


def test_out_of_range_current_clamps_to_edge_bins(spark):
    rows = [("t", REF, float(v)) for v in range(10)]
    rows += [("t", CUR, -50.0), ("t", CUR, 500.0)]
    (r,) = _psi(spark, rows)
    # both rows binned (not dropped): totals include them
    assert r["n_cur"] == 2
    assert r["psi"] > 0.0


def test_degenerate_reference_range_single_bin(spark):
    rows = [("t", REF, 5.0)] * 4 + [("t", CUR, 5.0)] * 4
    (r,) = _psi(spark, rows)
    assert r["psi"] == 0.0  # same counts, same totals → identical ps


def test_current_only_type_drops(spark):
    rows = [("ref_t", REF, 1.0), ("ref_t", CUR, 1.0), ("new_t", CUR, 9.0)]
    got = {r["event_type"] for r in _psi(spark, rows)}
    assert got == {"ref_t"}  # drift undefined without reference stats


def test_events_psi_drift_runs(spark, sf_dir):
    rows = Q.events_psi_drift(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == {
        "click", "error", "purchase", "signup", "view"
    }
    for r in rows:
        assert r["psi"] >= 0.0 or abs(r["psi"]) < 1e-6
        assert 0 <= r["worst_bin"] < Q.PSI_BINS


def test_single_wide_exchange_plan(spark, sf_dir):
    """The bin-count aggregate is the only exchange that sees event
    rows; stats/grid/totals joins must all broadcast."""
    plan = (
        Q.events_psi_drift(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# --- constraint suite ------------------------------------------------------


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


GOOD = (1, 10, "O", 5.0, datetime.datetime(1996, 1, 1), "1-URGENT")


def test_quality_checks_all_pass_on_clean_data(spark):
    orders = _orders(spark, [GOOD, (2, 11, "F", 7.0, GOOD[4], "5-LOW")])
    customer = spark.createDataFrame([(10,), (11,)], "c_custkey long")
    rows = Q.quality_checks(orders, customer).collect()
    assert len(rows) == len(Q.QUALITY_THRESHOLDS)
    assert all(r["passed"] for r in rows)
    assert all(r["metric"] == 1.0 for r in rows)


def test_quality_checks_planted_failures(spark):
    orders = _orders(
        spark,
        [
            GOOD,
            (1, None, "X", -5.0, datetime.datetime(1980, 1, 1), "URGENT"),
        ],
    )
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    got = {r["check"]: r for r in Q.quality_checks(orders, customer).collect()}
    # duplicate orderkey, null custkey, bad status, negative price,
    # out-of-range date, malformed priority — every check trips
    for name in (
        "custkey_complete",
        "orderkey_unique",
        "status_in_set",
        "totalprice_positive",
        "priority_format",
        "orderdate_in_range",
    ):
        assert got[name]["metric"] == 0.5 and not got[name]["passed"], name


def test_referential_check_counts_dangling_keys(spark):
    orders = _orders(spark, [GOOD, (2, 99, "O", 5.0, GOOD[4], "1-URGENT")])
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    got = {r["check"]: r for r in Q.quality_checks(orders, customer).collect()}
    assert got["custkey_resolves"]["metric"] == 0.5
    assert not got["custkey_resolves"]["passed"]


def test_orders_quality_checks_runs(spark, sf_dir):
    got = {r["check"]: r for r in Q.orders_quality_checks(spark, sf_dir).collect()}
    assert set(got) == set(Q.QUALITY_THRESHOLDS)
    # synthetic orders are clean: everything passes
    assert all(r["passed"] for r in got.values())
