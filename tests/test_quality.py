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


# --- Benford audit ---------------------------------------------------------


def test_benford_conforming_sample(spark):
    # exact Benford frequencies out of 1000: digit d appears
    # round(1000*log10(1+1/d)) times at magnitude d*10^k
    import math as m

    rows = []
    uid = 0
    for d in range(1, 10):
        n = round(1000 * m.log10(1 + 1.0 / d))
        for i in range(n):
            rows.append((float(d) * (10.0 ** (i % 3)),))
            uid += 1
    df = spark.createDataFrame(rows, "v double")
    got = {r["digit"]: r for r in Q.benford_digits(df, "v").collect()}
    assert set(got) == set(range(1, 10))
    # conforming data: Nigrini MAD < 0.006 is "close conformity"
    assert got[1]["mad"] < 0.006
    assert got[1]["p_benford"] == round(m.log10(2.0), 6)


def test_benford_uniform_flagged(spark):
    # uniform first digits are maximally non-Benford
    rows = [(float(d) * 10.0,) for d in range(1, 10) for _ in range(100)]
    df = spark.createDataFrame(rows, "v double")
    got = Q.benford_digits(df, "v").collect()
    assert got[0]["mad"] > 0.015  # Nigrini nonconformity threshold
    assert all(r["p_obs"] == round(1.0 / 9.0, 6) for r in got)


def test_benford_nonpositive_excluded_and_digit_extraction(spark):
    rows = [(-5.0,), (0.0,), (0.042,), (9999.0,), (1.0,)]
    df = spark.createDataFrame(rows, "v double")
    got = {r["digit"]: r["n_obs"] for r in Q.benford_digits(df, "v").collect()}
    # 0.042 → digit 4; 9999 → 9; 1.0 → 1; negatives/zero dropped
    assert got[4] == 1 and got[9] == 1 and got[1] == 1
    assert sum(got.values()) == 3


def test_orders_benford_nonconforming_negative_control(spark, sf_dir):
    rows = Q.orders_benford_digits(spark, sf_dir).collect()
    assert len(rows) == 9
    # TPC-H prices span ~2 decades: the audit must flag them
    assert rows[0]["mad"] > 0.012


# --- KS two-sample test ----------------------------------------------------


def _ks(spark, rows, **kw):
    df = _events(spark, rows)
    return Q.ks_two_sample(
        df, "event_type", "value", F.col("ts") < F.lit(Q.PSI_SPLIT), **kw
    ).collect()


def test_ks_identical_samples_zero(spark):
    rows = [("t", REF, float(v)) for v in range(50)]
    rows += [("t", CUR, float(v)) for v in range(50)]
    (r,) = _ks(spark, rows)
    assert r["ks_d"] == 0.0 and not r["drifted"]


def test_ks_disjoint_supports_d_one(spark):
    # ref in [0, 10), cur in [100, 110): ECDFs never overlap → D = 1
    rows = [("t", REF, float(v)) for v in range(10)]
    rows += [("t", CUR, 100.0 + v) for v in range(10)]
    (r,) = _ks(spark, rows)
    assert r["ks_d"] == 1.0 and r["drifted"]


def test_ks_hand_computed_shift(spark):
    # ref {1,2,3,4}, cur {3,4,5,6}: D = |ECDF_ref - ECDF_cur| peaks at
    # v=2: |2/4 - 0| = 0.5
    rows = [("t", REF, float(v)) for v in (1, 2, 3, 4)]
    rows += [("t", CUR, float(v)) for v in (3, 4, 5, 6)]
    (r,) = _ks(spark, rows)
    assert r["ks_d"] == 0.5
    assert r["n_ref"] == 4 and r["n_cur"] == 4


def test_ks_one_sided_type_drops(spark):
    rows = [("only_ref", REF, 1.0), ("both", REF, 1.0), ("both", CUR, 2.0)]
    got = {r["event_type"] for r in _ks(spark, rows)}
    assert got == {"both"}  # KS undefined for an empty sample


def test_ks_quantize_collapses_near_ties(spark):
    # 1.0001 vs 1.0004 are the same point at quantize=3 but distinct
    # at quantize=None
    rows = [("t", REF, 1.0001), ("t", CUR, 1.0004)]
    (r3,) = _ks(spark, rows, quantize=3)
    (rn,) = _ks(spark, rows, quantize=None)
    assert r3["ks_d"] == 0.0  # same grid point → ECDFs move together
    assert rn["ks_d"] == 1.0


def test_events_ks_drift_runs(spark, sf_dir):
    rows = Q.events_ks_drift(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["ks_d"] <= 1.0 and r["ks_crit"] > 0.0


def test_benford_power_of_ten_boundary_digits(spark):
    """Review finding: values an ulp below a power of ten used to bin
    as digit 0 and silently fall off the 1-9 grid."""
    import math as m

    below = m.nextafter(10.0, 0.0)  # 9.999999999999998 → digit 9
    rows = [(below,), (10.0,), (1.0,)]
    df = spark.createDataFrame(rows, "v double")
    got = {r["digit"]: r["n_obs"] for r in Q.benford_digits(df, "v").collect()}
    assert got[9] == 1 and got[1] == 2
    assert sum(got.values()) == 3  # nothing vanished


def test_benford_no_positive_values_null_not_crash(spark):
    rows = [(-1.0,), (0.0,)]
    df = spark.createDataFrame(rows, "v double")
    got = Q.benford_digits(df, "v").collect()
    assert len(got) == 9
    assert all(r["n_obs"] == 0 and r["p_obs"] is None for r in got)


def test_quality_checks_empty_input_fails_not_crashes(spark):
    orders = _orders(spark, [])
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    rows = Q.quality_checks(orders, customer).collect()
    assert len(rows) == len(Q.QUALITY_THRESHOLDS)
    # no data → NULL metrics → every check FAILS (a gate that has
    # seen nothing has verified nothing)
    assert all(r["metric"] is None and r["passed"] is False for r in rows)


# --- embedding drift ---------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_embedding_drift_identical_cohorts(spark):
    # same vectors in both halves → cosine 1, L2 0
    rows = [(i, 0, [1.0, 2.0, 3.0]) for i in range(6)]
    got = Q.embedding_centroid_drift(
        _emb(spark, rows), F.col("vec_id") % 2 == 0
    ).collect()[0]
    assert got["centroid_cosine"] == 1.0 and got["centroid_l2"] == 0.0


def test_embedding_drift_orthogonal_cohorts(spark):
    # ref along x, cur along y → cosine 0, L2 = sqrt(2)
    rows = [(0, 0, [1.0, 0.0]), (2, 0, [1.0, 0.0])]
    rows += [(1, 0, [0.0, 1.0]), (3, 0, [0.0, 1.0])]
    got = Q.embedding_centroid_drift(
        _emb(spark, rows), F.col("vec_id") % 2 == 0
    ).collect()[0]
    assert got["centroid_cosine"] == 0.0
    assert abs(got["centroid_l2"] - 2 ** 0.5) < 1e-6


def test_embedding_drift_one_sided_label_drops(spark):
    rows = [(0, 0, [1.0]), (1, 0, [1.0]), (2, 1, [1.0])]  # label 1 ref-only
    got = {r["label"] for r in Q.embedding_centroid_drift(
        _emb(spark, rows), F.col("vec_id") % 2 == 0
    ).collect()}
    assert got == {0}


def test_embedding_drift_runs(spark, sf_dir):
    rows = Q.embedding_drift(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert -1.0 <= r["centroid_cosine"] <= 1.0
        assert r["centroid_l2"] >= 0.0
