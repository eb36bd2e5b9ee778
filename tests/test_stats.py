"""Statistical-test contracts: hand-computed chi-square on a 2×2
table, independence and perfect-association extremes, dense-grid
zero-cell terms, correlation extremes, and the broadcast-only plan
shape above the contingency reduce."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import stats as ST


def _cat(spark, rows):
    return spark.createDataFrame(rows, "r string, c string")


def test_hand_computed_2x2(spark):
    # classic 2x2: observed [[10, 20], [20, 10]], n=60
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20
        + [("b", "x")] * 20 + [("b", "y")] * 10
    )
    got = ST.chi2_independence(_cat(spark, rows), "r", "c").collect()[0]
    # e = 15 everywhere; chi2 = 4 * (5^2/15) = 20/3
    assert got["n"] == 60 and got["dof"] == 1
    assert abs(got["chi2"] - 20.0 / 3.0) < 1e-6
    assert abs(got["cramers_v"] - math.sqrt((20.0 / 3.0) / 60.0)) < 1e-6


def test_independent_uniform_is_zero(spark):
    rows = [(r, c) for r in "ab" for c in "xy" for _ in range(7)]
    got = ST.chi2_independence(_cat(spark, rows), "r", "c").collect()[0]
    assert got["chi2"] == 0.0 and got["cramers_v"] == 0.0


def test_perfect_association_cramers_one(spark):
    rows = [("a", "x")] * 5 + [("b", "y")] * 5
    got = ST.chi2_independence(_cat(spark, rows), "r", "c").collect()[0]
    assert got["chi2"] == 10.0  # == n for a perfect 2x2
    assert got["cramers_v"] == 1.0


def test_zero_cells_contribute_expected_mass(spark):
    # (b, x) never observed but its e = 2*2/6 > 0 must enter the sum
    rows = [("a", "x")] * 2 + [("a", "y")] * 2 + [("b", "y")] * 2
    got = ST.chi2_independence(_cat(spark, rows), "r", "c").collect()[0]
    # full 2x2 grid: chi2 = sum over 4 cells, by hand = 1.5
    assert abs(got["chi2"] - 1.5) < 1e-6
    assert got["n_rows"] == 2 and got["n_cols"] == 2


def test_events_chi2_runs(spark, sf_dir):
    got = ST.events_chi2_type_hour(spark, sf_dir).collect()[0]
    assert got["n_rows"] == 5 and got["n_cols"] == 24
    assert got["dof"] == 4 * 23
    assert got["chi2"] >= 0.0
    assert 0.0 <= got["cramers_v"] <= 1.0


def test_chi2_plan_is_one_fact_exchange(spark, sf_dir):
    """Only the contingency aggregate may shuffle event rows — the
    marginal/grid joins are broadcasts of r·c-sized sides."""
    plan = (
        ST.events_chi2_type_hour(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan


def test_corr_extremes(spark):
    df = spark.createDataFrame(
        [(float(i), 2.0 * i + 1.0, -3.0 * i, 5.0) for i in range(10)],
        "a double, b double, c double, d double",
    )
    got = {
        (r["col_a"], r["col_b"]): r["pearson_r"]
        for r in ST.corr_matrix(df, ["a", "b", "c", "d"]).collect()
    }
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert got[("b", "c")] == -1.0
    # constant column: corr undefined → NULL on both engines
    assert got[("a", "d")] is None
    assert len(got) == 6


def test_lineitem_corr_matrix_runs(spark, sf_dir):
    rows = ST.lineitem_corr_matrix(spark, sf_dir).collect()
    assert len(rows) == 6
    got = {(r["col_a"], r["col_b"]): r["pearson_r"] for r in rows}
    # synthetic lineitem measures are drawn independently — every
    # coefficient must read near zero (and be defined: none constant)
    for v in got.values():
        assert v is not None and abs(v) < 0.15


# --- two-proportion z-test -------------------------------------------------


def _obs(spark, rows):
    return spark.createDataFrame(rows, "unit long, arm string, cv boolean")


def test_ztest_hand_computed(spark):
    # A: 100 units, 20 convert; B: 100 units, 30 convert
    rows = [(i, "A", i < 20) for i in range(100)]
    rows += [(1000 + i, "B", i < 30) for i in range(100)]
    got = ST.two_proportion_ztest(_obs(spark, rows), "unit", "arm", "cv").collect()[0]
    assert got["n_a"] == 100 and got["conv_a"] == 20
    assert got["rate_b"] == 0.3 and got["lift"] == 0.1
    # pooled p=0.25, se=sqrt(0.25*0.75*0.02)
    want_z = 0.1 / math.sqrt(0.25 * 0.75 * 0.02)
    assert abs(got["z"] - want_z) < 1e-6
    assert not got["significant"]  # z ≈ 1.633 < 1.96


def test_ztest_unit_converts_on_any_row(spark):
    # unit 1 has a non-converting row AND a converting row → converts
    rows = [(1, "A", False), (1, "A", True), (2, "B", False)]
    got = ST.two_proportion_ztest(_obs(spark, rows), "unit", "arm", "cv").collect()[0]
    assert got["n_a"] == 1 and got["conv_a"] == 1


def test_ztest_identical_arms_zero_z(spark):
    rows = [(i, "A", i % 2 == 0) for i in range(50)]
    rows += [(100 + i, "B", i % 2 == 0) for i in range(50)]
    got = ST.two_proportion_ztest(_obs(spark, rows), "unit", "arm", "cv").collect()[0]
    assert got["z"] == 0.0 and not got["significant"]


def test_ztest_degenerate_all_convert(spark):
    # both arms 100% conversion → se = 0 → z NULL (try_divide)
    rows = [(1, "A", True), (2, "B", True)]
    got = ST.two_proportion_ztest(_obs(spark, rows), "unit", "arm", "cv").collect()[0]
    assert got["z"] is None


def test_events_ab_conversion_runs(spark, sf_dir):
    got = ST.events_ab_conversion(spark, sf_dir).collect()[0]
    # parity split is near-even and conversion is ~uniform: no signal
    assert got["n_a"] > 0 and got["n_b"] > 0
    # tiny SFs can saturate conversion (every user purchases at least
    # once) — the readout just has to be a well-formed proportion
    assert 0.0 < got["rate_a"] <= 1.0 and 0.0 < got["rate_b"] <= 1.0


def test_chi2_degenerate_single_row_category(spark):
    # 1×k table: chi2 = 0, dof = 0, effect size undefined → NULL
    rows = [("a", "x")] * 3 + [("a", "y")] * 2
    got = ST.chi2_independence(_cat(spark, rows), "r", "c").collect()[0]
    assert got["chi2"] == 0.0 and got["dof"] == 0
    assert got["cramers_v"] is None


def test_chi2_null_categories_excluded(spark):
    """Review finding: a NULL level's marginal mass used to stay
    charged while its cells fell out of the null-blind grid join —
    NULLs are now excluded up front (independent 2x2 stays chi2=0)."""
    rows = [(r, c) for r in "ab" for c in "xy" for _ in range(3)]
    rows += [(None, "x"), ("a", None)]
    got = ST.chi2_independence(_cat(spark, rows), "r", "c").collect()[0]
    assert got["chi2"] == 0.0
    assert got["n"] == 12  # only the non-null rows count


# --- key-skew profile --------------------------------------------------------


def test_skew_profile_uniform_vs_whale(spark):
    uniform = spark.createDataFrame(
        [(i % 10,) for i in range(100)], "k long"
    )
    u = ST.key_skew_profile(uniform, "k").collect()[0]
    assert u["n_keys"] == 10 and u["max_n"] == 10
    assert u["skew_ratio"] == 1.0 and u["balance"] == 1.0

    whale_rows = [(1,)] * 91 + [(k,) for k in range(2, 11)]
    w = ST.key_skew_profile(
        spark.createDataFrame(whale_rows, "k long"), "k"
    ).collect()[0]
    assert w["max_n"] == 91 and w["top_share"] == 0.91
    assert w["skew_ratio"] == 91.0  # p50 of counts is 1
    assert w["balance"] < 0.3  # far from uniform


def test_skew_profile_null_key_counted(spark):
    rows = [(None,)] * 5 + [(1,), (2,)]
    got = ST.key_skew_profile(
        spark.createDataFrame(rows, "k long"), "k"
    ).collect()[0]
    assert got["null_rows"] == 5
    assert got["n_keys"] == 3 and got["n_rows"] == 7
    assert got["max_n"] == 5  # the null key IS the hot key


def test_skew_profile_single_key_degenerate(spark):
    got = ST.key_skew_profile(
        spark.createDataFrame([(1,)] * 4, "k long"), "k"
    ).collect()[0]
    assert got["entropy"] == 0.0
    assert got["balance"] is None  # ln(1) = 0 → undefined


def test_events_user_skew_profile_runs(spark, sf_dir):
    got = ST.events_user_skew_profile(spark, sf_dir).collect()[0]
    assert got["n_rows"] > 0 and got["null_rows"] == 0
    assert 0.9 < got["balance"] <= 1.0  # synthetic users are uniform
