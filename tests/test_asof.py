"""asof_join_backward: semantics on handcrafted rows (SURVEY.md §2.5 —
as-of join is an engine extension; the reference has no joins at all)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from cloudfront_kinesis_log_lambda_spark.operators.asof import asof_join_backward


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T10:00:00"), lv="a"),
            Row(k=1, ts=_ts("2024-01-01T12:00:00"), lv="b"),
            Row(k=2, ts=_ts("2024-01-01T09:00:00"), lv="c"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T09:30:00"), rv=1.0),
            Row(k=1, ts=_ts("2024-01-01T11:00:00"), rv=2.0),
            Row(k=2, ts=_ts("2024-01-01T10:00:00"), rv=3.0),  # after left → no match
        ]
    )
    out = {
        r["lv"]: (r["rv_asof"], r["ts_asof"])
        for r in asof_join_backward(left, right, on="k").collect()
    }
    assert out["a"] == (1.0, _ts("2024-01-01T09:30:00"))
    assert out["b"] == (2.0, _ts("2024-01-01T11:00:00"))
    assert out["c"] == (None, None)  # right row is strictly later


def test_asof_tie_is_inclusive(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01T10:00:00"), lv="a")])
    right = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01T10:00:00"), rv=7.0)])
    [row] = asof_join_backward(left, right, on="k").collect()
    assert row["rv_asof"] == 7.0


def test_asof_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [Row(k=i % 3, ts=_ts("2024-01-01T10:00:00") + dt.timedelta(minutes=i), lv=str(i)) for i in range(50)]
    )
    right = spark.createDataFrame(
        [Row(k=i % 3, ts=_ts("2024-01-01T09:00:00") + dt.timedelta(minutes=7 * i), rv=float(i)) for i in range(10)]
    )
    out = asof_join_backward(left, right, on="k")
    assert out.count() == 50  # no row amplification, ever
    assert set(out.columns) == {"k", "ts", "lv", "ts_asof", "rv_asof"}


def _mk(spark, rows, cols):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, cols)
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_asof_forward_picks_earliest_at_or_after(spark):
    from cloudfront_kinesis_log_lambda_spark.operators.asof import asof_join_forward

    left = _mk(
        spark,
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
        "k long, ts string",
    )
    right = _mk(
        spark,
        [
            (1, "2024-01-01 09:00:00", 1.0),   # before → not eligible
            (1, "2024-01-01 10:00:00", 2.0),   # equal ts → inclusive tie
            (1, "2024-01-01 11:00:00", 3.0),
            (2, "2024-01-01 23:00:00", 9.0),
        ],
        "k long, ts string, px double",
    )
    got = {
        r["k"]: (str(r["ts_asof"]) if r["ts_asof"] else None, r["px_asof"])
        for r in asof_join_forward(left, right, on="k").collect()
    }
    assert got[1] == ("2024-01-01 10:00:00", 2.0)
    assert got[2] == ("2024-01-01 23:00:00", 9.0)


def test_asof_tolerance_nulls_stale_matches(spark):
    from cloudfront_kinesis_log_lambda_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )

    left = _mk(spark, [(1, "2024-01-01 10:00:00")], "k long, ts string")
    right = _mk(
        spark, [(1, "2024-01-01 07:00:00", 5.0)], "k long, ts string, px double"
    )
    # backward: match is 3h old — outside a 1h tolerance, inside 4h
    tight = asof_join_backward(left, right, on="k", tolerance="1 HOUR").collect()[0]
    assert tight["ts_asof"] is None and tight["px_asof"] is None
    loose = asof_join_backward(left, right, on="k", tolerance="4 HOUR").collect()[0]
    assert loose["px_asof"] == 5.0

    # forward with tolerance: nothing at-or-after within 1h
    fwd_right = _mk(
        spark, [(1, "2024-01-01 13:30:00", 7.0)], "k long, ts string, px double"
    )
    fwd = asof_join_forward(left, fwd_right, on="k", tolerance="1 HOUR").collect()[0]
    assert fwd["px_asof"] is None
    fwd4 = asof_join_forward(left, fwd_right, on="k", tolerance="4 HOUR").collect()[0]
    assert fwd4["px_asof"] == 7.0


def test_cogroup_asof_matches_window_formulation(spark, sf_dir):
    """The cogrouped applyInPandas merge_asof path and the union+window
    path are two implementations of ONE operator contract — they must
    agree row-for-row. Also pins the pruned-input contract: a bare
    count() (Catalyst prunes a cogroup side to its grouping key) must
    not crash the UDF and must return the left-side row count."""
    from pyspark.sql import functions as F

    from cloudfront_kinesis_log_lambda_spark.operators import relational as R
    from cloudfront_kinesis_log_lambda_spark.operators.pandas_grouped import (
        asof_join_cogroup,
    )

    ev = R.load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    cg = asof_join_cogroup(purchases, views, on="user_id", right_cols=["value"])
    w = asof_join_backward(purchases, views, on="user_id", right_cols=["value"])
    got = {r["event_id"]: r.asDict() for r in cg.collect()}
    exp = {r["event_id"]: r.asDict() for r in w.collect()}
    assert got == exp
    assert cg.count() == purchases.count()


def test_asof_null_value_in_matched_row_is_not_torn(spark):
    """The matched right ROW wins, even when one of its carried columns
    is NULL — per-column carry would stitch the NULL column from an
    OLDER row onto the newer row's timestamp, returning a row that never
    existed (and mis-judging tolerance on the torn ts)."""
    left = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01T12:00:00"))])
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01T05:00:00"), px=7.0),
            Row(k=1, ts=_ts("2024-01-01T10:00:00"), px=None),
        ],
        "k long, ts timestamp, px double",
    )
    [r] = asof_join_backward(left, right, on="k").collect()
    assert str(r["ts_asof"]) == "2024-01-01 10:00:00"  # the latest ROW
    assert r["px_asof"] is None  # ...with ITS value, not 05:00's 7.0


def test_asof_null_right_ts_rows_are_excluded(spark):
    """right.ts <= left.ts can never hold for a NULL right ts; NULLS
    FIRST window ordering must not leak such a row's values onto left
    rows that have no match at all."""
    left = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01T01:00:00"))])
    right = spark.createDataFrame(
        [Row(k=1, ts=None, px=9.0)], "k long, ts timestamp, px double"
    )
    [r] = asof_join_backward(left, right, on="k").collect()
    assert r["px_asof"] is None and r["ts_asof"] is None  # no match


def test_asof_null_left_ts_rows_get_no_match(spark):
    """Mirror of the null-RIGHT-ts gate for the forward path: a NULL
    left ts sorts NULLS FIRST — partition start — where the forward
    following-frame sees every right row; `right.ts >= NULL` can never
    hold, so the row must come back matchless in BOTH directions."""
    from cloudfront_kinesis_log_lambda_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [Row(k=1, ts=None), Row(k=1, ts=_ts("2024-01-01T01:00:00"))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=_ts("2024-01-01T02:00:00"), px=9.0)],
        "k long, ts timestamp, px double",
    )
    fwd = {
        (str(r["ts"]) if r["ts"] else None): r
        for r in asof_join_forward(left, right, on="k").collect()
    }
    assert fwd[None]["px_asof"] is None and fwd[None]["ts_asof"] is None
    assert fwd["2024-01-01 01:00:00"]["px_asof"] == 9.0  # real row still matches
    bwd = {
        (str(r["ts"]) if r["ts"] else None): r
        for r in asof_join_backward(left, right, on="k").collect()
    }
    assert bwd[None]["px_asof"] is None and bwd[None]["ts_asof"] is None


def test_asof_reserved_temp_names_are_refused(spark):
    import pytest

    left = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01T01:00:00"), _ats=1)])
    right = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01T00:00:00"), rv=1.0)])
    with pytest.raises(ValueError, match="reserved"):
        asof_join_backward(left, right, on="k")


def test_asof_fuzz_matches_pandas_merge_asof_with_nulls(spark):
    """Cross-implementation fuzz of the struct-carry rewrite: random
    (key, ts, value) frames INCLUDING NULL timestamps and NULL values
    must agree with pandas merge_asof run on the null-filtered right
    side (the documented semantics)."""
    import random

    import pandas as pd

    rng = random.Random(13)
    base = dt.datetime(2024, 1, 1)

    def mk(n, null_ts_rate, null_val_rate):
        rows = []
        for i in range(n):
            ts = (
                None
                if rng.random() < null_ts_rate
                else base + dt.timedelta(minutes=rng.randrange(0, 500))
            )
            val = None if rng.random() < null_val_rate else float(i)
            rows.append((rng.randrange(1, 5), ts, val))
        return rows

    for trial in range(5):
        lrows = mk(40, 0.1, 0.0)
        rrows = mk(40, 0.15, 0.3)
        left = spark.createDataFrame(lrows, "k long, ts timestamp, lv double")
        right = spark.createDataFrame(rrows, "k long, ts timestamp, rv double")
        def key(t):
            return tuple(
                (x is None, x if x is not None else 0) for x in t
            )

        got = sorted(
            ((r["k"], r["ts"], r["lv"], r["ts_asof"], r["rv_asof"])
             for r in asof_join_backward(left, right, on="k").collect()),
            key=key,
        )
        # pandas reference: per-key backward merge on null-filtered right
        lpd = pd.DataFrame(lrows, columns=["k", "ts", "lv"])
        rpd = pd.DataFrame(
            [r for r in rrows if r[1] is not None], columns=["k", "ts", "rv"]
        )
        expect = []
        for k, ts, lv in lrows:
            if ts is None:
                expect.append((k, None, lv, None, None))
                continue
            cand = rpd[(rpd["k"] == k) & (rpd["ts"] <= ts)]
            if cand.empty:
                expect.append((k, ts, lv, None, None))
            else:
                m = cand.sort_values("ts").iloc[-1]
                rv = None if pd.isna(m["rv"]) else float(m["rv"])
                expect.append((k, ts, lv, m["ts"].to_pydatetime(), rv))
        assert got == sorted(expect, key=key), f"trial {trial}"
