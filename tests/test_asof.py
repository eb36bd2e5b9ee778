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
