"""Streaming constraint suite: SUM-merged counters + the per-key
store must reproduce the batch suite EXACTLY over the union of
arrived rows — with the cross-batch duplicate key case a per-batch
distinct-count provably cannot see."""

from __future__ import annotations

import datetime

from cloudfront_kinesis_log_lambda_spark.operators import quality as Q
from cloudfront_kinesis_log_lambda_spark.streaming.quality import (
    StreamingQualityChecks,
)

TS = datetime.datetime(1996, 1, 1)
SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _orders(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _cust(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "c_custkey long")


WAVES = [
    [(1, 10, "O", 5.0, TS, "1-URGENT"), (2, 11, "F", 7.0, TS, "5-LOW")],
    # orderkey 1 DUPLICATED ACROSS batches + a dangling custkey
    [(1, 10, "O", 5.0, TS, "1-URGENT"), (3, 99, "P", 1.0, TS, "3-MEDIUM")],
    # a null custkey and a bad status
    [(4, None, "X", 2.0, TS, "2-HIGH")],
]
CUSTKEYS = [10, 11]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_per_wave(spark, tmp_path):
    qc = StreamingQualityChecks(str(tmp_path / "qc"), _cust(spark, CUSTKEYS))
    for i, wave in enumerate(WAVES):
        qc(_orders(spark, wave), i)
        arrived = [r for w in WAVES[: i + 1] for r in w]
        got = _rows(qc.checks(spark))
        want = _rows(
            Q.quality_checks(_orders(spark, arrived), _cust(spark, CUSTKEYS))
        )
        assert got == want, f"divergence after wave {i}"


def test_cross_batch_duplicate_key_detected(spark, tmp_path):
    """orderkey 1 appears once per batch — each batch is locally
    unique, so only the key store can catch the duplicate."""
    qc = StreamingQualityChecks(str(tmp_path / "qc"), _cust(spark, CUSTKEYS))
    qc(_orders(spark, WAVES[0]), 0)
    got0 = {r["check"]: r for r in qc.checks(spark).collect()}
    assert got0["orderkey_unique"]["metric"] == 1.0
    qc(_orders(spark, WAVES[1]), 1)
    got1 = {r["check"]: r for r in qc.checks(spark).collect()}
    # 3 distinct keys over 4 rows
    assert got1["orderkey_unique"]["metric"] == 0.75
    assert not got1["orderkey_unique"]["passed"]
    assert got1["custkey_resolves"]["metric"] == 0.75  # custkey 99 dangles


def test_retry_rewrite_idempotent(spark, tmp_path):
    qc = StreamingQualityChecks(str(tmp_path / "qc"), _cust(spark, CUSTKEYS))
    qc(_orders(spark, WAVES[0]), 0)
    once = _rows(qc.checks(spark))
    qc(_orders(spark, WAVES[0]), 0)  # same-id retry overwrites in place
    assert _rows(qc.checks(spark)) == once


def test_only_empty_batches_fail_closed(spark, tmp_path):
    """Review finding: a history of only EMPTY micro-batches sums n to
    0, and the old bare `/` produced NaN metrics — which Spark orders
    above every number, so `metric >= threshold` passed FAIL-OPEN.
    The n>0 guard must yield NULL metrics → passed=False, matching the
    batch suite over zero rows."""
    qc = StreamingQualityChecks(str(tmp_path / "qc"), _cust(spark, CUSTKEYS))
    qc(_orders(spark, []), 0)
    qc(_orders(spark, []), 1)
    got = _rows(qc.checks(spark))
    want = _rows(
        Q.quality_checks(_orders(spark, []), _cust(spark, CUSTKEYS))
    )
    assert got == want
    rows = qc.checks(spark).collect()
    assert len(rows) == len(Q.QUALITY_THRESHOLDS)
    assert all(r["passed"] is False for r in rows)
    assert all(r["metric"] is None for r in rows)


def test_checks_before_first_batch_fail_closed(spark, tmp_path):
    """Review finding: a dashboard polling before the first micro-batch
    used to see NULL verdicts; the suite now fails closed."""
    qc = StreamingQualityChecks(str(tmp_path / "qc"), _cust(spark, CUSTKEYS))
    rows = qc.checks(spark).collect()
    assert len(rows) == len(Q.QUALITY_THRESHOLDS)
    assert all(r["passed"] is False for r in rows)
