"""Guard against engine-session/driver-session conf skew.

Round-1 regression: ``load()`` relied on ``spark.sql.legacy.parquet.
nanosAsLong`` being set at session build (session.py), so any externally
built plain SparkSession threw PARQUET_TYPE_ILLEGAL on events.parquet
(TIMESTAMP NANOS) — 10 driver-gate queries errored. ``load()`` now sets
the conf at runtime, which this test proves on a genuinely bare session.

A bare session can't be built inside the test JVM (builder confs leak via
getOrCreate / sparkContext conf), so this runs a subprocess with NO
engine imports before the read.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("vanilla-load-probe")
    .master("local[2]")
    .getOrCreate()
)
from cloudfront_kinesis_log_lambda_spark.operators.relational import load

df = load(spark, "/root/testdata/sf0.001", "events")
assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes
n = df.count()
assert n > 0, n
# a second engine query end-to-end on the same plain session
from cloudfront_kinesis_log_lambda_spark.plans.registry import purchases_asof_view

m = purchases_asof_view(spark, "/root/testdata/sf0.001").count()
assert m > 0, m
print(f"VANILLA_OK {n} {m}")
"""


def test_load_works_on_plain_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "VANILLA_OK" in proc.stdout, proc.stdout


def test_time_bucketing_is_session_timezone_independent(spark, sf_dir):
    """r13 adversarial probe, pinned (VERDICT r12 item 7): the full
    time-centric oracle surface came back byte-identical under
    America/New_York AND Asia/Kolkata sessions (19 entries each,
    tools/probe_session_seams.py) because events.ts is TIMESTAMP_NTZ in
    parquet, the NTZ→session-LTZ cast + session-local rendering
    round-trips the wall clock, and F.window aligns buckets in
    session-LOCAL time. Pin the sharpest case as a cheap in-suite gate:
    a HALF-HOUR zone (whole-hour zones survive epoch-aligned hour
    bucketing by accident; +05:30 only survives local-time alignment) —
    tumbling windows AND the hour-rendered OHLC twin must match the UTC
    run exactly.

    Compared through the GATE'S lens (toPandas → session wall-clock,
    the conversion the driver hashes), not ``collect()``: collect
    renders instants in the OS zone, and the NTZ→session-LTZ cast
    intentionally maps the same wall-clock to different instants per
    session — wall-clock parity IS the contract, instant parity is
    not."""
    from cloudfront_kinesis_log_lambda_spark.operators.timeseries import (
        events_ohlc,
    )
    from cloudfront_kinesis_log_lambda_spark.plans.registry import (
        events_tumbling_windows,
    )

    def run():
        tw = (
            events_tumbling_windows(spark, sf_dir)
            .toPandas()
            .sort_values(["window_start", "event_type"])
            .reset_index(drop=True)
        )
        oh = (
            events_ohlc(spark, sf_dir)
            .toPandas()
            .sort_values(["hour", "event_type"])
            .reset_index(drop=True)
        )
        return tw, oh

    tz_key = "spark.sql.session.timeZone"
    before = spark.conf.get(tz_key)
    utc = run()
    try:
        spark.conf.set(tz_key, "Asia/Kolkata")
        ist = run()
    finally:
        spark.conf.set(tz_key, before)
    assert ist[0].equals(utc[0])
    assert ist[1].equals(utc[1])
