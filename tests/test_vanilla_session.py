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
