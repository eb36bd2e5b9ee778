from __future__ import annotations

import math
import os

import pytest

from cloudfront_kinesis_log_lambda_spark.session import get_spark

#: Hypothesis example-count scale for the heavy property campaigns
#: (VERDICT r15 item 2: the driver's SERIAL `pytest tests/` run was cut
#: off mid-suite by its time budget — an incomplete gate is blind to
#: test regressions, which is worse than a thinner-but-complete one).
#: The default halves the example counts of the slowest property files
#: (the suite's runtime tail per tools/suite_durations.json); the
#: shrunk campaigns still walk the same strategy space every run, and
#: CFKLL_FUZZ_SCALE=1 restores the full counts for round-close /
#: deep-fuzz sessions (tools/run_suite_sharded.py stays the house way
#: to run those).
FUZZ_SCALE = float(os.environ.get("CFKLL_FUZZ_SCALE", "0.5"))


def fuzz_examples(n: int) -> int:
    """Scaled ``max_examples`` for a hypothesis @settings decorator —
    never below 2, so every property keeps at least a generate+shrink
    capable campaign."""
    return max(2, math.ceil(n * FUZZ_SCALE))


def ordered_waves(rows, cuts):
    """Shared schedule-property helper (r11 review: this body had been
    copy-pasted across five property suites): split a pre-ordered row
    list into contiguous waves at the given index cut points. Cuts ≥
    len(rows) are ignored; the final wave is nonempty whenever ``rows``
    is nonempty (rows=[] yields the single empty wave [[]] — current
    callers all draw rows with min_size=1)."""
    bounds = sorted(c for c in cuts if c < len(rows)) + [len(rows)]
    waves, start = [], 0
    for c in bounds:
        waves.append(rows[start:c])
        start = c
    return waves


def pytest_collection_modifyitems(config, items):
    """Auto-mark the hypothesis schedule/fuzz suites as ``slow`` (the
    two-tier split documented in pytest.ini): filename-based so a new
    property campaign never needs per-test bookkeeping."""
    for item in items:
        name = item.fspath.basename
        if name.endswith("_props.py") or name.endswith("_fuzz.py"):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    import os

    spark = get_spark(
        app_name="cfkll-spark-tests",
        # tools/run_suite_sharded.py splits the box's cores across
        # concurrent shard JVMs; a lone pytest keeps every core
        master=os.environ.get("CFKLL_TEST_MASTER", "local[*]"),
        shuffle_partitions=32,
        # tiny inputs: stop codegen/AQE from being the bottleneck in tests
        extra_conf={"spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


# --- shared events-table helpers (test_timeseries / test_sequence_fuzz) ----

EVENTS_BASE = __import__("datetime").datetime(2024, 1, 1)
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def make_events_df(spark, rows):
    """rows: (event_id, user_id, event_type, second_offset, value) →
    an events-shaped DataFrame at EVENTS_BASE + offset."""
    import datetime

    return spark.createDataFrame(
        [
            (i, EVENTS_BASE + datetime.timedelta(seconds=s), u, et, v, "{}")
            for (i, u, et, s, v) in rows
        ],
        EVENTS_SCHEMA,
    )


def patch_events_load(monkeypatch, module, df):
    """Route ``module.load(spark, sf, 'events')`` to ``df`` (other
    tables fall through to the real loader)."""
    import cloudfront_kinesis_log_lambda_spark.operators.relational as R

    orig = R.load
    monkeypatch.setattr(
        module,
        "load",
        lambda spark, sf, name: df
        if name == "events"
        else orig(spark, sf, name),
    )
