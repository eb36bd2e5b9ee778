"""Hypothesis properties: split-invariance for the last two
commutative-merge twin shapes.

- OHLC candles: open/close are struct-MIN/MAX by event key and
  high/low/n are MIN/MAX/SUM, so the merged candles must be identical
  under ANY assignment of events to waves (not just time-ordered
  ones) — the strongest split contract after HLL's.
- Markov transitions: within-wave pairs are SUM-merged but the
  boundary pair (last event of history → first of the wave) rides the
  as-of state store, so the law quantifies over CONTIGUOUS time-ordered
  cuts, like the EWMA fold.
Both compared against the batch operators bit-exactly, with
newest-wave retries interleaved.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from conftest import ordered_waves
from conftest import fuzz_examples

from cloudfront_kinesis_log_lambda_spark.operators import timeseries as TS
from cloudfront_kinesis_log_lambda_spark.streaming.ohlc import StreamingOHLC
from cloudfront_kinesis_log_lambda_spark.streaming.transitions import (
    StreamingTransitions,
)

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events_df(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    data = [
        (i, base + datetime.timedelta(seconds=s), u, t, v, "{}")
        for (i, u, t, v, s) in rows
    ]
    return (
        spark.createDataFrame(data, _SCHEMA)
        if data
        else spark.createDataFrame([], _SCHEMA)
    )


# (event_id, user, type, value, second) — ids/seconds co-sorted;
# seconds spaced 800 apart so candles span several hours
_rows_st = st.lists(
    st.tuples(st.integers(1, 3), st.sampled_from(["view", "click", "buy"])),
    min_size=2,
    max_size=14,
).map(
    lambda us: [
        (i, u, t, (i % 5) * 0.5 + 0.5, i * 800)
        for i, (u, t) in enumerate(us)
    ]
)


@settings(max_examples=fuzz_examples(4), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    _rows_st,
    st.lists(st.integers(0, 2), min_size=14, max_size=14),  # any assignment
    st.lists(st.booleans(), min_size=3, max_size=3),
)
def test_ohlc_candles_survive_any_split(spark, rows, assign, retries):
    full = _events_df(spark, rows)
    orig = TS.load
    d = tempfile.mkdtemp(prefix="ohlcprop-")
    try:
        TS.load = lambda s, sf, name: full
        want = sorted(
            map(tuple, TS.events_ohlc(spark, "unused").collect())
        )
        twin = StreamingOHLC(d)
        for bid in range(3):
            wave = [r for i, r in enumerate(rows) if assign[i] == bid]
            twin(_events_df(spark, wave), bid)
            if retries[bid]:
                twin(_events_df(spark, wave), bid)
        got = sorted(map(tuple, twin.candles(spark).collect()))
        assert got == want
    finally:
        TS.load = orig
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=fuzz_examples(4), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    _rows_st,
    st.sets(st.integers(1, 13), max_size=3),  # contiguous cut points
    st.lists(st.booleans(), min_size=4, max_size=4),
)
def test_transitions_survive_any_ordered_cut(spark, rows, cuts, retries):
    waves = ordered_waves(rows, cuts)
    full = _events_df(spark, rows)
    orig = TS.load
    d = tempfile.mkdtemp(prefix="transprop-")
    try:
        TS.load = lambda s, sf, name: full
        want = sorted(
            map(tuple, TS.event_transitions(spark, "unused").collect())
        )
        twin = StreamingTransitions(d)
        for bid, wave in enumerate(waves):
            twin(_events_df(spark, wave), bid)
            if retries[bid % len(retries)]:
                twin(_events_df(spark, wave), bid)
        got = sorted(map(tuple, twin.transitions(spark).collect()))
        assert got == want, (cuts,)
    finally:
        TS.load = orig
        shutil.rmtree(d, ignore_errors=True)
