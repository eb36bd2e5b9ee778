"""Hypothesis property: the order-dependent EWMA twin equals the batch
operator under ANY contiguous-time wave split.

The deterministic parity test uses one fixed 3-wave split; the twin's
contract quantifies over every time-ordered partition — random cut
points move each user's fold boundaries arbitrarily (including users
whose entire series lands in one wave, users sliced at every event,
and empty waves), and the left-fold composition law says the result is
always bit-identical to the batch fold. Newest-wave retries are
interleaved (the as-of seed contract)."""

from __future__ import annotations

import datetime
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from conftest import ordered_waves
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import timeseries as TS
from cloudfront_kinesis_log_lambda_spark.streaming.ewma import StreamingEWMA

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events_df(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    data = [
        (i, base + datetime.timedelta(seconds=s), u, "t", v, "{}")
        for (i, u, v, s) in rows
    ]
    return (
        spark.createDataFrame(data, _SCHEMA)
        if data
        else spark.createDataFrame([], _SCHEMA)
    )


# (event_id, user, value, second): ids and seconds co-sorted so a cut
# in second-space is a cut in event order. Values are 0.5-multiples to
# keep the fold arithmetic repr-stable across engines.
_rows_st = st.lists(
    st.tuples(st.integers(1, 4), st.integers(0, 40)), min_size=1, max_size=14
).map(
    lambda us: [
        (i, u, (i % 7) * 0.5 + 0.5, i * 10) for i, (u, _) in enumerate(us)
    ]
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    _rows_st,
    st.sets(st.integers(1, 13), max_size=3),  # cuts in event-index space
    st.lists(st.booleans(), min_size=4, max_size=4),
)
def test_any_time_ordered_split_matches_batch(spark, rows, cuts, retries):
    waves = ordered_waves(rows, cuts)

    full = _events_df(spark, rows)
    orig = TS.load
    d = tempfile.mkdtemp(prefix="ewmaprop-")
    try:
        TS.load = lambda s, sf, name: full
        want = {
            r["user_id"]: (r["n_events"], r["ewma"])
            for r in TS.events_ewma(spark, "unused").collect()
        }
        twin = StreamingEWMA(d)
        for bid, wave in enumerate(waves):
            twin(_events_df(spark, wave), bid)
            if retries[bid % len(retries)]:
                twin(_events_df(spark, wave), bid)  # as-of retry
        got = {
            r["user_id"]: (r["n_events"], r["ewma"])
            for r in twin.ewma(spark).collect()
        }
        assert got == want, (cuts,)
    finally:
        TS.load = orig
        shutil.rmtree(d, ignore_errors=True)
