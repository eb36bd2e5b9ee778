"""Time-series operators: EWMA fold exactness vs a Python recursion,
OHLC tie-break semantics, MAD robustness vs z-scores, transition
matrix edges, and attribution window boundaries — the cases the
uniform synthetic events can't produce."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import timeseries as TS


from conftest import make_events_df, patch_events_load


def _events(spark, rows):
    # rows: (event_id, user_id, event_type, second_offset, value)
    return make_events_df(spark, rows)


def _patched(monkeypatch, df):
    patch_events_load(monkeypatch, TS, df)


def test_ewma_matches_python_recursion(spark, monkeypatch):
    vals = [6.55, 12.31, 1.63, 9.87, 3.14159, 100.0, 0.01, 55.5]
    rows = [(i, 1, "view", i, v) for i, v in enumerate(vals)]
    rows += [(100, 2, "view", 0, 42.5)]  # single-event user → ewma = x0
    _patched(monkeypatch, _events(spark, rows))
    got = {r["user_id"]: r for r in TS.events_ewma(spark, "unused").collect()}

    acc = vals[0]
    for x in vals[1:]:
        acc = acc * (1.0 - TS.EWMA_ALPHA) + x * TS.EWMA_ALPHA
    assert got[1]["ewma"] == round(acc, 6)
    assert got[1]["n_events"] == len(vals)
    assert got[2]["ewma"] == 42.5


def test_ewma_orders_by_ts_then_event_id(spark, monkeypatch):
    # same ts, ids 10 and 2: fold order must be (2, 10) — id tiebreak
    rows = [(10, 1, "view", 5, 100.0), (2, 1, "view", 5, 0.0)]
    _patched(monkeypatch, _events(spark, rows))
    got = TS.events_ewma(spark, "unused").collect()[0]["ewma"]
    assert got == round(0.0 * 0.7 + 100.0 * 0.3, 6)  # starts from id=2


def test_holt_matches_python_recursion(spark, monkeypatch):
    """Level/trend/forecast vs the textbook two-point-init Holt
    recursion, EXACT (both engines fold the same IEEE DAG)."""
    vals = [10.0, 7.5, 3.125, 9.0, 6.25, 1.0]
    rows = [(i, 1, "t", i * 10, v) for i, v in enumerate(vals)]
    rows.append((99, 2, "t", 0, 42.0))  # single-event user: l=x0, b=0
    _patched(monkeypatch, _events(spark, rows))
    a, b_ = TS.HOLT_ALPHA, TS.HOLT_BETA
    l, b = vals[1], vals[1] - vals[0]
    for x in vals[2:]:
        nl = a * x + (1 - a) * (l + b)
        b = b_ * (nl - l) + (1 - b_) * b
        l = nl
    out = {r["user_id"]: r for r in TS.events_holt(spark, "unused").collect()}
    assert out[1]["n_events"] == len(vals)
    assert out[1]["level"] == round(l, 6)
    assert out[1]["trend"] == round(b, 6)
    assert out[1]["forecast"] == round(l + b, 6)
    assert out[2]["level"] == 42.0 and out[2]["trend"] == 0.0
    assert out[2]["forecast"] == 42.0


def test_holt_tracks_linear_trend_ewma_lags(spark, monkeypatch):
    """On a clean linear ramp the Holt forecast must sit close to the
    true next value while EWMA lags below — the operator's reason to
    exist next to events_ewma."""
    vals = [float(2 * i) for i in range(30)]  # 0, 2, 4, ... 58; next=60
    rows = [(i, 1, "t", i * 10, v) for i, v in enumerate(vals)]
    _patched(monkeypatch, _events(spark, rows))
    holt = TS.events_holt(spark, "unused").collect()[0]
    ewma = TS.events_ewma(spark, "unused").collect()[0]
    assert abs(holt["forecast"] - 60.0) < 1.0
    assert ewma["ewma"] < 55.0  # the lag


def test_ohlc_open_close_tiebreak_and_extremes(spark, monkeypatch):
    rows = [
        (0, 1, "view", 0, 5.0),     # open (earliest)
        (1, 1, "view", 60, 99.0),   # high
        (2, 1, "view", 120, 0.5),   # low
        (3, 1, "view", 3599, 7.0),  # close (latest in hour)
        (4, 1, "view", 3600, 1.0),  # next hour
    ]
    _patched(monkeypatch, _events(spark, rows))
    out = {r["hour"]: r for r in TS.events_ohlc(spark, "unused").collect()}
    h0 = out["2024-01-01 00:00"]
    assert (h0["open"], h0["high"], h0["low"], h0["close"]) == (
        5.0, 99.0, 0.5, 7.0,
    )
    assert h0["n_events"] == 4
    assert out["2024-01-01 01:00"]["open"] == 1.0


def test_mad_flags_planted_outliers_zscore_wouldnt(spark, monkeypatch):
    # 30 values at 10±0.5 plus two spikes: MAD stays ~0.5 so both
    # spikes flag; stddev is inflated by the spikes themselves.
    rows = [(i, 1, "metric", i, 10.0 + (0.5 if i % 2 else -0.5))
            for i in range(30)]
    rows += [(100, 1, "metric", 100, 500.0), (101, 1, "metric", 101, -400.0)]
    _patched(monkeypatch, _events(spark, rows))
    out = TS.events_mad_outliers(spark, "unused").collect()[0]
    assert out["median_value"] == pytest.approx(10.0, abs=0.5)
    assert out["mad"] == pytest.approx(0.5, abs=1e-9)
    assert out["n_outliers"] == 2
    assert out["outlier_rate"] == round(2 / 32, 6)


def test_mad_all_constant_series_has_zero_outliers(spark, monkeypatch):
    # constant series: MAD = 0, nothing beyond 3·0 — and no div-by-zero
    rows = [(i, 1, "metric", i, 7.0) for i in range(10)]
    _patched(monkeypatch, _events(spark, rows))
    out = TS.events_mad_outliers(spark, "unused").collect()[0]
    assert out["mad"] == 0.0 and out["n_outliers"] == 0


def test_seasonal_outliers_catch_what_global_mad_misses(spark, monkeypatch):
    """A value wild FOR ITS HOUR but inside the global spread: the
    hour-of-day baseline flags it, the global baseline cannot."""
    rows = []
    eid = 0
    # hour 3 (seconds 3*3600+…): quiet baseline ~10, one planted 100
    for i in range(20):
        rows.append((eid, 1, "t", 3 * 3600 + i, 10.0 + (i % 3))); eid += 1
    rows.append((eid, 1, "t", 3 * 3600 + 50, 100.0)); eid += 1
    # hour 12: loud baseline ~1000 (drags the global median/MAD wide)
    for i in range(21):
        rows.append((eid, 1, "t", 12 * 3600 + i, 1000.0 + 10 * (i % 5))); eid += 1
    _patched(monkeypatch, _events(spark, rows))
    seasonal = {
        (r["event_type"], r["hod"]): r["n_outliers"]
        for r in TS.events_seasonal_outliers(spark, "unused").collect()
    }
    glob = {
        r["event_type"]: r["n_outliers"]
        for r in TS.events_mad_outliers(spark, "unused").collect()
    }
    assert seasonal[("t", 3)] == 1    # the planted 100 at 3 a.m.
    assert seasonal[("t", 12)] == 0
    # global MAD spans the bimodal 10/1000 mix: 100 sits INSIDE its
    # band, so the coarse baseline flags nothing at hour 3's scale
    assert glob["t"] == 0


def test_transitions_counts_and_probs(spark, monkeypatch):
    # user 1: a->b->a->b ; user 2: a->b  ⇒ a->b ×3, b->a ×1
    rows = [
        (0, 1, "a", 0, 1.0), (1, 1, "b", 1, 1.0),
        (2, 1, "a", 2, 1.0), (3, 1, "b", 3, 1.0),
        (4, 2, "a", 0, 1.0), (5, 2, "b", 1, 1.0),
    ]
    _patched(monkeypatch, _events(spark, rows))
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in TS.event_transitions(spark, "unused").collect()
    }
    assert got[("a", "b")] == (3, 1.0)
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 2  # no cross-user pair (user2.b -> nothing)


def test_attribution_window_and_none_bucket(spark, monkeypatch):
    day = 86_400
    rows = [
        # user 1: click 1h before purchase → attributed to click
        (0, 1, "click", 0, 1.0),
        (1, 1, "purchase", 3600, 50.0),
        # user 2: view 4 days before purchase → outside 3-day window
        (2, 2, "view", 0, 1.0),
        (3, 2, "purchase", 4 * day, 30.0),
        # user 3: purchase with no prior touch at all
        (4, 3, "purchase", 100, 20.0),
        # user 4: view then click → LAST touch (click) wins
        (5, 4, "view", 0, 1.0),
        (6, 4, "click", 600, 1.0),
        (7, 4, "purchase", 1200, 40.0),
        # user 5: touch exactly AT the window boundary → still inside
        (8, 5, "view", 0, 1.0),
        (9, 5, "purchase", 3 * day, 10.0),
    ]
    _patched(monkeypatch, _events(spark, rows))
    got = {
        r["touch"]: r
        for r in TS.attribution_last_touch(spark, "unused").collect()
    }
    assert got["click"]["n_purchases"] == 2
    assert got["click"]["attributed_value"] == 90.0
    assert got["none"]["n_purchases"] == 2  # outside-window + no-touch
    assert got["none"]["attributed_value"] == 50.0
    assert got["none"]["avg_hours_to_convert"] is None
    assert got["view"]["n_purchases"] == 1
    # hours: (3600/3600 + 600/3600)/2 for click; 72h for view
    assert got["click"]["avg_hours_to_convert"] == round(
        (3600 + 600) / 2 / 3600, 4
    )
    assert got["view"]["avg_hours_to_convert"] == 72.0


def test_purchase_is_not_its_own_touch(spark, monkeypatch):
    # consecutive purchases: the second must NOT attribute to the first
    rows = [
        (0, 1, "purchase", 0, 5.0),
        (1, 1, "purchase", 60, 6.0),
    ]
    _patched(monkeypatch, _events(spark, rows))
    got = TS.attribution_last_touch(spark, "unused").collect()
    assert len(got) == 1 and got[0]["touch"] == "none"
    assert got[0]["n_purchases"] == 2


# --- property-based fold parity (the §5.4 pattern) --------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_val = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
# structured adversarial cases FIRST (the r6 fuzz lesson: runs,
# extremes, and sign flips explicitly, not left to rng luck)
_ADVERSARIAL = [
    [5.0] * 30,                       # constant run
    [1e6, -1e6] * 15,                 # alternating extremes
    [1e-12] * 5 + [1e6] * 5,          # magnitude cliff
    [-1.0, -2.0, -4.0, -8.0],         # monotone negative
    [0.0, 0.0, 1.0],                  # zeros then step
]
_series = st.one_of(
    st.sampled_from(_ADVERSARIAL),
    st.lists(_val, min_size=1, max_size=40),
)


def _py_ewma(vals, a=0.3):
    y = vals[0]
    for x in vals[1:]:
        y = y * (1 - a) + x * a
    return y


def _py_holt(vals, a=0.3, b_=0.2):
    if len(vals) == 1:
        return vals[0], 0.0
    l, b = vals[1], vals[1] - vals[0]
    for x in vals[2:]:
        nl = a * x + (1 - a) * (l + b)
        b = b_ * (nl - l) + (1 - b_) * b
        l = nl
    return l, b


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_series, min_size=1, max_size=4))
def test_fold_parity_fuzz_vs_python(spark, series_batch):
    """EWMA and Holt folds vs the Python recursion, EXACT (bit-equal
    before the ROUND-6 edge) across adversarial and random series —
    each hypothesis example is a multi-user batch (one user per
    series) so one Spark job checks several folds. (Patches TS.load
    directly — function-scoped monkeypatch doesn't reset between
    hypothesis examples.)"""
    rows = []
    eid = 0
    for u, vals in enumerate(series_batch):
        for i, v in enumerate(vals):
            rows.append((eid, u, "t", i * 10, float(v)))
            eid += 1
    df = _events(spark, rows)
    orig = TS.load
    TS.load = lambda s, sf, name: df
    try:
        ew = {
            r["user_id"]: r["ewma"]
            for r in TS.events_ewma(spark, "x").collect()
        }
        ho = {
            r["user_id"]: (r["level"], r["trend"])
            for r in TS.events_holt(spark, "x").collect()
        }
    finally:
        TS.load = orig
    for u, vals in enumerate(series_batch):
        assert ew[u] == round(_py_ewma(vals), 6), (u, vals)
        l, b = _py_holt(vals)
        assert ho[u] == (round(l, 6), round(b, 6)), (u, vals)


def _py_hw(buckets, a=0.3, b_=0.2, g=0.3, m=24):
    # buckets: [(x, p)] ordered by hour; mirrors holt_winters_merge_lambda
    l, b, s = buckets[0][0], 0.0, [0.0] * m
    for x, p in buckets[1:]:
        nl = a * (x - s[p]) + (1 - a) * (l + b)
        nb = b_ * (nl - l) + (1 - b_) * b
        s[p] = g * (x - nl) + (1 - g) * s[p]
        l, b = nl, nb
    p_next = (buckets[-1][1] + 1) % m
    return l, b, s[p_next]


def test_holt_winters_matches_python_recursion(spark, monkeypatch):
    """Level/trend/season/forecast vs the textbook additive HW
    recursion, EXACT before the ROUND-6 edge. Buckets span a midnight
    wrap (30 hours) and one hour holds several events, so the
    decimal-sum bucketing and the position wrap are both exercised
    (values are multiples of 0.25 — float-exact sums on both sides)."""
    rows, eid = [], 0
    vals = [0.25 * ((7 * i) % 40 - 20) for i in range(30)]  # sign flips
    for h, v in enumerate(vals):
        rows.append((eid, 1, "t", h * 3600, v)); eid += 1
        if h == 3:  # multi-event bucket: 3 extra rows summing into x
            for extra in (0.5, -1.25, 2.0):
                rows.append((eid, 1, "t", h * 3600 + 60, extra)); eid += 1
    _patched(monkeypatch, _events(spark, rows))
    buckets = [
        (v + (1.25 if h == 3 else 0.0), h % 24) for h, v in enumerate(vals)
    ]
    l, b, sn = _py_hw(buckets)
    out = {r["event_type"]: r
           for r in TS.events_holt_winters(spark, "x").collect()}["t"]
    assert out["n_buckets"] == 30
    assert out["level"] == round(l, 6)
    assert out["trend"] == round(b, 6)
    assert out["season_next"] == round(sn, 6)
    assert out["forecast"] == round(l + b + sn, 6)


def test_holt_winters_single_bucket_is_init(spark, monkeypatch):
    _patched(monkeypatch, _events(spark, [(0, 1, "t", 0, 42.0)]))
    out = TS.events_holt_winters(spark, "x").collect()[0]
    assert (out["n_buckets"], out["level"], out["trend"]) == (1, 42.0, 0.0)
    assert out["season_next"] == 0.0 and out["forecast"] == 42.0


def test_holt_winters_absorbs_seasonality_holt_cannot(spark, monkeypatch):
    """Pure hour-of-day signal (100 at hour 0, 10 otherwise) for 7
    days: the HW forecast for the next hour-0 spike must beat the
    seasonless Holt forecast by a wide margin — the operator's reason
    to exist next to events_holt."""
    rows, eid = [], 0
    for h in range(7 * 24):  # last bucket is hour 23 → next is the spike
        v = 100.0 if h % 24 == 0 else 10.0
        rows.append((eid, 1, "spiky", h * 3600, v)); eid += 1
    _patched(monkeypatch, _events(spark, rows))
    hw = TS.events_holt_winters(spark, "x").collect()[0]
    assert hw["season_next"] > 30.0  # hour-0 slot has absorbed the spike
    assert abs(hw["forecast"] - 100.0) < 40.0  # Holt would sit near ~10


def _py_cusum(xs, k=0.5, h=4.0):
    # mirrors cusum_merge_lambda + the decimal-exact mu/sigma baseline
    n = len(xs)
    mu = sum(xs) / n  # test values are dyadic: float sum is exact
    ex2 = sum(x * x for x in xs) / n
    sigma = max(0.0, ex2 - mu * mu) ** 0.5
    ks, hs = k * sigma, h * sigma
    sp = sn = 0.0
    na, fa = 0, 0
    for i, x in enumerate(xs):
        sp = max(0.0, sp + (x - mu - ks))
        sn = max(0.0, sn + (mu - x - ks))
        if sp > hs or sn > hs:
            na += 1
            if fa == 0:
                fa = i + 1
    return mu, sigma, sp, sn, na, fa


def test_cusum_matches_python_replay(spark, monkeypatch):
    """Alarm count, first-alarm index/hour, and final sums vs a Python
    replay of the identical fold — one event per hourly bucket, dyadic
    values so the decimal-quantized baseline equals the float one."""
    xs = [10.0 + (0.5 if i % 2 else -0.5) for i in range(24)]
    xs += [13.0] * 24  # level shift at bucket 25
    rows = [(i, 1, "t", i * 3600, v) for i, v in enumerate(xs)]
    _patched(monkeypatch, _events(spark, rows))
    _, _, sp, sn, na, fa = _py_cusum(xs)
    out = TS.events_cusum_changepoints(spark, "x").collect()[0]
    assert out["n_buckets"] == 48
    assert out["n_alarms"] == na and na > 0
    # with a 50/50 split the global baseline sits BETWEEN the halves,
    # so the negative side alarms in the low prefix first — engines
    # must agree on that exact index (the 36/12 test pins the
    # alarm-inside-the-shift case)
    assert out["first_alarm_idx"] == fa and fa > 0
    assert out["first_alarm_hour"] == (
        f"2024-01-{1 + (fa - 1) // 24:02d} {(fa - 1) % 24:02d}:00"
    )
    assert out["cusum_pos"] == round(sp, 6)
    assert out["cusum_neg"] == round(sn, 6)


def test_cusum_constant_series_never_alarms(spark, monkeypatch):
    rows = [(i, 1, "t", i * 3600, 7.0) for i in range(30)]
    _patched(monkeypatch, _events(spark, rows))
    out = TS.events_cusum_changepoints(spark, "x").collect()[0]
    assert out["n_alarms"] == 0 and out["first_alarm_idx"] == 0
    assert out["first_alarm_hour"] is None
    assert out["cusum_pos"] == 0.0 and out["cusum_neg"] == 0.0


def test_cusum_flags_persistent_shift_mad_misses(spark, monkeypatch):
    """The operator's reason to exist: a +0.7-MAD-per-point drift (36
    baseline buckets, then 12 at 11.2) never leaves the ±3·MAD band —
    events_mad_outliers reports zero — but the drift accumulates in
    sp and crosses h·sigma."""
    xs = [9.5 if i % 2 else 10.5 for i in range(36)] + [11.2] * 12
    rows = [(i, 1, "t", i * 3600, v) for i, v in enumerate(xs)]
    _patched(monkeypatch, _events(spark, rows))
    mad = TS.events_mad_outliers(spark, "x").collect()[0]
    assert mad["n_outliers"] == 0
    cu = TS.events_cusum_changepoints(spark, "x").collect()[0]
    assert cu["n_alarms"] > 0 and cu["first_alarm_idx"] > 36
