"""Seeded-random fuzz of the event-sequence operators (Markov
transitions, last-touch attribution, conversion paths) against
brute-force pure-Python replays.

Same rationale as test_stats_fuzz.py / test_graph_stats_fuzz.py: the
DuckDB oracles mirror the window/session SHAPE of the Spark plans, so
an ordering or boundary bug shared by both (wrong tie-break, off-by-one
at the attribution window edge, gap comparison drift) hash-matches
green. The replays below re-derive the semantics from the documented
contracts only: (ts, event_id) total order, strictly-preceding-row
touch carry, inclusive 3-day window, >1800 s session split.
"""

from __future__ import annotations

import random
from collections import Counter

import datetime

from conftest import make_events_df, patch_events_load

from cloudfront_kinesis_log_lambda_spark.operators import timeseries as TS

TYPES = ["view", "click", "purchase", "checkout"]
BASE_DAY0 = datetime.date(2024, 1, 1)


def _random_stream(seed, n_users=8, max_events=30):
    """Rows (event_id, user_id, type, sec_offset, value): integer-second
    offsets WITH collisions (tie-break must fall to event_id), values in
    exact quarters (binary-exact sums), lags spanning the 3-day window
    both ways, gaps spanning the 1800 s session split both ways."""
    rng = random.Random(seed)
    rows = []
    eid = 0
    for u in range(1, n_users + 1):
        t = rng.randrange(0, 3600)
        for _ in range(rng.randint(1, max_events)):
            rows.append(
                (
                    eid,
                    u,
                    rng.choice(TYPES),
                    t,
                    rng.randrange(0, 400) * 0.25,
                )
            )
            eid += 1
            # 30% duplicate timestamp, else jump up to ~1 day so both
            # the session gap and the 3-day window cut somewhere
            if rng.random() > 0.3:
                t += rng.randrange(1, 90_000)
    return rows


def _df(spark, rows):
    return make_events_df(spark, rows)


def _patched(monkeypatch, df):
    patch_events_load(monkeypatch, TS, df)


def _by_user(rows):
    users = {}
    for r in rows:
        users.setdefault(r[1], []).append(r)
    # the operators' total order: ts asc, event_id asc
    for seq in users.values():
        seq.sort(key=lambda r: (r[3], r[0]))
    return users


def test_transitions_fuzz_vs_replay(spark, monkeypatch):
    for seed in (11, 12, 13):
        rows = _random_stream(seed)
        _patched(monkeypatch, _df(spark, rows))
        got = {
            (r["from_type"], r["to_type"]): (r["n"], r["prob"])
            for r in TS.event_transitions(spark, "unused").collect()
        }
        want = Counter()
        for seq in _by_user(rows).values():
            for a, b in zip(seq, seq[1:]):
                want[(a[2], b[2])] += 1
        assert set(got) == set(want), seed
        totals = Counter()
        for (f, _), n in want.items():
            totals[f] += n
        for k, n in want.items():
            assert got[k][0] == n, (seed, k)
            assert abs(got[k][1] - n / totals[k[0]]) <= 5e-7, (seed, k)


def test_attribution_fuzz_vs_replay(spark, monkeypatch):
    window_s = TS.ATTRIBUTION_WINDOW_DAYS * 86_400
    for seed in (21, 22, 23):
        rows = _random_stream(seed)
        _patched(monkeypatch, _df(spark, rows))
        got = {
            r["touch"]: r
            for r in TS.attribution_last_touch(spark, "unused").collect()
        }
        buckets: dict[str, list[tuple[float, int]]] = {}
        for seq in _by_user(rows).values():
            last_touch = None  # (type, sec) of latest PRECEDING row
            for _, _, et, s, v in seq:
                if et == TS.CONVERSION_TYPE:
                    if (
                        last_touch is not None
                        and s - last_touch[1] <= window_s  # inclusive edge
                    ):
                        buckets.setdefault(last_touch[0], []).append(
                            (v, s - last_touch[1])
                        )
                    else:
                        buckets.setdefault("none", []).append((v, 0))
                if et in TS.TOUCH_TYPES:
                    last_touch = (et, s)
        assert set(got) == set(buckets), seed
        for touch, hits in buckets.items():
            r = got[touch]
            assert r["n_purchases"] == len(hits), (seed, touch)
            assert r["attributed_value"] == round(
                sum(v for v, _ in hits), 2
            ), (seed, touch)
            if touch == "none":
                assert r["avg_hours_to_convert"] is None, seed
            else:
                want = sum(lag for _, lag in hits) / len(hits) / 3600.0
                assert abs(r["avg_hours_to_convert"] - want) <= 2e-4, (
                    seed,
                    touch,
                )


def test_sessionize_fuzz_vs_replay(spark, monkeypatch):
    """30-min-gap sessionization: session count, sizes, and start
    timestamps against a sequential replay over (ts, event_id) order.

    The injected user pins the boundary the random stream almost never
    hits (review finding: P(random gap == exactly 1800) ≈ 0.001%, so a
    `>= 1800` operator mutation passed every seed): gaps of exactly
    1800 s (same session — the split is strictly >) and 1801 s (new
    session)."""
    from cloudfront_kinesis_log_lambda_spark.operators import (
        relational as R,
    )

    for seed in (81, 82, 83):
        rows = _random_stream(seed)
        eid0 = max(r[0] for r in rows) + 1
        rows += [
            (eid0, 999, "view", 0, 1.0),
            (eid0 + 1, 999, "view", 1800, 1.0),       # gap == 1800: same
            (eid0 + 2, 999, "view", 1800 + 1801, 1.0),  # gap 1801: new
        ]
        df = _df(spark, rows)
        patch_events_load(monkeypatch, R, df)
        got = sorted(
            (r["user_id"], r["session_id"], r["n_events"], r["session_start"])
            for r in R.sessionize_events(spark, "unused").collect()
        )
        want = []
        for u, seq in _by_user(rows).items():
            sid, prev_s, n, start = 0, None, 0, None
            for _, _, _, s, _ in seq:
                if prev_s is None or s - prev_s > 1800:
                    if n:
                        want.append((u, sid, n, start))
                    sid += 1
                    n, start = 0, s
                n += 1
                prev_s = s
            want.append((u, sid, n, start))
        from conftest import EVENTS_BASE

        want = sorted(
            (
                u,
                sid,
                n,
                (
                    EVENTS_BASE + datetime.timedelta(seconds=start)
                ).strftime("%Y-%m-%d %H:%M:%S"),
            )
            for u, sid, n, start in want
        )
        assert got == want, seed
        # boundary user: exactly-1800 stayed in session 1, 1801 split
        boundary = [w for w in want if w[0] == 999]
        assert [(s, n) for _, s, n, _ in boundary] == [(1, 2), (2, 1)]


def test_moving_hour_sum_fuzz_vs_replay(spark, monkeypatch):
    """Trailing-3599s RANGE frame: per event, sum/count over the user's
    events in [ts-3599, ts] INCLUDING equal-timestamp peers (the frame
    is range-based, so peers join the frame regardless of row order).

    Review findings folded in: a dense in-window user (gaps drawn from
    [1, 3600)) makes the strictly-earlier-but-in-frame path
    load-bearing, not a 5-data-point afterthought; an injected user
    pins the 3599-in / 3600-out frame edge the random gaps never hit;
    and the collected row count is asserted so duplicate-emitting
    regressions can't hide behind the event_id dict."""
    from cloudfront_kinesis_log_lambda_spark.operators import (
        relational as R,
    )

    for seed in (91, 92, 93):
        rows = _random_stream(seed, n_users=5, max_events=20)
        rng = random.Random(seed + 1000)
        eid = max(r[0] for r in rows) + 1
        # dense user: every gap inside the window
        t = 0
        for _ in range(15):
            rows.append((eid, 998, "view", t, rng.randrange(0, 40) * 0.25))
            eid += 1
            t += rng.randrange(1, 3600)
        # frame-edge user: 3599 s apart (in frame) then 3600 s (out)
        rows += [
            (eid, 999, "view", 0, 1.25),
            (eid + 1, 999, "view", 3599, 2.25),
            (eid + 2, 999, "view", 3599 + 3600, 4.25),
        ]
        df = _df(spark, rows)
        patch_events_load(monkeypatch, R, df)
        collected = R.events_moving_hour_sum(spark, "unused").collect()
        assert len(collected) == len(rows), seed
        got = {
            r["event_id"]: (r["moving_sum_1h"], r["n_events_1h"])
            for r in collected
        }
        by_user = _by_user(rows)
        for u, seq in by_user.items():
            for eid2, _, _, s, _ in seq:
                frame = [
                    v for _, _, _, s2, v in seq if s - 3599 <= s2 <= s
                ]
                assert got[eid2] == (round(sum(frame), 2), len(frame)), (
                    seed,
                    eid2,
                )
        # the edge user, spelled out: row 2 sees row 1 (3599 s back),
        # row 3 does NOT see row 2 (3600 s back)
        assert got[eid + 1] == (3.5, 2)
        assert got[eid + 2] == (4.25, 1)


def test_pattern_match_fuzz_vs_replay(spark, monkeypatch):
    """First-day 24-bucket hourly profiles vs the hour%6 query pattern:
    zero-filled squared euclidean distance, top-5 by (dist, user_id).
    The replay pins the zero-fill contract — a user with NO events at
    hour h still pays (0 - p_h)²."""
    from cloudfront_kinesis_log_lambda_spark.operators import (
        relational as R,
    )

    day_s = 86_400
    for seed in (71, 72, 73):
        rng = random.Random(seed)
        rows, eid = [], 0
        for u in range(1, 25):
            # some users start on a later day → excluded from day0
            base_day = rng.choice([0, 0, 0, 1, 2])
            for _ in range(rng.randint(1, 20)):
                rows.append(
                    (
                        eid,
                        u,
                        rng.choice(TYPES),
                        base_day * day_s + rng.randrange(0, day_s),
                        1.0,
                    )
                )
                eid += 1
        df = _df(spark, rows)
        patch_events_load(monkeypatch, R, df)
        got = [
            (r["user_id"], r["dist_sq"])
            for r in R.events_pattern_match(spark, "unused").collect()
        ]
        day0 = min(s // day_s for _, _, _, s, _ in rows)
        counts: dict[int, Counter] = {}
        for _, u, _, s, _ in rows:
            if s // day_s == day0:
                counts.setdefault(u, Counter())[(s % day_s) // 3600] += 1
        want = sorted(
            (
                sum(
                    (cnt.get(h, 0) - h % 6) ** 2 for h in range(24)
                ),
                u,
            )
            for u, cnt in counts.items()
        )[:5]
        assert got == [(u, d) for d, u in want], seed


def test_funnel_fuzz_vs_replay(spark, monkeypatch):
    """view → click-after-view → purchase-after-click with STRICT
    timestamp ordering (a click at the same second as the view does
    not advance the funnel) and NULL users dropped."""
    from cloudfront_kinesis_log_lambda_spark.operators import (
        relational as R,
    )

    for seed in (51, 52, 53):
        rng = random.Random(seed)
        rows, eid = [], 0
        for u in range(1, 15):
            uid = None if rng.random() < 0.15 else u
            t = rng.randrange(0, 600)
            for _ in range(rng.randint(1, 12)):
                rows.append(
                    (eid, uid, rng.choice(TYPES), t, 1.0)
                )
                eid += 1
                # 25% same-second collision to hit the strict-> edge
                if rng.random() > 0.25:
                    t += rng.randrange(1, 900)
        df = _df(spark, rows)
        patch_events_load(monkeypatch, R, df)
        got = {
            r["stage"]: r["n_users"]
            for r in R.events_funnel(spark, "unused").collect()
        }
        n_view = n_click = n_purchase = 0
        for uid, seq in _by_user(rows).items():
            if uid is None:
                continue
            t_view = min((s for _, _, et, s, _ in seq if et == "view"),
                         default=None)
            t_click = (
                min((s for _, _, et, s, _ in seq
                     if et == "click" and s > t_view), default=None)
                if t_view is not None else None
            )
            t_buy = (
                min((s for _, _, et, s, _ in seq
                     if et == "purchase" and s > t_click), default=None)
                if t_click is not None else None
            )
            n_view += t_view is not None
            n_click += t_click is not None
            n_purchase += t_buy is not None
        assert got == {
            "1_view": n_view,
            "2_click": n_click,
            "3_purchase": n_purchase,
        }, seed


def test_retention_cohorts_fuzz_vs_replay(spark, monkeypatch):
    """First-activity-day cohorts × day offsets 0..7 over distinct
    (user, day) activity."""
    from cloudfront_kinesis_log_lambda_spark.operators import (
        relational as R,
    )

    day_s = 86_400
    for seed in (61, 62, 63):
        rng = random.Random(seed)
        rows, eid = [], 0
        for u in range(1, 20):
            for _ in range(rng.randint(1, 15)):
                rows.append(
                    (
                        eid,
                        u,
                        rng.choice(TYPES),
                        rng.randrange(0, 12) * day_s
                        + rng.randrange(0, day_s),
                        1.0,
                    )
                )
                eid += 1
        df = _df(spark, rows)
        patch_events_load(monkeypatch, R, df)
        got = {
            (r["cohort_day"], r["day_offset"]): r["n_users"]
            for r in R.events_retention_cohorts(spark, "unused").collect()
        }
        days: dict[int, set[int]] = {}
        for _, u, _, s, _ in rows:
            days.setdefault(u, set()).add(s // day_s)
        want = Counter()
        for u, ds in days.items():
            c = min(ds)
            label = (BASE_DAY0 + datetime.timedelta(days=c)).isoformat()
            for d in ds:
                if d - c <= 7:
                    want[(label, d - c)] += 1
        assert got == dict(want), seed


def test_linear_trend_fuzz_vs_ols_reference(spark, monkeypatch):
    """Textbook OLS over (hour-since-epoch, value) per type, including
    the two degenerate legs: a single-hour type (slope/intercept/R²
    NULL) and a constant-value type (R² NULL).

    Values are multiples of 0.1 so each per-row y² is exact at 2
    decimals — inside the operator's documented decimal(·,3)
    quantization of the syy term (first fuzz run caught exactly this:
    a constant 5.25 squares to 27.5625, which quantizes to 27.563 and
    makes syc 0.002 instead of 0, turning R² from NULL into 0.0 — a
    contract boundary, not a bug). Reference moments accumulate the
    10×-scaled integers, so the replay is exact by construction."""
    for seed in (41, 42, 43):
        rng = random.Random(seed)
        rows, eid = [], 0
        for _ in range(rng.randint(20, 60)):
            rows.append(
                (
                    eid,
                    rng.randint(1, 5),
                    rng.choice(["t", "u"]),
                    rng.randrange(0, 40 * 3600),
                    rng.randrange(-2000, 2000) / 10.0,
                )
            )
            eid += 1
        # degenerate legs
        rows += [(eid + i, 1, "onehour", 100 + i, 1.0 * i) for i in range(4)]
        rows += [
            (eid + 10 + i, 1, "flat", i * 7200, 5.2) for i in range(4)
        ]
        _patched(monkeypatch, _df(spark, rows))
        got = {
            r["event_type"]: r
            for r in TS.events_linear_trend(spark, "unused").collect()
        }
        pts: dict[str, list[tuple[int, int]]] = {}
        for _, _, et, s, v in rows:
            pts.setdefault(et, []).append((s // 3600, round(v * 10)))
        for et, xy in pts.items():
            n = len(xy)
            sx = sum(x for x, _ in xy)
            sy = sum(k for _, k in xy) / 10.0
            sxx = sum(x * x for x, _ in xy)
            sxy = sum(x * k for x, k in xy) / 10.0
            syy = sum(k * k for _, k in xy) / 100.0
            den = sxx - sx * sx / n
            syc = syy - sy * sy / n
            r = got[et]
            assert r["n_events"] == n, (seed, et)
            if den == 0.0:
                assert r["slope_per_hour"] is None, (seed, et)
                assert r["intercept"] is None, (seed, et)
                assert r["r2"] is None, (seed, et)
                continue
            slope = (sxy - sx * sy / n) / den
            intercept = sy / n - slope * sx / n
            assert abs(r["slope_per_hour"] - slope) < 1e-5, (seed, et)
            assert abs(r["intercept"] - intercept) < 1e-5, (seed, et)
            if syc == 0.0:
                assert r["r2"] is None, (seed, et)
            else:
                r2 = (sxy - sx * sy / n) ** 2 / (den * syc)
                assert abs(r["r2"] - r2) < 1e-5, (seed, et)


def test_conversion_paths_fuzz_vs_replay(spark, monkeypatch):
    """The injected user pins the session-gap boundary for THIS
    operator's inline sessionizer (it shares the 1800 s rule with
    sessionize_events but not the code): exactly-1800 continues the
    session ('view>purchase>click>purchase' one path), 1801 splits."""
    for seed in (31, 32, 33):
        rows = _random_stream(seed)
        eid0 = max(r[0] for r in rows) + 1
        rows += [
            (eid0, 997, "view", 0, 1.0),
            (eid0 + 1, 997, "purchase", 1800, 1.0),  # gap 1800: same
            (eid0 + 2, 997, "click", 1800 + 1801, 1.0),  # 1801: split
            (eid0 + 3, 997, "purchase", 1800 + 1801 + 60, 1.0),
        ]
        _patched(monkeypatch, _df(spark, rows))
        got = [
            (r["path"], r["n_sessions"])
            for r in TS.top_conversion_paths(spark, "unused").collect()
        ]
        paths = Counter()
        for seq in _by_user(rows).values():
            sessions, cur, prev_s = [], [], None
            for _, _, et, s, _ in seq:
                if prev_s is None or s - prev_s > TS.SESSION_GAP_S:
                    cur = []
                    sessions.append(cur)
                cur.append(et)
                prev_s = s
            for sess in sessions:
                if TS.CONVERSION_TYPE in sess:
                    paths[">".join(sess)] += 1
        want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[
            : TS.PATHS_TOPK
        ]
        assert got == want, seed
        # the boundary user produced exactly these two converting
        # sessions (replay AND operator must agree the 1800 s gap did
        # not split, the 1801 s gap did)
        assert paths["view>purchase"] >= 1
        assert paths["click>purchase"] >= 1
