"""First-principles boundary properties for the r14/r15 domain guards
(VERDICT r14 item 4).

Every guard literal in ``operators/util.py`` is consumed by BOTH the
Spark plan and the DuckDB oracle, so a wrong bound hash-matches green —
the shared-algebra blind spot that hid the r8 chi² and r9 fingerprint
bugs. These properties re-derive each bound from pure Python / numpy
replays of the protected operation (decimal quantization, int64 cast,
sum-of-squares, ns-envelope conversion) with NO engine in the loop, at
and adjacent to the boundary (``math.nextafter`` neighbors), plus a
LIVE-MUTANT witness per guard: the smallest loosening of the bound that
admits a value the protected operation cannot survive. A copy-paste
error in a bound literal now fails here even though the hash gate
cannot see it.

Mutation ledger (each witness below kills the named mutant):

===========================  ===================================  =========
guard                        smallest killed loosening            witness
===========================  ===================================  =========
DECIMAL_18_9_BOUND (1e9-1)   bound > 1e9 (margin-free mutant)     v = 1e9
DECIMAL_18_3_BOUND (1e15-1)  bound > 1e15                         v = 1e15
DECIMAL_18_4_BOUND (1e14-1)  bound > 1e14                         v = 1e14
BIGINT_DOMAIN_BOUND (2^63)   ONE ULP up                           v = 2^63
VARIANCE_DOMAIN_BOUND        TWO ULPs up (strict< + 1 ulp)        v = next2(B)
TS_SPINE_DOMAIN_{LO,HI}      ONE DAY out (the rounding unit)      ±1 day
===========================  ===================================  =========
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cloudfront_kinesis_log_lambda_spark.operators.util import (
    BIGINT_DOMAIN_BOUND,
    DECIMAL_18_3_BOUND,
    DECIMAL_18_4_BOUND,
    DECIMAL_18_9_BOUND,
    TS_SPINE_DOMAIN_HI,
    TS_SPINE_DOMAIN_LO,
    VARIANCE_DOMAIN_BOUND,
)

DBL_MAX = 1.7976931348623157e308


def _fits_decimal(v: float, scale: int, precision: int = 18) -> bool:
    """Pure-Python replay of CAST(double AS DECIMAL(precision, scale)):
    exact binary value, setScale(scale, HALF_UP) — the semantics both
    Spark (java BigDecimal) and DuckDB use — then the range check."""
    q = Decimal(v).quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP)
    return abs(q) < Decimal(10) ** (precision - scale)


DECIMAL_GUARDS = [
    (DECIMAL_18_9_BOUND, 9, 1e9),
    (DECIMAL_18_3_BOUND, 3, 1e15),
    (DECIMAL_18_4_BOUND, 4, 1e14),
]


@pytest.mark.parametrize("bound,scale,power", DECIMAL_GUARDS)
def test_decimal_bound_boundary_values_fit(bound, scale, power):
    """Every double at/adjacent to the bound that the guard ADMITS must
    quantize into DECIMAL(18, scale) without overflow — including the
    worst admitted double (largest representable below the bound) and
    values that round UP at the cast."""
    assert bound == power - 1.0  # the literal is derived, not ad hoc
    edges = [
        bound - 1.0,
        math.nextafter(bound, 0),
        bound - 0.5,  # rounds up at every scale here
        math.nextafter(bound, math.inf),  # first REJECTED double
        bound,  # rejected (strict <)
    ]
    for v in edges:
        if abs(v) < bound:
            assert _fits_decimal(v, scale), v
            assert _fits_decimal(-v, scale), -v
    # the whole admitted margin up to the true algebraic edge fits too:
    # the -1 unit is headroom, not the safety line itself…
    assert _fits_decimal(math.nextafter(power, 0), scale)
    # …and the true edge is EXACTLY power: the margin-free mutant
    # (bound = power + any ulp) admits `power`, which overflows. This
    # is the live mutant: bound literals above `power` fail here.
    assert not _fits_decimal(power, scale)


@pytest.mark.parametrize("bound,scale,power", DECIMAL_GUARDS)
@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_decimal_bound_random_admitted_values_fit(bound, scale, power, data):
    v = data.draw(
        st.floats(
            min_value=-bound,
            max_value=bound,
            allow_nan=False,
            allow_infinity=False,
            exclude_min=True,
            exclude_max=True,
        )
    )
    assert _fits_decimal(v, scale), v


def test_bigint_bound_is_exactly_2_63_and_one_ulp_tight():
    """|v| < 2^63 (as a double, exact) casts losslessly in-range; the
    one-ulp-looser mutant admits 2^63 itself, which is NOT an int64."""
    assert BIGINT_DOMAIN_BOUND == 2.0**63
    worst = math.nextafter(BIGINT_DOMAIN_BOUND, 0)  # largest admitted
    assert worst == float(int(worst))  # integral at this magnitude
    assert int(worst) <= 2**63 - 1
    assert int(-worst) >= -(2**63)
    # live mutant: nextafter(2^63, inf) as the bound admits v = 2^63
    admitted_by_mutant = BIGINT_DOMAIN_BOUND
    assert admitted_by_mutant < math.nextafter(BIGINT_DOMAIN_BOUND, math.inf)
    assert int(admitted_by_mutant) > 2**63 - 1  # overflows int64


@settings(max_examples=300, deadline=None)
@given(
    v=st.floats(
        min_value=-BIGINT_DOMAIN_BOUND,
        max_value=BIGINT_DOMAIN_BOUND,
        allow_nan=False,
        allow_infinity=False,
        exclude_min=True,
        exclude_max=True,
    )
)
def test_bigint_bound_random_admitted_values_cast_in_range(v):
    # replay of CAST(double AS BIGINT): truncation toward zero
    assert -(2**63) <= math.trunc(v) <= 2**63 - 1


def test_variance_bound_squares_stay_finite_within_two_ulps():
    """Admitted values enter a sum-of-squares without overflowing a
    single term. The bound is the LARGEST double whose square is finite
    (so strict < leaves exactly one value of headroom): one ulp up is
    still safe, two ulps up admits a value whose square is Inf — the
    live mutant."""
    B = VARIANCE_DOMAIN_BOUND
    assert B * B < math.inf  # B itself squares finite…
    assert math.nextafter(B, 0) * math.nextafter(B, 0) < math.inf
    two_up = math.nextafter(math.nextafter(B, math.inf), math.inf)
    one_up = math.nextafter(B, math.inf)
    assert one_up * one_up == math.inf  # …and B is the LAST such double
    assert two_up * two_up == math.inf
    # derivation: B is within one ulp of sqrt(DBL_MAX)
    assert abs(B - math.sqrt(DBL_MAX)) <= math.ulp(B)


@settings(max_examples=300, deadline=None)
@given(
    v=st.floats(
        min_value=-VARIANCE_DOMAIN_BOUND,
        max_value=VARIANCE_DOMAIN_BOUND,
        allow_nan=False,
        allow_infinity=False,
        exclude_min=True,
        exclude_max=True,
    )
)
def test_variance_bound_random_admitted_squares_finite(v):
    assert v * v < math.inf


def test_ts_spine_domain_is_inside_ns_envelope_one_day_tight():
    """The spine domain literals convert to datetime64[ns] without
    overflow; one day OUTSIDE either literal does not — the guard is
    exactly the ns-interop envelope rounded inward to whole days (its
    documented derivation), and the one-day-out mutants are live."""
    import pandas as pd

    lo = pd.Timestamp(TS_SPINE_DOMAIN_LO)
    hi = pd.Timestamp(TS_SPINE_DOMAIN_HI)
    # in-envelope: ns conversion round-trips
    assert lo.as_unit("ns") == lo
    assert hi.as_unit("ns") == hi
    # one-day-out mutants (pandas parses at coarse unit, the ns
    # conversion is where the envelope bites)
    with pytest.raises(Exception):
        pd.Timestamp("1677-09-21 00:00:00").as_unit("ns")
    with pytest.raises(Exception):
        pd.Timestamp("2262-04-12 00:00:00").as_unit("ns")
    # the worst-case data-derived hourly spine is hard-capped ~5.12 M
    n_hours = (hi - lo).total_seconds() / 3600.0
    assert 5_000_000 < n_hours < 5_200_000


# --- _event_key total-order property (r15) ---------------------------------

#: proleptic calendar envelope in epoch-µs: 0001-01-01 .. 9999-12-31
#: 23:59:59.999999 — every instant either engine can represent
_PRO_MIN_US = -62_135_596_800_000_000
_PRO_MAX_US = 253_402_300_799_999_999


def _event_key_py(epoch_us: int, event_id: int, offset: int) -> str:
    """Pure-Python replay of timeseries._event_key / the events_ohlc
    oracle's lpad algebra (NO engine in the loop — both engines share
    the same expression, so a broken key hash-matches green; this
    property is the out-of-band check)."""
    return str(epoch_us - offset).zfill(20) + str(event_id).zfill(12)


def test_event_key_offset_is_the_proleptic_min():
    from cloudfront_kinesis_log_lambda_spark.operators.timeseries import (
        PROLEPTIC_MIN_US,
    )
    import datetime as dt

    assert PROLEPTIC_MIN_US == _PRO_MIN_US
    # derivation from first principles, not the shared literal
    epoch = dt.datetime(1970, 1, 1)
    assert (dt.datetime(1, 1, 1) - epoch) // dt.timedelta(microseconds=1) == _PRO_MIN_US
    # the offset key of the MAX instant still fits the 20-wide pad
    assert len(str(_PRO_MAX_US - _PRO_MIN_US)) <= 20


@settings(max_examples=500, deadline=None)
@given(
    a_us=st.integers(min_value=_PRO_MIN_US, max_value=_PRO_MAX_US),
    b_us=st.integers(min_value=_PRO_MIN_US, max_value=_PRO_MAX_US),
    a_id=st.integers(min_value=0, max_value=10**12 - 1),
    b_id=st.integers(min_value=0, max_value=10**12 - 1),
)
def test_event_key_string_order_is_tuple_order(a_us, b_us, a_id, b_id):
    """String comparison of the padded key must equal (ts, event_id)
    tuple order for EVERY pair of proleptic instants — the property a
    negative epoch breaks without the offset (the pre-r15 key)."""
    ka = _event_key_py(a_us, a_id, _PRO_MIN_US)
    kb = _event_key_py(b_us, b_id, _PRO_MIN_US)
    assert (ka < kb) == ((a_us, a_id) < (b_us, b_id))
    assert (ka == kb) == ((a_us, a_id) == (b_us, b_id))


def test_event_key_without_offset_is_a_live_mutant():
    """The pre-fix key (offset 0) mis-orders pre-epoch instants two
    ways: sign-vs-zero pad ('-' < '0' puts ALL negatives first — which
    happens to be right — but digit order runs BACKWARDS between two
    negatives) — the recorded mutant witness."""
    t1969 = -86_400_000_000  # 1969-12-31
    t1968 = -31_622_400_000_000  # 1968-ish, more negative
    k_new = _event_key_py(t1968, 0, _PRO_MIN_US) < _event_key_py(t1969, 0, _PRO_MIN_US)
    assert k_new is True  # offset key: earlier instant sorts first
    k_old = _event_key_py(t1968, 0, 0) < _event_key_py(t1969, 0, 0)
    assert k_old is False  # mutant: order inverted for negatives
