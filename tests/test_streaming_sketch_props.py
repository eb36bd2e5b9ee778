"""Hypothesis properties: split-invariance of the mergeable-sketch
twins (HLL, Count-Min, DDSketch).

Each twin claims a merge law — MAX over registers, SUM over counters /
histogram buckets — that makes the accumulated store independent of
HOW the rows were micro-batched. The deterministic parity tests pin
one fixed split; these properties quantify over random splits, retries,
and (for the MAX-merge HLL only) arbitrary new-id re-delivery of
already-seen rows, using the twin's own single-wave run as the
reference: any schedule must land on the identical merged store.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from cloudfront_kinesis_log_lambda_spark.streaming.countmin import (
    StreamingCountMin,
)
from cloudfront_kinesis_log_lambda_spark.streaming.ddsketch import (
    StreamingDDSketch,
)
from cloudfront_kinesis_log_lambda_spark.streaming.hll import StreamingHLL

HLL_SCHEMA = "event_type string, user_id long"
TXT_SCHEMA = "doc_id long, text string"
VAL_SCHEMA = "event_type string, value double"

_rows_st = st.lists(
    st.tuples(st.sampled_from(["view", "click"]), st.integers(0, 60)),
    min_size=1,
    max_size=25,
)
_waves_st = st.lists(st.integers(0, 2), min_size=25, max_size=25)
_retry_st = st.lists(st.booleans(), min_size=3, max_size=3)


def _split(rows, waves):
    out = [[], [], []]
    for i, r in enumerate(rows):
        out[waves[i]].append(r)
    return out


def _run(spark, mk_twin, mk_df, rows, waves, retries, redeliver=None):
    d = tempfile.mkdtemp(prefix="sketchprop-")
    try:
        twin = mk_twin(d)
        for bid, wave in enumerate(_split(rows, waves)):
            twin(mk_df(spark, wave), bid)
            if retries[bid]:
                twin(mk_df(spark, wave), bid)
        nxt = 3
        for sub in redeliver or []:
            twin(mk_df(spark, [rows[i % len(rows)] for i in sub]), nxt)
            nxt += 1
        return twin, d
    except BaseException:
        shutil.rmtree(d, ignore_errors=True)
        raise


def _hll_df(spark, rows):
    return (
        spark.createDataFrame(rows, HLL_SCHEMA)
        if rows
        else spark.createDataFrame([], HLL_SCHEMA)
    )


@settings(max_examples=fuzz_examples(4), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_rows_st, _waves_st, _retry_st,
       st.lists(st.sets(st.integers(0, 24), max_size=5), max_size=2))
def test_hll_store_is_split_and_redelivery_invariant(
    spark, rows, waves, retries, redeliver
):
    """MAX merge: retries AND arbitrary new-id re-delivery of old rows
    are harmless — the strongest sketch contract."""
    def mk(d):
        return StreamingHLL(d, ["event_type"], "user_id")

    ref_twin, ref_d = _run(
        spark, mk, _hll_df, rows, [0] * len(waves), [False] * 3
    )
    got_twin, got_d = _run(
        spark, mk, _hll_df, rows, waves, retries, redeliver
    )
    try:
        ref = sorted(map(tuple, ref_twin.registers(spark).collect()))
        got = sorted(map(tuple, got_twin.registers(spark).collect()))
        assert got == ref
    finally:
        shutil.rmtree(ref_d, ignore_errors=True)
        shutil.rmtree(got_d, ignore_errors=True)


def _txt_df(spark, rows):
    data = [(i, f"{et} token{uid}") for i, (et, uid) in enumerate(rows)]
    return (
        spark.createDataFrame(data, TXT_SCHEMA)
        if data
        else spark.createDataFrame([], TXT_SCHEMA)
    )


@settings(max_examples=fuzz_examples(4), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_rows_st, _waves_st, _retry_st)
def test_countmin_counters_are_split_invariant(spark, rows, waves, retries):
    """SUM merge: split + same-id retries preserve the counter matrix
    (new-id re-delivery must NOT — pinned in the deterministic tests)."""
    def mk(d):
        return StreamingCountMin(d)

    ref_twin, ref_d = _run(
        spark, mk, _txt_df, rows, [0] * len(waves), [False] * 3
    )
    got_twin, got_d = _run(spark, mk, _txt_df, rows, waves, retries)
    try:
        ref = sorted(map(tuple, ref_twin.counters(spark).collect()))
        got = sorted(map(tuple, got_twin.counters(spark).collect()))
        assert got == ref
    finally:
        shutil.rmtree(ref_d, ignore_errors=True)
        shutil.rmtree(got_d, ignore_errors=True)


def _val_df(spark, rows):
    data = [(et, float(uid) + 0.5) for et, uid in rows]
    return (
        spark.createDataFrame(data, VAL_SCHEMA)
        if data
        else spark.createDataFrame([], VAL_SCHEMA)
    )


@settings(max_examples=fuzz_examples(4), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_rows_st, _waves_st, _retry_st)
def test_ddsketch_histogram_is_split_invariant(spark, rows, waves, retries):
    def mk(d):
        return StreamingDDSketch(d, ["event_type"])

    ref_twin, ref_d = _run(
        spark, mk, _val_df, rows, [0] * len(waves), [False] * 3
    )
    got_twin, got_d = _run(spark, mk, _val_df, rows, waves, retries)
    try:
        ref = sorted(map(tuple, ref_twin.histogram(spark).collect()))
        got = sorted(map(tuple, got_twin.histogram(spark).collect()))
        assert got == ref
    finally:
        shutil.rmtree(ref_d, ignore_errors=True)
        shutil.rmtree(got_d, ignore_errors=True)
