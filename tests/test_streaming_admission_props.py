"""Hypothesis split-invariance properties for the three ADMISSION-class
twins the r10 campaign left uncovered (VERDICT r10 item 4): per-source
quota, token-budget mixture, and gram novelty.

All three share the ordered-cut contract (doc_id-ordered arrival) and
the batch=<id> overwrite / exclude-current-batch retry contract, so the
property template is the same: split the doc_id-ordered corpus at
random cut points, drive the twin wave by wave with random retries
(the final wave is ALWAYS retried so every example exercises the
exclude-current-batch read), and assert the accumulated log equals the
batch operator on the full corpus. Each property was MUTATION-VERIFIED
before claiming (the mutant was applied to the source and the test
failed):

- quota: (a) dropping the prior-counts probe (``coalesce(prior, 0) +
  rn`` → ``rn``) — sources never fill across waves; (b) reading the
  counts store WITHOUT excluding the current batch (exclude
  ``batch_id`` → ``-1``) — the forced final-wave retry double-counts
  its own first attempt's deltas.
- mixture: dropping the prior token total (``coalesce(prior, 0) +
  batch_cum`` → ``batch_cum``) — budgets reset at every wave boundary.
- novelty: dropping the seen-index anti-join (``novel_shingles =
  batch_first``) — grams first seen in an EARLIER wave count novel
  again, so only multi-wave schedules expose it.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from conftest import ordered_waves as _ordered_waves
from conftest import fuzz_examples

from cloudfront_kinesis_log_lambda_spark.operators.corpus import (
    gram_novelty,
    mixture_sample,
    source_quota,
)
from cloudfront_kinesis_log_lambda_spark.streaming.novelty import (
    StreamingNovelty,
    novelty_log,
)
from cloudfront_kinesis_log_lambda_spark.streaming.quota import (
    StreamingMixture,
    StreamingSourceQuota,
    admission_log,
    mixture_log,
)

_STREAM_SCHEMA = "doc_id long, text string, source string"
_BATCH_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _stream_df(spark, rows):
    data = [(d, t, s) for (d, t, s) in rows]
    return (
        spark.createDataFrame(data, _STREAM_SCHEMA)
        if data
        else spark.createDataFrame([], _STREAM_SCHEMA)
    )


def _batch_df(spark, rows):
    return spark.createDataFrame(
        [(d, t, "en", s, len(t)) for (d, t, s) in rows], _BATCH_SCHEMA
    )




def _drive(twin, spark, waves, retries):
    for bid, wave in enumerate(waves):
        twin(_stream_df(spark, wave), bid)
        # final wave always retried: every example exercises the
        # exclude-current-batch read (random-only retries can leave the
        # exactly-once seam untested in a 5-example run)
        if retries[bid % len(retries)] or bid == len(waves) - 1:
            twin(_stream_df(spark, wave), bid)


_cuts_st = st.sets(st.integers(1, 11), max_size=3)
_retries_st = st.lists(st.booleans(), min_size=4, max_size=4)

#: quota corpus: doc_id-ascending rows over ≤3 sources; text content is
#: irrelevant to admission (cap counts documents)
_quota_rows_st = st.lists(st.integers(0, 2), min_size=1, max_size=12).map(
    lambda ks: [(i + 1, "doc", f"src{k}") for i, k in enumerate(ks)]
)


@settings(max_examples=fuzz_examples(5), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_quota_rows_st, _cuts_st, _retries_st)
def test_quota_any_ordered_split_matches_batch(spark, rows, cuts, retries):
    """First-come admission across ANY doc_id-ordered wave partition
    (sources filling mid-wave, across waves, or never) must equal
    source_quota(priority='arrival') on the closed corpus — decision
    for decision, with exactly one log row per document."""
    waves = _ordered_waves(rows, cuts)
    want = {
        r["doc_id"]: r["kept"]
        for r in source_quota(
            _batch_df(spark, rows), cap=2, priority="arrival"
        ).collect()
    }
    store = tempfile.mkdtemp(prefix="quotaprop-s-")
    out = tempfile.mkdtemp(prefix="quotaprop-o-")
    try:
        twin = StreamingSourceQuota(store, out, cap=2)
        _drive(twin, spark, waves, retries)
        log = admission_log(spark, out).collect()
        got = {r["doc_id"]: r["admitted"] for r in log}
        assert len(log) == len(rows), (cuts,)  # one decision per doc
        assert got == want, (cuts,)
    finally:
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


#: mixture corpus: per-doc token counts 100+50·(i%4) against per-source
#: budgets 400+50·(k%4) — every source fills after 2-4 documents, so
#: cuts routinely land mid-fill
_mix_rows_st = st.lists(st.integers(0, 2), min_size=1, max_size=10).map(
    lambda ks: [
        (i + 1, ("tok " * (100 + (i % 4) * 50)).strip(), f"src{k}")
        for i, k in enumerate(ks)
    ]
)


@settings(max_examples=fuzz_examples(5), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_mix_rows_st, _cuts_st, _retries_st)
def test_mixture_any_ordered_split_matches_batch(spark, rows, cuts, retries):
    """Token-budget fill across ANY doc_id-ordered wave partition must
    equal mixture_sample on the closed corpus — admitted rows
    tuple-for-tuple (including the exact cum_tokens accounting), with
    every document receiving a decision row."""
    waves = _ordered_waves(rows, cuts)
    want = sorted(
        (r["doc_id"], r["source"], r["n_tokens"], r["cum_tokens"], r["budget"])
        for r in mixture_sample(_batch_df(spark, rows)).collect()
    )
    store = tempfile.mkdtemp(prefix="mixprop-s-")
    out = tempfile.mkdtemp(prefix="mixprop-o-")
    try:
        twin = StreamingMixture(store, out)
        _drive(twin, spark, waves, retries)
        log = mixture_log(spark, out).collect()
        got = sorted(
            (r["doc_id"], r["source"], r["n_tokens"], r["cum_tokens"],
             r["budget"])
            for r in log
            if r["admitted"] == 1
        )
        assert len(log) == len(rows), (cuts,)
        assert got == want, (cuts,)
    finally:
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


#: novelty corpus: 4-token docs over a 4-word vocabulary pattern —
#: 3-gram collisions across documents (and hence across waves) are the
#: norm, not the exception
_nov_rows_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 3)), min_size=1, max_size=10
).map(
    lambda abs_: [
        (i + 1, f"w{a} w{b} w{a} w{b}", "src0")
        for i, (a, b) in enumerate(abs_)
    ]
)


@settings(max_examples=fuzz_examples(5), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_nov_rows_st, _cuts_st, _retries_st)
def test_novelty_any_ordered_split_matches_batch(spark, rows, cuts, retries):
    """Per-document gram novelty across ANY doc_id-ordered wave
    partition must be bit-identical to gram_novelty on the closed
    corpus — including grams whose first and repeat occurrences arrive
    waves apart, and repeats WITHIN a wave of a gram first seen in an
    earlier wave."""
    waves = _ordered_waves(rows, cuts)
    want = sorted(
        (r["doc_id"], r["n_grams"], r["n_novel"], r["novelty"])
        for r in gram_novelty(_batch_df(spark, rows), n=3).collect()
    )
    store = tempfile.mkdtemp(prefix="novprop-s-")
    out = tempfile.mkdtemp(prefix="novprop-o-")
    try:
        twin = StreamingNovelty(store, out, n=3)
        _drive(twin, spark, waves, retries)
        got = sorted(
            (r["doc_id"], r["n_grams"], r["n_novel"], r["novelty"])
            for r in novelty_log(spark, out).collect()
        )
        assert got == want, (cuts,)
    finally:
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
