"""Hypothesis split-invariance property for the MinHash-LSH near-dup
twin (streaming/dedup.py) — the one streaming store the r10-r11
campaigns had left at fixed-split coverage only.

Although the OPERATOR's contract is recall-class (LSH collisions), the
STORE's contract is exact: MinHash band buckets are pure per-document
functions (seed pinned), so the accumulated pair log — "pairs that
collided in ≥1 band AND verified at jaccard ≥ threshold" — is a
schedule-free set. The property quantifies over ANY assignment of
documents to waves plus out-of-order late replays (the wave holding
doc 1 is always replayed), comparing against the twin's own
single-wave run; cap settings are left at defaults (no bucket here
approaches them, so detection-time capping never perturbs the set).

MUTATION-VERIFIED: ``(x.is_new | y.is_new)`` → ``&`` in the bucket
pair expansion (only new×new pairs survive — duplicates whose members
arrive in different waves are missed; single-wave runs still pass).
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from cloudfront_kinesis_log_lambda_spark.streaming.dedup import (
    StreamingNearDup,
    near_dup_pair_log,
)

_SCHEMA = "doc_id long, text string"

#: doc text from a drawn (a, b) pattern: same (a, b) → identical text
#: (jaccard 1.0 pairs, detected); same a / different b → 3 of 9 grams
#: shared (jaccard 0.33 — a band collision, if any, is verified OUT
#: at threshold 0.5); different a and b → near-disjoint
_docs_st = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 2)), min_size=1, max_size=10
).map(
    lambda abs_: [
        (i + 1, f"w{a} alpha beta gamma w{b} delta epsilon zeta")
        for i, (a, b) in enumerate(abs_)
    ]
)
_assign_st = st.lists(st.integers(0, 3), min_size=10, max_size=10)
_retries_st = st.sets(st.integers(0, 3), max_size=2)


def _df(spark, rows):
    return (
        spark.createDataFrame(rows, _SCHEMA)
        if rows
        else spark.createDataFrame([], _SCHEMA)
    )


@settings(max_examples=fuzz_examples(5), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_docs_st, _assign_st, _retries_st)
def test_near_dup_pair_log_any_assignment_matches_single_wave(
    spark, rows, assign, retries
):
    waves = [[], [], [], []]
    for i, row in enumerate(rows):
        waves[assign[i]].append(row)

    def run(schedule):
        store = tempfile.mkdtemp(prefix="ndprop-s-")
        out = tempfile.mkdtemp(prefix="ndprop-o-")
        try:
            twin = StreamingNearDup(store, out)
            if schedule is None:
                twin(_df(spark, rows), 0)
            else:
                for bid, wave in enumerate(schedule):
                    twin(_df(spark, wave), bid)
                # the wave holding doc 1 is always late-replayed
                # (nonempty by construction) plus random replays —
                # every example exercises the batch=<id> overwrite and
                # exclude-current-batch contracts
                for bid in sorted(retries | {assign[0]}):
                    twin(_df(spark, schedule[bid]), bid)
            return sorted(
                (r["doc_a"], r["doc_b"], r["jaccard"])
                for r in near_dup_pair_log(spark, out).collect()
            )
        finally:
            shutil.rmtree(store, ignore_errors=True)
            shutil.rmtree(out, ignore_errors=True)

    want = run(None)
    got = run(waves)
    assert got == want, (assign,)
    # teeth: the log must contain every identical-text pair at
    # jaccard 1.0 (most draws produce at least one), so the equality
    # above can never pass vacuously on an empty log
    texts = {d: t for (d, t) in rows}
    expect_dup = {
        (i, j)
        for i in texts
        for j in texts
        if i < j and texts[i] == texts[j]
    }
    got_exact = {(a, b) for (a, b, jac) in got if jac == 1.0}
    assert expect_dup <= got_exact, (expect_dup, got_exact)
