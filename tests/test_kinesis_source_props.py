"""Hypothesis properties for the Boto3 shard-reader protocol
(sources/kinesis.py Boto3ShardClient over the boto3-shaped fake).

The deterministic tests pin specific page-chain shapes; these
properties drive RANDOM stream shapes — sequence gaps, server page
caps, empty mid-stream pages, closed shards, arbitrary step limits —
and assert the protocol laws the Kinesis source's exactly-once replay
depends on:

- STEPWISE RECONSTRUCTION: walking read_from in arbitrary limit-sized
  steps yields every record exactly once, in order, regardless of page
  cap / empty pages / closure;
- REPLAY LAW: for any step boundary pair, read_between(start, end)
  reproduces exactly the records that step produced (the checkpoint-
  recovery contract verbatim);
- position tokens are opaque last-consumed sequences: resuming from
  any returned token never skips or repeats.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cloudfront_kinesis_log_lambda_spark.sources.kinesis import (
    Boto3ShardClient,
)
from tests.test_kinesis_source import _FakeBotoKinesis

# random ascending sequence strings with digit-count rollovers (8 → 10
# crosses a lexicographic trap on purpose: gaps start near single
# digits and grow past them)
_gaps_st = st.lists(st.integers(1, 40), min_size=0, max_size=18)


def _mk(gaps, page_cap, empty_at, closed):
    seq, recs = 7, []
    for i, g in enumerate(gaps):
        seq += g
        recs.append((str(seq), f"pk{i}", f"d{i}"))
    fake = _FakeBotoKinesis(
        {"shard-0": recs},
        page_cap=page_cap,
        closed=("shard-0",) if closed else (),
        empty_pages_at={("shard-0", i) for i in empty_at if i <= len(recs)},
    )
    return Boto3ShardClient("s", client=fake), recs


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    _gaps_st,
    st.integers(1, 4),
    st.sets(st.integers(0, 18), max_size=3),
    st.booleans(),
    st.lists(st.integers(1, 6), min_size=1, max_size=10),
)
def test_stepwise_read_reconstructs_stream(gaps, cap, empty_at, closed, steps):
    c, recs = _mk(gaps, cap, empty_at, closed)
    got, pos, bounds = [], c.initial_position, []
    for limit in steps:
        batch, nxt = c.read_from("shard-0", pos, limit=limit)
        bounds.append((pos, nxt, [r["Data"] for _, r in batch]))
        got.extend(r["Data"] for _, r in batch)
        if not batch:
            assert nxt == pos  # no progress token drift on empty reads
        pos = nxt
    # drain whatever the random steps left
    while True:
        batch, pos2 = c.read_from("shard-0", pos)
        got.extend(r["Data"] for _, r in batch)
        bounds.append((pos, pos2, [r["Data"] for _, r in batch]))
        if not batch:
            break
        pos = pos2
    assert got == [d for _, _, d in recs]  # exactly once, in order
    if recs:
        assert pos == recs[-1][0]  # final token = last consumed seq

    # replay law on every observed step boundary (initial-position
    # starts excluded: read_between's contract is seq-bounded)
    for start, end, datas in bounds:
        if start is None:
            continue
        replay = c.read_between("shard-0", start, end)
        assert [r["Data"] for _, r in replay] == datas, (start, end)


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_gaps_st, st.integers(1, 4), st.data())
def test_read_between_is_exclusive_start_inclusive_end(gaps, cap, data):
    """read_between(a, b) == records with a < seq <= b under NUMERIC
    comparison, for arbitrary boundary pairs drawn from the stream's
    own sequence numbers."""
    c, recs = _mk(gaps, cap, set(), False)
    if not recs:
        return
    seqs = [int(s) for s, _, _ in recs]
    a = data.draw(st.sampled_from(seqs))
    b = data.draw(st.sampled_from([s for s in seqs if s >= a]))
    replay = c.read_between("shard-0", str(a), str(b))
    want = [d for s, _, d in recs if a < int(s) <= b]
    assert [r["Data"] for _, r in replay] == want, (a, b)
