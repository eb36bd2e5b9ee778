"""Hypothesis properties for the Kinesis sink's partial-failure retry
(sinks/kinesis.py put_records_with_retry, sequential AND concurrent).

The deterministic tests in test_kinesis_sink.py pin specific shapes
(reference parity: chunking, backoff ladder, rekeying). These
properties drive RANDOM per-call positional failure plans through the
retry loop and assert the contracts no specific shape can pin:

- CONSERVATION: every input record is delivered exactly once OR
  counted dropped — no loss, and no duplicate delivery from a
  positional mismatch (the classic failure mode of index-aligned
  partial-failure APIs: retrying the wrong slot both loses one record
  and double-sends another, which this property catches either way);
- stats honesty: records == sum of all batch sizes put, dropped ==
  input - delivered, retried == total failed entries seen;
- every retried record carries a FRESH 32-hex partition key.

Pure-Python (fake client, injected sleep) — no Spark session.
"""

from __future__ import annotations

import re
import threading
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cloudfront_kinesis_log_lambda_spark.sinks.kinesis import (
    put_records_with_retry,
)

_HEX32 = re.compile(r"^[0-9a-f]{32}$")


class PlanFake:
    """Thread-safe scriptable put_records. ``plan[i]`` = indices that
    fail on the i-th call (positions past the batch length ignored);
    calls beyond the plan succeed fully — guarantees termination."""

    def __init__(self, plan):
        self.plan = list(plan)
        self.calls = []
        self.delivered = []  # Data of every success, in arrival order
        self.failed_seen = 0
        self._lock = threading.Lock()

    def put_records(self, StreamName, Records):
        with self._lock:
            idx = len(self.calls)
            self.calls.append([dict(r) for r in Records])
            fail = (
                {i for i in self.plan[idx] if i < len(Records)}
                if idx < len(self.plan)
                else set()
            )
            out = []
            for i, r in enumerate(Records):
                if i in fail:
                    out.append(
                        {"ErrorCode": "ProvisionedThroughputExceededException",
                         "ErrorMessage": "Rate exceeded"}
                    )
                else:
                    self.delivered.append(r["Data"])
                    out.append(
                        {"SequenceNumber": str(i), "ShardId": "shardId-0"}
                    )
            self.failed_seen += len(fail)
            return {"FailedRecordCount": len(fail), "Records": out}


def _recs(n):
    return [
        {"Data": f"d{i}", "PartitionKey": f"orig{i:028d}"} for i in range(n)
    ]


_plan_st = st.lists(
    st.frozensets(st.integers(0, 6), max_size=7), min_size=0, max_size=25
)


def _check(n, plan, batch_size, concurrency, max_attempts=11):
    fake = PlanFake(plan)
    stats = put_records_with_retry(
        _recs(n),
        fake,
        "prod-logs",
        max_attempts=max_attempts,
        sleep=lambda s: None,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    delivered = Counter(fake.delivered)
    # exactly-once delivery per record on the success path
    assert all(v == 1 for v in delivered.values()), delivered.most_common(3)
    # conservation: delivered + dropped partitions the input
    assert len(delivered) + stats.dropped_records == n
    missing = {f"d{i}" for i in range(n)} - set(delivered)
    assert len(missing) == stats.dropped_records
    # stats honesty
    assert stats.records == sum(len(c) for c in fake.calls)
    assert stats.retried_records == fake.failed_seen
    # every record in a retry call (call touching previously-failed
    # entries) carries a fresh uuid4-hex key, never an original
    first_send = {}
    for ci, call in enumerate(fake.calls):
        for r in call:
            if r["Data"] not in first_send:
                first_send[r["Data"]] = (ci, r["PartitionKey"])
            else:
                assert _HEX32.match(r["PartitionKey"]), r
                assert not r["PartitionKey"].startswith("orig")
    return stats


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(0, 40), _plan_st, st.integers(1, 7))
def test_sequential_retry_conserves_records(n, plan, batch_size):
    _check(n, plan, batch_size, concurrency=1)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(0, 40), _plan_st, st.integers(1, 7), st.integers(2, 4))
def test_concurrent_retry_conserves_records(n, plan, batch_size, conc):
    """Same conservation contract with the thread-pool path: whatever
    interleaving the pool produces, records never vanish or double."""
    _check(n, plan, batch_size, concurrency=conc)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(1, 25), st.integers(1, 5), st.integers(1, 4))
def test_total_outage_drops_everything_exactly(n, batch_size, max_attempts):
    """A permanently-failing stream must drop EVERY record after
    exactly max_attempts tries per chain, never hang, never deliver."""
    fake = PlanFake([set(range(7))] * 10_000)
    stats = put_records_with_retry(
        _recs(n), fake, "prod-logs",
        max_attempts=max_attempts, sleep=lambda s: None,
        batch_size=batch_size,
    )
    assert stats.dropped_records == n
    assert not fake.delivered
