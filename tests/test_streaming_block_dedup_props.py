"""Hypothesis property: the streaming block-dedup twin equals the
batch operator under ANY contiguous doc_id-ordered wave split.

The deterministic parity test uses one fixed 3/3/4 split; the twin's
contract ("equal to batch when documents arrive in ascending doc_id
order") actually quantifies over every contiguous partition — random
cut points move each planted repeat between same-batch and cross-batch
delivery, which is exactly the boundary variety where an index-read /
in-batch-dedup asymmetry would hide. Retries of the newest wave are
interleaved (exclude-current contract on the seen-block index)."""

from __future__ import annotations

import random
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from cloudfront_kinesis_log_lambda_spark.operators.corpus import block_dedup
from cloudfront_kinesis_log_lambda_spark.streaming.block_dedup import (
    StreamingBlockDedup,
    block_dedup_log,
)

B = 4


def _corpus():
    """Docs 1..10 from 4-token blocks with planted repeats: 4 copies 1
    verbatim, 6 repeats a block of 2, 9 repeats 3's 2-token partial
    tail — mirrors the deterministic fixture so every repeat class is
    present whatever the cuts."""
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(50)]

    def block():
        return " ".join(rng.choice(vocab) for _ in range(B))

    docs = {i: " ".join(block() for _ in range(3)) for i in range(1, 11)}
    docs[4] = docs[1]
    b2 = docs[2].split(" ")
    docs[6] = " ".join(b2[:B]) + " " + block() + " " + block()
    docs[3] = block() + " pt1 pt2"
    docs[9] = block() + " pt1 pt2"
    return docs


def _rows(df):
    return sorted(
        (r["doc_id"], r["n_blocks"], r["n_kept"], r["dedup_text"])
        for r in df.collect()
    )


@settings(max_examples=fuzz_examples(5), deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.sets(st.integers(1, 9), max_size=3),  # cut points in doc_id space
    st.lists(st.integers(0, 1), min_size=4, max_size=4),  # per-wave retries
)
def test_any_ordered_wave_split_matches_batch(spark, cuts, retries):
    docs = _corpus()
    ids = sorted(docs)
    bounds = sorted(cuts) + [len(ids)]
    waves, start = [], 0
    for c in bounds:
        waves.append(ids[start:c])
        start = c
    waves = [w for w in waves if w] or [ids]

    d = tempfile.mkdtemp(prefix="blockprop-")
    try:
        writer = StreamingBlockDedup(
            f"{d}/store", f"{d}/out", block_tokens=B
        )
        for bid, wave in enumerate(waves):
            df = spark.createDataFrame(
                [(i, docs[i]) for i in wave], "doc_id long, text string"
            )
            writer(df, bid)
            if retries[bid % len(retries)]:
                writer(df, bid)  # newest-batch retry, same id
        full = spark.createDataFrame(
            [(i, t, "en", "src0", len(t)) for i, t in sorted(docs.items())],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        got = _rows(block_dedup_log(spark, f"{d}/out"))
        want = _rows(block_dedup(full, block_tokens=B))
        assert got == want, (waves,)
    finally:
        shutil.rmtree(d, ignore_errors=True)
