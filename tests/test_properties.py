"""Property-based invariants (hypothesis) for the CloudFront transform
core — SURVEY.md §5.4: random rows through parse→transform→serialize
with reference-fidelity invariants checked on every record.

Strategy note: one Spark job per example would take minutes, so each
property collects a BATCH of hypothesis-generated values and runs them
through the engine in a single DataFrame — same coverage, few jobs.
"""

from __future__ import annotations

import gzip
import json
import os
import random
from urllib.parse import quote, unquote

from hypothesis import HealthCheck, given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from cloudfront_kinesis_log_lambda_spark.operators.transforms import url_unquote
from cloudfront_kinesis_log_lambda_spark.schema import FIELDNAMES
from cloudfront_kinesis_log_lambda_spark.testing.fixtures import (
    HEADER_LINES,
    make_log_row,
)

_ua_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=40,
)


@settings(max_examples=fuzz_examples(25), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_ua_text, min_size=1, max_size=30))
def test_url_unquote_exact_matches_python_unquote(spark, uas):
    """The exact (Arrow UDF) path IS urllib.parse.unquote, for arbitrary
    strings including raw unicode and malformed escapes."""
    encoded = [quote(u, safe="") for u in uas] + uas  # encoded and raw forms
    df = spark.createDataFrame([(s,) for s in encoded], "ua string")
    got = [
        r["out"]
        for r in df.select(url_unquote("ua", fidelity="exact").alias("out")).collect()
    ]
    assert got == [unquote(s) for s in encoded]


_tsv_safe = st.text(
    alphabet="abcdefghijklmnop%20/.-_&=+", min_size=1, max_size=18
)


@settings(max_examples=fuzz_examples(12), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["GET", "HEAD", "POST", "PUT"]),
            st.integers(min_value=0, max_value=2**40),
            _tsv_safe,  # http_path
            _tsv_safe,  # http_user_agent (percent-encoded-ish)
        ),
        min_size=1,
        max_size=20,
    )
)
def test_wire_record_field_invariants(spark, tmp_path_factory, rows):
    """Arbitrary field values through the REAL file path (gz TSV → scan →
    transform → wire JSON): dropped fields never leak, enrichment fields
    always present, every value stays a string (SURVEY.md §1.2), the
    partition key keeps uuid4-hex shape."""
    from cloudfront_kinesis_log_lambda_spark.operators.transforms import (
        cloudfront_wire_pipeline,
    )
    from cloudfront_kinesis_log_lambda_spark.sources.cloudfront import (
        read_cloudfront_logs,
    )

    base_dir = str(tmp_path_factory.mktemp("prop"))
    path = os.path.join(base_dir, "cloudfront", "prop-env", "svc-prop", "f0.gz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = random.Random(7)
    data = []
    for m, b, p, ua in rows:
        row = make_log_row(rng)
        row.update(
            http_method=m, bytes_sent=str(b), http_path=p, http_user_agent=ua
        )
        data.append(row)
    with gzip.open(path, "wt", newline="") as f:
        for line in HEADER_LINES:
            f.write(line + "\n")
        for row in data:
            f.write("\t".join(row[name] for name in FIELDNAMES) + "\n")

    # exact UA fidelity: the property asserts bit-exact unquote parity,
    # which is the Arrow-UDF path's contract (the default fast JVM path
    # intentionally passes invalid %-escapes through unchanged — that
    # divergence is pinned by test_url_unquote_invalid_escape_fast_passthrough)
    wire = cloudfront_wire_pipeline(
        read_cloudfront_logs(spark, base_dir), ua_fidelity="exact"
    ).collect()
    assert len(wire) == len(data)
    for r in wire:
        rec = json.loads(r["Data"])
        # dropped by the reference (actual behavior, trap §1.4.1) — and
        # ONLY those three fields vanish
        assert "http_referer" not in rec
        assert "log_date" not in rec and "log_time" not in rec
        # enrichment always present and key-derived
        assert rec["type"] == "globaledge_cloudfront"
        assert rec["env"] == "prop-env" and rec["serviceId"] == "svc-prop"
        assert "@timestamp" in rec
        # wire fidelity: every value is a JSON string
        assert all(isinstance(v, str) for v in rec.values())
        assert len(r["PartitionKey"]) == 32 and int(r["PartitionKey"], 16) >= 0
    # user agents decoded per reference (unquote, '+' NOT decoded)
    got_uas = sorted(json.loads(r["Data"])["http_user_agent"] for r in wire)
    want_uas = sorted(unquote(row["http_user_agent"]) for row in data)
    assert got_uas == want_uas


_doc_text = st.text(
    alphabet="abc defgh@.+-0123456789() ", min_size=0, max_size=60
)


@settings(max_examples=fuzz_examples(15), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_doc_text, min_size=1, max_size=25))
def test_pii_scrub_idempotent_and_total(spark, texts):
    """Scrubbing is idempotent (a second pass finds nothing) and total
    (row count preserved, output never null)."""
    from cloudfront_kinesis_log_lambda_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = pii_scrub(df)
    rows = once.collect()
    assert len(rows) == len(texts)
    assert all(r["scrubbed"] is not None for r in rows)
    twice = pii_scrub(
        once.select("doc_id", once["scrubbed"].alias("text"))
    ).collect()
    assert all(r["n_emails"] == 0 and r["n_phones"] == 0 for r in twice)
    assert {r["doc_id"]: r["scrubbed"] for r in twice} == {
        r["doc_id"]: r["scrubbed"] for r in rows
    }


@settings(max_examples=fuzz_examples(10), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(  # left events: (key, ts-seconds)
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=15,
    ),
    st.lists(  # right events: (key, ts-seconds, value)
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 10_000),
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=0,
        max_size=15,
    ),
)
def test_asof_backward_matches_bruteforce_oracle(spark, lefts, rights):
    """asof_join_backward against a brute-force Python oracle on random
    keyed event sets: the matched value is the right row with the
    greatest ts <= left ts for the same key (ties on ts collapse to one
    row by construction: dedupe right on (key, ts) keeping max value)."""
    import datetime as dt

    from cloudfront_kinesis_log_lambda_spark.operators.asof import asof_join_backward

    epoch = dt.datetime(2024, 1, 1)
    # dedupe right side on (key, ts) so the expected match is unique
    rmap = {}
    for k, ts, v in rights:
        rmap[(k, ts)] = max(v, rmap.get((k, ts), float("-inf")))
    rights_u = [(k, ts, v) for (k, ts), v in rmap.items()]

    left = spark.createDataFrame(
        [(i, k, epoch + dt.timedelta(seconds=ts)) for i, (k, ts) in enumerate(lefts)],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, epoch + dt.timedelta(seconds=ts), v) for k, ts, v in rights_u],
        "k long, ts timestamp, px double",
    ) if rights_u else spark.createDataFrame([], "k long, ts timestamp, px double")

    got = {
        r["lid"]: r["px_asof"]
        for r in asof_join_backward(left, right, on="k", right_cols=["px"]).collect()
    }
    for i, (k, ts) in enumerate(lefts):
        cands = [(rts, v) for rk, rts, v in rights_u if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, ts, cands)


@settings(max_examples=fuzz_examples(10), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
    st.integers(min_value=8, max_value=64),
)
def test_pack_sequences_invariants_random_corpora(spark, token_counts, budget):
    """Sequence-packing invariants over arbitrary corpora and budgets:
    conservation (every doc packed exactly once, token totals preserved),
    budget (multi-doc sequences never exceed it), greedy tightness (the
    first doc of sequence s+1 would not have fit in sequence s), and
    sequence-id contiguity from 0 per group."""
    from cloudfront_kinesis_log_lambda_spark.pipelines import pack_sequences

    rows = [
        (i, " ".join(f"t{j}" for j in range(n)) if n else "", "en", "s", 0)
        for i, n in enumerate(token_counts)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = pack_sequences(docs, budget=budget, n_groups=3).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(len(token_counts)))
    # NOTE: blank docs count 0 tokens (the house blank-doc guard, r6 —
    # the guarded split matches the DuckDB oracle's list_filter form);
    # conservation is checked on the engine's own n_tokens
    groups: dict[int, list] = {}
    for r in out:
        groups.setdefault(r["pack_group"], []).append(r)
    for g, members in groups.items():
        members.sort(key=lambda r: r["doc_id"])
        seqs: dict[int, int] = {}
        for r in members:
            seqs[r["seq_id"]] = seqs.get(r["seq_id"], 0) + r["n_tokens"]
        assert sorted(seqs) == list(range(len(seqs)))  # contiguous from 0
        by_seq: dict[int, list] = {}
        for r in members:
            by_seq.setdefault(r["seq_id"], []).append(r)
        for s, ms in by_seq.items():
            if len(ms) > 1:
                assert sum(r["n_tokens"] for r in ms) <= budget
            if s + 1 in by_seq:
                first_next = min(by_seq[s + 1], key=lambda r: r["doc_id"])
                assert seqs[s] + first_next["n_tokens"] > budget


# --- connected components vs union-find --------------------------------------


@settings(max_examples=fuzz_examples(8), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_match_union_find(spark, edges):
    """Pointer-jumping CC vs a textbook union-find on random graphs:
    identical node set, every node labeled with its component's MINIMUM
    id — the invariant all three consuming registry entries
    (near_dup_clusters, doc_block_dedup reassembly, entity resolution)
    lean on. Random multigraphs include self-loops, duplicate edges,
    and both orientations of the same pair; the brute-force never sees
    the operator's code."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r["node"]: r["label"] for r in connected_components(pairs).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    want = {n: min(members) for members in comps.values() for n in members}
    assert got == want


# --- deterministic shuffle / split invariants --------------------------------


@settings(max_examples=fuzz_examples(8), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=80, unique=True),
    st.integers(1, 8),
)
def test_global_shuffle_is_a_permutation(spark, doc_ids, n_shards):
    """The training-order shuffle must be a PERMUTATION: every doc
    appears exactly once, shard = sort_key mod n_shards (normalized
    positive even for negative ids), per-shard positions are exactly
    1..len(shard) in (sort_key, doc_id) order, and the whole mapping is
    rerun-deterministic."""
    from cloudfront_kinesis_log_lambda_spark.operators.corpus import (
        global_shuffle,
    )

    docs = spark.createDataFrame([(i,) for i in doc_ids], "doc_id long")
    out = global_shuffle(docs, n_shards=n_shards).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(doc_ids)
    shards: dict[int, list] = {}
    for r in out:
        k = (r["doc_id"] * 2654435761 + 42) % 4294967296
        assert r["sort_key"] == k, r
        assert r["shard"] == k % n_shards, r
        assert 0 <= r["shard"] < n_shards, r
        shards.setdefault(r["shard"], []).append(r)
    for members in shards.values():
        members.sort(key=lambda r: (r["sort_key"], r["doc_id"]))
        assert [r["pos"] for r in members] == list(
            range(1, len(members) + 1)
        )
    rerun = global_shuffle(docs, n_shards=n_shards).collect()
    assert sorted(map(tuple, rerun)) == sorted(map(tuple, out))


# --- exact dedup: normalization + idempotence ---------------------------------


@settings(max_examples=fuzz_examples(8), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.text(alphabet="ab X\t\n\x0b\f\r", min_size=0, max_size=12),
        min_size=1,
        max_size=40,
    )
)
def test_exact_dedup_idempotent_and_normalization_faithful(spark, texts):
    """exact_dedup must agree with a Python replay of its documented
    normalization (trim → lower → collapse whitespace) on group sizes
    and min-id representatives, and re-running it over just the kept
    representatives must be a fixpoint (every n_copies == 1, same
    representative set)."""
    from cloudfront_kinesis_log_lambda_spark.operators.text import (
        exact_dedup,
    )

    import re as _re

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["representative"]: r["n_copies"]
        for r in exact_dedup(docs).collect()
    }
    # Replay the ENGINE's exact semantics (text.py fingerprint): lower,
    # collapse Java-regex \s = [ \t\n\x0b\f\r] runs to one space, then
    # trim SPACES only. Python's str.strip()/re \s are wider (NBSP,
    # \x85) — using them here would fail against correct operator
    # output if the alphabet ever grows past ASCII. (str.lower() parity
    # with Spark lower() holds for ASCII; keep the alphabet ASCII or
    # replay case folding too.)
    def _norm(t: str) -> str:
        return _re.sub(r"[ \t\n\x0b\f\r]+", " ", t.lower()).strip(" ")

    groups: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        groups.setdefault(_norm(t), []).append(i)
    want = {min(ids): len(ids) for ids in groups.values()}
    assert got == want
    kept = docs.filter(
        docs.doc_id.isin([int(r) for r in got])
    )
    again = exact_dedup(kept).collect()
    assert sorted(r["representative"] for r in again) == sorted(got)
    assert all(r["n_copies"] == 1 for r in again)
