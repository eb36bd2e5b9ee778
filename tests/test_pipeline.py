"""End-to-end curation pipeline: quality gate → exact dedup → near-dup
cluster dedup → PII scrub, composed as one flow with per-stage
accounting (pipelines/training_data.py)."""

from __future__ import annotations

import random

import pytest

from cloudfront_kinesis_log_lambda_spark.pipelines import (
    curate_documents,
    curation_report,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _good_text(rng, vocab):
    """~40 words with woven stopwords: quality ≈ 0.6+, well above 0.3."""
    words = []
    for _ in range(13):
        words += [rng.choice(vocab), "the", rng.choice(vocab)]
    return " ".join(words)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(21)
    docs = {}
    for i in range(1, 7):  # 6 good, mutually dissimilar docs
        vocab = [f"w{i}_{j}" for j in range(200)]
        docs[i] = _good_text(rng, vocab)
    docs[3] = docs[3] + " contact bob@example.com for details"
    docs[7] = docs[1]  # exact duplicate of doc 1
    toks = docs[2].split()
    toks[5], toks[15], toks[25] = "z1", "z2", "z3"
    docs[8] = " ".join(toks)  # near-dup of doc 2 (3 of ~40 words changed)
    docs[9] = "$$$ %%% ###"  # fails the quality gate
    rows = [(i, t, "en", "synth", len(t)) for i, t in sorted(docs.items())]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_curated_corpus_keeps_exactly_the_survivors(spark, corpus):
    kept = curate_documents(corpus).collect()
    by_id = {r["doc_id"]: r for r in kept}
    # 9 fails quality; 7 loses exact dedup to 1; 8 loses near dedup to 2
    assert set(by_id) == {1, 2, 3, 4, 5, 6}
    # PII scrubbed in the surviving text
    assert "<EMAIL>" in by_id[3]["text"]
    assert "bob@example.com" not in by_id[3]["text"]
    # annotations survive the flow
    assert all(r["quality"] >= 0.3 and r["n_tokens"] > 0 for r in kept)


def test_curation_report_funnel(spark, corpus):
    rep = {r["stage"]: r["n_docs"] for r in curation_report(corpus).collect()}
    assert rep == {
        "1_raw": 9,
        "2_quality_gate": 8,
        "3_exact_dedup": 7,
        "4_near_dedup_scrubbed": 6,
    }


def test_split_assign_is_deterministic_partition(spark, corpus):
    from cloudfront_kinesis_log_lambda_spark.pipelines import split_assign

    rows = {r["split"]: (r["n_docs"], r["sum_tokens"]) for r in split_assign(corpus).collect()}
    # a partition of the corpus: splits cover every doc exactly once
    assert sum(n for n, _ in rows.values()) == corpus.count()
    # deterministic: identical on rerun
    again = {r["split"]: (r["n_docs"], r["sum_tokens"]) for r in split_assign(corpus).collect()}
    assert rows == again
    # assignment depends only on doc_id: a corpus subset keeps each
    # doc's split (re-assign half the corpus, counts can only shrink)
    half = corpus.filter("doc_id <= 5")
    half_rows = {r["split"]: r["n_docs"] for r in split_assign(half).collect()}
    assert all(half_rows[s] <= rows[s][0] for s in half_rows)


def test_pack_sequences_accounting(spark, corpus):
    """Sequence packing invariants: every doc packed exactly once; no
    multi-doc sequence exceeds the budget; packing is greedy (a doc in
    sequence s+1 would NOT have fit at the end of sequence s)."""
    from cloudfront_kinesis_log_lambda_spark.pipelines import pack_sequences

    budget = 50
    out = pack_sequences(corpus, budget=budget, n_groups=2).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(
        r["doc_id"] for r in corpus.collect()
    )
    by_seq: dict[tuple, list] = {}
    for r in out:
        by_seq.setdefault((r["pack_group"], r["seq_id"]), []).append(r)
    for (g, s), members in by_seq.items():
        total = sum(r["n_tokens"] for r in members)
        if len(members) > 1:
            assert total <= budget, (g, s, total)
        if (g, s + 1) in by_seq:
            nxt = min(by_seq[(g, s + 1)], key=lambda r: r["doc_id"])
            assert total + nxt["n_tokens"] > budget, (g, s)


def test_pack_sequences_oversized_doc_gets_own_sequence(spark):
    """A single document over the budget occupies (and overflows) its
    own sequence; neighbors before/after pack normally around it."""
    from cloudfront_kinesis_log_lambda_spark.pipelines import pack_sequences

    rows = [
        (0, "a " * 10, "en", "s", 20),
        (2, "b " * 99, "en", "s", 200),  # over budget=30 on its own
        (4, "c " * 10, "en", "s", 20),
        (6, "d " * 10, "en", "s", 20),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget=30, n_groups=1).collect()
    }
    assert out[2]["n_tokens"] == 99
    seqs = [out[i]["seq_id"] for i in (0, 2, 4, 6)]
    # doc 2 alone in its sequence; 4 and 6 share the next one
    assert seqs[0] != seqs[1] and seqs[1] != seqs[2] and seqs[2] == seqs[3]


def test_pack_sequences_group_cols_one_pass_equals_filter_union(spark, corpus):
    """The composite-key single-pass path (group_cols=["split"]) must
    produce exactly the assignment that packing each split subset
    separately produces — the equivalence the shard roundtrip's oracle
    and scale story both rest on."""
    from pyspark.sql import functions as F

    from cloudfront_kinesis_log_lambda_spark.pipelines import (
        pack_sequences,
        split_column,
    )

    docs = corpus.withColumn("split", split_column())
    one_pass = {
        (r["split"], r["doc_id"]): (r["pack_group"], r["seq_id"])
        for r in pack_sequences(docs, budget=60, group_cols=["split"]).collect()
    }
    union = {}
    for s in ("train", "val", "test"):
        for r in pack_sequences(
            docs.filter(F.col("split") == s).drop("split"), budget=60
        ).collect():
            union[(s, r["doc_id"])] = (r["pack_group"], r["seq_id"])
    assert one_pass == union
