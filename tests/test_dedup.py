"""Near-dup operators: planted-duplicate recall + cross-checks.

The testdata documents tables contain planted near-duplicates (3-gram
Jaccard ≥ 0.9 pairs). MinHash-LSH and SimHash are hash-dependent (no SQL
oracle) so their gate is recall against the exact shingle-join baseline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import relational as R
from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
    minhash_lsh_pairs,
    near_dup_pairs_exact,
    shingles,
    simhash,
    simhash_near_pairs,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return R.load(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def exact_pairs(docs):
    return {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in near_dup_pairs_exact(docs, n=3, threshold=0.5).collect()
    }


def test_exact_pairs_find_planted_dups(exact_pairs):
    assert len(exact_pairs) >= 10  # sf0.001 plants ~28
    assert max(exact_pairs.values()) > 0.9  # near-identical pairs exist


def test_minhash_lsh_matches_exact_at_high_similarity(docs, exact_pairs):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, n=3, threshold=0.5).collect()
    }
    # verification step computes EXACT jaccard → no false positives
    assert set(got) <= set(exact_pairs)
    for pair, j in got.items():
        assert j == pytest.approx(exact_pairs[pair])
    # b=16/r=4 banding: candidate prob ≥ 97% at s≥0.8 — demand full
    # recall of the clearly-planted pairs and ≥80% overall
    strong = {p for p, j in exact_pairs.items() if j >= 0.8}
    assert strong <= set(got)
    assert len(got) >= 0.8 * len(exact_pairs)


def test_simhash_is_deterministic_and_discriminative(docs, exact_pairs):
    sig1 = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    sig2 = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sig1 == sig2  # deterministic across runs
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in simhash_near_pairs(docs, max_hamming=8).collect()
    }
    # every simhash hit is a genuinely similar pair (precision)...
    assert pairs <= set(exact_pairs)
    # ...and it finds at least half of them (64-bit simhash recall at a
    # 0.5-jaccard operating point is inherently partial)
    assert len(pairs) >= 0.5 * len(exact_pairs)


def test_shingles_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, ""), (4, "x y z")], "doc_id long, text string"
    )
    got = shingles(df, n=3).groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in got}
    assert counts == {1: 2, 4: 1}  # short/empty docs produce no shingles


def test_winnow_fingerprints_survive_local_edits(spark):
    """Winnowing's contract: a local edit perturbs only the fingerprints
    whose k-gram windows touch it — edited copies keep high fp overlap,
    unrelated docs share ~none."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_near_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    edited = base.replace("lazy dog", "sleepy cat", 1)
    other = "completely different content about spark shuffle partitioning " * 5
    docs = spark.createDataFrame(
        # doc 3: 9 chars → 2 k-grams, fewer than one window (4) → global min
        # doc 4: 4 chars → shorter than k=8 → no grams at all
        [(0, base), (1, edited), (2, other), (3, "tiny-doc1"), (4, "tiny")],
        "doc_id long, text string",
    )
    fps = {
        i: {r["fp"] for r in rows}
        for i, rows in (
            (i, winnow_fingerprints(docs.filter(F.col("doc_id") == i)).collect())
            for i in range(5)
        )
    }
    j01 = len(fps[0] & fps[1]) / len(fps[0] | fps[1])
    j02 = len(fps[0] & fps[2]) / len(fps[0] | fps[2])
    assert j01 > 0.6  # edited copy stays similar
    assert j02 < 0.05  # unrelated doc does not
    assert len(fps[3]) == 1  # shorter than one window → single global min
    assert len(fps[4]) == 0  # shorter than k → no fingerprint, not garbage

    pairs = {(r["doc_a"], r["doc_b"]) for r in winnow_near_pairs(docs, threshold=0.5).collect()}
    assert pairs == {(0, 1)}


def test_winnow_pairs_agree_with_exact_on_corpus(docs, exact_pairs):
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import winnow_near_pairs

    got = {(r["doc_a"], r["doc_b"]) for r in winnow_near_pairs(docs, threshold=0.5).collect()}
    strong = {p for p, j in exact_pairs.items() if j >= 0.8}
    assert strong <= got  # near-identical planted pairs always found


def test_connected_components_transitive_chains(spark):
    """A~B, B~C (A≁C directly) and a separate pair: min-label propagation
    must collapse the chain into one cluster keyed by its min id."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        connected_components,
        near_dup_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    labels = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}

    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 7, 8]], "doc_id long")
    canon = {r["doc_id"]: r["canon_id"] for r in near_dup_clusters(docs, pairs).collect()}
    assert canon == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7, 8: 7}


def test_minhash_kernel_matches_pure_python_across_chunk_boundaries(spark):
    """Chunking must be invisible: a tiny chunk size (7 grams, so chunk
    boundaries repeatedly land mid-document and single-gram docs sit at
    boundaries) must produce bit-identical buckets to the default
    single-chunk path, across varied doc lengths. (Absolute signature
    correctness is pinned separately by the planted-duplicate recall
    tests and the oracle-checked near_dup_clusters coupling.)"""
    import random

    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        _P,
        gram_array,
        minhash_band_rows,
    )

    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(100)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.choice([3, 4, 9, 30]))))
        for i in range(40)
    ]
    rows.append((40, "too short"))  # < n tokens → empty grams → no signature
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    grams = docs.select("doc_id", gram_array("text", 3).alias("grams"))
    tiny = minhash_band_rows(grams, 64, 16, 42, kernel_chunk_grams=7)
    big = minhash_band_rows(grams, 64, 16, 42)
    t = {(r["doc_id"], r["band"], r["h"]) for r in tiny.collect()}
    b = {(r["doc_id"], r["band"], r["h"]) for r in big.collect()}
    assert t == b and len(t) == 40 * 16
    assert not any(d == 40 for d, _, _ in t)  # gram-less doc dropped, not corrupted


def test_simhash_and_winnow_kernels_chunk_invariant(spark):
    """The SimHash vote accumulation (+= of partial add.reduceat across
    gram chunks) and the winnow overlapped-piece slicing must be
    invisible: forcing tiny chunks/pieces (docs split repeatedly) must
    match the single-chunk defaults bit-for-bit."""
    import random

    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        simhash,
        winnow_fingerprints,
    )

    rng = random.Random(17)
    vocab = [f"t{i}" for i in range(60)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.choice([3, 9, 40]))))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sim_tiny = {(r["doc_id"], r["simhash"]) for r in simhash(docs, kernel_chunk_grams=7).collect()}
    sim_big = {(r["doc_id"], r["simhash"]) for r in simhash(docs).collect()}
    assert sim_tiny == sim_big and len(sim_big) == 30
    win_tiny = {(r["doc_id"], r["fp"]) for r in winnow_fingerprints(docs, kernel_piece=5).collect()}
    win_big = {(r["doc_id"], r["fp"]) for r in winnow_fingerprints(docs).collect()}
    assert win_tiny == win_big and len(win_big) > 0


def test_duplicate_doc_id_rows_never_emit_self_pairs(spark):
    """Dirty input with duplicate doc_id rows: the per-row signature
    kernels put the id in one bucket twice — the pair generators must
    not surface that as an (x, x) self-pair."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_near_pairs,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, text), (1, text), (2, text + " extra tail words here")],
        "doc_id long, text string",
    )
    mh = minhash_lsh_pairs(docs, threshold=0.5).collect()
    sh = simhash_near_pairs(docs, max_hamming=8).collect()
    assert all(r["doc_a"] != r["doc_b"] for r in mh)
    assert all(r["doc_a"] != r["doc_b"] for r in sh)
    assert {(r["doc_a"], r["doc_b"]) for r in mh} == {(1, 2)}


def test_connected_components_long_chain_bounded_iterations(spark):
    """Pointer jumping must collapse a 64-node chain in O(log n) rounds:
    with max_iter=10 (propagation alone would need 63) every node's
    label reaches the chain minimum — the 100×-scale guarantee for
    long-chain near-dup graphs (VERDICT r4 item 8)."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(63)],
        "doc_a long, doc_b long, jaccard double",
    )
    labels = connected_components(pairs, max_iter=10).collect()
    assert len(labels) == 64
    assert all(r["label"] == 0 for r in labels)


def test_connected_components_two_components_unchanged_semantics(spark):
    """Semantics regression gate for the jump step: disjoint components
    keep distinct minima; singleton handling (no edges) unaffected."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(5, 9, 1.0), (9, 7, 1.0), (20, 30, 1.0)],
        "doc_a long, doc_b long, jaccard double",
    )
    got = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert got == {5: 5, 9: 5, 7: 5, 20: 20, 30: 20}


def test_snm_window_adjacency_and_prefix_cap(spark):
    """Single-pass SNM: docs sharing a sort-key prefix land adjacent
    and pair; docs beyond the window or the prefix-distance cap don't."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = [
        (0, "alpha shared prefix document body one"),
        (1, "alpha shared prefix document body two"),
        (2, "mmmm totally different middle text"),
        (3, "zzzz far away in sort order " + "x" * 100),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in sorted_neighborhood_pairs(docs).collect()
    }
    assert (0, 1) in got          # adjacent, near-identical prefixes
    assert (0, 3) not in got and (1, 3) not in got  # prefix cap bites


def test_snm_multipass_catches_suffix_similar_pairs(spark):
    """Pass 2 (reversed-text key) finds a suffix-similar pair whose
    prefixes diverge — pass 1 provably cannot (they sort far apart)."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        sorted_neighborhood_pairs,
        sorted_neighborhood_pairs_multipass,
    )

    tail = " the exact same long shared tail of the document" * 2
    rows = [(0, "aaaa" + tail), (9, "zzzz" + tail)]
    # spacer docs push the pair > window apart in pass-1 sort order
    rows += [(i, f"bbb{i} unrelated filler body {i}") for i in range(1, 9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p1 = {
        (r["doc_a"], r["doc_b"])
        for r in sorted_neighborhood_pairs(docs).collect()
    }
    mp = {
        (r["doc_a"], r["doc_b"])
        for r in sorted_neighborhood_pairs_multipass(docs).collect()
    }
    assert (0, 9) not in p1   # prefix-sorted sweep can't see it
    assert (0, 9) in mp       # reversed-key sweep can
    assert p1 <= mp           # multipass is a strict recall superset
