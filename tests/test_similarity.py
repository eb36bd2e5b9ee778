"""Similarity search: brute-force correctness + ANN recall."""

from __future__ import annotations

import math

import pytest

from cloudfront_kinesis_log_lambda_spark.operators import relational as R
from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_self_join_above,
    cosine_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return R.load(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def emb_py(emb):
    return {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_cosine_topk_matches_numpy_free_python(emb, emb_py):
    got = cosine_topk(emb, query_vec_id=0, k=10).collect()
    q = emb_py[0]
    expected = sorted(
        ((vid, _cos(v, q)) for vid, v in emb_py.items() if vid != 0),
        key=lambda t: (-round(t[1], 4), t[0]),
    )[:10]
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        (vid, pytest.approx(round(c, 4))) for vid, c in expected
    ]


def test_matryoshka_topk_matches_two_stage_bruteforce(emb, emb_py):
    """The two-stage path is exact deterministic arithmetic: Python
    replay of shortlist-by-prefix (ROUND-4, vec_id tiebreak) then
    re-rank-by-full must reproduce it row for row, in order."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        matryoshka_topk,
    )

    got = matryoshka_topk(emb, query_vec_id=0, k=10, prefix_dim=16).collect()
    q = emb_py[0]
    stage1 = sorted(
        (
            (vid, round(_cos(v[:16], q[:16]), 4), v)
            for vid, v in emb_py.items()
            if vid != 0
        ),
        key=lambda t: (-t[1], t[0]),
    )[:40]
    stage2 = sorted(
        ((vid, cp, round(_cos(v, q), 4)) for vid, cp, v in stage1),
        key=lambda t: (-t[2], t[0]),
    )[:10]
    assert [(r["vec_id"], r["cos_pref"], r["cos_full"]) for r in got] == [
        (vid, pytest.approx(cp), pytest.approx(cf)) for vid, cp, cf in stage2
    ]


def test_matryoshka_shortlist_is_subset_of_prefix_ranking(emb, emb_py):
    """Every returned row must come from the prefix shortlist — the
    re-rank can reorder but never resurrect a vector the coarse tier
    pruned."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        matryoshka_topk,
    )

    got = {r["vec_id"] for r in
           matryoshka_topk(emb, query_vec_id=0, k=10, prefix_dim=16).collect()}
    q = emb_py[0]
    shortlist = {
        vid
        for vid, _ in sorted(
            ((vid, round(_cos(v[:16], q[:16]), 4)) for vid, v in emb_py.items()
             if vid != 0),
            key=lambda t: (-t[1], t[0]),
        )[:40]
    }
    assert got <= shortlist


def test_cosine_topk_multi_matches_per_query_topk(emb, emb_py):
    """The batched path must return, per query id, exactly what the
    single-query operator returns (same rounding, same tie-break)."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        cosine_topk_multi,
    )

    got = cosine_topk_multi(emb, query_vec_ids=[0, 1, 2], k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["q_id"], r["rn"])):
        by_q.setdefault(r["q_id"], []).append((r["vec_id"], r["cos"]))
    assert set(by_q) == {0, 1, 2}
    for qid, rows in by_q.items():
        single = [
            (r["vec_id"], r["cos"])
            for r in cosine_topk(emb, query_vec_id=qid, k=5).collect()
        ]
        assert rows == single


def test_ann_lsh_recall_on_planted_neighbors(spark):
    """Hyperplane LSH's contract is high recall for *angularly close*
    neighbors. Plant a cluster around a query vector (cos ≈ 0.95+) in
    noise and demand it's found."""
    import random

    rng = random.Random(7)
    dim = 64
    base = [rng.gauss(0, 1) for _ in range(dim)]
    rows = [(0, [float(x) for x in base], 0)]
    for i in range(1, 21):  # 20 planted neighbors: base + small noise
        rows.append((i, [float(x + rng.gauss(0, 0.15)) for x in base], 0))
    for i in range(21, 400):  # background noise vectors
        rows.append((i, [float(rng.gauss(0, 1)) for _ in range(dim)], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    exact = [r["vec_id"] for r in cosine_topk(emb, 0, 10).collect()]
    approx = [r["vec_id"] for r in ann_lsh_topk(emb, 0, 10).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9
    cos_vals = [r["cos"] for r in ann_lsh_topk(emb, 0, 10).collect()]
    assert cos_vals == sorted(cos_vals, reverse=True)


def test_ann_lsh_on_near_orthogonal_corpus_degrades_gracefully(emb):
    """On the driver corpus the true top-10 are nearly orthogonal to the
    query (cos ≈ 0.28) — outside LSH's useful regime. Verify it still
    returns a valid, exact-cosine-ordered candidate list with nonzero
    overlap rather than garbage."""
    exact = [r["vec_id"] for r in cosine_topk(emb, 0, 10).collect()]
    approx = ann_lsh_topk(emb, 0, 10).collect()
    assert len(approx) == 10
    assert len(set(exact) & {r["vec_id"] for r in approx}) >= 2
    cos_vals = [r["cos"] for r in approx]
    assert cos_vals == sorted(cos_vals, reverse=True)


def test_cosine_self_join_pairs_verified(emb, emb_py):
    got = cosine_self_join_above(emb, threshold=0.3).collect()
    for r in got:
        true_cos = _cos(emb_py[r["id_a"]], emb_py[r["id_b"]])
        assert r["cos"] == pytest.approx(round(true_cos, 4))
        assert r["cos"] >= 0.3
        assert r["id_a"] < r["id_b"]


def test_ivf_recall_on_planted_neighbors(spark):
    """IVF with nprobe=4/16 cells must recover a planted angular cluster
    (the cluster lands in one cell, which is always probed)."""
    import random

    from cloudfront_kinesis_log_lambda_spark.operators.similarity import ivf_topk

    rng = random.Random(11)
    dim = 64
    base = [rng.gauss(0, 1) for _ in range(dim)]
    rows = [(0, [float(x) for x in base], 0)]
    for i in range(1, 21):
        rows.append((i, [float(x + rng.gauss(0, 0.15)) for x in base], 0))
    for i in range(21, 400):
        rows.append((i, [float(rng.gauss(0, 1)) for _ in range(dim)], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    exact = [r["vec_id"] for r in cosine_topk(emb, 0, 10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(emb, 0, 10).collect()]
    assert len(set(exact) & set(approx)) / 10 >= 0.9


def test_ivf_on_corpus_returns_ordered_topk(emb):
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import ivf_topk

    got = ivf_topk(emb, 0, 10).collect()
    assert len(got) == 10
    cos_vals = [r["cos"] for r in got]
    assert cos_vals == sorted(cos_vals, reverse=True)


def test_ivf_pq_recall_on_planted_neighbors(spark):
    """IVF-PQ (coarse cells + product-quantization ADC scoring) must
    recover a planted angular cluster: the cluster lands in one probed
    cell, and m=8 × 16-codeword PQ resolution easily separates cos≈0.95
    planted neighbors from cos≈0 noise."""
    import random

    from cloudfront_kinesis_log_lambda_spark.operators.similarity import ivf_pq_topk

    rng = random.Random(13)
    dim = 64
    base = [rng.gauss(0, 1) for _ in range(dim)]
    rows = [(0, [float(x) for x in base], 0)]
    for i in range(1, 21):
        rows.append((i, [float(x + rng.gauss(0, 0.15)) for x in base], 0))
    for i in range(21, 400):
        rows.append((i, [float(rng.gauss(0, 1)) for _ in range(dim)], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    approx = [r["vec_id"] for r in ivf_pq_topk(emb, 0, 10).collect()]
    # PQ's contract is coarser than exact-scoring IVF's: ADC error (~a
    # quantization step) dwarfs the ~0.001 cosine spread BETWEEN planted
    # members, so exact top-10 identity is scrambled by design — but
    # every returned neighbor must come from the planted cluster
    # (cos≈0.99 vs cos≈0 noise), which is the separation PQ exists for.
    assert set(approx) <= set(range(1, 21))
    assert len(approx) == 10


def test_ivf_pq_on_corpus_returns_ordered_topk_and_bounded_scores(emb):
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import ivf_pq_topk

    got = ivf_pq_topk(emb, 0, 10).collect()
    assert len(got) == 10
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    # ADC approximates a cosine — quantization error can push it
    # slightly outside [-1, 1] but not far
    assert all(-1.5 <= s <= 1.5 for s in scores)


def test_exact_pairs_is_recall_reference_for_lsh_pairs(spark, emb):
    """cosine_pairs_exact (brute force, the oracle twin) vs the
    LSH-bucketed all-pairs path.

    Two contracts: (1) on any corpus, LSH output ⊆ exact output —
    candidates are exactly verified, so precision is perfect; (2) in the
    near-duplicate regime LSH exists for (a planted cluster, pair cos
    ≥ ~0.9), recall is ≥ 0.9. Low-similarity pairs (cos 0.3-0.5, all
    that exists in the sf corpus) are NOT expected to be recovered —
    hyperplane collision probability is ~0.12 there by design."""
    import random

    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        cosine_pairs_exact,
        cosine_self_join_above,
    )

    exact = {(r["id_a"], r["id_b"]) for r in cosine_pairs_exact(emb, 0.3).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in cosine_self_join_above(emb, 0.3).collect()}
    assert lsh <= exact  # exact verification ⇒ perfect precision

    rng = random.Random(7)
    dim = 64
    base = [rng.gauss(0, 1) for _ in range(dim)]
    rows = [
        (i, [float(x + rng.gauss(0, 0.08)) for x in base], 0) for i in range(12)
    ] + [
        (i, [float(rng.gauss(0, 1)) for _ in range(dim)], 1) for i in range(12, 300)
    ]
    planted = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    ex = {(r["id_a"], r["id_b"]) for r in cosine_pairs_exact(planted, 0.85).collect()}
    got = {
        (r["id_a"], r["id_b"]) for r in cosine_self_join_above(planted, 0.85).collect()
    }
    assert ex  # the cluster produces high-cos pairs
    assert len(got & ex) / len(ex) >= 0.9


def test_quantize_int8_reconstruction_contract(emb, emb_py):
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import quantize_int8

    rows = {r["vec_id"]: r for r in quantize_int8(emb).collect()}
    assert rows.keys() == emb_py.keys()
    for vid, orig in emb_py.items():
        r = rows[vid]
        codes, scale = r["codes"], r["scale"]
        assert len(codes) == len(orig)
        # symmetric int8 range, max-magnitude element hits ±127 exactly
        assert all(-127 <= c <= 127 for c in codes)
        assert max(abs(c) for c in codes) == 127
        # dequantization error bounded by half a quantization step per dim
        for c, x in zip(codes, orig):
            assert abs(c * scale - x) <= scale / 2 + 1e-9


def test_quantized_topk_ranking_tracks_exact_dot(emb, emb_py):
    """Ranking over int8 codes must track the exact float dot-product
    ranking closely — 127 levels per dim keeps relative error ~1e-2."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        quantized_dot_topk,
    )

    q = emb_py[0]
    exact = sorted(
        ((sum(x * y for x, y in zip(v, q)), vid) for vid, v in emb_py.items() if vid != 0),
        reverse=True,
    )[:10]
    exact_ids = {vid for _, vid in exact}
    got_ids = {r["vec_id"] for r in quantized_dot_topk(emb, query_vec_id=0, k=10).collect()}
    assert len(got_ids & exact_ids) >= 8


def test_semantic_dedup_planted_duplicates(spark):
    """SemDeDup contract: exact embedding duplicates always land in the
    same IVF cell (identical vectors share an argmax centroid) and merge
    into one component; noisy copies (cos ≈ 0.99) merge when co-located;
    unrelated random vectors (cos ≈ 0 at dim 64) never merge."""
    import random

    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = random.Random(11)
    dim = 64
    rows = []
    planted_exact, planted_noisy = [], []
    for i in range(300):  # background corpus
        rows.append((i, [float(rng.gauss(0, 1)) for _ in range(dim)], 0))
    for j in range(10):  # 10 exact duplicate pairs
        src = rows[j * 3][1]
        rows.append((1000 + j, list(src), 0))
        planted_exact.append((j * 3, 1000 + j))
    for j in range(10):  # 10 noisy duplicate pairs (cos ≈ 0.995)
        src = rows[100 + j * 3][1]
        rows.append(
            (2000 + j, [float(x + rng.gauss(0, 0.05)) for x in src], 0)
        )
        planted_noisy.append((100 + j * 3, 2000 + j))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    canon = {
        r["vec_id"]: r["canon_id"]
        for r in semantic_dedup(emb, threshold=0.92).collect()
    }
    # exact dups: guaranteed same cell, cos = 1.0 → always merged
    assert all(canon[a] == canon[b] for a, b in planted_exact)
    # noisy dups: recall-gated (cell-boundary straddles are the known loss)
    noisy_hits = sum(1 for a, b in planted_noisy if canon[a] == canon[b])
    assert noisy_hits >= 8
    # precision: merged non-planted pairs would need cos >= 0.92 between
    # independent gaussians — background vectors stay singletons
    background = list(range(300))
    planted_lows = {a for a, _ in planted_exact} | {a for a, _ in planted_noisy}
    assert all(canon[i] == i for i in background if i not in planted_lows)


def test_semantic_dedup_oversized_cell_capped_not_quadratic(spark):
    """The max_cell_size guard (same contract as the dedup bucket caps):
    a degenerate corpus whose vectors all land in ONE cell must not
    expand O(N²) — the oversized cell is excluded from pair generation
    and every member keeps itself."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        semantic_dedup,
    )

    # 60 IDENTICAL vectors: identical centroids → argmax ties break to
    # the first cell → one cell of 60, over the cap of 50
    base = [1.0] * 16
    rows = [(i, list(base), 0) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    canon = {
        r["vec_id"]: r["canon_id"]
        for r in semantic_dedup(
            emb, threshold=0.9, n_centroids=4, max_cell_size=50
        ).collect()
    }
    assert len(canon) == 60
    assert all(canon[i] == i for i in canon)  # capped cell: no merges


def test_semantic_dedup_multi_probe_recall_dominates_single(spark):
    """nprobe=2 (multi-probe) must recover at least every pair nprobe=1
    finds — boundary-straddling duplicates are the difference — and
    pairs meeting in several shared cells must not double-merge."""
    import random

    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = random.Random(29)
    dim = 32
    rows = []
    for i in range(200):
        rows.append((i, [float(rng.gauss(0, 1)) for _ in range(dim)], 0))
    planted = []
    for j in range(15):  # noisy duplicate pairs
        src = rows[j * 13][1]
        rows.append((500 + j, [float(x + rng.gauss(0, 0.06)) for x in src], 0))
        planted.append((j * 13, 500 + j))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    def merged(nprobe):
        canon = {
            r["vec_id"]: r["canon_id"]
            for r in semantic_dedup(
                emb, threshold=0.92, n_centroids=8, nprobe=nprobe
            ).collect()
        }
        assert len(canon) == len(rows)  # one row per vector, no dup output
        return {(a, b) for a, b in planted if canon[a] == canon[b]}

    single, multi = merged(1), merged(2)
    assert single <= multi
    assert len(multi) >= 13  # near-full recall with runner-up cells probed


def test_ann_recall_report_on_planted_corpus(spark, tmp_path):
    """The gate-visible recall report (plans/registry.py::
    ann_recall_report): on a corpus with a planted angular cluster the
    approximate tiers must recover most of the true top-10 — and the
    report must be deterministic run-to-run (fixed seeds everywhere)."""
    import random

    from cloudfront_kinesis_log_lambda_spark.plans.registry import (
        ann_recall_report,
    )

    rng = random.Random(11)
    dim = 64
    base = [rng.gauss(0, 1) for _ in range(dim)]
    rows = [(0, [float(x) for x in base], 0)]
    for i in range(1, 21):  # planted cluster = the true neighbors
        rows.append((i, [float(x + rng.gauss(0, 0.15)) for x in base], 0))
    for i in range(21, 400):
        rows.append((i, [float(rng.gauss(0, 1)) for _ in range(dim)], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf_dir = str(tmp_path)
    emb.coalesce(1).write.parquet(f"{sf_dir}/embeddings.parquet")

    out = {
        r["method"]: (r["k"], r["n_hits"], r["recall"])
        for r in ann_recall_report(spark, sf_dir).collect()
    }
    assert set(out) == {"lsh", "ivf", "ivf_pq", "matryoshka"}
    for method, (k, n_hits, recall) in out.items():
        assert k == 10
        assert recall == round(n_hits / 10, 4)
    # structure present → the tiers must find it (same floors as the
    # per-tier planted-recall gates)
    assert out["ivf"][2] >= 0.9
    assert out["matryoshka"][2] >= 0.9  # planted prefixes mirror the query
    assert out["ivf_pq"][2] >= 0.6  # 8-bit product codes lose some rank
    assert out["lsh"][2] >= 0.5  # band collisions are probabilistic
    # deterministic: a second evaluation returns byte-identical rows
    out2 = {
        r["method"]: (r["k"], r["n_hits"], r["recall"])
        for r in ann_recall_report(spark, sf_dir).collect()
    }
    assert out2 == out


def test_kmeans_train_cap_samples_and_stays_deterministic(spark):
    """The train_cap branch (the only path unit fixtures don't hit by
    default): sampling engages whenever n > cap (ceil modulus), the
    hash-modulus survives adversarial id distributions (all-odd ids
    would empty a raw id-modulus sample with an even modulus), and the
    capped training is deterministic run-to-run."""
    import random

    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        kmeans_centroids,
    )

    rng = random.Random(7)
    dim = 8
    rows = [
        (2 * i + 1, [float(rng.gauss(0, 1)) for _ in range(dim)], 0)
        for i in range(400)  # all-ODD vec_ids
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    c1 = kmeans_centroids(emb, k=4, iters=2, train_cap=50)
    c2 = kmeans_centroids(emb, k=4, iters=2, train_cap=50)
    assert c1 == c2 and len(c1) == 4
    assert all(any(abs(x) > 1e-12 for x in c) for c in c1)  # non-degenerate
    # n barely over the cap still downsamples (ceil modulus): the
    # sampled init differs from the full-data init unless the hash
    # happens to keep the k lowest ids — assert only that it trains
    c3 = kmeans_centroids(emb.limit(60), k=4, iters=1, train_cap=50)
    assert len(c3) == 4
    # at or below the cap: byte-identical to uncapped
    small = emb.limit(40)
    assert kmeans_centroids(small, k=4, iters=1, train_cap=50) == (
        kmeans_centroids(small, k=4, iters=1)
    )


def test_grouped_cell_pairs_duplicate_id_no_self_pair(spark):
    """At-least-once redelivery seam (ADVICE r12): the SAME vec_id can
    appear twice in one cell — persisted in the index AND redelivered
    with is_new=True. The kernel's upper triangle must be strict BY ID
    VALUE, not by position in the sorted cell: a positional `j > gi`
    pairs the two copies into a (X, X, cos=1.0) self-edge that violates
    the doc_a < doc_b pair-log contract and corrupts near_dup_clusters.
    Legit pairs must still be emitted once per copy (max-cos dedup
    upstream collapses the multiplicity)."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        grouped_cell_pairs,
    )

    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.99, 0.14, 0.0, 0.0]  # cos(v, w) ≈ 0.990 — above threshold
    far = [0.0, 1.0, 0.0, 0.0]  # orthogonal — below threshold
    rows = [
        (10, v, 0, False),   # persisted copy of id 10
        (10, v, 0, True),    # redelivered copy, same cell, is_new=True
        (20, w, 0, True),    # legit near-dup of 10
        (30, far, 0, True),  # unrelated
    ]
    assigned = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cid int, is_new boolean"
    )
    got = grouped_cell_pairs(
        assigned, 0.92, new_col="is_new", emit_cos=True
    ).collect()
    # no self-pairs, strict orientation
    assert all(r["doc_a"] < r["doc_b"] for r in got)
    # both copies of 10 still pair with 20 (dedup happens upstream)
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {(10, 20)}
    assert sum(1 for r in got if (r["doc_a"], r["doc_b"]) == (10, 20)) == 2
    for r in got:
        assert r["cos"] == pytest.approx(0.990, abs=1e-3)
