"""Physical-plan hygiene gates: the properties that matter at 100 TB,
asserted on the actual executed/spark plans so regressions that silently
de-optimize (a lost pushdown, a broadcast that became a shuffle, a sort
where TakeOrdered belongs) fail CI — not a 1000-executor bill.
"""

from __future__ import annotations

import pytest

from cloudfront_kinesis_log_lambda_spark.operators import relational as R


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    plan = _plan(R.filtered_revenue(spark, sf_dir))
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:300]
    # column pruning: only the 4 needed columns in ReadSchema
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema and "l_orderkey" not in read_schema


def test_dim_joins_broadcast_not_shuffle(spark, sf_dir):
    plan = _plan(R.revenue_by_segment(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # only the final aggregate may shuffle — the dim join must not add
    # a SortMergeJoin
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = _plan(R.top_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_asof_join_single_exchange_no_join_node(spark, sf_dir):
    from cloudfront_kinesis_log_lambda_spark.plans.registry import purchases_asof_view

    plan = _plan(purchases_asof_view(spark, sf_dir))
    # union+window formulation: exactly one exchange (the window's key
    # partitioning), and no physical join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    for join_node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join_node not in plan


def test_whole_stage_codegen_covers_text_scoring(spark, sf_dir):
    from cloudfront_kinesis_log_lambda_spark.operators.text import quality_score

    plan = _plan(quality_score(R.load(spark, sf_dir, "documents")))
    # JVM-side end to end: a Project of builtin expressions over the scan,
    # never a Python eval node (WholeStageCodegen markers only materialize
    # in the AQE final plan, so absence-of-Python is the stable gate)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Project" in plan and "regexp_extract_all" in plan


@pytest.mark.parametrize("query", ["pricing_summary", "events_hourly"])
def test_aggregates_have_partial_final_split(spark, sf_dir, query):
    plan = _plan(getattr(R, query)(spark, sf_dir))
    # map-side combine: a partial_ aggregate before the exchange and a
    # final after — Catalyst's two-phase agg
    assert "partial_" in plan and "HashAggregate" in plan


def test_ivf_pq_query_path_is_map_only_over_code_table(spark, sf_dir):
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import ivf_pq_topk

    plan = _plan(ivf_pq_topk(R.load(spark, sf_dir, "embeddings"), 0, 10))
    # serving path: cell filter + Arrow encode/ADC UDFs + top-k — no
    # join, no hash shuffle (the only exchange is the round-robin
    # ensure_parallelism repartition), TakeOrderedAndProject not a sort
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    for join_node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert join_node not in plan


def test_range_frame_window_single_exchange(spark, sf_dir):
    plan = _plan(R.events_moving_hour_sum(spark, sf_dir))
    # one hash exchange on user_id feeding a native Window node; the
    # RANGE frame must not degrade to a join or a second shuffle
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_listagg_broadcasts_dim_and_sorts_inside_agg(spark, sf_dir):
    plan = _plan(R.region_nations_agg(spark, sf_dir))
    # nation⋈region is two tiny tables — broadcast, never a shuffle join;
    # determinism comes from array_sort inside the aggregate output, so
    # no global Sort node is needed; collect_list still gets Catalyst's
    # partial/final split (ObjectHashAggregate)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_collect_list" in plan and "Sort " not in plan


def test_minhash_signature_is_map_only_arrow_kernel(spark, sf_dir):
    """Round-4 rewrite gate: MinHash signatures are MAP-ONLY — JVM-side
    gram hashing feeding one Arrow numpy kernel, with NO exchange
    between the scan and the signature table (the round-2 explode +
    64-min() hash-aggregate carried 1 row/doc through a shuffle and
    measured ~1.5× slower; interpreted aggregate() HOF folds slower
    still) — and no shingle self-join anywhere in the LSH plan (that's
    the quadratic exact baseline's shape, not the scale path's)."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        ensure_parallelism,
        gram_array,
        has_min_tokens,
        minhash_band_rows,
    )
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import minhash_lsh_pairs

    docs = R.load(spark, sf_dir, "documents")
    hashed = ensure_parallelism(docs.filter(has_min_tokens("text", 3))).select(
        "doc_id", gram_array("text", 3).alias("grams")
    )
    sig_plan = _plan(minhash_band_rows(hashed, 64, 16, 42))
    assert "ArrowEvalPython" in sig_plan
    assert "Exchange hashpartitioning" not in sig_plan  # signatures never shuffle
    plan = _plan(minhash_lsh_pairs(docs, n=3, threshold=0.5))
    # HOF folds would appear as aggregate(... lambdafunction ...); the
    # only remaining lambdas belong to shingling transform()s
    assert "aggregate(" not in plan
    # exact verification joins on per-doc gram sets — no shingle-level
    # equi-join (join keyed on an exploded shingle/string column)
    assert "SortMergeJoin [shingle" not in plan


def test_winnow_kernel_evaluates_exactly_once(spark, sf_dir):
    """The winnow fingerprint kernel must appear ONCE in the physical
    plan, above the parallelism exchange. Catalyst's
    InferFiltersFromGenerate clones a DETERMINISTIC generator input into
    a `size(..)>0` filter and pushes it below the exchange — the whole
    Arrow kernel then runs a second time, single-task, on the unsplit
    scan (r6 find: +1.2 s at sf0.1). The asNondeterministic marker in
    winnow_fingerprints forbids the clone; this gate pins it."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        winnow_fingerprints,
    )

    docs = R.load(spark, sf_dir, "documents")
    plan = _plan(winnow_fingerprints(docs))
    assert plan.count("ArrowEvalPython") == 1
    # and the single evaluation sits ABOVE the round-robin exchange
    # (scan-parallel), not below it
    assert "RoundRobinPartitioning" in plan
    arrow_pos = plan.index("ArrowEvalPython")
    assert plan.index("RoundRobinPartitioning") > arrow_pos  # tree prints
    # top-down: the kernel node must print BEFORE (above) the exchange


def test_clusters_driver_query_avoids_shingle_self_join(spark, sf_dir):
    """near_dup_clusters (driver entry) must be built on the LSH pair
    graph: candidate generation inside band buckets, never the exploded
    shingle self-join."""
    from cloudfront_kinesis_log_lambda_spark.plans.registry import near_dup_clusters

    plan = _plan(near_dup_clusters(spark, sf_dir))
    assert "shingle" not in plan


def test_centroid_assignment_is_map_only_arrow_kernel(spark, sf_dir):
    """k-means assignment is one Arrow-batched numpy kernel: map-only —
    no join, no exchange, no per-iteration k x dim literal expression
    chain (which Janino re-compiled every Lloyd iteration)."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        assign_centroids,
    )

    emb = R.load(spark, sf_dir, "embeddings")
    centroids = [[float(i == j) for j in range(64)] for i in range(4)]
    plan = _plan(assign_centroids(emb, centroids))
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan
    for join_node in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin"):
        assert join_node not in plan


def test_simhash_buckets_capped_no_self_join(spark, sf_dir):
    """Round-3 gate: SimHash pair generation is the collect_list +
    bucket-cap pattern — the size(ms) <= max_bucket_size filter must be
    in the plan (boilerplate-chunk guard) and there must be no physical
    join node at all (pairs come from a nested transform, not a bucket
    self-join)."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import simhash_near_pairs

    docs = R.load(spark, sf_dir, "documents")
    plan = _plan(simhash_near_pairs(docs, max_hamming=8))
    assert "size(ms" in plan
    for join_node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert join_node not in plan


def test_embedding_lsh_pairs_capped_and_id_only_distinct(spark, sf_dir):
    """Round-3 gate: the embedding all-pairs LSH path caps its (table,
    bucket) cells AND dedups candidates on ids only — no embedding
    vector may flow through any aggregate (the distinct's exchange);
    vectors re-attach by join after the dedup."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        cosine_self_join_above,
    )

    emb = R.load(spark, sf_dir, "embeddings")
    plan = _plan(cosine_self_join_above(emb, threshold=0.3))
    assert "size(ids" in plan
    for line in plan.splitlines():
        if "HashAggregate" in line:
            assert "vec_a" not in line and "embedding" not in line


def test_quantized_topk_is_broadcast_take_ordered(spark, sf_dir):
    """The quantized serving path must plan as scan → codegen quantize +
    integer dot → TakeOrderedAndProject with the 1-row query side
    broadcast — no shuffle join, no global sort."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        quantized_dot_topk,
    )

    emb = R.load(spark, sf_dir, "embeddings")
    plan = _plan(quantized_dot_topk(emb, query_vec_id=0, k=10))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_quantize_int8_is_jvm_map_only(spark, sf_dir):
    """Int8 quantization must stay a single JVM projection pass: no
    Python eval node (the HOFs are builtin expressions) and no exchange
    — at 100 TB this op reads and rewrites every row, so anything
    beyond scan→project→write is waste."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import quantize_int8

    emb = R.load(spark, sf_dir, "embeddings")
    plan = _plan(quantize_int8(emb))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_streaming_batch_twins_use_native_window_nodes(spark, sf_dir):
    from cloudfront_kinesis_log_lambda_spark.plans.registry import (
        events_session_windows,
        events_tumbling_windows,
    )

    tumbling = _plan(events_tumbling_windows(spark, sf_dir))
    assert "HashAggregate" in tumbling and "partial_" in tumbling
    session = _plan(events_session_windows(spark, sf_dir))
    assert "session_window" in session


def test_pack_sequences_single_exchange_no_text_in_shuffle(spark, sf_dir):
    """Sequence packing's scale contract: exactly ONE exchange (on
    pack_group) feeding the Arrow kernel, and the text column must be
    projected away BEFORE it — the shuffle carries ~16 bytes/doc, not
    the corpus."""
    from cloudfront_kinesis_log_lambda_spark.pipelines import pack_sequences

    plan = _plan(pack_sequences(R.load(spark, sf_dir, "documents")))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" in plan
    ex = plan.index("Exchange hashpartitioning")
    # the exchange's input attribute list must not include the raw text
    assert "text" not in plan[ex : plan.index("]", ex) + 1]


def test_contamination_broadcasts_benchmark_grams(spark, sf_dir):
    """Contamination's scale contract: the benchmark gram set is the
    BROADCAST side (a fixed few MB at production scale) and the corpus
    side re-aggregates per doc_id with a partial/final split — never a
    shuffle join keyed on gram strings."""
    from cloudfront_kinesis_log_lambda_spark.operators.text import contamination
    from pyspark.sql import functions as F

    docs = R.load(spark, sf_dir, "documents")
    plan = _plan(
        contamination(
            docs.filter(F.col("doc_id") % 10 != 7),
            docs.filter(F.col("doc_id") % 10 == 7),
        )
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "partial_count" in plan  # map-side combine before the doc_id agg


def test_holt_single_exchange_per_user_fold(spark, sf_dir):
    """events_holt: ONE shuffle (the user groupBy) — the fold itself is
    a projection, never a second exchange or a window sort."""
    from cloudfront_kinesis_log_lambda_spark.operators.timeseries import (
        events_holt,
    )

    plan = _plan(events_holt(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan
    assert "partial_collect_list" in plan  # map-side partial before it


def test_hybrid_rrf_rankers_stay_bounded(spark, sf_dir):
    """doc_hybrid_rrf: both rankers end in TakeOrderedAndProject before
    fusion, and the fusion join never becomes a SortMergeJoin over
    corpus-sized sides (post-limit remnants broadcast under AQE)."""
    from cloudfront_kinesis_log_lambda_spark.operators.retrieval import (
        doc_hybrid_rrf,
    )

    plan = _plan(doc_hybrid_rrf(spark, sf_dir))
    assert plan.count("TakeOrderedAndProject") >= 2  # lex pool, sem pool + final
    assert "CartesianProduct" not in plan


def test_bigram_logprob_pairs_are_array_side(spark, sf_dir):
    """doc_bigram_logprob: bigrams come from a slice-zip projection
    (map-only), never a positional self-join of the token table."""
    from cloudfront_kinesis_log_lambda_spark.plans.registry import (
        doc_bigram_logprob,
    )

    plan = _plan(doc_bigram_logprob(spark, sf_dir))
    assert "SortMergeJoin" not in plan or "text" not in plan.split("SortMergeJoin")[1][:400]
    assert "partial_count" in plan  # bigram counts map-side combine


def test_semantic_dedup_pair_stage_is_grouped_gemm_not_self_join(spark, sf_dir):
    """The r6→r12 scale fix pinned: SemDeDup's pair stage must be the
    per-cell grouped GEMM (exactly ONE FlatMapGroupsInPandas over the
    assignment) and must NOT contain a cid self-join of the assigned
    table — the join form re-expands both float vectors onto every
    candidate row (~25 GB Arrow traffic for ~25 MB of vectors at the
    25× smoke shape). Reverting grouped_cell_pairs to the join
    formulation fails this gate (mutant-verified at introduction)."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        assign_centroids,
        grouped_cell_pairs,
        kmeans_centroids,
    )

    emb = R.load(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=4, iters=1)
    assigned = assign_centroids(emb, cents)
    plan = _plan(grouped_cell_pairs(assigned, 0.92))
    assert plan.count("FlatMapGroupsInPandas") == 1
    # no join at all in the pair stage — the old form was a
    # SortMergeJoin/ShuffledHashJoin of assigned against itself on cid
    for node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan
    # exactly the centroid-assignment Arrow kernel upstream — the old
    # form added a SECOND per-pair kernel downstream of the join
    assert plan.count("ArrowEvalPython") == 1
