"""Corpus-level curation operators for training-data pipelines
(SURVEY.md §2.6): statistical quality scoring against a corpus language
model, per-source quota capping, token-budget mixture sampling, and
n-gram novelty accounting.

These are the *global* curation stages — unlike ``operators/text.py``
(map-only per-document signals) each of these needs one corpus-wide
aggregate (a unigram model, a per-source rank, a running token total, a
gram-first-occurrence index) joined back against the documents. All
plans keep the wide ``text`` column out of every shuffle: tokens/grams
are exploded to compact (doc_id, term) rows first, and only aggregated
integers travel through the final exchange.

Every operator here is deterministic and engine-portable (exact ANSI-SQL
twins in ``functions/oracles.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.text import _tokens
from cloudfront_kinesis_log_lambda_spark.operators.util import ensure_parallelism


def n_tokens_col(text_col: str = "text") -> Column:
    """Empty-term-safe whitespace token count: a blank document is 0
    tokens (split of a trimmed empty string yields ['']). THE token
    accounting rule for mixture budgets — the batch operator and its
    streaming twin must share this expression or their parity silently
    drifts."""
    return F.size(
        F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    ).cast("long")


def _term_rows(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, term) with empty terms dropped — the shared explode."""
    return (
        ensure_parallelism(docs)
        .select(
            "doc_id",
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document mean unigram log-probability under a corpus-trained
    unigram LM — the classic cheap perplexity proxy used as a quality
    filter (CCNet / Gopher-style pipelines score documents against an LM
    and drop the tails; a self-trained unigram model is the deterministic,
    dependency-free form of that gate).

    Returns (doc_id, n_tokens, avg_logprob, ppl_proxy): ``avg_logprob``
    is the mean of ln(c_term / N_corpus) over the document's tokens,
    ``ppl_proxy`` = exp(-avg_logprob) (low = boilerplate / high-frequency
    filler, high = rare-token soup — both tails are what a curation
    pipeline cuts).

    Scale shape: two shuffles, both on compact rows — (1) term-count
    aggregation, partial+final combine on (term), vocabulary-sized
    output; (2) the per-doc re-aggregate on (doc_id). The token→count
    join is shuffle-on-term at real scale (the vocabulary of a 100 TB
    corpus does not broadcast) but AQE downgrades it to broadcast when
    the vocab side is small. The corpus total N joins as a broadcast
    scalar. Nothing carries ``text`` past the explode.
    """
    toks = _term_rows(docs, text_col)
    model = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = model.agg(F.sum("c").alias("total"))
    logp = F.log(F.col("c") / F.col("total"))
    avg = F.avg(logp)
    return (
        toks.join(model, "term")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(avg, 4).alias("avg_logprob"),
            F.round(F.exp(-avg), 4).alias("ppl_proxy"),
        )
    )


BIGRAM_ADD_K = 0.5


def bigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document mean bigram log-probability under a corpus-trained
    add-k-smoothed bigram LM — one model order up from
    :func:`unigram_logprob`, the next-cheapest perplexity proxy in a
    CCNet-style quality gate (a unigram LM can't see scrambled word
    order; a bigram LM scores it down).

    logp(w_i | w_{i-1}) = ln((c(w_{i-1} w_i) + k) / (c(w_{i-1} ·) + k·V))
    with k = 0.5, V = corpus vocabulary size, and c(w_{i-1} ·) the
    bigram-table marginal (so the conditional sums to 1 over the
    smoothed vocabulary). Documents with < 2 tokens have no bigrams and
    are absent from the output (documented; the unigram op covers them).

    Returns (doc_id, n_bigrams, avg_logprob, ppl_proxy).

    Numerics: per-bigram log-ratios are ROUND(·,9)-quantized and summed
    as DECIMAL(18,9) — exact integer arithmetic, order-free — then ONE
    double division and exp at the rendered edge (the BM25 policy,
    operators/retrieval.py; stricter than unigram_logprob's AVG, which
    leans on ROUND-4 to absorb fold-order ulp).

    Scale shape: bigram pairs are built array-side (slice-zip, map-only,
    no self-join) and collapse to partial+final counts on (w1, w2). The
    bigram MODEL table is localCheckpoint-materialized: it is
    vocabulary-bounded (aggregate output, orders of magnitude smaller
    than the corpus), and without the checkpoint every downstream
    consumer (the context marginal AND the scoring join) re-derives it
    from a fresh full-text scan — measured 4 document scans in the
    un-checkpointed plan vs 3 after (the remaining scans: one pair
    build for the model, one pair re-derivation for scoring, one token
    pass for V — scoring against a materialized model is also exactly
    how an LM-quality gate runs in production, model built once).
    Pair→model joins are shuffle-on-term at 100 TB (AQE downgrades to
    broadcast for small vocabularies); V and the scalar k broadcast.
    Nothing carries ``text`` past the explode.
    """
    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    base = ensure_parallelism(docs).select(
        "doc_id", toks.alias("tk")
    ).filter(F.size("tk") >= 2)
    pairs = base.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("tk", 1, F.size("tk") - 1).alias("w1"),
                F.slice("tk", 2, F.size("tk") - 1).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        # localCheckpoint, not cache() — the house rule for lazy
        # operators (see near_dup_pairs_exact)
        .localCheckpoint(eager=True)
    )
    ctx = big.groupBy("w1").agg(F.sum("c_ab").cast("long").alias("c_a"))
    vocab = _term_rows(docs, text_col).agg(
        F.countDistinct("term").cast("long").alias("v")
    )
    k = float(BIGRAM_ADD_K)
    contrib = F.round(
        F.log(
            (F.col("c_ab").cast("double") + F.lit(k))
            / (F.col("c_a").cast("double") + F.lit(k) * F.col("v").cast("double"))
        ),
        9,
    ).cast("decimal(18,9)")
    scored = (
        pairs.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(contrib).alias("s"),
        )
    )
    avg = F.col("s").cast("double") / F.col("n_bigrams").cast("double")
    return scored.select(
        "doc_id",
        "n_bigrams",
        F.round(avg, 4).alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("ppl_proxy"),
    )


def source_quota(
    docs: DataFrame,
    cap: int = 10,
    text_col: str = "text",
    priority: str = "length",
) -> DataFrame:
    """Per-source document quota — the domain-cap stage of a web-scale
    curation pipeline (bound any single domain's share of the corpus
    before mixing; C4/RefinedWeb-style pipelines cap per-domain page
    counts so SEO farms can't dominate).

    Keeps ``cap`` documents per source and returns the full accounting
    table (doc_id, source, n_chars, quota_rank, kept) — downstream
    materialization is ``filter(kept = 1)``. ``priority`` picks the
    keep rule: ``"length"`` keeps the longest (n_chars DESC, doc_id ASC
    tiebreak — the batch-curation choice), ``"arrival"`` keeps the
    first ``cap`` by doc_id — the admission-control semantics whose
    streaming twin is ``streaming/quota.py::StreamingSourceQuota``
    (first-come admission is the only priority an unbounded stream can
    honor, so the exact stream==batch parity gate uses this mode).

    Scale shape: one shuffle — a window rank partitioned by source over
    (n_chars, doc_id) only; ``text`` never enters the exchange. A
    pathologically hot source serializes its own rank sort; at 100 TB
    the cap-only variant of this op would pre-prune with a per-partition
    top-``cap`` heap (the TakeOrderedAndProject trick per key) before
    the global rank — not needed while the output contract is the full
    accounting table, which is inherently one-row-per-doc.
    """
    if priority == "length":
        order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    elif priority == "arrival":
        order = [F.col("doc_id").asc()]
    else:
        raise ValueError(f"unknown priority {priority!r}")
    w = Window.partitionBy("source").orderBy(*order)
    return ensure_parallelism(docs).select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.row_number().over(w).cast("long").alias("quota_rank"),
    ).withColumn("kept", (F.col("quota_rank") <= cap).cast("int"))


def _source_budget() -> Column:
    """Deterministic per-source token budget: 400 + 50·(k mod 4) for
    source ``srcK``. A fixed rational rule instead of float weights so
    the mixture arithmetic stays exact-integer at every scale factor
    (the oracle recomputes the same rule)."""
    k = F.substring(F.col("source"), 4, 10).cast("int")
    return (F.lit(400) + F.lit(50) * (k % 4)).cast("long")


def mixture_sample(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token-budget mixture sampling — build a training mix by taking
    documents from each source, in deterministic doc_id order, until that
    source's token budget is exhausted (the static form of a DoReMi /
    Pile-style source-mixture: per-source budgets are the weights × total
    token target).

    Returns the kept documents only: (doc_id, source, n_tokens,
    cum_tokens, budget) where ``cum_tokens`` is the running per-source
    total *including* this document, and every row satisfies
    ``cum_tokens <= budget``. All-integer output → exact cross-engine
    hash.

    Scale shape: one shuffle — the per-source cumulative-sum window over
    (doc_id, n_tokens) pairs; the budget is a per-row expression, not a
    join. ``text`` is reduced to its token count before the exchange.
    The prefix-sum window is the honest cost of "greedy fill in document
    order"; an order-free sample (hash-threshold per token share) would
    be cheaper but changes the semantics from fill-to-budget to
    expected-rate sampling.
    """
    n_tok = n_tokens_col(text_col)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ensure_parallelism(docs)
        .select(
            "doc_id",
            "source",
            n_tok.alias("n_tokens"),
            _source_budget().alias("budget"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "source", "n_tokens", "cum_tokens", "budget")
    )


def quality_sample(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-weighted deterministic sampling — soft quality filtering
    (FineWeb/CCNet-style: instead of a hard ``score >= τ`` cut, accept
    each document with probability equal to its quality score, keeping
    a diverse tail while still downweighting junk).

    Deterministic: the acceptance coin is the Knuth-hash unit interval
    ``(doc_id·2654435761 mod 2³² mod 10⁴)/10⁴`` — the same seeded-
    arithmetic trick as the train/val/test split assignment
    (pipelines/training_data.py), so the sample is reproducible across
    engines and runs. Returns the accepted documents (doc_id, quality,
    coin).

    Scale shape: map-only — quality is a per-row expression
    (text.quality_score's formula), the coin is integer arithmetic, no
    shuffle at all. The 100 TB soft-filter is exactly this cheap.
    """
    from cloudfront_kinesis_log_lambda_spark.operators.text import quality_score

    # DECIMAL multiply (HUGEINT oracle-side): exact for any int64
    # doc_id — BIGINT would wrap/error past doc_id ≈ 3.47e9; the mod is
    # normalized positive so negative ids can't yield a negative coin
    # (auto-accepted at any quality)
    _m = F.lit(4294967296)
    _prod = F.col("doc_id").cast("decimal(20,0)") * F.lit(2654435761)
    coin = (((_prod % _m + _m) % _m) % F.lit(10000)) / F.lit(10000.0)
    return (
        quality_score(docs, text_col)
        .select("doc_id", "quality", F.round(coin, 4).alias("coin"))
        .filter(F.col("coin") < F.col("quality"))
    )


def dup_span_stats(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """Position-level duplicated-span statistics — the signal behind
    exact substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": memorization tracks
    repeated SPANS, which document-level dedup misses entirely).

    A token position is *duplicated* if the n-gram starting there occurs
    anywhere else in the corpus — another document, or again in the same
    document (so boilerplate self-repeats count, unlike
    ``gram_novelty`` which is distinct-gram/first-occurrence based).
    Returns (doc_id, n_positions, n_dup_positions, dup_frac) for docs
    with ≥ n tokens; a span-removal pass would cut exactly the flagged
    positions' grams.

    Scale shape: positional grams explode WITH repeats, but collapse to
    (doc_id, gram, count) before the first exchange — the shuffled row
    count is bounded by distinct-grams-per-doc, same as novelty; the
    positional multiplicity rides along as an integer. Then one
    partial+final sum on (gram) for corpus totals, a shuffle join back,
    and a (doc_id) fold. ``hash_grams=True`` is the production mode
    (``text.contamination(hash_grams=True)`` pattern): grams collapse
    to xxhash64 int64s before the first exchange — strings for oracle
    parity, hashes at scale (equality pinned in test_corpus).
    """
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import gram_list

    grams = ensure_parallelism(docs).select(
        "doc_id", F.explode(gram_list(text_col, n)).alias("gram")
    )
    if hash_grams:
        # production mode: collapse grams to xxhash64 int64s BEFORE the
        # first exchange — same contract as contamination(hash_grams):
        # ~10× smaller shuffle rows, 2⁻⁶⁴-per-pair collision rate
        grams = grams.select("doc_id", F.xxhash64("gram").alias("gram"))
    per = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    # r15 examined, left alone: per feeds both the corpus-total
    # aggregate and the probe join, but both consumers sit above the
    # identical hashpartitioning(doc_id, gram) exchange, so runtime
    # ReuseExchange already runs the positional explode once — a
    # measured A/B of an eager pin here was a 9% pessimization.
    tot = per.groupBy("gram").agg(F.sum("c").alias("total"))
    dup = F.sum(F.when(F.col("total") >= 2, F.col("c")).otherwise(F.lit(0)))
    return (
        per.join(tot, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_positions"),
            dup.cast("long").alias("n_dup_positions"),
        )
        .select(
            "doc_id",
            "n_positions",
            "n_dup_positions",
            F.round(F.col("n_dup_positions") / F.col("n_positions"), 4).alias(
                "dup_frac"
            ),
        )
    )


def block_dedup(
    docs: DataFrame,
    block_tokens: int = 16,
    text_col: str = "text",
    hash_blocks: bool = False,
) -> DataFrame:
    """Block-level exact deduplication WITH document reassembly — the
    materializing form of exact-substring dedup (Lee et al. 2022): split
    every document into fixed ``block_tokens``-token blocks, keep only
    each block's corpus-wide first occurrence (min (doc_id, block_idx)),
    and stitch every document back together from its surviving blocks.
    This is the paragraph-dedup stage of CCNet/RefinedWeb-style pipelines
    (their paragraphs are newline-delimited; the driver corpus is
    single-line, so the block boundary is token-aligned), and it removes
    the repeated SPANS that document-level dedup (``text.exact_dedup``)
    cannot see.

    Returns one row per document: (doc_id, n_blocks, n_kept,
    dedup_text) — ``dedup_text`` is the document with every
    seen-before block deleted (possibly empty), ``n_blocks``/``n_kept``
    the accounting a curation report needs.

    Scale shape: the ANALYSIS keeps text out of every exchange — blocks
    collapse to (key, doc_id, block_idx) rows before the
    first-occurrence aggregate (partial+final min on a struct, the
    ``gram_novelty`` skeleton — no per-key global sort, so a
    boilerplate block repeated a million times is one hot aggregate
    key handled by partial combine, not a million-row window
    partition), one shuffle join probes the index, and the kept
    indices fold to a per-doc int array. The REASSEMBLY join (kept
    indices back onto the token arrays, keyed by doc_id) is the one
    place document content legitimately moves: any rewrite
    materialization pays exactly one such co-partitioned join (AQE
    broadcasts the index side when small; a doc_id-bucketed corpus
    layout makes it shuffle-free). ``hash_blocks=True`` is the
    production mode: block keys collapse to xxhash64 int64s before the
    first exchange (strings for oracle parity, hashes at scale —
    equality pinned in test_corpus).
    """
    base = block_base(docs, block_tokens, text_col)
    blocks = block_rows(base, block_tokens, hash_blocks)
    # r15: blocks feeds both the first-occurrence aggregate and the
    # probe join — unpinned, the tokenize + block-key explode over the
    # full corpus ran twice (6 parquet scans in the r15 before-plan;
    # now the key pass runs once and reassembly pays the one further
    # scan the ANALYSIS prescribes). Compact rows only: (doc_id,
    # block_idx, bk) — the token arrays stay out of the pin.
    blocks = blocks.localCheckpoint(eager=True)
    first = blocks.groupBy("bk").agg(
        F.min(F.struct("doc_id", "block_idx")).alias("f")
    )
    kept_rows = blocks.join(first, "bk").filter(
        (F.col("doc_id") == F.col("f.doc_id"))
        & (F.col("block_idx") == F.col("f.block_idx"))
    )
    return reassemble_blocks(base, kept_rows, block_tokens)


def block_base(
    docs: DataFrame, block_tokens: int, text_col: str = "text"
) -> DataFrame:
    """(doc_id, tk, n_blocks): the tokenized base relation every block
    operator (batch + streaming twin) derives from — ONE definition so
    the stream==batch parity can't drift on tokenization."""
    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    return ensure_parallelism(docs).select(
        "doc_id",
        toks.alias("tk"),
    ).withColumn(
        "n_blocks",
        F.ceil(F.size("tk") / F.lit(block_tokens)).cast("long"),
    )


def block_rows(
    base: DataFrame, block_tokens: int, hash_blocks: bool = False
) -> DataFrame:
    """(doc_id, block_idx, bk) — compact block-key rows; the wide token
    array never leaves this projection."""
    idxs = F.when(
        F.col("n_blocks") > 0,
        F.sequence(F.lit(0).cast("long"), F.col("n_blocks") - 1),
    ).otherwise(F.array().cast("array<long>"))
    block_at = F.array_join(
        F.slice(
            F.col("tk"),
            (F.col("block_idx") * block_tokens + 1).cast("int"),
            block_tokens,
        ),
        " ",
    )
    key = F.xxhash64(block_at) if hash_blocks else block_at
    return (
        base.select("doc_id", "tk", F.explode(idxs).alias("block_idx"))
        .select("doc_id", "block_idx", key.alias("bk"))
    )


def reassemble_blocks(
    base: DataFrame, kept_rows: DataFrame, block_tokens: int
) -> DataFrame:
    """Fold kept (doc_id, block_idx) rows to per-doc index arrays and
    stitch documents back from their surviving blocks."""
    kept = kept_rows.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("block_idx")).alias("kept_idx"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    rebuilt = F.array_join(
        F.transform(
            F.col("kept_idx"),
            lambda i: F.array_join(
                F.slice(
                    F.col("tk"), (i * block_tokens + 1).cast("int"), block_tokens
                ),
                " ",
            ),
        ),
        " ",
    )
    return (
        base.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_blocks",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
            F.when(F.col("kept_idx").isNotNull(), rebuilt)
            .otherwise(F.lit(""))
            .alias("dedup_text"),
        )
    )


def decontaminate_blocks(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    block_tokens: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination by SPAN REMOVAL — the materializing
    form of ``text.contamination``: instead of flagging whole documents
    whose n-grams leak from a held-out benchmark set, delete exactly the
    ``block_tokens``-token blocks containing a leaked n-gram and stitch
    the document back together from the clean remainder (the
    surgical-removal decontamination used when dropping whole documents
    would cost too much data).

    Returns one row per document: (doc_id, n_blocks, n_kept,
    dedup_text) — the same accounting shape as :func:`block_dedup`, with
    ``dedup_text`` the document minus its contaminated blocks. A block
    shorter than ``n`` tokens (the final partial block) carries no
    n-gram and is always kept.

    Scale shape: the benchmark gram index BROADCASTS (held-out
    evaluation sets are small by construction — the same contract as
    ``text.contamination``'s probe side); block grams collapse to
    compact (doc_id, block_idx, gram) rows for the semi-probe, the
    contaminated set anti-joins the block rows, and reassembly is the
    one documented content-carrying doc_id join (shared
    ``reassemble_blocks`` fold).
    """
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        gram_list,
        shingles,
    )

    base = block_base(docs, block_tokens, text_col)
    blocks = block_rows(base, block_tokens)  # bk IS the block string
    bench_grams = (
        shingles(benchmark, n, text_col)
        .select(F.col("shingle").alias("gram"))
        .distinct()
    )
    block_grams = blocks.select(
        "doc_id",
        "block_idx",
        F.explode(gram_list(F.col("bk"), n)).alias("gram"),
    )
    contaminated = (
        block_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("doc_id", "block_idx")
        .distinct()
    )
    kept_rows = blocks.join(
        contaminated, ["doc_id", "block_idx"], "left_anti"
    )
    return reassemble_blocks(base, kept_rows, block_tokens)


def collocation_lift(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: the corpus's top-``k`` adjacent-token bigrams
    by *lift* (= observed/expected co-occurrence,
    ``c_ab·N / (c_a·c_b)`` — the exponential of PMI, kept in ratio form
    so the arithmetic is one deterministic IEEE expression instead of a
    transcendental). The classic first step of phrase/vocab induction
    (word2vec-style phrase joining, tokenizer merge candidates) and a
    corpus-health signal: top lift pairs are the boilerplate phrases.

    Returns (w1, w2, c_ab, c_a, c_b, lift) for bigrams with
    ``c_ab >= min_count``, ordered by (lift DESC, w1, w2), ``k`` rows.

    Scale shape: bigram pairs are built array-side (zip of the token
    array with its own tail — map-only, no self-join) and collapse to
    partial+final counts on (w1, w2); unigram counts are the same
    vocabulary-sized aggregate as ``unigram_logprob``; the two
    count-joins are shuffle-on-term at 100 TB (AQE downgrades to
    broadcast when the vocab is small) and the final top-k is
    TakeOrderedAndProject over the filtered bigram vocabulary — the
    ``min_count`` filter prunes the long singleton tail before either
    join.
    """
    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    base = ensure_parallelism(docs).select(toks.alias("tk")).filter(
        F.size("tk") >= 2
    )
    pairs = base.select(
        F.explode(
            F.arrays_zip(
                F.slice("tk", 1, F.size("tk") - 1).alias("w1"),
                F.slice("tk", 2, F.size("tk") - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # r15 examined, left alone: big feeds the n_big total AND the
    # scoring chain, uni feeds BOTH count-joins — but every duplicate
    # consumer sits above an identical exchange, so runtime
    # ReuseExchange already tokenizes once (plan-gated by
    # test_collocation_lift_reuses_the_unigram_exchange); a measured
    # A/B of eager pins here was a wash.
    big = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    uni = (
        ensure_parallelism(docs)
        .select(F.explode(toks).alias("term"))  # toks is already
        .groupBy("term")                        # empty-filtered
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    total = big.agg(F.sum("c_ab").alias("n_big"))
    lift = F.round(
        F.col("c_ab").cast("double")
        * F.col("n_big").cast("double")
        / (F.col("c_a").cast("double") * F.col("c_b").cast("double")),
        4,
    )
    return (
        big.filter(F.col("c_ab") >= min_count)
        .join(uni.select(F.col("term").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("c").alias("c_b")), "w2")
        .join(F.broadcast(total))
        .select("w1", "w2", "c_ab", "c_a", "c_b", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(k)
    )


def global_shuffle(
    docs: DataFrame, n_shards: int = 8, seed: int = 42
) -> DataFrame:
    """Deterministic global training-order shuffle + shard assignment —
    the stage between curation and shard writing: training loaders want
    documents in a reproducible pseudo-random order, sharded so loaders
    can consume shards independently.

    The shuffle coin is the same seeded Knuth multiplicative hash as the
    split/sampling operators (``(doc_id·2654435761 + seed) mod 2³²``) so
    the order is reproducible across engines and runs without any RNG
    state. Returns (doc_id, shard, sort_key, pos): ``shard`` =
    sort_key mod n_shards, ``pos`` the document's 1-based position in
    its shard's shuffled order. All-integer output → exact cross-engine
    hash.

    Scale shape: shard assignment is map-only; ``pos`` is a per-shard
    row_number window — n_shards parallel sorts of corpus/n_shards rows
    each, NOT a global total order (the classic driver-shaped mistake a
    single unpartitioned row_number would be). Ties cannot exist:
    (sort_key, doc_id) is unique.
    """
    # DECIMAL multiply (HUGEINT oracle-side): exact for any int64
    # doc_id — BIGINT would wrap/error past doc_id ≈ 3.47e9; the mod is
    # normalized positive so negative ids get valid shards/sort keys
    m = F.lit(4294967296)
    prod = (
        F.col("doc_id").cast("decimal(20,0)") * F.lit(2654435761) + F.lit(seed)
    )
    key = (prod % m + m) % m
    w = Window.partitionBy("shard").orderBy("sort_key", "doc_id")
    return (
        ensure_parallelism(docs)
        .select("doc_id", key.cast("long").alias("sort_key"))
        .withColumn("shard", (F.col("sort_key") % n_shards).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "sort_key", "pos")
    )


def gram_novelty(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    word n-grams whose corpus-wide first occurrence (min doc_id) is this
    document. Low novelty ⇒ the document is assembled from text already
    seen earlier in the corpus — the incremental-crawl signal behind
    "how much new data did this snapshot actually add", and a
    soft/streaming cousin of exact substring dedup.

    Returns (doc_id, n_grams, n_novel, novelty) for documents with ≥ n
    tokens; novelty = n_novel / n_grams rounded to 4 (the only non-
    integer column).

    Scale shape: grams explode to (doc_id, shingle) rows; one
    partial+final min-aggregate on (shingle) builds the first-occurrence
    index, a shuffle join on (shingle) probes it, and one (doc_id)
    aggregate folds the counts. Three exchanges, all on compact rows —
    the same skeleton as ``text.contamination`` except the index side is
    the corpus itself, so it can never broadcast. ``hash_grams=True`` is
    the production mode (exactly as ``contamination(hash_grams=True)``):
    shingles collapse to xxhash64 int64s before the first exchange —
    strings for oracle parity, hashes at scale (equality pinned in
    test_corpus).
    """
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import shingles

    from pyspark.sql.window import Window

    sh = shingles(docs, n, text_col)
    if hash_grams:
        sh = sh.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    # r16 (guide §2.4 "two operations keyed the same way share one
    # exchange" — the index_from_tf treatment): the first-occurrence
    # index was a groupBy(shingle) min joined back onto the probe side.
    # ReuseExchange deduped the scan+explode (one shuffle, read twice),
    # but the reduce side still SORTED both reads and ran an SMJ. An
    # unbounded-frame window min over the SAME (shingle) partitioning
    # computes the identical integer (min over the whole partition ==
    # the grouped min) with ONE read of the exchange and no join; a
    # measured pin here stays rejected (the r15 A/B: +6%).
    w = Window.partitionBy("shingle")
    novel_frac = F.col("n_novel") / F.col("n_grams")
    return (
        sh.select("doc_id", F.min("doc_id").over(w).alias("first_doc"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(novel_frac, 4).alias("novelty"),
        )
    )
