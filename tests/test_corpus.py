"""Corpus-level curation operators (operators/corpus.py): value-level
invariants on hand-checkable corpora plus the 100 TB plan-hygiene gates
(text column never shuffles; no Python eval nodes)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import corpus as C


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", f"src{s}", len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


# --- unigram_logprob --------------------------------------------------------


def test_unigram_logprob_hand_computed(spark):
    # corpus: 4 tokens total — "a" ×3, "b" ×1
    docs = _docs(spark, [("a a b", 0), ("a", 0)])
    got = {r["doc_id"]: r for r in C.unigram_logprob(docs).collect()}
    la, lb = math.log(3 / 4), math.log(1 / 4)
    assert got[0]["n_tokens"] == 3
    assert got[0]["avg_logprob"] == round((2 * la + lb) / 3, 4)
    assert got[1]["n_tokens"] == 1
    assert got[1]["avg_logprob"] == round(la, 4)
    # common-token doc scores higher (less surprising) than the mixed doc
    assert got[1]["avg_logprob"] > got[0]["avg_logprob"]
    assert got[1]["ppl_proxy"] == round(math.exp(-la), 4)


def test_unigram_logprob_flags_rare_token_soup(spark):
    common = [("the cat sat on the mat", 0)] * 8
    rare = [("zqx vbn wfj plk qrt yui", 1)]
    got = C.unigram_logprob(_docs(spark, common + rare)).collect()
    by_id = {r["doc_id"]: r["ppl_proxy"] for r in got}
    # the rare-token document is the perplexity outlier a filter would cut
    assert by_id[8] == max(by_id.values())
    assert by_id[8] > 2 * by_id[0]


# --- bigram_logprob ---------------------------------------------------------


def test_bigram_logprob_hand_computed(spark):
    # corpus bigrams: (a,a) ×1, (a,b) ×2 from docs 0/1; vocabulary is
    # {a, b, c} → V=3 (doc 2's lone "c" contributes to V, not to bigrams)
    docs = _docs(spark, [("a a b", 0), ("a b", 0), ("c", 0)])
    got = {r["doc_id"]: r for r in C.bigram_logprob(docs).collect()}
    k, v = C.BIGRAM_ADD_K, 3  # vocab is {a, b, c}
    c_ab = {("a", "a"): 1, ("a", "b"): 2}
    c_a = {"a": 3}

    def lp(w1, w2):
        return round(
            math.log((c_ab[(w1, w2)] + k) / (c_a[w1] + k * v)), 9
        )

    assert 2 not in got  # single-token doc: no bigrams, absent
    assert got[0]["n_bigrams"] == 2
    want0 = (lp("a", "a") + lp("a", "b")) / 2
    assert got[0]["avg_logprob"] == round(want0, 4)
    assert got[0]["ppl_proxy"] == round(math.exp(-want0), 4)
    assert got[1]["n_bigrams"] == 1
    assert got[1]["avg_logprob"] == round(lp("a", "b"), 4)


def test_bigram_logprob_penalizes_scrambled_order(spark):
    """The reason a bigram LM exists next to the unigram one: identical
    bag-of-words, scrambled order → worse (lower) mean bigram logprob,
    while the unigram score can't tell them apart."""
    fluent = [("the cat sat on the mat", 0)] * 6
    scrambled = [("mat the on sat cat the", 1)]
    docs = _docs(spark, fluent + scrambled)
    big = {r["doc_id"]: r["avg_logprob"] for r in C.bigram_logprob(docs).collect()}
    uni = {r["doc_id"]: r["avg_logprob"] for r in C.unigram_logprob(docs).collect()}
    assert big[6] < big[0]  # scrambled doc scored down
    assert uni[6] == uni[0]  # unigram LM is order-blind


# --- source_quota -----------------------------------------------------------


def test_source_quota_keeps_longest_cap_per_source(spark):
    docs = _docs(
        spark,
        [("x" * (10 + i), i % 2) for i in range(8)],  # 4 docs per source
    )
    out = C.source_quota(docs, cap=2).collect()
    assert len(out) == 8  # full accounting table, kept and dropped
    kept = {r["doc_id"] for r in out if r["kept"] == 1}
    # longest two per source: ids 6,7 longest overall; 4,5 next
    assert kept == {4, 5, 6, 7}
    ranks = {r["doc_id"]: r["quota_rank"] for r in out}
    assert ranks[7] == 1 and ranks[5] == 2 and ranks[3] == 3 and ranks[1] == 4


def test_source_quota_tiebreak_is_doc_id(spark):
    docs = _docs(spark, [("same len", 0), ("same len", 0), ("same len", 0)])
    out = {r["doc_id"]: r["quota_rank"] for r in C.source_quota(docs, cap=1).collect()}
    assert out == {0: 1, 1: 2, 2: 3}


# --- mixture_sample ---------------------------------------------------------


def test_mixture_sample_fills_budget_in_doc_id_order(spark, sf_dir):
    from cloudfront_kinesis_log_lambda_spark.plans.registry import doc_mixture_sample

    out = doc_mixture_sample(spark, sf_dir).collect()
    assert out, "mixture sample came back empty"
    by_src: dict[str, list] = {}
    for r in out:
        assert r["cum_tokens"] <= r["budget"]
        k = int(r["source"][3:])
        assert r["budget"] == 400 + 50 * (k % 4)
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r["doc_id"])
        # greedy prefix: running sum is consistent ⇒ no doc was skipped
        cum = 0
        for r in rows:
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum


def test_mixture_sample_kept_set_is_prefix(spark):
    # source 0 budget is 400; 5 docs of 100 tokens → exactly 4 kept
    docs = _docs(spark, [("tok " * 99 + "tok", 0)] * 5)
    out = sorted(r["doc_id"] for r in C.mixture_sample(docs).collect())
    assert out == [0, 1, 2, 3]


# --- gram_novelty -----------------------------------------------------------


def test_gram_novelty_first_doc_novel_copy_not(spark):
    a = "the quick brown fox jumps over the lazy dog"
    docs = _docs(spark, [(a, 0), (a, 1), ("an entirely different sentence here", 0)])
    got = {r["doc_id"]: r for r in C.gram_novelty(docs).collect()}
    assert got[0]["novelty"] == 1.0
    assert got[1]["novelty"] == 0.0  # verbatim copy of an earlier doc
    assert got[2]["novelty"] == 1.0
    assert got[1]["n_grams"] == got[0]["n_grams"]


def test_gram_novelty_conservation(spark, sf_dir):
    """Σ n_novel over docs == |distinct grams in corpus| — every gram's
    first occurrence is counted exactly once."""
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import shingles
    from cloudfront_kinesis_log_lambda_spark.plans.registry import doc_gram_novelty

    out = doc_gram_novelty(spark, sf_dir)
    total_novel = out.agg(F.sum("n_novel")).collect()[0][0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_distinct = shingles(docs, 3).select("shingle").distinct().count()
    assert total_novel == n_distinct
    bad = out.filter(
        (F.col("n_novel") > F.col("n_grams")) | (F.col("n_grams") <= 0)
    ).count()
    assert bad == 0


# --- dup_span_stats ---------------------------------------------------------


def test_dup_span_stats_hand_computed(spark):
    # doc 0: "a b c a b c a b c" — 7 positions, every 3-gram repeats
    #        within the doc itself (intra-doc dup)
    # doc 1: unique text — 0 dups
    # doc 2+3: identical — every position duplicated cross-doc
    docs = _docs(
        spark,
        [
            ("a b c a b c a b c", 0),
            ("q w e r t y u", 0),
            ("x y z w v", 1),
            ("x y z w v", 1),
        ],
    )
    got = {r["doc_id"]: r for r in C.dup_span_stats(docs).collect()}
    assert got[0]["n_positions"] == 7 and got[0]["dup_frac"] == 1.0
    assert got[1]["n_positions"] == 5 and got[1]["n_dup_positions"] == 0
    assert got[2]["dup_frac"] == 1.0 and got[3]["dup_frac"] == 1.0


def test_dup_span_stats_partial_overlap(spark):
    # shared 5-token prefix → 3 shared gram positions out of 8 per doc
    a = "s1 s2 s3 s4 s5 a6 a7 a8 a9 a10"
    b = "s1 s2 s3 s4 s5 b6 b7 b8 b9 b10"
    got = {
        r["doc_id"]: r
        for r in C.dup_span_stats(_docs(spark, [(a, 0), (b, 1)])).collect()
    }
    assert got[0]["n_positions"] == 8
    assert got[0]["n_dup_positions"] == 3  # grams at positions 1..3
    assert got[0]["dup_frac"] == round(3 / 8, 4)
    assert got[1]["n_dup_positions"] == 3


# --- plan hygiene (the 100 TB gates) ---------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _keyed_exchange_outputs(df) -> list[str]:
    """Output attribute lists of every hash-/range-partitioned Exchange
    in the EXECUTED plan (collect first so AQE materializes its stages).
    Round-robin exchanges are excluded on purpose: ensure_parallelism's
    scan-spreading repartition legitimately carries the raw text — it IS
    the input, pre-projection; the 100 TB rule is that text never rides
    a keyed shuffle (agg / join / window)."""
    df.collect()
    outs: list[str] = []

    def walk(node):
        name = node.nodeName()
        if name.startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())
            return
        head = node.toString().splitlines()[0]
        if "Exchange" in name and (
            "hashpartitioning" in head or "rangepartitioning" in head
        ):
            outs.append(node.output().toString())
        if "QueryStage" in name:
            walk(node.plan())
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return outs


def test_corpus_plans_are_jvm_side_and_text_never_rides_keyed_shuffles(
    spark, sf_dir
):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (
        C.unigram_logprob(docs),
        C.source_quota(docs),
        C.mixture_sample(docs),
        C.gram_novelty(docs),
        C.dup_span_stats(docs),
        C.collocation_lift(docs),
    ):
        plan = _plan(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        keyed = _keyed_exchange_outputs(df)
        assert keyed, "expected at least one keyed exchange"
        for out in keyed:
            assert "text#" not in out, out


def test_keyed_exchange_gate_catches_a_text_carrying_shuffle(spark, sf_dir):
    """Meta-test: the gate must actually trip on a plan that aggregates
    BY text (text rides the hash exchange) — guards against the gate
    regressing into a vacuous string check."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.groupBy("doc_id", "text").agg(F.count(F.lit(1)).alias("c"))
    assert any("text#" in o for o in _keyed_exchange_outputs(bad))


def test_block_dedup_plan_isolates_content_to_the_reassembly_join(spark, sf_dir):
    """block_dedup's 100 TB contract: the first-occurrence index and the
    probe join shuffle only (bk, doc_id, block_idx) — token content (tk)
    rides at most the ONE doc_id-keyed reassembly exchange the docstring
    documents. Python never evaluates anything."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = C.block_dedup(docs)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    keyed = _keyed_exchange_outputs(df)
    assert keyed, "expected keyed exchanges"
    carrying = [o for o in keyed if "tk#" in o]
    assert len(carrying) <= 1, carrying
    for o in keyed:
        if "bk#" in o:  # the analysis exchanges: index + probe
            assert "tk#" not in o and "text#" not in o, o


def test_decontaminate_plan_broadcasts_the_benchmark_probe(spark, sf_dir):
    """The benchmark gram index must reach the probe as a broadcast
    (held-out eval sets are small by contract — shuffling the corpus's
    block-gram rows against it would be the 100 TB mistake), and no
    Python evaluates anything."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = C.decontaminate_blocks(
        docs.filter("doc_id % 10 != 7"), docs.filter("doc_id % 10 = 7")
    )
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan


def test_collocation_lift_reuses_the_unigram_exchange(spark, sf_dir):
    """The double unigram join (w1 side + w2 side) must not compute the
    vocabulary aggregate twice: Spark's ReuseExchange has to collapse
    the two identical subtrees, or a 100 TB corpus pays a second full
    scan+aggregate for nothing."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = C.collocation_lift(docs)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan[:2000]


def test_source_quota_single_exchange(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(C.source_quota(docs))
    # window rank: exactly the one hashpartitioning(source) exchange
    # beyond the ensure_parallelism round-robin
    assert plan.count("Exchange hashpartitioning") == 1


# --- property-based brute-force parity (SURVEY.md §5.4 pattern) -------------

from hypothesis import HealthCheck, given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

_word = st.sampled_from([f"w{i}" for i in range(12)])  # small vocab → collisions
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


def _brute_dup_span(texts, n=3):
    from collections import Counter

    grams = {}
    for d, t in enumerate(texts):
        w = t.split()
        grams[d] = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
    total = Counter(g for gs in grams.values() for g in gs)
    out = {}
    for d, gs in grams.items():
        if gs:
            dup = sum(1 for g in gs if total[g] >= 2)
            out[d] = (len(gs), dup, round(dup / len(gs), 4))
    return out


@settings(max_examples=fuzz_examples(12), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_doc, min_size=1, max_size=10))
def test_dup_span_stats_matches_bruteforce(spark, texts):
    docs = _docs(spark, [(t, 0) for t in texts])
    got = {
        r["doc_id"]: (r["n_positions"], r["n_dup_positions"], r["dup_frac"])
        for r in C.dup_span_stats(docs).collect()
    }
    assert got == _brute_dup_span(texts)


def _brute_novelty(texts, n=3):
    first = {}
    per_doc = {}
    for d, t in enumerate(texts):
        w = t.split()
        gs = {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
        per_doc[d] = gs
        for g in gs:
            first.setdefault(g, d)
    return {
        d: (len(gs), sum(1 for g in gs if first[g] == d),
            round(sum(1 for g in gs if first[g] == d) / len(gs), 4))
        for d, gs in per_doc.items()
        if gs
    }


@settings(max_examples=fuzz_examples(12), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_doc, min_size=1, max_size=10))
def test_gram_novelty_matches_bruteforce(spark, texts):
    docs = _docs(spark, [(t, 0) for t in texts])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in C.gram_novelty(docs).collect()
    }
    assert got == _brute_novelty(texts)


@settings(max_examples=fuzz_examples(10), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=12),
    st.integers(min_value=0, max_value=3),
)
def test_mixture_sample_matches_greedy_bruteforce(spark, token_counts, src_k):
    """Docs of known token counts through one source srcK: the kept set
    must be exactly the Python greedy prefix against that source's
    budget rule (400 + 50*(k%4))."""
    texts = [("tok " * c).strip() for c in token_counts]
    docs = _docs(spark, [(t, src_k) for t in texts])
    budget = 400 + 50 * (src_k % 4)
    kept, cum = [], 0
    for i, c in enumerate(token_counts):
        cum += c
        if cum <= budget:
            kept.append((i, c, cum))
        else:
            break  # greedy fill stops at the first overflow... 
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["cum_tokens"])
        for r in C.mixture_sample(docs).collect()
    )
    assert got == kept


# --- quality_sample ---------------------------------------------------------


def test_quality_sample_is_deterministic_and_quality_weighted(spark, sf_dir):
    from cloudfront_kinesis_log_lambda_spark.operators.text import quality_score
    from cloudfront_kinesis_log_lambda_spark.plans.registry import doc_quality_sample

    a = {r["doc_id"] for r in doc_quality_sample(spark, sf_dir).collect()}
    b = {r["doc_id"] for r in doc_quality_sample(spark, sf_dir).collect()}
    assert a == b and a  # reproducible, non-empty
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    # acceptance rate tracks mean quality (the whole point of the op)
    rate = len(a) / len(q)
    mean_q = sum(q.values()) / len(q)
    assert abs(rate - mean_q) < 0.15
    # every accepted doc satisfies its own coin < quality
    for r in doc_quality_sample(spark, sf_dir).collect():
        assert r["coin"] < r["quality"]


def test_quality_sample_coin_is_knuth_hash_of_doc_id(spark):
    docs = _docs(spark, [("plain words here", 0)] * 4)  # ids 0..3, same text
    got = {r["doc_id"]: r["coin"] for r in
           C.quality_sample(docs).select("doc_id", "coin").collect()}
    expect = {d: round((d * 2654435761 % 2**32 % 10000) / 10000, 4)
              for d in range(4)}
    q = 0.312  # this text's fixed quality score
    # exactly the ids whose hash-coin clears the bar are in the sample
    assert got == {d: c for d, c in expect.items() if c < q}
    assert 0 in got  # doc 0's coin is 0.0 — accepted at any quality > 0


# --- hashed-gram production mode parity -------------------------------------


def test_hashed_gram_modes_match_string_modes(spark, sf_dir):
    """hash_grams=True (int64 shuffles) must produce identical results
    to the oracle-checked string mode on the real corpus — the same
    pinning contamination's production mode has."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(C.gram_novelty(docs)) == rows(C.gram_novelty(docs, hash_grams=True))
    assert rows(C.dup_span_stats(docs)) == rows(
        C.dup_span_stats(docs, hash_grams=True)
    )


# --- block_dedup ------------------------------------------------------------


def _brute_block_dedup(texts, block_tokens):
    import math as m

    seen = set()
    out = {}
    for d, t in enumerate(texts):
        w = [x for x in t.split() if x]
        blocks = [
            " ".join(w[i * block_tokens : (i + 1) * block_tokens])
            for i in range(m.ceil(len(w) / block_tokens))
        ]
        kept = []
        for b in blocks:  # doc order × block order == min (doc_id, idx)
            if b not in seen:
                seen.add(b)
                kept.append(b)
        out[d] = (len(blocks), len(kept), " ".join(kept))
    return out


def test_block_dedup_hand_computed(spark):
    # doc1 repeats doc0's first block and its own second block twice
    docs = _docs(
        spark,
        [
            ("a b c d", 0),
            ("a b x y a b", 1),  # block0 "a b" dupes doc0? no — "a b" != "a b c d"
        ],
    )
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["dedup_text"])
        for r in C.block_dedup(docs, block_tokens=2).collect()
    }
    # doc0: blocks ["a b", "c d"] both novel
    # doc1: ["a b" (dup of doc0), "x y", "a b" (dup again)] → keeps "x y"
    assert got[0] == (2, 2, "a b c d")
    assert got[1] == (3, 1, "x y")


@settings(max_examples=fuzz_examples(12), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_doc, min_size=1, max_size=10))
def test_block_dedup_matches_bruteforce(spark, texts):
    docs = _docs(spark, [(t, 0) for t in texts])
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["dedup_text"])
        for r in C.block_dedup(docs, block_tokens=2).collect()
    }
    assert got == _brute_block_dedup(texts, 2)


def test_block_dedup_hashed_mode_matches_string_mode(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, C.block_dedup(docs).collect()))
    b = sorted(map(tuple, C.block_dedup(docs, hash_blocks=True).collect()))
    assert a == b


def test_block_dedup_conservation(spark, sf_dir):
    """Token conservation: every kept block's tokens reappear verbatim,
    total kept blocks == distinct blocks in the corpus, and a clean
    corpus (no repeated blocks) passes through unchanged."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = C.block_dedup(docs).collect()
    n_kept = sum(r["n_kept"] for r in out)
    # kept text is a verbatim in-order subsequence of the original:
    # dedup_text's blocks must appear in the source doc in block order
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    corpus_seen: set[str] = set()
    for r in sorted(out, key=lambda r: r["doc_id"]):
        src = texts[r["doc_id"]].split()
        src_blocks = [
            " ".join(src[i : i + 16]) for i in range(0, len(src), 16)
        ]
        kept_blocks = []
        rem = r["dedup_text"]
        for b in src_blocks:
            if rem.startswith(b):
                kept_blocks.append(b)
                rem = rem[len(b) :].lstrip()
        assert rem == "", (r["doc_id"], rem[:60])  # nothing fabricated
        assert len(kept_blocks) == r["n_kept"]
        # exactly the first occurrences: kept blocks are corpus-novel
        for b in kept_blocks:
            assert b not in corpus_seen
        corpus_seen.update(src_blocks)
    # clean corpus (all-unique blocks) passes through unchanged
    uniq = _docs(spark, [(f"u{i}a u{i}b u{i}c", 0) for i in range(5)])
    for r in C.block_dedup(uniq, block_tokens=16).collect():
        assert r["dedup_text"] == f"u{r['doc_id']}a u{r['doc_id']}b u{r['doc_id']}c"
        assert r["n_kept"] == r["n_blocks"] == 1
    # distinct-block count computed independently of the operator
    from cloudfront_kinesis_log_lambda_spark.operators.text import _tokens

    blocks = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size(F.filter(_tokens(F.col("text")), lambda t: t != "")) / 16) - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice(
                            F.filter(_tokens(F.col("text")), lambda t: t != ""),
                            (i * 16 + 1).cast("int"),
                            16,
                        ),
                        " ",
                    ),
                )
            ),
        )
    )
    assert n_kept == blocks.select("col").distinct().count()


# --- global_shuffle ---------------------------------------------------------


def test_global_shuffle_matches_bruteforce_and_is_deterministic(spark):
    docs = _docs(spark, [("doc text here", 0)] * 20)  # ids 0..19
    got = sorted(map(tuple, C.global_shuffle(docs, n_shards=4, seed=7).collect()))
    keys = {d: (d * 2654435761 + 7) % 2**32 for d in range(20)}
    expect = []
    for d, k in keys.items():
        shard = k % 4
        pos = 1 + sum(
            1 for d2, k2 in keys.items()
            if k2 % 4 == shard and (k2, d2) < (k, d)
        )
        expect.append((d, shard, k, pos))
    assert got == sorted(expect)
    # same seed → identical; different seed → different order
    again = sorted(map(tuple, C.global_shuffle(docs, n_shards=4, seed=7).collect()))
    other = sorted(map(tuple, C.global_shuffle(docs, n_shards=4, seed=8).collect()))
    assert again == got and other != got


def test_knuth_hash_is_exact_at_int64_extremes(spark):
    """Overflow regression: the Knuth multiply runs in DECIMAL, so for
    doc_id past 2⁶³/2654435761 ≈ 3.47e9 (where a BIGINT multiply wraps
    or ANSI-errors) the key still equals Python's bignum arithmetic —
    a training-scale corpus lives in exactly that id range."""
    big = [3_470_000_000, 2**62, 2**63 - 1, 7, -1, -(2**62)]
    docs = spark.createDataFrame(
        [(i, "some text", "en", "src0", 9) for i in big],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["shard"], r["sort_key"])
        for r in C.global_shuffle(docs, n_shards=8, seed=42).collect()
    }
    for d in big:
        # Python % is already the positive mod the engine normalizes to
        k = (d * 2654435761 + 42) % 2**32
        assert got[d] == (k % 8, k), d
        assert 0 <= got[d][0] < 8  # negative ids get VALID shards
    coins = {r["doc_id"]: r["coin"] for r in
             C.quality_sample(docs).select("doc_id", "coin").collect()}
    for d, c in coins.items():
        assert c == round((d * 2654435761 % 2**32 % 10000) / 10000, 4)
        assert c >= 0


def test_global_shuffle_positions_are_dense_per_shard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = C.global_shuffle(docs).collect()
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert len(out) == docs.count()  # every doc placed exactly once
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


# --- decontaminate_blocks ---------------------------------------------------


def _brute_decontaminate(texts, bench_texts, n, block_tokens):
    import math as m

    bench = set()
    for t in bench_texts:
        w = [x for x in t.split() if x]
        bench.update(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))
    out = {}
    for d, t in enumerate(texts):
        w = [x for x in t.split() if x]
        blocks = [
            " ".join(w[i * block_tokens : (i + 1) * block_tokens])
            for i in range(m.ceil(len(w) / block_tokens))
        ]
        kept = []
        for b in blocks:
            bw = b.split()
            grams = {" ".join(bw[i : i + n]) for i in range(len(bw) - n + 1)}
            if not grams & bench:
                kept.append(b)
        out[d] = (len(blocks), len(kept), " ".join(kept))
    return out


def test_decontaminate_blocks_hand_computed(spark):
    bench = _docs(spark, [("p q r", 0)])
    # doc0 block1 contains the leaked gram "p q r"; block0 is clean;
    # doc1 is entirely clean
    docs = _docs(
        spark,
        [("a b c d x p q r", 0), ("a b c d e f", 1)],
    )
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["dedup_text"])
        for r in C.decontaminate_blocks(docs, bench, n=3, block_tokens=4).collect()
    }
    assert got[0] == (2, 1, "a b c d")
    assert got[1] == (2, 2, "a b c d e f")


@settings(max_examples=fuzz_examples(10), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(_doc, min_size=1, max_size=8),
    st.lists(_doc, min_size=1, max_size=3),
)
def test_decontaminate_blocks_matches_bruteforce(spark, texts, bench_texts):
    docs = _docs(spark, [(t, 0) for t in texts])
    bench = spark.createDataFrame(
        [(1000 + i, t, "en", "bench", len(t)) for i, t in enumerate(bench_texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["dedup_text"])
        for r in C.decontaminate_blocks(docs, bench, n=2, block_tokens=3).collect()
    }
    assert got == _brute_decontaminate(texts, bench_texts, 2, 3)


def test_decontaminate_short_tail_block_always_kept(spark):
    # the final partial block has < n tokens → no gram → immune
    bench = _docs(spark, [("x y z", 0)])
    docs = _docs(spark, [("a b c d x y", 0)])  # blocks: "a b c d", "x y"
    got = C.decontaminate_blocks(docs, bench, n=3, block_tokens=4).collect()[0]
    assert (got["n_blocks"], got["n_kept"], got["dedup_text"]) == (
        2, 2, "a b c d x y",
    )


# --- collocation_lift -------------------------------------------------------


def _round_half_up(x, nd=4):
    # Spark's ROUND is HALF_UP; Python's round() is banker's — they
    # disagree exactly at representable midpoints (e.g. 264/256 =
    # 1.03125 → 1.0313 vs 1.0312)
    import math as m

    return m.floor(x * 10**nd + 0.5) / 10**nd


def _brute_colloc(texts, min_count, k):
    from collections import Counter

    uni: Counter = Counter()
    big: Counter = Counter()
    for t in texts:
        w = [x for x in t.split() if x]
        uni.update(w)
        big.update(zip(w, w[1:]))
    n = sum(big.values())
    rows = [
        (a, b, cab, uni[a], uni[b], _round_half_up(cab * n / (uni[a] * uni[b])))
        for (a, b), cab in big.items()
        if cab >= min_count
    ]
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return rows[:k]


def test_collocation_lift_hand_computed(spark):
    # "x y" always adjacent (lift high); "a a" chains are the baseline
    docs = _docs(spark, [("x y a x y a a", 0), ("x y a a", 1)])
    got = [tuple(r) for r in C.collocation_lift(docs, min_count=2, k=10).collect()]
    assert got == _brute_colloc(["x y a x y a a", "x y a a"], 2, 10)
    # the perfectly-coupled pair ranks first
    assert got[0][0] == "x" and got[0][1] == "y"


@settings(max_examples=fuzz_examples(12), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_doc, min_size=1, max_size=10))
def test_collocation_lift_matches_bruteforce(spark, texts):
    docs = _docs(spark, [(t, 0) for t in texts])
    got = [tuple(r) for r in C.collocation_lift(docs, min_count=2, k=15).collect()]
    assert got == _brute_colloc(texts, 2, 15)


# --- degenerate inputs ------------------------------------------------------


def test_corpus_ops_on_empty_and_blank_corpora(spark):
    """An empty corpus (or one that tokenizes to nothing) must yield
    empty results everywhere — not a crash in a sequence(), divide, or
    window. The 100 TB relevance: per-partition emptiness is routine
    after selective filters."""
    empty = _docs(spark, [])
    blank = _docs(spark, [("", 0), ("   ", 1)])
    for docs in (empty, blank):
        assert C.gram_novelty(docs).count() == 0
        assert C.dup_span_stats(docs).count() == 0
        # blank docs HAVE rows in accounting ops; they just carry zeros
    assert C.unigram_logprob(empty).count() == 0
    assert C.source_quota(empty).count() == 0
    assert C.mixture_sample(empty).count() == 0
    assert C.quality_sample(empty).count() == 0
    # blank docs: 0 tokens ⇒ cum 0 <= budget ⇒ admitted with 0 cost
    mix = {r["doc_id"]: r["n_tokens"] for r in C.mixture_sample(blank).collect()}
    assert mix == {0: 0, 1: 0}
    # unigram over a blank-only corpus: no terms at all
    assert C.unigram_logprob(blank).count() == 0
    # block dedup: empty corpus → no rows; blank docs → zero-block rows
    assert C.block_dedup(empty).count() == 0
    blk = {r["doc_id"]: (r["n_blocks"], r["n_kept"], r["dedup_text"])
           for r in C.block_dedup(blank).collect()}
    assert blk == {0: (0, 0, ""), 1: (0, 0, "")}
    # collocations need at least one adjacent pair
    assert C.collocation_lift(empty, min_count=1).count() == 0
    assert C.collocation_lift(blank, min_count=1).count() == 0
