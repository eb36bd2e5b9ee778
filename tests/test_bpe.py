"""BPE learning + encode contracts: the distributed learner must match
a pure-Python BPE reference row-for-row (exact, not statistical); the
two-pass replace-chain encode must equal single-pass fold semantics on
adversarial inputs; and the pinned FIXED_MERGES literal must be exactly
what the learner produces on its synthetic corpus."""

from __future__ import annotations

import random
import re
from collections import Counter

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.functions import bpe


# --- pure-Python reference (the spec) ------------------------------------
def py_merge_once(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def py_learn(texts, n_merges, min_pair_count=2):
    wc = Counter(
        w
        for t in texts
        for w in re.split(r"\s+", t)
        if w and bpe.SEP not in w
    )
    seqs = {w: list(w) for w in wc}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, n in wc.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (a, b), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_pair_count:
            break
        merges.append((rank, a, b, a + b, c))
        seqs = {w: py_merge_once(s, a, b) for w, s in seqs.items()}
    return merges


def py_pieces(word, merges):
    s = list(word)
    for a, b in merges:
        s = py_merge_once(s, a, b)
    return len(s)


def _learn_rows(df):
    return [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in df.orderBy("rank").collect()
    ]


def test_fixed_merges_is_the_learner_output_on_synth(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bpe.SYNTH_CORPUS)],
        "doc_id long, text string",
    )
    learned = _learn_rows(bpe.learn_bpe_merges(docs, n_merges=12))
    assert [(left, right) for _, left, right, _, _ in learned] == list(
        bpe.FIXED_MERGES
    )
    # and the reference agrees with the distributed learner
    assert learned == py_learn(bpe.SYNTH_CORPUS, 12)


def test_learner_matches_python_reference_on_random_corpus(spark):
    rng = random.Random(13)
    vocab = ["ab", "abc", "bca", "aa", "cab", "b", "x"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(30)) for _ in range(8)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert _learn_rows(bpe.learn_bpe_merges(docs, n_merges=10)) == py_learn(
        texts, 10
    )


def test_learner_early_stop_and_single_char_words(spark):
    docs = spark.createDataFrame(
        [(0, "a bb a x yz a bb")], "doc_id long, text string"
    )
    rows = _learn_rows(bpe.learn_bpe_merges(docs, n_merges=5))
    # only (b,b) reaches min_pair_count=2; everything else is unique
    assert rows == [(0, "b", "b", "bb", 2)]


def _fuzz_words(seed=7, n=200, alphabet="abcx"):
    words = [
        "abababab", "ababab", "aaa", "aaaa", "aaaaaa", "aaab", "xab",
        "xaab", "cab", "ccab", "abc", "ba", "a", "", "bbb", "aabb",
        "abab", "a" * 8, "a" * 11,
    ]
    rng = random.Random(seed)
    words += [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 14)))
        for _ in range(n)
    ]
    return sorted(set(w for w in words if w))


def test_replace_chain_equals_fold_semantics(spark):
    """The subtle encode claim, for a ≠ b merges: two boundary-anchored
    replaces per rank over the sentinel string == one left-to-right
    non-overlapping fold pass. Adversarial inputs: overlapping chains
    (abab…), merged-symbol reuse (merge result is the left of a later
    merge), prefix/suffix lookalikes (xa·b must not merge as a·b),
    long runs."""
    merges = [("a", "b"), ("ab", "x"), ("aa", "b"), ("c", "ab"), ("b", "a")]
    words = _fuzz_words()
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["p"]
        for r in df.select(
            "word",
            F.expr(bpe.bpe_pieces_sql("word", merges, duck=False)).alias("p"),
        ).collect()
    }
    for w in words:
        assert got[w] == py_pieces(w, merges), (w, got[w], py_pieces(w, merges))


def test_replace_chain_rejects_self_pairs(spark):
    """Self-pairs are fundamentally inexpressible as a replace chain:
    replace() resumes after each replacement, so on 'aaaaaa' under
    (a,a) any chain yields 4 pieces where the fold gives 3 (r6 review
    finding — the original two-pass claim was wrong here). The SQL
    encoder must refuse rather than miscount while the oracle agrees."""
    import pytest

    with pytest.raises(ValueError, match="self-pair"):
        bpe.bpe_pieces_sql("word", [("a", "a")], duck=False)
    with pytest.raises(ValueError, match="self-pair"):
        bpe.bpe_pieces_sql("word", [("x", "y"), ("ab", "ab")], duck=True)


def test_fold_column_encoder_exact_for_any_merges(spark):
    """bpe_pieces_col (the Spark-only fold chain) must equal the Python
    reference for merge lists INCLUDING self-pairs — the encoder for
    raw learner output — on the counterexample words above all else."""
    merges = [("a", "a"), ("aa", "aa"), ("a", "b"), ("aa", "b"), ("c", "ab")]
    words = _fuzz_words(seed=11)
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["p"]
        for r in df.select(
            "word", bpe.bpe_pieces_col(F.col("word"), merges).alias("p")
        ).collect()
    }
    assert py_pieces("aaaaaa", [("a", "a")]) == 3  # the fold spec
    for w in words:
        assert got[w] == py_pieces(w, merges), (w, got[w], py_pieces(w, merges))


def test_sql_literal_escaping_quotes_and_backslashes(spark):
    """Learned merges can contain apostrophes (don't, it's) and
    backslashes; the generated literals must parse to the same strings
    on both engines (quote doubling everywhere, backslash doubling on
    Spark only — r6 review finding: unescaped quotes were SQL injection
    by construction)."""
    import duckdb

    merges = [("'", "s"), ("n", "'t"), ("\\", "x")]
    # The U+2028/U+2029/U+0085 words pin the (?s) DOTALL fix (r6 advice):
    # Java's '.' excludes all line terminators, RE2's only \n, and \s+
    # splitting leaves these chars inside words — without (?s) the
    # char-separator pass fuses them with their neighbor on Spark only.
    words = [
        "'s", "don't", "n't", "\\x", "a\\xb", "''s",
        "a\u2028b", "xn't\u0085", "\u2029's", "a\u0085b",
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["p"]
        for r in df.select(
            "word",
            F.expr(bpe.bpe_pieces_sql("word", merges, duck=False)).alias("p"),
        ).collect()
    }
    duck_sql = bpe.bpe_pieces_sql("word", merges, duck=True)
    con = duckdb.connect()
    dk = {
        r[0]: r[1]
        for r in con.sql(
            "SELECT word, " + duck_sql + " FROM (SELECT UNNEST(?) AS word)",
            params=[words],
        ).fetchall()
    }
    for w in words:
        assert got[w] == py_pieces(w, merges) == dk[w], (w, got[w], dk[w])


def test_sep_words_count_as_one_opaque_piece(spark):
    """A word containing the U+001F sentinel cannot be represented in
    the replace chain; the documented contract is 1 opaque piece (not
    silent mis-segmentation — r6 review finding), identically on both
    engines and in the fold encoder."""
    w = "x\x1fy"
    df = spark.createDataFrame([(1, f"plain {w}")], "doc_id long, text string")
    row = bpe.doc_bpe_token_counts(df).collect()[0]
    assert row["n_words"] == 2
    # 'plain' = 5 chars under FIXED_MERGES (in → 1 merge: p,l,a,in) = 4
    assert row["n_bpe_tokens"] == py_pieces("plain", bpe.FIXED_MERGES) + 1
    assert (
        df.select(bpe.bpe_pieces_col(F.lit(w), bpe.FIXED_MERGES).alias("p"))
        .collect()[0]["p"]
        == 1
    )


def test_doc_bpe_tokens_shape_and_reference(spark, sf_dir):
    out = {r["doc_id"]: r for r in bpe.doc_bpe_tokens(spark, sf_dir).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert set(out) == {
        i for i, t in docs.items() if [w for w in re.split(r"\s+", t) if w]
    }
    for i in list(out)[:50]:
        ws = [w for w in re.split(r"\s+", docs[i]) if w]
        assert out[i]["n_words"] == len(ws)
        assert out[i]["n_bpe_tokens"] == sum(
            py_pieces(w, bpe.FIXED_MERGES) for w in ws
        )


def test_encode_is_pure_codegen_no_python(spark, sf_dir):
    """The encode path must stay JVM-side: no ArrowEvalPython /
    BatchEvalPython anywhere in the plan."""
    plan = (
        bpe.doc_bpe_tokens(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan[:2000]


def test_pack_sequences_bpe_mode_budgets_in_bpe_pieces(spark):
    """pack_sequences(token_mode='bpe'): budget denominated in
    FIXED_MERGES pieces — 'the string' is 1+1=2 pieces (both fully
    merged) vs 9 whitespace-irrelevant chars; blank docs pack with 0."""
    from pyspark.sql import Row

    from cloudfront_kinesis_log_lambda_spark.pipelines.training_data import (
        pack_sequences,
    )

    assert py_pieces("the", bpe.FIXED_MERGES) == 1
    assert py_pieces("string", bpe.FIXED_MERGES) == 1
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the string") for i in range(6)]
        + [Row(doc_id=6, text="  ")]
    )
    packed = pack_sequences(
        docs, budget=4, n_groups=2, token_mode="bpe"
    ).collect()
    assert len(packed) == 7
    by_doc = {r["doc_id"]: r for r in packed}
    assert by_doc[6]["n_tokens"] == 0
    assert all(by_doc[i]["n_tokens"] == 2 for i in range(6))
    from collections import defaultdict

    seq_sum = defaultdict(int)
    for r in packed:
        seq_sum[(r["pack_group"], r["seq_id"])] += r["n_tokens"]
    assert all(s <= 4 for s in seq_sum.values())
