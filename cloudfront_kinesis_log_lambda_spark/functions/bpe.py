"""Byte-pair-encoding vocabulary LEARNING and encoding, Spark-first.

``functions/subword.py`` counts tokens under a FIXED WordPiece
vocabulary; real pipelines also need the step that produces such a
vocabulary — BPE merge learning (Sennrich et al. 2016,
arXiv:1508.07909) over the corpus. This module implements both halves
with one shared, exactly-specified merge semantics:

**Merge semantics (one rank):** replace adjacent symbol pairs
``(a, b) → ab`` left-to-right, non-overlapping, in a single pass
("aaa" under (a,a) → ["aa","a"]). Deterministic by construction; ties
in the learner break on (count DESC, left ASC, right ASC).

**Learning** (:func:`learn_bpe_merges`) is the distributed iteration:

  distinct (word, count) — vocab-bounded, the corpus text is touched
  exactly once — → per-word symbol arrays (chars) → per iteration:
    adjacent-pair explode → groupBy pair → SUM(count) → global argmax
    (a 1-row driver collect — the only driver-side data, by design)
    → apply the merge to every symbol array (a JVM-side ``aggregate``
    HOF fold — no Python in the loop) → localCheckpoint (flat lineage)

100 TB shape: every iteration aggregates the *type* table (distinct
words), not the corpus — at web scale that is ~10⁸ rows of a few
symbols each, a routine shuffle, and the merge application is map-only
codegen. The per-iteration argmax is 1 row. What does NOT scale is a
driver-side dictionary of the corpus — exactly what this avoids.

**Encoding** has two implementations with one spec:

- :func:`bpe_pieces_sql` applies a FIXED merge list with a two-pass
  sentinel-delimited ``replace`` chain, fully JVM-side AND replayable
  verbatim in DuckDB (what makes ``doc_bpe_tokens``
  exact-hash-checkable):

    '␟a␟b␟' → '␟ab␟' over  '␟' + join(symbols, '␟') + '␟'

  A single ``replace`` pass misses every second occurrence in a chain
  (consecutive matches share their boundary sentinel, and replace
  resumes AFTER the replacement), so each rank applies the replace
  TWICE: for a ≠ b, pass 1 takes the odd occurrences of any chain,
  which isolates the evens for pass 2 (test_bpe fuzzes the
  equivalence against a pure-Python reference). For SELF-pairs
  (a == b) no pass count suffices — on 'aaaaaa' the resume-after-
  replacement scan pairs (0,1),(3,4) leaving non-adjacent singles, 4
  pieces where the fold gives 3 (r6 review finding) — so self-pair
  merge lists are rejected with ValueError.
- :func:`bpe_pieces_col` chains the same ``aggregate`` fold the
  learner uses — exact for ANY merge list including self-pairs, but
  Spark-only (no DuckDB twin). Use it to encode raw learner output.

The pinned :data:`FIXED_MERGES` used by the hash-green encode query is
the learner's own output on :data:`SYNTH_CORPUS` — test_bpe asserts
``learn_bpe_merges(SYNTH_CORPUS) == FIXED_MERGES``, so the literal
cannot drift from the learner.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.relational import load

# Sentinel between symbols in the encode representation: U+001F (unit
# separator), absent from natural text. Words containing it are
# excluded from encoding (counted as 1 piece) rather than silently
# mis-segmented.
SEP = "\x1f"


def _merge_pair_expr(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping single-pass merge of (a, b) → ab
    over an array<string> of symbols, as a JVM-side aggregate fold.

    Accumulator: (acc: merged prefix, prev: symbol held back pending a
    possible merge with the next one, has: whether prev is held).
    After a merge the new token is NOT held (it can never equal ``a``
    — that would need ``b`` empty), which is what makes the pass
    non-overlapping.
    """
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit("").alias("prev"),
        F.lit(False).alias("has"),
    )

    def step(st: Column, x: Column) -> Column:
        flush = F.when(
            st["has"], F.concat(st["acc"], F.array(st["prev"]))
        ).otherwise(st["acc"])
        return F.when(
            st["has"] & (st["prev"] == a) & (x == b),
            F.struct(
                F.concat(st["acc"], F.array(F.lit(merged))).alias("acc"),
                F.lit("").alias("prev"),
                F.lit(False).alias("has"),
            ),
        ).otherwise(
            F.struct(flush.alias("acc"), x.alias("prev"), F.lit(True).alias("has"))
        )

    return F.aggregate(
        syms,
        init,
        step,
        lambda st: F.when(
            st["has"], F.concat(st["acc"], F.array(st["prev"]))
        ).otherwise(st["acc"]),
    )


_CHARS = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 24,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Learn the top-``n_merges`` BPE merges from a document corpus.

    Returns (rank, left, right, merged, pair_count) in learning order.
    Stops early when no adjacent pair reaches ``min_pair_count``.
    """
    spark = docs.sparkSession
    wc = (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter((F.col("word") != "") & ~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # the corpus is read once; everything after iterates on the compact
    # type table. localCheckpoint (never cache — house rule) both
    # materializes and keeps each iteration's lineage flat.
    cur = wc.select("n", F.expr(_CHARS).alias("syms")).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pairs = cur.select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(
                F.col("c").desc(), F.col("p.a").asc(), F.col("p.b").asc()
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_pair_count:
            break
        a, b, c = top[0]["p"]["a"], top[0]["p"]["b"], int(top[0]["c"])
        merges.append((rank, a, b, a + b, c))
        cur = cur.select(
            "n", _merge_pair_expr(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string, pair_count bigint",
    )


# --- fixed merge table for the oracle-checked encode query ---------------
# SYNTH_CORPUS is a tiny deterministic corpus with heavy bigram
# structure; FIXED_MERGES is EXACTLY learn_bpe_merges(SYNTH_CORPUS,
# n_merges=12) — pinned in test_bpe so the literal cannot drift.
SYNTH_CORPUS = [
    "the then there these theme",
    "ing sing ring bring string",
    "er her here mother other",
    "the there other thing string",
    "in inside string bring thing",
]
FIXED_MERGES: list[tuple[str, str]] = [
    ("h", "e"),
    ("i", "n"),
    ("in", "g"),
    ("t", "he"),
    ("r", "ing"),
    ("the", "r"),
    ("o", "ther"),
    ("s", "t"),
    ("st", "ring"),
    ("b", "ring"),
    ("h", "ing"),
    ("he", "r"),
]


def _sepped_sql(word_sql: str, *, duck: bool) -> str:
    # '(?s)(.)' → '<c><SEP>' after every char, then add the leading SEP.
    # Engine forks: backreference spelling (RE2 '\1' vs Java '$1') and
    # DuckDB's regexp_replace being FIRST-match-only without the 'g'
    # flag (Spark's is global and takes no flag argument).
    # (?s) because the engines disagree on what '.' excludes: Java drops
    # all line terminators (U+2028/U+2029/U+0085), RE2 only \n — and \s+
    # splitting leaves U+2028/U+0085 INSIDE words, so without DOTALL a
    # word containing them seps differently per engine.
    backref, flags = (r"\1", ", 'g'") if duck else ("$1", "")
    return (
        f"('{SEP}' || regexp_replace({word_sql}, '(?s)(.)', "
        f"'{backref}{SEP}'{flags}))"
    )


def _sql_str(s: str, *, duck: bool) -> str:
    """A string literal both engines parse to exactly ``s``: quotes
    double on both; Spark's parser additionally treats backslash as an
    escape (DuckDB doesn't), so it doubles only there."""
    s = s.replace("'", "''")
    if not duck:
        s = s.replace("\\", "\\\\")
    return f"'{s}'"


def bpe_pieces_sql(word_sql: str, merges: list[tuple[str, str]], *, duck: bool) -> str:
    """Number of BPE pieces of ``word_sql`` under the given merge list,
    as SQL that runs on Spark and DuckDB — the parity trick behind the
    hash-green ``doc_bpe_tokens``. Builds '␟'+chars+'␟', then per rank
    applies the boundary-anchored replace twice (see module docstring
    for why two passes equal the fold semantics for a ≠ b). ``duck``
    picks the regex backreference spelling, global-flag convention (see
    ``_sepped_sql``) and literal escaping — the only non-portable
    characters; every replace() in the chain is otherwise identical
    text on both engines.

    SELF-PAIR merges (a == b) are REJECTED: replace() resumes scanning
    AFTER each replacement, so on a run of 2k ≥ 6 identical symbols the
    two-pass chain merges pairs (0,1),(3,4),… leaving non-adjacent
    singles no pass count can fix — 'aaaaaa' under (a,a) is 3 pieces by
    the fold but 4 by any replace chain (r6 review finding; the
    original equivalence claim was wrong for this case). Encode merge
    lists containing self-pairs with :func:`bpe_pieces_col`, which
    implements the fold exactly but is Spark-only."""
    for a, b in merges:
        if a == b:
            raise ValueError(
                f"self-pair merge ({a!r},{b!r}) is not expressible as a "
                "replace chain — use bpe_pieces_col for such merge lists"
            )
    s = _sepped_sql(word_sql, duck=duck)
    for a, b in merges:
        pat = _sql_str(f"{SEP}{a}{SEP}{b}{SEP}", duck=duck)
        rep = _sql_str(f"{SEP}{a}{b}{SEP}", duck=duck)
        s = f"replace({s}, {pat}, {rep})"
        s = f"replace({s}, {pat}, {rep})"
    # leading + trailing separators → segments = splits - 2; a word
    # containing the sentinel cannot be represented — count it as one
    # opaque piece instead of silently mis-segmenting (instr() spells
    # identically on both engines)
    if duck:
        n = f"(len(string_split({s}, '{SEP}')) - 2)"
    else:
        n = f"(size(split({s}, '{SEP}')) - 2)"
    return f"(CASE WHEN instr({word_sql}, '{SEP}') > 0 THEN 1 ELSE {n} END)"


def bpe_pieces_col(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Piece count as a JVM-side fold chain — exact single-pass-per-
    rank semantics for ANY merge list, self-pairs included (the encoder
    to use on learner output, which can legitimately contain them).
    Not DuckDB-replayable — oracle-checked paths use
    :func:`bpe_pieces_sql` with self-pair-free merge tables."""
    syms = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, 1),
    )
    for a, b in merges:
        syms = _merge_pair_expr(syms, a, b)
    # length-0 guard first: sequence(1, 0) runs DOWNWARD in Spark, so
    # an empty word would otherwise get two phantom symbols
    return (
        F.when(F.length(word) == 0, F.lit(0))
        .when(F.instr(word, SEP) > 0, F.lit(1))
        .otherwise(F.size(syms))
    )


def doc_bpe_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens) for any docs DataFrame — the
    core behind :func:`doc_bpe_tokens` and
    ``pack_sequences(token_mode='bpe')``. Docs with no words (blank
    text) are absent, matching the word-level aggregate shape callers
    0-fill against."""
    words = docs.select(
        "doc_id", F.explode(F.split(text_col, r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    wcount = words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("n")
    )
    dwords = wcount.select("word").distinct()
    pieces = dwords.select(
        "word",
        F.expr(bpe_pieces_sql("word", FIXED_MERGES, duck=False))
        .cast("long")
        .alias("n_pieces"),
    )
    return (
        wcount.join(pieces, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_words"),
            F.sum(F.col("n") * F.col("n_pieces"))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    )


def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token counts under :data:`FIXED_MERGES`.

    Same scale shape as ``doc_subword_tokens``: the encode chain runs
    over DISTINCT words only (vocabulary-bounded, map-only, pure
    whole-stage codegen — no Python anywhere), per-doc counts
    re-aggregate compact (doc_id, word, n) rows; document text never
    shuffles. Exact-hash-checked against the DuckDB replay of the same
    replace chain."""
    return doc_bpe_token_counts(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )


def bpe_token_count_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, n_tokens)`` in BPE units — the drop-in token column
    for pack_sequences(token_mode='bpe'), mirroring
    subword_token_count_df."""
    return doc_bpe_token_counts(docs, text_col).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )


def bpe_learn_merges_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: learn 24 merges from the documents corpus.

    Rows-only by necessity — each learning round is a global argmax
    over re-aggregated pair counts, which a recursive CTE cannot
    express (no aggregation over the recursive term). The exact
    contract lives in test_bpe: a pure-Python BPE reference replays
    learning on the same corpus and must match row-for-row."""
    return learn_bpe_merges(
        load(spark, sf_dir, "documents"), n_merges=24
    )
