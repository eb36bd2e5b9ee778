"""Text-analysis operators for training-data pipelines (SURVEY.md §2.6).

All JVM-side (built-in functions only — no Python in the hot path): at
100 TB the per-document cost is a few regexp/hash evaluations inside
WholeStageCodegen, embarrassingly parallel, no shuffle except the final
aggregate if one is requested.

Each operator has an exact ANSI-SQL twin in ``functions/oracles.py`` —
the heuristics are deliberately expressed in engine-portable primitives
(regexp counts, md5) so correctness is machine-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.util import ensure_parallelism

#: stopwords chosen from the corpus vocabulary (quality_score signal)
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "to", "and", "in")

#: BPE-ish word-piece pattern: alpha runs, digit runs, single punctuation
WORDPIECE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: language marker words (token-anchored); scores are regexp counts.
#: zh is detected by CJK codepoints instead of markers.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|is|was|that)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "es": r"\b(el|los|las|es|y|que)\b",
    "fr": r"\b(le|les|est|et|une|que)\b",
}
CJK_RE = r"[一-鿿]"


def _tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish word-piece count +
    character length, per document."""
    docs = ensure_parallelism(docs)
    t = F.col("text")
    # empty-token filter: split of a trimmed blank yields [''] — a
    # phantom token that would count blank docs as n_tokens=1 (the same
    # guard as corpus.n_tokens_col and dedup.has_min_tokens)
    return docs.select(
        "doc_id",
        F.size(F.filter(_tokens(t), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
        F.regexp_count(t, F.lit(WORDPIECE_RE)).cast("long").alias("n_wordpieces"),
        F.length(t).cast("long").alias("n_chars_measured"),
    )


def quality_score(
    docs: DataFrame,
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic document quality: length, mean token length, stopword
    ratio, punctuation density → composite [0,1] score.

    The score formula is arbitrary-but-fixed; its value is that it is
    *deterministic and portable*, so downstream filtering (``score >= τ``)
    is reproducible across engines. ``passthrough`` names input columns
    to carry into the output — this is a pure projection, so callers
    that need score + original columns should pass them through instead
    of joining the output back against the input (which would plan the
    whole upstream lineage twice).
    """
    docs = ensure_parallelism(docs)
    t = F.col(text_col)
    # blank-safe token count (see token_stats): blank docs score at the
    # degenerate floor instead of over a phantom '' token
    n_tok = F.size(F.filter(_tokens(t), lambda x: x != "")).cast("double")
    n_chars = F.length(t).cast("double")
    n_stop = F.regexp_count(
        F.lower(t), F.lit(r"\b(" + "|".join(STOPWORDS) + r")\b")
    ).cast("double")
    n_punct = F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]")).cast("double")
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_term
        + F.lit(0.3) * F.least(stop_ratio * 4.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0)))
    )
    return docs.select(
        "doc_id",
        *passthrough,
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """n-gram-marker language ID heuristic.

    Counts language-marker tokens per language; CJK codepoints short-
    circuit to ``zh``; argmax with a fixed tie-break order; all-zero →
    ``und``. (On this synthetic corpus most docs classify ``en`` — the
    operator's value is its deterministic, SQL-checkable contract, the
    marker lists are swappable for real fastText-style models via the
    pandas-UDF hook in multimodal.py.)
    """
    docs = ensure_parallelism(docs)
    low = F.lower(F.col("text"))
    scores = {k: F.regexp_count(low, F.lit(v)) for k, v in LANG_MARKERS.items()}
    has_cjk = F.regexp_count(F.col("text"), F.lit(CJK_RE)) > 0
    best = F.greatest(*scores.values())
    pred = (
        F.when(has_cjk, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(scores["en"] == best, F.lit("en"))
        .when(scores["de"] == best, F.lit("de"))
        .when(scores["es"] == best, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        *[scores[k].cast("long").alias(f"score_{k}") for k in LANG_MARKERS],
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — the exact-dedup key that survives cosmetic reformatting.

    Order matters: collapse whitespace FIRST, then trim. ``trim`` (both
    engines) strips SPACES only, so the old trim-first spelling let a
    leading/trailing tab survive collapse as an edge space — 'X' and
    'X\\t' fingerprinted differently, defeating the operator's whole
    purpose (found by the hypothesis normalization replay). Collapsing
    first turns every edge-whitespace run into a space trim does
    remove."""
    docs = ensure_parallelism(docs)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(F.encode(norm, "UTF-8")).alias("fp"),
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact deduplication by normalized-text fingerprint: one
    representative (min doc_id) per distinct content + multiplicity.
    Hash-groupBy: one shuffle on the 128-bit key, no skew (md5 uniform)."""
    fp = fingerprint(docs)
    return fp.groupBy("fp").agg(
        F.min("doc_id").alias("representative"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Smoothed TF-IDF with per-document top-k terms, as pure DataFrame
    math (tf and df are exact counts, idf = ln((N+1)/(df+1)) + 1) — no
    feature hashing, so every score is exactly reproducible in SQL.

    Scale shape: the document-frequency table is VOCABULARY-sized, tiny
    next to the (doc, term) tf table, so Catalyst broadcasts it (and the
    1-row corpus count) — the only shuffles are the tf aggregate and the
    per-doc top-k window, both partitioned by doc-side keys that can't
    skew the way hot terms can. Ties rank deterministically (score desc,
    term asc): equal (tf, df) pairs produce bit-identical doubles.
    """
    docs = ensure_parallelism(docs)
    toks = (
        docs.select(
            "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
        )
        .filter(F.col("term") != "")
        # consumed by BOTH the tf and df aggregates (and docs is scanned
        # a third time for n_docs): checkpoint so the scan+explode runs
        # once — the near_dup_pairs_exact pattern
        .localCheckpoint(eager=True)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    score = F.col("tf") * (
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
        + F.lit(1.0)
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("_score"), F.asc("term"))
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("_score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round("_score", 4).alias("tfidf"),
            "rn",
        )
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Repetition/boilerplate quality signals per document (the
    Gopher-rules tier of an LLM data pipeline):

    - ``distinct_token_ratio`` — |distinct tokens| / |tokens| (low =
      repetitive)
    - ``dup_2gram_frac`` — fraction of word bigrams that are repeats
    - ``top_token_frac`` — frequency share of the single most common
      token (high = degenerate/boilerplate)

    Array-local signals (distinct ratios) are per-row higher-order
    expressions — zero shuffle; the top-token share needs per-token
    counts, done with explode + two map-side-combined aggregates (the
    shuffle carries one row per (doc, distinct token), then one per
    doc). Docs with <2 tokens are excluded via the pushdown-safe
    predicate (a 1-token doc has no bigrams; ratios degenerate).
    """
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import has_min_tokens

    base = ensure_parallelism(docs.filter(has_min_tokens("text", 2))).select(
        "doc_id", _tokens(F.col("text")).alias("w")
    )
    w = F.col("w")
    grams2 = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: F.concat_ws(" ", F.element_at(w, i + 1), F.element_at(w, i + 2)),
    )
    arr_stats = base.select(
        "doc_id",
        F.round(F.size(F.array_distinct(w)) / F.size(w), 4).alias(
            "distinct_token_ratio"
        ),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(grams2)) / F.size(grams2), 4
        ).alias("dup_2gram_frac"),
    )
    tok_counts = (
        base.select("doc_id", F.explode(w).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = tok_counts.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 4).alias("top_token_frac")
    )
    return arr_stats.join(top, "doc_id")


def table_profile(
    docs: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """Column profile — the corpus-QA pass a curation pipeline runs
    before anything else: per column, row/null/distinct counts and
    min/max (stringified so heterogeneous columns stack into one
    result). One row per profiled column.

    Scale shape: ALL columns profile in ONE scan producing ONE row that
    unpivots driver-free via ``stack``. Honest cost note: with exact
    ``countDistinct`` over k different columns, Catalyst's
    RewriteDistinctAggregates plans an Expand that multiplies aggregate
    input ~(k+1)× (still one scan, but not one-row-per-input through
    the aggregate). At 100 TB pass ``approx=True``: HyperLogLog++
    ``approx_count_distinct`` IS a partial-aggregable sketch, no Expand,
    true single-pass cost — the exact mode exists for oracle-checkable
    gates and modest tables. The stringified min/max keeps the output
    schema fixed regardless of column types (and the oracle hash
    comparable; avoid float columns here — engines render doubles
    differently).
    """
    docs = ensure_parallelism(docs)
    distinct = F.approx_count_distinct if approx else F.countDistinct
    aggs = []
    for i, c in enumerate(cols):
        # POSITIONAL aliases: the input name appears only as an escaped
        # string literal — a column like `fle-status` (this repo's raw
        # schema!) or one containing a quote would otherwise parse as
        # arithmetic / break the literal inside the stack() expression
        aggs += [
            F.count(F.lit(1)).alias(f"_c{i}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"_c{i}__nulls"),
            distinct(c).alias(f"_c{i}__distinct"),
            # aggregate in the column's OWN type, stringify after —
            # casting first would turn numeric min/max lexicographic
            F.min(F.col(c)).cast("string").alias(f"_c{i}__min"),
            F.max(F.col(c)).cast("string").alias(f"_c{i}__max"),
        ]
    one = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _c{i}__n, _c{i}__nulls, _c{i}__distinct, "
        f"_c{i}__min, _c{i}__max"
        for i, c in enumerate(
            c.replace("\\", "\\\\").replace("'", "\\'") for c in cols
        )
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """Benchmark-contamination check: per-document fraction of distinct
    word n-grams that also appear anywhere in a held-out benchmark set
    (the decontamination gate an LLM training pipeline runs before a
    corpus ships — see e.g. the GPT-3/PaLM appendix n-gram overlap
    procedures).

    Returns (doc_id, n_grams, n_contaminated, contamination,
    is_contaminated) for every corpus document with at least ``n``
    tokens; ``is_contaminated`` is an int flag (``contamination >=
    threshold``) so the result stays hash-comparable across engines.

    Scale shape: the benchmark gram set is tiny next to the corpus
    (benchmarks are a fixed few MB; the corpus is the 100 TB side), so it
    is BROADCAST — the corpus side stays map-only: explode grams, probe
    the broadcast set, re-aggregate per doc_id (one shuffle, keyed by
    doc_id so boilerplate grams can't skew it). Grams join as strings
    by default for oracle parity; ``hash_grams=True`` is the production
    mode — both sides collapse to ``xxhash64`` int64s BEFORE the join,
    shrinking the broadcast and the probe ~10× with a 2⁻⁶⁴-per-pair
    false-positive rate (equality semantics pinned against string mode
    in tests).
    """
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import shingles

    corpus_grams = shingles(corpus, n, text_col)
    bench_grams = (
        shingles(benchmark, n, text_col).select("shingle").distinct()
    )
    if hash_grams:
        corpus_grams = corpus_grams.select(
            "doc_id", F.xxhash64("shingle").alias("shingle")
        )
        bench_grams = bench_grams.select(F.xxhash64("shingle").alias("shingle"))
    hit = corpus_grams.join(
        F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "shingle", "left"
    )
    frac = F.col("n_contaminated") / F.col("n_grams")
    return (
        hit.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            F.round(frac, 4).alias("contamination"),
            (frac >= threshold).cast("int").alias("is_contaminated"),
        )
    )


#: PII patterns chosen for regex-dialect parity: plain character classes
#: + bounded quantifiers only, identical semantics in Java regex (Spark)
#: and RE2 (DuckDB oracle)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """PII redaction for training corpora: replace email/phone spans with
    typed placeholder tokens and count what was removed.

    Emails are scrubbed first, then phones on the already-scrubbed text
    (a digit-bearing email local-part can't be double-counted as a
    phone). Pure regexp_replace/extract_all projections — codegen'd,
    zero shuffle, scan-parallel at any scale. ``passthrough`` carries
    input columns into the output so callers never join this projection
    back against its own input.
    """
    t = F.col(text_col)
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    return docs.select(
        "doc_id",
        *passthrough,
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(after_email, PII_PHONE, "<PHONE>").alias("scrubbed"),
    )
