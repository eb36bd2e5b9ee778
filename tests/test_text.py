"""Text-analysis operators vs independent pure-Python expectations."""

from __future__ import annotations

import hashlib
import re

import pytest

from cloudfront_kinesis_log_lambda_spark.operators import relational as R
from cloudfront_kinesis_log_lambda_spark.operators.text import (
    STOPWORDS,
    exact_dedup,
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return R.load(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def docs_py(docs):
    return {r["doc_id"]: r["text"] for r in docs.collect()}


def test_token_stats_match_python(docs, docs_py):
    got = {r["doc_id"]: r for r in token_stats(docs).collect()}
    for doc_id, text in list(docs_py.items())[:50]:
        r = got[doc_id]
        assert r["n_tokens"] == len(text.strip().split())
        assert r["n_wordpieces"] == len(
            re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", text)
        )
        assert r["n_chars_measured"] == len(text)


def test_quality_score_bounds_and_stopword_ratio(docs, docs_py):
    got = {r["doc_id"]: r for r in quality_score(docs).collect()}
    stop_re = re.compile(r"\b(" + "|".join(STOPWORDS) + r")\b")
    for doc_id, text in list(docs_py.items())[:50]:
        r = got[doc_id]
        assert 0.0 <= r["quality"] <= 1.0
        n_tok = len(text.strip().split())
        expected_ratio = len(stop_re.findall(text.lower())) / n_tok if n_tok else 0.0
        assert r["stopword_ratio"] == pytest.approx(round(expected_ratio, 4))


def test_lang_id_deterministic_and_known_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is here"),
            (2, "der hund und die katze ist nicht da"),
            (3, "el perro y las casas es que"),
            (4, "le chat est une merveille et les chiens"),
            (5, "这 是 中文 文本"),
            (6, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "zh", 6: "und"}


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "  hello\tworld "), (4, "other")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fp"] for r in fingerprint(df).collect()}
    assert fp[1] == fp[2] == fp[3] != fp[4]
    assert fp[2] == hashlib.md5(b"hello world").hexdigest()
    dd = exact_dedup(df).collect()
    by_fp = {r["fp"]: (r["representative"], r["n_copies"]) for r in dd}
    assert by_fp[fp[1]] == (1, 3)
    assert by_fp[fp[4]] == (4, 1)


def test_repetition_signals(spark):
    from cloudfront_kinesis_log_lambda_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # fully repetitive
            (2, "all tokens here are unique"),   # no repetition
            (3, "one"),                          # <2 tokens: excluded
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["distinct_token_ratio"] == 0.25
    assert got[1]["dup_2gram_frac"] == round(1 - 1 / 3, 4)
    assert got[1]["top_token_frac"] == 1.0
    assert got[2]["distinct_token_ratio"] == 1.0
    assert got[2]["dup_2gram_frac"] == 0.0
    assert got[2]["top_token_frac"] == 0.2


def test_pii_scrub_redacts_emails_then_phones(spark):
    from cloudfront_kinesis_log_lambda_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.com today"),
            (2, "call +1 (555) 123-4567 or 555.222.3333"),
            (3, "a@b.io and 555-123-4567 both"),
            (4, "clean text, no pii at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["scrubbed"] == "mail <EMAIL> today"
    assert got[2]["n_phones"] == 2
    assert got[2]["scrubbed"] == "call <PHONE> or <PHONE>"
    assert (got[3]["n_emails"], got[3]["n_phones"]) == (1, 1)
    assert got[3]["scrubbed"] == "<EMAIL> and <PHONE> both"
    assert got[4]["scrubbed"] == "clean text, no pii at all"
    assert got[4]["n_emails"] == 0 and got[4]["n_phones"] == 0


def test_contamination_flags_planted_overlap(spark):
    """A corpus doc sharing a contiguous half with a benchmark doc gets
    a high contaminated-gram fraction and the flag; an unrelated doc
    gets zero."""
    from cloudfront_kinesis_log_lambda_spark.operators.text import contamination

    bench_words = [f"b{i}" for i in range(40)]
    clean_words = [f"c{i}" for i in range(40)]
    leaky = bench_words[:20] + [f"x{i}" for i in range(20)]
    mk = lambda i, ws: (i, " ".join(ws), "en", "s", 0)  # noqa: E731
    corpus = spark.createDataFrame(
        [mk(1, leaky), mk(2, clean_words)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    bench = spark.createDataFrame(
        [mk(100, bench_words)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r for r in contamination(corpus, bench, n=3).collect()}
    # leaky doc: grams fully inside the copied half are contaminated =
    # 18 of its 38 distinct 3-grams
    assert out[1]["n_grams"] == 38 and out[1]["n_contaminated"] == 18
    assert abs(out[1]["contamination"] - round(18 / 38, 4)) < 1e-9
    assert out[1]["is_contaminated"] == 1
    assert out[2]["n_contaminated"] == 0 and out[2]["is_contaminated"] == 0


def test_table_profile_counts_nulls_and_numeric_minmax(spark):
    """Profile stats: nulls counted per column, min/max aggregate in the
    column's own type (numeric 99 < 100 — not lexicographic) and
    stringify at the edge; one row per profiled column."""
    from cloudfront_kinesis_log_lambda_spark.operators.text import table_profile

    df = spark.createDataFrame(
        [(99, "b", None), (100, "a", "x"), (7, None, "x")],
        "doc_id long, text string, lang string",
    )
    out = {r["column"]: r for r in table_profile(df, ["doc_id", "text", "lang"]).collect()}
    assert set(out) == {"doc_id", "text", "lang"}
    assert out["doc_id"]["min_value"] == "7" and out["doc_id"]["max_value"] == "100"
    assert out["doc_id"]["n_nulls"] == 0 and out["doc_id"]["n_distinct"] == 3
    assert out["text"]["n_nulls"] == 1 and out["text"]["n_distinct"] == 2
    assert out["lang"]["n_nulls"] == 1 and out["lang"]["n_distinct"] == 1
    assert all(r["n_rows"] == 3 for r in out.values())


def test_contamination_hashed_mode_matches_string_mode(spark):
    """hash_grams=True (the production int64-probe mode) must produce
    the identical result table as the oracle-parity string mode."""
    from cloudfront_kinesis_log_lambda_spark.operators import relational as RR
    from cloudfront_kinesis_log_lambda_spark.operators.text import contamination
    from pyspark.sql import functions as F

    docs = RR.load(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    bench = docs.filter(F.col("doc_id") % 10 == 7)
    s = sorted(map(tuple, contamination(corpus, bench).collect()))
    h = sorted(map(tuple, contamination(corpus, bench, hash_grams=True).collect()))
    assert s == h and len(s) > 0
