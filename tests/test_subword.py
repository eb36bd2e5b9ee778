"""functions/subword.py — deterministic WordPiece subword accounting
(SURVEY.md §2.6 token counting; the oracle twin replays the greedy scan
as a DuckDB recursive CTE over the same vocabulary literal)."""

from __future__ import annotations

from pyspark.sql import Row

from cloudfront_kinesis_log_lambda_spark.functions.subword import (
    SUBWORD_VOCAB,
    doc_subword_tokens,
    tokenize_word,
    word_piece_counts,
)
from cloudfront_kinesis_log_lambda_spark.pipelines.training_data import (
    pack_sequences,
)


def test_tokenize_word_greedy_longest_match():
    # "the" is a whole start piece — greedy takes it over 't'+'##h'+'##e'
    assert tokenize_word("the") == (1, False)
    # "table" = 't' + '##able' (longest continuation wins over '##a')
    assert tokenize_word("table") == (2, False)
    # "preing" = 'pre' + '##ing'
    assert tokenize_word("preing") == (2, False)
    # digits tokenize char-by-char: '4' + '##2'
    assert tokenize_word("42") == (2, False)


def test_tokenize_word_unk_is_all_or_nothing():
    # 'é' matches no piece anywhere → the WHOLE word is one [UNK],
    # not 'caf'-pieces + failure
    assert tokenize_word("café") == (1, True)
    assert tokenize_word("|") == (1, True)


def test_vocab_has_no_duplicate_pieces():
    assert len(SUBWORD_VOCAB) == len(set(SUBWORD_VOCAB))


def test_word_piece_counts_runs_over_distinct_words(spark):
    words = spark.createDataFrame(
        [Row(word=w) for w in ["the", "the", "table", "the"]]
    )
    out = word_piece_counts(words).collect()
    assert len(out) == 2  # deduped before the kernel
    got = {r["word"]: (r["n_pieces"], r["is_unk"]) for r in out}
    assert got == {"the": (1, False), "table": (2, False)}


def test_doc_subword_tokens_counts_and_unks(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the the table"),  # 1+1+2 pieces
            Row(doc_id=2, text="  café the "),  # UNK(1) + 1
            Row(doc_id=3, text="   "),  # blank: no words → no row
        ]
    )
    rows = {r["doc_id"]: r for r in doc_subword_tokens(docs).collect()}
    assert set(rows) == {1, 2}  # the blank doc has no word rows at all
    assert rows[1]["n_words"] == 3
    assert rows[1]["n_subword_tokens"] == 4
    assert rows[1]["n_unk_words"] == 0
    assert rows[2]["n_words"] == 2
    assert rows[2]["n_subword_tokens"] == 2
    assert rows[2]["n_unk_words"] == 1


def test_pack_sequences_subword_mode_budgets_in_pieces(spark):
    # 10 copies of a 4-piece doc ("the the table" = 1+1+2) with budget 8
    # → 2 docs per sequence in each pack group; blank doc packs with 0
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the the table") for i in range(10)]
        + [Row(doc_id=10, text="")]
    )
    packed = pack_sequences(
        docs, budget=8, n_groups=2, token_mode="subword"
    ).collect()
    assert len(packed) == 11  # every doc packed exactly once, blank too
    by_doc = {r["doc_id"]: r for r in packed}
    assert by_doc[10]["n_tokens"] == 0
    assert all(by_doc[i]["n_tokens"] == 4 for i in range(10))
    # sequence budget respected in SUBWORD units
    from collections import defaultdict

    seq_sum = defaultdict(int)
    for r in packed:
        seq_sum[(r["pack_group"], r["seq_id"])] += r["n_tokens"]
    assert all(s <= 8 for s in seq_sum.values())


def test_pack_sequences_rejects_unknown_token_mode(spark):
    import pytest

    docs = spark.createDataFrame([Row(doc_id=1, text="the")])
    with pytest.raises(ValueError, match="token_mode"):
        pack_sequences(docs, token_mode="bytes")


def test_pack_sequences_blank_doc_counts_zero_in_both_modes(spark):
    """The blank-doc guard holds in BOTH token units (r6 review finding:
    whitespace mode used the unguarded split, charging blanks 1 phantom
    token while subword charged 0 — the two modes disagreed on the same
    degenerate input)."""
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="the table"), Row(doc_id=2, text="   ")]
    )
    for mode in ("whitespace", "subword"):
        packed = {
            r["doc_id"]: r["n_tokens"]
            for r in pack_sequences(docs, token_mode=mode).collect()
        }
        assert packed[2] == 0, mode
