"""Deterministic WordPiece-style subword tokenizer (SURVEY.md §2.6 —
token accounting for training-data pipelines).

Every token-budget operator in the engine (pack_sequences, source
quotas, mixture sampling) counts WHITESPACE tokens; real pipelines
budget in SUBWORD tokens. This module supplies that unit with a fixed,
fully deterministic vocabulary so the count is machine-checkable: the
greedy longest-match scan is replayed exactly by a DuckDB recursive CTE
(functions/oracles.py::doc_subword_tokens — the doc_pack_sequences
recursion pattern), built from the SAME vocabulary literal via
:func:`vocab_values_sql`.

Semantics (standard WordPiece greedy matching):

- a word is scanned left to right; at each position the LONGEST
  vocabulary piece matching there is consumed (start pieces at position
  0, ``##``-continuation pieces after) — the match is unique because
  only one piece can equal a given substring;
- if no piece matches at some position, the ENTIRE word degrades to one
  ``[UNK]`` token (the all-or-nothing rule real WordPiece uses);
- words are lowercased first; empty strings are not words (split of a
  blank doc yields [''] — the house blank-doc guard).

100 TB shape: the Python kernel runs over DISTINCT words only — a
vocabulary-bounded frame, orders of magnitude smaller than the corpus —
as one map-only Arrow batch pass. The join back to per-document word
counts is on the word column; AQE downgrades it to broadcast whenever
the distinct-word side is small. Document text itself is never shuffled.
"""

from __future__ import annotations

import string
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: multi-char start-of-word pieces (common English function words +
#: prefixes); single letters/digits below guarantee near-total coverage
_START_MULTI: tuple[str, ...] = (
    "the", "and", "for", "with", "that", "this", "are", "was", "is",
    "in", "on", "of", "to", "it", "re", "un", "de", "pre", "over",
    "under", "qu",
)

#: multi-char continuation pieces (suffix morphology)
_CONT_MULTI: tuple[str, ...] = (
    "##ing", "##ed", "##er", "##est", "##ly", "##s", "##es", "##tion",
    "##ment", "##ness", "##able", "##al", "##ic", "##ous", "##ity",
    "##an", "##at", "##le", "##ue",
)

_CHARS: tuple[str, ...] = tuple(string.ascii_lowercase + string.digits)

#: the full fixed vocabulary — the single source of truth shared with
#: the DuckDB oracle (vocab_values_sql) and the pytest oracles
SUBWORD_VOCAB: tuple[str, ...] = tuple(
    dict.fromkeys(  # dedupe: '##s' appears in both suffix + single lists
        _START_MULTI + _CHARS + _CONT_MULTI + tuple("##" + c for c in _CHARS)
    )
)

# match bodies grouped by position class, longest first (greedy order);
# equal-length bodies can't both match one position, so the order within
# a length is irrelevant
_START_BODIES: tuple[str, ...] = tuple(
    sorted(
        (p for p in SUBWORD_VOCAB if not p.startswith("##")),
        key=len,
        reverse=True,
    )
)
_CONT_BODIES: tuple[str, ...] = tuple(
    sorted(
        (p[2:] for p in SUBWORD_VOCAB if p.startswith("##")),
        key=len,
        reverse=True,
    )
)


#: BERT's max_input_chars_per_word rule (their reference tokenizer uses
#: 100/200): a word longer than this is [UNK] without scanning. The cap
#: bounds worst-case work per word on BOTH sides — the r14 string-axis
#: sweep planted a single 10k-char token and the oracle's per-position
#: recursive CTE ground for 27 minutes where the capped rule answers
#: instantly (and matches what real WordPiece deployments emit).
MAX_WORD_CHARS = 100


def tokenize_word(word: str) -> tuple[int, bool]:
    """Greedy longest-match piece count for one lowercase word.

    Returns ``(n_pieces, is_unk)``; an unmatchable position collapses
    the whole word to ``(1, True)`` — the WordPiece [UNK] rule — and a
    word over MAX_WORD_CHARS is [UNK] without scanning (BERT's
    max_input_chars_per_word rule)."""
    if len(word) > MAX_WORD_CHARS:
        return 1, True
    pos, n = 0, 0
    while pos < len(word):
        for body in _CONT_BODIES if pos else _START_BODIES:
            if word.startswith(body, pos):
                pos += len(body)
                n += 1
                break
        else:
            return 1, True
    return n, False


def vocab_values_sql() -> str:
    """``('the'), ('and'), ...`` — the vocabulary as a SQL VALUES body,
    so the DuckDB oracle tokenizes with the SAME pieces by construction."""
    return ", ".join(f"('{p}')" for p in SUBWORD_VOCAB)


def word_piece_counts(words: DataFrame, word_col: str = "word") -> DataFrame:
    """``(word, n_pieces, is_unk)`` for each DISTINCT word in ``words``.

    The greedy scan is inherently iterative — no built-in composition
    expresses it — so it runs as a mapInPandas Arrow kernel, but ONLY
    over the deduplicated word frame (vocabulary-bounded, tiny next to
    the corpus). Map-only: no shuffle beyond the distinct itself."""
    distinct = words.select(F.col(word_col).alias("word")).distinct()

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            toks = [tokenize_word(w) for w in pdf["word"]]
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_pieces": [t[0] for t in toks],
                    "is_unk": [t[1] for t in toks],
                }
            )

    return distinct.mapInPandas(
        kernel, "word string, n_pieces long, is_unk boolean"
    )


def doc_subword_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document subword accounting: ``(doc_id, n_words,
    n_subword_tokens, n_unk_words)``.

    Plan: explode lowercased words → per-(doc, word) occurrence counts
    (one compact shuffle on small rows; text never leaves the scan
    stage) → join the distinct-word piece counts on ``word`` (AQE
    broadcasts the kernel side when small) → per-doc re-aggregate."""
    words = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
                "word"
            ),
        )
        # blank-doc guard: split('') yields [''] — not a word
        .filter(F.length("word") > 0)
    )
    wcount = words.groupBy("doc_id", "word").agg(F.count("*").alias("n"))
    pieces = word_piece_counts(wcount, "word")
    return (
        wcount.join(pieces, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_words"),
            F.sum(F.col("n") * F.col("n_pieces"))
            .cast("long")
            .alias("n_subword_tokens"),
            F.sum(F.when(F.col("is_unk"), F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_unk_words"),
        )
    )


def subword_token_count_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, n_tokens)`` in subword units — the drop-in token
    column for pack_sequences(token_mode='subword') and any other
    budget-keeping operator."""
    return doc_subword_tokens(docs, text_col).select(
        "doc_id", F.col("n_subword_tokens").alias("n_tokens")
    )
