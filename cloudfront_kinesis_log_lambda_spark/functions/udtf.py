"""Python UDTF surface (SURVEY.md §2.5 'UDF/UDAF/UDTF': ABSENT in the
reference — the engine exposes Spark 3.5+ Python UDTFs).

``SplitSentences`` is the demonstration table function: one document row
→ N (sentence_idx, sentence) rows, invoked through SQL as a correlated
LATERAL table function. UDTFs are row-at-a-time Python — the slow path
by design (the deliberately simple split here IS expressible with
split+posexplode, which is what production code should use); the value
is the extension point for genuinely non-relational row expanders
(tokenizers, parsers, model inference) with the same plumbing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

CHUNK_TOKENS = 16

#: the oracle tokenizes with regexp_split_to_array(trim(text), '\s+')
#: (space-only trim; RE2 \s = [ \t\n\f\r]); Python str.split() instead
#: strips ALL whitespace and treats Unicode spaces (U+00A0 …) as
#: separators — a silent engine↔oracle divergence on any non-ASCII-space
#: whitespace. Pin the exact same rule here.
_WS = re.compile(r"[ \t\n\f\r]+")


# useArrow EXPLICIT: with useArrow=None the decorator resolves the
# Arrow choice at MODULE IMPORT time (no active session yet → plain
# row-at-a-time BatchEvalPythonUDTF is baked in permanently, whatever
# the session conf says later — found by tools/plan_audit.py, which
# imports this module before creating its session). The engine
# requires pandas+pyarrow anyway (every similarity/multimodal kernel),
# so force the Arrow exchange unconditionally.
@udtf(
    returnType="chunk_idx bigint, chunk string, n_tokens bigint",
    useArrow=True,
)
class ChunkTokens:
    """text → fixed-size token chunks (1-based index, chunk text, token
    count) — the context-window chunker of an LLM training pipeline."""

    def eval(self, text: str):  # noqa: ANN201 — UDTF contract
        if text is None:
            return
        t = text.strip(" ")  # space-only, like SQL trim()
        if t == "":
            return
        toks = _WS.split(t)
        for i in range(0, len(toks), CHUNK_TOKENS):
            chunk = toks[i : i + CHUNK_TOKENS]
            yield i // CHUNK_TOKENS + 1, " ".join(chunk), len(chunk)


def doc_chunks(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Explode documents into token chunks via the UDTF, LATERAL-joined
    in SQL exactly as a user would call it."""
    spark.udtf.register("chunk_tokens", ChunkTokens)
    docs.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM docs_for_udtf d, LATERAL chunk_tokens(d.text) c
        """
    )
