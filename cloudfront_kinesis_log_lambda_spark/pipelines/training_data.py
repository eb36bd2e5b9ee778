"""End-to-end training-data curation: the operators composed as the
pipeline a user would actually run over a raw document corpus.

The individual operators (operators/text.py, operators/dedup.py) are
each verified in isolation by the driver gate; this module is the
COMPOSITION story — one lazy DataFrame flow from raw documents to a
curated, deduplicated, PII-scrubbed corpus with per-stage accounting:

  raw documents
    → annotate: token stats + quality score + language ID  (1 projection)
    → quality gate: score ≥ min_quality                     (filter)
    → exact dedup: md5 fingerprint, keep lowest doc_id      (1 shuffle)
    → near dedup: MinHash-LSH clusters, keep canonical      (LSH path)
    → PII scrub: typed placeholder redaction                (projection)

Everything stays one lazy plan per output: Catalyst fuses the
projections, pushes the quality filter below the dedup shuffles, and the
near-dup stage reuses the capped-bucket LSH plan — running the pipeline
costs the same as running its most expensive stage, not the sum of five
scans. At 100 TB each stage's non-filter output is written partitioned
(the caller picks where); nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import dedup as D
from cloudfront_kinesis_log_lambda_spark.operators import text as T

# Shared by split_assign and pack_sequences — and hard-coded in their
# DuckDB oracles (functions/oracles.py), so each expression must exist
# exactly ONCE engine-side or the copies drift apart from the oracles.


def _knuth_bucket(mod: int):
    """Knuth multiplicative-hash bucket of doc_id: the multiply runs in
    DECIMAL(38,0) (the oracle's in HUGEINT) so it is exact for ANY
    int64 doc_id — a plain BIGINT multiply would wrap (or, under ANSI
    mode, error) once doc_id exceeds 2⁶³/2654435761 ≈ 3.47e9, which a
    training-scale corpus reaches. The inner mod is normalized positive
    (SQL % keeps the dividend's sign, so a negative doc_id would
    otherwise yield a negative bucket — collapsing every negative-id
    document into the first split). Engine-portable, exactly
    oracle-checkable."""
    m = F.lit(4294967296)
    prod = F.col("doc_id").cast("decimal(20,0)") * F.lit(2654435761)
    return ((prod % m + m) % m) % F.lit(mod)


def _n_tokens(text_col: str):
    """Whitespace token count as BIGINT (the corpus accounting unit).

    Blank-doc guard (house rule, same as text.token_stats): split of a
    trimmed blank yields [''] — filtered, so a blank document counts 0
    tokens in BOTH token modes (pack_sequences' subword path 0-fills the
    same way; r6 review finding). NULL text counts 0 the same way —
    size(NULL) is NULL under Spark's default, which reached the pack
    kernel as NaN and crashed int() (r13 null-table differential
    sweep); a null document packs like a blank one."""
    return (
        F.coalesce(
            F.size(
                F.filter(
                    F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
                )
            ),
            F.lit(0),
        ).cast("long")
    )


def split_column(train_pct: int = 80, val_pct: int = 10):
    """The train/val/test label expression (Knuth-hash bucket of doc_id)
    — shared by split_assign and the shard-writing compositions."""
    bucket = _knuth_bucket(100)
    return (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )


def _gate_and_exact_dedup(
    docs: DataFrame,
    min_quality: float,
    text_col: str,
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Shared stages 2-3: (quality-gate survivors, exact-dedup
    survivors). One definition so curate_documents and the
    oracle-checked curation_report can never drift apart.

    quality_score is a pure projection, so text/lang ride through it as
    passthrough columns — no join back against the input (which would
    plan the scan + regexp scoring twice). ``materialize=True``
    checkpoints each stage for callers that fire multiple actions over
    them (curation_report's four counts).
    """
    annotated = T.quality_score(docs, text_col, passthrough=(text_col, "lang"))
    passed = annotated.filter(F.col("quality") >= min_quality)
    if materialize:
        passed = passed.localCheckpoint(eager=True)
    # exact dedup: fingerprint → keep the lowest doc_id per fingerprint.
    # The fingerprint is NULL-SAFE: md5(NULL) is NULL, and the semi join
    # below is null-unsafe equality, so null-text docs were silently
    # DROPPED from the corpus — not deduped, lost (r13 null-table
    # differential sweep; the funnel oracle's GROUP BY keeps one). The
    # sentinel groups null docs together like SQL GROUP BY does; it is
    # not 32-hex, so it cannot collide with a real digest.
    fp = passed.withColumn(
        "fp", F.coalesce(F.md5(F.col(text_col)), F.lit("__null_text__"))
    )
    keep_exact = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    exact_kept = fp.join(keep_exact, ["fp", "doc_id"], "left_semi").drop("fp")
    if materialize:
        exact_kept = exact_kept.localCheckpoint(eager=True)
    return passed, exact_kept


def curate_documents(
    docs: DataFrame,
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """The curated corpus: documents that survive the quality gate,
    exact dedup (lowest-doc_id representative per md5 fingerprint), and
    near-dup cluster dedup (canonical member per MinHash-LSH cluster),
    with PII scrubbed from the surviving text.

    Returns (doc_id, lang, quality, n_tokens, text) where ``text`` is
    the scrubbed text — the schema a downstream tokenizer consumes.
    """
    _, exact_kept = _gate_and_exact_dedup(docs, min_quality, text_col)
    return _near_dedup_and_scrub(exact_kept, near_dup_threshold, text_col)


def _near_dedup_and_scrub(
    exact_kept: DataFrame, near_dup_threshold: float, text_col: str
) -> DataFrame:
    """Stages 4-5 on the exact-dedup survivors: near-dup cluster dedup
    keeps canonical members (canon_id == doc_id; docs too short to
    shingle never enter the pair graph and are kept as-is), then PII is
    scrubbed as a passthrough projection — no join of the pipeline
    against its own lineage."""
    pairs = D.minhash_lsh_pairs(
        exact_kept, n=3, threshold=near_dup_threshold, text_col=text_col
    )
    clusters = D.near_dup_clusters(exact_kept, pairs)
    near_kept = exact_kept.join(
        clusters.filter(F.col("canon_id") == F.col("doc_id")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    return T.pii_scrub(
        near_kept, text_col, passthrough=("lang", "quality", "n_tokens")
    ).select(
        "doc_id",
        "lang",
        F.round("quality", 4).alias("quality"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("scrubbed").alias(text_col),
    )


def split_assign(
    docs: DataFrame,
    train_pct: int = 80,
    val_pct: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic train/val/test assignment + per-split token budget.

    Split by a Knuth multiplicative hash of doc_id —
    ``(doc_id · 2654435761) mod 2³² mod 100`` — exact wide-integer
    arithmetic (DECIMAL engine-side, HUGEINT in the oracle),
    so the assignment is engine-portable and exactly oracle-checkable
    (unlike xxhash/md5-bucket splits), stable under reruns and corpus
    growth (a doc's split never depends on other docs), and unbiased
    with respect to ingestion order. Returns one row per split with
    document and whitespace-token counts — the accounting a training
    run reads before building shards.
    """
    split = split_column(train_pct, val_pct)
    return (
        docs.select(split.alias("split"), _n_tokens(text_col).alias("n_tokens"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    n_groups: int = 8,
    text_col: str = "text",
    group_cols: list[str] | None = None,
    token_mode: str = "whitespace",
) -> DataFrame:
    """Sequence packing: assign every document to a fixed token-budget
    training sequence — the step between a curated corpus and tokenizer
    shards, where documents are concatenated until the context budget
    would overflow and the next sequence begins.

    Deterministic next-fit: documents are split into ``n_groups`` pack
    groups by the same Knuth multiplicative hash as :func:`split_assign`
    (pure BIGINT arithmetic — engine-portable), then packed in doc_id
    order within each group: a document whose whitespace-token count
    would push the running sequence past ``budget`` starts a new
    sequence (a single over-budget document occupies — and overflows —
    its own sequence; real pipelines truncate or split those upstream).

    Returns (doc_id, pack_group, n_tokens, seq_id). The per-sequence
    accounting (Σ n_tokens ≤ budget except single-doc overflows, every
    doc packed exactly once) follows from the assignment and is gated in
    tests; the assignment itself is exactly oracle-checkable (recursive
    CTE replaying the same scan).

    Scale shape: packing is inherently sequential, so the parallelism
    unit is the pack group — at production scale use thousands of groups
    (one per output shard). The only shuffle is the groupBy on the group
    key; the kernel sees just (doc_id, n_tokens) pairs — a group costs
    ~16 bytes/doc in executor memory, the text never enters the Arrow
    batch (shard writers join text back by doc_id afterwards).

    ``group_cols`` extends the group key: packing runs independently per
    (``*group_cols``, pack_group) in ONE pass — e.g.
    ``group_cols=["split"]`` packs train/val/test shards in a single
    scan + shuffle (a column named in ``group_cols`` must already exist
    on ``docs`` and is carried into the output).

    ``token_mode`` picks the budget unit: ``"whitespace"`` (default,
    the JVM-side split count), ``"subword"`` (the deterministic
    WordPiece count from functions/subword.py) or ``"bpe"`` (the
    FIXED_MERGES encode from functions/bpe.py) — the units a real
    context budget is denominated in. Both non-whitespace modes add one
    join against the distinct-word piece counts before the pack
    shuffle; the packing scan itself is unit-agnostic.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side type only

    gcols = list(group_cols or [])
    dtypes = dict(docs.dtypes)
    if token_mode == "whitespace":
        counted = docs.select(
            "doc_id", *gcols, _n_tokens(text_col).alias("n_tokens")
        )
    elif token_mode in ("subword", "bpe"):
        if token_mode == "subword":
            from cloudfront_kinesis_log_lambda_spark.functions.subword import (
                subword_token_count_df as _count_df,
            )
        else:
            from cloudfront_kinesis_log_lambda_spark.functions.bpe import (
                bpe_token_count_df as _count_df,
            )

        # left join + 0-fill: a blank doc has no words at all, so it is
        # absent from the word-level aggregate — it must still pack
        # (with 0 tokens), matching whitespace mode's blank-doc guard
        counted = (
            docs.select("doc_id", *gcols)
            .join(_count_df(docs, text_col), "doc_id", "left")
            .withColumn(
                "n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0).cast("long"))
            )
        )
    else:
        raise ValueError(
            "token_mode must be 'whitespace', 'subword' or 'bpe', "
            f"got {token_mode!r}"
        )
    base = counted.select(
        "doc_id",
        *gcols,
        _knuth_bucket(n_groups).cast("int").alias("pack_group"),
        "n_tokens",
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        seq, running = 0, 0
        first = True
        for t in pdf["n_tokens"]:
            t = int(t)
            # the not-first flag, NOT `running > 0`: with 0-token docs
            # (blanks) the two differ — a run of blanks leaves running
            # at 0 while the sequence already has members, and the
            # running>0 form then let an over-budget doc pile into that
            # sequence, diverging from the oracle's pure token recursion
            # (seq_tokens + t > budget, seeded at rn=1) and breaking the
            # multi-doc budget invariant (r6 hypothesis find:
            # token_counts=[0,0,9], budget=8)
            if not first and running + t > budget:
                seq += 1
                running = 0
            running += t
            first = False
            seq_ids.append(seq)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        return pdf

    extra = "".join(f", {c} {dtypes[c]}" for c in gcols)
    return base.groupBy(*gcols, "pack_group").applyInPandas(
        pack, f"doc_id long{extra}, pack_group int, n_tokens long, seq_id long"
    )


def curation_report(
    docs: DataFrame,
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Per-stage retention accounting: one row per pipeline stage with
    the surviving document count — the funnel a data-curation run logs.
    Deterministic given the corpus (stage counts don't depend on hash
    seeds as long as LSH recall holds, which the recall gates pin)."""
    spark = docs.sparkSession
    # materialize=True: the four count() actions below would otherwise
    # re-execute the gate regexps and md5 dedup per stage (and
    # curate_documents would rebuild both internally a third time)
    passed, exact_kept = _gate_and_exact_dedup(
        docs, min_quality, text_col, materialize=True
    )
    curated = _near_dedup_and_scrub(exact_kept, near_dup_threshold, text_col)
    counts = [
        ("1_raw", docs.count()),
        ("2_quality_gate", passed.count()),
        ("3_exact_dedup", exact_kept.count()),
        ("4_near_dedup_scrubbed", curated.count()),
    ]
    return spark.createDataFrame(counts, "stage string, n_docs long")
