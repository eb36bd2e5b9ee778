"""Empty-input contracts (r13 differential sweep: the full registry ran
against 0-row tables with the production schemas, Spark vs DuckDB).

At 100 TB an empty slice is ROUTINE — a day with no events, a split
with no documents, a filter that drains a partition — so operators
must degrade to empty frames (or CLEAR contract errors), never to
analysis-time type errors or unreadable stores. These pin the three
fixes the sweep produced and the one documented engine-semantics
divergence.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_global_rank_on_empty_frame_is_empty_not_analysis_error(spark, empty_docs):
    """F.create_map() of ZERO offset entries is map<void,void> and the
    rank lookup failed ANALYSIS with DATATYPE_MISMATCH before the r13
    fix — an empty frame must rank to an empty frame."""
    from cloudfront_kinesis_log_lambda_spark.operators.util import global_rank

    out = global_rank(empty_docs, ["text", "doc_id"])
    assert out.columns == ["doc_id", "text", "rn"]
    assert out.count() == 0


def test_sorted_neighbors_on_empty_corpus_yields_no_pairs(spark, empty_docs):
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    assert sorted_neighborhood_pairs(empty_docs).count() == 0


def test_log_store_empty_write_reads_back_with_schema(spark):
    """A partitionBy write of zero rows leaves only _SUCCESS; a bare
    read throws UNABLE_TO_INFER_SCHEMA. With the written schema the
    store reads back as an empty frame — an empty day is routine, not
    an error."""
    from cloudfront_kinesis_log_lambda_spark.sinks.parquet import (
        read_log_store,
        write_log_store,
    )

    enriched = spark.createDataFrame(
        [], "`@timestamp` string, env string, serviceId string, bytes_sent string"
    )
    out = os.path.join(tempfile.mkdtemp(), "store")
    write_log_store(enriched, out, mode="overwrite")
    schema = (
        enriched.withColumn("ts", F.to_timestamp("`@timestamp`"))
        .withColumn("log_day", F.substring("`@timestamp`", 1, 10))
        .schema
    )
    back = read_log_store(spark, out, schema=schema)
    assert back.count() == 0
    assert set(back.columns) >= {"env", "log_day", "ts"}


def test_ann_query_fetch_raises_clear_error_on_missing_id(spark):
    """The bare 1-row destructuring raised "not enough values to
    unpack" on an empty corpus / unknown id — the contract error must
    name the id and the remedies."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        ann_lsh_topk,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="vec_id=7 not found"):
        ann_lsh_topk(emb, query_vec_id=7, k=5)


def test_ann_query_fetch_raises_on_duplicated_id(spark):
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        ann_lsh_topk,
    )

    emb = spark.createDataFrame(
        [(7, [1.0, 0.0]), (7, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="duplicated"):
        ann_lsh_topk(emb, query_vec_id=7, k=5, dim=2)


def test_grouping_sets_empty_input_follows_spark_semantics(spark):
    """DOCUMENTED divergence (rollup_returns docstring): Spark's
    grouping-sets expansion yields ZERO rows on empty input — grand
    total included — where the SQL standard yields one count-0 row.
    Pin the engine-follows-Spark contract so a silent behavior change
    in either direction is caught."""
    df = spark.createDataFrame([], "a string, x double")
    assert df.rollup("a").agg(F.count(F.lit(1)).alias("n")).count() == 0
    assert df.cube("a").agg(F.count(F.lit(1)).alias("n")).count() == 0
    # the special case users should reach for instead
    assert df.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"] == 0


# --- null-heavy degenerate (same r13 sweep, null non-key columns) ----------


def test_null_text_docs_survive_exact_dedup_as_one_representative(spark):
    """md5(NULL) is NULL and the exact-dedup semi join is null-unsafe
    equality, so null-text docs were silently DROPPED from the curated
    corpus — not deduped, LOST (r13 null-table sweep). The null-safe
    fingerprint groups them like SQL GROUP BY: one min-doc_id
    representative survives."""
    from cloudfront_kinesis_log_lambda_spark.pipelines.training_data import (
        curation_report,
    )

    docs = spark.createDataFrame(
        [(1, None, "en"), (2, None, "en"), (3, "real text here ok", "en")],
        "doc_id long, text string, lang string",
    )
    stages = {
        r["stage"]: r["n_docs"] for r in curation_report(docs, min_quality=0.0).collect()
    }
    # one representative of the two null docs + the real doc
    assert stages["3_exact_dedup"] == 2


def test_null_text_packs_as_zero_tokens_like_blank(spark):
    """size(split(NULL)) is NULL under Spark defaults and reached the
    pack kernel as NaN, crashing int() — the house rule is that a null
    document counts 0 tokens, exactly like a blank one."""
    from cloudfront_kinesis_log_lambda_spark.pipelines.training_data import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "three tokens here"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["n_tokens"] for r in pack_sequences(docs, budget=8).collect()}
    assert rows == {1: 0, 2: 3, 3: 0}


def test_null_strata_are_excluded_not_crashed(spark, sf_dir):
    """sampleBy rejects a None fractions key outright; a NULL stratum is
    excluded like any stratum absent from the fractions dict instead of
    crashing the job."""
    from cloudfront_kinesis_log_lambda_spark.operators.reshape import (
        stratified_event_sample,
    )
    import cloudfront_kinesis_log_lambda_spark.operators.relational as R

    e = R.load(spark, sf_dir, "events").withColumn(
        "event_type",
        F.when(F.col("event_id") % 2 == 0, F.col("event_type")),
    )
    import tempfile

    d = tempfile.mkdtemp()
    e.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = stratified_event_sample(spark, d)
    types = {r["event_type"] for r in out.collect()}
    assert None not in types and len(types) > 0
