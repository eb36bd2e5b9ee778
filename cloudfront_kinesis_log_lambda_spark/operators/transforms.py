"""The CloudFront per-row transform chain, Spark-first.

Reproduces the reference's producer-loop transforms
(cloudfront_kinesis_lambda.py:191-212) as one declarative DataFrame
chain — scan → project → serialize fuses into a single WholeStageCodegen
stage, the built-in equivalent of the reference's hand-fused
tuple-at-a-time loop (SURVEY.md §4).

Per-op fidelity notes are on each function; the oracle is the code's
*actual* behavior, not its comments (SURVEY.md §1.4).
"""

from __future__ import annotations

from urllib.parse import unquote

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from cloudfront_kinesis_log_lambda_spark.schema import (
    ACTUAL_STRIP_FIELDS,
    DOCUMENTED_STRIP_FIELDS,
    OUTPUT_FIELD_ORDER,
    RECORD_TYPE,
)


def strip_fields(df: DataFrame, documented_intent: bool = False) -> DataFrame:
    """Drop the referer column (cloudfront_kinesis_lambda.py:194).

    The reference's comments claim 8 more fields "get stripped" but the
    code only pops ``http_referer`` (SURVEY.md §1.4.1); pass
    ``documented_intent=True`` for the documented-intent projection.
    (``log_date``/``log_time`` are consumed by :func:`add_timestamp`.)
    """
    drop = DOCUMENTED_STRIP_FIELDS if documented_intent else ("http_referer",)
    return df.drop(*drop)


def add_timestamp(df: DataFrame, column: str = "@timestamp") -> DataFrame:
    """Merge ``log_date``+``log_time`` into an ISO-8601 ``@timestamp``.

    Reference: ``strptime(log_date + " " + log_time, "%Y-%m-%d %H:%M:%S")
    .astimezone().isoformat()`` (cloudfront_kinesis_lambda.py:196-203).
    ``astimezone()`` on the naive value attaches the host zone — UTC on
    Lambda, always, because CloudFront logs are UTC and Lambda hosts are
    UTC — so the wire value is the log wall-clock plus ``+00:00`` (e.g.
    ``2019-01-18T02:13:04+00:00``).

    Rendered timezone-INDEPENDENTLY (ADVICE r11): the wall-clock is
    parsed and re-rendered as TIMESTAMP_NTZ (validation + normalization
    with no session-zone round-trip) and the UTC offset appended as a
    literal. The previous ``date_format(ts, "...xxx")`` form was only
    correct under a UTC-pinned session — an un-pinned America/New_York
    session rendered ``-05:00`` offsets and even shifted wall-clocks
    falling in the spring-forward DST gap (02:13:04 → 03:13:04). Parse
    errors are unchanged: an invalid date raises under ANSI exactly as
    ``to_timestamp`` did.
    """
    ntz = F.to_timestamp_ntz(
        F.concat_ws(" ", F.col("log_date"), F.col("log_time")),
        F.lit("yyyy-MM-dd HH:mm:ss"),
    )
    # TIMESTAMP_NTZ → string is zone-free canonical "yyyy-MM-dd HH:mm:ss"
    iso = F.concat(
        F.replace(ntz.cast("string"), F.lit(" "), F.lit("T")),
        F.lit("+00:00"),
    )
    return df.withColumn(column, iso).drop("log_date", "log_time")


@F.pandas_udf(StringType())
def _unquote_exact(s: pd.Series) -> pd.Series:
    # Arrow-batched exact replica of urllib.parse.unquote: decodes %XX,
    # leaves '+' and invalid escape sequences untouched.
    return s.map(lambda x: unquote(x) if x is not None else None)


def url_unquote(col: Column | str, fidelity: str = "fast") -> Column:
    """Percent-decode like Python's ``urllib.parse.unquote``
    (cloudfront_kinesis_lambda.py:206, applied to ``http_user_agent``).

    ``fidelity="fast"`` stays JVM-side: ``url_decode`` differs from
    ``unquote`` in that it (a) decodes ``+`` as space and (b) raises on
    malformed escapes — so we pre-escape ``+``→``%2B`` and use
    ``try_url_decode`` with a coalesce fallback. Identical to ``unquote``
    on every string whose ``%`` escapes are all valid (real CloudFront
    UA fields); a string containing a malformed escape is passed through
    undecoded instead of partially decoded.

    ``fidelity="exact"`` uses an Arrow-batched pandas UDF wrapping
    ``unquote`` itself — byte-exact on all inputs, Python-path cost.
    """
    c = F.col(col) if isinstance(col, str) else col
    if fidelity == "exact":
        return _unquote_exact(c)
    escaped = F.regexp_replace(c, r"\+", "%2B")
    return F.coalesce(F.try_url_decode(escaped), c)


def enrich_metadata(
    df: DataFrame,
    env: str | None = None,
    service_id: str | None = None,
    source_file_col: str = "_source_file",
) -> DataFrame:
    """Add ``serviceId`` / ``type`` / ``env``
    (cloudfront_kinesis_lambda.py:208-210).

    The reference derives env/serviceId from the one S3 key its Lambda
    invocation owns (``key.split("/")[1:3]``,
    cloudfront_kinesis_lambda.py:171-173). The engine processes many
    files per job, so when explicit values aren't given it derives them
    per-row from the scan's ``_source_file`` path, anchored from the
    right (``.../env/serviceId/file.gz``) — robust to any bucket-prefix
    depth, unlike the reference's left-indexing (SURVEY.md §1.4.5).
    """
    # each value is handled independently — a caller passing only env
    # must not have it silently ignored in favor of a per-row derive;
    # F.get (0-based, returns NULL out of range) instead of element_at,
    # whose index-0 / out-of-range cases throw at runtime for paths
    # with fewer than three segments (e.g. the empty _source_file
    # input_file_name() yields for non-file-backed rows)
    parts = F.split(F.col(source_file_col), "/")
    n = F.size(parts)
    env_col: Column = (
        F.lit(env) if env is not None else F.get(parts, n - 3)
    )
    sid_col: Column = (
        F.lit(service_id) if service_id is not None else F.get(parts, n - 2)
    )
    out = (
        df.withColumn("serviceId", sid_col)
        .withColumn("type", F.lit(RECORD_TYPE))
        .withColumn("env", env_col)
    )
    if source_file_col in out.columns:
        out = out.drop(source_file_col)
    return out


@F.pandas_udf(StringType())
def _json_dumps_exact(rows: pd.DataFrame) -> pd.Series:
    # Byte-exact replica of the reference's json.dumps(line)
    # (cloudfront_kinesis_lambda.py:212): default separators (", ", ": "),
    # None → null, insertion order preserved. A StructType argument
    # arrives as a pd.DataFrame whose columns keep struct field order.
    import json

    cols = list(rows.columns)
    return pd.Series(
        [
            json.dumps(dict(zip(cols, (None if pd.isna(v) else v for v in vals))))
            for vals in rows.itertuples(index=False, name=None)
        ]
    )


def to_wire_records(df: DataFrame, exact_json: bool = False) -> DataFrame:
    """Serialize each enriched row to a Kinesis wire record:
    ``{"Data": json.dumps(row), "PartitionKey": uuid4().hex}``
    (cloudfront_kinesis_lambda.py:212).

    Default path is ``to_json`` over a struct in the reference's exact
    field order — JVM-side, codegen-fused. It differs from ``json.dumps``
    in THREE byte-level ways: compact separators, null fields omitted,
    and non-ASCII emitted as raw UTF-8 where ``json.dumps`` escapes to
    backslash-u sequences (``ensure_ascii`` default) — semantically
    equivalent JSON,
    different bytes. Consumers that byte-compare records (or require
    ASCII) need ``exact_json=True``, the Arrow-batched ``json.dumps``
    UDF with byte-exact wire parity.

    ``PartitionKey`` is ``uuid4().hex`` fidelity: Spark's ``uuid()`` is
    also random-based, and stripping dashes yields the 32-char hex form.
    Nondeterministic by design (the reference uses it to spread Kinesis
    shard load — the same trick as join-skew salting, SURVEY.md §4).
    """
    ordered = [F.col(f"`{name}`") for name in OUTPUT_FIELD_ORDER if name in df.columns]
    payload = F.struct(*ordered)
    data = _json_dumps_exact(payload) if exact_json else F.to_json(payload)
    return df.select(
        data.alias("Data"),
        F.expr("replace(uuid(), '-', '')").alias("PartitionKey"),
    )


def transform_cloudfront(
    df: DataFrame,
    env: str | None = None,
    service_id: str | None = None,
    ua_fidelity: str = "fast",
) -> DataFrame:
    """The full enrichment chain (everything but wire serialization):
    strip → @timestamp → unquote UA → metadata
    (cloudfront_kinesis_lambda.py:191-210, SURVEY.md §3.2).
    """
    out = strip_fields(df)
    out = add_timestamp(out)
    out = out.withColumn(
        "http_user_agent", url_unquote("http_user_agent", fidelity=ua_fidelity)
    )
    return enrich_metadata(out, env=env, service_id=service_id)


def cloudfront_wire_pipeline(
    df: DataFrame,
    env: str | None = None,
    service_id: str | None = None,
    ua_fidelity: str = "fast",
    exact_json: bool = False,
) -> DataFrame:
    """scan → transform → wire records: the reference's whole producer
    (cloudfront_kinesis_lambda.py:158-230) as one fused Spark stage."""
    return to_wire_records(
        transform_cloudfront(df, env=env, service_id=service_id, ua_fidelity=ua_fidelity),
        exact_json=exact_json,
    )
