"""Unit tests for individual §2.2 transforms against handcrafted rows."""

from __future__ import annotations

from urllib.parse import unquote

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.transforms import (
    add_timestamp,
    url_unquote,
)
from cloudfront_kinesis_log_lambda_spark.schema import typed_view
from cloudfront_kinesis_log_lambda_spark.sources.events import (
    extract_bucket_key,
    parse_log_key,
)

UA_CASES = [
    "Mozilla%2F5.0%20(Macintosh)",     # ordinary %XX escapes
    "curl/7.88.1",                     # nothing to decode
    "a%2Bb+c",                         # '+' must NOT become space (unquote semantics)
    "100%25%20sure",                   # literal percent
    "%E2%82%AC%20rate",                # multibyte UTF-8 escape
    "",                                # empty
]


@pytest.mark.parametrize("ua", UA_CASES)
def test_url_unquote_both_fidelities_match_python(spark, ua):
    df = spark.createDataFrame([(ua,)], "ua string")
    row = df.select(
        url_unquote("ua", "fast").alias("fast"),
        url_unquote("ua", "exact").alias("exact"),
    ).first()
    assert row["exact"] == unquote(ua)
    assert row["fast"] == unquote(ua)


def test_url_unquote_invalid_escape_fast_passthrough(spark):
    # python unquote leaves the bad escape but decodes valid ones;
    # the fast JVM path passes the whole string through untouched —
    # documented deviation, exact path matches python.
    s = "bad%zzgood%20x"
    df = spark.createDataFrame([(s,)], "ua string")
    row = df.select(
        url_unquote("ua", "fast").alias("fast"),
        url_unquote("ua", "exact").alias("exact"),
    ).first()
    assert row["exact"] == unquote(s)
    assert row["fast"] == s


def test_add_timestamp_is_session_timezone_independent(spark):
    """ADVICE r11: the wire @timestamp is the UTC log wall-clock plus a
    +00:00 offset (the reference runs on UTC Lambda hosts), and must
    render that way from ANY producing session. The pre-fix
    date_format(ts, "...xxx") form under America/New_York rendered
    -05:00 offsets AND shifted wall-clocks in the spring-forward DST gap
    (2019-03-10 02:13:04 → 03:13:04-04:00)."""
    rows = [
        ("2019-01-18", "02:13:04"),  # the SURVEY trap example
        ("2019-03-10", "02:13:04"),  # inside the America/New_York DST gap
        ("2019-07-04", "23:59:59"),  # DST-active date, day boundary
    ]
    df = spark.createDataFrame(rows, "log_date string, log_time string")
    expect = [f"{d}T{t}+00:00" for d, t in rows]
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = [
                r["@timestamp"]
                for r in add_timestamp(df).orderBy("@timestamp").collect()
            ]
            assert got == expect, (tz, got)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)


def test_parse_log_key_reference_and_strict():
    # docstring shape (leading slash) — cloudfront_kinesis_lambda.py:167
    assert parse_log_key("/stg/abc/file.gz") == ("stg", "abc")
    # deployed shape (cloudformation prefix) — cloudformation.yaml:26
    assert parse_log_key("cloudfront/stg/abc/file.gz") == ("stg", "abc")
    # latent reference bug: bare key mis-parses (SURVEY.md §1.4.5)
    assert parse_log_key("stg/abc/file.gz") == ("abc", "file.gz")
    assert parse_log_key("stg/abc/file.gz", strict=True) == ("stg", "abc")
    assert parse_log_key("deep/prefix/stg/abc/file.gz", strict=True) == ("stg", "abc")


def test_extract_bucket_key_both_envelopes():
    import json

    s3_event = {"Records": [{"s3": {"bucket": {"name": "b"}, "object": {"key": "k.gz"}}}]}
    sns_event = {"Records": [{"Sns": {"Message": json.dumps(s3_event)}}]}
    assert extract_bucket_key(sns_event) == ("b", "k.gz")
    assert extract_bucket_key(s3_event) == ("b", "k.gz")


def test_typed_view_casts_and_dash_null(spark):
    from cloudfront_kinesis_log_lambda_spark.schema import RAW_SCHEMA

    row = {f.name: "-" for f in RAW_SCHEMA.fields}
    row.update(bytes_sent="2048", http_status="200", duration_s="0.042", src_port="54321")
    df = spark.createDataFrame([tuple(row[f.name] for f in RAW_SCHEMA.fields)], RAW_SCHEMA)
    t = typed_view(df).first()
    assert t["bytes_sent"] == 2048 and t["http_status"] == 200
    assert abs(t["duration_s"] - 0.042) < 1e-12 and t["src_port"] == 54321
    assert t["http_content_length"] is None and t["http_range_start"] is None
    assert t["cf_pop"] == "-"  # strings untouched
