"""Schemas for the CloudFront access-log data model.

The reference declares a fixed 33-field all-strings schema
(``FIELDNAMES``, cloudfront_kinesis_lambda.py:20-54) for the CloudFront
standard access-log v1 format (W3C extended log, tab-separated) and never
types anything beyond strings. The engine keeps that wire-fidelity schema
(``RAW_SCHEMA``) and adds a typed view (``TYPED_SCHEMA`` /
``typed_view()``) per SURVEY.md §1.2.

Fidelity notes (SURVEY.md §1.4):

- Only ``http_referer``, ``log_date``, ``log_time`` are actually removed
  by the transform (cloudfront_kinesis_lambda.py:194,198), despite
  comments claiming 8 more strips; ``DOCUMENTED_STRIP_FIELDS`` preserves
  the documented intent as an *optional* projection.
- Hyphenated names (``fle-status``, ``fle-encrypted-fields``) are kept
  verbatim for JSON-output fidelity; quote with backticks in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: the reference's 33 input fields, in wire order
#: (cloudfront_kinesis_lambda.py:20-54)
FIELDNAMES: tuple[str, ...] = (
    "log_date",
    "log_time",
    "cf_pop",
    "bytes_sent",
    "src_ip",
    "http_method",
    "cf_distribution",
    "http_path",
    "http_status",
    "http_referer",
    "http_user_agent",
    "http_query",
    "http_cookie",
    "cf_result",
    "cf_request_id",
    "http_host",
    "http_protocol",
    "bytes_received",
    "duration_s",
    "xff",
    "tls_protocol",
    "tls_cipher",
    "cf_result_pre",
    "http_version",
    "fle-status",
    "fle-encrypted-fields",
    "src_port",
    "ttfb_s",
    "cf_result_detail",
    "http_content_type",
    "http_content_length",
    "http_range_start",
    "http_range_end",
)

#: wire-fidelity schema: everything is a string, exactly like
#: csv.DictReader in the reference (cloudfront_kinesis_lambda.py:183)
RAW_SCHEMA = StructType([StructField(name, StringType(), True) for name in FIELDNAMES])

#: semantic types for the typed view (SURVEY.md §1.2 table)
_TYPED_OVERRIDES: dict[str, object] = {
    "bytes_sent": LongType(),
    "http_status": IntegerType(),
    "bytes_received": LongType(),
    "duration_s": DoubleType(),
    "src_port": IntegerType(),
    "ttfb_s": DoubleType(),
    "http_content_length": LongType(),
    "http_range_start": LongType(),
    "http_range_end": LongType(),
}

TYPED_SCHEMA = StructType(
    [
        StructField(name, _TYPED_OVERRIDES.get(name, StringType()), True)
        for name in FIELDNAMES
    ]
)

#: fields the reference *actually* removes during transform
#: (cloudfront_kinesis_lambda.py:194,198)
ACTUAL_STRIP_FIELDS: tuple[str, ...] = ("http_referer", "log_date", "log_time")

#: fields whose comments *claim* "this gets stripped"
#: (cloudfront_kinesis_lambda.py:30,32,33,40,45,46,52,53) — the code never
#: pops them; offered as an optional strict projection.
DOCUMENTED_STRIP_FIELDS: tuple[str, ...] = (
    "http_referer",
    "http_query",
    "http_cookie",
    "xff",
    "fle-status",
    "fle-encrypted-fields",
    "http_range_start",
    "http_range_end",
)

#: enrichment fields added by the transform
#: (cloudfront_kinesis_lambda.py:196-210)
ENRICHED_FIELDS: tuple[str, ...] = ("@timestamp", "serviceId", "type", "env")

#: the constant `type` value (cloudfront_kinesis_lambda.py:209)
RECORD_TYPE = "globaledge_cloudfront"

#: JSON output field order of the enriched record. json.dumps preserves
#: dict insertion order: the 33 DictReader fields in FIELDNAMES order with
#: log_date/log_time/http_referer removed, then the four enrichments in
#: the order the reference adds them (cloudfront_kinesis_lambda.py:191-210).
OUTPUT_FIELD_ORDER: tuple[str, ...] = tuple(
    f for f in FIELDNAMES if f not in ACTUAL_STRIP_FIELDS
) + ENRICHED_FIELDS


def _null_preserving_cast(name: str, dtype) -> Column:
    """CloudFront writes ``-`` for absent numeric values; cast maps it
    (and anything unparseable) to NULL via try_cast semantics."""
    col = F.col(f"`{name}`")
    return F.when(col == "-", F.lit(None)).otherwise(col).try_cast(dtype).alias(name)


def typed_view(raw: DataFrame) -> DataFrame:
    """Project the all-strings wire DataFrame to the typed view.

    A capability upgrade over the reference (which emits numeric fields as
    JSON strings end-to-end); the wire-fidelity path keeps strings.
    """
    cols: list[Column] = []
    for name in raw.columns:
        if name in _TYPED_OVERRIDES:
            cols.append(_null_preserving_cast(name, _TYPED_OVERRIDES[name]))
        else:
            cols.append(F.col(f"`{name}`"))
    return raw.select(*cols)
