"""Notification-event decoding and S3-key metadata parsing.

The reference's entry point unwraps an SNS envelope around an S3
``ObjectCreated`` event (cloudfront_kinesis_lambda.py:256-260), even
though its README and CloudFormation describe a direct S3→Lambda trigger
(SURVEY.md §1.4.3). The engine accepts **both** envelope shapes.

Key parsing: the reference takes ``key.split("/")[1]`` as env and ``[2]``
as serviceId (cloudfront_kinesis_lambda.py:171-173). That indexing works
for both the docstring's ``/env/id/file.gz`` (leading slash) and the
deployed ``cloudfront/env/id/file.gz`` (prefix), but silently mis-parses a
bare ``env/id/file.gz`` key — a latent reference bug (SURVEY.md §1.4.5).
``parse_log_key`` reproduces the reference behavior by default and offers
a ``strict`` mode that anchors on named positions from the right.
"""

from __future__ import annotations

import json
from typing import Any


def extract_bucket_key(event: dict[str, Any]) -> tuple[str, str]:
    """Return ``(bucket, key)`` from an SNS-wrapped or direct S3 event.

    SNS shape (the reference's actual expectation,
    cloudfront_kinesis_lambda.py:258-260)::

        {"Records": [{"Sns": {"Message": "<json S3 event>"}}]}

    Direct S3 shape (the reference's *documented* expectation,
    README.md:2, cloudformation.yaml:18-28)::

        {"Records": [{"s3": {"bucket": {"name": ...}, "object": {"key": ...}}}]}
    """
    record = event["Records"][0]
    if "Sns" in record:
        s3_event = json.loads(record["Sns"]["Message"])
        record = s3_event["Records"][0]
    s3 = record["s3"]
    return s3["bucket"]["name"], s3["object"]["key"]


def parse_log_key(key: str, strict: bool = False) -> tuple[str, str]:
    """Return ``(env, service_id)`` from a log object key.

    Default mode is wire-faithful to ``key.split("/")[1:3]``
    (cloudfront_kinesis_lambda.py:171-173). ``strict=True`` anchors from
    the right (``.../env/service_id/file.gz``), which also handles bare
    keys without a prefix or leading slash.
    """
    parts = key.split("/")
    if strict:
        if len(parts) < 3:
            raise ValueError(f"key has no env/service_id/file structure: {key!r}")
        return parts[-3], parts[-2]
    return parts[1], parts[2]
