"""Pure-Python golden oracle for the CloudFront transform.

Re-implements the reference's per-row transform semantics *from spec*
(SURVEY.md §3.2: cloudfront_kinesis_lambda.py:191-212) so end-to-end
tests can diff the Spark pipeline's output against independently computed
expectations. Kept deliberately tiny and dependency-free.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from urllib.parse import unquote


def enrich_row(row: dict[str, str], env: str, service_id: str) -> dict[str, str]:
    """Expected enriched record for one raw 33-field row.

    Matches the reference's live behavior: drop http_referer + the two
    time source fields, ISO @timestamp (UTC host zone), unquote the UA,
    append serviceId/type/env — in that dict order.
    """
    out = {k: v for k, v in row.items() if k != "http_referer"}
    ts = datetime.strptime(
        out.pop("log_date") + " " + out.pop("log_time"), "%Y-%m-%d %H:%M:%S"
    ).replace(tzinfo=timezone.utc)
    # reinsert in the reference's mutation order: @timestamp lands after
    # the surviving original fields (dict pop keeps remaining order).
    out["@timestamp"] = ts.isoformat()
    out["http_user_agent"] = unquote(out["http_user_agent"])
    out["serviceId"] = service_id
    out["type"] = "globaledge_cloudfront"
    out["env"] = env
    return out


def expected_wire_data(row: dict[str, str], env: str, service_id: str) -> str:
    """Expected JSON ``Data`` payload for one raw row."""
    return json.dumps(enrich_row(row, env, service_id))
