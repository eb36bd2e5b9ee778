"""Deterministic synthetic CloudFront access-log fixtures.

Generates gzipped TSV files in the exact wire shape the reference
consumes (FIXTURES.md §A1): two ``#`` header lines then 33 tab-separated
string fields per row. Seeded — same (seed, rows) → same bytes — so
golden tests and driver queries are reproducible.
"""

from __future__ import annotations

import gzip
import os
import random
import tempfile

from cloudfront_kinesis_log_lambda_spark.schema import FIELDNAMES

_POPS = ["SYD1-C1", "IAD79-C3", "FRA56-P1", "NRT12-C4", "GRU1-C2"]
_METHODS = ["GET", "GET", "GET", "HEAD", "POST"]
_PATHS = ["/index.html", "/api/v1/items", "/static/app.js", "/img/logo%20large.png", "/"]
_STATUSES = ["200", "200", "200", "304", "404", "500", "206"]
_RESULTS = ["Hit", "Miss", "RefreshHit", "Error", "LimitExceeded"]
_UAS = [
    "Mozilla%2F5.0%20(Macintosh%3B%20Intel)",
    "curl%2F7.88.1",
    "python-requests%2F2.31",
    "Mozilla%2F5.0%20(Windows%20NT%2010.0%3B%20Win64%3B%20x64)",
    "bot%2B1.0%20(%2Bhttps%3A%2F%2Fexample.com)",  # '+' must survive undecoded
]
_CONTENT_TYPES = ["text/html", "application/json", "image/png", "-"]

HEADER_LINES = (
    "#Version: 1.0",
    "#Fields: date time x-edge-location sc-bytes c-ip cs-method cs(Host) cs-uri-stem "
    "sc-status cs(Referer) cs(User-Agent) cs-uri-query cs(Cookie) x-edge-result-type "
    "x-edge-request-id x-host-header cs-protocol cs-bytes time-taken x-forwarded-for "
    "ssl-protocol ssl-cipher x-edge-response-result-type cs-protocol-version fle-status "
    "fle-encrypted-fields c-port time-to-first-byte x-edge-detailed-result-type "
    "sc-content-type sc-content-len sc-range-start sc-range-end",
)


def make_log_row(rng: random.Random, day_offset: int = 0) -> dict[str, str]:
    """One synthetic CloudFront log row as {field: wire-string}."""
    hh, mm, ss = rng.randrange(24), rng.randrange(60), rng.randrange(60)
    day = 18 + day_offset
    row = {
        "log_date": f"2019-01-{day:02d}",
        "log_time": f"{hh:02d}:{mm:02d}:{ss:02d}",
        "cf_pop": rng.choice(_POPS),
        "bytes_sent": str(rng.randrange(200, 5_000_000)),
        "src_ip": f"203.0.{rng.randrange(256)}.{rng.randrange(256)}",
        "http_method": rng.choice(_METHODS),
        "cf_distribution": "EGI5P51QNDZ",
        "http_path": rng.choice(_PATHS),
        "http_status": rng.choice(_STATUSES),
        "http_referer": rng.choice(["-", "https://example.com/", "https://ref.example/page"]),
        "http_user_agent": rng.choice(_UAS),
        "http_query": rng.choice(["-", "q=1", "a=b&c=d"]),
        "http_cookie": "-",
        "cf_result": rng.choice(_RESULTS),
        "cf_request_id": f"{rng.getrandbits(64):016x}",
        "http_host": "d1234.cloudfront.net",
        "http_protocol": rng.choice(["https", "http"]),
        "bytes_received": str(rng.randrange(0, 4096)),
        "duration_s": f"{rng.uniform(0.001, 3.0):.3f}",
        "xff": "-",
        "tls_protocol": rng.choice(["TLSv1.2", "TLSv1.3", "-"]),
        "tls_cipher": rng.choice(["ECDHE-RSA-AES128-GCM-SHA256", "TLS_AES_128_GCM_SHA256", "-"]),
        "cf_result_pre": rng.choice(_RESULTS),
        "http_version": rng.choice(["HTTP/2.0", "HTTP/1.1"]),
        "fle-status": "-",
        "fle-encrypted-fields": "-",
        "src_port": str(rng.randrange(1024, 65536)),
        "ttfb_s": f"{rng.uniform(0.001, 0.5):.3f}",
        "cf_result_detail": rng.choice(_RESULTS),
        "http_content_type": rng.choice(_CONTENT_TYPES),
        "http_content_length": rng.choice(["-", str(rng.randrange(0, 1_000_000))]),
        "http_range_start": "-",
        "http_range_end": "-",
    }
    if tuple(row) != FIELDNAMES:  # not assert: must survive python -O
        raise RuntimeError("make_log_row keys drifted from FIELDNAMES")
    return row


def write_log_file(
    path: str, rows: int = 1000, seed: int = 42, day_offset: int = 0
) -> list[dict[str, str]]:
    """Write a gzipped CloudFront TSV log file; return the rows written."""
    import io

    rng = random.Random(seed)
    data = [make_log_row(rng, day_offset=day_offset) for _ in range(rows)]
    if os.path.dirname(path):  # bare filenames: makedirs('') raises
        os.makedirs(os.path.dirname(path), exist_ok=True)
    # mtime=0 + no filename in the gzip header: gzip.open(path) embeds
    # the wall clock and basename, so "same (seed, rows) → same bytes"
    # (the module contract) would break on every re-generation
    with open(path, "wb") as raw, gzip.GzipFile(
        # filename="" too: with a bare fileobj GzipFile embeds
        # raw.name in the FNAME header field
        fileobj=raw, mode="wb", mtime=0, filename=""
    ) as gz, io.TextIOWrapper(gz, newline="") as f:
        for line in HEADER_LINES:
            f.write(line + "\n")
        for row in data:
            f.write("\t".join(row[name] for name in FIELDNAMES) + "\n")
    return data


def write_log_tree(
    base_dir: str,
    envs: tuple[str, ...] = ("prod", "stg"),
    service_ids: tuple[str, ...] = ("bf574f33-66e3-4936-a0b6-420325157173",),
    files_per_service: int = 2,
    rows: int = 500,
    seed: int = 42,
) -> list[str]:
    """Write a bucket-like tree ``base/cloudfront/env/serviceId/file.gz``
    (key layout per cloudformation.yaml:26 + FIXTURES.md §A1)."""
    paths = []
    n = 0
    for env in envs:
        for sid in service_ids:
            for i in range(files_per_service):
                p = os.path.join(
                    base_dir, "cloudfront", env, sid,
                    f"EGI5P51QNDZ.2019-01-{18+i:02d}-02.{n:08x}.gz",
                )
                write_log_file(p, rows=rows, seed=seed + n, day_offset=i)
                paths.append(p)
                n += 1
    return paths


#: the SHARED deterministic fixture tree both the driver-gate queries
#: (plans/registry.py cloudfront_*) and their DuckDB oracles
#: (functions/oracles.py) read — one constant so the two sides can
#: never drift onto different paths
FIXTURE_DIR = os.path.join(tempfile.gettempdir(), "cfkll-fixture-v2")


def ensure_fixture_tree() -> str:
    """Build the shared fixture tree once, atomically, and return its
    path. Parallel gate processes can race to build the (deterministic)
    tree; a half-written tree under the final path would poison every
    later query, so build under a pid-scoped path then rename — atomic
    on POSIX; the loser's rename fails and it cleans up."""
    import shutil

    marker = os.path.join(FIXTURE_DIR, ".complete")
    if not os.path.exists(marker):
        tmp = f"{FIXTURE_DIR}.tmp-{os.getpid()}"
        write_log_tree(tmp, rows=500, files_per_service=2)
        open(os.path.join(tmp, ".complete"), "w").close()
        try:
            os.rename(tmp, FIXTURE_DIR)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # another process won
    return FIXTURE_DIR
