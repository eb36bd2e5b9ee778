"""Golden end-to-end tests: Spark CloudFront pipeline vs pure-Python oracle.

Strategy per SURVEY.md §5.2: synthetic .gz log (2 header lines + N rows)
→ engine → compare emitted JSON wire records field-for-field against
expectations computed by an independent reimplementation of the
reference's per-row transform (cloudfront_kinesis_lambda.py:191-212).
"""

from __future__ import annotations

import json

import pytest

from cloudfront_kinesis_log_lambda_spark.operators.transforms import (
    cloudfront_wire_pipeline,
    transform_cloudfront,
)
from cloudfront_kinesis_log_lambda_spark.schema import OUTPUT_FIELD_ORDER
from cloudfront_kinesis_log_lambda_spark.sources.cloudfront import read_cloudfront_logs
from cloudfront_kinesis_log_lambda_spark.testing.fixtures import (
    write_log_file,
    write_log_tree,
)
from cloudfront_kinesis_log_lambda_spark.testing.oracle import expected_wire_data

ENV, SID = "stg", "bf574f33-66e3-4936-a0b6-420325157173"


@pytest.fixture(scope="module")
def log_file(tmp_path_factory):
    base = tmp_path_factory.mktemp("cf")
    path = str(base / "cloudfront" / ENV / SID / "EGI5P51QNDZ.2019-01-18-02.aa.gz")
    rows = write_log_file(path, rows=400, seed=7)
    return path, rows


def test_wire_records_match_oracle_exact_json(spark, log_file):
    """Byte-exact wire parity (exact_json + exact unquote fidelity)."""
    path, rows = log_file
    df = read_cloudfront_logs(spark, path)
    wire = cloudfront_wire_pipeline(
        df, env=ENV, service_id=SID, ua_fidelity="exact", exact_json=True
    )
    got = wire.collect()
    assert len(got) == len(rows)
    expected = sorted(expected_wire_data(r, ENV, SID) for r in rows)
    assert sorted(r["Data"] for r in got) == expected
    # PartitionKey: uuid4().hex shape — 32 lowercase hex chars, all distinct
    keys = [r["PartitionKey"] for r in got]
    assert all(len(k) == 32 and set(k) <= set("0123456789abcdef") for k in keys)
    assert len(set(keys)) == len(keys)


def test_wire_records_identical_under_non_utc_session(spark, log_file):
    """r12 (ADVICE r11): the wire Data payload must be byte-identical
    from ANY producing session — the reference always runs on UTC Lambda
    hosts, so a non-UTC Spark session must not leak its zone into
    @timestamp (the only time-derived wire field). Fails against the
    pre-fix date_format(ts, "...xxx") add_timestamp."""
    path, _ = log_file
    df = read_cloudfront_logs(spark, path)
    utc = sorted(
        r["Data"]
        for r in cloudfront_wire_pipeline(df, env=ENV, service_id=SID).collect()
    )
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = sorted(
            r["Data"]
            for r in cloudfront_wire_pipeline(
                df, env=ENV, service_id=SID
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)
    assert ny == utc


def test_wire_records_fast_path_semantics(spark, log_file):
    """Default JVM path: same parsed payload, same key order."""
    path, rows = log_file
    df = read_cloudfront_logs(spark, path)
    wire = cloudfront_wire_pipeline(df, env=ENV, service_id=SID)
    got = sorted(r["Data"] for r in wire.collect())
    expected = sorted(expected_wire_data(r, ENV, SID) for r in rows)
    for g, e in zip(got, expected):
        gd, ed = json.loads(g), json.loads(e)
        assert gd == ed
        assert list(gd) == list(ed) == list(OUTPUT_FIELD_ORDER)


def test_multi_file_enrichment_from_path(spark, tmp_path):
    """env/serviceId derived per-file from the scan path in ONE job —
    the engine's upgrade over one-Lambda-per-file."""
    paths = write_log_tree(str(tmp_path), rows=50)
    df = read_cloudfront_logs(spark, [str(tmp_path)])
    out = transform_cloudfront(df)
    combos = {(r["env"], r["serviceId"]) for r in out.select("env", "serviceId").distinct().collect()}
    assert combos == {("prod", SID), ("stg", SID)}
    assert out.count() == 50 * len(paths)


def test_header_lines_skipped(spark, log_file):
    path, rows = log_file
    df = read_cloudfront_logs(spark, path)
    assert df.count() == len(rows)  # the two '#' lines are not rows


def test_transform_drops_exactly_three_fields(spark, log_file):
    path, _ = log_file
    df = read_cloudfront_logs(spark, path)
    out = transform_cloudfront(df, env=ENV, service_id=SID)
    assert set(out.columns) == set(OUTPUT_FIELD_ORDER)
    # comment-only "stripped" fields must SURVIVE (SURVEY.md §1.4.1)
    for kept in ("http_query", "http_cookie", "xff", "fle-status"):
        assert kept in out.columns


def test_registry_status_rollup_matches_inline_recompute(spark):
    """The registry's cloudfront_status_rollup (whose one-time driver
    pass is deferred to r6) gets its value gate HERE: the registry
    callable must equal a from-scratch recompute over the same enriched
    fixture — a wrong column, broken substring, or bad groupBy in the
    registry function fails this, not a future round."""
    from pyspark.sql import functions as F

    from cloudfront_kinesis_log_lambda_spark.plans.registry import (
        _fixture_dir,
        cloudfront_status_rollup,
    )

    got = {
        (r["env"], r["status_class"]): (
            r["n_requests"], r["bytes_sent"], r["n_client_ips"],
        )
        for r in cloudfront_status_rollup(spark, "unused").collect()
    }
    enriched = transform_cloudfront(read_cloudfront_logs(spark, _fixture_dir()))
    rows = enriched.select("env", "http_status", "bytes_sent", "src_ip").collect()
    expect: dict = {}
    for r in rows:
        key = (r["env"], r["http_status"][:1])
        n, b, ips = expect.get(key, (0, 0, set()))
        ips = set(ips) | {r["src_ip"]}
        expect[key] = (n + 1, b + int(r["bytes_sent"]), ips)
    expect = {k: (n, b, len(ips)) for k, (n, b, ips) in expect.items()}
    assert got == expect and got


def test_empty_tsv_field_reads_as_empty_string_not_null(spark, tmp_path):
    """Wire fidelity for EMPTY fields: csv.DictReader yields '' for two
    adjacent tabs, so the reference's json.dumps emits "field": "" —
    Spark's default nullValue="" would instead read NULL and the wire
    JSON would say null (or omit the field). Short rows must still
    produce real NULLs (DictReader's None for missing trailing
    fields)."""
    import gzip

    from cloudfront_kinesis_log_lambda_spark.schema import FIELDNAMES as RAW_FIELD_ORDER

    d = tmp_path / "logs" / "prod" / "svc"
    d.mkdir(parents=True)
    vals = [f"v{i}" for i in range(len(RAW_FIELD_ORDER))]
    idx = RAW_FIELD_ORDER.index("http_query")
    vals[idx] = ""  # empty mid-row field
    full_line = "\t".join(vals)
    short_vals = ["s0"] + vals[1:5]
    short_line = "\t".join(short_vals)  # missing trailing fields
    with gzip.open(d / "x.gz", "wt") as f:
        f.write("#Version: 1.0\n" + full_line + "\n" + short_line + "\n")
    rows = {r[RAW_FIELD_ORDER[0]]: r for r in
            read_cloudfront_logs(spark, str(tmp_path / "logs")).collect()}
    assert rows["v0"]["http_query"] == ""   # empty field stays ''
    assert rows["v0"][RAW_FIELD_ORDER[idx + 1]] == vals[idx + 1]
    assert rows["v0"][RAW_FIELD_ORDER[-1]] == vals[-1]
    # short row: present fields read, missing trailing fields are NULL
    assert rows["s0"][RAW_FIELD_ORDER[4]] == vals[4]
    assert rows["s0"][RAW_FIELD_ORDER[5]] is None
    assert rows["s0"][RAW_FIELD_ORDER[-1]] is None


def test_tsv_parse_fuzz_matches_dictreader(spark, tmp_path):
    """Cross-implementation fuzz of the split()-based parse: random TSV
    lines — empty fields, short rows, EXTRA fields, '#' comments — must
    produce exactly what csv.DictReader(fieldnames=FIELDNAMES) yields
    (missing trailing → None, extras discarded)."""
    import csv
    import gzip
    import random

    from cloudfront_kinesis_log_lambda_spark.schema import FIELDNAMES

    rng = random.Random(99)
    n_fields = len(FIELDNAMES)
    lines = []
    for i in range(60):
        width = rng.choice([n_fields, n_fields, rng.randrange(1, n_fields),
                            n_fields + rng.randrange(1, 4)])
        vals = [
            "" if rng.random() < 0.15 else f"r{i}f{j}" for j in range(width)
        ]
        vals[0] = f"row{i}"  # unique join key
        lines.append("\t".join(vals))
    d = tmp_path / "logs" / "prod" / "svc"
    d.mkdir(parents=True)
    with gzip.open(d / "x.gz", "wt") as f:
        f.write("#Version: 1.0\n#Fields: ...\n" + "\n".join(lines) + "\n")

    got = {
        r[FIELDNAMES[0]]: {n: r[n] for n in FIELDNAMES}
        for r in read_cloudfront_logs(spark, str(tmp_path / "logs")).collect()
    }
    reader = csv.DictReader(lines, fieldnames=FIELDNAMES, delimiter="\t")
    expect = {}
    for row in reader:
        row.pop(None, None)  # DictReader stashes extras under None
        expect[row[FIELDNAMES[0]]] = dict(row)
    assert got == expect
