"""Numeric-hostile input contracts (r14 differential sweep: the full
registry ran against tables with NaN/±Inf/extreme/denormal floats,
zero-norm vectors, and int64-boundary/negative ids — Spark vs DuckDB
over the same files; tools/make_hostile_sf.py builds the tables).

At 100 TB every one of these shapes exists somewhere in the keyspace:
a NaN sensor reading, a zero embedding from a failed encoder, a
hash-derived negative id. The sweep found 33 failures in
multi-round-green code across four classes, all fixed and pinned here:

1. ANSI DIVIDE_BY_ZERO crashes in the exact-cosine family on zero-norm
   vectors (one garbage row killed every top-k / pairs / RRF / eval
   query) → the positive-finite-norm participation contract
   (similarity._cos_safe + _finite_filter, oracle-mirrored manually
   because DuckDB's list_cosine_similarity CLAMPS NaN/zero to -1).
2. ANSI Decimal overflow crashes in the decimal-exact statistics on a
   single 1e308 reading → explicit decimal-domain guards
   (util.in_decimal_domain), out-of-domain readings are missing.
3. Engine-vs-oracle divergence on NaN in domain filters (`> 0` admits
   NaN under BOTH engines' NaN-is-greatest ordering) and in robust
   stats (pandas median skips NaN, DuckDB sorts it greatest) →
   explicit finite-domain guards (util.finite, util.in_variance_domain).
4. SILENT DATA LOSS in the incremental twins: `id % k == wave` residue
   splits drop every negative id (Spark % keeps the sign), and the
   id-tercile "time-ordered" wave driver delivered late-timestamp
   boundary ids out of order → pmod residue waves + (ts, event_id)-rank
   terciles; plus the JSON wire transporting NaN as a bare non-RFC
   token that nulls the whole record on decode → non-finite doubles
   encode as JSON null.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

NAN = float("nan")
INF = float("inf")
I64_MAX = 2**63 - 1
I64_MIN = -(2**63)
DBL_MAX = 1.7976931348623157e308


@pytest.fixture()
def hostile_emb(spark):
    """Five clean vectors + zero-norm + NaN-element + Inf-element, with
    boundary ids on the hostile rows."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.5, 0.5, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (I64_MAX, [0.0, 0.0, 0.0, 0.0]),  # zero norm
        (I64_MIN, [NAN, 0.5, 0.5, 0.5]),  # NaN element
        (-1, [INF, 0.5, 0.5, 0.5]),  # Inf element
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_survives_and_excludes_non_participating(spark, hostile_emb):
    """Pre-fix: the zero-norm vector crashed the whole query with ANSI
    DIVIDE_BY_ZERO. Post-fix: garbage vectors neither crash nor crowd
    out real neighbors (NaN sorts greatest in BOTH engines, so an
    unfiltered NaN cos would deterministically TOP the ranking)."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        cosine_topk,
    )

    got = cosine_topk(hostile_emb, query_vec_id=0, k=10).collect()
    ids = [r.vec_id for r in got]
    assert ids and set(ids) <= {1, 2, 3, 4}, ids
    assert ids[0] == 1  # the true nearest neighbor, not a NaN row
    assert all(r.cos is not None and math.isfinite(r.cos) for r in got)


def test_cosine_pairs_exact_excludes_zero_and_nan_vectors(spark, hostile_emb):
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        cosine_pairs_exact,
    )

    got = cosine_pairs_exact(hostile_emb, threshold=0.3).collect()
    touched = {r.id_a for r in got} | {r.id_b for r in got}
    assert touched and touched <= {0, 1, 2, 3, 4}
    assert all(math.isfinite(r.cos) for r in got)


def test_zero_norm_query_vector_yields_empty_topk(spark, hostile_emb):
    """A query with no direction has no neighbors — empty, not a crash
    (the documented degenerate of the participation contract)."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        cosine_topk,
    )

    assert cosine_topk(hostile_emb, query_vec_id=I64_MAX, k=5).count() == 0


def test_quantize_int8_marks_non_finite_vectors_null(spark, hostile_emb):
    """Non-finite vectors quantize to scale=NULL/codes=NULL — an
    explicit missing marker, not engine-dependent garbage codes
    (Spark's floor(NaN) and DuckDB's CAST(NaN AS INT) disagree)."""
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        quantize_int8,
    )

    rows = {r.vec_id: r for r in quantize_int8(hostile_emb).collect()}
    assert rows[I64_MIN].scale is None and rows[I64_MIN].codes is None
    assert rows[-1].scale is None and rows[-1].codes is None
    # zero vector stays IN-domain: scale 0, all-zero codes
    assert rows[I64_MAX].scale == 0.0 and list(rows[I64_MAX].codes) == [0] * 4
    assert rows[0].scale == pytest.approx(1.0 / 127.0)
    assert list(rows[0].codes) == [127, 0, 0, 0]


def test_quantized_topk_skips_null_code_rows(spark, hostile_emb):
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        quantized_dot_topk,
    )

    ids = [r.vec_id for r in quantized_dot_topk(hostile_emb, query_vec_id=0, k=10).collect()]
    assert set(ids) <= {1, 2, 3, 4, I64_MAX}  # zero vector scores 0.0, allowed


def test_quantize_int8_null_element_vector_is_null_both_engines(
    spark, tmp_path
):
    """r15 ADVICE pin: a vector with a NULL ELEMENT. The engine's
    F.forall yields NULL (→ scale=NULL/codes=NULL); the oracle's old
    `NOT isfinite(x)` filter DROPPED the NULL-predicate element and
    read the vector as finite, emitting codes — latent divergence. The
    null-strict spelling `isfinite(x) IS NOT TRUE` closes it."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cloudfront_kinesis_log_lambda_spark.functions.oracles import ORACLE_SQL
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        quantize_int8,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.5, None, 0.5, 0.5]),  # NULL element
        (2, [0.9, 0.1, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert got[1].scale is None and got[1].codes is None
    assert got[0].codes is not None and got[2].codes is not None

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path / 'embeddings.parquet'}'"
    )
    oracle = {
        r[0]: r
        for r in con.execute(
            ORACLE_SQL["embedding_quantize_int8"]
        ).fetchall()
    }
    assert oracle[1][1] is None and oracle[1][2] is None
    assert oracle[0][2] is not None and oracle[2][2] is not None
    # the serving path excludes the NULL-code row on both sides
    ann = con.execute(ORACLE_SQL["ann_quantized_topk"]).fetchall()
    assert 1 not in {r[0] for r in ann}


def _events(spark, values, ids=None):
    base = __import__("datetime").datetime(2024, 1, 1)
    rows = [
        (
            (ids[i] if ids else i),
            base + __import__("datetime").timedelta(minutes=i),
            i % 3,
            "click",
            v,
            "{}",
        )
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_ddsketch_domain_is_positive_finite(spark, tmp_path):
    """`value > 0` ALONE admits NaN under both engines' NaN ordering;
    the sketch's log-bucket then crashes the DuckDB twin and leaves an
    engine-dependent bucket in Spark. Domain = positive finite."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cloudfront_kinesis_log_lambda_spark.operators.sketch import (
        events_value_ddsketch,
    )

    df = _events(spark, [1.0, 2.0, 4.0, NAN, INF, -INF, -1.0, 0.0])
    df.toPandas().pipe(
        lambda p: pq.write_table(
            pa.Table.from_pandas(p, preserve_index=False),
            str(tmp_path / "events.parquet"),
        )
    )
    out = events_value_ddsketch(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].n_values == 3  # only 1.0, 2.0, 4.0 indexed
    assert math.isfinite(out[0].p50)


def test_psi_geometry_ignores_non_finite(spark):
    """One NaN reading must not poison vmax (NaN is MAX's greatest on
    both engines), which would collapse every bin expression to NaN."""
    from cloudfront_kinesis_log_lambda_spark.operators.quality import (
        psi_ref_stats,
    )

    e = _events(spark, [1.0, 5.0, NAN, INF, -INF])
    got = psi_ref_stats(e, "event_type", "value").collect()
    assert len(got) == 1
    assert got[0].vmin == 1.0 and got[0].vmax == 5.0


def test_median_udaf_excludes_non_finite(spark, tmp_path, monkeypatch):
    """pandas median SKIPS NaN while DuckDB sorts it greatest — the
    exclusion is explicit and oracle-mirrored."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cloudfront_kinesis_log_lambda_spark.operators.pandas_grouped import (
        events_median_udaf,
    )

    df = _events(spark, [1.0, 2.0, 3.0, NAN, INF], ids=[0, 1, 2, 3, 4])
    df.toPandas().pipe(
        lambda p: pq.write_table(
            pa.Table.from_pandas(p, preserve_index=False),
            str(tmp_path / "events.parquet"),
        )
    )
    got = {r.user_id: r.median_value for r in events_median_udaf(spark, str(tmp_path)).collect()}
    # user 0 saw [1.0, NaN] -> median over finite = 1.0; user 1 saw
    # [2.0, inf] -> 2.0; user 2 saw [3.0] -> 3.0
    assert got == {0: 1.0, 1: 2.0, 2: 3.0}


def test_zscore_excludes_variance_overflow_values(spark):
    """A value whose square exceeds DBL_MAX overflows any
    sum-of-squares variance — Spark silently reads Inf/NaN, DuckDB's
    STDDEV_SAMP raises. Out-of-domain rows get no z-score."""
    from cloudfront_kinesis_log_lambda_spark.operators.pandas_grouped import (
        zscore_by_group,
    )

    df = _events(spark, [1.0, 2.0, 3.0, DBL_MAX, NAN], ids=[0, 1, 2, 3, 4])
    out = zscore_by_group(df, "user_id", "value", ["event_id"]).collect()
    assert {r.event_id for r in out} == {0, 1, 2}
    assert all(r.z is not None and math.isfinite(r.z) for r in out)


def test_linear_trend_excludes_decimal_overflow(spark):
    """Pre-fix: one 1e308 reading crashed the whole statistic with
    NUMERIC_VALUE_OUT_OF_RANGE under ANSI. Post-fix: out-of-domain
    readings are missing (documented DECIMAL(18,3) domain)."""
    from cloudfront_kinesis_log_lambda_spark.operators.timeseries import (
        linear_trend_partials,
    )

    e = _events(spark, [1.0, 2.0, 3.0, DBL_MAX, -DBL_MAX, NAN])
    got = linear_trend_partials(e).collect()
    assert len(got) == 1
    assert got[0].n == 3  # the three in-domain readings


def test_pmod_residue_waves_partition_boundary_ids(spark):
    """The r14 silent-data-loss find: `id % k == wave` drops every
    negative id (Spark % keeps the dividend's sign, so -1 % 3 = -1
    matches NO wave). pmod residue waves must cover each row exactly
    once, including int64 boundaries."""
    ids = [I64_MIN, -7, -1, 0, 1, 2, 3, I64_MAX]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    waves = [
        df.filter(F.pmod(F.col("doc_id"), F.lit(3)) == w) for w in range(3)
    ]
    counts = [w.count() for w in waves]
    assert sum(counts) == len(ids)
    seen = sorted(r.doc_id for w in waves for r in w.collect())
    assert seen == sorted(ids)
    # the legacy split provably loses the negatives
    legacy = sum(
        df.filter(F.col("doc_id") % 3 == w).count() for w in range(3)
    )
    assert legacy == len([i for i in ids if i >= 0])


def test_time_ordered_waves_follow_ts_not_id(spark):
    """The id-tercile wave driver leaned on event_id being written in
    ts order; hostile rows (early ts, boundary id) arrived out of time
    order and the state store bridged WRONG transition pairs. Waves
    are now (ts, event_id)-rank terciles: arrival order == time order
    for ANY table."""
    import datetime as dt

    from cloudfront_kinesis_log_lambda_spark.plans.registry import (
        _drive_time_ordered_waves,
    )

    base = dt.datetime(2024, 1, 1)
    # event_id order deliberately CONTRADICTS ts order
    rows = [
        (I64_MAX, base + dt.timedelta(hours=0)),
        (5, base + dt.timedelta(hours=1)),
        (I64_MIN, base + dt.timedelta(hours=2)),
        (4, base + dt.timedelta(hours=3)),
        (100, base + dt.timedelta(hours=4)),
        (0, base + dt.timedelta(hours=5)),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    seen: list[list] = []
    _drive_time_ordered_waves(
        lambda batch, wave: seen.append(
            sorted(r.ts for r in batch.collect())
        ),
        df,
    )
    assert [len(w) for w in seen] == [2, 2, 2]
    # every ts in wave i precedes every ts in wave i+1
    assert max(seen[0]) < min(seen[1]) < max(seen[1]) < min(seen[2])


def test_json_wire_has_no_bare_nan_tokens():
    """python json.dumps emits bare NaN/Infinity by default — non-RFC
    tokens Spark's get_json_object rejects, nulling EVERY field of the
    record (the row then collapses into a null-key dedup group). The
    wire contract encodes non-finite doubles as JSON null."""
    import json

    # the failure mode this guards against
    assert json.dumps({"v": NAN}) == '{"v": NaN}'
    v = NAN
    encoded = json.dumps({"v": v if v is not None and math.isfinite(v) else None})
    assert encoded == '{"v": null}'
    assert json.loads(encoded)["v"] is None


def test_wordpiece_caps_pathological_word_length():
    """BERT's max_input_chars_per_word rule (r14 string-axis sweep): a
    single 10k-char token made the oracle's per-position recursion
    grind for 27 minutes; the capped rule answers instantly with [UNK],
    which is also what real WordPiece deployments emit."""
    from cloudfront_kinesis_log_lambda_spark.functions.subword import (
        MAX_WORD_CHARS,
        tokenize_word,
    )

    assert tokenize_word("x" * (MAX_WORD_CHARS + 1)) == (1, True)
    # at the cap the scan still runs (all-'x' matches the char pieces)
    n, unk = tokenize_word("x" * MAX_WORD_CHARS)
    assert not unk and n == MAX_WORD_CHARS


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )


def test_bigint_cast_domain_excludes_overflow_quantities(spark, tmp_path):
    """r14 TPC-H axis: a max-double quantity crashed order_item_arrays
    with ANSI CAST_OVERFLOW (and would error DuckDB's CAST outright).
    Quantities outside ±2^63 are missing by the documented domain."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cloudfront_kinesis_log_lambda_spark.operators.relational import (
        order_item_arrays,
    )

    ship = dt.datetime(1996, 1, 1)
    rows = [
        (1, 1, 1, 1, 5.0, 100.0, 0.1, 0.02, "N", "O", ship),
        (1, 2, 2, 2, 3.0, 50.0, 0.0, 0.0, "N", "O", ship),
        (2, 3, 3, 1, DBL_MAX, 10.0, 0.0, 0.0, "R", "F", ship),
        (2, 4, 4, 2, NAN, 10.0, 0.0, 0.0, "R", "F", ship),
    ]
    df = _lineitem(spark, rows)
    df.toPandas().pipe(
        lambda p: pq.write_table(
            pa.Table.from_pandas(p, preserve_index=False),
            str(tmp_path / "lineitem.parquet"),
        )
    )
    got = {r.l_orderkey: r for r in order_item_arrays(spark, str(tmp_path)).collect()}
    assert got[1].n_items == 2 and got[1].qty_csv == "3,5"
    assert 2 not in got  # both of order 2's rows are out of domain


def test_histogram_and_percentiles_use_finite_domain(spark, tmp_path):
    """NaN/Inf prices have no bucket on the real line and place
    engine-dependently in percentile interpolation — excluded."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cloudfront_kinesis_log_lambda_spark.operators.relational import (
        order_price_histogram,
        order_price_percentiles,
    )

    od = dt.datetime(1996, 1, 1)
    rows = [
        (i, i, "O", p, od, "1-URGENT")
        for i, p in enumerate([100.0, 200.0, 300.0, NAN, INF, -INF])
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.toPandas().pipe(
        lambda p: pq.write_table(
            pa.Table.from_pandas(p, preserve_index=False),
            str(tmp_path / "orders.parquet"),
        )
    )
    hist = order_price_histogram(spark, str(tmp_path)).collect()
    assert sum(r.n_orders for r in hist) == 3
    assert all(math.isfinite(r.hi) and math.isfinite(r.lo) for r in hist)
    pct = order_price_percentiles(spark, str(tmp_path)).collect()
    assert len(pct) == 1 and pct[0].n_orders == 3
    assert pct[0].p50 == 200.0


def test_json_extraction_tolerates_schema_drift(spark, tmp_path):
    """r14 JSON-hostile probe: a props record whose k holds an OBJECT
    crashed the ANSI string->long cast in events_json_props (and the
    variant cast in events_variant_props); malformed JSON errored the
    DuckDB oracle outright. One schema-drifted record must read NULL,
    not kill the query — try_cast / try_variant_get semantics, mirrored
    with TRY_CAST(props AS JSON) in the oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cloudfront_kinesis_log_lambda_spark.operators.relational import (
        events_json_props,
        events_variant_props,
    )

    df = _events(spark, [1.0] * 6)
    pdf = df.toPandas()
    pdf["props"] = [
        '{"k": 2}',
        '{"k": 4}',
        '{"k": {"drift": 1}}',  # object-valued k
        '{"k": 1',  # truncated
        "not json",
        # r15 ADVICE pin: a VALID k beside an out-of-range sibling —
        # neither engine may null the whole record because an unrelated
        # field exceeds double range (DuckDB keeps JSON as raw text, so
        # TRY_CAST .. AS JSON accepts 1e999; Spark's get_json_object
        # extracts $.k without materializing $.j)
        '{"k": 3, "j": 1e999}',
    ]
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    j = events_json_props(spark, str(tmp_path)).collect()
    assert len(j) == 1
    assert j[0].n_events == 6 and j[0].sum_k == 9 and j[0].avg_k == 3.0
    v = events_variant_props(spark, str(tmp_path)).collect()
    assert len(v) == 1
    assert v[0].n_with_k == 3 and v[0].min_k == 2 and v[0].max_k == 4
    # the oracle must read the SAME k set from the same file — the
    # whole-document-validity divergence the r15 ADVICE flagged
    import duckdb

    from cloudfront_kinesis_log_lambda_spark.functions.oracles import ORACLE_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path / 'events.parquet'}'"
    )
    oj = con.execute(ORACLE_SQL["events_json_props"]).fetchall()
    assert len(oj) == 1 and oj[0][1] == 6 and oj[0][2] == 9
