"""Build a numeric-hostile scale dir — the input for the r14 hostile
differential sweep (VERDICT r13 item 3):

    python tools/make_hostile_sf.py [src_sf_dir] [dst_dir]
    python tools/check_correctness.py /tmp/sf-hostile

The empty (r13), 1-row (r13), and null-text (r13) sweeps each found
real bugs in multi-round-green code; this variant probes the NUMERIC
axis that none of them exercised: NaN / ±Inf / extreme-magnitude /
denormal floats in ``events.value`` and ``embeddings.embedding``,
zero-norm and float32-max vectors (GEMM threshold compares, cosine
normalization, DDSketch's log, decimal quantizations), and
int64-boundary / negative ids (hash bucketing, modulo partitioning,
id-ordered tiebreaks). At 100 TB every one of these shapes exists
somewhere in the keyspace.

Everything appended is deterministic (no RNG) and stays inside the
source tables' categorical domains (event_type, lang, label) so group
keys don't explode — only the numeric payloads are hostile. The sweep
compares Spark and DuckDB over the SAME files, so a mismatch is an
engine-semantics divergence, not a data artifact.
"""

from __future__ import annotations

import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

I64_MAX = 2**63 - 1
I64_MIN = -(2**63)
F32_MAX = 3.4028234663852886e38  # np.finfo(float32).max
F32_DENORMAL_MIN = 1.401298464324817e-45  # np.finfo(float32).smallest_subnormal


def _hostile_events(src: pa.Table) -> pa.Table:
    """Append NaN/±Inf/extreme ``value`` rows and int64-boundary ids."""
    ev_types = sorted(set(src.column("event_type").to_pylist()))
    base_ts = src.column("ts")[0].as_py()
    next_id = max(src.column("event_id").to_pylist()) + 1
    rows = [
        # (event_id, user_id, value) — ts/type/props stay in-domain
        (next_id + 0, 1, float("nan")),
        (next_id + 1, 2, float("inf")),
        (next_id + 2, 3, float("-inf")),
        (next_id + 3, I64_MAX, 1.7976931348623157e308),   # max double
        (next_id + 4, I64_MIN, -1.7976931348623157e308),
        (next_id + 5, -1, 5e-324),                        # min denormal
        (I64_MAX, 4, 2.5),                                # boundary event ids,
        (I64_MIN, 5, -2.5),                               # sane values
    ]
    extra = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([base_ts] * len(rows), src.schema.field("ts").type),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(
                [ev_types[i % len(ev_types)] for i in range(len(rows))],
                pa.string(),
            ),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
        }
    ).select(src.column_names)
    return pa.concat_tables([src, extra.cast(src.schema)])


def _hostile_embeddings(src: pa.Table) -> pa.Table:
    """Append zero-norm / NaN / ±Inf / float32-extreme vectors and
    int64-boundary ids. Vector shapes (dim preserved):

    - all-zero (zero norm: cosine denominators, normalize-then-GEMM)
    - one NaN element (NaN must not silently pass a GEMM ``>= thresh``)
    - one ±Inf element (Inf·0 = NaN inside dot products)
    - all float32-max (norm² overflows float32 → Inf in numpy paths)
    - all denormal-min (norm² underflows float32 → 0-division in numpy)
    """
    dim = len(src.column("embedding")[0])
    labels = sorted(set(src.column("label").to_pylist()))
    next_id = max(src.column("vec_id").to_pylist()) + 100
    nan_vec = [0.5] * dim
    nan_vec[0] = float("nan")
    inf_vec = [0.5] * dim
    inf_vec[1] = float("inf")
    ninf_vec = [0.5] * dim
    ninf_vec[2] = float("-inf")
    rows = [
        (I64_MAX, [0.0] * dim),
        (I64_MIN, nan_vec),
        (-1, inf_vec),
        (-2, ninf_vec),
        (next_id + 0, [F32_MAX] * dim),
        (next_id + 1, [F32_DENORMAL_MIN] * dim),
    ]
    extra = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], src.schema.field("embedding").type
            ),
            "label": pa.array(
                [labels[i % len(labels)] for i in range(len(rows))],
                src.schema.field("label").type,
            ),
        }
    ).select(src.column_names)
    return pa.concat_tables([src, extra.cast(src.schema)])


def _hostile_documents(src: pa.Table) -> pa.Table:
    """Append int64-boundary / negative doc ids with ordinary text —
    probes id hashing (split assign, shuffling, fingerprints) and
    id-ordered tiebreaks without re-running the r13 null-text axis."""
    langs = sorted(set(src.column("lang").to_pylist()))
    sources = sorted(set(src.column("source").to_pylist()))
    texts = [
        "boundary document alpha beta gamma delta epsilon zeta",
        "boundary document eta theta iota kappa lambda mu nu xi",
        "boundary document omicron pi rho sigma tau upsilon phi",
    ]
    ids = [I64_MAX, I64_MIN, -1]
    extra = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([langs[0]] * 3, pa.string()),
            "source": pa.array([sources[0]] * 3, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    ).select(src.column_names)
    return pa.concat_tables([src, extra.cast(src.schema)])


def _hostile_text_documents(src: pa.Table) -> pa.Table:
    """The STRING axis (r14 second sweep): unicode and shape extremes
    in ``documents.text`` — emoji/surrogate pairs, RTL scripts,
    zero-width characters, control characters, regex metacharacters,
    one 10k-char single token (tokenizer/BM25 dl/BPE pathology), and
    one 100k-char document (quadratic-guard probe). Real web corpora
    contain all of these on page one."""
    langs = sorted(set(src.column("lang").to_pylist()))
    sources = sorted(set(src.column("source").to_pylist()))
    next_id = max(src.column("doc_id").to_pylist()) + 1000
    texts = [
        "emoji corpus \U0001d11e \U0001f389 \U0001f600 pair \U0001f1fa\U0001f1f8 done",
        "مرحبا بالعالم rtl mixed with latin words",
        "zero​width‍joined words and nbsp spacing",
        "control\tchars\nnewline\rcarriage and backslash \\ quote \" mix",
        "regex meta ((( [[[ ))) ]]] *+?{2,} |pipe| $dollar ^caret",
        "x" * 10_000,
        # ~108k chars. NOT .strip()ped ×4000: that shape put doc_quality's
        # mean_token_len at EXACTLY 5.39995 (107999 chars / 20000 tokens) —
        # a round-half tie at the ROUND(·,4) quantization edge where Spark
        # and DuckDB legitimately disagree (the documented measure-zero
        # limitation of ROUND-quantized cross-engine comparison, cf. the
        # dd_bucket_sql note). The probe's job is shape extremity, not a
        # manufactured rounding paradox, so the tail word moves the mean
        # off the tie (108003/20001 = 5.39988…).
        ("lorem ipsum dolor sit amet " * 4_000) + "end",
        "UPPER lower MiXeD Éé Üü ß straße naïve",
    ]
    extra = pa.table(
        {
            "doc_id": pa.array(
                [next_id + i for i in range(len(texts))], pa.int64()
            ),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [langs[i % len(langs)] for i in range(len(texts))], pa.string()
            ),
            "source": pa.array([sources[0]] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    ).select(src.column_names)
    return pa.concat_tables([src, extra.cast(src.schema)])


def _hostile_lineitem(src: pa.Table) -> pa.Table:
    """TPC-H numeric axis: NaN/±Inf prices and discounts, max-double
    quantity, and DANGLING negative foreign keys — the relational
    entries (aggregates, percentiles, histograms, theta/outer/anti
    joins) have never seen a hostile row."""
    cols = {n: src.column(n).to_pylist()[:0] for n in src.column_names}
    base = src.slice(0, 6).to_pylist()
    hostile = []
    for i, r in enumerate(base):
        r = dict(r)
        r["l_orderkey"] = -(i + 1)  # dangling FK: no such order
        r["l_partkey"] = -(i + 1)
        r["l_suppkey"] = -(i + 1)
        hostile.append(r)
    hostile[0]["l_extendedprice"] = float("nan")
    hostile[1]["l_extendedprice"] = float("inf")
    hostile[2]["l_discount"] = float("nan")
    hostile[3]["l_quantity"] = 1.7976931348623157e308
    hostile[4]["l_tax"] = float("-inf")
    # row 5 keeps sane values: a purely dangling-key probe
    extra = pa.Table.from_pylist(hostile, schema=src.schema)
    del cols
    return pa.concat_tables([src, extra])


def _hostile_orders(src: pa.Table) -> pa.Table:
    """NaN/Inf totalprice + boundary/dangling keys on the orders side."""
    base = src.slice(0, 4).to_pylist()
    hostile = []
    for i, r in enumerate(base):
        r = dict(r)
        r["o_orderkey"] = I64_MAX - i if i % 2 == 0 else I64_MIN + i
        r["o_custkey"] = -(i + 1)  # dangling FK: no such customer
        hostile.append(r)
    hostile[0]["o_totalprice"] = float("nan")
    hostile[1]["o_totalprice"] = float("inf")
    hostile[2]["o_totalprice"] = 1.7976931348623157e308
    extra = pa.Table.from_pylist(hostile, schema=src.schema)
    return pa.concat_tables([src, extra])


_HOSTILE = {
    "events": _hostile_events,
    "embeddings": _hostile_embeddings,
    "documents": _hostile_documents,
}

def _hostile_json_events(src: pa.Table) -> pa.Table:
    """JSON axis: malformed / schema-drifted ``events.props`` — the
    semi-structured extraction entries' hostile probe. One truncated
    record, one non-JSON string, empty string, NULL, an OBJECT-valued
    k (schema drift: the crash class — an ANSI string→long cast on it
    killed the query), a 5k-char value, an array root, and a number
    beyond double range."""
    ev = sorted(set(src.column("event_type").to_pylist()))
    base_ts = src.column("ts")[0].as_py()
    next_id = max(src.column("event_id").to_pylist()) + 1
    props = [
        '{"k": 1',
        "not json at all",
        "",
        None,
        '{"k": {"deep": {"deeper": {"deepest": [1,2,3]}}}}',
        '{"k": "' + "x" * 5000 + '"}',
        "[1,2,3]",
        '{"k": null, "j": 1e999}',
        # r15 ADVICE pin: a VALID k next to an out-of-range sibling —
        # probes whether either engine nulls the whole record when an
        # unrelated field exceeds double range (both must still read
        # k=1; DuckDB stores JSON as raw text so 1e999 parses fine)
        '{"k": 1, "j": 1e999}',
    ]
    extra = pa.table(
        {
            "event_id": pa.array(
                [next_id + i for i in range(len(props))], pa.int64()
            ),
            "ts": pa.array([base_ts] * len(props), src.schema.field("ts").type),
            "user_id": pa.array(list(range(len(props))), pa.int64()),
            "event_type": pa.array(
                [ev[i % len(ev)] for i in range(len(props))], pa.string()
            ),
            "value": pa.array([1.0] * len(props), pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    ).select(src.column_names)
    return pa.concat_tables([src, extra.cast(src.schema)])


def _hostile_dates_events(src: pa.Table) -> pa.Table:
    """DATES axis (r15, VERDICT item 3): hostile instants in
    ``events.ts`` — the one value domain no prior sweep probed. Epoch
    zero, pre-epoch instants WITH sub-second parts (floor-div vs
    trunc-div in epoch math diverges exactly there), the proleptic
    extremes 0001/9999 (bucket-spine explosion probe: a single
    year-0001 row makes a data-derived hourly gapfill spine 87M buckets
    wide), US DST-seam instants (the engine pins UTC, but the ORACLES
    parse timestamps too), a leap-day with microseconds, and a NULL ts
    (Spark windows order NULLS FIRST, DuckDB NULLS LAST — every ordered
    operator diverges unless the oracle spells the null order). Payload
    values stay sane and in-domain: only the time axis is hostile."""
    import datetime as dt

    ev_types = sorted(set(src.column("event_type").to_pylist()))
    next_id = max(src.column("event_id").to_pylist()) + 1
    stamps = [
        dt.datetime(1970, 1, 1, 0, 0, 0),                      # epoch zero
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),         # -1 us
        dt.datetime(1969, 7, 20, 20, 17, 40),                  # pre-epoch
        dt.datetime(1, 1, 1, 0, 0, 0),                         # proleptic min
        dt.datetime(9999, 12, 31, 23, 59, 59, 999999),         # proleptic max
        dt.datetime(2021, 3, 14, 7, 30, 0),                    # US spring-fwd (UTC)
        dt.datetime(2021, 11, 7, 5, 30, 0),                    # US fall-back (UTC)
        dt.datetime(2000, 2, 29, 12, 34, 56, 789012),          # leap day + us
        None,                                                  # NULL ts
    ]
    # DENSE cross product (r15 second pass): one hostile row per
    # (stamp, event_type), users spread over the real id range and
    # DISTINCT exact values. The first sweep planted 9 rows with a
    # cyclic type and value=1.0, and event_transitions passed by pure
    # count-multiset COINCIDENCE while hiding a real NULL-ordering
    # divergence (the NULL row's type never hit a type-filtered ordered
    # operator, and equal values made mis-picked open/close invisible).
    # Density is what makes a differential fixture adversarial: every
    # type-filtered / per-user-ordered operator must meet every hostile
    # instant, with values that make any mis-ordering change the hash.
    rows = [
        (s, t) for s in stamps for t in ev_types
    ]
    extra = pa.table(
        {
            "event_id": pa.array(
                [next_id + i for i in range(len(rows))], pa.int64()
            ),
            "ts": pa.array([r[0] for r in rows], src.schema.field("ts").type),
            "user_id": pa.array(
                [1 + (7 * i) % 30 for i in range(len(rows))], pa.int64()
            ),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array(
                [1.0 + i * 0.125 for i in range(len(rows))], pa.float64()
            ),
            "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
        }
    ).select(src.column_names)
    return pa.concat_tables([src, extra.cast(src.schema)])


def _hostile_dates_orders(src: pa.Table) -> pa.Table:
    """Hostile ``o_orderdate`` instants on otherwise-valid orders (keys
    stay referentially intact so the dates FLOW THROUGH joins)."""
    import datetime as dt

    base = src.slice(0, 6).to_pylist()
    next_key = max(src.column("o_orderkey").to_pylist()) + 1
    stamps = [
        dt.datetime(1970, 1, 1, 0, 0, 0),
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
        dt.datetime(1, 1, 1, 0, 0, 0),
        dt.datetime(9999, 12, 31, 23, 59, 59, 999999),
        None,
        dt.datetime(2000, 2, 29, 12, 34, 56, 789012),
    ]
    hostile = []
    for i, r in enumerate(base):
        r = dict(r)
        r["o_orderkey"] = next_key + i
        r["o_orderdate"] = stamps[i]
        hostile.append(r)
    extra = pa.Table.from_pylist(hostile, schema=src.schema)
    return pa.concat_tables([src, extra])


def _hostile_dates_lineitem(src: pa.Table) -> pa.Table:
    """Hostile ``l_shipdate`` instants; order/part/supp keys stay valid
    (copied from real rows), linenumbers bumped for uniqueness."""
    import datetime as dt

    base = src.slice(0, 6).to_pylist()
    stamps = [
        dt.datetime(1970, 1, 1, 0, 0, 0),
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
        dt.datetime(1, 1, 1, 0, 0, 0),
        dt.datetime(9999, 12, 31, 23, 59, 59, 999999),
        None,
        dt.datetime(2000, 2, 29, 12, 34, 56, 789012),
    ]
    hostile = []
    for i, r in enumerate(base):
        r = dict(r)
        r["l_linenumber"] = 90 + i
        r["l_shipdate"] = stamps[i]
        hostile.append(r)
    extra = pa.Table.from_pylist(hostile, schema=src.schema)
    return pa.concat_tables([src, extra])


_AXES = {
    # numeric axis (the r14 first sweep): events/embeddings/documents
    "numeric": _HOSTILE,
    # string axis: unicode/shape extremes in the text corpus
    "strings": {"documents": _hostile_text_documents},
    # TPC-H axis: hostile numerics + dangling keys in the fact tables
    "tpch": {"lineitem": _hostile_lineitem, "orders": _hostile_orders},
    # JSON axis: malformed/drifted semi-structured props
    "json": {"events": _hostile_json_events},
    # DATES axis: hostile instants in every timestamp column
    "dates": {
        "events": _hostile_dates_events,
        "orders": _hostile_dates_orders,
        "lineitem": _hostile_dates_lineitem,
    },
}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--axis")]
    axis = "numeric"
    for a in sys.argv[1:]:
        if a.startswith("--axis="):
            axis = a.split("=", 1)[1]
    src = args[0] if args else "/root/testdata/sf0.01"
    dst = args[1] if len(args) > 1 else f"/tmp/sf-hostile-{axis}"
    hostile = _AXES[axis]
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        table = pq.read_table(f"{src}/{t}.parquet")
        if t in hostile:
            n0 = table.num_rows
            table = hostile[t](table)
            print(f"{t}: {n0} -> {table.num_rows} rows (+{table.num_rows - n0} hostile)")
        pq.write_table(table, f"{dst}/{t}.parquet")
    print(f"wrote {len(TABLES)} tables to {dst} (axis={axis})")


if __name__ == "__main__":
    main()
