"""Driver-contract consistency: the registry, oracle map, and rows-only
set must stay mutually coherent — a query added without an oracle (or an
oracle orphaned by a rename) is a silent loss of gate evidence."""

from __future__ import annotations

import inspect

import __spark_entry__ as entry

#: hash-seeded / nondeterministic / non-SQL ops — the ONLY queries
#: allowed to lack a DuckDB oracle twin. Adding here must be a conscious
#: decision (the driver records only a weak rows-only check for these).
ROWS_ONLY = {
    "near_dup_minhash_lsh",
    "simhash_near_pairs",
    "winnow_near_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_pairs_lsh",
    "sketch_event_stats",
    "stratified_event_sample",
    "cloudfront_enriched",
    "cloudfront_wire",
}


def test_every_query_has_oracle_or_documented_rows_only():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, f"orphan oracles (renamed query?): {sorted(o - q)}"
    missing = q - o
    assert missing == ROWS_ONLY, (
        f"undocumented rows-only: {sorted(missing - ROWS_ONLY)}; "
        f"stale ROWS_ONLY entries: {sorted(ROWS_ONLY - missing)}"
    )


def test_query_callables_take_spark_and_sf_dir():
    for name, fn in entry.queries().items():
        assert len(inspect.signature(fn).parameters) == 2, name


def test_bench_headline_queries_exist_in_registry():
    import bench

    q = set(entry.queries())
    missing = [n for n in bench.HEADLINE if n not in q]
    assert not missing, f"bench.py HEADLINE references unknown queries: {missing}"
