"""Graph operators: planted-graph triangle census + PageRank
mode-agreement (the exact_fold oracle mode vs the order-free
production aggregation documented in operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.graph import (
    copurchase_edges,
    pagerank,
    triangle_stats,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a long, b long"
    )


def test_triangle_stats_planted_graph(spark):
    """K4 ∪ pendant ∪ isolated edge — every degree/triangle/clustering
    value computed by hand. K4 has C(4,3)=4 triangles, 3 through each
    of its nodes; the pendant vertex dilutes node 4's clustering to
    2·3/(4·3) = 0.5 without adding triangles."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    out = triangle_stats(_edges(spark, k4 + [(4, 5), (6, 7)]))
    got = {r["node"]: r for r in out.collect()}
    expect = {
        1: (3, 3, 1.0),
        2: (3, 3, 1.0),
        3: (3, 3, 1.0),
        4: (4, 3, 0.5),
        5: (1, 0, 0.0),
        6: (1, 0, 0.0),
        7: (1, 0, 0.0),
    }
    assert set(got) == set(expect)
    for n, (d, t, c) in expect.items():
        assert got[n]["degree"] == d, n
        assert got[n]["triangles"] == t, n
        assert got[n]["clustering"] == c, n
    # global triangle count: corner-count / 3
    assert sum(r["triangles"] for r in got.values()) == 3 * 4


def test_triangle_stats_star_has_no_wedges(spark):
    """Celebrity-skew shape: a star has zero triangles, and the degree
    orientation points every edge INTO the hub — the hub's oriented
    out-degree is 0, so the wedge join never fans out on it (the
    O(m^1.5) bound's load-bearing case)."""
    star = [(1, h) for h in range(2, 12)]  # hub 11 high? no: hub is 1
    out = triangle_stats(_edges(spark, star))
    rows = {r["node"]: r for r in out.collect()}
    assert rows[1]["degree"] == 10
    assert all(r["triangles"] == 0 for r in rows.values())
    assert all(r["clustering"] == 0.0 for r in rows.values())


def test_copurchase_edges_contract(spark, sf_dir):
    """Edge list is undirected-canonical (a < b), self-edge-free, and
    duplicate-free even when a part appears twice in one order."""
    e = copurchase_edges(spark, sf_dir)
    assert e.where(F.col("a") >= F.col("b")).count() == 0
    assert e.count() == e.distinct().count()


def test_pagerank_exact_fold_matches_production(spark):
    """The oracle-checked sequential-fold mode and the order-free
    production sum walk the same trajectory within float noise (both
    quantize to 12 decimals per sweep, so agreement is exact here)."""
    edges = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (2, 4), (5, 1)],
    ).selectExpr("a as src", "b as dst")
    a = {r["node"]: r["rank"] for r in pagerank(edges, exact_fold=True).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(edges, exact_fold=False).collect()}
    assert set(a) == set(b)
    for n in a:
        assert abs(a[n] - b[n]) < 1e-9, n
