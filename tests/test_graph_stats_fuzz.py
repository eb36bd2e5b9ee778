"""Seeded-random fuzz of the math-heavy graph/stats operators against
first-principles pure-Python references (the test_stats_fuzz.py
pattern).

Why this exists when every one of these is oracle-checked: the DuckDB
oracle SQL mirrors the Spark plan's SHAPE, so an algebra bug shared by
both engines (wrong marginal, dropped term, off-by-one rank) hash-
matches green. A textbook-formula reference written without looking at
either plan is the only check that breaks that symmetry — the r8 chi²
NULL-category bug was exactly this class.
"""

from __future__ import annotations

import math
import random
from itertools import combinations

from cloudfront_kinesis_log_lambda_spark.operators import graph as G
from cloudfront_kinesis_log_lambda_spark.operators import stats as ST


# --- Pearson correlation matrix --------------------------------------------


def _pearson(xs, ys):
    n = len(xs)
    mx = sum(xs) / n
    my = sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (n - 1)
    vx = sum((x - mx) ** 2 for x in xs) / (n - 1)
    vy = sum((y - my) ** 2 for y in ys) / (n - 1)
    if vx == 0.0 or vy == 0.0:
        return None
    return cov / math.sqrt(vx * vy)


def test_corr_matrix_fuzz_vs_reference(spark):
    rng = random.Random(421)
    for trial in range(3):
        n = rng.randint(8, 40)
        # c: correlated with a; d: constant (NULL r against everything)
        rows = []
        for _ in range(n):
            a = rng.uniform(-5, 5)
            b = rng.uniform(-5, 5)
            c = 2.0 * a + rng.uniform(-0.5, 0.5)
            rows.append((a, b, c, 7.25))
        df = spark.createDataFrame(
            rows, "a double, b double, c double, d double"
        )
        got = {
            (r["col_a"], r["col_b"]): r["pearson_r"]
            for r in ST.corr_matrix(df, ["a", "b", "c", "d"]).collect()
        }
        cols = {"a": 0, "b": 1, "c": 2, "d": 3}
        for (ca, ci), (cb, cj) in combinations(cols.items(), 2):
            want = _pearson(
                [row[ci] for row in rows], [row[cj] for row in rows]
            )
            if want is None:
                assert got[(ca, cb)] is None, (trial, ca, cb)
            else:
                assert abs(got[(ca, cb)] - want) < 1e-6, (
                    trial,
                    ca,
                    cb,
                    got[(ca, cb)],
                    want,
                )


# --- two-proportion z-test -------------------------------------------------


def test_ztest_fuzz_vs_reference(spark):
    rng = random.Random(97)
    for trial in range(3):
        n_units = rng.randint(10, 60)
        rows = []
        unit_conv: dict[int, tuple[str, int]] = {}
        for u in range(n_units):
            arm = "A" if rng.random() < 0.5 else "B"
            conv = 0
            # several observation rows per unit; unit converts if ANY does
            for _ in range(rng.randint(1, 4)):
                c = rng.random() < (0.25 if arm == "A" else 0.4)
                conv |= int(c)
                rows.append((u, arm, c))
            unit_conv[u] = (arm, conv)
        # guarantee both arms non-empty
        rows += [(n_units, "A", False), (n_units + 1, "B", True)]
        unit_conv[n_units] = ("A", 0)
        unit_conv[n_units + 1] = ("B", 1)
        df = spark.createDataFrame(
            rows, "unit long, arm string, converted boolean"
        )
        got = ST.two_proportion_ztest(df, "unit", "arm", "converted").collect()
        assert len(got) == 1
        r = got[0]
        n_a = sum(1 for a, _ in unit_conv.values() if a == "A")
        n_b = sum(1 for a, _ in unit_conv.values() if a == "B")
        conv_a = sum(c for a, c in unit_conv.values() if a == "A")
        conv_b = sum(c for a, c in unit_conv.values() if a == "B")
        assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (
            n_a,
            conv_a,
            n_b,
            conv_b,
        ), trial
        # the two guarantee rows pin 0 < pooled p < 1, so se > 0 on
        # every trial (the se == 0 degenerate is pinned separately in
        # test_stats.py::test_ztest_degenerate_all_convert)
        p = (conv_a + conv_b) / (n_a + n_b)
        se = math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
        want_z = (conv_b / n_b - conv_a / n_a) / se
        assert abs(r["z"] - want_z) < 1e-6, (trial, r["z"], want_z)
        assert r["significant"] == (abs(want_z) > ST.AB_Z_CRITICAL)
        assert abs(r["lift"] - (conv_b / n_b - conv_a / n_a)) < 1e-6


# --- PageRank --------------------------------------------------------------


def _pagerank_reference(edges, iters, d):
    """Power iteration replicating the operator's documented variant:
    dangling mass dropped, base (1-d), ranks ROUND(·,12)-quantized per
    sweep (the cross-engine trajectory pin)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {v: 1.0 for v in nodes}
    for _ in range(iters):
        s = {v: 0.0 for v in nodes}
        # sequential (src-sorted) fold == the exact_fold aggregate
        for u, v in sorted(edges):
            s[v] += rank[u] / outdeg[u]
        rank = {
            v: round((1.0 - d) + d * s[v], G.PAGERANK_ROUND) for v in nodes
        }
    return rank


def test_pagerank_fuzz_vs_reference(spark):
    rng = random.Random(1009)
    for trial in range(3):
        n = rng.randint(5, 12)
        edges = sorted(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(rng.randint(n, 3 * n))
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["rank"]
            for r in G.pagerank(df, iters=5, exact_fold=True).collect()
        }
        want = _pagerank_reference(edges, 5, G.PAGERANK_DAMPING)
        assert set(got) == set(want), trial
        for v in want:
            assert abs(got[v] - want[v]) < 1e-9, (trial, v, got[v], want[v])


# --- triangle census -------------------------------------------------------


def test_triangle_stats_fuzz_vs_bruteforce(spark):
    rng = random.Random(271828)
    for trial in range(3):
        n = rng.randint(6, 14)
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n))
                    for _ in range(rng.randint(n, 4 * n))
                )
                if a != b
            }
        )
        if not edges:
            continue
        df = spark.createDataFrame(edges, "a long, b long")
        got = {
            r["node"]: (r["degree"], r["triangles"], r["clustering"])
            for r in G.triangle_stats(df).collect()
        }
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for v, nbrs in adj.items():
            deg = len(nbrs)
            tri = sum(
                1 for x, y in combinations(sorted(nbrs), 2) if y in adj[x]
            )
            cc = (
                round(2.0 * tri / (deg * (deg - 1)), 6) if deg >= 2 else 0.0
            )
            assert got[v] == (deg, tri, cc), (trial, v, got[v], (deg, tri, cc))
        assert set(got) == set(adj), trial


def test_triangle_stats_wide_ids_take_fallback_join(spark):
    """Node ids ≥ 2³¹ overflow the packed closing-join key, so the
    operator must take the two-column fallback — same census either
    way. K4 on shifted ids: every node has degree 3 and 3 triangles."""
    base = 1 << 40
    nodes = [base + i for i in range(4)]
    edges = [(a, b) for a, b in combinations(nodes, 2)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in G.triangle_stats(df).collect()
    }
    assert got == {v: (3, 3, 1.0) for v in nodes}


def test_triangle_stats_negative_ids_take_fallback_join(spark):
    """A NEGATIVE id breaks packed-key injectivity even when the max id
    is small — (y, 0) collides with (y+1, -2³²) — so the gate must
    probe the min id too and fall back. Census on K4 with mixed-sign
    ids must be exact."""
    nodes = [-(1 << 33), -7, 0, 5]
    edges = [(a, b) for a, b in combinations(nodes, 2)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in G.triangle_stats(df).collect()
    }
    assert got == {v: (3, 3, 1.0) for v in nodes}


def test_triangle_stats_adversarial_packed_collision_pair(spark):
    """The exact collision pair from the injectivity argument: the
    wedge (y=3, z=5) packs to 3·2³²+5, and an unrelated closing edge
    (4, 5−2³²) packs to 4·2³² + (5−2³²) = the SAME long. A correct
    gate (min id < 0 → fallback) keeps them distinct; the pre-fix
    packed path would close the wedge with the ghost edge and invent a
    triangle in a triangle-free forest."""
    ghost = 5 - (1 << 32)
    edges = [
        (1, 3), (1, 5),          # wedge (3, 5) centred at 1
        (4, ghost),              # the colliding closer edge
        # pendants pin the degree orientation: deg(3)=deg(5)=deg(ghost)=3
        # > deg(1)=2 > deg(4)=1, so (1,3)/(1,5) orient s=1 (wedge forms)
        # and (4, ghost) orients s=4, t=ghost (the colliding direction)
        (3, 100), (3, 101), (5, 102), (5, 103), (ghost, 200), (ghost, 201),
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["triangles"] for r in G.triangle_stats(df).collect()}
    assert all(t == 0 for t in got.values()), got
