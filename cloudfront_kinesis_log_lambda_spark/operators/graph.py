"""Iterative graph analytics: PageRank over a derived trade graph.

Connected components (pointer jumping) lives in operators/dedup.py;
this module adds the other canonical iterative-graph shape — a
fixed-iteration damped PageRank — expressed as a driver-side loop of
DataFrame steps with per-iteration ``localCheckpoint`` lineage
truncation (the house rule for iterative operators: the plan must not
grow with the iteration count).

Exactness contract: the per-node contribution sum is computed TWO ways.
``exact_fold=True`` (the oracle-checked registry mode) folds the
contributions in (src)-sorted order with the ``aggregate``
higher-order function — a sequential IEEE-double fold DuckDB replays
bit-for-bit with ``list_reduce`` inside a recursive CTE, making a
10-iteration damped PageRank fully hash-checkable (no tolerance, no
rows-only downgrade). ``exact_fold=False`` is the production mode: a
plain ``F.sum`` (order-free partial aggregation, no per-node array) —
the scale path when in-degrees are millions. A test pins both modes to
agree within float noise.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.dedup import ordered_pairs
from cloudfront_kinesis_log_lambda_spark.operators.relational import load

PAGERANK_ITERS = 10
PAGERANK_DAMPING = 0.85
PAGERANK_ROUND = 12

#: r15 optimization gates (guide §3.1: pick the join strategy
#: deliberately — broadcast the side that FITS, shuffle otherwise).
#: Both are measured row counts collected from already-materialized
#: inputs (one tiny aggregate each), not size estimates, so the gate
#: can't be fooled by a localCheckpoint's unknown statistics. The
#: defaults keep the broadcast relation in the tens-of-MB range
#: (2 M ranks ≈ 32 MB of (long, double); 2 M oriented edges ≈ 48 MB of
#: 3 longs) — inside the "few hundred MB is fine" broadcast envelope
#: with full headroom on the 8 GB driver; env-tunable for clusters
#: with bigger or smaller drivers. Above the gate the operators keep
#: their shuffle formulation — correct at any scale.
PAGERANK_BROADCAST_MAX_NODES = int(
    os.environ.get("SPARK_GRAFT_PAGERANK_BROADCAST_MAX_NODES", "2000000")
)
TRIANGLE_BROADCAST_MAX_EDGES = int(
    os.environ.get("SPARK_GRAFT_TRIANGLE_BROADCAST_MAX_EDGES", "2000000")
)


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (customer-nation → supplier-nation) edges of the trade
    graph: lineitem ⋈ orders ⋈ customer ⋈ supplier projected to nation
    keys. Both dimension joins broadcast; the fact-side join reduces to
    keys before anything wide, and the distinct collapses to ≤ |N|²
    rows."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
    exact_fold: bool = True,
    ckpt_every: int = 2,
) -> DataFrame:
    """Damped PageRank over a directed edge list, fixed ``iters``
    sweeps: rank(v) ← (1−d) + d·Σ_{u→v} rank(u)/outdeg(u), ranks
    quantized with ROUND(·, 12) each sweep so the Spark loop and the
    DuckDB recursive-CTE replay stay on the identical trajectory.
    Dangling mass is dropped (documented variant — nodes with no
    in-edges hold rank 1−d); node set = edge endpoints.

    Per sweep: one shuffle (contributions keyed by dst) joined back to
    the static node spine; lineage truncated by localCheckpoint every
    ``ckpt_every`` sweeps (and on the final one) so the plan stays
    bounded regardless of ``iters``. Materialization itself is the
    dominant fixed cost of a sweep — writing the full rank table to
    block storage — so the interval trades a strictly bounded (2-sweep)
    lineage for half the materializations: measured 3.95 s → 2.86 s at
    sf0.1 with bit-identical output (the arithmetic and the per-sweep
    ROUND quantization are untouched; only how often the intermediate
    is pinned changes). ``ckpt_every=1`` restores the per-sweep pin for
    flaky-executor environments where recompute-on-retry matters more.

    r15 (guide §3.1/§2.4): when the node spine is small (measured
    count ≤ ``PAGERANK_BROADCAST_MAX_NODES``), the per-sweep rank and
    contribution-sum tables — both ≤ |V| rows — join BROADCAST-side.
    The checkpointed inputs carry no size statistics, so without the
    explicit hint Catalyst planned every sweep's two joins as
    SortMergeJoin: 2 exchanges + 2 sorts per sweep of a ≤|V|-row
    table, 10× per query. Broadcasting leaves ONE exchange per sweep
    (the groupBy(dst) contribution shuffle — fundamental to the
    algorithm). Join strategy only; the fold arithmetic and the sweep
    trajectory are bit-identical (A/B'd at sf0.1: equal collect()
    output, 2.72 s → 2.21 s for the 10-sweep loop). Above the gate
    (web-scale graphs) the shuffle formulation stands.
    """
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    small = nodes.count() <= PAGERANK_BROADCAST_MAX_NODES
    bcast = F.broadcast if small else (lambda df: df)
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    esrc = edges.join(deg, "src").localCheckpoint(eager=True)

    d = float(damping)
    base = 1.0 - d
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(iters):
        contribs = esrc.join(
            bcast(ranks.withColumnRenamed("node", "src")), "src"
        ).select("dst", "src", (F.col("rank") / F.col("deg")).alias("c"))
        if exact_fold:
            summed = contribs.groupBy("dst").agg(
                F.expr(
                    "aggregate(sort_array(collect_list(struct(src, c))), "
                    "0.0D, (acc, x) -> acc + x.c)"
                ).alias("s")
            )
        else:
            summed = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = nodes.join(
            bcast(summed.withColumnRenamed("dst", "node")), "node", "left"
        ).select(
            "node",
            F.round(
                F.lit(base) + F.lit(d) * F.coalesce("s", F.lit(0.0)),
                PAGERANK_ROUND,
            ).alias("rank"),
        )
        if (i + 1) % ckpt_every == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank of nations in the trade graph, with names and
    out-degrees — the oracle-checked registry entry (exact-fold mode;
    the DuckDB twin replays the identical 10 sweeps in a recursive
    CTE).

    ``edges`` is checkpointed HERE (r15): the out-degree aggregate
    below consumes the same edge list as the sweeps, and an
    un-materialized plan re-derived the full lineitem ⋈ orders ⋈ dims
    fan-in from parquet a second time just for ``n_out`` (visible as a
    second 3-BHJ scan subtree in the pre-r15 plan) — one redundant
    pass over the fact table per query, at any scale. ``pagerank``'s
    own internal checkpoint of the already-materialized RDD is a
    bounded |E|-row copy, not a recompute."""
    edges = trade_edges(spark, sf_dir).localCheckpoint(eager=True)
    ranks = pagerank(edges)
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("node"), "n_name"
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("n_out"))
    return (
        ranks.join(F.broadcast(n), "node")
        .join(
            F.broadcast(deg.withColumnRenamed("src", "node")), "node", "left"
        )
        .select(
            F.col("node").alias("nationkey"),
            "n_name",
            F.coalesce("n_out", F.lit(0)).cast("long").alias("n_out"),
            "rank",
        )
    )


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-purchase edges over parts: (a, b) with a < b iff
    some order contains both parts. Per-order fan-out is bounded by
    the items-per-order contract (≤ 7 in TPC-H-shaped data), so edge
    count is linear in lineitems, never quadratic in parts.
    ``collect_set`` first: the same part twice in one order (two
    suppliers) must not create a self-edge or a duplicate pair.

    r15 pair generator (guide §2.4): each order's distinct parts are
    collected into ONE sorted array (a single hash exchange keyed by
    orderkey, with map-side partial aggregation collapsing duplicate
    (order, part) rows before the shuffle) and pairs expand JVM-side
    with the shared nested-``transform`` kernel — the market-basket
    shape from operators/mining.py. The previous equi-self-join on
    ``l_orderkey`` spent four exchanges on the same output (distinct
    (ok, pk), both join sides, pair distinct); this derivation pays
    two (the groupBy, the distinct over pairs). Identical edge set:
    the array is sorted-distinct, so slice-pairs (i < j) enumerates
    exactly the pk < pk2 join output; ``collect_set`` drops NULL
    partkeys exactly as the null-rejecting equi-join did, and the
    explicit NULL-orderkey filter drops the NULL basket exactly as the
    null-rejecting equi-join on ``l_orderkey`` did (r16, ADVICE r15:
    groupBy would otherwise KEEP a NULL-key basket and pair its
    parts — invisible on TPC-H-shaped data, wrong on hostile rows)."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").cast("long").alias("pk"),
    ).filter(F.col("ok").isNotNull())
    baskets = li.groupBy("ok").agg(
        F.array_sort(F.collect_set("pk")).alias("arr")
    )
    pairs = baskets.select(
        ordered_pairs(F.col("arr"), lambda x, y: F.array(x, y)).alias("p")
    )
    return (
        pairs.select(F.col("p")[0].alias("a"), F.col("p")[1].alias("b"))
        .distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Per-node triangle count + degree + clustering coefficient over
    an undirected edge list (columns ``a < b``).

    The classic distributed-triangle trick: orient every edge from the
    (degree, node)-smaller endpoint to the larger one. Each node's
    oriented out-adjacency is then O(√m) — the bound that survives
    power-law degree skew at 100 TB (a celebrity node's edges all
    point INTO it; its out-list stays small). Integer counts →
    hash-exact across engines; the clustering coefficient 2T/(d(d−1))
    is rounded at the float edge.

    r16 edge-iterator formulation (guide §1.2 step 1 — fix the
    distributed algorithm; replaces the r9/r15 wedge-stream join):
    per-source out-adjacency ARRAYS (one groupBy over the oriented
    list) are attached to both endpoints of every oriented edge, and
    the triangles through edge (s, t) are ``array_intersect(N⁺(s),
    N⁺(t))`` evaluated row-by-row in codegen. Exactly-once proof: for
    a triangle with orientation order x ≺ y ≺ z (≺ = (degree, id)
    lexicographic — a strict total order, ids are distinct), the
    oriented edges are x→y, x→z, y→z; the triangle appears ONLY at
    edge (x, y) (z ∈ N⁺(x)∩N⁺(y)); at (x, z) it would need y ∈ N⁺(z)
    — false — and at (y, z) it would need x ∈ N⁺(y) — false. The
    edge lists are duplicate-free (edges are distinct (a, b) pairs),
    so ``array_intersect``'s set semantics drop nothing. Per-corner
    counts keep the old shape: witnesses unnest to (s, t, z) triangle
    rows and one 3-corner explode feeds the count aggregate — the same
    3 rows per triangle as before.

    Why this beats the wedge join it replaces (measured at sf0.1,
    1.2 M edges / 41 M wedges: 5.1 s → 1.5 s fresh-JVM wall): the old
    plan MATERIALIZED every wedge as a row — 41 M rows built, hashed
    and probed through a join (and, above the broadcast gate, shuffled
    whole) only for ~99% of them to miss the closing-edge probe. The
    element-level work (Σ_s outdeg(s)² candidate checks) is the same,
    but it now runs as hash-set probes inside one codegen stage over
    |E| rows — no 41 M-row stream, no join machinery, nothing
    O(m^1.5) ever leaves a task. At 100 TB the wedge stream was the
    plan's largest relation by an order of magnitude; it no longer
    exists.

    ``edges`` and the oriented list are localCheckpoint-ed: both are
    referenced two and three times downstream (deg/orientation; the
    adjacency build + the two endpoint attachments), and without
    materialization the whole upstream edge derivation re-executes per
    reference. The adjacency arrays stay bounded by orientation
    (out-degree ≤ 2√m), so no row ever carries more than O(√m) longs.

    Join strategy (guide §3.1, r15 gate kept): when the measured edge
    count is ≤ ``TRIANGLE_BROADCAST_MAX_EDGES``, the degree and
    adjacency attachments broadcast (the adjacency relation totals |E|
    longs — 2 M edges ≈ 16 MB); above the gate they fall back to
    shuffle joins keyed on s / t, which ship each edge row with one
    bounded O(√m) array — still nothing O(m^1.5). The gating probe is
    one tiny count over the checkpointed edges, not a size estimate.
    """
    edges = edges.localCheckpoint(eager=True)
    # broadcast-gate probe: one measured count over the materialized
    # edge list (estimates can't be fooled — there are none involved)
    n_edges = edges.count()
    small = n_edges <= TRIANGLE_BROADCAST_MAX_EDGES
    bcast = F.broadcast if small else (lambda df: df)
    # deg feeds the orientation joins AND the final output row — two
    # full union+aggregate passes over the edge list without the pin
    # (|V| rows of (long, long): compact by construction)
    deg = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        edges.join(bcast(da), "a")
        .join(bcast(db), "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("s"), F.col("b").alias("t")),
            )
            .otherwise(
                F.struct(F.col("b").alias("s"), F.col("a").alias("t"))
            )
            .alias("e")
        )
        .select("e.s", "e.t")
        .localCheckpoint(eager=True)
    )
    # out-adjacency arrays: unsorted collect_list is safe — every
    # consumer below is order-free (set intersection, size, explode →
    # sum), and the lists are duplicate-free because oriented edges
    # are distinct pairs. Pinned: the relation is attached on BOTH
    # endpoints (s and t), and the aggregate would otherwise run twice
    # (an object-hash aggregate above a reused exchange is not deduped
    # — the r15 order_basket_rules lesson); ≤|V| rows carrying |E|
    # longs total, bytes the joins ship anyway
    adj = (
        oriented.groupBy("s")
        .agg(F.collect_list("t").alias("nbrs"))
        .localCheckpoint(eager=True)
    )
    adj_t = adj.select(F.col("s").alias("t"), F.col("nbrs").alias("nbrs_t"))
    # inner joins: an edge whose source or target has no out-list
    # closes no triangle and contributes nothing anyway (s always has
    # one — the edge itself; t may not)
    tri_edges = (
        oriented.join(bcast(adj), "s")
        .join(bcast(adj_t), "t")
        .select(
            "s",
            "t",
            F.array_intersect(F.col("nbrs"), F.col("nbrs_t")).alias("zs"),
        )
        .where(F.size("zs") > 0)
    )
    # per-corner counts: unnest the witnesses into (s, t, z) triangle
    # rows, then ONE explode of the 3-corner array feeds the count
    # aggregate — both generates are codegen'd (an interpreted
    # ``transform``-to-struct corner array measured ~8% slower), and
    # each triangle contributes exactly one (s, t, z) row, preserving
    # the old 3-rows-per-triangle count input bit for bit
    tri = tri_edges.select("s", "t", F.explode("zs").alias("z"))
    corners = tri.select(F.explode(F.array("s", "t", "z")).alias("node"))
    tcount = corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("triangles")
    )
    return (
        deg.join(bcast(tcount), "node", "left")
        .select(
            "node",
            F.col("deg").cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.round(
                F.when(
                    F.col("deg") >= 2,
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("deg") * (F.col("deg") - F.lit(1))),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering"),
        )
    )


def part_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph: per part, its
    co-purchase degree, the number of triangles through it, and its
    local clustering coefficient — the 'products bought together'
    community-structure signal. Node set = edge endpoints (a part never
    co-ordered with another part has no row — the pagerank
    convention)."""
    return triangle_stats(copurchase_edges(spark, sf_dir)).select(
        F.col("node").alias("part_key"), "degree", "triangles", "clustering"
    )
