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
    partkeys exactly as the null-rejecting equi-join did."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").cast("long").alias("pk"),
    )
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
    oriented out-adjacency is then O(√m), so the wedge self-join
    (e1.src = e2.src) generates O(m^1.5) candidates worst-case instead
    of Σdeg² — the bound that survives power-law degree skew at 100 TB
    (a celebrity node's edges all point INTO it; it generates no
    wedges). Each triangle {x, y, z} is counted exactly once as the
    wedge at its orientation-minimal corner closed by the third
    oriented edge; per-node counts come from unioning the three
    corners. Integer counts → hash-exact across engines; the
    clustering coefficient 2T/(d(d−1)) is rounded at the float edge.

    ``edges`` and the oriented list are localCheckpoint-ed: both are
    referenced two and three times downstream (deg/orientation; the
    two wedge sides + the closing probe), and without materialization
    the whole upstream edge derivation re-executes per reference
    (observed: 13 exchanges in the un-checkpointed plan vs 6 after —
    at 100 TB that is three redundant passes over the fact table).

    Two measured plan rules (r9, sf0.1: 1.2 M edges / 41 M wedges,
    24 s → 6 s end-to-end):

    - the closing probe joins on ONE packed long ``y·2³² + z`` instead
      of the (y, z) two-column key — half the sort/hash-probe work on
      the wedge stream, which is the largest relation in the plan. The
      pack is injective only while every node id fits 31 bits, so it
      is GATED on the observed id RANGE — min ≥ 0 AND max < 2³¹, both
      from one tiny aggregate over the checkpointed edge list (a
      negative id breaks injectivity even under a small max); ids
      outside that range fall back to the two-column join — correct at
      any scale, packed whenever it is safe;
    - per-corner counts explode ONE pass of the triangle stream
      (``explode(array(x, y, z))``) instead of a 3-branch union of
      projections — the union re-ran the closing join per branch
      (ReusedExchange dedupes the shuffle, not the join above it), so
      the most expensive join in the plan executed three times.

    r15 join strategy (guide §3.1/§2.4, gated like the packed key):
    when the measured edge count is ≤ ``TRIANGLE_BROADCAST_MAX_EDGES``
    every join against a ≤|E|-row side is an explicit BROADCAST — the
    two degree attachments, the wedge self-join's second side, the
    closing probe, and the final count attachment. The checkpointed
    inputs carry no statistics, so Catalyst planned all of these as
    SortMergeJoin; the wedge STREAM (O(m^1.5) rows — 41 M at sf0.1's
    1.2 M edges) then crossed a full hash exchange + sort just to meet
    the 1.2 M-row closer side. Broadcasting turns the wedge build +
    close + corner explode + partial count into ONE map-side stage
    over the oriented list: the only exchanges left are the two
    per-node count aggregates. The wedge stream itself never shuffles.
    Same gating probe as the packed key (one tiny aggregate over the
    checkpointed edges, now also carrying count(1)); above the gate
    the sort-merge formulation stands — correct at any scale.
    """
    edges = edges.localCheckpoint(eager=True)
    # single stats probe: packed-key bounds + the broadcast gate count
    bounds = edges.agg(
        F.min(F.least(F.col("a"), F.col("b"))).alias("lo"),
        F.max(F.greatest(F.col("a"), F.col("b"))).alias("hi"),
        F.count(F.lit(1)).alias("n_edges"),
    ).collect()[0]
    min_id, max_id = bounds["lo"], bounds["hi"]
    small = bounds["n_edges"] <= TRIANGLE_BROADCAST_MAX_EDGES
    bcast = F.broadcast if small else (lambda df: df)
    deg = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
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
                F.struct(F.col("a").alias("s"), F.col("b").alias("t"),
                         F.col("deg_a").alias("ds"), F.col("deg_b").alias("dt")),
            )
            .otherwise(
                F.struct(F.col("b").alias("s"), F.col("a").alias("t"),
                         F.col("deg_b").alias("ds"), F.col("deg_a").alias("dt"))
            )
            .alias("e")
        )
        .select("e.s", "e.t", "e.ds", "e.dt")
        .localCheckpoint(eager=True)
    )
    e1 = oriented.select(
        F.col("s").alias("x"), F.col("t").alias("y"),
        F.col("dt").alias("dy"),
    )
    e2 = oriented.select(
        F.col("s").alias("x"), F.col("t").alias("z"),
        F.col("dt").alias("dz"),
    )
    wedges = e1.join(bcast(e2), "x").where(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    # packed-key gate: injective only while every id is in [0, 2^31)
    # (signed 64-bit product bound; a NEGATIVE id breaks injectivity
    # even when the max is small — (y, 0) collides with (y+1, -2^32) —
    # so the min is probed alongside the max); probed by the single
    # stats aggregate above
    if max_id is not None and 0 <= min_id and max_id < (1 << 31):
        pack = F.lit(1 << 32)
        wedges = wedges.select(
            "x", (F.col("y") * pack + F.col("z")).alias("yz")
        )
        closer = oriented.select(
            (F.col("s") * pack + F.col("t")).alias("yz"),
            F.col("s").alias("cy"),
            F.col("t").alias("cz"),
        )
        tri = wedges.join(bcast(closer), "yz").select(
            "x", F.col("cy").alias("y"), F.col("cz").alias("z")
        )
    else:
        closer = oriented.select(
            F.col("s").alias("y"), F.col("t").alias("z")
        )
        tri = wedges.join(bcast(closer), ["y", "z"]).select("x", "y", "z")
    corners = tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
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
