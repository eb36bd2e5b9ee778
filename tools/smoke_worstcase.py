"""Worst-case scale smoke: N-fold duplicated corpus through the newest
capped operators (r5 VERDICT item 6 — 25×, covering block_dedup and
semantic_dedup, whose caps are the least battle-tested).

Protocol (same as the r4/r5 dedup smokes recorded in BASELINE.md):
union the sf0.1 corpus N times with disjoint ids — every block
duplicated N-fold, every embedding in a forced N-clique — and compare
wall time against the 1× run. The pass signal is the ABSENCE of
super-linear blowup: the duplication-heavy paths must stay bounded by
their caps (block index: struct-min per distinct block; semantic: cells
capped at max_cell_size with pair work O(cell²) only under the cap).

Usage: python tools/smoke_worstcase.py [N] [sf_dir]        # r6 legs
       python tools/smoke_worstcase.py r8 [N] [sf_dir]     # r8 legs
Prints one line per measurement; paste the summary into BASELINE.md.

r8 legs (VERDICT r7 item 7 + the new fuzzy cap), each an adversarial
SHAPE, not just more rows:
  - EWMA + transitions with one WHALE user holding all N× duplicated
    events — the per-user array/window contract's skew stress;
  - BM25 with every query term planted in every doc (tf table goes
    from sparse to |docs|·|terms| rows);
  - sorted-neighborhood with ALL-IDENTICAL sort keys (every rank tie
    broken by doc_id; candidates must stay O(N·w));
  - part_fuzzy_pairs with every name in ONE 12-char-identical block
    (escalate → still oversize → dropped: wall must stay flat, the
    O(cap²) ceiling doing its job).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def make_timed(spark):
    """Per-leg rep+canary protocol (VERDICT r12 item 3): single-rep
    smoke ratios swung 4× on UNCHANGED code round-over-round (bpe 0.8×
    vs 3.2× hours apart — its type table is invariant under duplication,
    only ambient load differed), so every leg now takes min-of-2 walls
    bracketed by bench.py's min-of-3 canary probes. A ratio is
    comparable across rounds when both rows' canaries sit at the same
    floor; a moved canary means box, not code.

    Returns a ``timed(label, fn, reps=2)`` closure over the session —
    single-sourced here because three smoke mains had copy-pasted the
    unbracketed version (the exact drift r11 flagged in bench.py)."""
    from bench import canary_probe

    def timed(label, fn, reps=2):
        c_before = canary_probe(spark)
        walls, count = [], -1
        for _ in range(reps):
            t0 = time.monotonic()
            count = fn()
            walls.append(time.monotonic() - t0)
        c_after = canary_probe(spark)
        dt = min(walls)
        # force() returns -1 (no row count): omit the rows suffix then
        suffix = f" ({count} rows)" if count >= 0 else ""
        rep_s = "/".join(f"{w:.2f}" for w in walls)
        print(
            f"{label}: {dt:.2f}s{suffix} "
            f"[min of {reps}: {rep_s}; canary {c_before:.3f}/{c_after:.3f}]"
        )
        return dt

    return timed


def force(df) -> int:
    """Honest wall: noop-write the FULL plan. A bare ``.count()`` is
    NOT a valid wall for a plan ending in a key-preserving outer
    join — Catalyst eliminates the join (and its whole subtree) under
    count when the right side is a unique-key aggregate; measured on
    part_triangle_stats, count skipped the entire wedge/closing-join
    computation and reported the degree table's wall (r9, BASELINE.md).
    Returns -1: no row count is produced (counting would need a second
    plan execution outside the timed window; callers that want row
    counts do their own count after timing)."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def main_r8() -> None:
    import shutil
    import tempfile

    argv = sys.argv[2:]
    n = int(argv[0]) if argv else 25
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"

    from cloudfront_kinesis_log_lambda_spark import get_spark
    from cloudfront_kinesis_log_lambda_spark.operators import (
        retrieval as RT,
        timeseries as TS,
    )
    from cloudfront_kinesis_log_lambda_spark.operators.dedup import (
        doc_sorted_neighbors,
    )
    from cloudfront_kinesis_log_lambda_spark.operators.relational import load

    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="cfkll-smoke-r8-")

    def sf_with(name, df, tag):
        """Scratch sf_dir holding ONE adversarial table."""
        d = os.path.join(scratch, tag)
        df.write.mode("overwrite").parquet(f"{d}/{name}.parquet")
        return d

    timed = make_timed(spark)

    from pyspark.sql import functions as F  # noqa: F811

    # ---- leg 1: whale user (EWMA fold + transitions window skew) ----
    ev = load(spark, sf_dir, "events")
    n_ev = ev.count()
    whale = ev
    for i in range(1, n):
        whale = whale.unionByName(
            ev.withColumn("user_id", F.lit(-1).cast("long")).withColumn(
                "event_id",
                F.col("event_id") + F.lit(i * 10_000_000).cast("long"),
            )
        )
    d1 = sf_with("events", ev, "ev1")
    dn = sf_with("events", whale, f"ev{n}-whale")
    print(f"events: {n_ev} rows; whale user carries {(n - 1) * n_ev}")
    # throwaway warm-up: JIT/codegen warm-up otherwise inflates the 1×
    # wall and deflates every ratio (the r6 bpe-leg review finding)
    TS.events_ewma(spark, d1).count()
    t1 = timed("events_ewma 1x", lambda: TS.events_ewma(spark, d1).count())
    tn = timed(
        f"events_ewma {n}x-whale", lambda: TS.events_ewma(spark, dn).count()
    )
    print(f"events_ewma wall ratio: {tn / t1:.1f}x for {n}x rows, one user")
    t1 = timed(
        "event_transitions 1x",
        lambda: TS.event_transitions(spark, d1).count(),
    )
    tn = timed(
        f"event_transitions {n}x-whale",
        lambda: TS.event_transitions(spark, dn).count(),
    )
    print(f"event_transitions wall ratio: {tn / t1:.1f}x for {n}x rows, one user")

    # ---- leg 2: BM25 with every query term in every doc ----
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    hot = docs.withColumn(
        "text", F.concat_ws(" ", "text", F.lit(" ".join(RT.BM25_QUERY)))
    )
    hotN = hot
    for i in range(1, n):
        hotN = hotN.unionByName(
            hot.withColumn(
                "doc_id",
                F.col("doc_id") + F.lit(i * 10_000_000).cast("long"),
            )
        )
    d1 = sf_with("documents", docs, "doc1")
    dh = sf_with("documents", hotN, f"doc{n}-hot")
    t1 = timed("doc_bm25_topk 1x", lambda: RT.doc_bm25_topk(spark, d1).count())
    tn = timed(
        f"doc_bm25_topk {n}x-allterms",
        lambda: RT.doc_bm25_topk(spark, dh).count(),
    )
    print(
        f"doc_bm25_topk wall ratio: {tn / t1:.1f}x for {n}x docs, "
        f"every term in every doc ({n_docs * n * len(RT.BM25_QUERY)} tf rows)"
    )

    # ---- leg 3: sorted-neighborhood, ALL-IDENTICAL sort keys ----
    same = docs.withColumn(
        "text", F.concat(F.lit("identical-key-prefix "), F.col("text"))
    )
    sameN = same
    for i in range(1, n):
        sameN = sameN.unionByName(
            same.withColumn(
                "doc_id",
                F.col("doc_id") + F.lit(i * 10_000_000).cast("long"),
            )
        )
    d1 = sf_with("documents", same, "snm1")
    dn = sf_with("documents", sameN, f"snm{n}")
    t1 = timed(
        "doc_sorted_neighbors 1x",
        lambda: doc_sorted_neighbors(spark, d1).count(),
    )
    tn = timed(
        f"doc_sorted_neighbors {n}x-samekey",
        lambda: doc_sorted_neighbors(spark, dn).count(),
    )
    print(f"doc_sorted_neighbors wall ratio: {tn / t1:.1f}x for {n}x rows, one key")

    # ---- leg 4: fuzzy pairs, adversarial DISTINCT names ----
    # (the real part table has only ~64 distinct names at sf0.1 — far
    # under the cap — so the stress tables are synthetic: 20k distinct
    # names per shape)
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    n_names = 20_000
    ids = spark.range(n_names).select(F.col("id").cast("long"))
    # shape A: ONE 12-char-identical deep block of 20k distinct names
    # → escalate, still oversize, DROPPED: wall must be flat (0 pairs)
    oneblk = ids.select(
        F.col("id").alias("p_partkey"),
        F.format_string("prefixprefix %05d widget", "id").alias("p_name"),
    )
    # shape B: one hot 3-char block, deep-DIVERSE names → escalation
    # splits it into ~20k tiny deep blocks
    deepdiv = ids.select(
        F.col("id").alias("p_partkey"),
        F.format_string("pro%05d widget assembly", "id").alias("p_name"),
    )
    d1 = sf_with("part", part, "part1")
    da = sf_with("part", oneblk, "part-oneblk")
    db = sf_with("part", deepdiv, "part-deepdiv")
    t1 = timed(
        "part_fuzzy_pairs 1x", lambda: RT.part_fuzzy_pairs(spark, d1).count()
    )
    ta = timed(
        "part_fuzzy_pairs 20k one-block(dropped)",
        lambda: RT.part_fuzzy_pairs(spark, da).count(),
    )
    tb = timed(
        "part_fuzzy_pairs 20k deep-diverse(escalated)",
        lambda: RT.part_fuzzy_pairs(spark, db).count(),
    )
    print(
        f"part_fuzzy_pairs worst-case walls: dropped {ta:.2f}s, "
        f"escalated {tb:.2f}s vs normal {t1:.2f}s "
        f"(uncapped one-block would be ~{n_names}^2/2 levenshtein calls)"
    )

    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from cloudfront_kinesis_log_lambda_spark import get_spark
    from cloudfront_kinesis_log_lambda_spark.operators import corpus as C
    from cloudfront_kinesis_log_lambda_spark.operators import relational as R
    from cloudfront_kinesis_log_lambda_spark.operators.similarity import (
        semantic_dedup,
    )

    spark = get_spark()
    docs = R.load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = R.load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_docs = docs.count()
    n_emb = emb.count()

    def duplicated(df, id_col, copies):
        out = df
        for i in range(1, copies):
            out = out.unionByName(
                df.withColumn(
                    id_col, F.col(id_col) + F.lit(i * 10_000_000).cast("long")
                )
            )
        return out.localCheckpoint(eager=True)

    timed = make_timed(spark)

    docs1 = docs.localCheckpoint(eager=True)
    docsN = duplicated(docs, "doc_id", n)
    emb1 = emb.localCheckpoint(eager=True)
    embN = duplicated(emb, "vec_id", n)
    print(f"corpus: {n_docs} docs / {n_emb} vecs; N={n}")

    # force the stitched text to materialize: a bare count() lets
    # Catalyst prune the string_agg reassembly out of the plan and the
    # measurement reads as faster at 25x than 1x
    def _block(df):
        out = C.block_dedup(df, block_tokens=16)
        r = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("dedup_text")).alias("chars"),
        ).collect()[0]
        return r["n"]

    t1 = timed("block_dedup 1x", lambda: _block(docs1))
    tn = timed(f"block_dedup {n}x", lambda: _block(docsN))
    print(f"block_dedup wall ratio: {tn / t1:.1f}x for {n}x rows")

    # n_centroids scaled so the MEAN CELL (N·n/k ≈ 1000 rows) stays
    # comfortably under the default max_cell_size=4096 — the docstring's
    # sizing rule (k ≈ N/10³ at the default cap); k ≈ N/10⁴ would put
    # every cell over the cap and the smoke would measure nothing
    k1, kn = 16, max(16, (n_emb * n) // 1000)
    t1 = timed(
        "semantic_dedup 1x",
        lambda: semantic_dedup(emb1, n_centroids=k1).count(),
    )
    tn = timed(
        f"semantic_dedup {n}x",
        lambda: semantic_dedup(embN, n_centroids=kn).count(),
    )
    print(f"semantic_dedup wall ratio: {tn / t1:.1f}x for {n}x rows (k {k1}->{kn})")

    # BPE learning: the iteration runs on the distinct-word TYPE table,
    # which N-fold duplication leaves UNCHANGED — the smoke's pass
    # signal is a near-flat wall (the only N-dependent work is the
    # first word-count scan)
    from cloudfront_kinesis_log_lambda_spark.functions.bpe import (
        learn_bpe_merges,
    )

    # throwaway warm-up: JIT/codegen warm-up otherwise inflates the 1×
    # wall and deflates the ratio — a real 25× scaling regression could
    # then still print near 1.0× (r6 review finding)
    learn_bpe_merges(docs1, n_merges=2).count()
    t1 = timed(
        "bpe_learn(8) 1x", lambda: learn_bpe_merges(docs1, n_merges=8).count()
    )
    tn = timed(
        f"bpe_learn(8) {n}x",
        lambda: learn_bpe_merges(docsN, n_merges=8).count(),
    )
    print(f"bpe_learn wall ratio: {tn / t1:.1f}x for {n}x rows (type table unchanged)")
    spark.stop()


def main_r9() -> None:
    """r9 legs for the end-of-r8 operator additions, adversarial
    SHAPES again:

    - triangle census with a HUB part planted in EVERY order (the
      power-law-celebrity case the degree orientation exists for: the
      hub's edges all point into it, so it must generate zero wedges —
      wall vs the untouched graph stays near 1×);
    - Holt-Winters + CUSUM with ALL events collapsed onto ONE type
      (per-type series skew: the single whale series must absorb the
      full table without blowup — series length is hours-in-retention,
      not event count, so the wall is the pre-aggregation's);
    - basket rules with ONE whale basket holding EVERY distinct part
      (uncapped it alone is ~2·10⁸ pairs; max_basket_size must drop
      it before the pair stage — wall vs the clean run stays ~1×);
    - KS with ALL events collapsed onto one type AND every value
      distinct (quantize=None) — the single-type ECDF window's worst
      grid — vs the quantized default that bounds the grid.
    """
    import shutil
    import tempfile

    argv = sys.argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    from cloudfront_kinesis_log_lambda_spark import get_spark
    from cloudfront_kinesis_log_lambda_spark.operators import (
        graph as G,
        timeseries as TS,
    )
    from cloudfront_kinesis_log_lambda_spark.operators.relational import load

    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="cfkll-smoke-r9-")

    def sf_with(name, df, tag):
        d = os.path.join(scratch, tag)
        df.write.mode("overwrite").parquet(f"{d}/{name}.parquet")
        return d

    timed = make_timed(spark)

    # ---- leg 1: hub part in every order ----
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    hub = li.unionByName(
        li.select("l_orderkey")
        .distinct()
        .withColumn("l_partkey", F.lit(1).cast(li.schema["l_partkey"].dataType))
    )
    d1 = sf_with("lineitem", li, "li1")
    dh = sf_with("lineitem", hub, "li-hub")
    # force(), not count(): count eliminates this plan's final outer
    # join and with it the whole triangle subtree (see force docstring)
    force(G.part_triangle_stats(spark, d1))  # warm-up
    t1 = timed(
        "part_triangle_stats 1x",
        lambda: force(G.part_triangle_stats(spark, d1)),
    )
    th = timed(
        "part_triangle_stats hub-in-every-order",
        lambda: force(G.part_triangle_stats(spark, dh)),
    )
    print(f"triangle wall ratio: {th / t1:.1f}x with a full-graph hub")

    # ---- leg 2: one whale type for the hourly-series folds ----
    ev = load(spark, sf_dir, "events")
    d1 = sf_with("events", ev, "ev1")
    dw = sf_with(
        "events", ev.withColumn("event_type", F.lit("whale")), "ev-whale"
    )
    TS.events_holt_winters(spark, d1).count()  # warm-up
    for name, fn in (
        ("events_holt_winters", TS.events_holt_winters),
        ("events_cusum_changepoints", TS.events_cusum_changepoints),
    ):
        t1 = timed(f"{name} 5-type", lambda: fn(spark, d1).count())
        tw = timed(f"{name} 1-whale-type", lambda: fn(spark, dw).count())
        print(f"{name} wall ratio: {tw / t1:.1f}x with all events one type")

    # ---- leg 3: whale basket for the association rules ----
    from cloudfront_kinesis_log_lambda_spark.operators.mining import (
        basket_rules,
    )

    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").cast("string").alias("item"),
    )
    whale = items.unionByName(
        items.select("item")
        .distinct()
        .withColumn("basket", F.lit(-1).cast("long"))
        .select("basket", "item")
    )
    basket_rules(items, min_support=0.0).count()  # warm-up
    t1 = timed(
        "basket_rules partkey-items 1x",
        lambda: basket_rules(items, min_support=0.0).count(),
    )
    tw = timed(
        "basket_rules whale-basket(all parts)",
        lambda: basket_rules(whale, min_support=0.0).count(),
    )
    print(f"basket_rules wall ratio: {tw / t1:.1f}x with a full-vocab whale")

    # ---- leg 4: whale-type KS grid ----
    from cloudfront_kinesis_log_lambda_spark.operators.quality import (
        PSI_SPLIT,
        ks_two_sample,
    )

    whale_ev = (
        ev.withColumn("event_type", F.lit("whale"))
        # every value distinct: the worst possible unquantized grid
        .withColumn(
            "value", F.col("value") + F.col("event_id").cast("double") * 1e-7
        )
        .select("event_type", "ts", "value")
    )
    is_ref = F.col("ts") < F.lit(PSI_SPLIT)
    ks_two_sample(whale_ev, "event_type", "value", is_ref).count()  # warm
    tq = timed(
        "ks whale-type quantize=3",
        lambda: ks_two_sample(
            whale_ev, "event_type", "value", is_ref
        ).count(),
    )
    tn = timed(
        "ks whale-type quantize=None (row-grain grid)",
        lambda: ks_two_sample(
            whale_ev, "event_type", "value", is_ref, quantize=None
        ).count(),
    )
    print(
        f"ks wall ratio unquantized/quantized: {tn / tq:.1f}x "
        "(quantize bounds the single-type ECDF window)"
    )

    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "r8":
        main_r8()
    elif len(sys.argv) > 1 and sys.argv[1] == "r9":
        main_r9()
    else:
        main()
