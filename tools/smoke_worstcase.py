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

Usage: python tools/smoke_worstcase.py [N] [sf_dir]
Prints one line per measurement; paste the summary into BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


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

    def timed(label, fn):
        t0 = time.monotonic()
        count = fn()
        dt = time.monotonic() - t0
        print(f"{label}: {dt:.2f}s ({count} rows)")
        return dt

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


if __name__ == "__main__":
    main()
