"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than the
    cluster has slots.

    CPU-bound per-row operators (shingling, hashing, regex scoring, vector
    math) inherit the scan's partitioning; a small-but-expensive input —
    one parquet file, a collected dimension — would otherwise run the
    whole hot loop in a single task. At real scale inputs arrive with
    thousands of partitions and this is a no-op; the explicit repartition
    is never coalesced away by AQE.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # df.rdd.getNumPartitions() would be exact but forces a full physical-
    # plan → RDD conversion on every call (this helper sits in ~10 operator
    # hot paths). Two cheap proxies instead:
    #   1. if the analyzed plan already contains a Repartition (an upstream
    #      ensure_parallelism or an explicit caller repartition), adding
    #      another is pure waste — short-circuit. In-memory DataFrames
    #      (inputFiles()==[]) would otherwise re-shuffle on every call.
    #   2. the scan's file count is a cheap FileIndex lookup and a
    #      conservative proxy: >= target files is certainly enough
    #      parallelism; fewer (or a non-file source, 0) gets the
    #      round-robin repartition. A single large splittable file
    #      repartitions unnecessarily — one extra shuffle, bounded by the
    #      input being small enough to have few files.
    try:
        if "Repartition" in df._jdf.queryExecution().analyzed().toString():
            return df
    except Exception:
        pass
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files < target:
        return df.repartition(target)
    return df
