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
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
