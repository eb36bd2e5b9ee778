"""Shared reader for ``batch=<id>``-partitioned incremental-index
stores (the exactly-once-without-a-transaction-log pattern used by the
streaming near-dup detector and novelty scorer).

Every foreachBatch writer lands its state under a ``batch=<id>``
directory with mode=overwrite, so a retried micro-batch rewrites its
own paths byte-for-byte. The read side of that contract lives here —
in ONE place, because it is retry-safety-critical: excluding the
current batch id guarantees a retry recomputes against exactly the
pre-batch index instead of seeing its own half-written partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_batch_store(
    spark: SparkSession, path: str, schema: str, exclude_batch: int
) -> DataFrame:
    """All rows of a batch-partitioned store EXCEPT ``exclude_batch``'s
    (empty DataFrame of ``schema`` if the store doesn't exist yet)."""
    if not os.path.isdir(path) or not any(
        e.startswith("batch=") for e in os.listdir(path)
    ):
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema + ", batch long")
        .parquet(path)
        .filter(F.col("batch") != exclude_batch)
        .drop("batch")
    )
