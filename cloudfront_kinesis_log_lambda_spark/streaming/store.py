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


def fold_batch_store(
    spark: SparkSession, path: str, schema: str, keep_last: int = 1
) -> int:
    """Maintenance: merge all but the newest ``keep_last`` ``batch=<id>``
    delta directories into one folded directory, so a long-lived
    stream's store stops accumulating one directory per micro-batch.

    The newest ids stay as-is — a retry of the CURRENT batch must still
    find its own partition distinct from history (the exclude-current
    read contract). Folded rows land under ONE directory ``batch=-2``
    (never a real id: ids are non-negative and -1 is the everything
    sentinel), which is safe precisely BECAUSE only strictly-old deltas
    fold: the current/retryable batch id is always in the kept tail, so
    an exclude-current filter can never need to exclude folded rows.
    Same temp-dir-then-swap discipline as
    ``sinks/parquet.py::compact_partitions``. Returns the number of
    delta directories folded away.

    Crash-safety contract: the fold is NOT atomic across directories —
    a crash between the delta deletes and the final rename leaves the
    folded rows only in the ``_folding-<pid>`` temp dir (recover by
    renaming it to ``batch=-2``; nothing is lost, but reads miss the
    folded history until then). Run it from a single maintenance job,
    never concurrently with itself — the same operational contract as
    compacting an active store partition.
    """
    import shutil

    if not os.path.isdir(path):
        return 0
    deltas = sorted(
        (int(e.split("=", 1)[1]), e)
        for e in os.listdir(path)
        if e.startswith("batch=") and e != "batch=-2"
    )
    to_fold = deltas[: max(0, len(deltas) - keep_last)]
    if not to_fold:
        return 0
    fold_ids = [i for i, _ in to_fold]
    folded = (
        spark.read.schema(schema + ", batch long")
        .parquet(path)
        .filter(F.col("batch").isin(fold_ids + [-2]))
        .drop("batch")
        # materialize BEFORE deleting the inputs (lazy plan would read
        # its own deleted files mid-swap)
        .localCheckpoint(eager=True)
    )
    tmp = os.path.join(path, f"_folding-{os.getpid()}")
    folded.write.mode("overwrite").parquet(tmp)
    for _, e in to_fold:
        shutil.rmtree(os.path.join(path, e))
    target = os.path.join(path, "batch=-2")
    shutil.rmtree(target, ignore_errors=True)
    os.rename(tmp, target)
    return len(to_fold)
