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
    (empty DataFrame of ``schema`` if the store doesn't exist yet).

    Fold-aware: if a fold manifest marks delta dirs as already swapped
    into ``batch=-2`` (tmp gone ⇒ the rename committed) but not yet
    deleted, those dirs are excluded — a reader racing the fold's
    delete phase must not count folded rows twice.
    """
    import json

    if not os.path.isdir(path):
        return spark.createDataFrame([], schema)
    excluded: set[str] = set()
    mp = _manifest_path(path)
    if os.path.isfile(mp):
        with open(mp) as f:
            m = json.load(f)
        if not os.path.isdir(os.path.join(path, m["tmp"])):
            excluded = set(m["deltas"])
    dirs = [
        e
        for e in os.listdir(path)
        if e.startswith("batch=") and e not in excluded
    ]
    if not dirs:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema + ", batch long")
        .option("basePath", path)
        .parquet(*[os.path.join(path, e) for e in dirs])
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

    Crash-safety: a ``_fold_manifest.json`` (written atomically AFTER
    the temp dir is complete, removed only after every delete finished)
    makes any crash point recoverable — the next fold call first
    completes the pending fold it describes, so no window loses or
    double-counts rows and a routine maintenance re-run cannot orphan a
    crashed run's output. Run from a single maintenance job, never
    concurrently with itself — the same operational contract as
    compacting an active store partition.
    """
    if not os.path.isdir(path):
        return 0
    _recover_fold(path)
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
        # the old fold dir's rows are part of the new fold, so the
        # manifest can delete/replace it without loss
        .filter(F.col("batch").isin(fold_ids + [-2]))
        .drop("batch")
        # materialize BEFORE deleting the inputs (lazy plan would read
        # its own deleted files mid-swap)
        .localCheckpoint(eager=True)
    )
    tmp = os.path.join(path, f"_folding-{os.getpid()}")
    folded.write.mode("overwrite").parquet(tmp)
    _write_manifest(path, {"tmp": os.path.basename(tmp),
                           "deltas": [e for _, e in to_fold]})
    _complete_fold(path)
    return len(to_fold)


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_fold_manifest.json")


def _write_manifest(path: str, obj: dict) -> None:
    import json

    tmp = _manifest_path(path) + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.rename(tmp, _manifest_path(path))  # atomic on POSIX


def _complete_fold(path: str) -> None:
    """Execute (or re-execute) the swap+deletes a manifest describes.
    Every step is idempotent, so this can resume from any crash point:
    the tmp dir REPLACES batch=-2 (tmp was built as a superset of the
    old fold's rows), then the folded delta dirs die, then the
    manifest."""
    import json
    import shutil

    mp = _manifest_path(path)
    if not os.path.isfile(mp):
        return
    with open(mp) as f:
        m = json.load(f)
    tmp = os.path.join(path, m["tmp"])
    target = os.path.join(path, "batch=-2")
    if os.path.isdir(tmp):
        shutil.rmtree(target, ignore_errors=True)
        os.rename(tmp, target)
    for e in m["deltas"]:
        shutil.rmtree(os.path.join(path, e), ignore_errors=True)
    os.remove(mp)


def _recover_fold(path: str) -> None:
    """Finish a crashed fold before starting a new one; also sweep any
    orphaned _folding-* temp dirs from runs that died before writing
    their manifest (their content is still fully present in the deltas,
    so deleting them is lossless)."""
    import shutil

    _complete_fold(path)
    for e in os.listdir(path):
        if e.startswith("_folding-"):
            shutil.rmtree(os.path.join(path, e), ignore_errors=True)
