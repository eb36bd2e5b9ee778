"""Partitioned parquet analytics store for the enriched log table.

The reference only forwards to Kinesis; the engine additionally persists
the enriched records as a queryable columnar store. Layout chosen for
100 TB scans (SURVEY.md §4):

- partitioned by ``env`` and event date → partition pruning turns
  "prod, last 7 days" queries into a tiny directory listing instead of a
  full-store scan;
- sorted within partitions by ``@timestamp`` via a repartition+sort so
  parquet row-group min/max stats make timestamp range filters cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_log_store(
    enriched: DataFrame,
    path: str,
    mode: str = "append",
    target_file_partitions: int | None = None,
) -> None:
    """Write the enriched CloudFront table partitioned by env/log_day.

    ``@timestamp`` is the ISO string the wire format requires; the store
    adds a proper timestamp + date column for pruning (the string column
    is kept for wire fidelity on re-export).
    """
    df = enriched.withColumn("ts", F.to_timestamp(F.col("`@timestamp`")))
    df = df.withColumn("log_day", F.date_format("ts", "yyyy-MM-dd"))
    parts = [F.col("env"), F.col("log_day")]
    # sortWithinPartitions must LEAD with the partition columns: the
    # dynamic-partition writer requires an (env, log_day) ordering and
    # inserts its own sort (scrambling ts) unless the existing ordering
    # already satisfies it by prefix. repartitionByRange alone only
    # range-partitions — it does not order rows within a partition, so
    # both branches need the explicit sort for the row-group min/max
    # stats the module docstring promises.
    if target_file_partitions:
        df = df.repartition(target_file_partitions, *parts)
    else:
        df = df.repartitionByRange(F.col("env"), F.col("log_day"), F.col("ts"))
    df = df.sortWithinPartitions("env", "log_day", "ts")
    (
        df.write.mode(mode)
        .partitionBy("env", "log_day")
        .parquet(path)
    )


def read_log_store(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
