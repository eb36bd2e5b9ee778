"""Physical-layout operators: bucketing and skew salting.

These are the two knobs a 100 TB deployment turns that pure logical
plans don't express:

- **Bucketing** pre-shuffles a table once at write time. Two tables
  bucketed+sorted on the join key with the same bucket count join with
  NO exchange on either side — the per-query shuffle (the dominant cost
  of a fact⋈fact join at scale) is amortized into the write path.
  (AQE handles *moderate* skew; bucketing removes the shuffle entirely.)
- **Salting** splinters a pathologically hot key across ``salt``
  sub-keys. AQE's skew-join splitting handles most cases at runtime;
  explicit salting remains the answer when one key alone exceeds an
  executor (the reference does the same thing to Kinesis shards by
  re-rolling hot partition keys, cloudfront_kinesis_lambda.py:142-143).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) on
    ``bucket_col``. Readers joining two such tables on the bucket column
    get a shuffle-free (and with ``sort=True`` sort-free) sort-merge join.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``left``'s hot keys are split across ``salt``
    sub-partitions and ``right`` is replicated ``salt``× to meet them.

    Correct for any 1:N join where ``right`` is the N=1 side (each right
    row matched by key+salt exactly once). Left rows get a seeded-random
    salt — deterministic per task retry (rand(seed) re-derives from the
    partition seed), uniform across the salt space.
    """
    lsalt = left.withColumn("_salt", F.floor(F.rand(seed) * salt).cast("int"))
    rsalt = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return lsalt.join(rsalt, [on, "_salt"], how).drop("_salt")
