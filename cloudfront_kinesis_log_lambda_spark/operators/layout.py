"""Z-order clustered storage layout — multi-dimensional data skipping.

At 100 TB the scan you never run is the cheapest: parquet readers
(Spark's FileScan included) prune row groups whose column min/max
statistics cannot satisfy the pushed-down predicate. Pruning is only as
good as the LAYOUT — a table sorted by one key skips beautifully on
that key and not at all on any other. Z-ordering interleaves the bits
of several keys into one clustering value, so sorting by it keeps every
participating column's per-file/row-group [min, max] span narrow, and
box predicates over ANY subset of the keys prune.

This module is engine-honest about what it can claim:

- ``write_zordered`` produces the layout (bounded driver state: one
  min/max pair per column).
- ``skipping_fraction`` MEASURES it, straight from parquet row-group
  statistics via pyarrow — the fraction of row groups a stats-based
  reader must touch for a given box predicate. The test gate asserts
  z-order ≪ linear layout on 2-D boxes; the same stats drive Spark's
  own row-group pruning at scan time.

Z-value construction is all JVM-side: per-column QUANTILE bucketing to
``bits`` bits (approxQuantile boundaries collected once — 2^bits - 1
scalars per column, a bounded driver fetch; rank-based so skewed
distributions can't collapse a dimension's bits), then bit interleaving
with shiftleft/or. ``repartitionByRange`` on the z-value plus
``sortWithinPartitions`` gives globally range-clustered files (one
shuffle — the honest cost of re-clustering; at 100 TB this runs as the
compaction/OPTIMIZE job, not on the ingest path).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucketize(col: Column, boundaries: list[float], bits: int) -> Column:
    """Map col to its quantile bucket in [0, 2^bits): the count of
    boundaries the value exceeds. RANK-based, not linear-range — a
    linear (min-max) bucketization collapses under skew (a heavy-tailed
    column packs ~all rows into the bottom buckets, its high bits go
    constant, and the z-order silently degenerates to a single-key
    sort). Quantile boundaries give each bucket an equal row share on
    any distribution — the same choice production OPTIMIZE/z-order
    implementations make. 2^bits - 1 comparisons per row against an
    array literal; codegen-friendly, no join, no window."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    c = col.cast("double")
    return F.size(F.filter(arr, lambda b: c > b)).cast("long")


def zvalue(buckets: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each bucket column, round-robin from
    the high bit (Morton order): z = b0[hi] b1[hi] ... b0[hi-1] ..."""
    k = len(buckets)
    if k * bits > 63:
        # slot 63 is the long sign bit: z-values would go negative and
        # repartitionByRange would cluster the top buckets at the wrong
        # end — silent layout degradation, so refuse loudly
        raise ValueError(
            f"z-value needs {k * bits} bits but a signed long offers 63; "
            f"lower bits (e.g. {63 // k}) or cluster fewer columns"
        )
    terms = []
    for bit in range(bits):  # bit counted from the high end
        for j, b in enumerate(buckets):
            src = bits - 1 - bit  # source bit position in the bucket
            dst = (bits - 1 - bit) * k + (k - 1 - j)  # slot in the z-value
            terms.append(F.shiftleft(F.shiftright(b, src).bitwiseAND(F.lit(1)), dst))
    return reduce(lambda a, c: a.bitwiseOR(c), terms).alias("zvalue")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    One approxQuantile pass to fetch per-column bucket boundaries
    (bounded driver state: 2^bits - 1 scalars per column), one range
    shuffle on the z-value, a per-partition sort, and a plain parquet
    write — the z-value itself is dropped before writing, it is purely
    a clustering device.
    """
    if len(cols) * bits > 63:
        # fail the deterministic precondition BEFORE the approxQuantile
        # action — at scale that scan is the expensive part, and zvalue()
        # would only raise after it completed
        zvalue([F.lit(0)] * len(cols), bits)
    probs = [i / 2**bits for i in range(1, 2**bits)]
    bounds = df.stat.approxQuantile(cols, probs, 0.001)
    buckets = [
        _bucketize(F.col(c), bounds[i], bits) for i, c in enumerate(cols)
    ]
    (
        df.withColumn("_z", zvalue(buckets, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def skipping_fraction(path: str, box: dict[str, tuple]) -> float:
    """Fraction of parquet row groups whose statistics OVERLAP the box
    predicate {col: (lo, hi)} — i.e. the share a min/max-pruning reader
    (Spark's parquet scan, DuckDB, pyarrow) must actually read. Lower is
    better; 1.0 means the layout cannot skip at all for this predicate.

    This measures the same statistics Spark's row-group pruning consults,
    without depending on any engine's metric plumbing.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    total = touched = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        schema_names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        for rg in range(meta.num_row_groups):
            total += 1
            overlap = True
            for col, (lo, hi) in box.items():
                st = meta.row_group(rg).column(schema_names.index(col)).statistics
                # an all-null row group carries a Statistics object with
                # has_min_max=False (min/max None) — count it as touched,
                # exactly as a stats-pruning reader must
                if (
                    st is not None
                    and st.has_min_max
                    and (st.max < lo or st.min > hi)
                ):
                    overlap = False
                    break
            touched += overlap
    return touched / total if total else 1.0
