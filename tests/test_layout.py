"""Z-order clustered layout (operators/layout.py): the skipping gate is
measured from REAL parquet row-group statistics — the same min/max a
stats-pruning reader (Spark's scan, DuckDB, pyarrow) consults — so the
claim "z-order prunes on every clustered dimension, a linear sort only
on its own key" is checked as numbers, not as a story."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import relational as R
from cloudfront_kinesis_log_lambda_spark.operators.layout import (
    skipping_fraction,
    write_zordered,
    zvalue,
)


def test_zvalue_is_morton_order(spark):
    # hand-checked 2-bit Morton codes for a 4x4 grid
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zvalue([F.col("x"), F.col("y")], bits=2).alias("z")
        ).collect()
    }
    assert got[(0, 0)] == 0 and got[(0, 1)] == 1 and got[(1, 0)] == 2
    assert got[(1, 1)] == 3 and got[(2, 2)] == 12 and got[(3, 3)] == 15
    # Morton property: interleaving is a bijection on the grid
    assert sorted(got.values()) == list(range(16))


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("layouts")
    e = R.load(spark, "/root/testdata/sf0.1", "events")
    z_dir, lin_dir = str(root / "zorder"), str(root / "linear")
    write_zordered(e, z_dir, ["user_id", "value"], n_files=16)
    # the comparison layout: globally sorted by user_id only (the best
    # single-key clustering — perfect on user_id, blind on value)
    (
        e.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lin_dir)
    )
    # row-share boxes, not range boxes: `value` is heavy-tailed, so 10%
    # of its RANGE is ~65% of its rows — selectivity must be defined in
    # quantile space or the gate measures the distribution, not the layout
    qs = e.stat.approxQuantile(["user_id", "value"], [0.4, 0.5], 0.001)
    return z_dir, lin_dir, qs


def test_zorder_skips_on_every_dimension(layouts):
    z_dir, lin_dir, qs = layouts
    # each box covers ~10% of rows on its dimension
    u_box = {"user_id": (qs[0][0], qs[0][1])}
    v_box = {"value": (qs[1][0], qs[1][1])}
    # the NON-sort-key dimension: linear layout cannot skip anything,
    # z-order must skip a solid share. Threshold 10/16: the ideal is
    # ~4/16 (two value bits), but repartitionByRange boundaries jitter
    # with the input's partitioning (session-state dependent under the
    # full suite), smearing a file across a bucket edge
    assert skipping_fraction(lin_dir, v_box) == 1.0
    assert skipping_fraction(z_dir, v_box) <= 0.625
    # on user_id both layouts skip (z-order need not beat the perfect
    # single-key sort, but must stay in its league)
    assert skipping_fraction(lin_dir, u_box) <= 0.25
    assert skipping_fraction(z_dir, u_box) <= 0.625
    # the 2-D box prunes harder than either 1-D box on z-order
    both = dict(u_box, **v_box)
    assert skipping_fraction(z_dir, both) <= skipping_fraction(z_dir, v_box)
    assert skipping_fraction(z_dir, both) <= 0.25


def test_zorder_roundtrip_loses_nothing(spark, layouts):
    z_dir, _, _ = layouts
    e = R.load(spark, "/root/testdata/sf0.1", "events")
    back = spark.read.parquet(z_dir)
    assert sorted(back.columns) == sorted(e.columns)  # no _z leak
    assert back.count() == e.count()
    a = e.agg(F.sum("event_id"), F.round(F.sum("value"), 2)).collect()
    b = back.agg(F.sum("event_id"), F.round(F.sum("value"), 2)).collect()
    assert a == b


def test_spark_scan_actually_prunes_rowgroups_on_zorder(spark, layouts):
    """End-to-end engine evidence: Spark's own parquet scan reads fewer
    rows under a selective value predicate on the z-ordered layout than
    on the linear one (row-group pruning driven by the same stats)."""
    z_dir, lin_dir, qs = layouts
    pred = (F.col("value") >= qs[1][0]) & (F.col("value") <= qs[1][1])

    def rows_scanned(path):
        df = spark.read.parquet(path).filter(pred)
        df.collect()
        # scan-leaf metric: rows produced AFTER row-group skip, BEFORE
        # the residual filter — the direct measure of pruning
        node = df._jdf.queryExecution().executedPlan()
        while node.children().length() > 0:
            node = node.children().apply(0)
        return int(node.metrics().apply("numOutputRows").value())

    assert rows_scanned(z_dir) < rows_scanned(lin_dir)
