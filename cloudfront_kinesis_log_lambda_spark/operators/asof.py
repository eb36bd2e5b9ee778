"""As-of (point-in-time) join — an operator the reference lacks and Spark
has no built-in for (SURVEY.md §2.5 joins row: "as-of join via
union+window").

Semantics: for each left row, attach the single right row with the same
key and the greatest right timestamp ≤ the left timestamp (backward
as-of, ties inclusive) — the trade/quote, event/price-snapshot join.

Spark-first design: NOT a join at all. A pairwise interval join would
either explode (range join) or need a per-key sort-merge UDF. Instead:
union both sides tagged with a side marker, one window partitioned by
key ordered by (ts, side), and `last(right_value, ignorenulls=True)`
carries the most recent right row forward onto each left row. Cost: one
shuffle on the key + one sort — identical shape to any groupBy on the
key, no row amplification, skew handled by AQE like any other shuffle.
At 100 TB this beats pandas merge_asof-per-group (no Python, no state):
the window is pipelined in one stage after the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None,
    suffix: str,
    direction: str,
    tolerance: str | None,
) -> DataFrame:
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    for tmp in ("_side", "_ats", "_rrow"):
        if tmp in left.columns or tmp in right.columns:
            raise ValueError(
                f"column name {tmp!r} is reserved by the as-of union — "
                "rename it on the input"
            )

    lhs = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    # carry each right row as ONE struct: per-column last(ignorenulls)
    # would stitch values from DIFFERENT right rows whenever the matched
    # row holds a NULL in some carried column — a row that never existed
    # (and the tolerance check would then judge a torn ts). The struct
    # from a right row is never null even when its fields are, so
    # last(struct, ignorenulls) picks exactly the latest right ROW.
    # NULL-ts right rows are excluded up front: `right.ts <= left.ts`
    # can never hold for them, but NULLS FIRST ordering would leak their
    # values onto left rows that have no match at all.
    rhs = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            F.col(on),
            F.col(right_ts).alias("_ats"),
            F.struct(
                F.col(right_ts).alias(f"{right_ts}{suffix}"),
                *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
            ).alias("_rrow"),
        )
        .withColumn("_side", F.lit(0))
    )

    carried = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in right_cols]
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    if direction == "backward":
        # right rows (side=0) sort before left rows at equal ts → ties
        # inclusive, matching ASOF JOIN's `right.ts <= left.ts`; the
        # carried value is the LAST right row seen so far
        w = (
            Window.partitionBy(on)
            .orderBy("_ats", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last
    else:
        # forward: left rows sort before right rows at equal ts (side
        # desc) so an equal-ts right row is inside the following frame;
        # the carried value is the FIRST right row at-or-after
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ats"), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first
    # NULL-ts LEFT rows can never match (`right.ts <=/>= NULL` never
    # holds), but NULLS FIRST ordering puts them at partition start where
    # the forward following-frame would otherwise hand them the earliest
    # right row — guard the carried struct on a real left ts.
    unioned = unioned.withColumn(
        "_rrow",
        F.when(
            F.col("_ats").isNotNull(), pick("_rrow", ignorenulls=True).over(w)
        ),
    )

    out = (
        unioned.filter(F.col("_side") == 1)
        .select("*", *[F.col(f"_rrow.{c}").alias(c) for c in carried])
        .drop("_side", "_ats", "_rrow")
    )
    if tolerance is not None:
        matched_ts = F.col(f"{right_ts}{suffix}")
        if direction == "backward":
            in_tol = matched_ts >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
        else:
            in_tol = matched_ts <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance}")
        # null out ALL carried columns of out-of-tolerance matches; the
        # condition is evaluated against the matched ts before any
        # nulling, so column order doesn't matter
        out = out.select(
            *[c for c in out.columns if c not in carried],
            *[
                F.when(in_tol, F.col(c)).alias(c)
                for c in carried
            ],
        )
    return out


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: each ``left`` row gains the ``right_cols`` of
    the latest ``right`` row with the same ``on`` key and
    ``right.right_ts <= left.left_ts`` (NULLs when no such row).
    ``tolerance`` (an INTERVAL string, e.g. ``"1 HOUR"``) additionally
    requires the match to lie within ``left_ts - tolerance`` — the
    pandas ``merge_asof(tolerance=...)`` contract.

    Both inputs must not already share non-key column names with the
    output suffix applied.
    """
    return _asof_join(
        left, right, on, left_ts, right_ts, right_cols, suffix, "backward", tolerance
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """Forward as-of join: the EARLIEST right row with
    ``right.right_ts >= left.left_ts`` (ties inclusive), optionally
    within ``left_ts + tolerance``. Same single-shuffle union+window
    shape as backward — the frame direction flips, nothing else."""
    return _asof_join(
        left, right, on, left_ts, right_ts, right_cols, suffix, "forward", tolerance
    )
