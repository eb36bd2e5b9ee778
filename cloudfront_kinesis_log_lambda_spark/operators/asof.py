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


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: each ``left`` row gains the ``right_cols`` of
    the latest ``right`` row with the same ``on`` key and
    ``right.right_ts <= left.left_ts`` (NULLs when no such row).

    Both inputs must not already share non-key column names with the
    output suffix applied.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    lhs = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn(f"{right_ts}{suffix}", F.col("_ats")).withColumn("_side", F.lit(0))

    carried = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in right_cols]
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # right rows (side=0) sort before left rows at equal ts → ties are
    # inclusive, matching ASOF JOIN's `right.ts <= left.ts`
    w = (
        Window.partitionBy(on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carried:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return unioned.filter(F.col("_side") == 1).drop("_side", "_ats")
