"""Grouped Pandas-UDF surface: ``applyInPandas`` (grouped map) and
grouped-aggregate ``pandas_udf`` — the Arrow-batched escape hatches for
per-group logic the built-in functions can't express (model scoring,
scipy stats, custom normalizations).

The reference has no UDF surface at all (SURVEY.md §2.5); these two
queries exist to keep the engine's grouped-Python path exercised and
oracle-checked. The showcased computations (z-score, median) ARE
expressible natively — which is exactly what makes them machine-
checkable against DuckDB; swap the body for a real model and the Spark
plumbing (schema, grouping, Arrow batching) is already proven.

Scale notes: applyInPandas shuffles each group to one task and
materializes it as ONE pandas frame — the grouping key must therefore
have bounded per-group size. These queries key on ``user_id`` (group
size = events per user, bounded regardless of corpus size; cardinality
grows with the data, which is exactly what applyInPandas parallelizes
over). Keying on a 5-value column like event_type would materialize
~20% of the table per task — the anti-pattern. Grouped-agg pandas_udf
has the same contract per (group, column) series.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.util import (
    finite,
    in_ts_spine_domain,
    in_variance_domain,
)
from cloudfront_kinesis_log_lambda_spark.operators.relational import load


def zscore_by_group(
    df: DataFrame, key: str, value_col: str, id_cols: list[str]
) -> DataFrame:
    """Per-group z-score normalization via grouped-map ``applyInPandas``.

    Sample std (ddof=1) to match SQL STDDEV_SAMP; degenerate groups
    (n=1 or zero variance) emit z=0.0 rather than NaN so the output is
    total over input rows.
    """
    dtypes = dict(df.dtypes)
    # backtick-quote the identifiers (a raw-schema name like fle-status
    # would otherwise break the DDL parse) and build the list as a list
    # (empty id_cols must not leave a leading comma)
    fields = [f"`{c}` {dtypes[c]}" for c in id_cols]
    fields += [f"`{key}` {dtypes[key]}", "z double"]
    schema = ", ".join(fields)

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf[value_col].std(ddof=1)
        if pd.isna(s) or s == 0.0:
            z = pdf[value_col] * 0.0
        else:
            z = (pdf[value_col] - pdf[value_col].mean()) / s
        out = pdf[id_cols].copy()
        out[key] = pdf[key]
        out["z"] = z.round(4)
        return out

    # variance domain (r14): non-finite readings are missing, and a
    # value whose square exceeds DBL_MAX would overflow the oracle's
    # STDDEV_SAMP outright — excluded rows get no z-score (the output
    # is total over IN-DOMAIN rows)
    return (
        df.select(*id_cols, key, value_col)
        .filter(in_variance_domain(F.col(value_col)))
        .groupBy(key)
        .applyInPandas(norm, schema)
    )


def events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event values — bounded groups (events per
    user), cardinality scales with the corpus."""
    e = load(spark, sf_dir, "events")
    return zscore_by_group(e, "user_id", "value", ["event_id"])


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join via co-grouped ``applyInPandas`` — the
    cogroup(map) corner of the Pandas-UDF surface (grouped-map,
    grouped-agg, and UDTF live elsewhere): both sides are shuffled on
    the key, each key's two pandas frames meet in one task, and
    ``pandas.merge_asof`` does the per-group point-in-time merge.

    Semantically identical to ``operators.asof.asof_join_backward``
    (ties inclusive; among equal right timestamps the last in sort
    order wins — merge_asof's rule and the window formulation's
    ``last()`` agree), and oracle-checked against the same SQL. The
    union+window formulation remains the SCALE path: one shuffle, no
    Python, no per-key frame materialization. This one exists for the
    cases where the per-group logic genuinely needs pandas (model
    features around the match, interpolation) — with the usual cogroup
    contract that each key's rows fit one task's memory.

    Arrow ns-envelope participation domain (r15 hostile-dates sweep):
    the cogroup kernel crosses the Arrow boundary, which coerces event
    times to datetime64[ns] — an instant outside 1677..2262 cannot be
    REPRESENTED inside the kernel at all (pyarrow raises worker-side
    and one corrupt row kills the whole join). Out-of-envelope rows
    are excluded on both sides, literal-mirrored in the oracle; the
    two formulations are "semantically identical" ON that envelope.
    NULL-ts left rows keep their documented no-match row (NULL crosses
    Arrow fine)."""
    from pyspark.sql.types import StructField, StructType

    left = left.filter(
        F.col(left_ts).isNull() | in_ts_spine_domain(F.col(left_ts))
    )
    right = right.filter(in_ts_spine_domain(F.col(right_ts)))

    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    rtype = {f.name: f.dataType for f in right.schema.fields}
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(f"{right_ts}{suffix}", rtype[right_ts])]
        + [StructField(f"{c}{suffix}", rtype[c]) for c in right_cols]
    )
    left_cols = list(left.columns)
    out_cols = [f.name for f in out_schema.fields]
    ren = {right_ts: f"{right_ts}{suffix}", **{c: f"{c}{suffix}" for c in right_cols}}

    needed = {right_ts, *right_cols}

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=out_cols)
        # Catalyst may prune either side's data columns down to the
        # grouping key when the query doesn't consume them (e.g. a bare
        # count()) — the UDF still owes the right ROW COUNT, which for a
        # left as-of join is len(l); fill the pruned/unmatched columns
        # with object-dtype Nones (Arrow maps those to nulls of ANY
        # declared type; float NaN would fail the timestamp cast)
        if r.empty or not needed.issubset(r.columns):
            out = l.copy()
            for c in out_cols:
                if c not in out.columns:
                    out[c] = pd.Series([None] * len(out), index=out.index, dtype="object")
            return out.reindex(columns=out_cols)
        # NULL timestamps: merge_asof RAISES on null merge keys, while
        # the window twin excludes NULL-ts right rows (no match can
        # satisfy r.ts <= l.ts) and gives NULL-ts left rows a no-match
        # row — mirror both so "semantically identical" stays true
        r = r[[right_ts, *right_cols]].rename(columns=ren)
        r = r[r[f"{right_ts}{suffix}"].notna()]
        l_null = l[l[left_ts].isna()]
        l = l[l[left_ts].notna()]
        parts = []
        if len(l):
            if len(r):
                parts.append(
                    pd.merge_asof(
                        l.sort_values(left_ts, kind="stable"),
                        r.sort_values(f"{right_ts}{suffix}", kind="stable"),
                        left_on=left_ts,
                        right_on=f"{right_ts}{suffix}",
                        direction="backward",
                    )
                )
            else:
                parts.append(l.copy())
        if len(l_null):
            parts.append(l_null.copy())
        out = pd.concat(parts, ignore_index=True) if parts else l.copy()
        for c in out_cols:
            if c not in out.columns:
                out[c] = pd.Series(
                    [None] * len(out), index=out.index, dtype="object"
                )
        return out.reindex(columns=out_cols)

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(merge, out_schema)
    )


def events_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf: per-user median of ``value``.

    The UDAF receives each group's column as one pandas Series (Arrow
    transfer, no Python-per-row cost). Note Spark forbids mixing grouped-
    agg pandas UDFs with built-in aggregates in one ``agg``
    (INVALID_PANDAS_UDF_PLACEMENT) — compose via join instead if both are
    needed.
    """

    @F.pandas_udf("double")
    def median_udf(v: pd.Series) -> float:
        return float(v.median())

    # robust-stat domain (r14): non-finite readings are missing — pandas
    # median skips NaN while DuckDB sorts it greatest, so the exclusion
    # must be explicit and mirrored (a user with no finite reading has
    # no median row)
    e = load(spark, sf_dir, "events").filter(finite(F.col("value")))
    return e.groupBy("user_id").agg(
        F.round(median_udf("value"), 4).alias("median_value")
    )
