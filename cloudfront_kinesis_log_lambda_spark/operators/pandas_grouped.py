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
    out_fields = ", ".join(f"{c} {dtypes[c]}" for c in id_cols)
    schema = f"{out_fields}, {key} {dtypes[key]}, z double"

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

    return df.select(*id_cols, key, value_col).groupBy(key).applyInPandas(
        norm, schema
    )


def events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event values — bounded groups (events per
    user), cardinality scales with the corpus."""
    e = load(spark, sf_dir, "events")
    return zscore_by_group(e, "user_id", "value", ["event_id"])


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

    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.round(median_udf("value"), 4).alias("median_value")
    )
