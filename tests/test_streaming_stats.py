"""Streaming chi-square / Benford twins: the SUM-merged count stores
must reproduce the batch statistics BIT-IDENTICALLY over the union of
arrived rows, with categories split across batches, same-id retry
overwrites, and new-id double-count non-idempotence."""

from __future__ import annotations

from cloudfront_kinesis_log_lambda_spark.operators import quality as Q
from cloudfront_kinesis_log_lambda_spark.operators import stats as ST
from cloudfront_kinesis_log_lambda_spark.streaming.stats import (
    StreamingBenford,
    StreamingChi2,
)

CHI_WAVES = [
    # category 'a' only
    [("a", 0)] * 5 + [("a", 1)] * 3,
    # new category 'b' + more of an existing cell
    [("b", 0)] * 4 + [("a", 1)] * 2,
    # a column level seen only in the last wave
    [("a", 2)] * 3 + [("b", 1)] * 1,
]


def _cat(spark, rows):
    return spark.createDataFrame(rows, "r string, c int")


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_chi2_stream_equals_batch_per_wave(spark, tmp_path):
    t = StreamingChi2(str(tmp_path / "chi"), "r", "c")
    for i, wave in enumerate(CHI_WAVES):
        t(_cat(spark, wave), i)
        arrived = [r for w in CHI_WAVES[: i + 1] for r in w]
        got = _rows(t.chi2(spark))
        want = _rows(
            ST.chi2_independence(_cat(spark, arrived), "r", "c")
        )
        assert got == want, f"divergence after wave {i}"


def test_chi2_null_categories_match_batch(spark, tmp_path):
    """Review finding: the twin used to store NULL-category rows whose
    marginal mass stayed in rn/cn while their observed counts fell out
    of the null-blind grid equi-join, inflating chi². Both paths must
    drop NULL rv/cv identically."""
    waves = [
        [("a", 0)] * 4 + [(None, 0)] * 3 + [("a", None)] * 2,
        [("b", 1)] * 3 + [(None, None)] * 2 + [("b", 0)] * 1,
    ]
    t = StreamingChi2(str(tmp_path / "chi"), "r", "c")
    for i, wave in enumerate(waves):
        t(_cat(spark, wave), i)
        arrived = [r for w in waves[: i + 1] for r in w]
        got = _rows(t.chi2(spark))
        want = _rows(ST.chi2_independence(_cat(spark, arrived), "r", "c"))
        assert got == want, f"divergence after wave {i}"
    # NULLs are defects, not categories: n counts only fully-non-null rows
    assert _rows(t.chi2(spark))[0][0] == 8


def test_chi2_retry_and_double_count(spark, tmp_path):
    t = StreamingChi2(str(tmp_path / "chi"), "r", "c")
    t(_cat(spark, CHI_WAVES[0]), 0)
    once = _rows(t.chi2(spark))
    t(_cat(spark, CHI_WAVES[0]), 0)  # same-id retry: no change
    assert _rows(t.chi2(spark)) == once
    t(_cat(spark, CHI_WAVES[1]), 1)
    assert _rows(t.chi2(spark)) != once  # new data does change it


BEN_WAVES = [
    [(1.23,), (19.0,), (190.0,)],
    [(2.5,), (1.0,), (0.034,)],  # digit 3 appears only here
    [(-4.0,), (0.0,), (950.0,)],  # non-positives must not count
]


def _vals(spark, rows):
    return spark.createDataFrame(rows, "o_totalprice double")


def test_benford_stream_equals_batch(spark, tmp_path):
    b = StreamingBenford(str(tmp_path / "ben"), "o_totalprice")
    for i, wave in enumerate(BEN_WAVES):
        b(_vals(spark, wave), i)
        arrived = [r for w in BEN_WAVES[: i + 1] for r in w]
        got = _rows(b.digits(spark))
        want = _rows(Q.benford_digits(_vals(spark, arrived), "o_totalprice"))
        assert got == want, f"divergence after wave {i}"
    # the final audit saw 7 positive values across all 9 digit rows
    assert sum(r[1] for r in _rows(b.digits(spark))) == 7


# --- KS twin ---------------------------------------------------------------

import datetime

from cloudfront_kinesis_log_lambda_spark.streaming.stats import StreamingKS

KS_SPLIT = datetime.datetime(2024, 1, 16)
KS_REF = datetime.datetime(2024, 1, 10)
KS_CUR = datetime.datetime(2024, 1, 20)

KS_WAVES = [
    [("t", KS_REF, 1.0), ("t", KS_REF, 2.0), ("t", KS_CUR, 3.0)],
    [("t", KS_CUR, 4.0), ("u", KS_REF, 1.0)],  # type u ref-only so far
    # repeated grid point + a row exactly AT the split: both engines
    # must bucket it CURRENT (the split predicate is strict <) — an
    # `<=` drift on either side diverges here
    [("u", KS_CUR, 9.0), ("t", KS_REF, 2.0), ("t", KS_SPLIT, 3.0)],
]


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )


def test_ks_stream_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F
    from cloudfront_kinesis_log_lambda_spark.operators.quality import (
        ks_two_sample,
    )

    ks = StreamingKS(str(tmp_path / "ks"), KS_SPLIT)
    for i, wave in enumerate(KS_WAVES):
        ks(_ev(spark, wave), i)
        arrived = [r for w in KS_WAVES[: i + 1] for r in w]
        got = sorted(tuple(r) for r in ks.ks(spark).collect())
        want = sorted(
            tuple(r)
            for r in ks_two_sample(
                _ev(spark, arrived),
                "event_type",
                "value",
                F.col("ts") < F.lit(KS_SPLIT),
            ).collect()
        )
        assert got == want, f"divergence after wave {i}"
    # after wave 1 type u had no current sample → absent; present now
    assert {r[0] for r in ks.ks(spark).collect()} == {"t", "u"}
