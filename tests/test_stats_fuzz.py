"""Seeded-random fuzz of the statistics/drift family against
pure-Python reference implementations — a SECOND independent check
besides the DuckDB oracles (which share each operator's expression
shape and so cannot catch a shared algebra mistake). The references
here are written from the textbook formulas, not from the Spark
code."""

from __future__ import annotations

import datetime
import math
import random

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators import quality as Q
from cloudfront_kinesis_log_lambda_spark.operators import stats as ST

REF = datetime.datetime(2024, 1, 10)
CUR = datetime.datetime(2024, 1, 20)


def test_chi2_fuzz_vs_reference(spark):
    rng = random.Random(813)
    for trial in range(5):
        rows = [
            (rng.choice("abcd"), rng.choice("xyz"))
            for _ in range(rng.randint(20, 200))
        ]
        got = ST.chi2_independence(
            spark.createDataFrame(rows, "r string, c string"), "r", "c"
        ).collect()[0]
        # textbook reference
        from collections import Counter

        obs = Counter(rows)
        rt = Counter(r for r, _ in rows)
        ct = Counter(c for _, c in rows)
        n = len(rows)
        chi2 = 0.0
        for r in rt:
            for c in ct:
                e = rt[r] * ct[c] / n
                chi2 += (obs.get((r, c), 0) - e) ** 2 / e
        assert abs(got["chi2"] - chi2) < 1e-5, f"trial {trial}"
        dof = (len(rt) - 1) * (len(ct) - 1)
        assert got["dof"] == dof
        v = math.sqrt(chi2 / (n * min(len(rt) - 1, len(ct) - 1)))
        assert abs(got["cramers_v"] - v) < 1e-5


def _ecdf_ks(ref_vals, cur_vals):
    pts = sorted(set(ref_vals) | set(cur_vals))
    d = 0.0
    for p in pts:
        f1 = sum(1 for x in ref_vals if x <= p) / len(ref_vals)
        f2 = sum(1 for x in cur_vals if x <= p) / len(cur_vals)
        d = max(d, abs(f1 - f2))
    return d


def test_ks_fuzz_vs_reference(spark):
    rng = random.Random(277)
    for trial in range(5):
        ref = [round(rng.uniform(0, 10), 2) for _ in range(rng.randint(5, 80))]
        cur = [round(rng.uniform(2, 12), 2) for _ in range(rng.randint(5, 80))]
        rows = [("t", REF, v) for v in ref] + [("t", CUR, v) for v in cur]
        (got,) = Q.ks_two_sample(
            spark.createDataFrame(
                rows, "event_type string, ts timestamp, value double"
            ),
            "event_type",
            "value",
            F.col("ts") < F.lit(Q.PSI_SPLIT),
        ).collect()
        want = _ecdf_ks(ref, cur)
        assert abs(got["ks_d"] - want) < 1e-5, f"trial {trial}"


def test_psi_fuzz_vs_reference(spark):
    rng = random.Random(631)
    for trial in range(5):
        ref = [rng.uniform(0, 100) for _ in range(rng.randint(20, 100))]
        cur = [rng.uniform(20, 150) for _ in range(rng.randint(20, 100))]
        rows = [("t", REF, v) for v in ref] + [("t", CUR, v) for v in cur]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        stats = Q.psi_ref_stats(
            df.filter(F.col("ts") < F.lit(Q.PSI_SPLIT)), "event_type", "value"
        )
        (got,) = Q.psi_from_counts(
            Q.psi_bin_counts(df, stats, Q.PSI_SPLIT), stats
        ).collect()
        # reference: equal-width bins over ref [min,max], clamp, +0.5
        vmin, vmax = min(ref), max(ref)

        def bin_of(v):
            if vmax == vmin:
                return 0
            return min(9, max(0, math.floor((v - vmin) / (vmax - vmin) * 10)))

        nr, nc = [0] * 10, [0] * 10
        for v in ref:
            nr[bin_of(v)] += 1
        for v in cur:
            nc[bin_of(v)] += 1
        psi = 0.0
        for b in range(10):
            p = (nr[b] + 0.5) / (len(ref) + 5.0)
            q = (nc[b] + 0.5) / (len(cur) + 5.0)
            psi += (q - p) * math.log(q / p)
        assert abs(got["psi"] - psi) < 1e-5, f"trial {trial}"


def test_benford_fuzz_vs_reference(spark):
    rng = random.Random(947)
    for trial in range(3):
        vals = [
            rng.uniform(0.001, 10000.0) for _ in range(rng.randint(30, 150))
        ]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = {r["digit"]: r for r in Q.benford_digits(df, "v").collect()}
        from collections import Counter

        digits = Counter(int(str(f"{v:.15e}")[0]) for v in vals)
        for d in range(1, 10):
            assert got[d]["n_obs"] == digits.get(d, 0), f"trial {trial} d{d}"
        mad = sum(
            abs(digits.get(d, 0) / len(vals) - math.log10(1 + 1 / d))
            for d in range(1, 10)
        ) / 9.0
        assert abs(got[1]["mad"] - mad) < 1e-5


def test_skew_profile_fuzz_vs_reference(spark):
    rng = random.Random(389)
    for trial in range(3):
        keys = [rng.randint(0, 20) for _ in range(rng.randint(30, 200))]
        got = ST.key_skew_profile(
            spark.createDataFrame([(k,) for k in keys], "k long"), "k"
        ).collect()[0]
        from collections import Counter

        counts = Counter(keys)
        t = len(keys)
        entropy = -sum(n / t * math.log(n / t) for n in counts.values())
        assert got["n_keys"] == len(counts)
        assert got["max_n"] == max(counts.values())
        assert abs(got["entropy"] - entropy) < 1e-5, f"trial {trial}"
        if len(counts) > 1:
            assert abs(
                got["balance"] - entropy / math.log(len(counts))
            ) < 1e-5


def test_basket_rules_fuzz_vs_reference(spark):
    from itertools import combinations

    from cloudfront_kinesis_log_lambda_spark.operators import mining as MN

    rng = random.Random(509)
    for trial in range(3):
        n_b = rng.randint(5, 25)
        baskets = {
            b: set(
                rng.sample("abcdefg", rng.randint(1, 5))
            )
            for b in range(n_b)
        }
        rows = [(b, i) for b, items in baskets.items() for i in items]
        got = {
            (r["item_a"], r["item_b"]): r
            for r in MN.basket_rules(
                spark.createDataFrame(rows, "basket long, item string"),
                min_support=0.0,
            ).collect()
        }
        # reference from first principles
        from collections import Counter

        item_n = Counter(i for s in baskets.values() for i in s)
        pair_n = Counter(
            p
            for s in baskets.values()
            for p in combinations(sorted(s), 2)
        )
        assert set(got) == set(pair_n), f"trial {trial}"
        # tolerance, not ==: Spark ROUND is HALF_UP, Python round()
        # is HALF_EVEN — exact comparison is a seed-change time bomb
        # at .5e-6 boundaries (review finding)
        for (a, b), n in pair_n.items():
            r = got[(a, b)]
            assert r["pair_n"] == n
            assert abs(r["support"] - n / n_b) < 1e-6
            assert abs(r["conf_a_to_b"] - n / item_n[a]) < 1e-6
            assert abs(r["conf_b_to_a"] - n / item_n[b]) < 1e-6
            assert abs(r["lift"] - n * n_b / (item_n[a] * item_n[b])) < 1e-6
