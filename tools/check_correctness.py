"""Local stand-in for the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it
to its DuckDB ``oracle_sql()`` twin: row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
exact equality after dtype normalization). Exits nonzero on mismatch.

By default the sweep runs on a **vanilla** SparkSession (bare builder, no
engine confs) — the same environment the external driver harness uses —
so session-conf skew between the engine factory and a plain session can
never hide a failure again. Pass ``--engine-session`` to use the tuned
``get_spark()`` factory instead.

Usage: python tools/check_correctness.py [--engine-session] [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

# anchor on the repo root (this file's parent dir), not the cwd — the
# gate must be runnable from anywhere, like bench.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--engine-session"]
    engine_session = "--engine-session" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod

    if engine_session:
        from cloudfront_kinesis_log_lambda_spark.session import get_spark

        spark = get_spark(app_name="check-correctness", master="local[8]")
    else:
        from pyspark.sql import SparkSession

        # driver-faithful: no engine confs at all (container TZ is UTC)
        spark = (
            SparkSession.builder.appName("check-correctness-vanilla")
            .master("local[8]")
            .getOrCreate()
        )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = only - set(queries)
        if unknown:
            # a typo'd filter must not run ZERO queries and still print
            # an all-green summary with exit 0 (false success)
            print(f"ERROR: unknown query names: {sorted(unknown)}")
            return 2
    n_run = 0
    failures = []
    def _release():
        # bench.py's between-timings discipline, same reason here: the
        # iterative entries localCheckpoint RDDs and never unpersist;
        # over a 176-entry sweep in ONE JVM the blocks accumulate into
        # memory pressure that fails the heaviest LATE entries with
        # opaque py4j errors (r13: part_triangle_stats errored at sweep
        # position ~170 at sf0.1, green in isolation)
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            spark.catalog.clearCache()
            # localCheckpoint blocks are released by the ContextCleaner
            # only after the DRIVER garbage-collects the Python/JVM
            # references — which a long sweep may never do on its own
            # (r15: the r13 phenomenon recurred at sf0.1, position ~170,
            # despite the unpersist loop above). Nudge both collectors.
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 — cleanup must never fail a sweep
            pass

    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.perf_counter()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        finally:
            _release()
        dt = time.perf_counter() - t0
        if name not in oracles:
            if len(got) == 0:
                # mirror the driver's weaker rows-only check: an empty
                # result is a regression, not a pass
                failures.append(name)
                print(f"FAIL  {name}: rows-only entry returned 0 rows")
            else:
                print(
                    f"OK?   {name}: {len(got)} rows (rows-only, no oracle) "
                    f"[{dt:.1f}s]"
                )
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            # a malformed oracle must record a FAIL and keep sweeping,
            # exactly like a Spark-side error — not abort the whole run
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        if sorted(got.columns) != sorted(exp.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(got)} != {len(exp)}")
            continue
        g, e = normalize(got), normalize(exp)
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"OK    {name}: {len(got)} rows [{dt:.1f}s]")
        except AssertionError as err:
            failures.append(name)
            msg = str(err).splitlines()
            print(f"FAIL  {name}: value mismatch: {' | '.join(msg[:3])}")
    print(f"\n{n_run - len(failures)}/{n_run} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
