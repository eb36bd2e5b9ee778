"""Partitioned analytics-store layout: env/log_day pruning actually prunes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.operators.transforms import transform_cloudfront
from cloudfront_kinesis_log_lambda_spark.sinks.parquet import read_log_store, write_log_store
from cloudfront_kinesis_log_lambda_spark.sources.cloudfront import read_cloudfront_logs
from cloudfront_kinesis_log_lambda_spark.testing.fixtures import write_log_tree


def test_log_store_roundtrip_and_pruning(spark, tmp_path):
    src = tmp_path / "landing"
    store = str(tmp_path / "store")
    write_log_tree(str(src), rows=80, files_per_service=2)  # days 18 and 19
    enriched = transform_cloudfront(read_cloudfront_logs(spark, str(src)))
    write_log_store(enriched, store, mode="overwrite")

    # hive layout: env=<env>/log_day=<day>
    assert any(p.startswith("env=") for p in os.listdir(store))
    back = read_log_store(spark, store)
    assert back.count() == enriched.count()

    # partition pruning: filtering env+day must scan only that partition
    pruned = back.filter("env = 'prod' AND log_day = '2019-01-18'")
    plan = pruned.explain(extended=False) or pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 80  # one file's worth
    # all rows from the pruned read carry the filter values
    vals = pruned.select("env", F.col("log_day").cast("string")).distinct().collect()
    assert [tuple(v) for v in vals] == [("prod", "2019-01-18")]


def test_log_day_partition_is_utc_date_in_any_session_timezone(
    spark, tmp_path
):
    """r11 review fix: log_day comes from the @timestamp STRING (whose
    render is UTC-pinned by the wire contract), not date_format(ts) —
    date_format renders in the SESSION timezone, and write_log_store is
    public API callable from un-pinned sessions. A New York session
    filing a 01:00 UTC record under the previous day would split one
    UTC day across two partition values and skew the retention cutoff."""
    store = str(tmp_path / "store")
    enriched = spark.createDataFrame(
        [("2019-01-19T01:00:00+00:00", "prod"),
         ("2019-01-19T23:30:00+00:00", "prod")],
        "`@timestamp` string, env string",
    )
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        write_log_store(enriched, store, mode="overwrite")
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)
    days = sorted(os.listdir(os.path.join(store, "env=prod")))
    # pre-fix this read env=prod/log_day=2019-01-18 for the 01:00 row
    assert days == ["log_day=2019-01-19"], days


def test_compact_partition_preserves_rows_and_order(spark, tmp_path):
    """Compaction rewrites ONE partition's sliver files into few
    ts-sorted files: row set identical, other partitions untouched,
    within-file ts ordering kept (the row-group min/max contract)."""
    from cloudfront_kinesis_log_lambda_spark.sinks.parquet import (
        compact_partitions,
    )

    src = tmp_path / "landing"
    store = str(tmp_path / "store")
    write_log_tree(str(src), rows=60, files_per_service=2)
    enriched = transform_cloudfront(read_cloudfront_logs(spark, str(src)))
    # simulate streaming sliver files: several small appends, each
    # splitting every partition across multiple files
    for _ in range(4):
        write_log_store(enriched, store, mode="append",
                        target_file_partitions=3)

    part = os.path.join(store, "env=prod", "log_day=2019-01-18")
    before_files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    before_rows = sorted(
        map(tuple, spark.read.parquet(part).select("cf_request_id", "ts").collect())
    )
    other = os.path.join(store, "env=dev", "log_day=2019-01-18")
    other_files = set(os.listdir(other)) if os.path.isdir(other) else None

    n_out = compact_partitions(
        spark, store, [("env", "prod"), ("log_day", "2019-01-18")]
    )
    after_files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(after_files) == n_out <= len(before_files)
    after_rows = sorted(
        map(tuple, spark.read.parquet(part).select("cf_request_id", "ts").collect())
    )
    assert after_rows == before_rows
    if other_files is not None:  # untouched partitions keep their files
        assert set(os.listdir(other)) == other_files
    # within-file ordering: each output file individually ts-sorted
    for f in after_files:
        ts = [r["ts"] for r in spark.read.parquet(os.path.join(part, f)).select("ts").collect()]
        assert ts == sorted(ts)


def test_expire_partitions_directory_level_retention(spark, tmp_path):
    """Retention deletes exactly the log_day partitions older than the
    cutoff — a metadata operation, no scan, newer data intact."""
    from cloudfront_kinesis_log_lambda_spark.sinks.parquet import (
        expire_partitions,
    )

    src = tmp_path / "landing"
    store = str(tmp_path / "store")
    write_log_tree(str(src), rows=80, files_per_service=2)  # days 18 & 19
    enriched = transform_cloudfront(read_cloudfront_logs(spark, str(src)))
    write_log_store(enriched, store, mode="overwrite")

    deleted = expire_partitions(store, keep_days=1, today="2019-01-20")
    # cutoff 2019-01-19: day 18 goes, day 19 stays
    assert deleted and all("log_day=2019-01-18" in p for p in deleted)
    back = read_log_store(spark, store)
    days = {r[0] for r in back.select(F.col("log_day").cast("string")).distinct().collect()}
    assert days == {"2019-01-19"}


def test_compact_partition_with_zorder_clusters_and_preserves_rows(spark, tmp_path):
    """OPTIMIZE ... ZORDER BY shape: compaction re-clusters the
    partition by the Morton order of (user_id, value) — row set
    identical, and the rewritten files actually skip (row-group stats
    spans shrink vs the arrival-ordered slivers)."""
    from cloudfront_kinesis_log_lambda_spark.operators.layout import (
        skipping_fraction,
    )
    from cloudfront_kinesis_log_lambda_spark.operators.relational import load
    from cloudfront_kinesis_log_lambda_spark.sinks.parquet import (
        compact_partitions,
    )

    store = str(tmp_path / "events_store")
    e = load(spark, "/root/testdata/sf0.1", "events").withColumn(
        "log_day", F.date_format("ts", "yyyy-MM-dd")
    )
    day = e.select(F.min("log_day")).collect()[0][0]
    # arrival-ordered sliver appends (8 slivers × the day's data splits)
    day_df = e.filter(F.col("log_day") == day).drop("log_day")
    for i in range(8):
        day_df.filter(F.col("event_id") % 8 == i).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(store, f"log_day={day}"))

    part = os.path.join(store, f"log_day={day}")
    before_rows = sorted(
        r["event_id"] for r in spark.read.parquet(part).collect()
    )
    qs = day_df.stat.approxQuantile(["value"], [0.4, 0.5], 0.001)[0]
    before_skip = skipping_fraction(part, {"value": (qs[0], qs[1])})

    # small target → ~16 output files → 4 z bits → 2 bits per dimension
    # (2 files would give value no bit at all: the first interleaved bit
    # belongs to user_id)
    n_out = compact_partitions(
        spark, store, [("log_day", day)],
        target_file_bytes=8 * 1024, zorder_by=["user_id", "value"],
    )
    after_files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(after_files) == n_out > 1
    after_rows = sorted(
        r["event_id"] for r in spark.read.parquet(part).collect()
    )
    assert after_rows == before_rows
    after_skip = skipping_fraction(part, {"value": (qs[0], qs[1])})
    assert after_skip < before_skip


def test_compaction_crash_recovery_never_loses_rows(spark, tmp_path):
    """The swap journal must recover every crash window — including the
    one the naive sweep destroyed: a racing append recreating the live
    dir while the only pre-crash copy sits in trash."""
    import json
    import shutil

    from cloudfront_kinesis_log_lambda_spark.sinks.parquet import (
        _compact_manifest_path,
        _recover_compaction,
        compact_partitions,
    )

    store = str(tmp_path / "store")
    part = os.path.join(store, "log_day=2024-01-01")
    df = spark.range(0, 100).withColumn("ts", F.col("id").cast("timestamp"))
    df.write.mode("overwrite").parquet(part)
    rows_before = sorted(r["id"] for r in spark.read.parquet(part).collect())

    # stage the worst window: live dir renamed to trash, tmp complete,
    # manifest present — then a racing append recreates the live dir
    parent, base = os.path.split(part)
    trash = os.path.join(parent, f".{base}.old-1")
    tmp = os.path.join(parent, f".{base}.compacting-1")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.rename(part, trash)
    with open(_compact_manifest_path(part), "w") as f:
        json.dump({"tmp": os.path.basename(tmp), "trash": os.path.basename(trash)}, f)
    appended = spark.range(100, 120).withColumn("ts", F.col("id").cast("timestamp"))
    appended.write.mode("append").parquet(part)  # recreates live dir

    _recover_compaction(part)
    got = sorted(r["id"] for r in spark.read.parquet(part).collect())
    assert got == sorted(rows_before + list(range(100, 120)))  # nothing lost
    assert not os.path.isfile(_compact_manifest_path(part))
    assert not os.path.isdir(trash) and not os.path.isdir(tmp)
    # and the partition is still compactable afterwards
    n = compact_partitions(spark, store, [("log_day", "2024-01-01")])
    assert sorted(r["id"] for r in spark.read.parquet(part).collect()) == got

    # crash AFTER the swap committed (tmp renamed away, trash remains)
    os.makedirs(trash)
    with open(_compact_manifest_path(part), "w") as f:
        json.dump({"tmp": os.path.basename(tmp), "trash": os.path.basename(trash)}, f)
    _recover_compaction(part)
    assert not os.path.isdir(trash)
    assert sorted(r["id"] for r in spark.read.parquet(part).collect()) == got


def test_mid_restore_crash_states_converge(spark, tmp_path):
    """The restore path is phase-journaled: every crash point inside the
    racing-append recovery re-enters an idempotent restore instead of
    being misread as a plain mid-swap crash (which would promote the
    stale tmp and discard the appended rows folded into trash)."""
    import json

    from cloudfront_kinesis_log_lambda_spark.sinks.parquet import (
        _compact_manifest_path,
        _recover_compaction,
    )

    def stage(part, *, with_tmp, live_ids, trash_ids, phase):
        parent, base = os.path.split(part)
        trash = os.path.join(parent, f".{base}.old-9")
        tmp = os.path.join(parent, f".{base}.compacting-9")
        for d in (part, trash, tmp):
            if os.path.isdir(d):
                import shutil

                shutil.rmtree(d)
        spark.createDataFrame([(i,) for i in trash_ids], "id long").write.parquet(trash)
        if live_ids:
            spark.createDataFrame([(i,) for i in live_ids], "id long").write.parquet(part)
        if with_tmp:
            spark.createDataFrame([(i,) for i in trash_ids], "id long").coalesce(1).write.parquet(tmp)
        with open(_compact_manifest_path(part), "w") as f:
            json.dump(
                {"tmp": os.path.basename(tmp), "trash": os.path.basename(trash), "phase": phase},
                f,
            )
        return trash, tmp

    part = os.path.join(str(tmp_path / "s1"), "log_day=2024-01-01")
    os.makedirs(os.path.dirname(part))

    # crash right after journaling phase=restore (tmp still present)
    trash, tmp = stage(part, with_tmp=True, live_ids=[100, 101], trash_ids=list(range(10)), phase="restore")
    _recover_compaction(part)
    assert sorted(r["id"] for r in spark.read.parquet(part).collect()) == list(range(10)) + [100, 101]
    assert not os.path.isdir(trash) and not os.path.isdir(tmp)

    # crash mid-restore: tmp already deleted, appends not yet folded
    trash, tmp = stage(part, with_tmp=False, live_ids=[100, 101], trash_ids=list(range(10)), phase="restore")
    _recover_compaction(part)
    assert sorted(r["id"] for r in spark.read.parquet(part).collect()) == list(range(10)) + [100, 101]

    # crash late: appends folded into trash, live dir already removed
    trash, tmp = stage(part, with_tmp=False, live_ids=[], trash_ids=list(range(10)) + [100, 101], phase="restore")
    _recover_compaction(part)
    assert sorted(r["id"] for r in spark.read.parquet(part).collect()) == list(range(10)) + [100, 101]


def test_recovery_survives_crash_at_every_internal_step(spark, tmp_path):
    """r12: the staged-state tests above pin every DOCUMENTED crash
    state; this one mechanically enumerates a crash at EVERY filesystem
    mutation inside recovery itself (os.rename / os.remove /
    shutil.rmtree — including atomic_write_json's journaling rename),
    from the worst staged window (racing append recreated the live dir
    while the only pre-crash copy sits in trash). After each injected
    crash, one clean recovery must converge to the full row set with no
    debris, and a second clean recovery must be a no-op."""
    import json
    import shutil

    import cloudfront_kinesis_log_lambda_spark.sinks.parquet as P

    def stage(root):
        part = os.path.join(root, "log_day=2024-01-01")
        parent, base = os.path.split(part)
        trash = os.path.join(parent, f".{base}.old-7")
        tmp = os.path.join(parent, f".{base}.compacting-7")
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root)
        shutil.copytree(tpl_orig, trash)  # pre-swap originals
        shutil.copytree(tpl_orig, tmp)  # completed compacted copy
        shutil.copytree(tpl_app, part)  # the racing append's live dir
        with open(P._compact_manifest_path(part), "w") as f:
            json.dump(
                {"tmp": os.path.basename(tmp), "trash": os.path.basename(trash)},
                f,
            )
        return part, trash, tmp

    tpl_orig = str(tmp_path / "tpl_orig")
    tpl_app = str(tmp_path / "tpl_app")
    spark.range(0, 40).write.parquet(tpl_orig)
    spark.range(100, 110).write.parquet(tpl_app)
    want = list(range(0, 40)) + list(range(100, 110))

    real_rename, real_remove, real_rmtree = os.rename, os.remove, shutil.rmtree

    class Fuse:
        def __init__(self, budget):
            self.left = budget

        def spend(self):
            if self.left <= 0:
                raise RuntimeError("fuse")
            self.left -= 1

    root = str(tmp_path / "store")
    crash_points = 0
    for k in range(0, 50):
        part, trash, tmp = stage(root)
        fuse = Fuse(k)
        os.rename = lambda *a, **kw: (fuse.spend(), real_rename(*a, **kw))[1]
        os.remove = lambda *a, **kw: (fuse.spend(), real_remove(*a, **kw))[1]
        shutil.rmtree = lambda *a, **kw: (fuse.spend(), real_rmtree(*a, **kw))[1]
        try:
            P._recover_compaction(part)
            tripped = False
        except RuntimeError:
            tripped = True
            crash_points += 1
        finally:
            os.rename, os.remove, shutil.rmtree = (
                real_rename,
                real_remove,
                real_rmtree,
            )
        P._recover_compaction(part)  # the clean re-entry
        got = sorted(r["id"] for r in spark.read.parquet(part).collect())
        assert got == want, f"crash at mutation {k}: rows diverged"
        assert not os.path.isfile(P._compact_manifest_path(part)), k
        assert not os.path.isdir(trash) and not os.path.isdir(tmp), k
        P._recover_compaction(part)  # idempotence: second clean pass
        got2 = sorted(r["id"] for r in spark.read.parquet(part).collect())
        assert got2 == want, f"crash at mutation {k}: recovery not idempotent"
        if not tripped:
            break  # every internal mutation has been crash-enumerated
    else:
        raise AssertionError("fuse never exhausted — raise the bound")
    assert crash_points >= 3  # the window has real internal steps


def test_compaction_retains_trash_until_next_pass(spark, tmp_path):
    """After a successful swap the pre-compaction files stay in the
    dot-trash dir until the next maintenance pass — deferred cleanup +
    the crash-recovery source (NOT reader grace: the rename moved the
    files, so a plan holding the old paths fails — see the
    compact_partitions docstring for the reader contract)."""
    from cloudfront_kinesis_log_lambda_spark.sinks.parquet import compact_partitions

    store = str(tmp_path / "store")
    part = os.path.join(store, "log_day=2024-01-01")
    df = spark.range(0, 50).withColumn("ts", F.col("id").cast("timestamp"))
    for _ in range(3):
        df.write.mode("append").parquet(part)
    old_files = {f for f in os.listdir(part) if f.endswith(".parquet")}
    compact_partitions(spark, store, [("log_day", "2024-01-01")])
    graces = [e for e in os.listdir(store) if e.startswith(".log_day=2024-01-01.old-")]
    assert len(graces) == 1  # the swapped-out originals survive...
    kept = set(os.listdir(os.path.join(store, graces[0])))
    assert old_files <= kept
    # ...until the next maintenance pass of this partition sweeps them
    compact_partitions(spark, store, [("log_day", "2024-01-01")])
    remaining = [e for e in os.listdir(store) if e.startswith(".log_day=2024-01-01.old-")]
    assert len(remaining) == 1  # only the NEW grace copy


def test_reader_across_zorder_swap_pins_documented_contract(spark, tmp_path):
    """The reader contract the compact_partitions docstring documents
    (r5 ADVICE: the old 'reader grace' claim was ineffective — renames
    move files out from under path-holding plans). Pin BOTH halves:

    1. a plan whose file index resolved BEFORE a ZORDER compaction of a
       multi-file partition CANNOT be collected after the swap (its
       listed paths moved to the dot-trash) — it must raise, never
       silently return wrong rows;
    2. a RE-RESOLVED scan after the swap returns exactly the full,
       re-clustered content (the swap is all-or-nothing)."""
    import pytest

    from cloudfront_kinesis_log_lambda_spark.sinks.parquet import (
        compact_partitions,
    )

    store = str(tmp_path / "store")
    part = os.path.join(store, "log_day=2024-01-01")
    df = (
        spark.range(0, 200)
        .withColumn("ts", F.col("id").cast("timestamp"))
        .withColumn("a", (F.col("id") % 7).cast("int"))
        .withColumn("b", (F.col("id") % 11).cast("int"))
    )
    for _ in range(3):  # multi-file partition
        df.write.mode("append").parquet(part)
    held = spark.read.parquet(part)  # file index resolves NOW
    held.count()  # force the resolution before the swap
    compact_partitions(
        spark, store, [("log_day", "2024-01-01")], zorder_by=["a", "b"]
    )
    with pytest.raises(Exception, match="(?i)file|path|exist"):
        held.collect()  # held paths moved → hard error, not silence
    fresh = spark.read.parquet(part)
    assert fresh.count() == 600
    assert fresh.agg(F.sum("id")).collect()[0][0] == 3 * sum(range(200))


def test_expire_recovers_crashed_compactions_and_frees_dot_artifacts(spark, tmp_path):
    """Retention must not skip a day stuck mid-swap (no live dir, data
    hiding in dot-artifacts): expire recovers it first, then deletes
    expired days INCLUDING their grace/temp artifacts; a non-expired
    crashed day comes back to life."""
    import json

    from cloudfront_kinesis_log_lambda_spark.sinks.parquet import (
        _compact_manifest_path,
        expire_partitions,
    )

    store = str(tmp_path / "store")
    env = os.path.join(store, "env=prod")
    os.makedirs(env)

    def crash_mid_swap(day, ids):
        part = os.path.join(env, f"log_day={day}")
        trash = os.path.join(env, f".log_day={day}.old-7")
        tmp = os.path.join(env, f".log_day={day}.compacting-7")
        spark.createDataFrame([(i,) for i in ids], "id long").write.parquet(trash)
        spark.createDataFrame([(i,) for i in ids], "id long").coalesce(1).write.parquet(tmp)
        with open(_compact_manifest_path(part), "w") as f:
            json.dump({"tmp": os.path.basename(tmp), "trash": os.path.basename(trash)}, f)
        return part

    old_part = crash_mid_swap("2024-01-01", list(range(5)))    # expired
    new_part = crash_mid_swap("2024-03-01", list(range(5, 9)))  # kept

    deleted = expire_partitions(store, keep_days=30, today="2024-03-02")
    assert deleted == [old_part]
    # the expired day left NOTHING behind — live, trash, tmp, manifest
    assert [e for e in os.listdir(env) if "2024-01-01" in e] == []
    # the kept crashed day was recovered to a live readable dir
    assert sorted(r["id"] for r in spark.read.parquet(new_part).collect()) == [5, 6, 7, 8]


def test_target_file_partitions_actually_splits_files(spark, tmp_path):
    """target_file_partitions must control per-partition file counts: a
    hash repartition on the Hive columns alone puts each (env, log_day)
    in ONE task → one file, silently ignoring the request."""
    import pytest

    src = tmp_path / "landing"
    store = str(tmp_path / "store")
    write_log_tree(str(src), rows=60, files_per_service=2)
    enriched = transform_cloudfront(read_cloudfront_logs(spark, str(src)))
    write_log_store(enriched, store, mode="overwrite", target_file_partitions=3)
    part = os.path.join(store, "env=prod", "log_day=2019-01-18")
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(files) >= 2  # the day genuinely split across files
    with pytest.raises(ValueError, match="target_file_partitions"):
        write_log_store(enriched, store, target_file_partitions=0)
