"""Python Data Source tests: spark.read.format("ftpfiles") end to end
against the in-memory fake FTP client, plus the streaming reader's
poll/offset semantics (change detection + crash replay)."""

from __future__ import annotations

import pytest

from kafka_connect_ftp_spark.sources.ftp import FtpSource
from kafka_connect_ftp_spark.sources.ftp_datasource import (
    FtpFilesDataSource,
    FtpFilesPartitionedStreamReader,
    FtpFilesReader,
    FtpFilesStreamReader,
)
from tests.test_ftp_source import TREE, FakeFtp

_FILES = dict(TREE)
_MTIMES: dict[str, str] = {}


class FakeFtpFilesDataSource(FtpFilesDataSource):
    """Same source, fake transport — cloudpickle ships this subclass (and
    the module-level _FILES it closes over) to executors by value."""

    @classmethod
    def name(cls):
        return "fakeftpfiles"

    def _make_source(self):
        return FtpSource(
            host="fake", _client_factory=lambda: FakeFtp(_FILES, mtimes=_MTIMES)
        )


def _ds(options: dict) -> FakeFtpFilesDataSource:
    return FakeFtpFilesDataSource(options=options)


def test_batch_read_via_spark_format(spark):
    spark.dataSource.register(FakeFtpFilesDataSource)
    df = (
        spark.read.format("fakeftpfiles")
        .option("pattern", "/a/dir?/path/*.txt")
        .option("numPartitions", "2")
        .load()
    )
    got = {r.path: (r.size, bytes(r.content)) for r in df.collect()}
    assert got == {
        "/a/dira/path/file1.txt": (3, b"one"),
        "/a/dirb/path/file3.txt": (5, b"three"),
    }
    # projections/filters compose like any DataFrame source
    assert df.filter("size > 3").count() == 1


def test_batch_metadata_only_skips_fetch(spark):
    spark.dataSource.register(FakeFtpFilesDataSource)
    df = (
        spark.read.format("fakeftpfiles")
        .option("pattern", "/a/dirb/path/*")
        .option("fetch", "false")
        .load()
    )
    rows = df.collect()
    assert {r.path for r in rows} == {"/a/dirb/path/file3.txt", "/a/dirb/path/file4.csv"}
    assert all(r.content is None for r in rows)


def test_reader_partitions_cover_all_files_once():
    reader = FtpFilesReader(_ds({"pattern": "/a/**", "numPartitions": "3"}))
    parts = reader.partitions()
    all_files = [f for p in parts for f in p.files]
    assert sorted(p for p, _, _ in all_files) == sorted(_FILES)
    assert len(parts) == 3


def test_missing_pattern_rejected():
    with pytest.raises(ValueError, match="pattern"):
        FtpFilesReader(_ds({"numPartitions": "2"})).partitions()


def test_missing_host_rejected():
    with pytest.raises(ValueError, match="host"):
        FtpFilesDataSource(options={"pattern": "/a/*"})._make_source()


def test_bad_num_partitions_rejected():
    with pytest.raises(ValueError, match="numPartitions"):
        FtpFilesReader(_ds({"pattern": "/a/**", "numPartitions": "0"}))


def test_narrowed_schema_skips_fetch(spark):
    # projection pushdown for the expensive column: no content field →
    # reader never opens a data connection
    spark.dataSource.register(FakeFtpFilesDataSource)
    df = (
        spark.read.format("fakeftpfiles")
        .schema("path string, size bigint")
        .option("pattern", "/a/dirb/path/*")
        .load()
    )
    assert df.columns == ["path", "size"]
    got = {(r.path, r.size) for r in df.collect()}
    assert got == {("/a/dirb/path/file3.txt", 5), ("/a/dirb/path/file4.csv", 4)}
    reader = FtpFilesReader(_ds({"pattern": "/a/**"}), schema=df.schema)
    assert reader.fetch is False
    with pytest.raises(ValueError, match="unknown"):
        FtpFilesReader(
            _ds({"pattern": "/a/**"}),
            schema=spark.createDataFrame([], "path string, nope int").schema,
        )


def test_deleted_between_planning_and_fetch_skipped():
    reader = FtpFilesReader(_ds({"pattern": "/a/dirb/path/*", "numPartitions": "1"}))
    [part] = reader.partitions()
    # simulate rotation: one planned file vanishes before the fetch
    part.files = [("/a/gone.txt", 4, "2024-06-01T12:00:00")] + part.files
    rows = list(reader.read(part))
    assert {r[0] for r in rows} == {"/a/dirb/path/file3.txt", "/a/dirb/path/file4.csv"}


def test_readstream_end_to_end_microbatch(spark):
    # the full engine path: spark.readStream → SimpleDataSourceStreamReader
    # → memory sink, one availableNow micro-batch over the fake tree
    spark.dataSource.register(FakeFtpFilesDataSource)
    df = (
        spark.readStream.format("fakeftpfiles")
        .option("pattern", "/a/dirb/path/*")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("ftp_stream_e2e")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r.path, r.size, bytes(r.content))
        for r in spark.sql("SELECT * FROM ftp_stream_e2e").collect()
    }
    assert got == {
        ("/a/dirb/path/file3.txt", 5, b"three"),
        ("/a/dirb/path/file4.csv", 4, b"four"),
    }


def test_stream_prune_deleted_bounds_offset_and_reemits_restored():
    stream = FtpFilesStreamReader(
        _ds({"pattern": "/a/dirb/path/*", "pruneDeleted": "true"})
    )
    rows1, off1 = stream.read(stream.initialOffset())
    assert len(list(rows1)) == 2
    body = _FILES.pop("/a/dirb/path/file4.csv")
    try:
        rows2, off2 = stream.read(off1)
        assert list(rows2) == []
        # the vanished path left the offset map — growth stays bounded
        assert set(off2["files"]) == {"/a/dirb/path/file3.txt"}
        # restoring it with IDENTICAL metadata re-emits (carry-over mode
        # would stay silent — that's the documented trade-off)
        _FILES["/a/dirb/path/file4.csv"] = body
        rows3, _ = stream.read(off2)
        assert [r[0] for r in rows3] == ["/a/dirb/path/file4.csv"]
    finally:
        _FILES["/a/dirb/path/file4.csv"] = body


def test_stream_reader_poll_and_replay():
    stream = FtpFilesStreamReader(_ds({"pattern": "/a/dirb/path/*"}))
    off0 = stream.initialOffset()
    rows1, off1 = stream.read(off0)
    emitted1 = {r[0]: r[3] for r in rows1}
    assert emitted1 == {
        "/a/dirb/path/file3.txt": b"three",
        "/a/dirb/path/file4.csv": b"four",
    }
    # unchanged tree → empty micro-batch, offset stable
    rows2, off2 = stream.read(off1)
    assert list(rows2) == [] and off2 == off1
    # mutate one file (content + mtime): only it is re-emitted
    _FILES["/a/dirb/path/file3.txt"] = b"three-more"
    _MTIMES["/a/dirb/path/file3.txt"] = "20240601130000"
    try:
        rows3, off3 = stream.read(off2)
        assert {r[0]: r[3] for r in rows3} == {"/a/dirb/path/file3.txt": b"three-more"}
        # crash replay between committed offsets refetches exactly the delta
        replay = list(stream.readBetweenOffsets(off2, off3))
        assert [(r[0], r[3]) for r in replay] == [("/a/dirb/path/file3.txt", b"three-more")]
    finally:
        _FILES["/a/dirb/path/file3.txt"] = TREE["/a/dirb/path/file3.txt"]
        _MTIMES.clear()


def test_stream_fetch_runs_on_executors_not_driver(spark, tmp_path):
    """The partitioned stream reader must RETR bodies in executor
    processes; the driver may only LIST. PID-stamped transport calls are
    the evidence: every data-connection call must come from a non-driver
    process, while the listing calls come from the driver."""
    import os

    log = tmp_path / "calls.log"
    log_path = str(log)

    class SpyFtp(FakeFtp):
        def mlsd(self, path, facts=()):
            with open(log_path, "a") as fh:
                fh.write(f"LIST {os.getpid()}\n")
            return super().mlsd(path, facts)

        def retrbinary(self, cmd, callback):
            with open(log_path, "a") as fh:
                fh.write(f"RETR {os.getpid()}\n")
            return super().retrbinary(cmd, callback)

    class SpyFtpFilesDataSource(FtpFilesDataSource):
        @classmethod
        def name(cls):
            return "spyftpfiles"

        def _make_source(self):
            return FtpSource(
                host="fake", _client_factory=lambda: SpyFtp(_FILES, mtimes=_MTIMES)
            )

    spark.dataSource.register(SpyFtpFilesDataSource)
    df = (
        spark.readStream.format("spyftpfiles")
        .option("pattern", "/a/dirb/path/*")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("ftp_stream_execfetch")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r.path, bytes(r.content))
        for r in spark.sql("SELECT * FROM ftp_stream_execfetch").collect()
    }
    assert got == {
        ("/a/dirb/path/file3.txt", b"three"),
        ("/a/dirb/path/file4.csv", b"four"),
    }
    calls = [line.split() for line in log.read_text().splitlines()]
    retr_pids = {int(pid) for op, pid in calls if op == "RETR"}
    list_pids = {int(pid) for op, pid in calls if op == "LIST"}
    driver_pid = os.getpid()
    assert retr_pids, "expected at least one RETR"
    assert driver_pid not in retr_pids, "stream fetch ran on the driver"
    # the poll listing runs in Spark's dedicated streaming-source-runner
    # process (driver side); the fetches must happen in OTHER processes —
    # the executors' python workers
    assert list_pids, "expected at least one LIST"
    assert retr_pids.isdisjoint(list_pids), "fetch ran in the planning process"


def test_partitioned_stream_max_files_carries_over_and_chunks():
    """Offset semantics of the partitioned reader: capped latestOffset
    advance, carry-over on the next trigger, changed files spread across
    input partitions."""
    reader = FtpFilesPartitionedStreamReader(
        _ds({"pattern": "/a/dirb/path/*", "maxFilesPerTrigger": "1", "numPartitions": "2"})
    )
    off0 = reader.initialOffset()
    off1 = reader.latestOffset()
    assert sorted(off1["files"]) == ["/a/dirb/path/file3.txt"]  # capped at 1
    parts = reader.partitions(off0, off1)
    files = [f for p in parts for f in p.files]
    assert [f[0] for f in files] == ["/a/dirb/path/file3.txt"]
    off2 = reader.latestOffset()
    assert sorted(off2["files"]) == [
        "/a/dirb/path/file3.txt",
        "/a/dirb/path/file4.csv",
    ]  # carry-over arrived
    parts2 = reader.partitions(off1, off2)
    rows = [r for p in parts2 for r in reader.read(p)]
    assert [(r[0], r[3]) for r in rows] == [("/a/dirb/path/file4.csv", b"four")]
    # drained: offset stable, empty batch
    off3 = reader.latestOffset()
    assert off3 == off2
    assert [p.files for p in reader.partitions(off2, off3)] == [[]]


def test_partitioned_stream_replays_pending_batch_after_restart():
    """Crash replay: after a restart the engine re-executes the pending
    batch by calling partitions(start, end) on a FRESH reader with no
    prior latestOffset — the reader must reproduce exactly the files
    whose metadata advanced between the checkpointed offsets, and adopt
    end as its state so the next trigger caps correctly."""
    warm = FtpFilesPartitionedStreamReader(_ds({"pattern": "/a/dirb/path/*"}))
    off0 = warm.initialOffset()
    off1 = warm.latestOffset()

    fresh = FtpFilesPartitionedStreamReader(_ds({"pattern": "/a/dirb/path/*"}))
    rows = [r for p in fresh.partitions(off0, off1) for r in fresh.read(p)]
    assert {(r[0], r[3]) for r in rows} == {
        ("/a/dirb/path/file3.txt", b"three"),
        ("/a/dirb/path/file4.csv", b"four"),
    }
    # state adopted from the replayed end: nothing new → empty next batch
    off2 = fresh.latestOffset()
    assert off2 == off1
    assert [p.files for p in fresh.partitions(off1, off2)] == [[]]


def test_stream_max_bytes_per_trigger_carries_over():
    """maxBytesPerTrigger: the byte-denominated rate cap — cumulative
    listed size bounds the batch, remainder carries over, and a single
    oversized file still makes progress (admitted alone)."""
    stream = FtpFilesStreamReader(
        _ds({"pattern": "/a/dirb/path/*", "maxBytesPerTrigger": "1"})
    )
    # every file exceeds 1 byte; each trigger admits exactly one anyway
    rows1, off1 = stream.read(stream.initialOffset())
    assert [r[0] for r in rows1] == ["/a/dirb/path/file3.txt"]
    rows2, off2 = stream.read(off1)
    assert [r[0] for r in rows2] == ["/a/dirb/path/file4.csv"]
    rows3, _ = stream.read(off2)
    assert list(rows3) == []  # drained

    # a generous byte cap admits both files in one batch
    wide = FtpFilesStreamReader(
        _ds({"pattern": "/a/dirb/path/*", "maxBytesPerTrigger": "1000000"})
    )
    rows, _ = wide.read(wide.initialOffset())
    assert len(list(rows)) == 2

    with pytest.raises(ValueError, match="maxBytesPerTrigger"):
        FtpFilesStreamReader(_ds({"pattern": "/a/*", "maxBytesPerTrigger": "-1"}))


def test_partitioned_stream_restart_cap_overshoot_then_steady_state():
    """Documented cap nuance (module doc): maxFilesPerTrigger applies
    against the reader's LAST-SEEN offset, which right after a crash
    restart is unknown — the first trigger emits every pending change
    (uncapped); from the next trigger on the cap + carry-over semantics
    hold exactly."""
    opts = {"pattern": "/a/dirb/path/*", "maxFilesPerTrigger": "1"}
    warm = FtpFilesPartitionedStreamReader(_ds(opts))
    start = warm.initialOffset()  # committed checkpoint: empty state

    # crash; a fresh reader (restart) has no last-seen offset
    fresh = FtpFilesPartitionedStreamReader(_ds(opts))
    end = fresh.latestOffset()
    files = [f for p in fresh.partitions(start, end) for f in p.files]
    assert len(files) == 2  # both pending files: exceeds cap=1 (documented)

    # steady state after the restart trigger: cap + carry-over again
    _FILES["/a/dirb/path/file5.log"] = b"five"
    _FILES["/a/dirb/path/file6.log"] = b"six"
    try:
        off2 = fresh.latestOffset()
        batch2 = [f for p in fresh.partitions(end, off2) for f in p.files]
        assert [f[0] for f in batch2] == ["/a/dirb/path/file5.log"]  # capped
        off3 = fresh.latestOffset()
        batch3 = [f for p in fresh.partitions(off2, off3) for f in p.files]
        assert [f[0] for f in batch3] == ["/a/dirb/path/file6.log"]  # carry-over
    finally:
        _FILES.pop("/a/dirb/path/file5.log", None)
        _FILES.pop("/a/dirb/path/file6.log", None)


def test_stream_max_files_per_trigger_carries_over():
    """L1 parity (ftp.max.poll.records): a capped poll emits the first N
    changed files; the remainder stays out of the offset and arrives on
    the next micro-batch."""
    stream = FtpFilesStreamReader(
        _ds({"pattern": "/a/dirb/path/*", "maxFilesPerTrigger": "1"})
    )
    rows1, off1 = stream.read(stream.initialOffset())
    emitted1 = [r[0] for r in rows1]
    assert emitted1 == ["/a/dirb/path/file3.txt"]  # sorted order, capped at 1

    rows2, off2 = stream.read(off1)
    assert [r[0] for r in rows2] == ["/a/dirb/path/file4.csv"]  # carry-over

    rows3, off3 = stream.read(off2)
    assert list(rows3) == [] and off3 == off2  # drained
