"""``spark.read.format("ftpfiles")`` — the FTP source as a native Spark
Python Data Source (the DSv2 TableProvider integration SURVEY.md §7 lists
as the idiomatic end-state; Spark 4's Python Data Source API makes it
implementable without a JVM jar).

Batch read:

    spark.dataSource.register(FtpFilesDataSource)
    df = (spark.read.format("ftpfiles")
          .option("host", "ftp.example.com")
          .option("user", "reader").option("password", "...")
          .option("pattern", "/logs/dir?/*.csv")           # full-path glob
          .option("numPartitions", "8")                    # fetch parallelism
          .option("fetch", "true")                         # false = metadata only
          .load())
    # → path, size, modification_time, content  (LISTING_SCHEMA)

The LISTING happens once on the driver (tiny metadata round-trips, same
as the reference's LIST traversal, FtpFileLister.scala:36-49); files are
hash-chunked into ``numPartitions`` input partitions and each EXECUTOR
opens its own FTP connection to RETR its share — the distributed-fetch
design of ``FtpSource.fetch`` surfaced through the standard reader API,
so filters/projections compose and the source can feed any DataFrame
pipeline (including the snapshot plan) without custom glue.

Streaming read (the reference's poll loop as a first-class source):

    df = spark.readStream.format("ftpfiles").option(...).load()

Each micro-batch lists the tree and emits ONLY files whose (size,
modification_time) changed against the offset — the requiresFetch
predicate (FtpMonitor.scala:35-46) — with the per-path metadata map
carried in the streaming offset, giving restartable change detection
from the checkpoint alone. The simple stream reader fetches on the
driver (Spark's prefetch path); deployments with large bodies should
emit metadata only (fetch=false) and join content via the distributed
batch fetch, or keep using StreamingIngest whose state table scales
past offset-JSON sizes.

Test seam: ``_make_source`` is the override point — tests register a
subclass whose ``_make_source`` returns a fake-client ``FtpSource``
(cloudpickle ships the subclass by value to executors).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from kafka_connect_ftp_spark.sources.ftp import FtpSource, _quietly_close, _retr

SCHEMA_DDL = "path string, size bigint, modification_time timestamp, content binary"


@dataclass
class FtpFilesPartition(InputPartition):
    """One executor's share of the matched files: [(path, size, mtime_iso)]."""

    files: list


class FtpFilesDataSource(DataSource):
    """Register with ``spark.dataSource.register(FtpFilesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "ftpfiles"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> "FtpFilesReader":
        return FtpFilesReader(self)

    def simpleStreamReader(self, schema) -> "FtpFilesStreamReader":
        return FtpFilesStreamReader(self)

    # -- override point (tests substitute a fake-client source) -----------
    def _make_source(self) -> FtpSource:
        o = self.options
        return FtpSource(
            host=o.get("host", "localhost"),
            user=o.get("user", "anonymous"),
            password=o.get("password", ""),
            port=int(o.get("port", 21)),
            timeout_seconds=float(o.get("timeout", 30.0)),
        )

    def _pattern(self) -> str:
        pattern = self.options.get("pattern")
        if not pattern:
            raise ValueError("ftpfiles requires .option('pattern', '/path/glob')")
        return pattern


class FtpFilesReader(DataSourceReader):
    def __init__(self, ds: FtpFilesDataSource) -> None:
        self.ds = ds
        self.n_partitions = int(ds.options.get("numPartitions", 8))
        self.fetch = ds.options.get("fetch", "true").lower() == "true"

    def partitions(self):
        src = self.ds._make_source()
        files = src.list_files(self.ds._pattern())
        if not files:
            return [FtpFilesPartition(files=[])]
        chunks: list[list] = [[] for _ in range(min(self.n_partitions, len(files)))]
        for i, (path, size, mtime) in enumerate(sorted(files)):
            chunks[i % len(chunks)].append((path, size, mtime.isoformat()))
        return [FtpFilesPartition(files=c) for c in chunks]

    def read(self, partition: FtpFilesPartition):
        if not partition.files:
            return
        src = self.ds._make_source()
        ftp = src._connect() if self.fetch else None
        try:
            for path, size, mtime_iso in partition.files:
                content = _retr(ftp, path) if ftp is not None else None
                yield path, size, dt.datetime.fromisoformat(mtime_iso), content
        finally:
            if ftp is not None:
                _quietly_close(ftp)


class FtpFilesStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch = one poll: emit files whose size/mtime changed vs the
    offset's per-path map (requiresFetch, F2), then advance the offset."""

    def __init__(self, ds: FtpFilesDataSource) -> None:
        self.ds = ds
        self.fetch = ds.options.get("fetch", "true").lower() == "true"

    def initialOffset(self) -> dict:
        return {"files": {}}

    def _poll(self, state: dict):
        src = self.ds._make_source()
        listing = src.list_files(self.ds._pattern())
        changed = [
            (path, size, mtime)
            for path, size, mtime in sorted(listing)
            if state.get(path) != [size, mtime.isoformat()]
        ]
        new_state = dict(state)
        for path, size, mtime in changed:
            new_state[path] = [size, mtime.isoformat()]
        rows = []
        if changed:
            ftp = src._connect() if self.fetch else None
            try:
                for path, size, mtime in changed:
                    content = _retr(ftp, path) if ftp is not None else None
                    rows.append((path, size, mtime, content))
            finally:
                if ftp is not None:
                    _quietly_close(ftp)
        return rows, new_state

    def read(self, start: dict):
        rows, new_state = self._poll(dict(start.get("files", {})))
        return iter(rows), {"files": new_state}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay after a crash: refetch exactly the paths
        # whose metadata advanced between the two offsets (at-least-once,
        # reference T5 semantics)
        s = start.get("files", {})
        e = end.get("files", {})
        changed = sorted(p for p, meta in e.items() if s.get(p) != meta)
        if not changed:
            return iter([])
        src = self.ds._make_source()
        rows = []
        ftp = src._connect() if self.fetch else None
        try:
            for path in changed:
                size, mtime_iso = e[path]
                content = _retr(ftp, path) if ftp is not None else None
                rows.append((path, size, dt.datetime.fromisoformat(mtime_iso), content))
        finally:
            if ftp is not None:
                _quietly_close(ftp)
        return iter(rows)
