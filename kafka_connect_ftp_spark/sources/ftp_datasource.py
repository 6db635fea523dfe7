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

Passing a narrowed ``.schema(...)`` (any subset/order of the four
columns) is honored: omit ``content`` and bodies are never fetched —
projection pushdown for the expensive column.

The LISTING happens once on the driver (tiny metadata round-trips, same
as the reference's LIST traversal, FtpFileLister.scala:36-49); files are
hash-chunked into ``numPartitions`` input partitions and each EXECUTOR
opens its own FTP connection to RETR its share — the distributed-fetch
design of ``FtpSource.fetch`` surfaced through the standard reader API,
so filters/projections compose and the source can feed any DataFrame
pipeline (including the snapshot plan) without custom glue. A file
deleted between planning and fetch is skipped (it no longer exists to
ingest) rather than failing the job on a frozen partition list.

Streaming read (the reference's poll loop as a first-class source):

    df = spark.readStream.format("ftpfiles").option(...).load()

Each micro-batch lists the tree and emits ONLY files whose (size,
modification_time) changed against the offset — the requiresFetch
predicate (FtpMonitor.scala:35-46) — with the per-path metadata map
carried in the streaming offset, giving restartable change detection
from the checkpoint alone. One FTP connection serves both the listing
and the fetches of a poll, and the listing mode (MLSD vs classic LIST)
is sticky per source so a flip never re-stamps the whole tree as
changed. ``.option("pruneDeleted", "true")`` drops vanished paths from
the offset map (bounding its growth under rotating filenames) at the
cost of re-emitting a path that later reappears with identical
metadata; the default keeps the reference's carry-over semantics.

Streaming fetch placement: the default stream reader is PARTITIONED
(``DataSourceStreamReader``) — the driver does only the metadata LIST
per trigger (exactly the reference's poll listing), offsets carry
metadata only, and the changed files are hash-chunked so each EXECUTOR
RETRs its share inside the micro-batch. Bodies never ride through the
driver. ``.option("streamMode", "simple")`` selects the previous
``SimpleDataSourceStreamReader`` path (driver-side prefetch), retained
for environments where executors cannot reach the FTP server.

Rate caps: ``maxFilesPerTrigger`` (count) and ``maxBytesPerTrigger``
(cumulative listed size; a single oversized file is still admitted
alone so the stream never stalls) both use L1 carry-over semantics —
cut files stay out of the offset and re-detect next trigger. One nuance
in partitioned mode: the caps are applied against the reader's
last-seen offset, which after a crash restart is unknown until the
engine replays — so the first trigger after a restart may exceed them
(it emits every pending change); steady state obeys the caps exactly.

Test seam: ``_make_source`` is the override point — tests register a
subclass whose ``_make_source`` returns a fake-client ``FtpSource``
(cloudpickle ships the subclass by value to executors).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.errors import PySparkNotImplementedError
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from kafka_connect_ftp_spark.sources.ftp import (
    FtpSource,
    _NoopClock,
    _quietly_close,
    _retr_or_none,
)

SCHEMA_DDL = "path string, size bigint, modification_time timestamp, content binary"
_ALL_FIELDS = ("path", "size", "modification_time", "content")


@dataclass
class FtpFilesPartition(InputPartition):
    """One executor's share of the matched files: [(path, size, mtime_iso)]."""

    files: list


def _parse_max_files(raw) -> int | None:
    """maxFilesPerTrigger: positive = cap, 0/unset = unlimited; anything
    negative is a config error, not a silent slice-from-the-end."""
    n = int(raw)
    if n < 0:
        raise ValueError(f"maxFilesPerTrigger must be >= 0, got {n}")
    return n or None


def _parse_max_bytes(raw) -> int | None:
    """maxBytesPerTrigger: positive = cap in bytes, 0/unset = unlimited."""
    n = int(raw)
    if n < 0:
        raise ValueError(f"maxBytesPerTrigger must be >= 0, got {n}")
    return n or None


def _cap_changed(changed: list, max_files: int | None, max_bytes: int | None) -> list:
    """Apply the rate caps to a sorted changed-file list: at most
    ``max_files`` entries AND cumulative listed size <= ``max_bytes``.
    The byte cap always admits at least one file, so a single file larger
    than the cap is still ingested (next trigger) instead of stalling the
    stream forever; whatever is cut stays out of the offset and carries
    over (L1 semantics, same as the file-count cap)."""
    if max_files is not None:
        changed = changed[:max_files]
    if max_bytes is not None:
        out, total = [], 0
        for f in changed:
            if out and total + f[1] > max_bytes:
                break
            out.append(f)
            total += f[1]
        changed = out
    return changed


# _retr_or_none lives in sources/ftp.py (review 9b): FtpSource.fetch
# needs the same vanished-file tolerance — one definition, imported
# in the module header above


class FtpFilesDataSource(DataSource):
    """Register with ``spark.dataSource.register(FtpFilesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "ftpfiles"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> "FtpFilesReader":
        return FtpFilesReader(self, schema)

    def streamReader(self, schema) -> "FtpFilesPartitionedStreamReader":
        if self.options.get("streamMode", "partitioned").lower() == "simple":
            # raising NOT_IMPLEMENTED makes the engine fall back to
            # simpleStreamReader (pyspark.sql.datasource_internal._streamReader)
            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED", messageParameters={"feature": "streamReader"}
            )
        return FtpFilesPartitionedStreamReader(self, schema)

    def simpleStreamReader(self, schema) -> "FtpFilesStreamReader":
        return FtpFilesStreamReader(self, schema)

    # -- override point (tests substitute a fake-client source) -----------
    def _make_source(self) -> FtpSource:
        o = self.options
        host = o.get("host")
        if not host:
            raise ValueError("ftpfiles requires .option('host', ...)")
        return FtpSource(
            host=host,
            user=o.get("user", "anonymous"),
            password=o.get("password", ""),
            port=int(o.get("port", 21)),
            timeout_seconds=float(o.get("timeout", 30.0)),
            tls=o.get("tls", "false").lower() in ("true", "1", "yes"),
        )

    def _pattern(self) -> str:
        pattern = self.options.get("pattern")
        if not pattern:
            raise ValueError("ftpfiles requires .option('pattern', '/path/glob')")
        return pattern


class FtpFilesReader(DataSourceReader):
    def __init__(self, ds: FtpFilesDataSource, schema=None) -> None:
        self.ds = ds
        self.n_partitions = int(ds.options.get("numPartitions", 8))
        if self.n_partitions < 1:
            raise ValueError("numPartitions must be >= 1")
        # honor a narrowed user schema: emit exactly its fields, and skip
        # the RETR entirely when content isn't requested
        names = tuple(f.name for f in schema.fields) if schema is not None else _ALL_FIELDS
        unknown = set(names) - set(_ALL_FIELDS)
        if unknown:
            raise ValueError(f"unknown ftpfiles columns: {sorted(unknown)}")
        self.fields = names
        self.fetch = (
            ds.options.get("fetch", "true").lower() == "true" and "content" in names
        )

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
        yield from _fetch_partition(self.ds, partition, self.fields, self.fetch)


def _fetch_partition(ds: FtpFilesDataSource, partition: FtpFilesPartition, fields, fetch: bool):
    """Executor-side body of both the batch and the partitioned-stream
    read: one FTP connection per partition, RETR each planned file,
    skip files deleted since planning, project to the requested fields."""
    if not partition.files:
        return
    src = ds._make_source()
    ftp = src._connect() if fetch else None
    clock = _NoopClock()
    try:
        for path, size, mtime_iso in partition.files:
            row = {
                "path": path,
                "size": size,
                "modification_time": dt.datetime.fromisoformat(mtime_iso),
                "content": None,
            }
            if ftp is not None:
                content = _retr_or_none(ftp, path)
                clock.tick(ftp)  # keepalive between transfers
                if content is None:
                    continue  # deleted since planning — nothing to ingest
                row["content"] = content
            yield tuple(row[f] for f in fields)
    finally:
        if ftp is not None:
            _quietly_close(ftp)


class FtpFilesStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch = one poll: emit files whose size/mtime changed vs the
    offset's per-path map (requiresFetch, F2), then advance the offset."""

    def __init__(self, ds: FtpFilesDataSource, schema=None) -> None:
        self.ds = ds
        # honor the user-provided schema (review 9b: tuples bind
        # POSITIONALLY to the planned schema — ignoring a narrowed or
        # reordered .schema() crashed or silently swapped columns; the
        # batch and partitioned readers already validate/project)
        names = tuple(f.name for f in schema.fields) if schema is not None else _ALL_FIELDS
        unknown = set(names) - set(_ALL_FIELDS)
        if unknown:
            raise ValueError(f"unknown ftpfiles columns: {sorted(unknown)}")
        self._names = names
        self.fetch = ds.options.get("fetch", "true").lower() == "true"
        self.prune_deleted = ds.options.get("pruneDeleted", "false").lower() == "true"
        # L1 rate limit (ftp.max.poll.records, FtpSourceTask.scala:31,47-52):
        # at most N changed files per micro-batch; the rest stay out of the
        # committed offset, so the next poll re-detects and carries them over.
        # maxBytesPerTrigger is the byte-denominated sibling for trees whose
        # file sizes vary wildly (one cap per dimension, both may be set).
        self.max_files = _parse_max_files(ds.options.get("maxFilesPerTrigger", 0))
        self.max_bytes = _parse_max_bytes(ds.options.get("maxBytesPerTrigger", 0))
        self._src: FtpSource | None = None

    def initialOffset(self) -> dict:
        return {"files": {}}

    def _project(self, path, size, mtime, content) -> tuple:
        vals = {
            "path": path,
            "size": size,
            "modification_time": mtime,
            "content": content,
        }
        return tuple(vals[n] for n in self._names)

    def _source(self) -> FtpSource:
        # one FtpSource per reader (not per poll): its sticky MLSD/LIST
        # mode then holds across micro-batches
        if self._src is None:
            self._src = self.ds._make_source()
        return self._src

    def _poll(self, state: dict):
        src = self._source()
        # a single connection serves the listing AND the fetches
        ftp = src._connect()
        try:
            listing = src.list_files(self.ds._pattern(), ftp=ftp)
            changed = [
                (path, size, mtime)
                for path, size, mtime in sorted(listing)
                if state.get(path) != [size, mtime.isoformat()]
            ]
            changed = _cap_changed(changed, self.max_files, self.max_bytes)
            if self.prune_deleted:
                live = {path for path, _, _ in listing}
                new_state = {p: m for p, m in state.items() if p in live}
            else:
                new_state = dict(state)
            rows = []
            clock = _NoopClock()
            for path, size, mtime in changed:
                content = None
                if self.fetch:
                    content = _retr_or_none(ftp, path)
                    clock.tick(ftp)
                    if content is None:
                        # vanished between LIST and RETR: do NOT commit
                        # its metadata (review 9b) — marking it
                        # delivered would silently skip the file if it
                        # reappears with identical (size, mtime), e.g.
                        # restored from backup
                        continue
                new_state[path] = [size, mtime.isoformat()]
                rows.append(self._project(path, size, mtime, content))
            return rows, new_state
        finally:
            _quietly_close(ftp)

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
        src = self._source()
        rows = []
        ftp = src._connect() if self.fetch else None
        try:
            for path in changed:
                size, mtime_iso = e[path]
                content = _retr_or_none(ftp, path) if ftp is not None else None
                if ftp is not None and content is None:
                    # vanished since the offset committed (review 9b):
                    # the original batch emitted real bytes — a phantom
                    # NULL-content row would not be a re-derivation, and
                    # the bytes are genuinely gone. Skip, like _poll
                    # skips a vanish before first delivery.
                    continue
                rows.append(
                    self._project(
                        path, size, dt.datetime.fromisoformat(mtime_iso), content
                    )
                )
        finally:
            if ftp is not None:
                _quietly_close(ftp)
        return iter(rows)


class FtpFilesPartitionedStreamReader(DataSourceStreamReader):
    """The default streaming reader: per trigger the DRIVER does only the
    metadata LIST (the reference's poll listing, FtpMonitor.scala:164-170)
    and advances a metadata-only offset; the changed files are chunked
    into input partitions and each EXECUTOR opens its own connection to
    RETR its share (same distributed-fetch path as the batch reader).
    File bodies therefore never pass through the driver — the round-2
    limitation of the simple reader."""

    def __init__(self, ds: FtpFilesDataSource, schema=None) -> None:
        self.ds = ds
        names = tuple(f.name for f in schema.fields) if schema is not None else _ALL_FIELDS
        unknown = set(names) - set(_ALL_FIELDS)
        if unknown:
            raise ValueError(f"unknown ftpfiles columns: {sorted(unknown)}")
        self.fields = names
        self.fetch = (
            ds.options.get("fetch", "true").lower() == "true" and "content" in names
        )
        self.n_partitions = int(ds.options.get("numPartitions", 8))
        if self.n_partitions < 1:
            raise ValueError("numPartitions must be >= 1")
        self.prune_deleted = ds.options.get("pruneDeleted", "false").lower() == "true"
        self.max_files = _parse_max_files(ds.options.get("maxFilesPerTrigger", 0))
        self.max_bytes = _parse_max_bytes(ds.options.get("maxBytesPerTrigger", 0))
        self._src: FtpSource | None = None
        # The last offset this reader produced or saw; None right after a
        # crash restart. The first latestOffset after a restart therefore
        # rebuilds from the live listing alone: it is uncapped (module
        # doc), and a path that was in the checkpointed offset but is
        # deleted from the server right now silently leaves the map — if
        # it later reappears with identical metadata it is re-emitted
        # (at-least-once, same trade pruneDeleted makes explicitly). The
        # engine's replay of a pending batch goes through partitions(),
        # which adopts the checkpointed offset exactly.
        self._offset: dict | None = None

    def _source(self) -> FtpSource:
        if self._src is None:
            self._src = self.ds._make_source()
        return self._src

    def initialOffset(self) -> dict:
        self._offset = {"files": {}}
        return {"files": {}}

    def latestOffset(self) -> dict:
        # driver side, metadata only — no data connection is ever opened
        listing = self._source().list_files(self.ds._pattern())
        state = dict(self._offset["files"]) if self._offset is not None else {}
        changed = [
            (path, size, mtime)
            for path, size, mtime in sorted(listing)
            if self._offset is None or state.get(path) != [size, mtime.isoformat()]
        ]
        if self._offset is not None:
            # L1 carry-over: only the capped slice advances the offset;
            # the rest re-detects next trigger (uncapped right after a
            # restart — module doc)
            changed = _cap_changed(changed, self.max_files, self.max_bytes)
        if self.prune_deleted:
            live = {path for path, _, _ in listing}
            state = {p: m for p, m in state.items() if p in live}
        for path, size, mtime in changed:
            state[path] = [size, mtime.isoformat()]
        self._offset = {"files": state}
        return {"files": dict(state)}

    def partitions(self, start: dict, end: dict):
        # also reached on crash replay of a pending batch (no prior
        # latestOffset call): adopt the replayed end as our last-seen state
        self._offset = {"files": dict(end.get("files", {}))}
        s = start.get("files", {})
        changed = sorted(
            (path, meta[0], meta[1])
            for path, meta in end.get("files", {}).items()
            if s.get(path) != meta
        )
        if not changed:
            return [FtpFilesPartition(files=[])]
        chunks: list[list] = [[] for _ in range(min(self.n_partitions, len(changed)))]
        for i, f in enumerate(changed):
            chunks[i % len(chunks)].append(f)
        return [FtpFilesPartition(files=c) for c in chunks]

    def read(self, partition: FtpFilesPartition):
        # EXECUTOR side — the fetch parallelizes across the cluster
        return _fetch_partition(self.ds, partition, self.fields, self.fetch)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine checkpoint; nothing to clean up

    def stop(self) -> None:
        self._src = None
