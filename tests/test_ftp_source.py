"""FTP source tests against an in-memory fake ftplib client — the unit
analog of FtpFileListerTest.scala: glob traversal over a directory tree,
plus the distributed fetch path and the full snapshot round trip."""

from __future__ import annotations

import datetime as dt

import pytest

from kafka_connect_ftp_spark.ingest.model import MonitoredPath
from kafka_connect_ftp_spark.ingest.snapshot import empty_state, snapshot
from kafka_connect_ftp_spark.sources.ftp import FtpSource


class FakeFtp:
    """Minimal ftplib.FTP stand-in: a dict tree of path -> bytes."""

    def __init__(
        self,
        files: dict[str, bytes],
        mtime: str = "20240601120000",
        mtimes: dict[str, str] | None = None,
    ):
        self.files = files
        self.mtime = mtime
        self.mtimes = mtimes or {}
        self.dirs = set()
        for p in files:
            parts = p.strip("/").split("/")
            for i in range(len(parts)):
                self.dirs.add("/" + "/".join(parts[:i]))

    def mlsd(self, path, facts=()):
        path = path.rstrip("/") or "/"
        if path not in self.dirs:
            import ftplib

            raise ftplib.error_perm("550 no such dir")
        out = []
        seen = set()
        for p, body in self.files.items():
            parent, _, name = p.rpartition("/")
            if (parent or "/") == path:
                out.append(
                    (name, {"type": "file", "size": str(len(body)),
                            "modify": self.mtimes.get(p, self.mtime)})
                )
        for d in self.dirs:
            parent, _, name = d.rpartition("/")
            if (parent or "/") == path and name and name not in seen:
                seen.add(name)
                out.append((name, {"type": "dir"}))
        return out

    def retrbinary(self, cmd, callback):
        path = cmd.split(" ", 1)[1]
        callback(self.files[path])

    def quit(self):
        pass


TREE = {
    "/a/dira/path/file1.txt": b"one",
    "/a/dirb/nopath/file2.txt": b"two",
    "/a/dirb/path/file3.txt": b"three",
    "/a/dirb/path/file4.csv": b"four",
}


@pytest.fixture
def src():
    files = dict(TREE)
    return FtpSource(host="fake", _client_factory=lambda: FakeFtp(files)), files


def test_glob_traversal_matches_reference_fixture(src):
    source, _ = src
    got = sorted(p for p, _, _ in source.list_files("/a/dir?/path/*.txt"))
    assert got == ["/a/dira/path/file1.txt", "/a/dirb/path/file3.txt"]


def test_fixed_path_listing(src):
    source, _ = src
    got = [(p, s) for p, s, _ in source.list_files("/a/dirb/path/file4.csv")]
    assert got == [("/a/dirb/path/file4.csv", 4)]


def test_listing_dataframe_and_distributed_fetch(spark, src):
    source, _ = src
    monitors = [MonitoredPath("/a/dirb/path/", topic="t")]
    meta = source.listing(spark, monitors)
    assert {r.path for r in meta.collect()} == {
        "/a/dirb/path/file3.txt",
        "/a/dirb/path/file4.csv",
    }
    fetched = source.fetch(spark, meta)
    got = {r.path: bytes(r.value if hasattr(r, "value") else r.content) for r in fetched.collect()}
    assert got == {
        "/a/dirb/path/file3.txt": b"three",
        "/a/dirb/path/file4.csv": b"four",
    }


def test_ftp_listing_through_snapshot_plan(spark, src):
    source, files = src
    monitors = [MonitoredPath("/a/dirb/path/", topic="files")]
    listing = source.fetch(spark, source.listing(spark, monitors))
    records, state = snapshot(
        listing, empty_state(spark), monitors, now="2024-06-01 12:00:00"
    )
    got = {(r.key_name, bytes(r.value)) for r in records.collect()}
    assert got == {
        ("/a/dirb/path/file3.txt", b"three"),
        ("/a/dirb/path/file4.csv", b"four"),
    }
    # mutate the remote; second tick sees only the change
    files["/a/dirb/path/file3.txt"] = b"three+more"
    source2 = FtpSource(host="fake", _client_factory=lambda: FakeFtp(files, mtime="20240601120100"))
    listing2 = source2.fetch(spark, source2.listing(spark, monitors))
    state = spark.createDataFrame(state.collect(), state.schema)
    records2, _ = snapshot(
        listing2, state, monitors, now="2024-06-01 12:01:00", drop_empty=True
    )
    got2 = {(r.key_name, bytes(r.value)) for r in records2.collect()}
    assert got2 == {("/a/dirb/path/file3.txt", b"three+more")}


def test_timestamp_parsing():
    src = FtpSource(host="fake", _client_factory=lambda: FakeFtp({"/x/f": b"z"}, mtime="20231231235959"))
    [(_, _, mtime)] = src.list_files("/x/*")
    assert mtime == dt.datetime(2023, 12, 31, 23, 59, 59)


class CountingFtp(FakeFtp):
    retr_count = 0  # class-level: survives executor->driver via... no — see test

    def retrbinary(self, cmd, callback):
        # count RETRs through a file-based counter (executor processes
        # can't mutate driver state)
        with open(self._counter_path, "a") as fh:
            fh.write(cmd.split(" ", 1)[1] + "\n")
        super().retrbinary(cmd, callback)


def test_incremental_fetch_skips_unchanged(spark, tmp_path):
    counter = str(tmp_path / "retrs.log")
    files = dict(TREE)

    def factory():
        ftp = CountingFtp(files)
        ftp._counter_path = counter
        return ftp

    source = FtpSource(host="fake", _client_factory=factory)
    monitors = [MonitoredPath("/a/dirb/path/", topic="t")]

    meta = source.listing(spark, monitors)
    listing = source.incremental_fetch(spark, meta, empty_state(spark))
    records, state = snapshot(listing, empty_state(spark), monitors, now="2024-06-01 12:00:00")
    assert records.count() == 2
    # pin state BEFORE clearing the counter: collecting it re-evaluates
    # the tick-0 pipeline (and its RETRs) one more time
    state = spark.createDataFrame(state.collect(), state.schema)
    fetched_tick0 = set(open(counter).read().split())
    assert fetched_tick0 == {"/a/dirb/path/file3.txt", "/a/dirb/path/file4.csv"}

    # tick 1: only file3 changes (its mtime alone advances); file4 must
    # NOT be RETR'd again
    open(counter, "w").close()
    files["/a/dirb/path/file3.txt"] = b"three-changed"

    def factory2():
        ftp = CountingFtp(files, mtimes={"/a/dirb/path/file3.txt": "20240601120100"})
        ftp._counter_path = counter
        return ftp

    source2 = FtpSource(host="fake", _client_factory=factory2)
    meta2 = source2.listing(spark, monitors)
    listing2 = source2.incremental_fetch(spark, meta2, state)
    records2, _ = snapshot(listing2, state, monitors, now="2024-06-01 12:01:00", drop_empty=True)
    got = {(r.key_name, bytes(r.value)) for r in records2.collect()}
    assert got == {("/a/dirb/path/file3.txt", b"three-changed")}
    fetched_tick1 = set(open(counter).read().split())
    assert fetched_tick1 == {"/a/dirb/path/file3.txt"}
