"""Golden-behavior tests for the snapshot plan, porting the reference's
EndToEnd change-set design (EndToEnd.scala:101-231 via FIXTURES.md):
scripted Append/Update ops on 4 files across /tails/ and /updates/, with a
Python oracle computing expected (topic, key_name, key_offset, value)
per tick from the behavioral contract (FtpMonitor.scala:70-105)."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest

from kafka_connect_ftp_spark.ingest.model import LISTING_SCHEMA, MonitoredPath
from kafka_connect_ftp_spark.ingest.snapshot import empty_state, snapshot

# payload classes from EndToEnd.scala:102-106
S_EMPTY = b""
S0 = bytes(range(256))
S1 = "The quick brown fox jumps over the lazy dog\r\n\té".encode()
S2 = "Lorem ipsum dolor sit amet,\nconsectetur adipiscing elit\te\0nd".encode()
S3 = b"\x2a"

MONITORS = [
    MonitoredPath("/tails/", topic="tails", tail=True),
    MonitoredPath("/updates/", topic="updates", tail=False),
]

# change-set script (EndToEnd.scala:113-135): (op, path, payload)
CHANGE_SETS = [
    [("append", "/tails/t0", S0), ("append", "/tails/t1", S_EMPTY),
     ("update", "/updates/u0", S1), ("update", "/updates/u1", S_EMPTY)],
    [("append", "/tails/t0", S1), ("append", "/tails/t1", S3),
     ("update", "/updates/u0", S_EMPTY), ("update", "/updates/u1", S2)],
    [("append", "/tails/t0", S3), ("update", "/updates/u1", S1)],
    [("append", "/tails/t1", S1), ("update", "/updates/u0", S2)],
    [("append", "/tails/t0", S0), ("append", "/tails/t1", S2),
     ("update", "/updates/u0", S3), ("update", "/updates/u1", S2)],
]

BASE = dt.datetime(2024, 6, 1, 12, 0, 0)


def apply_ops(files: dict[str, bytes], ops) -> dict[str, bytes]:
    out = dict(files)
    for op, path, payload in ops:
        if op == "append":
            out[path] = out.get(path, b"") + payload
        else:
            out[path] = payload
    return out


def expected_records(prev: dict[str, bytes], cur: dict[str, bytes]):
    """The FileDiff oracle (EndToEnd.scala:61-98): expected non-empty
    records for one tick, given file contents before/after."""
    exp = []
    for path in sorted(cur):
        topic = "tails" if path.startswith("/tails/") else "updates"
        tail = topic == "tails"
        body, old = cur[path], prev.get(path)
        if old is None:
            rec = (topic, path, 0, body)  # new file → whole body @0
        elif body == old:
            continue  # unchanged → empty record, suppressed
        elif tail:
            if len(body) > len(old) and body[: len(old)] == old:
                rec = (topic, path, len(old), body[len(old):])  # suffix
            elif len(body) > len(old):
                rec = (topic, path, 0, body)  # mutated prefix → whole
            else:
                continue  # shrunk/equal → empty record, suppressed
        else:
            rec = (topic, path, 0, body)  # update mode → whole body @0
        if rec[3]:
            exp.append(rec)
    return exp


def listing_df(spark, files: dict[str, bytes], tick: int, mtimes: dict[str, int]):
    rows = [
        (path, len(body), BASE + dt.timedelta(seconds=mtimes[path]), bytes(body))
        for path, body in sorted(files.items())
    ]
    return spark.createDataFrame(rows, LISTING_SCHEMA)


def run_change_sets(spark, change_sets, monitors=MONITORS):
    """Drive ticks through snapshot(), collecting per-tick records."""
    files: dict[str, bytes] = {}
    mtimes: dict[str, int] = {}
    state = empty_state(spark)
    out = []
    for tick, ops in enumerate(change_sets):
        new_files = apply_ops(files, ops)
        for _, path, _ in ops:
            mtimes[path] = tick  # each op bumps the file's mtime
        records, state = snapshot(
            listing_df(spark, new_files, tick, mtimes),
            state,
            monitors,
            now=(BASE + dt.timedelta(seconds=tick)).isoformat(sep=" "),
            drop_empty=True,
        )
        got = sorted(
            (r.topic, r.key_name, r.key_offset, bytes(r.value))
            for r in records.collect()
        )
        out.append((got, expected_records(files, new_files)))
        state = spark.createDataFrame(state.collect(), state.schema)  # pin
        files = new_files
    return out


def test_endtoend_happy_flow(spark):
    for tick, (got, exp) in enumerate(run_change_sets(spark, CHANGE_SETS)):
        assert got == sorted(exp), f"tick {tick}: {got} != {sorted(exp)}"


def test_tail_prefix_mutation_falls_back_to_whole_body(spark):
    # grow the file but corrupt its first byte: prefix hash mismatch →
    # whole body at offset 0 (FtpMonitor.scala:82-85)
    sets = [
        [("append", "/tails/t0", S1)],
        [("update", "/tails/t0", b"X" + S1[1:] + S3)],
    ]
    (_, _), (got, _) = run_change_sets(spark, sets)
    assert got == [("tails", "/tails/t0", 0, b"X" + S1[1:] + S3)]


def test_tail_shrink_emits_nothing_then_regrows(spark):
    sets = [
        [("append", "/tails/t0", S1 + S2)],
        [("update", "/tails/t0", S1)],          # shrink → suppressed
        [("append", "/tails/t0", S3)],          # regrow from shrunk base
    ]
    results = run_change_sets(spark, sets)
    assert results[1][0] == []
    # after the shrink the state hash tracks the shrunk content, so the
    # regrowth is a clean suffix at offset len(S1)
    assert results[2][0] == [("tails", "/tails/t0", len(S1), S3)]


def test_unchanged_file_not_refetched(spark):
    # no mtime bump, no size change → requiresFetch=false → no record
    files = {"/tails/t0": S1}
    mtimes = {"/tails/t0": 0}
    state = empty_state(spark)
    l0 = listing_df(spark, files, 0, mtimes)
    r0, state = snapshot(l0, state, MONITORS, now="2024-06-01 12:00:00")
    assert r0.count() == 1
    state = spark.createDataFrame(state.collect(), state.schema)
    r1, state1 = snapshot(l0, state, MONITORS, now="2024-06-01 12:00:05")
    assert r1.count() == 0
    # ...and last_inspected must NOT move (file wasn't fetched)
    s = {r.path: r for r in state1.collect()}
    assert s["/tails/t0"].last_inspected == dt.datetime(2024, 6, 1, 12, 0, 0)


def test_refetched_unchanged_emits_empty_record(spark):
    # same bytes, bumped mtime → refetch → EmptyFileBody record retained
    # when drop_empty=False (FtpMonitor.scala:96-99)
    files = {"/updates/u0": S1}
    state = empty_state(spark)
    r0, state = snapshot(
        listing_df(spark, files, 0, {"/updates/u0": 0}), state, MONITORS,
        now="2024-06-01 12:00:00",
    )
    state = spark.createDataFrame(state.collect(), state.schema)
    r1, state1 = snapshot(
        listing_df(spark, files, 1, {"/updates/u0": 1}), state, MONITORS,
        now="2024-06-01 12:00:01",
    )
    rows = r1.collect()
    assert len(rows) == 1 and bytes(rows[0].value) == b""
    # unchanged → last_modified preserved, last_inspected bumped
    s = {r.path: r for r in state1.collect()}
    assert s["/updates/u0"].last_modified == dt.datetime(2024, 6, 1, 12, 0, 0)
    assert s["/updates/u0"].last_inspected == dt.datetime(2024, 6, 1, 12, 0, 1)


def test_max_age_filter_excludes_old_files(spark):
    files = {"/tails/old": S1, "/tails/new": S2}
    listing = listing_df(spark, files, 0, {"/tails/old": 0, "/tails/new": 3600})
    records, _ = snapshot(
        listing, empty_state(spark), MONITORS,
        max_age_seconds=60, now="2024-06-01 13:00:00",
    )
    assert [r.key_name for r in records.collect()] == ["/tails/new"]


def test_state_offset_field_is_minus_one(spark):
    # reference parity: FileMetaData.offset defaults to -1 and is never
    # overwritten (ConnectFileMetaDataStore.scala:56)
    files = {"/tails/t0": S0}
    _, state = snapshot(
        listing_df(spark, files, 0, {"/tails/t0": 0}), empty_state(spark),
        MONITORS, now="2024-06-01 12:00:00",
    )
    assert [r.offset for r in state.collect()] == [-1]


def test_state_hash_matches_sha256(spark):
    files = {"/updates/u0": S2}
    _, state = snapshot(
        listing_df(spark, files, 0, {"/updates/u0": 0}), empty_state(spark),
        MONITORS, now="2024-06-01 12:00:00",
    )
    assert state.collect()[0].hash == hashlib.sha256(S2).hexdigest()


def test_unlisted_paths_keep_state(spark):
    files = {"/tails/t0": S1, "/tails/t1": S2}
    _, state = snapshot(
        listing_df(spark, files, 0, {"/tails/t0": 0, "/tails/t1": 0}),
        empty_state(spark), MONITORS, now="2024-06-01 12:00:00",
    )
    state = spark.createDataFrame(state.collect(), state.schema)
    # t1 vanishes from the listing; its state row must survive
    _, state1 = snapshot(
        listing_df(spark, {"/tails/t0": S1}, 1, {"/tails/t0": 0}),
        state, MONITORS, now="2024-06-01 12:00:01",
    )
    assert sorted(r.path for r in state1.collect()) == ["/tails/t0", "/tails/t1"]


def test_requires_at_least_one_monitor(spark):
    with pytest.raises(ValueError):
        snapshot(
            listing_df(spark, {}, 0, {}), empty_state(spark), [],
            now="2024-06-01 12:00:00",
        )


def test_max_files_rate_limit_carries_over(spark):
    # L1 parity (FtpSourceTask.scala:47-52): at most N files per tick, the
    # rest keep their old state and surface on the next tick
    files = {"/updates/a": S1, "/updates/b": S2, "/updates/c": S3}
    mt = {p: 0 for p in files}
    state = empty_state(spark)
    r0, state = snapshot(
        listing_df(spark, files, 0, mt), state, MONITORS,
        now="2024-06-01 12:00:00", max_files=2,
    )
    assert [r.key_name for r in r0.orderBy("key_name").collect()] == ["/updates/a", "/updates/b"]
    state = spark.createDataFrame(state.collect(), state.schema)
    r1, state = snapshot(
        listing_df(spark, files, 1, mt), state, MONITORS,
        now="2024-06-01 12:00:01", max_files=2,
    )
    assert [r.key_name for r in r1.collect()] == ["/updates/c"]
    state = spark.createDataFrame(state.collect(), state.schema)
    r2, _ = snapshot(
        listing_df(spark, files, 2, mt), state, MONITORS,
        now="2024-06-01 12:00:02", max_files=2,
    )
    assert r2.count() == 0


def test_max_files_never_splits_a_multi_monitor_path(spark):
    # the cap limits PATHS: a file matched by two monitors must emit to
    # BOTH topics or neither — a row-level cut between the duplicates
    # would commit the new hash while one topic never sees the change
    monitors = [
        MonitoredPath("/data/", topic="all_files", tail=False),
        MonitoredPath("/data/*.csv", topic="csv_only", tail=False),
    ]
    files = {"/data/a.csv": S1, "/data/b.txt": S2}
    records, _ = snapshot(
        listing_df(spark, files, 0, {p: 0 for p in files}),
        empty_state(spark), monitors, now="2024-06-01 12:00:00", max_files=1,
    )
    got = sorted((r.topic, r.key_name) for r in records.collect())
    # a.csv sorts first and both its monitor rows survive the cap
    assert got == [("all_files", "/data/a.csv"), ("csv_only", "/data/a.csv")]


def test_overlapping_monitors_emit_per_monitor_records(spark):
    # a file matched by two monitors produces one record per monitor with
    # its own topic/mode (the reference processes each MonitoredPath
    # independently, FtpMonitor.scala:166-167)
    monitors = [
        MonitoredPath("/data/", topic="all_files", tail=False),
        MonitoredPath("/data/*.csv", topic="csv_only", tail=False),
    ]
    files = {"/data/a.csv": S1, "/data/b.txt": S2}
    records, state = snapshot(
        listing_df(spark, files, 0, {p: 0 for p in files}),
        empty_state(spark), monitors, now="2024-06-01 12:00:00",
    )
    got = sorted((r.topic, r.key_name) for r in records.collect())
    assert got == [
        ("all_files", "/data/a.csv"),
        ("all_files", "/data/b.txt"),
        ("csv_only", "/data/a.csv"),
    ]
    # state holds ONE row per path regardless of monitor fan-out
    assert sorted(r.path for r in state.collect()) == ["/data/a.csv", "/data/b.txt"]
