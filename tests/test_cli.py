"""End-to-end tests for the ``python -m kafka_connect_ftp_spark`` CLI:
an unmodified connector .properties file drives the poll loop over a
local tree (EndToEnd.scala's happy-flow shape, without the FTP server)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from kafka_connect_ftp_spark.__main__ import main, parse_properties


def _write_props(tmp_path, extra: str = "") -> str:
    props = tmp_path / "connect.properties"
    props.write_text(
        "# connector-style config\n"
        "ftp.refresh=PT0S\n"
        "ftp.keystyle=struct\n"
        "ftp.monitor.tail=/tails/:tail-topic\n"
        "ftp.monitor.update=/updates/:update-topic\n" + extra
    )
    return str(props)


def test_parse_properties_formats(tmp_path):
    f = tmp_path / "x.properties"
    f.write_text(
        "# comment\n"
        "! also comment\n"
        "a=1\n"
        "b: two\n"
        "c three\n"
        "d=with=equals\n"
        "long=start\\\n  end\n"
        "\n"
        "bare\n"
    )
    assert parse_properties(str(f)) == {
        "a": "1",
        "b": "two",
        "c": "three",
        "d": "with=equals",
        "long": "startend",
        "bare": "",
    }


def test_parse_properties_padded_separators_and_escapes(tmp_path):
    # the most common real-world form is 'key = value'; the separator must
    # never leak into the value. Escapes follow java.util.Properties.
    f = tmp_path / "y.properties"
    f.write_text(
        "ftp.address = ftp.example.com\n"
        "ftp.user\t:\tbob\n"
        "spaced   key=v\n"
        "esc\\=key=colon\\:val\n"
        "tab=a\\tb\n"
    )
    assert parse_properties(str(f)) == {
        "ftp.address": "ftp.example.com",
        "ftp.user": "bob",
        "spaced": "key=v",
        "esc=key": "colon:val",
        "tab": "a\tb",
    }


def test_cli_two_polls_emit_update_and_tail_delta(spark, tmp_path):
    root = tmp_path / "tree"
    (root / "tails").mkdir(parents=True)
    (root / "updates").mkdir(parents=True)
    (root / "tails" / "app.log").write_bytes(b"line1\n")
    (root / "updates" / "conf.ini").write_bytes(b"max=10")
    props = _write_props(tmp_path)
    sink_dir = str(tmp_path / "records")
    state_dir = str(tmp_path / "state")

    args = [
        "--properties", props,
        "--local-root", str(root),
        "--state-dir", state_dir,
        "--sink-dir", sink_dir,
        "--max-polls", "1",
    ]
    assert main(args) == 0

    first = spark.read.parquet(sink_dir)
    by_topic = {r.topic: bytes(r.value) for r in first.collect()}
    assert by_topic == {"tail-topic": b"line1\n", "update-topic": b"max=10"}
    assert {r.epoch for r in first.collect()} == {0}

    # mutate: append to the tail file, rewrite the update file
    (root / "tails" / "app.log").write_bytes(b"line1\nline2\n")
    (root / "updates" / "conf.ini").write_bytes(b"max=99")
    assert main(args) == 0

    both = spark.read.parquet(sink_dir)
    assert both.count() == 4  # 2 records per run
    tick2 = {
        (r.topic, bytes(r.value), r.key_offset)
        for r in both.collect()
        if bytes(r.value) not in (b"line1\n", b"max=10")
    }
    # tail mode emits only the appended suffix at offset=old size;
    # update mode re-emits the whole body at offset 0
    assert tick2 == {("tail-topic", b"line2\n", 6), ("update-topic", b"max=99", 0)}


def test_cli_applies_configured_sourcerecordconverter(spark, tmp_path):
    """ftp.sourcerecordconverter parity: the configured 1→N converter runs
    on each tick's records before delivery (FtpSourceTask.scala:83-87)."""
    root = tmp_path / "tree"
    (root / "updates").mkdir(parents=True)
    (root / "updates" / "data.csv").write_bytes(b"a,1\nb,2\n")
    props = _write_props(tmp_path, "ftp.sourcerecordconverter=csv_lines\n")
    sink_dir = str(tmp_path / "records")

    args = [
        "--properties", props,
        "--local-root", str(root),
        "--state-dir", str(tmp_path / "state"),
        "--sink-dir", sink_dir,
        "--max-polls", "1",
    ]
    assert main(args) == 0
    rows = {
        (r.line_no, bytes(r.value))
        for r in spark.read.parquet(sink_dir).filter("topic = 'update-topic'").collect()
    }
    assert rows == {(0, b"a,1"), (1, b"b,2")}

    # an unknown converter name fails at startup, not on the first poll
    bad = _write_props(tmp_path, "ftp.sourcerecordconverter=nope\n")
    import pytest

    with pytest.raises(KeyError, match="nope"):
        main(["--properties", bad, "--local-root", str(root),
              "--state-dir", str(tmp_path / "state2"), "--max-polls", "1"])

    # key-style converters drop key_name/key_offset and would break every
    # tick — rejected at startup too
    keystyle = _write_props(tmp_path, "ftp.sourcerecordconverter=string_key\n")
    with pytest.raises(KeyError, match="key-style"):
        main(["--properties", keystyle, "--local-root", str(root),
              "--state-dir", str(tmp_path / "state3"), "--max-polls", "1"])


def test_cli_list_only_prints_listing(spark, tmp_path, capsys):
    root = tmp_path / "tree"
    (root / "tails").mkdir(parents=True)
    (root / "updates").mkdir(parents=True)
    (root / "tails" / "a.log").write_bytes(b"x")
    props = _write_props(tmp_path)

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(
            ["--properties", props, "--local-root", str(root),
             "--state-dir", str(tmp_path / "s"), "--list-only"]
        )
    assert rc == 0
    out = buf.getvalue()
    assert "a.log" in out and "         1" in out


def test_cli_print_sink_and_missing_monitors(spark, tmp_path, capsys):
    # no monitors configured -> exit 2
    empty = tmp_path / "empty.properties"
    empty.write_text("ftp.refresh=PT0S\n")
    assert main(["--properties", str(empty), "--local-root", str(tmp_path)]) == 2

    # print sink path: one poll over a real tree prints a per-tick summary
    root = tmp_path / "tree"
    (root / "updates").mkdir(parents=True)
    (root / "updates" / "c.ini").write_bytes(b"v=1")
    props = _write_props(tmp_path)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(
            ["--properties", props, "--local-root", str(root),
             "--state-dir", str(tmp_path / "s2"), "--max-polls", "1"]
        )
    assert rc == 0
    out = buf.getvalue()
    assert "tick 0: 1 record(s)" in out
    assert "topic=update-topic" in out and "v=1" in out


def test_cli_applies_configured_fileconverter(spark, tmp_path):
    """ftp.fileconverter parity (FtpSourceConfig.scala:45,
    FileConverter.scala): the configured FILE converter runs on each
    tick's file bodies BEFORE the record converter — a gzipped CSV drop
    decodes (gunzip) then splits into lines (csv_lines)."""
    import gzip

    import pytest

    root = tmp_path / "tree"
    (root / "updates").mkdir(parents=True)
    (root / "updates" / "data.csv.gz").write_bytes(gzip.compress(b"a,1\nb,2\n"))
    props = _write_props(
        tmp_path,
        "ftp.fileconverter=gunzip\nftp.sourcerecordconverter=csv_lines\n",
    )
    sink_dir = str(tmp_path / "records")
    args = [
        "--properties", props,
        "--local-root", str(root),
        "--state-dir", str(tmp_path / "state"),
        "--sink-dir", sink_dir,
        "--max-polls", "1",
    ]
    assert main(args) == 0
    rows = {
        (r.line_no, bytes(r.value))
        for r in spark.read.parquet(sink_dir).filter("topic = 'update-topic'").collect()
    }
    assert rows == {(0, b"a,1"), (1, b"b,2")}

    # unknown / key-style names fail at startup, like the record knob
    for extra, match in (
        ("ftp.fileconverter=nope\n", "nope"),
        ("ftp.fileconverter=struct_key\n", "key-style"),
    ):
        bad = _write_props(tmp_path, extra)
        with pytest.raises(KeyError, match=match):
            main(["--properties", bad, "--local-root", str(root),
                  "--state-dir", str(tmp_path / "state_bad"), "--max-polls", "1"])
