"""Glob matching parity with the reference's listing traversal
(FtpFileListerTest.scala:30-79): pattern /a/dir?/path/*.txt must match
file1/file3 only and must not look into /a/dirb/nopath/."""

import re

from kafka_connect_ftp_spark.ingest.model import MonitoredPath, glob_to_regex

TREE = [
    "/a/dira/path/file1.txt",
    "/a/dirb/nopath/file2.txt",
    "/a/dirb/path/file3.txt",
    "/a/dirb/path/file4.csv",
]


def matches(pattern, paths):
    rx = re.compile(glob_to_regex(pattern))
    return [p for p in paths if rx.match(p)]


def test_multi_level_glob():
    assert matches("/a/dir?/path/*.txt", TREE) == [
        "/a/dira/path/file1.txt",
        "/a/dirb/path/file3.txt",
    ]


def test_star_does_not_cross_segments():
    assert matches("/a/*.txt", TREE) == []
    assert matches("/tails/*", ["/tails/x", "/tails/sub/y"]) == ["/tails/x"]


def test_double_star_crosses_segments():
    assert matches("/a/**", TREE) == TREE
    assert matches("/a/**/*.txt", TREE) == [
        "/a/dira/path/file1.txt",
        "/a/dirb/nopath/file2.txt",
        "/a/dirb/path/file3.txt",
    ]
    assert matches("/a/**.csv", TREE) == ["/a/dirb/path/file4.csv"]


def test_fixed_path():
    assert matches("/a/dirb/path/file3.txt", TREE) == ["/a/dirb/path/file3.txt"]


def test_char_class_and_braces():
    assert matches("/a/dir[ab]/path/file[13].txt", TREE) == [
        "/a/dira/path/file1.txt",
        "/a/dirb/path/file3.txt",
    ]
    assert matches("/a/{dira,dirb}/path/*.{txt,csv}", TREE) == [
        "/a/dira/path/file1.txt",
        "/a/dirb/path/file3.txt",
        "/a/dirb/path/file4.csv",
    ]


def test_braces_allow_nested_glob_constructs():
    # java.nio groups may contain wildcards: {*.txt,*.csv} is the common
    # multi-extension monitor; literal escaping would match nothing
    assert matches("/a/*/path/{*.txt,*.csv}", TREE) == [
        "/a/dira/path/file1.txt",
        "/a/dirb/path/file3.txt",
        "/a/dirb/path/file4.csv",
    ]


def test_unterminated_class_or_group_rejected():
    import pytest

    from kafka_connect_ftp_spark.ingest.model import glob_to_regex

    with pytest.raises(ValueError, match="unterminated '\\['"):
        glob_to_regex("/a/[bc")
    with pytest.raises(ValueError, match="unterminated '\\{'"):
        glob_to_regex("/a/{x,y")


def test_dir_monitor_pattern_appends_star():
    m = MonitoredPath("/tails/", topic="tails", tail=True)
    assert m.pattern == "/tails/*"
    rx = re.compile(m.regex)
    assert rx.match("/tails/t0")
    assert not rx.match("/tails/sub/t0")
