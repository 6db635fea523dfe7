"""Shared Hadoop-FileSystem access (py4j): ONE place that resolves a
path's filesystem from the session's Hadoop configuration, so every
caller (state markers, data cards, compaction planning) sees the same
FS view for any scheme — local, HDFS, or an object store."""

from __future__ import annotations


def hadoop_fs(spark, path: str):
    """``(jvm, fs, hpath)`` for ``path`` under the session's Hadoop conf."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs, hpath


def committed_versions(spark, state_dir: str) -> list[int]:
    """All ``v%06d`` dirs under ``state_dir`` whose write committed
    (``_SUCCESS`` present), ascending. The committer writes ``_SUCCESS``
    only after every part file is in place, so "max committed version"
    is a crash-atomic CURRENT pointer with no separate marker file — a
    crash mid-write leaves a ``_SUCCESS``-less orphan that the retry
    overwrites (see streaming/stats_stream.py for the full rationale)."""
    import re

    jvm, fs, hpath = hadoop_fs(spark, state_dir)
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        # \d{6,}, not \d{6}: the %06d writer format WIDENS past v999999,
        # and a fixed-width match would silently freeze version discovery
        # (and pruning) at one million commits
        m = re.fullmatch(r"v(\d{6,})", st.getPath().getName())
        if (
            m
            and st.isDirectory()
            and fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS"))
        ):
            out.append(int(m.group(1)))
    return sorted(out)


def prune_versions(spark, state_dir: str, *, current: int, keep: int) -> None:
    """Delete committed versions at or below ``current - keep``.
    ``keep`` is clamped >= 2 HERE (not just by callers): a reader
    mid-scan of the just-superseded version must never have files
    deleted under it."""
    keep = max(2, keep)
    jvm, fs, _ = hadoop_fs(spark, state_dir)
    for v in committed_versions(spark, state_dir):
        if v <= current - keep:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/v{v:06d}"), True)


def data_file_sizes(spark, path: str) -> list[int]:
    """Byte sizes of the DATA files under ``path`` — exactly the files
    ``spark.read`` would read: any path component (directory or leaf)
    starting with ``_`` or ``.`` is hidden per Hadoop's convention, so
    ``_temporary/`` attempt dirs, ``.staging``, ``_SUCCESS`` and
    ``_metadata`` are all excluded, not just hidden leaf names.
    Metadata-only: never opens a file."""
    jvm, fs, hpath = hadoop_fs(spark, path)
    base = hpath.toUri().getPath().rstrip("/")
    sizes = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        rel = st.getPath().toUri().getPath()[len(base) :].lstrip("/")
        if not any(part[:1] in ("_", ".") for part in rel.split("/")):
            sizes.append(st.getLen())
    return sizes
