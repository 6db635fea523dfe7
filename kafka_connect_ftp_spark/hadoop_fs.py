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
