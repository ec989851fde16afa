"""Filesystem helpers for raw-parquet streaming state stores.

Versioned/partitioned state directories (``v_<batch_id>``,
``b_<batch_id>``) must be listable and prunable wherever the state
lives — a local path under test, an HDFS/S3 URI on a cluster. Routing
listing and deletion through the Hadoop ``FileSystem`` API (the same
abstraction every Spark read/write already uses) makes the upsert and
ingest-dedup state stores URI-agnostic, instead of silently assuming
``os.listdir`` semantics that only hold on a local disk.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def list_subdirs(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """``(name, full_uri)`` for each direct subdirectory of ``path``;
    empty if the path does not exist. Works on any Hadoop-supported
    filesystem (file://, hdfs://, s3a://, ...)."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    out = []
    for status in fs.listStatus(jpath):
        if status.isDirectory():
            p = status.getPath()
            out.append((p.getName(), p.toString()))
    return sorted(out)


def delete_dir(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` if it exists (no-op otherwise)."""
    fs, jpath = _fs_and_path(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)
