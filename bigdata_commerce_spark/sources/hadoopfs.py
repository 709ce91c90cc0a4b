"""Shared Hadoop FileSystem handle for driver-side metadata ops
(existence checks, manifest renames, directory listings) — the one
place the py4j Path/getFileSystem incantation lives."""

from __future__ import annotations

from pyspark.sql import SparkSession


def fs_and_path(spark: SparkSession, path: str):
    """(FileSystem, Path, Path-class) for ``path`` under the session's
    Hadoop configuration — resolves the scheme (file://, hdfs://,
    s3a://) the same way Spark's own writers do."""
    jvm = spark.sparkContext._jvm
    PathCls = jvm.org.apache.hadoop.fs.Path
    hpath = PathCls(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath, PathCls
