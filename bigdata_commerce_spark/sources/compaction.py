"""Small-file compaction — the janitor every 100 TB ingest needs.

Streaming sinks, per-shard uploads, and highly-partitioned writers all
leave directories of KB-scale files; at scale that turns one logical
scan into millions of filesystem opens and starves the scheduler with
tiny tasks. Compaction rewrites a directory into files near a target
size in ONE distributed pass:

- input size comes from the *file listing* (driver metadata call —
  no data read, no extra Spark job);
- the rewrite is a single ``repartition(ceil(bytes / target))`` +
  write — one full shuffle, which is the floor for re-binning rows
  into size-balanced files;
- parquet-to-parquet preserves on-disk density, so the listing size
  is an honest predictor of output size.

For continuously-landing data, run this per closed partition (e.g.
yesterday's ``dt=``) rather than over the whole table — the helper
takes any path, including a single partition directory.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def directory_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` from the filesystem listing (works on
    any Hadoop-visible FS: local, HDFS, object stores)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> DataFrame:
    """Rewrite ``in_path`` (parquet) into ``out_path`` as ~``target_file_bytes``
    files. Returns the compacted DataFrame (reading ``out_path``).

    128 MB default matches the classic HDFS-block / scan-split sweet
    spot: files big enough that open/footer costs amortize, small
    enough that one file is one task.
    """
    total = directory_bytes(spark, in_path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(in_path)
    df.repartition(n_files).write.mode("overwrite").format(fmt).save(out_path)
    return spark.read.format(fmt).load(out_path)
