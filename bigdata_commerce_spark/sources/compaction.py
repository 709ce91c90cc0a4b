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
    any Hadoop-visible FS: local, HDFS, object stores). Uses the
    classic-mode py4j gateway (``spark._jvm``) — unavailable under
    Spark Connect, same documented constraint as the JDBC state
    backend."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def _qualified(spark: SparkSession, path: str) -> str:
    """Fully-qualified URI for ``path`` (scheme + authority + absolute
    path) so overlap checks see through relative paths, ``.``/``..``
    segments, and default-FS shorthand."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return str(fs.makeQualified(hpath).toUri())


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> DataFrame:
    """Rewrite ``in_path`` into ``out_path`` as ~``target_file_bytes``
    files. Returns the compacted DataFrame (reading ``out_path``).

    ``out_path`` must be disjoint from ``in_path``: mode("overwrite")
    deletes the target before the read of a lazily-scanned source
    completes, so in-place compaction would truncate the very data
    being compacted (Spark's own read-path check catches the direct
    case, but aliased/nested paths can slip past it). Compact to a
    sibling directory, then swap with a filesystem rename once the job
    succeeds.

    ``fmt`` applies to BOTH read and write (like-to-like). The
    listing-bytes sizing heuristic assumes input and output densities
    match, which holds for same-format, same-codec rewrites; a
    cross-format rewrite would need a sampled density estimate
    instead, so it's deliberately not offered here.

    128 MB default matches the classic HDFS-block / scan-split sweet
    spot: files big enough that open/footer costs amortize, small
    enough that one file is one task.
    """
    q_in = _qualified(spark, in_path).rstrip("/")
    q_out = _qualified(spark, out_path).rstrip("/")
    if q_out == q_in or q_out.startswith(q_in + "/") or q_in.startswith(q_out + "/"):
        raise ValueError(
            f"compact() out_path {q_out!r} overlaps in_path {q_in!r}: "
            "overwrite would truncate the source mid-read. Write to a "
            "disjoint path and rename after success."
        )
    total = directory_bytes(spark, in_path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.format(fmt).load(in_path)
    df.repartition(n_files).write.mode("overwrite").format(fmt).save(out_path)
    return spark.read.format(fmt).load(out_path)
