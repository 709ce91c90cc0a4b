"""Targeted deletion over a partitioned store: rows gone, untouched
partitions byte-identical (file-level), fully-emptied partitions
dropped, no-op when keys are absent."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from bigdata_commerce_spark.sources.governance import delete_keys_partitioned


def _write_store(spark, path):
    rows = [
        # (user, date-partition)
        (u, d, float(u * 100 + i))
        for i, (u, d) in enumerate(
            [(1, "2024-01-01"), (2, "2024-01-01"), (3, "2024-01-02"),
             (1, "2024-01-02"), (4, "2024-01-03"), (4, "2024-01-03"),
             (5, "2024-01-04")]
        )
    ]
    df = spark.createDataFrame(rows, "user_id long, dt string, v double")
    df.write.partitionBy("dt").parquet(path)
    return rows


def _files_with_mtime(path):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/dt=*/part-*.parquet")
    }


def test_delete_rewrites_only_affected_partitions(spark, tmp_path):
    path = str(tmp_path / "store")
    rows = _write_store(spark, path)
    before = _files_with_mtime(path)

    audit = delete_keys_partitioned(spark, path, "user_id", [1], "dt")
    assert audit == {"partitions_rewritten": 2, "partitions_dropped": 0, "rows_deleted": 2}

    # partition values are read back type-inferred (string -> date)
    got = {(r.user_id, str(r.dt)) for r in spark.read.parquet(path).collect()}
    assert got == {(u, d) for u, d, _ in rows if u != 1}

    after = _files_with_mtime(path)
    # untouched partitions keep their original files byte-for-byte
    for f, mtime in before.items():
        if "/dt=2024-01-03/" in f or "/dt=2024-01-04/" in f:
            assert after.get(f) == mtime, f"untouched partition rewritten: {f}"
    # affected partitions were rewritten (old files replaced)
    assert not any(f in after and after[f] == before[f]
                   for f in before if "/dt=2024-01-01/" in f)


def test_delete_drops_fully_emptied_partition(spark, tmp_path):
    path = str(tmp_path / "store")
    _write_store(spark, path)
    # user 5 is the ONLY row of dt=2024-01-04: the partition dir must go
    audit = delete_keys_partitioned(spark, path, "user_id", [5], "dt")
    assert audit["rows_deleted"] == 1
    # dropped whole, not rewritten — the audit counts them apart
    assert audit["partitions_dropped"] == 1 and audit["partitions_rewritten"] == 0
    assert not glob.glob(f"{path}/dt=2024-01-04")
    assert spark.read.parquet(path).where(F.col("user_id") == 5).count() == 0


def test_delete_drops_emptied_partition_with_special_chars(spark, tmp_path):
    # Partition values containing space/colon are percent-encoded in
    # the directory name (dt=2024-01-04 00%3A00%3A00); the stale-dir
    # cleanup must escape the value the same way or the fully-deleted
    # partition's files silently survive.
    path = str(tmp_path / "store")
    rows = [
        (1, "2024-01-03 12:00:00", 1.0),
        (5, "2024-01-04 00:00:00", 2.0),  # sole row of its partition
    ]
    spark.createDataFrame(rows, "user_id long, dt string, v double").write.partitionBy(
        "dt"
    ).parquet(path)
    audit = delete_keys_partitioned(spark, path, "user_id", [5], "dt")
    assert audit["rows_deleted"] == 1
    # no directory (escaped or not) for the emptied partition survives
    assert not glob.glob(f"{path}/dt=2024-01-04*")
    left = spark.read.parquet(path)
    assert left.where(F.col("user_id") == 5).count() == 0
    assert {str(r.dt) for r in left.select("dt").collect()} == {"2024-01-03 12:00:00"}


def test_delete_missing_keys_is_noop(spark, tmp_path):
    path = str(tmp_path / "store")
    _write_store(spark, path)
    before = _files_with_mtime(path)
    audit = delete_keys_partitioned(spark, path, "user_id", [999], "dt")
    assert audit == {"partitions_rewritten": 0, "partitions_dropped": 0, "rows_deleted": 0}
    assert _files_with_mtime(path) == before
