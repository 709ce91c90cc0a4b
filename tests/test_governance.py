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


def test_crypto_shredding_roundtrip_and_forget(spark):
    """Encrypt with per-user secrets; decrypt restores plaintext for
    live keys; deleting a key row makes that user's columns NULL on
    read (shredded) while others read normally; ciphertext is
    deterministic (idempotent reruns); unkeyed rows encrypt to NULL."""
    from bigdata_commerce_spark.sources.governance import (
        shred_decrypt,
        shred_encrypt,
    )

    keys = spark.createDataFrame(
        [(1, "0123456789abcdef"), (2, "fedcba9876543210")],
        "user_id long, secret string",
    )
    df = spark.createDataFrame(
        [
            (1, "alice@example.com", 10.0),
            (2, "bob@example.com", 20.0),
            (3, "carol@example.com", 30.0),  # no key issued
        ],
        "user_id long, email string, amount double",
    )
    enc = shred_encrypt(df, keys, ["email"])
    rows = {r.user_id: r for r in enc.collect()}
    assert rows[1].email not in (None, "alice@example.com")
    assert rows[3].email is None              # unkeyed -> surfaced as NULL
    assert rows[1].amount == 10.0             # untouched column

    # deterministic: re-encrypt produces identical ciphertext
    enc2 = {r.user_id: r.email for r in shred_encrypt(df, keys, ["email"]).collect()}
    assert enc2[1] == rows[1].email and enc2[2] == rows[2].email

    # full key table: both users decrypt
    dec = {r.user_id: r.email for r in shred_decrypt(enc, keys, ["email"]).collect()}
    assert dec[1] == "alice@example.com" and dec[2] == "bob@example.com"

    # FORGET user 1: drop the key row; their email is unrecoverable
    remaining = keys.where("user_id != 1")
    dec2 = {r.user_id: r.email for r in
            shred_decrypt(enc, remaining, ["email"]).collect()}
    assert dec2[1] is None
    assert dec2[2] == "bob@example.com"
