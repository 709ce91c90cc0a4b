"""Targeted record deletion over partitioned stores (the
right-to-be-forgotten pass every long-lived data platform needs).

Naive delete rewrites the whole table. The scalable shape bounds the
rewrite to partitions that actually contain the targeted rows:

1. one scan finds the affected partition values (predicate pushdown
   applies if the store is bucketed/indexed by the key; worst case
   it's a full scan of the KEY COLUMN only — column pruning keeps it
   narrow);
2. only those partitions are re-read, anti-joined against the key
   set, and written back under dynamic partition overwrite
   (``spark.sql.sources.partitionOverwriteMode=dynamic``), which
   replaces exactly the partitions present in the written frame;
3. every untouched partition keeps its original files byte-for-byte
   (asserted at file level in tests) — at 100 TB a deletion affecting
   a handful of dates costs a handful of partition rewrites, not a
   table rewrite.

Deletion is by anti-join against a (small, broadcast) key frame, so
one pass serves any number of subjects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delete_keys_partitioned(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: Sequence,
    partition_col: str,
) -> dict:
    """Remove every row whose ``key_col`` is in ``keys`` from the
    parquet store at ``path`` (partitioned by ``partition_col``),
    rewriting ONLY the partitions that contain such rows. Returns
    audit counts: {"partitions_rewritten": n, "partitions_dropped": n,
    "rows_deleted": n} — rewritten and dropped are disjoint (a
    partition whose every row was deleted is dropped whole, not
    rewritten; a compliance log needs the two counted apart).
    """
    keys_df = F.broadcast(
        spark.createDataFrame([(k,) for k in keys], f"{key_col} {_key_type(spark, path, key_col)}")
    )
    table = spark.read.parquet(path)
    hits = (
        table.join(keys_df, key_col, "left_semi")
        .groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    affected = [r[partition_col] for r in hits]
    rows_deleted = sum(r.n for r in hits)
    if not affected:
        return {"partitions_rewritten": 0, "partitions_dropped": 0, "rows_deleted": 0}

    kept = (
        spark.read.parquet(path)
        .where(F.col(partition_col).isin(affected))
        .join(keys_df, key_col, "left_anti")
        # materialize BEFORE overwriting the files being read:
        # localCheckpoint cuts the plan's file-source lineage, so the
        # self-overwrite check passes and the data is safely off-disk
        .localCheckpoint(eager=True)
    )
    kept_parts = {r[partition_col] for r in kept.select(partition_col).distinct().collect()}

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        kept.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # dynamic overwrite replaces only partitions PRESENT in the
    # written frame — a partition whose every row was deleted isn't,
    # so its stale directory must be dropped explicitly. The dir name
    # uses Spark's partition-value escaping (percent-encoding of
    # ':', '/', '%', '#', control chars, ... — space stays literal),
    # so the value must be escaped the same way or the exists() check
    # silently misses the directory and the "deleted" rows stay
    # readable.
    jvm = spark._jvm
    dropped = set(affected) - kept_parts
    for p in dropped:
        hp = jvm.org.apache.hadoop.fs.Path(
            f"{path}/{partition_col}={_escape_partition_value(spark, p)}"
        )
        fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hp):
            fs.delete(hp, True)
    return {
        "partitions_rewritten": len(affected) - len(dropped),
        "partitions_dropped": len(dropped),
        "rows_deleted": rows_deleted,
    }


def _escape_partition_value(spark: SparkSession, value) -> str:
    """Escape a partition value exactly as Spark's writer does when it
    builds the ``col=value`` directory name. Delegates to the engine's
    own ExternalCatalogUtils.escapePathName (the writer's code path) so
    the two can never drift; falls back to the documented Hive
    percent-encoding if the catalyst class is unreachable."""
    s = str(value)
    try:
        return spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(s)
    except Exception:
        # Hive FileUtils.escapePathName charset: control chars plus
        # the special path/metastore characters below.
        needs_escape = set('"#%\'*/:=?\\\x7f{[]^')
        return "".join(
            f"%{ord(ch):02X}" if ch in needs_escape or ord(ch) < 32 else ch for ch in s
        )


def _key_type(spark: SparkSession, path: str, key_col: str) -> str:
    return dict(spark.read.parquet(path).dtypes)[key_col]


def shred_encrypt(
    df: DataFrame,
    key_table: DataFrame,
    cols: "Sequence[str]",
    key_col: str = "user_id",
    secret_col: str = "secret",
) -> DataFrame:
    """Crypto-shredding, encrypt side: the PII columns in ``cols``
    are AES-encrypted with the owning key's per-key secret from
    ``key_table`` (key_col, secret_col — 16/24/32-byte secrets).
    Deleting that key row later makes the ciphertext permanently
    unreadable — "forgetting" a user becomes a one-row delete in the
    key table instead of a rewrite of every partition that ever
    stored their rows (the complement of delete_keys_partitioned,
    which physically rewrites; shredding is the answer when the data
    sits in immutable/archived storage).

    GCM (the Spark default) is authenticated but salted per call —
    re-encrypting would produce different bytes. This uses ECB
    deliberately: DETERMINISTIC ciphertext, so encrypted columns stay
    join/dedup-stable and reruns are idempotent. The trade-off is
    textbook (equal plaintexts within one key collide); acceptable
    here because each key's corpus is small and the threat model is
    post-deletion recovery, not chosen-plaintext. Rows with no key in
    the table get NULL ciphertext (surfaced, not silently plaintext).

    Shape: one equi-join against the key table (broadcast when it
    fits) + a projection; scales with the fact side only.
    """
    joined = df.join(
        key_table.select(
            F.col(key_col), F.col(secret_col).alias("__secret")
        ),
        key_col,
        "left",
    )
    out_cols = []
    for c in df.columns:
        if c in cols:
            out_cols.append(
                F.base64(
                    F.aes_encrypt(
                        F.col(c).cast("string").cast("binary"),
                        F.col("__secret").cast("binary"),
                        F.lit("ECB"),
                    )
                ).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def shred_decrypt(
    df: DataFrame,
    key_table: DataFrame,
    cols: "Sequence[str]",
    key_col: str = "user_id",
    secret_col: str = "secret",
) -> DataFrame:
    """Crypto-shredding, read side: decrypt ``cols`` for rows whose
    key still exists in the key table; rows whose key was shredded
    (deleted) — or whose ciphertext fails authentication — come back
    with NULL in those columns via try_aes_decrypt, never an error:
    the forgotten stay forgotten while the rest of the table reads
    normally."""
    joined = df.join(
        key_table.select(
            F.col(key_col), F.col(secret_col).alias("__secret")
        ),
        key_col,
        "left",
    )
    out_cols = []
    for c in df.columns:
        if c in cols:
            out_cols.append(
                F.try_aes_decrypt(
                    F.unbase64(F.col(c)),
                    F.col("__secret").cast("binary"),
                    F.lit("ECB"),
                )
                .cast("string")
                .alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)
