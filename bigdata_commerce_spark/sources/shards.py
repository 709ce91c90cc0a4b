"""Training-shard export: the pipeline's last mile.

Trainers consume fixed-size shards (so data-loader workers stripe
evenly and resume points are cheap), not whatever file sizes the last
shuffle happened to leave. This writer assigns every row a
deterministic shard id from an explicit ordering column and lands
exactly ceil(n / rows_per_shard) parquet files, one per shard, each
internally sorted:

- shard_id = dense_rank_by(order_col) // rows_per_shard, computed as
  a two-level bucketed prefix sum over COUNTS (operators/packing.py
  discipline) — never a global single-partition row_number over the
  data. The per-bucket count table is tiny (one row per bucket), so
  the only full-data shuffle is the final repartition BY shard.
- repartition(num_shards, shard_id) + sortWithinPartitions lands one
  in-order file per shard via parquet's one-file-per-partition write.

At 100 TB: one count aggregate (map-side partials), one broadcast of
the bucket offsets, one shuffle by shard id — the minimum any exact
fixed-size sharding can do. If approximate shard sizes are
acceptable, skip this and write with maxRecordsPerFile; this module
exists for the exact, resumable layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_index(
    df: DataFrame,
    order_col: str = "doc_id",
    index_col: str = "idx",
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Add a contiguous 0-based global index by ``order_col`` order
    WITHOUT a global single-partition window — the distributed
    replacement for zipWithIndex / monotonically_increasing_id when
    ids must be dense and order-defined (training-example numbering,
    stable row addressing).

    ``order_col`` must be unique (it defines the total order). Bucket
    prefix sums: rows bucket by order_col // bucket_width; per-bucket
    counts (tiny) get an exclusive running total on the driver-sized
    frame; each row's global index = bucket offset + rank within
    bucket. The within-bucket window partitions by bucket — bounded
    memory, no single-reducer stage."""
    # integer `div`, not float `/`+cast: double rounding would misplace
    # ids above 2^53 and ids exactly at bucket boundaries
    bucket = F.expr(f"`{order_col}` div {bucket_width}")
    rows = df.withColumn("__bucket", bucket)
    counts = rows.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.partitionBy().orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__bucket", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset")
    )
    w_in = Window.partitionBy("__bucket").orderBy(order_col)
    return (
        rows.join(F.broadcast(offsets), "__bucket")
        .withColumn(index_col, F.col("__offset") + F.row_number().over(w_in) - 1)
        .drop("__bucket", "__n", "__offset")
    )


def with_group_shuffled_index(
    df: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    index_col: str = "pos",
    salt: str = ":shuf",
) -> DataFrame:
    """Dense 0-based SHUFFLED position within each group — the keyed
    sibling of ``with_global_index``, with the deterministic md5
    order standing in for a random permutation (the
    documents_shuffled_index discipline: same salt, same hash, so
    re-runs and engines agree row for row).

    Never a single reducer per group: positions come from a two-level
    prefix sum over the hash's 2-hex-char PREFIX (256 sub-buckets per
    group). Because the sub-bucket is a prefix of the fixed-width hex
    hash, (sub asc, hash asc within sub) IS hash order within the
    group — so per-(group, sub) counts (tiny: groups x 256 rows) take
    an exclusive running offset within the group, and each row's
    position is that offset + its rank within its (group, sub) cell.
    The heavy window partitions by (group, sub): bounded memory at
    any group size, exactly the ``with_global_index`` posture with a
    key. ``id_col`` must be unique — it is both the hash input and
    the total-order tiebreak.
    """
    h = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 16
    )
    rows = df.withColumn("__h", h).withColumn("__sub", F.substring("__h", 1, 2))
    counts = rows.groupBy(*group_cols, "__sub").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        "__sub",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
    )
    w_in = Window.partitionBy(*group_cols, "__sub").orderBy("__h", id_col)
    return (
        rows.join(F.broadcast(offsets), [*group_cols, "__sub"])
        .withColumn(index_col, F.col("__offset") + F.row_number().over(w_in) - 1)
        .drop("__h", "__sub", "__n", "__offset")
    )


def assign_shards(
    df: DataFrame,
    rows_per_shard: int,
    order_col: str = "doc_id",
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Add ``shard_id`` and ``shard_pos`` (0-based position within the
    shard) by global ``order_col`` order — the shard address is the
    global index (with_global_index) divided into fixed-size runs."""
    ranked = with_global_index(df, order_col, "__rank", bucket_width)
    return (
        ranked.withColumn("shard_id", F.expr(f"CAST(__rank div {rows_per_shard} AS INT)"))
        .withColumn("shard_pos", F.pmod(F.col("__rank"), F.lit(rows_per_shard)).cast("int"))
        .drop("__rank")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    order_col: str = "doc_id",
) -> int:
    """Write ``df`` as exactly ceil(n / rows_per_shard) shards under
    ``path/shard_id=K/``, ONE parquet file per shard, each holding
    ``rows_per_shard`` consecutive rows of the ``order_col`` order
    (the last shard short), internally sorted by position. Returns
    the shard count.

    repartition BY shard_id can hash-collide two shards into one
    task; ``partitionBy`` at write splits a task's rows per shard
    value, so the one-file-per-shard layout holds regardless (each
    task writes one file per shard directory it touches). The
    count() that sizes the repartition is one extra aggregate —
    acceptable for a terminal export job (it IS the job)."""
    # persist before counting: the count() that sizes the repartition
    # would otherwise recompute the whole rank pipeline (scan + bucket
    # agg + windows) a second time for the write
    assigned = assign_shards(df, rows_per_shard, order_col).persist()
    try:
        n = assigned.count()
        num_shards = -(-n // rows_per_shard)
        if n:
            (
                assigned.repartition(num_shards, "shard_id")
                .sortWithinPartitions("shard_id", "shard_pos")
                .write.mode("overwrite")
                .partitionBy("shard_id")
                .parquet(path)
            )
        # empty input: 0 shards, nothing written — a data-loader must
        # see the true shard count, not a phantom shard 1
        return num_shards
    finally:
        assigned.unpersist()


def with_shuffled_index(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuf",
    index_col: str = "idx",
    bucket_width: int = 1 << 44,
) -> DataFrame:
    """Deterministic global SHUFFLE order: a dense 0-based index over
    a seeded pseudo-random permutation of the rows — the
    shuffle-before-sharding step of training-data prep, reproducible
    across runs/engines (no rand(), no partitioning dependence).

    ``id_col`` must be unique (same contract as with_global_index —
    duplicate ids share both the hash key and the tiebreak, making
    their relative order partitioning-dependent). Order key = the
    first 15 hex chars of md5(id:salt) as a 60-bit integer (ties
    broken by id, so the order is total even on hash collisions); the index comes from the same two-level bucketed
    prefix sum as with_global_index — key-space buckets of
    ``bucket_width`` give ~2^16 count rows for the driver-sized
    exclusive running total, and the within-bucket window stays
    bounded. Changing ``salt`` draws a fresh permutation.
    """
    from bigdata_commerce_spark.functions import md5_uniform60

    key = md5_uniform60(id_col, salt)
    rows = df.withColumn("__k", key).withColumn(
        "__bucket", F.expr(f"__k div {bucket_width}")
    )
    counts = rows.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.partitionBy().orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__bucket", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset")
    )
    w_in = Window.partitionBy("__bucket").orderBy("__k", id_col)
    return (
        rows.join(F.broadcast(offsets), "__bucket")
        .withColumn(index_col, F.col("__offset") + F.row_number().over(w_in) - 1)
        .drop("__bucket", "__n", "__offset", "__k")
    )
