"""Bucketed tables: co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of the fact-fact joins (orders x
lineitem, session x action) is the exchange of both sides on the join
key. Hash-bucketing both tables on that key at WRITE time moves the
shuffle to ingest, once, and every subsequent join/groupBy on the key
runs shuffle-free: Spark's scan reports the bucket distribution and
Catalyst drops the Exchange on both sides (verified in
``tests/test_bucketing.py`` against the executed plan).

Pick bucket counts so one bucket of the LARGER table fits an executor
core's working set (~128-512 MB of input per bucket); both sides need
the same count (or a divisor — Spark 3+ can coalesce) for the join to
co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by the
    join/aggregation key. Sorting within buckets additionally lets
    sort-merge joins skip their per-task sort."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cobucket_tables(
    spark: SparkSession,
    dfs: dict[str, DataFrame],
    bucket_cols: list[str],
    num_buckets: int = 32,
) -> dict[str, DataFrame]:
    """Write every DataFrame bucketed on the SAME key with the SAME
    bucket count and return the re-read table handles — joins between
    any pair of them on ``bucket_cols`` are then exchange-free."""
    out = {}
    for name, df in dfs.items():
        write_bucketed(df, name, bucket_cols, num_buckets, sort_cols=bucket_cols)
        out[name] = spark.table(name)
    return out
