"""Incremental exact dedup against a persisted fingerprint store.

The batch dedup operators (operators/dedup.py) answer "which rows
inside THIS corpus duplicate each other". A production ingest loop
needs the other question: "which of today's documents are new
relative to EVERYTHING ingested before" — without rescanning or
reshuffling the historical corpus. The reference has no such notion
(its pipelines recompute from scratch every run); this is the
north-star extension shape.

Store layout: one parquet directory of fingerprints, partitioned by
the first ``PREFIX_LEN`` hex chars of the md5 fingerprint
(``fp_prefix``). That gives two scale properties:

- **Bounded reads**: the novelty anti-join only reads store
  partitions whose prefix occurs in the incoming batch. A small or
  skewed batch (one crawl slice, one tenant) touches a fraction of
  the store's files; Spark's partition pruning does the skipping
  (PartitionFilters, asserted in tests).
- **Append-only growth**: committing a batch's novel fingerprints is
  a partition-wise append — no rewrite of existing files, no
  compaction required for correctness (sources/compaction.py handles
  small-file hygiene separately).

The md5 prefix is uniform by construction, so the partitioning never
skews no matter how skewed the document keys are.

Within-batch duplicates are also collapsed (keep the min id per
fingerprint) so one run is idempotent end to end: running the same
batch twice yields zero novel documents the second time.

**Bloom sidecar** (optional, operators/bloom.py): once the store is
huge, even the prefix-pruned anti-join reads a slice proportional to
the batch's prefix spread. ``init_bloom`` persists a Bloom filter of
the store's fingerprints under ``<store>/_bloom`` (the underscore
prefix makes it invisible to the store's own parquet reads — Spark
skips underscore-paths when listing), and ``novel_documents`` then
probes it map-side: rows the filter rejects are DEFINITELY novel and
never touch the store; only the "maybe" sliver (true dups + fpp false
positives) reaches the exact anti-join. Crash-safety ordering in
``commit_batch``: the sidecar is updated BEFORE the store append —
a crash in between leaves the bloom with keys the store lacks, which
are harmless false positives caught by the exact verify; the reverse
order could yield false NEGATIVES (re-admitted duplicates). A filter
past its sized capacity only degrades fpp (more exact-verify rows),
never correctness; ``init_bloom`` rebuilds at a new capacity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_commerce_spark.operators.text import fingerprint

PREFIX_LEN = 2  # 16^2 = 256 store partitions


def store_schema(id_col: str = "doc_id") -> str:
    """Explicit store schema (a freshly-initialized store has zero
    data files, so inference would fail; the declaration also keeps
    reads stable as partitions appear). The id is pinned to BIGINT:
    a drifting id type would commit fine and then crash every later
    read, so the contract is enforced at the write boundary instead
    (see _fingerprints)."""
    return f"{id_col} long, fp string, fp_prefix string"


def _fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from bigdata_commerce_spark.functions import require_integer_id

    require_integer_id(df, id_col, context="store id column")
    fp = fingerprint(text_col)
    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        fp.alias("fp"),
        F.substring(fp, 1, PREFIX_LEN).alias("fp_prefix"),
    )


def init_store(
    spark: SparkSession, path: str, id_col: str = "doc_id", overwrite: bool = False
) -> None:
    """Create an empty fingerprint store (schema only). Safe to call
    at every job start: an EXISTING store is left untouched unless
    ``overwrite=True`` — unconditional overwrite would wipe the
    durable dedup history and re-admit every known duplicate, the
    exact failure the store exists to prevent."""
    from bigdata_commerce_spark.sources.hadoopfs import fs_and_path

    fs, hpath, _ = fs_and_path(spark, path)
    if fs.exists(hpath) and not overwrite:
        return
    empty = spark.createDataFrame([], store_schema(id_col))
    empty.write.partitionBy("fp_prefix").mode("overwrite").parquet(path)


BLOOM_DIR = "_bloom"  # underscore prefix: hidden from the store scan


def _bloom_paths(store_path: str) -> tuple[str, str]:
    base = store_path.rstrip("/")
    return f"{base}/{BLOOM_DIR}/filter", f"{base}/{BLOOM_DIR}/meta"


def init_bloom(
    spark: SparkSession,
    store_path: str,
    capacity: int,
    fpp: float = 0.01,
    id_col: str = "doc_id",
) -> None:
    """Create (or rebuild, e.g. at a larger capacity) the store's
    Bloom sidecar from its CURRENT contents. ``capacity`` is the
    expected total fingerprint count the filter is sized for —
    overshooting it later degrades fpp, never correctness."""
    from bigdata_commerce_spark.operators import bloom

    m, k = bloom.bloom_params(capacity, fpp)
    filter_path, meta_path = _bloom_paths(store_path)
    store = spark.read.schema(store_schema(id_col)).parquet(store_path)
    filt = bloom.bloom_build(store, "fp", m, k).localCheckpoint(eager=True)
    filt.write.mode("overwrite").parquet(filter_path)
    spark.createDataFrame(
        [(m, k, capacity)], "num_bits long, num_hashes int, capacity long"
    ).write.mode("overwrite").parquet(meta_path)


def _read_bloom(spark: SparkSession, store_path: str):
    """(filter_df, num_bits, num_hashes) or None when no sidecar
    exists — callers fall back to the plain pruned anti-join."""
    from bigdata_commerce_spark.sources.hadoopfs import fs_and_path

    filter_path, meta_path = _bloom_paths(store_path)
    fs, meta_hpath, _ = fs_and_path(spark, meta_path)
    if not fs.exists(meta_hpath):
        return None
    meta = spark.read.parquet(meta_path).collect()[0]
    filt = spark.read.parquet(filter_path)
    return filt, int(meta.num_bits), int(meta.num_hashes)


def novel_documents(
    df: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents in ``df`` whose normalized-text fingerprint is absent
    from the store, de-duplicated within the batch (min id per
    fingerprint wins). Returns (doc_id, fp, fp_prefix).

    Plan shape: one hash aggregate on fp for the within-batch
    collapse; the store side is a partition-pruned scan (only
    prefixes present in the batch) anti-joined on fp. The batch is
    the small side at steady state — the store never shuffles more
    than the pruned slice, and AQE broadcasts the batch when it
    fits. When the Bloom sidecar exists (init_bloom), batch rows the
    filter rejects skip the store entirely; both the prefix collect
    and the anti-join then see only the "maybe" sliver."""
    spark = df.sparkSession
    batch = (
        _fingerprints(df, text_col, id_col)
        .groupBy("fp", "fp_prefix")
        .agg(F.min(id_col).alias(id_col))
    )
    # Materialize the batch aggregate ONCE (eager checkpoint): the
    # prefix collect, the anti-join, and (with a sidecar) both probe
    # branches consume it, and without this the fingerprint
    # projection + groupBy shuffle runs per consumer. (Checkpoint
    # rather than persist: the caller may append to the store and
    # re-execute — see commit_batch's lineage note.)
    batch = batch.localCheckpoint(eager=True)
    sidecar = _read_bloom(spark, store_path)
    if sidecar is not None:
        from bigdata_commerce_spark.operators import bloom

        filt, m, k = sidecar
        flagged = bloom.bloom_might_contain(batch, "fp", filt, m, k, "__maybe")
        definite = flagged.where(~F.col("__maybe")).drop("__maybe")
        batch = flagged.where(F.col("__maybe")).drop("__maybe")
    # Prefix pruning: the distinct prefixes of the batch are <= 256
    # rows by construction — a bounded driver-side collect that turns
    # the store read into a partition-pruned scan.
    prefixes = [r.fp_prefix for r in batch.select("fp_prefix").distinct().collect()]
    store = spark.read.schema(store_schema(id_col)).parquet(store_path).where(
        F.col("fp_prefix").isin(prefixes)
    )
    verified = batch.join(store, "fp", "left_anti").select(
        id_col, "fp", "fp_prefix"
    )
    if sidecar is not None:
        return definite.select(id_col, "fp", "fp_prefix").unionByName(verified)
    return verified


def commit_batch(
    df: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One ingest step: compute the batch's novel documents, append
    their fingerprints to the store, and return them. The append is
    partition-wise (partitionBy fp_prefix, mode append): existing
    store files are never rewritten."""
    novel = novel_documents(df, store_path, text_col, id_col)
    # Read-then-append-to-the-same-path footgun: the anti-join plan
    # embeds a scan of the store as it looked BEFORE this commit
    # (including partitionSchema=[] on the very first commit, when no
    # partition dirs exist yet). persist() is NOT enough — the append
    # below refreshes the path's file index, and any later
    # re-execution of the plan (cache rebuild, a second action) sees
    # the newly-appended partition dirs under the frozen relation and
    # dies in the parquet reader's partition-values assertion
    # (measured; ParquetFileFormat partitionValues assert). An EAGER
    # localCheckpoint materializes the result and TRUNCATES the
    # lineage, so neither the append nor the caller can ever re-scan
    # the mutated path. (A multi-session production loop would
    # checkpoint to reliable storage; same idea.)
    novel = novel.localCheckpoint(eager=True)
    # Sidecar BEFORE store (module docstring): a crash in between
    # leaves extra keys in the bloom — harmless false positives; the
    # reverse order could create false negatives (missed duplicates).
    sidecar = _read_bloom(df.sparkSession, store_path)
    if sidecar is not None and not novel.isEmpty():
        from bigdata_commerce_spark.operators import bloom

        filt, m, k = sidecar
        merged = bloom.bloom_merge(
            filt, bloom.bloom_build(novel, "fp", m, k)
        ).localCheckpoint(eager=True)  # materialize before overwriting its own input
        filter_path, _ = _bloom_paths(store_path)
        merged.write.mode("overwrite").parquet(filter_path)
    (
        novel.write.partitionBy("fp_prefix")
        .mode("append")
        .parquet(store_path)
    )
    return novel


def dedup_commit_sink(store_path: str, text_col: str = "text", id_col: str = "doc_id"):
    """foreachBatch sink running one fingerprint-store commit per
    micro-batch: each arriving shard is deduped against EVERYTHING
    previously ingested (any earlier batch, any earlier run — the
    store is durable) and only novel fingerprints are appended. The
    streaming twin of ``commit_batch``; replay of a micro-batch after
    a restart re-commits the same rows and appends nothing
    (commit_batch is idempotent by construction)."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        commit_batch(batch_df, store_path, text_col, id_col)

    return fn
