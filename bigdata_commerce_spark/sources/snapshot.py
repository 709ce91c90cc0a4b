"""Snapshot-isolated table publish: atomic version swap + time travel
over plain parquet.

A curated corpus is republished every pipeline cycle; consumers must
never read a half-written version (a plain overwrite exposes partial
file sets for minutes at 100 TB). The lakehouse answer is manifest
commits, built here from primitives the engine already has:

- each publish writes its files under a fresh, version-private
  directory (never touching prior versions' files);
- a JSON manifest naming that directory is the COMMIT — it is
  written to a temp name and moved into place with a filesystem
  rename. Readers resolve the newest manifest; a publish that
  crashes mid-write leaves data files but no manifest, so it is
  simply invisible (and reclaimable by vacuum);

ATOMICITY SCOPE: the rename commit (and its dest-exists race
detection) is guaranteed only on filesystems with atomic rename —
HDFS and local. S3A rename is a non-atomic copy+delete and its
destination-exists semantics vary by store, so on raw object stores
this module's single-writer race detection can miss; an object-store
deployment should commit via a conditional PUT (S3 If-None-Match) or
an external commit log (the Delta/Iceberg catalog answer) instead.
- old manifests stay: any historical version remains readable
  (time travel) until vacuumed — reproducibility for "which corpus
  version trained this model".

Single-writer contract (the Delta/Iceberg no-lock-service posture):
concurrent publishes race on the version number; the engine's
streaming sinks own multi-writer coordination via their epoch
ledgers (streaming/jdbc_state.py).
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from bigdata_commerce_spark.sources.hadoopfs import fs_and_path

_MANIFEST_PREFIX = "manifest-v"


def _manifest_versions(spark: SparkSession, table_dir: str) -> list[int]:
    fs, _, Path = fs_and_path(spark, table_dir)
    mdir = Path(f"{table_dir}/_manifests")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith(_MANIFEST_PREFIX) and name.endswith(".json"):
            out.append(int(name[len(_MANIFEST_PREFIX) : -len(".json")]))
    return sorted(out)


def _read_manifest(spark: SparkSession, table_dir: str, version: int) -> dict:
    fs, _, Path = fs_and_path(spark, table_dir)
    p = Path(f"{table_dir}/_manifests/{_MANIFEST_PREFIX}{version}.json")
    stream = fs.open(p)
    try:
        data = bytes(
            spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def publish_snapshot(df: DataFrame, table_dir: str, writer=None) -> int:
    """Write ``df`` as the next version of the table and commit it
    atomically. Returns the published version number. Prior versions'
    files are never modified — readers pinned to them are undisturbed
    (snapshot isolation). ``writer(df, dest_path)`` overrides the
    data write (same commit protocol, different physical layout) —
    `optimize_snapshot` uses it for the Z-order rewrite."""
    spark = df.sparkSession
    versions = _manifest_versions(spark, table_dir)
    version = (versions[-1] + 1) if versions else 1
    data_dir = f"v{version}-{uuid.uuid4().hex[:8]}"
    if writer is None:
        df.write.parquet(f"{table_dir}/{data_dir}")
    else:
        writer(df, f"{table_dir}/{data_dir}")

    manifest = {"version": version, "data_dir": data_dir}
    fs, _, Path = fs_and_path(spark, table_dir)
    mdir = Path(f"{table_dir}/_manifests")
    fs.mkdirs(mdir)
    tmp = Path(f"{table_dir}/_manifests/.tmp-{uuid.uuid4().hex}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()
    final = Path(f"{table_dir}/_manifests/{_MANIFEST_PREFIX}{version}.json")
    # The COMMIT: one atomic rename. Before it, this version does not
    # exist for any reader; after it, it is complete.
    if not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise RuntimeError(
            f"snapshot commit race on version {version} of {table_dir} "
            "(single-writer contract violated)"
        )
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the latest (or a pinned historical) committed version.
    Uncommitted data directories are invisible by construction."""
    versions = _manifest_versions(spark, table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {table_dir}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(f"version {version} not in {versions}")
    m = _read_manifest(spark, table_dir, version)
    return spark.read.parquet(f"{table_dir}/{m['data_dir']}")


def list_snapshots(spark: SparkSession, table_dir: str) -> list[int]:
    """Committed versions, oldest first."""
    return _manifest_versions(spark, table_dir)


def vacuum(
    spark: SparkSession,
    table_dir: str,
    keep_last: int = 2,
    min_age_seconds: int = 86400,
) -> list[str]:
    """Delete data directories not referenced by the ``keep_last``
    newest manifests — expired versions, orphans from crashed
    publishes, and stale ``.tmp-`` manifest files — and drop the
    expired manifests. Returns the deleted directory names. Readers
    of retained versions are unaffected (their files are untouched).

    ``min_age_seconds`` is the safety window (Delta/Iceberg's vacuum
    retention): an unreferenced directory younger than it is left
    alone, because a publish writes its data BEFORE its manifest — a
    vacuum racing that window would delete a commit in flight and the
    writer would then publish a manifest over missing files. The same
    window is what protects IN-FLIGHT PINNED READERS of expired
    versions: age is measured from the data directory's publish mtime,
    so a reader pinned to version V is guaranteed safe iff it finishes
    within ``min_age_seconds`` of V's publish — size ``min_age`` to
    (longest reader runtime + max version age at read start); the 24h
    default covers same-day reads (contract pinned by
    tests/test_snapshot.py::test_vacuum_race_with_inflight_pinned_reader).
    Only drop it to 0 when no publish and no reader can be running."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = _manifest_versions(spark, table_dir)
    keep = set(versions[-keep_last:])
    live_dirs = {
        _read_manifest(spark, table_dir, v)["data_dir"] for v in keep
    }
    fs, _, Path = fs_and_path(spark, table_dir)
    cutoff_ms = (time.time() - min_age_seconds) * 1000
    deleted: list[str] = []
    for st in fs.listStatus(Path(table_dir)):
        name = st.getPath().getName()
        if name == "_manifests" or not st.isDirectory():
            continue
        if name not in live_dirs and st.getModificationTime() <= cutoff_ms:
            fs.delete(st.getPath(), True)
            deleted.append(name)
    mdir = Path(f"{table_dir}/_manifests")
    if fs.exists(mdir):
        for st in fs.listStatus(mdir):
            name = st.getPath().getName()
            if name.startswith(".tmp-") and st.getModificationTime() <= cutoff_ms:
                fs.delete(st.getPath(), False)
    for v in versions:
        if v not in keep:
            fs.delete(
                Path(f"{table_dir}/_manifests/{_MANIFEST_PREFIX}{v}.json"), False
            )
    return sorted(deleted)


def optimize_snapshot(
    spark: SparkSession,
    table_dir: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    version: int | None = None,
) -> int:
    """OPTIMIZE ZORDER for the snapshot store: rewrite a committed
    version (default latest) Z-ordered on (col_a, col_b) and publish
    the rewrite as a NEW version — same rows, file layout with narrow
    per-file min/max on both columns (sources/layout.py), so
    footer-stat skipping works for readers of either predicate.
    The source version's files are untouched (pinned readers and
    time travel are undisturbed); `vacuum` reclaims them on its
    normal retention schedule. Returns the new version number.

    Layout is a read-amplification optimization, not a data change —
    the equality `read(optimized) == read(source)` is pinned by test.
    That claim also forces the source to be the LATEST version: the
    rewrite becomes the new head, so optimizing a historical version
    would silently roll the table's data back under a layout-only
    banner — refused with ValueError (time-travel to read old
    layouts; republish explicitly if a rollback is truly intended).
    """
    from bigdata_commerce_spark.sources.layout import write_zordered

    versions = _manifest_versions(spark, table_dir)
    if version is not None and (not versions or version != versions[-1]):
        raise ValueError(
            f"optimize_snapshot only rewrites the latest version "
            f"({versions[-1] if versions else 'none'}); optimizing "
            f"v{version} would publish its data as the new head — a "
            "rollback, not a layout change"
        )
    src = read_snapshot(spark, table_dir, version)
    return publish_snapshot(
        src,
        table_dir,
        writer=lambda df, dest: write_zordered(df, dest, col_a, col_b, n_files),
    )


def compact_snapshot(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> int:
    """OPTIMIZE (bin-packing compaction) for the snapshot store:
    rewrite the LATEST version's many small files into
    ceil(total_bytes / target_file_bytes) files (floored at
    ``min_files``) and publish the rewrite as a NEW version — same
    rows, fewer/larger files. The small-file problem is what every
    incremental pipeline accretes (each micro-publish lands a handful
    of tiny parquet files; a 100 TB table read then pays a task per
    file and a footer fetch per task); periodic compaction restores
    scan efficiency without touching logical content.

    Same isolation contract as optimize_snapshot: the source
    version's files are untouched (pinned readers / time travel are
    undisturbed), the rewrite lands through the identical atomic
    manifest commit, `vacuum` reclaims the old files on its normal
    schedule. Like optimize_snapshot, only the LATEST version may be
    compacted (rewriting a historical one would publish stale data as
    the new head). read(compacted) == read(source) is pinned by test.

    File count comes from the source version's ACTUAL total bytes
    (filesystem listing, not a row-count guess), so the target holds
    across schema width and compression changes. The rewrite uses
    coalesce(), not repartition(): compaction must not pay a full
    shuffle of the table — merging co-located partitions map-side is
    the point.
    """
    versions = _manifest_versions(spark, table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {table_dir}")
    m = _read_manifest(spark, table_dir, versions[-1])
    data_path = f"{table_dir}/{m['data_dir']}"
    fs, _, Path = fs_and_path(spark, data_path)
    total = fs.getContentSummary(Path(data_path)).getLength()
    n_files = max(min_files, -(-total // target_file_bytes))
    src = read_snapshot(spark, table_dir)
    return publish_snapshot(
        src,
        table_dir,
        writer=lambda df, dest: df.coalesce(int(n_files)).write.parquet(dest),
    )
