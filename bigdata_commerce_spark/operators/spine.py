"""Shared plumbing for the bucket-spine skew-bounded operators
(asof_join, sessionize, running_sum_per_key): joining per-row frames
to per-(key, time-bucket) summaries.

The one subtlety every spine operator must get right — and the bug
all three independently had before this helper existed — is NULL
keys: the exact paths' windows treat NULL as an ordinary partition
value (NULL-key rows group together), so the bucketized join-back
must be NULL-SAFE on the key or anonymous/NULL-key rows silently
vanish. Buckets themselves are either sentinel-coalesced (never NULL)
or intentionally non-matching when NULL, so plain equality is right
for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_safe_key_bucket_join(
    rows: DataFrame,
    summary: DataFrame,
    key_col: str,
    bucket_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join ``rows`` to a per-(key, bucket) ``summary`` null-safe on
    the key and equi on the bucket; the summary's key/bucket columns
    are dropped from the result (its payload columns remain). The
    join keys still hash-partition (Spark plans ``<=>`` like ``=``),
    so the shuffle stays on the skew-spread composite key."""
    k2, b2 = "__nsj_k", "__nsj_b"
    s = summary.withColumnRenamed(key_col, k2).withColumnRenamed(bucket_col, b2)
    return rows.join(
        s,
        F.col(key_col).eqNullSafe(F.col(k2)) & (F.col(bucket_col) == F.col(b2)),
        how,
    ).drop(k2, b2)
