"""Range (interval) joins: point-in-interval matching at scale.

A naive ``l.ts BETWEEN r.start AND r.end`` join has no equi-key, so
Spark plans a broadcast-nested-loop — all pairs, O(|L|x|R|), dead at
scale. The standard decomposition: quantize time into fixed-width
buckets, give each point its ONE bucket and each interval EVERY
bucket it overlaps (explode), equi-join on (keys..., bucket), then
apply the exact containment predicate. Each qualifying (point,
interval) pair meets exactly once — in the point's bucket — so no
distinct pass is needed.

Pick ``bucket_seconds`` near the typical interval length: shorter
buckets multiply the interval-side explosion, longer ones widen the
candidate lists per bucket. Same cost envelope as one equi shuffle
join either way, which is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    key_cols: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of ``points`` to every interval containing its
    timestamp (inclusive bounds), optionally also matching on
    ``key_cols``. Returns the point columns plus the interval's
    start/end (and any interval payload columns)."""
    key_cols = key_cols or []
    b = F.lit(bucket_seconds)
    p = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / b)
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    return (
        p.join(i, [*key_cols, "__bucket"])
        .where(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    key_cols: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval x interval overlap join (inclusive bounds): every
    (left, right) pair whose time ranges intersect, plus the
    intersection itself (``overlap_start`` / ``overlap_end``).

    Same bucketization as range_join — both sides explode over the
    buckets they cover and equi-join on (keys..., bucket) — with the
    exactly-once refinement: a pair sharing many buckets is kept only
    in the bucket containing max(start_l, start_r), the first moment
    both intervals are live. That bucket is covered by both sides by
    construction, so every overlapping pair appears exactly once and
    no distinct pass (which would need the full output shuffled) is
    ever run. Column names must not collide across the two inputs.
    """
    key_cols = key_cols or []
    b = F.lit(bucket_seconds)

    def _exploded(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(s)) / b),
                    F.floor(F.unix_timestamp(F.col(e)) / b),
                )
            ),
        )

    l = _exploded(left, left_start, left_end)
    r = _exploded(right, right_start, right_end)
    overlap_start = F.greatest(F.col(left_start), F.col(right_start))
    overlap_end = F.least(F.col(left_end), F.col(right_end))
    return (
        l.join(r, [*key_cols, "__bucket"])
        .where(
            (overlap_start <= overlap_end)
            & (F.col("__bucket") == F.floor(F.unix_timestamp(overlap_start) / b))
        )
        .drop("__bucket")
        .withColumn("overlap_start", overlap_start)
        .withColumn("overlap_end", overlap_end)
    )
