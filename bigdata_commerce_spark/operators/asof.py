"""As-of (backward temporal) join — a custom operator Spark lacks.

The reference has only single-key equi-joins (SURVEY.md §2.3); an
as-of join is the canonical "operator Spark doesn't ship" extension,
built as a *composition of built-in ops* (preference (a) from the
build notes) rather than an applyInPandas merge_asof: union the two
sides, sort within each key by (ts, side), and carry the last
right-side payload forward with ``last(..., ignorenulls=True)``.

Scale shape: ONE shuffle of (left ∪ right) on the key, then a
within-partition sort — the same cost as a sort-merge join, no
per-group materialization, no Python. merge_asof-per-group
(applyInPandas) would ship every group through Arrow and bound group
size by executor memory; this doesn't.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (backward
    as-of, inclusive; left-join semantics — unmatched rows keep NULL
    payloads).

    ``payload_cols`` are carried from the right side, renamed with
    ``prefix``. Right rows that tie on (key, ts) are deduplicated to
    the one with the lexicographically greatest payload struct so the
    result is deterministic.
    """
    payload_struct = F.struct(F.col(right_ts).alias("__ts"), *[F.col(c) for c in payload_cols])
    # NULL-timestamp right rows carry no "as of when" — drop them, as
    # SQL ASOF JOIN does (ascending-nulls-first would otherwise smear
    # their payload over the whole key).
    r = (
        right.where(F.col(right_ts).isNotNull())
        .groupBy(on, right_ts)
        .agg(F.max(payload_struct).alias("__payload"))
        .select(
            F.col(on).alias("__key"),
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__side"),
            F.col("__payload"),
        )
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    both = r.withColumn("__row", F.lit(None).cast(l.schema["__row"].dataType)).unionByName(l)
    # right rows sort before probes at equal ts -> inclusive "<="
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = both.withColumn("__last", F.last("__payload", ignorenulls=True).over(w))
    out = filled.where(F.col("__side") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__last.{c}").alias(f"{prefix}{c}") for c in payload_cols],
        F.col("__last.__ts").alias(f"{prefix}ts"),
    )
    return out
