"""Skew-mitigation operators: salted two-phase aggregation.

AQE's skew-join handling covers joins; for aggregations over a
power-law key (one user with 100M events), the classic fix is a
two-phase aggregate through a salted key: partial aggregation on
(key, salt) spreads the hot key over ``salt_buckets`` reducers, the
final aggregate combines the partials. Results are identical to the
direct aggregation — the catalog checks that with a plain GROUP BY
oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    key_cols: Sequence[str],
    salt_col: Column,
    salt_buckets: int = 16,
    count_alias: str = "n",
) -> DataFrame:
    """count(*) per key via (key, salt) partial -> final combine.

    ``salt_col`` must be a deterministic expression over the row (a
    hash of a high-cardinality column) so retries reproduce the same
    partials.
    """
    partial = (
        df.withColumn("__salt", F.pmod(salt_col, F.lit(salt_buckets)))
        .groupBy(*key_cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias(count_alias))
