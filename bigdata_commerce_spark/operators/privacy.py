"""Privacy audits over tabular data: k-anonymity equivalence-class
analysis of quasi-identifier combinations.

A record is k-anonymous if at least k rows share its full
quasi-identifier combination (Sweeney 2002); a training-data export
containing classes of size 1 re-identifies people no matter how the
direct identifiers were scrubbed. The audit groups rows by the
quasi-identifier columns, measures every equivalence class, and
reports (a) the dataset's achieved k (the smallest class), (b) how
many classes and rows fall below the target k, and (c) the
``show_n`` smallest classes — the concrete combinations a release
reviewer must suppress or generalize first.

Scale shape: ONE hash aggregate keyed by the quasi-identifiers
(map-side partial counts), one tiny aggregate over the class frame
for the global stats, and a global top-k (orderBy + limit →
TakeOrderedAndProject, never a full sort) for the smallest classes.
Nothing beyond the class frame — which is at most |distinct QI
combinations| — leaves the aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kanonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    show_n: int = 20,
) -> DataFrame:
    """One row per smallest-class (≤ show_n rows): the QI columns,
    ``class_size``, ``class_rank`` (1 = smallest; ties break on the
    QI values), and dataset-level columns repeated on every row:
    ``n_rows, n_classes, k_anonymity`` (the achieved k),
    ``n_risky_classes`` / ``n_risky_rows`` (classes below the target
    ``k`` and the rows inside them)."""
    classes = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("class_size")
    )
    g = classes.agg(
        F.sum("class_size").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("class_size").alias("k_anonymity"),
        F.coalesce(
            F.sum(F.when(F.col("class_size") < k, 1)), F.lit(0)
        ).alias("n_risky_classes"),
        F.coalesce(
            F.sum(F.when(F.col("class_size") < k, F.col("class_size"))),
            F.lit(0),
        ).alias("n_risky_rows"),
    )
    smallest = classes.orderBy(
        "class_size", *[F.asc(c) for c in qi_cols]
    ).limit(show_n)
    # rank over the ≤ show_n frame only — the single-partition window
    # never sees more than show_n rows
    w = Window.partitionBy().orderBy("class_size", *qi_cols)
    return (
        smallest.withColumn("class_rank", F.row_number().over(w).cast("int"))
        .crossJoin(F.broadcast(g))
    )
