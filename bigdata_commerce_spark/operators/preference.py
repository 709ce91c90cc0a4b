"""Preference-pair mining: (chosen, rejected) document pairs for
DPO/RLHF-style preference training, ranked by a quality score within
matched groups.

Preference-tuning datasets need pairs where the two sides differ in
quality but are otherwise comparable — pairing a long document
against a short one teaches length, not quality. So pairs are mined
WITHIN a group (e.g. source × length-bucket): the i-th best document
is paired with the i-th worst, capped at ``max_pairs`` per group and
gated on a minimum score gap so near-ties (which carry no preference
signal) are dropped. Deterministic by construction: ranking ties
break on the id, so the pairing is content- and
partitioning-independent.

Scale shape: per-group ranking uses TWO rank-limited windows (one
descending for the chosen side, one ascending for the rejected side),
each filtered to ``row_number <= max_pairs`` — the shape Spark's
WindowGroupLimit rewrites into a per-partition top-k heap, so neither
side ever sorts a whole group (the operators/topk.py plan-asserted
pruning). The join back together is an equi-join of two
≤ max_pairs-per-group frames on (group, rank), plus a counts join to
exclude overlapping middles. No self-join of the corpus, no full
window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def preference_pairs(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    id_col: str,
    margin: float = 0.0,
    max_pairs: int = 5,
) -> DataFrame:
    """(group..., pair_rank, chosen_id, rejected_id, chosen_score,
    rejected_score, gap): the i-th best paired with the i-th worst
    per group, for i ≤ max_pairs, requiring ``chosen - rejected >=
    margin`` and no overlap (2i ≤ group size, so a row never pairs
    with itself or a better row). NULL scores are excluded."""
    base = df.where(F.col(score_col).isNotNull()).select(
        *group_cols, id_col, score_col
    )
    w_top = Window.partitionBy(*group_cols).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    w_bot = Window.partitionBy(*group_cols).orderBy(
        F.asc(score_col), F.desc(id_col)
    )
    top = (
        base.withColumn("pair_rank", F.row_number().over(w_top))
        .where(F.col("pair_rank") <= max_pairs)
        .select(
            *group_cols,
            "pair_rank",
            F.col(id_col).alias("chosen_id"),
            F.col(score_col).alias("chosen_score"),
        )
    )
    bot = (
        base.withColumn("pair_rank", F.row_number().over(w_bot))
        .where(F.col("pair_rank") <= max_pairs)
        .select(
            *group_cols,
            "pair_rank",
            F.col(id_col).alias("rejected_id"),
            F.col(score_col).alias("rejected_score"),
        )
    )
    counts = base.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    return (
        top.join(bot, [*group_cols, "pair_rank"])
        .join(counts, group_cols)
        .where(F.lit(2) * F.col("pair_rank") <= F.col("__n"))
        .where(
            F.col("chosen_score") - F.col("rejected_score") >= F.lit(margin)
        )
        .select(
            *group_cols,
            F.col("pair_rank").cast("int").alias("pair_rank"),
            "chosen_id",
            "rejected_id",
            "chosen_score",
            "rejected_score",
            F.round(
                F.col("chosen_score") - F.col("rejected_score"), 8
            ).alias("gap"),
        )
    )
