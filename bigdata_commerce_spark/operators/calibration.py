"""Classifier-calibration report: reliability bins + expected
calibration error (ECE) for a probabilistic quality score.

Curation pipelines gate documents on a classifier probability (the
fastText-style quality filter, CCNet's LM buckets). Whether "0.8"
means anything is a calibration question: bucket predictions into
fixed-width probability bins and compare each bin's mean predicted
probability against its empirical positive rate (Naeini et al. 2015;
Guo et al. 2017). A well-calibrated filter has small per-bin gaps;
ECE summarizes them weighted by bin mass. Here the "label" is any
boolean reference judgment — e.g. the Gopher rule verdict as a weak
label for the learned quality score, which directly answers "does
the cheap linear filter agree with the rule-based one, and where on
the score axis does it drift".

Scale shape: ONE hash aggregate over the scored corpus keyed by the
bin id (≤ n_bins groups, map-side partial), then everything else is
arithmetic on the n_bins-row frame. No window over the corpus, no
join beyond whatever produced the (prob, label) columns.

Engine-exactness: probabilities enter the bin sums through their
shortest decimal repr (VARCHAR -> DECIMAL(16,6), exact for the
6dp-rounded scores the repo's scorers emit), so the per-bin mean is
ONE correctly-rounded division of an exact decimal sum; rates and
gaps are 8dp-rounded doubles; the ECE sums 8dp-rounded per-bin terms
as DECIMAL(20,8) — float order cannot drift an oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """One row per occupied fixed-width probability bin:
    ``(bin, n_docs, n_pos, mean_prob, pass_rate, gap)`` plus
    ``n_total`` and the corpus-level ``ece`` repeated on every row.

    ``bin = min(floor(prob * n_bins), n_bins - 1)`` (so prob = 1.0
    lands in the top bin); ``gap = |mean_prob - pass_rate|``;
    ``ece = sum_b (n_b / N) * gap_b``. NULL probabilities are
    excluded. Empty input yields an empty frame.
    """
    b = F.least(
        F.floor(F.col(prob_col) * n_bins), F.lit(n_bins - 1)
    ).cast("int")
    per = (
        df.where(F.col(prob_col).isNotNull())
        .withColumn("__bin", b)
        .groupBy("__bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col(label_col), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_pos"),
            F.sum(
                F.col(prob_col).cast("string").cast("decimal(16,6)")
            ).alias("__psum"),
        )
    )
    tot = per.agg(F.sum("n_docs").alias("n_total"))
    binned = per.crossJoin(F.broadcast(tot)).select(
        F.col("__bin").alias("bin"),
        "n_docs",
        "n_pos",
        "n_total",
        F.round(
            F.col("__psum").cast("string").cast("double") / F.col("n_docs"),
            8,
        ).alias("mean_prob"),
        F.round(F.col("n_pos") * F.lit(1.0) / F.col("n_docs"), 8).alias(
            "pass_rate"
        ),
    )
    binned = binned.withColumn(
        "gap", F.round(F.abs(F.col("mean_prob") - F.col("pass_rate")), 8)
    )
    ece = binned.agg(
        F.sum(
            F.round(
                F.col("gap") * F.col("n_docs") / F.col("n_total"), 8
            ).cast("decimal(20,8)")
        )
        .cast("string")
        .cast("double")
        .alias("ece")
    )
    return binned.crossJoin(F.broadcast(ece)).select(
        "bin",
        "n_docs",
        "n_pos",
        "mean_prob",
        "pass_rate",
        "gap",
        "n_total",
        "ece",
    )
