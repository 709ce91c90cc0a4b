"""Calibration bins: hand-computed reliability stats and ECE, the
top-bin clamp, and edge cases."""

from __future__ import annotations

from bigdata_commerce_spark.operators.calibration import calibration_bins


def _bins(spark, rows, **kw):
    df = spark.createDataFrame(rows, "prob double, label boolean")
    out = calibration_bins(df, "prob", "label", **kw)
    return {r["bin"]: r.asDict() for r in out.collect()}


def test_hand_computed_bins_and_ece(spark):
    rows = [
        (0.95, True),
        (0.85, True),
        (0.85, False),
        (0.05, False),
        (1.0, True),  # prob 1.0 clamps into the top bin
        (0.35, True),
    ]
    by = _bins(spark, rows)
    assert set(by) == {0, 3, 8, 9}
    assert by[9]["n_docs"] == 2 and by[9]["mean_prob"] == 0.975
    assert by[9]["pass_rate"] == 1.0 and by[9]["gap"] == 0.025
    assert by[8]["mean_prob"] == 0.85 and by[8]["pass_rate"] == 0.5
    assert by[8]["gap"] == 0.35
    assert by[3]["gap"] == 0.65
    assert by[0]["gap"] == 0.05
    assert by[0]["n_total"] == 6
    # per-term 8dp rounding then exact decimal sum:
    # 0.00833333 + 0.11666667 + 0.00833333 + 0.10833333
    assert by[0]["ece"] == 0.24166666


def test_perfectly_calibrated_gap_zero(spark):
    # bin 5 (probs ~0.5): half positive -> gap 0 -> ece 0
    rows = [(0.5, True), (0.5, False), (0.5, True), (0.5, False)]
    by = _bins(spark, rows)
    assert set(by) == {5}
    assert by[5]["gap"] == 0.0 and by[5]["ece"] == 0.0


def test_null_probs_excluded_and_empty(spark):
    rows = [(None, True), (0.25, False)]
    by = _bins(spark, rows)
    assert set(by) == {2} and by[2]["n_total"] == 1
    empty = spark.createDataFrame([], "prob double, label boolean")
    assert calibration_bins(empty, "prob", "label").count() == 0


def test_custom_bin_count(spark):
    by = _bins(spark, [(0.49, True), (0.51, False)], n_bins=2)
    assert set(by) == {0, 1}
    assert by[0]["n_docs"] == 1 and by[1]["n_docs"] == 1
