"""Conversion chi-square: hand-computed 2x2 statistic, degenerate
margins, multi-exposure collapse."""

from __future__ import annotations

from bigdata_commerce_spark.operators.abtest import conversion_chi2


def _run(spark, users, exposures, convs):
    pop = spark.createDataFrame([(u,) for u in users], "user_id long")
    exp = spark.createDataFrame(exposures, "campaign string, user_id long")
    cnv = spark.createDataFrame([(u,) for u in convs], "user_id long")
    out = conversion_chi2(pop, exp, cnv)
    return {r["campaign"]: r.asDict() for r in out.collect()}


def test_hand_computed_chi2(spark):
    # N=100, campaign A exposes users 0..19 (E=20), converters are
    # 0..9 and 50..54 (C=15), so a=10: x = 10*100 - 20*15 = 700,
    # den = 20*80*15*85 = 2,040,000,
    # chi2 = 100*700^2/den = 24.01960784 -> significant
    users = range(100)
    exposures = [("A", u) for u in range(20)]
    convs = list(range(10)) + list(range(50, 55))
    by = _run(spark, users, exposures, convs)
    r = by["A"]
    assert (r["exposed"], r["converted_exposed"]) == (20, 10)
    assert (r["n_users"], r["n_converted"]) == (100, 15)
    assert r["rate_exposed"] == 0.5 and r["rate_rest"] == 0.0625
    assert r["chi2"] == 24.01960784
    assert r["significant"] is True


def test_no_effect_not_significant(spark):
    # exposure independent of conversion: conversion rate identical
    # in both arms -> x = a*N - E*C = 10*100 - 20*50 = 0 -> chi2 = 0
    users = range(100)
    exposures = [("B", u) for u in range(20)]
    convs = [u for u in range(100) if u % 2 == 0]  # 50 converters
    by = _run(spark, users, exposures, convs)
    assert by["B"]["chi2"] == 0.0 and by["B"]["significant"] is False


def test_degenerate_margins_null(spark):
    users = range(10)
    # campaign exposing EVERY user: N-E = 0 -> chi2/rate_rest NULL
    full = _run(spark, users, [("C", u) for u in users], [1, 2])
    assert full["C"]["chi2"] is None
    assert full["C"]["significant"] is None
    assert full["C"]["rate_rest"] is None
    # zero conversions anywhere: C = 0 -> chi2 NULL
    none = _run(spark, users, [("D", 0), ("D", 1)], [])
    assert none["D"]["chi2"] is None


def test_multi_exposure_collapses_to_users(spark):
    users = range(4)
    # user 0 clicks campaign E five times: still one exposed user
    exposures = [("E", 0)] * 5 + [("E", 1)]
    by = _run(spark, users, exposures, [0])
    assert by["E"]["exposed"] == 2 and by["E"]["converted_exposed"] == 1
