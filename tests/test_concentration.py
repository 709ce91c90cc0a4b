"""Concentration report: hand-computed Gini/HHI, bucket-width
invariance (the two-level prefix-sum kernel), and edge cases."""

from __future__ import annotations

from bigdata_commerce_spark.operators.concentration import (
    concentration_report,
)


def _report(spark, rows, **kw):
    df = spark.createDataFrame(rows, "k string, m long")
    out = concentration_report(df, "k", "m", **kw)
    return {r["k"]: r.asDict() for r in out.collect()}


def test_hand_computed_gini_hhi(spark):
    # masses 1, 2, 7: asc ranks 1,2,3 -> S1 = 1 + 4 + 21 = 26, T = 10,
    # n = 3 -> gini = (2*26 - 4*10) / (3*10) = 0.4;
    # hhi = 0.01 + 0.04 + 0.49 = 0.54; top1 = 0.7.
    by = _report(spark, [("a", 1), ("b", 2), ("c", 7)])
    assert by["c"]["mass_rank"] == 1
    assert by["c"]["share"] == 0.7
    assert by["a"]["gini"] == 0.4
    assert by["a"]["hhi"] == 0.54
    assert by["a"]["top1_share"] == 0.7
    # n < top_n: topn_share reads the rank-min(5, n) row = full mass
    assert by["b"]["topn_share"] == 1.0
    # Lorenz largest-first: cum through rank 2 = (7 + 2) / 10
    assert by["b"]["cum_share"] == 0.9


def test_equal_masses_gini_zero(spark):
    by = _report(spark, [("a", 5), ("b", 5), ("c", 5), ("d", 5)])
    assert by["a"]["gini"] == 0.0
    assert by["a"]["hhi"] == 0.25
    assert all(v["share"] == 0.25 for v in by.values())


def test_bucket_width_invariance(spark):
    # bucket_width=1 forces one bucket per distinct mass (multi-bucket
    # prefix-sum path); results must be identical to the single-bucket
    # default — the kernel is an execution strategy, not a semantic.
    rows = [(f"k{i}", (i * 37) % 11 + 1) for i in range(40)]
    wide = _report(spark, rows)
    narrow = _report(spark, rows, bucket_width=1)
    assert wide == narrow


def test_ties_rank_deterministically(spark):
    by = _report(spark, [("b", 3), ("a", 3), ("c", 4)])
    # same mass: key ascending breaks the tie (a before b ascending,
    # so b outranks a in the descending report)
    assert by["c"]["mass_rank"] == 1
    assert by["b"]["mass_rank"] == 2
    assert by["a"]["mass_rank"] == 3


def test_null_keys_excluded_and_empty(spark):
    df = spark.createDataFrame([(None, 5), ("a", 5)], "k string, m long")
    out = concentration_report(df, "k", "m").collect()
    assert [r["k"] for r in out] == ["a"]
    assert out[0]["share"] == 1.0
    empty = spark.createDataFrame([], "k string, m long")
    assert concentration_report(empty, "k", "m").count() == 0
