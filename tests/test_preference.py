"""Preference-pair mining: pairing algebra, margin gate, overlap
exclusion, determinism, and the WindowGroupLimit plan shape."""

from __future__ import annotations

from bigdata_commerce_spark.operators.preference import preference_pairs


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "g string, id long, s double")
    out = preference_pairs(
        df, group_cols=["g"], score_col="s", id_col="id", **kw
    )
    return sorted(
        (r["g"], r["pair_rank"], r["chosen_id"], r["rejected_id"], r["gap"])
        for r in out.collect()
    )


def test_best_pairs_worst_no_overlap(spark):
    rows = [("a", i, s) for i, s in [(1, 0.9), (2, 0.8), (3, 0.5), (4, 0.2), (5, 0.1)]]
    # odd group of 5: (1st, 5th) and (2nd, 4th); the middle row cannot
    # pair with itself (2*3 > 5)
    assert _pairs(spark, rows) == [
        ("a", 1, 1, 5, 0.8),
        ("a", 2, 2, 4, 0.6),
    ]


def test_margin_gates_near_ties(spark):
    rows = [("a", i, s) for i, s in [(1, 0.9), (2, 0.8), (3, 0.5), (4, 0.2), (5, 0.1)]]
    assert [p[1] for p in _pairs(spark, rows, margin=0.7)] == [1]
    # equal scores: gap 0 survives margin 0, dies at any positive margin
    ties = [("t", 1, 0.5), ("t", 2, 0.5)]
    assert _pairs(spark, ties) == [("t", 1, 1, 2, 0.0)]
    assert _pairs(spark, ties, margin=0.01) == []


def test_small_groups_and_max_pairs(spark):
    assert _pairs(spark, [("solo", 1, 0.9)]) == []
    rows = [("b", i, 1.0 - i / 10.0) for i in range(1, 9)]
    # 8 rows, max_pairs=2 -> only ranks 1 and 2
    assert [p[1] for p in _pairs(spark, rows, max_pairs=2)] == [1, 2]


def test_groups_do_not_mix(spark):
    rows = [("a", 1, 0.9), ("a", 2, 0.1), ("b", 3, 0.8), ("b", 4, 0.2)]
    got = _pairs(spark, rows)
    assert got == [("a", 1, 1, 2, 0.8), ("b", 1, 3, 4, 0.6)]


def test_null_scores_excluded(spark):
    rows = [("a", 1, 0.9), ("a", 2, None), ("a", 3, 0.1)]
    # null row drops -> group of 2 -> one pair (1, 3)
    assert _pairs(spark, rows) == [("a", 1, 1, 3, 0.8)]


def test_window_group_limit_in_plan(spark):
    df = spark.createDataFrame(
        [("a", i, i / 10.0) for i in range(10)], "g string, id long, s double"
    )
    out = preference_pairs(df, ["g"], "s", "id", max_pairs=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
