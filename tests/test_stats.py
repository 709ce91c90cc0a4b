"""Sufficient-statistics operators (operators/stats.py). Oracle-grade
checks run through the twin registry; these pin known closed-form
values, pairwise-NULL semantics, degenerate inputs, and the
one-scan plan shape."""

from __future__ import annotations

from pyspark.sql import Row

from bigdata_commerce_spark.operators.stats import corr_matrix, trend_per_key


def _by_pair(df):
    return {(r.col_x, r.col_y): r for r in df.collect()}


def test_corr_known_values_and_pair_order(spark):
    rows = [Row(a=float(i), b=2.0 * i + 1.0, c=float(-i)) for i in range(1, 11)]
    out = _by_pair(corr_matrix(spark.createDataFrame(rows), ["a", "b", "c"]))
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")].corr == 1.0  # exact linear
    assert out[("a", "c")].corr == -1.0
    assert out[("b", "c")].corr == -1.0
    assert out[("a", "b")].n_pairs == 10


def test_corr_pairwise_nulls_and_zero_variance(spark):
    rows = [
        Row(a=1.0, b=1.0, c=5.0),
        Row(a=2.0, b=None, c=5.0),
        Row(a=3.0, b=3.0, c=5.0),
        Row(a=None, b=4.0, c=5.0),
    ]
    out = _by_pair(corr_matrix(spark.createDataFrame(rows), ["a", "b", "c"]))
    # complete observations per pair, not listwise deletion
    assert out[("a", "b")].n_pairs == 2
    assert out[("a", "c")].n_pairs == 3
    assert out[("a", "b")].corr == 1.0
    assert out[("a", "c")].corr is None  # constant side: undefined


def test_corr_matrix_is_one_aggregate_one_scan(spark):
    rows = [Row(a=float(i), b=float(i * i), c=1.0) for i in range(20)]
    df = corr_matrix(spark.createDataFrame(rows), ["a", "b", "c"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every pair's sums ride one aggregate over one source scan
    assert plan.count("Scan ExistingRDD") == 1
    assert "Join" not in plan


def test_trend_known_fit_and_degenerates(spark):
    rows = (
        [Row(k=1, t=float(t), v=3.0 * t + 7.0) for t in range(5)]
        + [Row(k=2, t=5.0, v=1.0), Row(k=2, t=5.0, v=9.0)]  # constant t
        + [Row(k=3, t=1.0, v=4.0)]  # single point
        + [Row(k=4, t=float(t), v=5.0) for t in range(4)]  # flat line
    )
    out = {r.k: r for r in trend_per_key(
        spark.createDataFrame(rows), "k", "t", "v"
    ).collect()}
    assert (out[1].slope, out[1].intercept, out[1].r2) == (3.0, 7.0, 1.0)
    assert out[2].slope is None and out[2].n_points == 2  # exact guard
    assert out[3].slope is None
    # flat line: slope 0, r2 undefined (zero value variance)
    assert out[4].slope == 0.0 and out[4].intercept == 5.0
    assert out[4].r2 is None


def test_trend_state_is_incrementally_maintainable(spark):
    # The sufficient-sums state refreshes from deltas through
    # incremental_agg.merge_partials and finalizes to the EXACT batch
    # fit — decimal sums are order/partitioning-independent, so the
    # maintained and recomputed trends are bit-identical, and the
    # min/max t-range guard (unlike COUNT(DISTINCT)) merges
    # losslessly across deltas.
    from pyspark.sql import Row

    from bigdata_commerce_spark.operators.incremental_agg import merge_partials
    from bigdata_commerce_spark.operators.stats import (
        TREND_STATE_MEASURES,
        trend_from_sums,
        trend_per_key,
        trend_sums,
    )

    rows = [
        Row(k=k, t=t, v=round(0.7 * t + k + 0.1 * ((t * 7 + k) % 5), 2))
        for k in range(1, 6)
        for t in range(12)
    ] + [Row(k=9, t=3, v=1.5), Row(k=9, t=3, v=2.5)]  # constant-t key
    df = spark.createDataFrame(rows, "k int, t long, v double")

    # three refresh cycles over disjoint deltas, in a scrambled order
    deltas = [df.where("t % 3 = " + str(i)) for i in (2, 0, 1)]
    state = trend_sums(deltas[0], "k", "t", "v")
    for d in deltas[1:]:
        state = merge_partials(
            state, trend_sums(d, "k", "t", "v"), ["k"], TREND_STATE_MEASURES
        )
    maintained = {r.k: r for r in trend_from_sums(state, "k").collect()}
    batch = {r.k: r for r in trend_per_key(df, "k", "t", "v").collect()}
    assert set(maintained) == set(batch)
    for k in batch:
        assert maintained[k] == batch[k]  # exact, not approximate
    assert batch[9].slope is None  # constant-t guard survives the merge


def test_corr_state_is_incrementally_maintainable(spark):
    # Same self-maintainability contract as the trend state: three
    # delta refreshes through merge_partials (ungrouped: keys=[])
    # finalize to the exact batch correlation matrix.
    from pyspark.sql import Row

    from bigdata_commerce_spark.operators.incremental_agg import merge_partials
    from bigdata_commerce_spark.operators.stats import (
        corr_from_sums,
        corr_matrix,
        corr_state_measures,
        corr_sums,
    )

    cols = ["a", "b", "c"]
    rows = [
        Row(i=i, a=float(i), b=round(0.5 * i + 0.01 * ((i * 13) % 7), 2),
            c=float((i * 31) % 11))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows)
    deltas = [df.where("i % 3 = " + str(i)).drop("i") for i in (1, 2, 0)]
    state = corr_sums(deltas[0], cols)
    for d in deltas[1:]:
        state = merge_partials(
            state, corr_sums(d, cols), [], corr_state_measures(cols)
        )
    maintained = sorted(map(tuple, corr_from_sums(state, cols).collect()))
    batch = sorted(map(tuple, corr_matrix(df.drop("i"), cols).collect()))
    assert maintained == batch  # exact, not approximate
