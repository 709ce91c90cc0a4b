"""Incremental aggregate maintenance (operators/incremental_agg.py):
self-maintainability (refresh == full recompute), merge associativity
and commutativity, derived-measure finalization, contract errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_commerce_spark.operators import incremental_agg as ia
from tests.conftest import SF_SMOKE

KEYS = ["event_date", "event_type"]
MEASURES: ia.MeasureSpec = {
    "n_events": ("count", None),
    "value_sum": ("sum", "value_dec"),
    "value_min": ("min", "value"),
    "value_max": ("max", "value"),
}


def _base(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .withColumn("event_date", F.to_date("ts"))
        .withColumn("value_dec", F.col("value").cast("decimal(30,8)"))
    )


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_refresh_equals_full_recompute(spark):
    base = _base(spark)
    full = ia.partial_agg(base, KEYS, MEASURES)
    cut = F.col("user_id") % 3 == 0  # non-temporal split: any delta works
    existing = ia.partial_agg(base.where(~cut), KEYS, MEASURES)
    refreshed = ia.refresh_with_delta(existing, base.where(cut), KEYS, MEASURES)
    assert _rows(refreshed) == _rows(full)


def test_merge_is_associative_and_commutative(spark):
    base = _base(spark)
    parts = [
        ia.partial_agg(base.where(F.col("user_id") % 3 == i), KEYS, MEASURES)
        for i in range(3)
    ]
    ab_c = ia.merge_partials(
        ia.merge_partials(parts[0], parts[1], KEYS, MEASURES), parts[2], KEYS, MEASURES
    )
    c_ba = ia.merge_partials(
        parts[2], ia.merge_partials(parts[1], parts[0], KEYS, MEASURES), KEYS, MEASURES
    )
    assert _rows(ab_c) == _rows(c_ba)


def test_finalize_avg_is_view_over_partials(spark):
    base = _base(spark)
    agg = ia.partial_agg(base, KEYS, MEASURES)
    out = ia.finalize(
        agg,
        {
            "value_avg": F.round(
                F.col("value_sum").cast("double") / F.col("n_events"), 6
            )
        },
    )
    row = out.orderBy("event_date", "event_type").first()
    assert row.value_avg == pytest.approx(
        float(row.value_sum) / row.n_events, rel=1e-9
    )


def test_new_keys_in_delta_appear(spark):
    ex = spark.createDataFrame([("a", 2, 5)], "k string, n long, s long")
    delta = spark.createDataFrame([("b", 1.0)], "k string, v double")
    m: ia.MeasureSpec = {"n": ("count", None), "s": ("sum", "v")}
    got = {r.k: r for r in ia.refresh_with_delta(ex, delta, ["k"], m).collect()}
    assert got["a"].n == 2 and got["b"].n == 1


def test_contract_errors(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="at least one"):
        ia.partial_agg(df, ["a"], {})
    with pytest.raises(ValueError, match="unsupported measure kind"):
        ia.partial_agg(df, ["a"], {"x": ("median", "a")})
    with pytest.raises(ValueError, match="count takes no column"):
        ia.partial_agg(df, ["a"], {"x": ("count", "a")})
