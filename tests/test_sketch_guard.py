"""exact_group_percentiles scale guard (VERDICT r12 item 7): the
exact `percentile` aggregate buffers each group's values on one
reducer, so the operator carries a loud group-size bound. These tests
pin the contract: results byte-identical to the bare aggregate when
groups are under the bound, a clear error (naming the knob) past it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_commerce_spark.operators.sketch import exact_group_percentiles


def _sample(spark):
    return spark.range(1000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * 37 % 997).cast("double").alias("v"),
    )


def test_guarded_matches_bare_aggregate(spark):
    df = _sample(spark)
    guarded = exact_group_percentiles(
        df, "v", {"p50": 0.5, "p90": 0.9}, ["g"], max_group_rows=100_000
    )
    bare = df.groupBy("g").agg(
        F.round(F.expr("percentile(v, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(v, 0.9)"), 6).alias("p90"),
    )
    assert guarded.columns == bare.columns
    assert guarded.exceptAll(bare).count() == 0
    assert bare.exceptAll(guarded).count() == 0


def test_unguarded_path_is_the_bare_aggregate(spark):
    df = _sample(spark)
    out = exact_group_percentiles(
        df, "v", {"p50": 0.5}, ["g"], max_group_rows=None
    )
    assert out.columns == ["g", "p50"]
    assert out.count() == 4


def test_oversized_group_fails_loudly(spark):
    df = _sample(spark)
    guarded = exact_group_percentiles(
        df, "v", {"p50": 0.5}, ["g"], max_group_rows=10
    )
    with pytest.raises(Exception, match="max_group_rows"):
        guarded.collect()
