"""Count-min sketch (operators/cms.py): the one-sided error contract
(never undercounts), the epsilon*N accuracy bound, mergeability, and
the broadcast-probe plan shape shared with the Bloom filter."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from bigdata_commerce_spark.operators import cms

SCHEMA = StructType([StructField("k", LongType(), True)])


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], SCHEMA)


def _zipf_values(n=5000, n_keys=200, seed=11):
    rng = random.Random(seed)
    # skewed multiset: key i drawn with weight 1/(i+1)
    weights = [1.0 / (i + 1) for i in range(n_keys)]
    return rng.choices(range(n_keys), weights=weights, k=n)


def test_params_sizing():
    w, d = cms.cms_params(0.01, 0.01)
    assert w >= 271 and 4 <= d <= 6
    w2, _ = cms.cms_params(0.001, 0.01)
    assert w2 > w


def test_never_undercounts_and_bound(spark):
    values = _zipf_values()
    n = len(values)
    width, depth = cms.cms_params(epsilon=0.005, delta=0.01)
    df = _df(spark, values)
    sk = cms.cms_build(df, "k", width, depth)
    exact = {r.k: r.c for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    keys = _df(spark, sorted(exact))
    est = {
        r.k: r.est_count
        for r in cms.cms_lookup(keys, "k", sk, width, depth).collect()
    }
    overs = [est[k] - exact[k] for k in exact]
    assert all(o >= 0 for o in overs)  # one-sided error
    # eps*N additive bound (holds w.p. 1-delta per key; allow the
    # worst key 3x headroom against seed luck)
    assert max(overs) <= 3 * 0.005 * n


def test_absent_and_null_keys(spark):
    width, depth = 1024, 4
    sk = cms.cms_build(_df(spark, list(range(100))), "k", width, depth)
    got = {
        r.k: r.est_count
        for r in cms.cms_lookup(
            _df(spark, [10_000, None]), "k", sk, width, depth
        ).collect()
    }
    assert got[10_000] >= 0  # may be a small false count, never negative
    assert got[None] is None  # NULL key -> NULL estimate
    # NULL keys are not counted at build either
    sk2 = cms.cms_build(_df(spark, [None, None]), "k", width, depth)
    assert sk2.count() == 0


def test_merge_equals_build_of_concat(spark):
    a = _zipf_values(n=1000, seed=1)
    b = _zipf_values(n=1500, seed=2)
    width, depth = 512, 5
    merged = cms.cms_merge(
        cms.cms_build(_df(spark, a), "k", width, depth),
        cms.cms_build(_df(spark, b), "k", width, depth),
    )
    whole = cms.cms_build(_df(spark, a + b), "k", width, depth)
    rows = lambda df: sorted((r.row, r.col, r.cnt) for r in df.collect())
    assert rows(merged) == rows(whole)


def test_weighted_build(spark):
    df = spark.createDataFrame([(1, 10), (1, 5), (2, 7)], "k long, w long")
    width, depth = 256, 4
    sk = cms.cms_build(df, "k", width, depth, weight_col="w")
    est = {
        r.k: r.est_count
        for r in cms.cms_lookup(_df(spark, [1, 2]), "k", sk, width, depth).collect()
    }
    assert est[1] >= 15 and est[2] >= 7


def test_probe_side_never_shuffles(spark):
    width, depth = 1024, 4
    sk = cms.cms_build(_df(spark, list(range(500))), "k", width, depth)
    probed = cms.cms_lookup(_df(spark, list(range(500))), "k", sk, width, depth)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            # only the build aggregate's exchange is allowed — grouped
            # on (row, col), which the planner may show under internal
            # _groupingexpression aliases; the probe key never
            # partitions anything
            assert ("row" in line and "col" in line) or (
                "_groupingexpression" in line
            ), line
            assert "k#" not in line, line
