"""Bounded persist registry (operators/cache_util) — the release
path for operators whose lazy outputs cannot unpersist their own
cached inputs (ADVICE r11 item 1 / VERDICT r11 hygiene finding).

Round-12 optimization round also made the registry plan-identity
aware: two operators persisting the SAME subtree (the minhash-LSH /
n-gram-Jaccard dedup paths share one shingle frame) hold one cache
entry, so a duplicate registration must refresh recency instead of
appending — otherwise evicting the stale handle unpersists the cache
the newer consumer still rides.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_commerce_spark.operators import cache_util
from bigdata_commerce_spark.operators.cache_util import (
    PERSIST_BOUND,
    persist_bounded,
)


@pytest.fixture(autouse=True)
def _clean_registry():
    prev = list(cache_util._PERSISTED_INPUTS)
    cache_util._PERSISTED_INPUTS.clear()
    yield
    for df in cache_util._PERSISTED_INPUTS:
        try:
            df.unpersist()
        except Exception:
            pass
    cache_util._PERSISTED_INPUTS.clear()
    cache_util._PERSISTED_INPUTS.extend(prev)


def test_registry_stays_bounded(spark):
    frames = [
        persist_bounded(spark.range(100 + i).select(F.col("id") + i))
        for i in range(PERSIST_BOUND + 3)
    ]
    assert len(cache_util._PERSISTED_INPUTS) == PERSIST_BOUND
    # evicted frames are no longer cached; survivors are
    assert not frames[0].storageLevel.useMemory
    assert frames[-1].storageLevel.useMemory


def test_plan_identical_registration_refreshes_instead_of_duplicating(spark):
    def shingle_like():
        return spark.range(50).select((F.col("id") * 2).alias("v"))

    a = persist_bounded(shingle_like())
    a.count()  # materialize the shared cache
    # a second operator persists the SAME plan: must not append
    b = persist_bounded(shingle_like())
    assert len(cache_util._PERSISTED_INPUTS) == 1
    # pushing PERSIST_BOUND-1 distinct frames must NOT evict the
    # refreshed shared entry (it is the most recent)
    for i in range(PERSIST_BOUND - 1):
        persist_bounded(spark.range(10 + i).select(F.col("id") - i))
    assert b.storageLevel.useMemory
    assert a.storageLevel.useMemory  # same cache entry


def test_rollup_ladder_persist_matches_unpersisted(spark):
    from bigdata_commerce_spark.operators.rollup_hierarchy import rollup_ladder

    ev = spark.range(500).select(
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=(F.col("id") * 37) % 7200)).alias("ts"),
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 11).alias("v"),
    )
    plain = rollup_ladder(ev, ts_col="ts", key_cols=["k"], value_col="v")
    cached = rollup_ladder(ev, ts_col="ts", key_cols=["k"], value_col="v", persist=True)
    for lvl in ("minute", "hour", "day"):
        a, b = plain[lvl], cached[lvl]
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
