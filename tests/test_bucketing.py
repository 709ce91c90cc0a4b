"""Bucketed co-located joins: the plan-level proof that bucketing
moves the join shuffle to write time."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_commerce_spark.sources.bucketing import cobucket_tables
from bigdata_commerce_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def _executed_plan(df) -> str:
    df.collect()  # materialize so AQE finalizes the plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark):
    """orders x lineitem on orderkey: with both sides bucketed on the
    key, the sort-merge join must run with ZERO shuffle exchanges
    (broadcast disabled so the test can't pass vacuously); the same
    join unbucketed must show exchanges — proving the bucketing, not
    the data size, removed them."""
    orders = load_table(spark, "orders", SF_SMOKE).select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, "lineitem", SF_SMOKE).select(
        "l_orderkey", "l_quantity"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = cobucket_tables(
            spark,
            {
                "b_orders": orders.withColumnRenamed("o_orderkey", "orderkey"),
                "b_lineitem": lineitem.withColumnRenamed("l_orderkey", "orderkey"),
            },
            ["orderkey"],
            num_buckets=8,
        )
        joined = t["b_orders"].join(t["b_lineitem"], "orderkey")
        plan = _executed_plan(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == lineitem.count()

        # Control: identical join without bucketing DOES shuffle.
        plain = orders.withColumnRenamed("o_orderkey", "orderkey").join(
            lineitem.withColumnRenamed("l_orderkey", "orderkey"), "orderkey"
        )
        assert "Exchange hashpartitioning" in _executed_plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_groupby_is_exchange_free(spark):
    """Aggregation on the bucket key reuses the bucket distribution —
    no exchange before the final agg."""
    lineitem = load_table(spark, "lineitem", SF_SMOKE).select(
        "l_orderkey", "l_quantity"
    )
    try:
        cobucket_tables(
            spark,
            {"b_li_agg": lineitem.withColumnRenamed("l_orderkey", "orderkey")},
            ["orderkey"],
            num_buckets=8,
        )
        agg = (
            spark.table("b_li_agg")
            .groupBy("orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        assert "Exchange hashpartitioning" not in _executed_plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")
