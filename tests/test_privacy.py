"""k-anonymity report: hand-computed class stats, risky thresholds,
show_n cap, and the TakeOrderedAndProject plan shape."""

from __future__ import annotations

from bigdata_commerce_spark.operators.privacy import kanonymity_report


def _report(spark, rows, **kw):
    df = spark.createDataFrame(rows, "zip string, age long")
    out = kanonymity_report(df, ["zip", "age"], **kw)
    return [r.asDict() for r in out.orderBy("class_rank").collect()]


def test_hand_computed_classes(spark):
    rows = (
        [("94110", 30)] * 6  # class of 6: safe at k=5
        + [("94110", 31)] * 2  # class of 2: risky
        + [("10001", 30)] * 1  # class of 1: risky, the achieved k
    )
    got = _report(spark, rows, k=5)
    assert len(got) == 3
    top = got[0]
    assert (top["zip"], top["age"], top["class_size"]) == ("10001", 30, 1)
    assert top["k_anonymity"] == 1
    assert top["n_rows"] == 9 and top["n_classes"] == 3
    assert top["n_risky_classes"] == 2 and top["n_risky_rows"] == 3
    # ranks ascend by size then QI values
    assert [r["class_size"] for r in got] == [1, 2, 6]


def test_all_safe_dataset(spark):
    rows = [("a", 1)] * 5 + [("b", 2)] * 7
    got = _report(spark, rows, k=5)
    assert got[0]["n_risky_classes"] == 0 and got[0]["n_risky_rows"] == 0
    assert got[0]["k_anonymity"] == 5


def test_show_n_caps_output(spark):
    rows = [(f"z{i}", i) for i in range(30)]  # 30 singleton classes
    got = _report(spark, rows, k=2, show_n=10)
    assert len(got) == 10
    assert got[0]["n_risky_classes"] == 30


def test_empty_input(spark):
    df = spark.createDataFrame([], "zip string, age long")
    assert kanonymity_report(df, ["zip", "age"]).count() == 0


def test_take_ordered_plan(spark):
    df = spark.createDataFrame(
        [(f"z{i}", i) for i in range(100)], "zip string, age long"
    )
    out = kanonymity_report(df, ["zip", "age"], show_n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
