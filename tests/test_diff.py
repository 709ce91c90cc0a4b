"""Keyed snapshot diff / apply-changes (operators/diff.py).

The oracle-hash check for the twin query lives in
test_twin_queries.py; these tests pin the operator contract on
crafted frames: change classification, null-safe semantics (both in
keys and in compared values), passthrough columns, multi-column
keys, and the round-trip law apply_changes(old, diff) == new.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_commerce_spark.operators.diff import apply_changes, table_diff


def _rows(df, *cols):
    cols = cols or tuple(sorted(df.columns))
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_classifies_insert_update_delete_unchanged(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, s string, v double"
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)], "id long, s string, v double"
    )
    got = _rows(
        table_diff(old, new, keys=["id"]), "id", "change_type", "old_s", "new_s"
    )
    assert got == [
        (2, "update", "b", "B"),
        (3, "delete", "c", None),
        (4, "insert", None, "d"),
    ]


def test_null_values_compare_null_safely(spark):
    # NULL -> NULL is unchanged; NULL -> value and value -> NULL are updates.
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id long, s string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, "y"), (3, None)], "id long, s string"
    )
    got = _rows(table_diff(old, new, keys=["id"]), "id", "change_type")
    assert got == [(2, "update"), (3, "update")]


def test_null_keys_match_null_safely(spark):
    # A NULL-keyed row present in both versions is the same entity
    # (unchanged here), not an insert+delete pair.
    old = spark.createDataFrame([(None, 1.0), (1, 2.0)], "id long, v double")
    new = spark.createDataFrame([(None, 1.0), (1, 3.0)], "id long, v double")
    got = _rows(table_diff(old, new, keys=["id"]), "id", "change_type")
    assert got == [(1, "update")]


def test_multi_column_key_and_subset_compare(spark):
    old = spark.createDataFrame(
        [(1, "x", 5.0, "keepA"), (1, "y", 6.0, "keepB")],
        "k1 long, k2 string, v double, other string",
    )
    new = spark.createDataFrame(
        [(1, "x", 5.0, "CHANGED"), (1, "y", 7.0, "keepB")],
        "k1 long, k2 string, v double, other string",
    )
    # Only v is audited: the `other` churn on (1, x) is invisible.
    got = _rows(
        table_diff(old, new, keys=["k1", "k2"], compare_cols=["v"]),
        "k1",
        "k2",
        "change_type",
        "old_v",
        "new_v",
    )
    assert got == [(1, "y", "update", 6.0, 7.0)]


def test_apply_changes_round_trip(spark):
    # apply_changes(old, table_diff(old, new)) == new, including a
    # NULL-keyed row and NULL value transitions.
    old = spark.createDataFrame(
        [(None, "n", 0.0), (1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(None, "n2", 0.0), (1, "a", 10.0), (3, "c", None), (4, "d", 40.0)],
        "id long, s string, v double",
    )
    feed = table_diff(old, new, keys=["id"])
    rebuilt = apply_changes(old, feed, keys=["id"])
    assert sorted(rebuilt.columns) == sorted(new.columns)
    assert _rows(rebuilt) == _rows(new)


def test_apply_changes_passthrough_columns_survive(spark):
    # Columns outside keys+compare_cols keep their base values on
    # surviving rows and are NULL on inserted rows. compare_cols is
    # NOT restated: apply_changes infers it from the feed's new_*
    # columns, so a narrow feed applies to a wider base as-is.
    base = spark.createDataFrame(
        [(1, 10.0, "p1"), (2, 20.0, "p2")], "id long, v double, extra string"
    )
    old = base.select("id", "v")
    new = spark.createDataFrame([(1, 11.0), (3, 30.0)], "id long, v double")
    feed = table_diff(old, new, keys=["id"])
    out = apply_changes(base, feed, keys=["id"])
    assert _rows(out, "id", "v", "extra") == [
        (1, 11.0, "p1"),
        (3, 30.0, None),
    ]


def test_diff_of_identical_frames_is_empty(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, s string")
    assert table_diff(df, df, keys=["id"]).count() == 0


def test_diff_join_is_single_shuffle_equi_join(spark):
    """The null-safe key condition must still plan as a hash-partition
    equi-join (SortMergeJoin/ShuffledHashJoin), not a nested loop."""
    old = spark.range(100).withColumn("v", F.col("id") * 2.0)
    new = spark.range(50, 150).withColumn("v", F.col("id") * 2.0)
    plan = (
        table_diff(old, new, keys=["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_diff_snapshots_round_trip(spark, tmp_path):
    """publish v1, publish v2, diff the store's two versions, apply
    the feed onto v1 → v2 exactly; explicit-version and
    default-latest forms agree; a single-version store refuses."""
    import pytest

    from bigdata_commerce_spark.operators.diff import diff_snapshots
    from bigdata_commerce_spark.sources.snapshot import (
        publish_snapshot,
        read_snapshot,
    )

    d = str(tmp_path / "tbl")
    v1_df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id long, s string, v double"
    )
    v1 = publish_snapshot(v1_df, d)
    with pytest.raises(ValueError):
        diff_snapshots(spark, d, keys=["id"])
    v2_df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0)], "id long, s string, v double"
    )
    v2 = publish_snapshot(v2_df, d)

    feed = diff_snapshots(spark, d, keys=["id"])
    explicit = diff_snapshots(spark, d, keys=["id"], v_from=v1, v_to=v2)
    assert _rows(feed) == _rows(explicit)
    assert _rows(feed, "id", "change_type") == [
        (2, "update"),
        (3, "delete"),
        (4, "insert"),
    ]
    rebuilt = apply_changes(read_snapshot(spark, d, v1), feed, keys=["id"])
    assert _rows(rebuilt) == _rows(v2_df)


def test_schema_diff_reports_evolution(spark):
    from bigdata_commerce_spark.operators.diff import schema_diff

    old = spark.createDataFrame([], "id long, v double, gone string")
    new = spark.createDataFrame([], "id long, v decimal(10,2), fresh string")
    got = _rows(schema_diff(old, new), "column", "change", "old_type", "new_type")
    assert got == [
        ("fresh", "added", None, "string"),
        ("gone", "removed", "string", None),
        ("v", "type_changed", "double", "decimal(10,2)"),
    ]
    # order-only difference is NOT evolution
    reordered = spark.createDataFrame([], "v double, id long, gone string")
    assert schema_diff(old, reordered).count() == 0


def test_diff_snapshots_empty_store_raises_clearly(spark, tmp_path):
    import pytest

    from bigdata_commerce_spark.operators.diff import diff_snapshots

    with pytest.raises(FileNotFoundError, match="no committed snapshot"):
        diff_snapshots(spark, str(tmp_path / "never_published"), keys=["id"])


def test_cdc_feed_drives_incremental_aggregate_refresh(spark, tmp_path):
    """The composition the diff docstring advertises: an append-only
    snapshot evolution's CDC feed, filtered to inserts and projected
    back to base-row shape, drives incremental_agg.refresh_with_delta
    to the same aggregate a full recompute of v2 gives. (Updates/
    deletes need subtractable measures or a recompute — append-only
    is the contract refresh_with_delta documents.)"""
    from pyspark.sql import functions as F

    from bigdata_commerce_spark.operators.diff import diff_snapshots
    from bigdata_commerce_spark.operators.incremental_agg import (
        partial_agg,
        refresh_with_delta,
    )
    from bigdata_commerce_spark.sources.snapshot import publish_snapshot

    d = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, grp string, v double",
    )
    publish_snapshot(v1, d)
    v2 = v1.unionByName(
        spark.createDataFrame([(4, "a", 5.0), (5, "c", 7.0)], "id long, grp string, v double")
    )
    publish_snapshot(v2, d)

    measures = {"n": ("count", None), "total": ("sum", "v")}
    feed = diff_snapshots(spark, d, keys=["id"])
    assert {r["change_type"] for r in feed.collect()} == {"insert"}
    delta = feed.select(
        "id", F.col("new_grp").alias("grp"), F.col("new_v").alias("v")
    )
    refreshed = refresh_with_delta(
        partial_agg(v1, ["grp"], measures), delta, ["grp"], measures
    )
    full = partial_agg(v2, ["grp"], measures)
    assert _rows(refreshed) == _rows(full)
