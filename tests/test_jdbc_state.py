"""JDBC MERGE state backend against embedded Derby: the four DAO
merge algebras (reference ``JdbcHelper.scala:21-389``) applied as
stage + set-based MERGE, with epoch-ledger replay idempotency, and
parity with the parquet epoch sinks on identical batch sequences."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_commerce_spark.sources.sinks import derby_config
from bigdata_commerce_spark.streaming import sinks
from bigdata_commerce_spark.streaming.jdbc_state import JdbcStateBackend


def _backend(spark, tmp_path, name):
    return JdbcStateBackend(spark, derby_config(str(tmp_path / name)))


def _counts(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_accumulate_merge_and_replay(spark, tmp_path):
    be = _backend(spark, tmp_path, "acc")
    sink = be.accumulate_sink("t_acc", ["k"], "v")
    sink(_counts(spark, [("a", 1), ("a", 2), ("b", 5)]), 0)
    sink(_counts(spark, [("a", 10), ("c", 1)]), 1)
    # replayed epoch must be a no-op (ledger already has epoch 1)
    sink(_counts(spark, [("a", 10), ("c", 1)]), 1)
    got = {(r.k, r.v) for r in be.read_state("t_acc").collect()}
    assert got == {("a", 13), ("b", 5), ("c", 1)}


def test_distinct_append_never_duplicates(spark, tmp_path):
    be = _backend(spark, tmp_path, "dist")
    sink = be.distinct_append_sink("t_bl", ["k"])
    sink(_counts(spark, [("u1", 0), ("u1", 0), ("u2", 0)]), 0)
    sink(_counts(spark, [("u2", 0), ("u3", 0)]), 1)
    got = sorted(r.k for r in be.read_state("t_bl").collect())
    assert got == ["u1", "u2", "u3"]


def test_overwrite_updates_matched_keys(spark, tmp_path):
    be = _backend(spark, tmp_path, "ovw")
    sink = be.overwrite_sink("t_ovw", ["k"])
    sink(_counts(spark, [("a", 1), ("b", 2)]), 0)
    sink(_counts(spark, [("a", 99), ("c", 3)]), 1)
    got = {(r.k, r.v) for r in be.read_state("t_ovw").collect()}
    assert got == {("a", 99), ("b", 2), ("c", 3)}


def test_replace_partition_deletes_then_inserts(spark, tmp_path):
    be = _backend(spark, tmp_path, "rp")
    sink = be.replace_partition_sink("t_top3", ["p"])
    df0 = spark.createDataFrame(
        [("p1", "x", 1), ("p1", "y", 2), ("p2", "z", 3)], "p string, k string, v long"
    )
    sink(df0, 0)
    # p1's ranking changes entirely; p2 untouched
    df1 = spark.createDataFrame([("p1", "w", 9)], "p string, k string, v long")
    sink(df1, 1)
    got = {(r.p, r.k, r.v) for r in be.read_state("t_top3").collect()}
    assert got == {("p1", "w", 9), ("p2", "z", 3)}


def test_jdbc_matches_parquet_epoch_sinks(spark, tmp_path):
    """Same merge algebra behind both backends: an identical batch
    sequence through the parquet accumulate sink and the JDBC MERGE
    accumulate sink must land identical state."""
    be = _backend(spark, tmp_path, "parity")
    jdbc_sink = be.accumulate_sink("t_par", ["k"], "v")
    pq_sink = sinks.accumulate_sink(str(tmp_path / "pq_state"), ["k"], "v")
    batches = [
        _counts(spark, [("a", 1), ("b", 2), ("a", 3)]),
        _counts(spark, [("b", 1)]),
        _counts(spark, [("c", 7), ("a", 1)]),
    ]
    for e, b in enumerate(batches):
        jdbc_sink(b, e)
        pq_sink(b, e)
    got_jdbc = {(r.k, r.v) for r in be.read_state("t_par").collect()}
    got_pq = {
        (r.k, r.v) for r in sinks.read_state(spark, str(tmp_path / "pq_state")).collect()
    }
    assert got_jdbc == got_pq == {("a", 5), ("b", 3), ("c", 7)}
