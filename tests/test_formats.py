"""JSONL/CSV boundary formats: lossless round-trips under explicit
schemas (documents corpus in, exports out)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_commerce_spark.sources import formats
from bigdata_commerce_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def test_jsonl_roundtrip_documents(spark, tmp_path):
    docs = load_table(spark, "documents", SF_SMOKE).select("doc_id", "text")
    path = str(tmp_path / "docs_jsonl")
    formats.write_jsonl(docs, path)
    back = formats.read_jsonl(spark, path, formats.DOCUMENTS_SCHEMA)
    assert back.schema == docs.schema
    a = {(r.doc_id, r.text) for r in docs.collect()}
    b = {(r.doc_id, r.text) for r in back.collect()}
    assert a == b
    # sharded write: parallelism preserved, no single-file bottleneck
    import glob

    assert len(glob.glob(f"{path}/part-*")) == docs.rdd.getNumPartitions()


def test_csv_roundtrip_scalars(spark, tmp_path):
    li = (
        load_table(spark, "lineitem", SF_SMOKE)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .limit(500)
    )
    path = str(tmp_path / "li_csv")
    formats.write_csv(li, path)
    back = formats.read_csv(spark, path, li.schema)
    assert back.schema == li.schema
    assert back.count() == 500
    assert (
        back.agg(F.sum("l_quantity")).collect()[0][0]
        == li.agg(F.sum("l_quantity")).collect()[0][0]
    )


def test_orc_round_trip(spark, tmp_path):
    """ORC write/read preserves rows and types exactly."""
    from bigdata_commerce_spark.sources.formats import read_orc, write_orc

    docs = load_table(spark, "documents", SF_SMOKE).select("doc_id", "text", "lang")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path, docs.schema)
    assert back.schema == docs.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_compaction_reduces_file_count_preserves_rows(spark, tmp_path):
    """50 tiny shards compact to few near-target files with identical
    content; file count derives from listing bytes, not a data scan."""
    import glob

    from bigdata_commerce_spark.sources import compaction

    docs = load_table(spark, "documents", SF_SMOKE).select("doc_id", "text")
    frag = str(tmp_path / "fragmented")
    docs.repartition(50).write.parquet(frag)
    n_in = len(glob.glob(f"{frag}/part-*.parquet"))
    assert n_in == 50

    out = str(tmp_path / "compacted")
    total = compaction.directory_bytes(spark, frag)
    # target sized to ask for ~4 output files
    back = compaction.compact(spark, frag, out, target_file_bytes=total // 4 + 1)
    n_out = len(glob.glob(f"{out}/part-*.parquet"))
    assert n_out == 4, n_out
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_compaction_rejects_overlapping_paths(spark, tmp_path):
    """In-place / nested compaction must refuse: overwrite would
    truncate the lazily-read source."""
    import pytest as _pytest

    from bigdata_commerce_spark.sources import compaction

    docs = load_table(spark, "documents", SF_SMOKE).select("doc_id")
    base = str(tmp_path / "src")
    docs.limit(10).write.parquet(base)
    for out in (base, base + "/", base + "/nested", str(tmp_path)):
        with _pytest.raises(ValueError, match="overlaps"):
            compaction.compact(spark, base, out)


def test_mixed_schema_directory_reads_with_mergeschema(spark, tmp_path):
    """Schema evolution at the ingest boundary: files written before a
    column existed read back NULL-filled when the directory is loaded
    with mergeSchema — no rewrite of old files."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        path + "/batch=0"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(path + "/batch=1")
    df = spark.read.option("mergeSchema", True).parquet(path)
    assert set(df.columns) == {"id", "name", "score", "batch"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_conform_schema_lenient_and_strict(spark):
    """Missing columns -> typed NULLs; present columns try_cast (bad
    values NULL, not an ANSI crash); extras dropped or rejected;
    output order is the target's."""
    import pytest as _pytest
    from pyspark.sql import types as T

    from bigdata_commerce_spark.sources.formats import conform_schema

    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("note", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [("1", "2.5", "x"), ("2", "oops", "y"), ("bad", "3.0", "z")],
        "id string, price string, extra string",
    )
    out = conform_schema(df, target)
    assert out.columns == ["id", "price", "note"]
    assert [f.dataType for f in out.schema.fields] == [
        T.LongType(), T.DoubleType(), T.StringType()
    ]
    rows = sorted(out.collect(), key=lambda r: (r.id is None, r.id))
    assert [(r.id, r.price, r.note) for r in rows] == [
        (1, 2.5, None),       # note missing -> NULL
        (2, None, None),      # 'oops' -> NULL under try_cast
        (None, 3.0, None),    # 'bad' id -> NULL
    ]
    with _pytest.raises(ValueError, match="extra"):
        conform_schema(df, target, strict=True)


def test_conform_schema_is_shuffle_free(spark):
    from pyspark.sql import types as T

    from bigdata_commerce_spark.sources.formats import conform_schema

    target = T.StructType([T.StructField("id", T.LongType())])
    df = spark.range(100).selectExpr("CAST(id AS STRING) AS id")
    out = conform_schema(df, target)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
