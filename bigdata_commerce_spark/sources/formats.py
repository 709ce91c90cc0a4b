"""Interchange formats: JSONL (the LLM training-data lingua franca)
and CSV, with explicit-schema discipline.

Parquet is the internal format (typed, columnar, predicate pushdown);
these readers/writers exist for the pipeline boundary — corpora
arrive as JSONL shards, exports leave as JSONL/CSV. Two rules applied
everywhere:

- **Never infer schemas at scale.** Inference is a full extra pass
  over 100 TB before the real job starts; both readers here demand an
  explicit schema (or take the table's known one).
- **Writers shard, not coalesce.** Output parallelism = partitions;
  a single-file export is a driver bottleneck by construction, so
  there is deliberately no ``coalesce(1)`` convenience here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType, multiline: bool = False
) -> DataFrame:
    """JSON-lines reader with a REQUIRED schema. ``columnNameOfCorruptRecord``
    is left at Spark's default PERMISSIVE handling so one bad shard
    line nulls out instead of killing a 100 TB job; count the nulls
    downstream if strictness matters."""
    return (
        spark.read.schema(schema)
        .option("multiLine", multiline)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """Sharded JSONL export (one file per partition; gzip by default —
    at scale prefer zstd where the cluster's codecs allow)."""
    df.write.mode("overwrite").option("compression", compression).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV reader with a REQUIRED schema (no inference pass)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", sep)
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    """Sharded CSV export. Arrays/structs are not CSV-representable;
    callers flatten first (ANSI mode makes the error explicit)."""
    df.write.mode("overwrite").option("header", header).option("sep", sep).csv(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC reader — the other columnar interchange format (Hive-era
    warehouses hand data over as ORC). Self-describing like parquet,
    so the schema is optional and used as a projection/validation
    contract when given; predicate pushdown and column pruning apply
    the same way."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    """Sharded ORC export (one file per partition)."""
    df.write.mode("overwrite").option("compression", compression).orc(path)


def conform_schema(
    df: DataFrame,
    target: T.StructType,
    strict: bool = False,
) -> DataFrame:
    """Normalize a heterogeneous drop to a target schema — the ingest
    boundary between "whatever the vendor sent this week" and the
    typed tables every operator here assumes. Column matching is BY
    NAME (case-sensitive, like mergeSchema):

    - missing target columns are added as typed NULLs;
    - present columns are cast to the target type with try_cast —
      unparseable values become NULL instead of failing the whole
      batch under ANSI mode (Spark 4 default; the load must not die
      on one bad row — pair with validate.not_null to QUANTIFY the
      damage);
    - extra input columns are dropped (lenient) or rejected
      (``strict=True``) — silent extra columns are usually a renamed
      field, which lenient mode would silently discard;
    - output column ORDER is the target's, so unions and parquet
      appends line up.

    Pure projection: zero shuffle, whole-stage codegen.
    """
    extras = [c for c in df.columns if c not in {f.name for f in target.fields}]
    if strict and extras:
        raise ValueError(
            f"input has columns not in the target schema: {extras} "
            "(strict=True; rename or drop them explicitly)"
        )
    cols = []
    present = set(df.columns)
    for f in target.fields:
        if f.name in present:
            cols.append(
                F.col(f.name).try_cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
