"""Local stand-in for the driver's DuckDB-oracle comparison.

Mirrors the driver contract: row count + column-name schema +
order-insensitive value comparison (columns sorted by name, rows
sorted by every column). Exact equality — floats included — because
the driver hashes values; any drift here is a real hash mismatch.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    # numpy scalars from duckdb
    if hasattr(v, "item"):
        return _norm(v.item())
    return v


def _canon(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    data = [tuple(_norm(r[i]) for i in order) for r in rows]
    data.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols_sorted, data


def assert_driver_compatible(query_df: DataFrame, name: str = "") -> None:
    """Driver-slot output contract: scalar top-level columns only.

    The driver's pandas-based canonicalizer crashes on top-level
    array/map/struct columns (`TypeError: unhashable type: 'list'` —
    the CORRECTNESS_r06 red rows), while this replica's ``_norm``
    tuple-izes them, so without this guard a driver-slotted query can
    pass pytest and still go red in the driver. Twins may keep
    nested shapes; anything slotted into the <=50 driver catalog must
    flatten (posexplode / array_join) first.
    """
    from pyspark.sql import types as T

    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in query_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"driver-slotted query {name!r} emits non-scalar top-level columns "
        f"(the driver's pandas canonicalizer cannot sort/hash them): {bad}; "
        f"flatten with posexplode/array_join or demote to a twin slot"
    )


def compare_to_oracle(
    spark: SparkSession,
    query_df: DataFrame,
    oracle: str,
    sf_dir: str,
    driver_slot: bool = False,
) -> None:
    if driver_slot:
        assert_driver_compatible(query_df)
    spark_rows = [tuple(r) for r in query_df.collect()]
    spark_cols = list(query_df.columns)

    con = duckdb_con(sf_dir)
    # Type guard: the driver materializes the oracle result through Arrow,
    # where DuckDB's HUGEINT (the default type of a bare SUM(CASE...)) lands
    # as float64 and hash-mismatches Spark's bigint even when values agree.
    # fetchall() below hides that (HUGEINT -> Python int), so check types
    # explicitly and demand an explicit CAST in the oracle SQL instead.
    rel = con.sql(oracle)
    drifty = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not drifty, (
        f"oracle columns typed HUGEINT (driver hashes as float64 != Spark bigint); "
        f"add CAST(... AS BIGINT): {drifty}"
    )
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]
    con.close()

    assert len(spark_rows) == len(duck_rows), (
        f"row count: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    s_cols, s_data = _canon(spark_cols, spark_rows)
    d_cols, d_data = _canon(duck_cols, duck_rows)
    assert s_cols == d_cols, f"schema: spark={s_cols} duckdb={d_cols}"
    mismatches = [
        (i, sr, dr) for i, (sr, dr) in enumerate(zip(s_data, d_data)) if sr != dr
    ]
    assert not mismatches, f"{len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
