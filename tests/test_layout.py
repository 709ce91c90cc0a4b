"""Z-order layout: measure (not assume) that the interleaved layout
makes file-level min/max stats selective for BOTH dimensions, where
a single-column range layout only serves its own column."""

from __future__ import annotations

import random

from bigdata_commerce_spark.sources.layout import (
    files_overlapping,
    write_zordered,
    zorder_value,
)

N_FILES = 16
DOMAIN = 1 << 16


def _points(spark, n=60_000, seed=11):
    rng = random.Random(seed)
    rows = [(rng.randrange(DOMAIN), rng.randrange(DOMAIN)) for _ in range(n)]
    return spark.createDataFrame(rows, "x long, y long")


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    z = df.select(zorder_value("x", "y", bits=3).alias("z")).collect()[0].z
    # x bits -> even positions, y bits -> odd: x=101, y=011
    # z = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 0b011011
    assert z == 0b011011


def test_zorder_value_int_columns_full_width(spark):
    # 32-bit INT inputs at the default bits=16 exercise shift
    # distances up to 31: without the cast-before-shift the INT
    # shiftleft hits the sign bit (negative z) and bits>16 would wrap
    # mod 32 (aliased z). The result must be identical to the LONG
    # path and non-negative.
    rows = [(0, 0), (1, 1), ((1 << 16) - 1, (1 << 16) - 1), (12345, 54321)]
    as_int = spark.createDataFrame(rows, "x int, y int")
    as_long = spark.createDataFrame(rows, "x long, y long")
    zi = [r.z for r in as_int.select(zorder_value("x", "y", bits=16).alias("z")).collect()]
    zl = [r.z for r in as_long.select(zorder_value("x", "y", bits=16).alias("z")).collect()]
    assert zi == zl
    assert all(z >= 0 for z in zi)
    # top bit of col_b (bit 15 -> z bit 31) really lands at 2^31
    assert zi[2] == (1 << 32) - 1


def test_zorder_files_skip_on_both_dimensions(spark, tmp_path):
    pts = _points(spark)
    zpath = str(tmp_path / "zordered")
    xpath = str(tmp_path / "xsorted")
    write_zordered(pts, zpath, "x", "y", n_files=N_FILES)
    # baseline: classic single-column range layout
    pts.repartitionByRange(N_FILES, "x").sortWithinPartitions("x").write.parquet(xpath)

    # a narrow slice (1/16 of the domain) in each dimension
    lo, hi = DOMAIN // 2, DOMAIN // 2 + DOMAIN // 16

    x_on_x, total = files_overlapping(xpath, "x", lo, hi)
    y_on_x, _ = files_overlapping(xpath, "y", lo, hi)
    x_on_z, _ = files_overlapping(zpath, "x", lo, hi)
    y_on_z, _ = files_overlapping(zpath, "y", lo, hi)
    assert total == N_FILES

    # single-column layout: perfect on its own column, useless on the other
    assert x_on_x <= 3
    assert y_on_x == N_FILES
    # z-order: BOTH dimensions skip a real fraction of files
    assert x_on_z <= N_FILES // 2, (x_on_z, N_FILES)
    assert y_on_z <= N_FILES // 2, (y_on_z, N_FILES)
