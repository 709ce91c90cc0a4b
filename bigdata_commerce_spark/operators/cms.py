"""Count-min sketch: mergeable approximate frequency table for ALL
keys at fixed size (Cormode/Muthukrishnan 2005, the public
construction).

Where it sits in the sketch family: Misra-Gries (operators/sketch.py)
answers "which keys are heavy" with a candidate set re-verified
exactly; HLL answers "how many distinct"; the Bloom filter
(operators/bloom.py) answers set membership. CMS answers "about how
often does key X occur" for ANY x — the primitive behind per-key rate
estimates, n-gram frequency floors for quality filtering, and
join-skew pre-detection — in depth×width counters regardless of key
cardinality, with a one-sided error: estimates NEVER undercount, and
overcount by at most eps·N with probability 1-delta.

Representation mirrors the Bloom filter's: a DataFrame of
(row, col, cnt) — only non-zero cells materialize — so sketches are
mergeable by union + sum (shards sketch independently, a coordinator
combines; the mergeable-state discipline shared by the whole family)
and persistable next to the data they summarize.

Scale shape: build is one explode (depth rows per input row — depth
is 3-7, not a fan-out problem) + one hash aggregate; lookups are
``depth`` broadcast hash joins computed map-side, so the probe side
never shuffles (plan-asserted in tests, same contract as the Bloom
probe). Hashing reuses the Kirsch-Mitzenmacher double-hash over md5
from operators/bloom.py.

Reference parity: none (the reference has no sketch surface); extends
the engine's approximate-aggregation family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_commerce_spark.operators.bloom import _base_hashes


def cms_params(epsilon: float = 0.001, delta: float = 0.01) -> tuple[int, int]:
    """(width, depth) for additive error <= epsilon*N with probability
    >= 1-delta: width = ceil(e/epsilon), depth = ceil(ln(1/delta))."""
    if not 0.0 < epsilon < 1.0 or not 0.0 < delta < 1.0:
        raise ValueError("epsilon and delta must be in (0, 1)")
    return int(math.ceil(math.e / epsilon)), int(math.ceil(math.log(1.0 / delta)))


def _cells(key_col: str, width: int, depth: int):
    """array<struct<row,col>> of the key's one cell per sketch row."""
    h1, h2 = _base_hashes(F.col(key_col), width)
    return F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda i: F.struct(
            i.cast("int").alias("row"),
            ((h1 + i.cast("bigint") * h2) % width).alias("col"),
        ),
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int,
    depth: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch ``df[key_col]`` occurrences (or ``weight_col`` sums)
    into (row, col, cnt). One explode + one hash aggregate; NULL keys
    are not counted (join-key semantics, as in the Bloom build)."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.explode(_cells(key_col, width, depth)).alias("__cell"),
            w.cast("long").alias("__w"),
        )
        .groupBy(
            F.col("__cell.row").alias("row"), F.col("__cell.col").alias("col")
        )
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with the SAME (width, depth):
    merge(build(A), build(B)) is row-identical to build(A ++ B)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    df: DataFrame,
    key_col: str,
    sketch: DataFrame,
    width: int,
    depth: int,
    out_col: str = "est_count",
) -> DataFrame:
    """Add ``out_col``: the CMS frequency estimate for every row's
    key — min over the key's ``depth`` cells, 0 for a key hashing
    only to empty cells, NULL for NULL keys. ``depth`` broadcast hash
    joins; the probe side never shuffles."""
    h1, h2 = _base_hashes(F.col(key_col), width)
    out = df.withColumn("__h1", h1).withColumn("__h2", h2)
    ests = []
    for i in range(depth):
        c, n = f"__c{i}", f"__n{i}"
        out = out.withColumn(
            c, (F.col("__h1") + F.lit(i).cast("bigint") * F.col("__h2")) % width
        )
        side = F.broadcast(
            sketch.where(F.col("row") == i).select(
                F.col("col").alias(c), F.col("cnt").alias(n)
            )
        )
        out = out.join(side, c, "left")
        ests.append(F.coalesce(F.col(n), F.lit(0)))
    drop = ["__h1", "__h2"] + [f"__c{i}" for i in range(depth)] + [
        f"__n{i}" for i in range(depth)
    ]
    est = F.when(F.col(key_col).isNotNull(), F.least(*ests))
    return out.withColumn(out_col, est).drop(*drop)
