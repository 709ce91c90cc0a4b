"""A-ES weighted sampling (operators/mixing.weighted_sample). The
corpus-scale oracle check lives in test_twin_queries.py
(docs_weighted_sample); here: exact parity with a python reference
of the same construction, weight-bias sanity, exclusion of
non-positive weights, global vs grouped selection, and determinism
across partitionings."""

from __future__ import annotations

import hashlib
import math

import pytest

from bigdata_commerce_spark.operators.mixing import weighted_sample


def _key(doc_id: int, w: float, salt: str = "aes") -> float:
    h = int(hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:15], 16)
    u = (h + 1) / float(1 << 60)
    return round(math.log(u) / w, 10)


def _reference(rows, k, grouped):
    # rows: (id, group, weight)
    out = {}
    groups = {}
    for i, g, w in rows:
        if w is not None and w > 0:
            groups.setdefault(g if grouped else None, []).append((i, w))
    for g, members in groups.items():
        ranked = sorted(members, key=lambda t: (-_key(t[0], t[1]), t[0]))
        for rank, (i, _) in enumerate(ranked[:k], 1):
            out[i] = (g, rank)
    return out


@pytest.fixture()
def frame(spark):
    rows = [
        (i, ["a", "b", "c"][i % 3], float((i * 37) % 11 + 1)) for i in range(60)
    ]
    rows += [(100, "a", None), (101, "b", 0.0), (102, "c", -3.0)]
    return (
        rows,
        spark.createDataFrame(rows, "doc_id long, grp string, w double"),
    )


def test_grouped_matches_python_reference(spark, frame):
    rows, df = frame
    got = {
        r["doc_id"]: (r["grp"], r["rank"])
        for r in weighted_sample(
            df, k=5, weight_col="w", group_cols=["grp"]
        ).collect()
    }
    assert got == _reference(rows, 5, grouped=True)


def test_global_matches_python_reference(spark, frame):
    rows, df = frame
    got = {
        r["doc_id"]: r["rank"]
        for r in weighted_sample(df, k=7, weight_col="w").collect()
    }
    want = {i: rank for i, (_, rank) in _reference(rows, 7, grouped=False).items()}
    assert got == want


def test_nonpositive_and_null_weights_excluded(spark, frame):
    _, df = frame
    sampled = weighted_sample(df, k=1000, weight_col="w")
    ids = {r["doc_id"] for r in sampled.collect()}
    assert ids.isdisjoint({100, 101, 102})
    assert len(ids) == 60  # k past the population returns everyone valid


def test_heavy_weight_dominates(spark):
    # One row with overwhelming weight: its key ln(u)/w ~ 0 beats any
    # moderate-weight competitor for this salt (and for almost every
    # salt — u^(1/w) -> 1 as w -> inf).
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(50)] + [(999, 1e12)], "doc_id long, w double"
    )
    top = weighted_sample(df, k=1, weight_col="w").collect()
    assert [r["doc_id"] for r in top] == [999]


def test_partitioning_independent(spark, frame):
    rows, df = frame
    one = weighted_sample(df.coalesce(1), k=5, weight_col="w", group_cols=["grp"])
    many = weighted_sample(df.repartition(13), k=5, weight_col="w", group_cols=["grp"])
    key = lambda d: sorted((r["doc_id"], r["rank"]) for r in d.collect())
    assert key(one) == key(many)


def test_k_validated(spark, frame):
    _, df = frame
    with pytest.raises(ValueError):
        weighted_sample(df, k=0, weight_col="w")
