"""Co-occurrence PMI (operators/cooccur.py). The lineitem-scale
oracle check lives in test_twin_queries.py (parts_bought_together);
here: the PMI law on a crafted basket set, presence (not
multiplicity) semantics, min_pairs filtering, the whale-basket cap's
determinism and bound, and parameter validation."""

from __future__ import annotations

import math

import pytest

from bigdata_commerce_spark.operators.cooccur import cooccurrence_pmi


def _baskets(spark, baskets):
    rows = [(g, i) for g, items in baskets.items() for i in items]
    return spark.createDataFrame(rows, "grp long, item string")


def test_pmi_law_and_presence_semantics(spark):
    # 4 groups; (a,b) together twice, a thrice, b twice; duplicate
    # items inside a basket count ONCE.
    baskets = {
        1: ["a", "a", "b"],
        2: ["a", "b", "c"],
        3: ["a"],
        4: ["c", "d"],
    }
    out = {
        (r["item_x"], r["item_y"]): (r["n_xy"], r["n_x"], r["n_y"], r["pmi"])
        for r in cooccurrence_pmi(_baskets(spark, baskets), "grp", "item").collect()
    }
    n_xy, n_x, n_y, pmi = out[("a", "b")]
    assert (n_xy, n_x, n_y) == (2, 3, 2)
    assert pmi == round(math.log(2.0 * 4.0 / (3.0 * 2.0)), 6)
    assert out[("c", "d")][0] == 1
    assert ("b", "a") not in out  # unordered, x < y


def test_min_pairs_filters(spark):
    baskets = {1: ["a", "b"], 2: ["a", "b"], 3: ["a", "c"]}
    out = cooccurrence_pmi(_baskets(spark, baskets), "grp", "item", min_pairs=2)
    assert [(r["item_x"], r["item_y"]) for r in out.collect()] == [("a", "b")]


def test_cap_per_group_bounds_and_is_deterministic(spark):
    whale = {1: [f"i{k}" for k in range(50)], 2: ["i1", "i2"]}
    df = _baskets(spark, whale)
    capped = cooccurrence_pmi(df, "grp", "item", cap_per_group=5)
    # group 1 contributes at most C(5,2)=10 pairs, group 2 at most 1
    assert capped.count() <= 11
    again = cooccurrence_pmi(df.repartition(7), "grp", "item", cap_per_group=5)
    key = lambda d: sorted(
        (r["item_x"], r["item_y"], r["n_xy"]) for r in d.collect()
    )
    assert key(capped) == key(again)  # md5 cap: partitioning-independent
    with pytest.raises(ValueError):
        cooccurrence_pmi(df, "grp", "item", cap_per_group=0)


def test_null_items_and_groups_excluded(spark):
    rows = [(1, "a"), (1, "b"), (2, None), (None, "c"), (3, "d")]
    df = spark.createDataFrame(rows, "grp long, item string")
    out = cooccurrence_pmi(df, "grp", "item")
    pairs = [(r["item_x"], r["item_y"], r["n_x"], r["pmi"]) for r in out.collect()]
    assert len(pairs) == 1
    x, y, n_x, pmi = pairs[0]
    # N counts only groups with a non-null item: {1, 3} -> 2, so
    # pmi(a,b) = ln(1*2/(1*1)) — a NULL-only basket must not deflate it.
    assert (x, y) == ("a", "b")
    import math
    assert pmi == round(math.log(2.0), 6)


def test_cap_decorrelated_across_groups(spark):
    # Two identical whale baskets: hashing (group, item) must keep
    # DIFFERENT item subsets in each (item-only hashing kept the same
    # ones everywhere, so high-hash pairs were never observable).
    items = [f"i{k}" for k in range(30)]
    df = _baskets(spark, {1: items, 2: items})
    capped = cooccurrence_pmi(df, "grp", "item", cap_per_group=5)
    # pairs observed across both groups: if the caps were identical
    # subsets, every pair would have n_xy == 2 and there'd be exactly
    # C(5,2)=10 pairs; decorrelated caps produce some n_xy == 1.
    counts = [r["n_xy"] for r in capped.collect()]
    assert any(c == 1 for c in counts)


def test_cooccurrence_matches_python_reference_hypothesis(spark):
    import math
    from collections import Counter
    from itertools import combinations

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 6), st.sampled_from("abcdef")),
            min_size=1,
            max_size=40,
        ),
        min_pairs=st.integers(1, 3),
    )
    def run(rows, min_pairs):
        baskets = {}
        for g, i in rows:
            baskets.setdefault(g, set()).add(i)
        n_groups = len(baskets)
        item_n = Counter(i for items in baskets.values() for i in items)
        pair_n = Counter(
            p
            for items in baskets.values()
            for p in combinations(sorted(items), 2)
        )
        want = {
            (x, y): (
                n,
                item_n[x],
                item_n[y],
                round(math.log(n * n_groups / (item_n[x] * item_n[y])), 6),
            )
            for (x, y), n in pair_n.items()
            if n >= min_pairs
        }
        df = spark.createDataFrame(rows, "grp long, item string")
        got = {
            (r["item_x"], r["item_y"]): (r["n_xy"], r["n_x"], r["n_y"], r["pmi"])
            for r in cooccurrence_pmi(
                df, "grp", "item", min_pairs=min_pairs
            ).collect()
        }
        assert got == want

    run()
