"""Edit-distance join (operators/editdist.py). The corpus-scale
brute-force oracle check lives in test_twin_queries.py
(docs_editdist_join); here: completeness of the two candidate paths
on crafted strings (including the short-left/long-right seam the
pigeonhole cannot cover), a hypothesis sweep against a
python-reference join, and parameter validation."""

from __future__ import annotations

import pytest

# Suite tiering (VERDICT r10 item 7, extended after measuring the
# round-11 durations): the banded edit-distance property sweeps
# is wall-dominant — the full `pytest tests/` run keeps it;
# `-m "not slow"` gives the fast development signal.
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_commerce_spark.operators.editdist import edit_distance_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _run(spark, left, right, d, q=3):
    ldf = spark.createDataFrame(list(left.items()), "doc_id long, text string")
    rdf = spark.createDataFrame(list(right.items()), "doc_id long, text string")
    return {
        (r["lid"], r["rid"]): r["distance"]
        for r in edit_distance_join(ldf, rdf, d, q=q).collect()
    }


def _reference(left, right, d):
    out = {}
    for li, lt in left.items():
        for ri, rt in right.items():
            dist = _lev(lt, rt)
            if dist <= d:
                out[(li, ri)] = dist
    return out


def test_short_left_long_right_seam_is_found(spark):
    # d=2, q=3: short bound is (d+1)*q = 9. left len 8 (< 9, no
    # pigeonhole), right len 10 (>= 9) and within distance 2 — the
    # pair no single-path implementation may drop.
    left = {1: "abcdefgh"}
    right = {2: "abcdefghxy"}
    assert _run(spark, left, right, 2) == {(1, 2): 2}


def test_gram_path_and_exact_distances(spark):
    base = "the quick brown fox jumps over the lazy dog " * 2
    left = {1: base, 2: base.replace("quick", "quack")}
    right = {
        3: base,                                # d=0 to 1
        4: base.replace("brown fox", "green cat"),  # several edits
        5: "z" * len(base),                     # far away
    }
    got = _run(spark, left, right, 10)
    want = _reference(left, right, 10)
    assert got == want and (1, 3) in got and got[(1, 3)] == 0


def test_zero_distance_is_exact_match_join(spark):
    left = {1: "hello world", 2: "hello worle"}
    right = {3: "hello world"}
    assert _run(spark, left, right, 0) == {(1, 3): 0}


def test_params_validated(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError):
        edit_distance_join(df, df, -1)
    with pytest.raises(ValueError):
        edit_distance_join(df, df, 2, q=0)


_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = st.lists(
    st.sampled_from(["spark", "shuffle", "join", "scan", "agg", "row"]),
    min_size=0,
    max_size=12,
).map(" ".join)


@_SETTINGS
@given(
    lefts=st.lists(_WORDS, min_size=1, max_size=8),
    rights=st.lists(_WORDS, min_size=1, max_size=8),
    d=st.integers(0, 15),
    q=st.integers(1, 4),
)
def test_matches_python_reference(spark, lefts, rights, d, q):
    """Ragged lengths straddling the pigeonhole bound, every (d, q)
    combination: the two-path union must equal brute force exactly."""
    left = dict(enumerate(lefts))
    right = dict(enumerate(rights, start=100))
    assert _run(spark, left, right, d, q=q) == _reference(left, right, d)


def test_unicode_distances_are_codepoint_based(spark):
    """Spark's levenshtein counts CODEPOINTS; the catalog twin's
    DuckDB oracle counts bytes, which is why the twin restricts its
    oracle-checked domain to ASCII (round-8 fuzz find). The operator
    itself must stay codepoint-exact on unicode."""
    left = {1: "éléphant", 2: "日本語"}
    right = {100: "elephant", 101: "日本誤"}
    got = _run(spark, left, right, 3)
    # é->e twice = 2 edits; one CJK substitution = 1 edit
    assert got[(1, 100)] == 2
    assert got[(2, 101)] == 1
