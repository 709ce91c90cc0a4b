"""Windowed funnel DP (operators/funnel.window_funnel). The
corpus-scale recursive-CTE oracle check lives in
test_twin_queries.py (user_window_funnel); here: the DP's edge
semantics on crafted sequences, a hypothesis sweep against a
brute-force chain search, and parameter validation."""

from __future__ import annotations

import datetime as dt
from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_commerce_spark.operators.funnel import window_funnel

STEPS = ["a", "b", "c"]
_B = dt.datetime(2024, 1, 1)


def _run(spark, seqs, window):
    rows = [
        (uid, _B + dt.timedelta(seconds=sec), ty)
        for uid, seq in seqs.items()
        for sec, ty in seq
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    return {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(df, STEPS, window).collect()
    }


def _brute(seq, window):
    """Max L with a strictly-increasing-index chain matching STEPS[:L]
    whose last-first time span fits the window."""
    ev = sorted(seq)
    best = 0
    for L in range(1, len(STEPS) + 1):
        for idxs in combinations(range(len(ev)), L):
            if [ev[i][1] for i in idxs] != STEPS[:L]:
                continue
            if ev[idxs[-1]][0] - ev[idxs[0]][0] <= window:
                best = max(best, L)
    return best


def test_restart_beats_expired_chain(spark):
    # chains from the first 'a' expire (3650 - 0 > 3600); the restart
    # at 100 completes: 3700 - 100 = 3600 fits exactly.
    seqs = {1: [(0, "a"), (100, "a"), (3650, "b"), (3700, "c")]}
    assert _run(spark, seqs, 3600) == {1: 3}


def test_window_is_measured_from_chain_start(spark):
    # b at 3000 (within), c at 7000: 7000 - 0 > 3600 -> level stays 2.
    seqs = {1: [(0, "a"), (3000, "b"), (7000, "c")]}
    assert _run(spark, seqs, 3600) == {1: 2}


def test_out_of_order_types_do_not_count(spark):
    seqs = {1: [(0, "c"), (1, "b"), (2, "a")], 2: [(0, "b"), (1, "c")]}
    # user 1 reaches level 1 ('a' present); user 2 never starts.
    assert _run(spark, seqs, 3600) == {1: 1}


def test_params_validated(spark):
    df = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    with pytest.raises(ValueError):
        window_funnel(df, [], 10)
    with pytest.raises(ValueError):
        window_funnel(df, ["a"], 0)


_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(
    seqs=st.dictionaries(
        st.integers(0, 3),
        st.lists(
            st.tuples(st.integers(0, 50), st.sampled_from(["a", "b", "c", "x"])),
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=4,
    ),
    window=st.integers(1, 60),
)
def test_matches_brute_force_chain_search(spark, seqs, window):
    got = _run(spark, seqs, window)
    want = {
        uid: lvl
        for uid, seq in seqs.items()
        if (lvl := _brute([s for s in seq if s[1] in STEPS], window)) >= 1
    }
    assert got == want
