"""Shared registry for the query catalog: name -> (spark fn, oracle)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# The driver's CORRECTNESS gate checks at most ~50 catalog entries per
# round — treat that as a hard slot budget. Near-duplicate variants
# (a SQL-surface twin of a DataFrame query, an indexed form of the
# same ANN search, a signature frame whose consuming dedup op is
# already checked) live here instead: same (fn, oracle) contract, but
# verified by pytest (tests/test_twin_queries.py) rather than burning
# a driver slot.
TWIN_QUERIES: dict[str, QueryFn] = {}
TWIN_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query; ``oracle`` is the DuckDB-equivalent
    SQL (omit only for genuinely non-SQL-expressible operators — the
    driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES or name in TWIN_QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def twin_query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an overflow twin: oracle-checked in pytest, not by the
    driver (keeps the driver catalog inside its ~50-slot window)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in TWIN_QUERIES or name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        TWIN_QUERIES[name] = fn
        if oracle is not None:
            TWIN_ORACLES[name] = oracle
        return fn

    return deco
