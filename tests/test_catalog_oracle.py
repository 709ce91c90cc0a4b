"""Every catalog query with an oracle must hash-match DuckDB — the
local twin of the driver's CORRECTNESS gate (run at sf0.001 for
speed; the driver uses sf0.01)."""

from __future__ import annotations

import pytest

from bigdata_commerce_spark.plans import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare_to_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    compare_to_oracle(spark, df, ORACLES[name], SF_SMOKE)


def test_all_queries_run(spark):
    for name, fn in QUERIES.items():
        n = fn(spark, SF_SMOKE).count()
        assert n >= 0, name
