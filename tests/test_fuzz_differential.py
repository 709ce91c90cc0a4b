"""Differential fuzz sweep: EVERY oracle-paired catalog query runs on
adversarially-generated data (tests/fuzzgen.py) and must still match
its DuckDB oracle with the driver's exact row-count + schema +
value comparison.

Why this exists: the driver gate and the twin pytest both replay the
SAME fixed parquet testdata, so an operator/oracle pair can agree on
that distribution while disagreeing off it. This sweep feeds both
engines NULLs, empty/unicode/whitespace strings, malformed JSON,
dangling foreign keys, timestamp ties, planted skew, and degenerate
embedding vectors — same schemas, hostile content.

Round-6 findings it would have caught (all fixed, kept here as the
regression net):
- ANSI cast abort on {"k": "garbage"} props (-> try_cast at ingest)
- DuckDB json_extract throwing on malformed JSON (-> json_valid guard)
- DuckDB DECIMAL(38,12)->DOUBLE double-rounding (-> via-VARCHAR cast)
- DuckDB numeric-literal parse 1 ULP off for ~11% of doubles
  (-> CAST('…' AS DOUBLE) for embedded plane matrices)
- NULL-contract drift in 7 oracles (boilerplate, canonical docs, URL
  dedup/host report, winsorize, OHLC, dup matrix) and 2 kernels
  (multimodal absent-media semantics)
- -0.0 vs +0.0 hash splits (fold init, ROUND sign normalization)
"""

from __future__ import annotations

import pytest

from bigdata_commerce_spark.plans import ORACLES, QUERIES, TWIN_ORACLES, TWIN_QUERIES
from tests.fuzzgen import generate
from tests.oracle_utils import compare_to_oracle

ALL_QUERIES = {**TWIN_QUERIES, **QUERIES}
ALL_ORACLES = {**TWIN_ORACLES, **ORACLES}


@pytest.fixture(scope="session")
def fuzz_dir(tmp_path_factory) -> str:
    return generate(str(tmp_path_factory.mktemp("fuzzdata")))


def test_every_oracle_paired_query_is_swept():
    # every query with an oracle gets a fuzz row; if this fails a new
    # query was registered without joining the sweep (it is automatic
    # — fix the registry, not this test)
    assert set(ALL_ORACLES) <= set(ALL_QUERIES)
    assert len(ALL_ORACLES) >= 128


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_fuzz_matches_oracle(spark, fuzz_dir, name):
    df = ALL_QUERIES[name](spark, fuzz_dir)
    compare_to_oracle(spark, df, ALL_ORACLES[name], fuzz_dir)
