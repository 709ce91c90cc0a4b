"""Overflow twins: catalog-grade queries that don't fit the driver's
~50-slot CORRECTNESS window. Each twin gets the exact same check the
driver would run (DuckDB oracle hash-compare), plus a row-identity
check against its in-catalog sibling where one exists — so demoting a
query to a twin slot loses no verification strength, only a driver
row.
"""

from __future__ import annotations

import pytest

from bigdata_commerce_spark.plans import QUERIES, TWIN_ORACLES, TWIN_QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare_to_oracle


def test_twins_are_registered():
    # The 4 known twins; driver catalog must stay at <=50 entries.
    assert set(TWIN_QUERIES) >= {
        "region_top3_parts_sql",
        "embedding_ann_ivf_indexed",
        "minhash_signatures",
        "simhash_values",
    }
    assert len(QUERIES) <= 50
    assert not (set(TWIN_QUERIES) & set(QUERIES))


@pytest.mark.parametrize("name", sorted(TWIN_ORACLES))
def test_twin_matches_oracle(spark, name):
    df = TWIN_QUERIES[name](spark, SF_SMOKE)
    compare_to_oracle(spark, df, TWIN_ORACLES[name], SF_SMOKE)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_sql_twin_row_identical_to_dataframe_form(spark):
    """The temp-view SQL chain and the DataFrame pipeline are the same
    logical plan — results must match row for row."""
    sql_df = TWIN_QUERIES["region_top3_parts_sql"](spark, SF_SMOKE)
    df_df = QUERIES["region_top3_parts"](spark, SF_SMOKE)
    assert sql_df.columns == df_df.columns
    assert _sorted_rows(sql_df) == _sorted_rows(df_df)


def test_udtf_chunker_row_identical_to_expression_form(spark):
    """The Arrow UDTF chunker and the array-expression chunker are
    semantic twins — row-identical output, and the UDTF plan must use
    the Arrow-batched Python evaluator, not the pickled row path."""
    all_q = {**TWIN_QUERIES, **QUERIES}  # rotation-proof lookup
    udtf_df = all_q["chunk_documents_udtf"](spark, SF_SMOKE)
    expr_df = all_q["chunk_documents"](spark, SF_SMOKE)
    assert udtf_df.columns == expr_df.columns
    assert _sorted_rows(udtf_df) == _sorted_rows(expr_df)
    plan = udtf_df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan, plan.splitlines()[:12]
    assert "BatchEvalPythonUDTF" not in plan


def test_ivf_indexed_matches_in_memory_form(spark):
    """Persisted partition-pruned IVF index returns exactly what the
    in-memory IVF search returns (same quantizer, same re-rank)."""
    idx = TWIN_QUERIES["embedding_ann_ivf_indexed"](spark, SF_SMOKE)
    mem = QUERIES["embedding_ann_ivf"](spark, SF_SMOKE)
    assert sorted(idx.columns) == sorted(mem.columns)
    assert _sorted_rows(idx) == _sorted_rows(mem)
