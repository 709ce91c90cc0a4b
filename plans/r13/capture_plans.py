"""Capture .explain('formatted') for every headline bench query.

Usage: python plans/r13/capture_plans.py <suffix> [query ...]
Writes plans/r13/<query>_<suffix>.txt and prints a one-line summary
per query: #Exchange, join strategies, Python-eval nodes, scans.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

from bigdata_commerce_spark import get_spark  # noqa: E402
from bigdata_commerce_spark.plans import QUERIES, TWIN_QUERIES  # noqa: E402

ALL = {**TWIN_QUERIES, **QUERIES}


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import json

        names = sorted(json.loads((ROOT / "BENCH_BASELINE.json").read_text())["queries"])
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark()
    out_dir = ROOT / "plans" / "r13"
    for name in names:
        fn = ALL[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin|CartesianProduct)\w*)", plan)))
        py = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas|PythonMapInArrow|ArrowEvalPythonUDTF)", plan)))
        scans = len(re.findall(r"Scan parquet", plan))
        aggs = len(re.findall(r"HashAggregate", plan))
        sorts = len(re.findall(r"\bSort \[", plan))
        print(
            f"{name:35s} Exch={n_ex:2d} scans={scans:2d} aggs={aggs:2d} sorts={sorts:2d} "
            f"joins={','.join(joins) or '-'} py={','.join(py) or '-'}"
        )


if __name__ == "__main__":
    main()
