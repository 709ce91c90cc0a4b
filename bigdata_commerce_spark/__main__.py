"""CLI entry point: run any catalog query from the command line.

The reference ships each requirement as a runnable Spark job
(``spark-submit ... SessionStat`` etc. — README.md:13-117); the
engine's equivalent is one launcher over the whole catalog:

    python -m bigdata_commerce_spark list
    python -m bigdata_commerce_spark run region_top3_parts \
        [--sf-dir /root/testdata/sf0.01] [--limit 20] [--out path.parquet]
    python -m bigdata_commerce_spark explain region_top3_parts

``run`` prints the result (or writes parquet with --out); ``explain``
prints the formatted physical plan — the same surface the plan-shape
tests assert against. Twin-registry queries are addressable too.
"""

from __future__ import annotations

import argparse
import os
import sys


def _catalogs():
    from bigdata_commerce_spark.plans import QUERIES, TWIN_QUERIES

    return QUERIES, TWIN_QUERIES


def _resolve(name: str):
    queries, twins = _catalogs()
    if name in queries:
        return queries[name]
    if name in twins:
        return twins[name]
    sys.exit(
        f"unknown query {name!r}; `python -m bigdata_commerce_spark list` "
        "shows the catalog"
    )


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="bigdata_commerce_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list catalog + twin queries")
    for cmd in ("run", "explain"):
        sp = sub.add_parser(cmd)
        sp.add_argument("query")
        sp.add_argument(
            "--sf-dir",
            default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        )
        if cmd == "run":
            sp.add_argument("--limit", type=int, default=20)
            sp.add_argument("--out", help="write full result as parquet instead")
    args = p.parse_args(argv)

    if args.cmd == "list":
        queries, twins = _catalogs()
        for n in sorted(queries):
            print(n)
        for n in sorted(twins):
            print(f"{n}  (twin)")
        return

    from bigdata_commerce_spark import get_spark

    spark = get_spark(app_name=f"bcs_{args.cmd}_{args.query}")
    df = _resolve(args.query)(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    elif args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
