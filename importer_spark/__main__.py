"""CLI entry point: ``python -m importer_spark <command>``.

Commands:
  list                      print every catalog + diagnostics query name
  run <query>               execute a query and print rows (JSON lines)
  explain <query>           print the formatted physical plan
  oracle <query>            print the query's DuckDB oracle SQL

Options: --sf-dir (default /root/testdata/sf0.001), --limit N (default 20,
0 = no limit), --master (default local[*]).

The reference's surface is an orchestrator CLI (orchestrator.py); this is
the equivalent front door for ad-hoc use — the programmatic API remains
importer_spark.queries.QUERIES.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None, out=None) -> int:
    out = out or sys.stdout
    p = argparse.ArgumentParser(prog="importer_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    for name in ("run", "explain", "oracle"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        sp.add_argument("--limit", type=int, default=20)
        sp.add_argument("--master", default="local[*]")
    args = p.parse_args(argv)

    from importer_spark.queries import DIAGNOSTICS, ORACLES, QUERIES

    catalog = {**QUERIES, **DIAGNOSTICS}
    if args.cmd == "list":
        for name in sorted(QUERIES):
            print(name, file=out)
        for name in sorted(DIAGNOSTICS):
            print(f"{name}  [diagnostics]", file=out)
        return 0

    if args.query not in catalog:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    if args.cmd == "oracle":
        sql = ORACLES.get(args.query)
        if sql is None:
            print(f"{args.query} is a diagnostics query (no oracle)", file=sys.stderr)
            return 1
        print(sql.strip(), file=out)
        return 0

    from importer_spark.session import get_spark

    spark = get_spark(app_name=f"importer-spark-cli-{args.cmd}", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    df = catalog[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        print(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ),
            file=out,
        )
        return 0
    rows = df.limit(args.limit).collect() if args.limit else df.collect()
    for r in rows:
        print(json.dumps(r.asDict(), default=str, sort_keys=True), file=out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
