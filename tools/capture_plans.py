"""Dump formatted physical plans for named catalog queries to plans/<round>/.

Optimization-round evidence tool (guide §1: capture .explain("formatted")
before and after every change). Writes one file per query —
plans/<round>/<name>_<label>.txt — and prints a one-line summary of the
plan-shape markers that matter for the optimization checklist: Exchange /
ReusedExchange / BroadcastExchange counts, join strategies, Python
evaluation nodes, and cartesian products.

Usage:
    python tools/capture_plans.py --label before [--round r10] \
        [--sf-dir /root/testdata/sf0.1] [name1 name2 ... | --all]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = {
    # formatted mode prints nodes as "(12) Exchange" with the partitioning
    # on a following Arguments: line — match the node header, not the pair.
    "exchanges": r"\(\d+\) Exchange\b",
    "reused_exchanges": r"\bReusedExchange\b",
    "broadcasts": r"\bBroadcastExchange\b",
    "smj": r"\bSortMergeJoin\b",
    "bhj": r"\bBroadcastHashJoin\b",
    "shj": r"\bShuffledHashJoin\b",
    "bnlj": r"\bBroadcastNestedLoopJoin\b",
    "cartesian": r"\bCartesianProduct\b",
    "python_eval": r"\b(?:BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)\b",
    "scans": r"\bScan parquet\b",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--label", required=True)
    ap.add_argument("--round", dest="round_", default="r10")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from importer_spark.queries import DIAGNOSTICS, QUERIES
    from importer_spark.session import get_spark, shuffle_partitions_for_dir

    catalog = {**QUERIES, **DIAGNOSTICS}
    names = sorted(catalog) if args.all else args.names
    unknown = [n for n in names if n not in catalog]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.round_,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(
        app_name="capture-plans",
        master="local[8]",
        shuffle_partitions=int(shuffle_partitions_for_dir(args.sf_dir)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = catalog[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{args.label}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        counts = {k: len(re.findall(rx, plan)) for k, rx in MARKERS.items()}
        summary = " ".join(f"{k}={v}" for k, v in counts.items() if v)
        print(f"{name}: {summary or 'trivial'}")
    spark.stop()


if __name__ == "__main__":
    main()
