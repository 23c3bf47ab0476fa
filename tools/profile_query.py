"""Isolated per-query profiler for optimization rounds (guide §1).

Runs named catalog queries through the noop sink on a fresh session —
`--runs N` repetitions, min/median reported — and, with `--final-plan`,
fetches the FINAL adaptive plan for the slowest-by-min query executions
from the live UI REST API (/api/v1/.../sql) so runtime facts the static
`explain` can't show (ReusedExchange collapses, AQE join rewrites,
coalesced partition counts, per-node rows) are visible.

Usage:
    python tools/profile_query.py [--runs 3] [--final-plan] name1 [name2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ui_sql_executions(ui_base: str) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui_base}/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui_base}/api/v1/applications/{app_id}/sql?details=true&planDescription=true&length=1000"
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--final-plan", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    from importer_spark.queries import DIAGNOSTICS, QUERIES
    from importer_spark.session import get_spark, shuffle_partitions_for_dir

    catalog = {**QUERIES, **DIAGNOSTICS}
    unknown = [n for n in args.names if n not in catalog]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = int(
        os.environ.get(
            "SPARK_GRAFT_SHUFFLE", shuffle_partitions_for_dir(args.sf_dir)
        )
    )
    spark = get_spark(
        app_name="importer-spark-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Same warmup as bench.py: page-cache the inputs, fork the Python pool.
    from importer_spark.io import TABLES, Tables

    warm = Tables(spark, args.sf_dir)
    for t in TABLES:
        try:
            getattr(warm, t).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    results: dict[str, dict] = {}
    for name in args.names:
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}#{i}")
            t0 = time.perf_counter()
            catalog[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        times_sorted = sorted(times)
        results[name] = {
            "runs": times,
            "min": times_sorted[0],
            "median": times_sorted[len(times) // 2],
        }
        print(f"PROFILE {name}: min={times_sorted[0]} median={times_sorted[len(times)//2]} runs={times}")

    if args.final_plan:
        ui_base = spark.sparkContext.uiWebUrl
        try:
            execs = _ui_sql_executions(ui_base)
        except Exception as e:  # UI disabled or endpoint moved
            print(f"FINAL_PLAN_UNAVAILABLE: {e}", file=sys.stderr)
            execs = []
        by_desc: dict[str, dict] = {}
        for ex in execs:
            d = ex.get("description", "")
            if d.startswith("profile:"):
                by_desc[d] = ex  # last execution per description wins
        out_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r10",
        )
        for name in args.names:
            key = f"profile:{name}#0"
            ex = by_desc.get(key)
            if not ex:
                continue
            path = os.path.join(out_dir, f"{name}_final.txt")
            with open(path, "w") as fh:
                fh.write(ex.get("planDescription", ""))
                fh.write("\n\n== nodes ==\n")
                for node in ex.get("nodes", []):
                    fh.write(f"{node.get('nodeId')}: {node.get('nodeName')}\n")
                    for m in node.get("metrics", []):
                        fh.write(f"    {m.get('name')}: {m.get('value')}\n")
            n_reuse = ex.get("planDescription", "").count("ReusedExchange")
            print(f"FINAL_PLAN {name}: -> {path} (ReusedExchange x{n_reuse})")

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
