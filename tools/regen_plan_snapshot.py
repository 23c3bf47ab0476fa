"""Regenerate tests/plan_snapshot.json — the whole-catalog plan regression
baseline consumed by tests/test_plans.py::test_plan_snapshot_no_regressions.

Counts Exchange / BroadcastExchange / nested-loop operators in every
registered query's formatted plan (identical regexes to the gate) and
rewrites the snapshot. Run ONLY when a plan change is intentional and
reviewed — the point of the gate is that a lost broadcast or a new shuffle
anywhere in the catalog fails loudly with the query name.

Usage: python tools/regen_plan_snapshot.py [--only name1,name2]
  --only updates just the named entries, leaving the rest pinned.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "plan_snapshot.json",
)
SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    only: set[str] | None = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = set(sys.argv[2].split(","))

    from importer_spark.queries import DIAGNOSTICS, QUERIES
    from importer_spark.session import get_spark

    spark = get_spark(app_name="regen_plan_snapshot")
    catalog = {**QUERIES, **DIAGNOSTICS}
    baseline = {}
    if os.path.exists(SNAPSHOT):
        with open(SNAPSHOT) as fh:
            baseline = json.load(fh)
    # drop entries for queries that no longer exist
    baseline = {k: v for k, v in baseline.items() if k in catalog}

    for name, fn in sorted(catalog.items()):
        if only is not None and name not in only:
            continue
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        got = {
            "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
            "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
            "nested_loops": len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", plan)),
        }
        if baseline.get(name) != got:
            print(f"{name}: {baseline.get(name)} -> {got}")
        baseline[name] = got

    with open(SNAPSHOT, "w") as fh:
        json.dump(dict(sorted(baseline.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {SNAPSHOT} with {len(baseline)} entries")


if __name__ == "__main__":
    main()
