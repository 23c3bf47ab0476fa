"""Measure the per-task profile of range_attribution's heavy (level-1)
window stage on the skew-poisoned data — the r9 hierarchical-prefix-sum
claim made falsifiable: with the window partitioned by (key, DAY), the
hot key's half-corpus timeline must spread across many tasks whose max
duration is bounded by its hottest day, never one task owning the whole
key (the r8 one-window form).

Reads the Spark status REST API (the same meter measure_skew_join.py
uses) for every stage of the query's jobs and reports the worst stage by
max task duration, plus the full profile of the stage that sorts the
fact-sized timeline. Merges the summary into SKEW_GATE.json under
"attribution_tasks" when the artifact exists (run it AFTER the skew gate
in a republish cycle, same pattern as the AQE merge).

Usage: python tools/measure_attribution_tasks.py [skew_dir] [artifact]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew1"
    artifact = sys.argv[2] if len(sys.argv) > 2 else "SKEW_GATE.json"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

    from importer_spark.queries import QUERIES
    from importer_spark.session import get_spark, shuffle_partitions_for_dir

    spark = get_spark(
        app_name="measure-attribution-tasks",
        master=f"local[{cpus}]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", shuffle_partitions_for_dir(skew_dir))
        ),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    group = "attribution-tasks"
    spark.sparkContext.setJobGroup(group, "signup_attribution on skewed data")
    QUERIES["signup_attribution"](spark, skew_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    stages = []
    jobs = [j for j in _rest(spark, "/jobs") if j.get("jobGroup") == group]
    for sid in sorted({s for j in jobs for s in j["stageIds"]}):
        for att in _rest(spark, f"/stages/{sid}"):
            if att.get("status") != "COMPLETE" or not att.get("numCompleteTasks"):
                continue
            q = _rest(
                spark,
                f"/stages/{sid}/{att['attemptId']}/taskSummary?quantiles=0.0,0.5,1.0",
            )
            dur = q.get("duration") or [0, 0, 0]
            # Missing REST fields surface as null, never a silent 0 (r9
            # ADVICE): a 0 reads as "measured, nothing moved", which
            # under-reports the evidence.
            mb = lambda v: round(v / 1e6, 2) if v is not None else None  # noqa: E731
            stages.append(
                {
                    "stage_id": sid,
                    "n_tasks": att["numCompleteTasks"],
                    "task_ms_min": round(dur[0], 1),
                    "task_ms_median": round(dur[1], 1),
                    "task_ms_max": round(dur[2], 1),
                    "shuffle_read_mb": mb(att.get("shuffleReadBytes")),
                    "input_mb": mb(att.get("inputBytes")),
                }
            )
    stages.sort(key=lambda s: -s["task_ms_max"])
    n_tasks_total = sum(j.get("numTasks", 0) for j in jobs)  # provenance only
    summary = {
        "skew_dir": skew_dir,
        "worst_stage": stages[0] if stages else {},
        "stages_by_max_task": stages[:6],
        "n_jobs": len(jobs),
        "note": (
            "level-1 window partitions by (key, day): the hot key's facts "
            "spread over per-day tasks — compare task_ms_max vs the r8 "
            "one-window form where the hot key was ONE task"
        ),
        "_n_tasks_total": n_tasks_total,
    }
    print(json.dumps(summary, indent=1))
    if os.path.exists(artifact):
        with open(artifact) as fh:
            merged = json.load(fh)
        merged["attribution_tasks"] = summary
        with open(artifact, "w") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
        print(json.dumps({"merged_into": artifact}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
