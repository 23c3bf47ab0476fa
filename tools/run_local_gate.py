"""All-catalog oracle gate at an arbitrary scale factor.

Runs every registered catalog query (132) on Spark AND its DuckDB oracle on
the same parquet dir, compares row count + column set + order-insensitive
canonical values (the driver's t2 comparison, via tests.conftest), and
writes a LOCAL_GATE_<label>.json artifact:

    {"n": 132, "passes": 132, "fails": {name: reason},
     "heap": {...driver-heap telemetry...}, "seconds": {name: [spark, duck]}}

Driver-heap telemetry (r3 verdict: the 10x experiment flagged driver-heap
growth across a long catalog run — measure it, don't guess): after each
query the script samples JVM used-heap (after a System.gc() every 10
queries so the sample tracks LIVE objects, not garbage), the count of
persistent RDDs, and the Python RSS. A leak shows as monotonic growth in
the GC'd samples; plan/state churn shows as sawtooth.

Usage: python tools/run_local_gate.py [sf_dir] [out_json] [--cpus N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def used_heap_mb(spark) -> float:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    return round((rt.totalMemory() - rt.freeMemory()) / 1e6, 1)


def rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1e3, 1)
    return -1.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"LOCAL_GATE_{os.path.basename(sf_dir.rstrip('/'))}.json"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

    from importer_spark.queries import ORACLES, QUERIES
    from importer_spark.session import get_spark
    from tests.conftest import canonical, duck_con

    spark = get_spark(
        app_name="local-gate",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "16")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    fails: dict[str, str] = {}
    seconds: dict[str, list[float]] = {}
    heap_samples: list[dict] = []
    names = sorted(QUERIES)
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            sdf = QUERIES[name](spark, sf_dir).toPandas()
            t1 = time.perf_counter()
            odf = con.execute(ORACLES[name]).df()
            t2 = time.perf_counter()
            seconds[name] = [round(t1 - t0, 3), round(t2 - t1, 3)]
            if sorted(sdf.columns) != sorted(odf.columns):
                fails[name] = (
                    f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
                )
            elif len(sdf) != len(odf):
                fails[name] = f"rows spark={len(sdf)} oracle={len(odf)}"
            else:
                a, b = canonical(sdf), canonical(odf)
                if not a.equals(b):
                    mask = (a != b).any(axis=1)
                    fails[name] = (
                        "values differ; first spark row "
                        f"{a[mask].head(1).to_dict('records')} vs oracle "
                        f"{b[mask].head(1).to_dict('records')}"
                    )
        except Exception as e:  # noqa: BLE001 — record, keep gating
            fails[name] = f"{type(e).__name__}: {e}"[:300]
            seconds[name] = [round(time.perf_counter() - t0, 3), -1.0]
        if (i + 1) % 10 == 0 or i + 1 == len(names):
            spark._jvm.java.lang.System.gc()
            heap_samples.append(
                {
                    "after_n": i + 1,
                    "jvm_used_mb": used_heap_mb(spark),
                    "persistent_rdds": len(
                        spark.sparkContext._jsc.getPersistentRDDs()
                    ),
                    "py_rss_mb": rss_mb(),
                }
            )
            print(
                f"[{i+1}/{len(names)}] fails={len(fails)} "
                f"heap={heap_samples[-1]['jvm_used_mb']}MB "
                f"rdds={heap_samples[-1]['persistent_rdds']}",
                file=sys.stderr,
            )
    artifact = {
        "sf_dir": sf_dir,
        "n": len(names),
        "passes": len(names) - len(fails),
        "fails": fails,
        "seconds": seconds,
        "heap": heap_samples,
        "total_spark_s": round(sum(v[0] for v in seconds.values()), 1),
        "total_oracle_s": round(sum(v[1] for v in seconds.values() if v[1] >= 0), 1),
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(json.dumps({"n": artifact["n"], "passes": artifact["passes"],
                      "out": out_path}))
    sys.exit(0 if not fails else 1)


if __name__ == "__main__":
    main()
