"""No-crash smoke gate: run EVERY catalog query (and diagnostic) against a
data directory and record per-query row counts / errors — no oracle
compare. The robustness companion to run_local_gate.py for inputs where
cross-engine value parity is not a meaningful contract (IEEE float
specials: Spark and DuckDB disagree by design on NaN ordering/equality
edges), but "the engine never crashes, hangs, or poisons unrelated rows"
is.

    python tools/make_float_special_data.py /root/testdata/sf0.01 /tmp/fspec
    python tools/run_smoke_gate.py /tmp/fspec FLOATSPECIAL_SMOKE.json

A query passes when it fully materializes through the noop sink — which
evaluates EVERY output column (a bare .count() lets Catalyst prune
projections, so a crash-prone expression over a NaN/Inf column could go
unexecuted; r6 advice) — and then reports its row count from a separate
count job. Failures record the exception head.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    data_dir = argv[0] if argv else "/tmp/fspec"
    out_path = argv[1] if len(argv) > 1 else "FLOATSPECIAL_SMOKE.json"

    from importer_spark.queries import DIAGNOSTICS, QUERIES
    from importer_spark.session import get_spark

    spark = get_spark(
        app_name="smoke-gate",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    catalog = {**QUERIES, **DIAGNOSTICS}
    results: dict[str, dict] = {}
    fails: dict[str, str] = {}
    t0 = time.perf_counter()
    for name in sorted(catalog):
        try:
            df = catalog[name](spark, data_dir)
            # Noop sink first: materializes all columns (the no-crash
            # certification); count() alone would let column pruning skip
            # the very expressions this gate exists to execute.
            df.write.format("noop").mode("overwrite").save()
            results[name] = {"rows": int(df.count())}
        except Exception as exc:  # record, keep smoking
            head = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
            results[name] = {"error": head}
            fails[name] = head
            print(f"FAIL {name}: {head}", flush=True)
    from importer_spark.cert import cert_stamp

    summary = {
        "cert": cert_stamp(),
        "n": len(results),
        "fails": fails,
        "data_dir": data_dir,
        "wall_s": round(time.perf_counter() - t0, 1),
        "queries": results,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps({"n": len(results), "n_fails": len(fails), "out": out_path}))


if __name__ == "__main__":
    main()
