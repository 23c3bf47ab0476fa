"""Print the full first differing rows for catalog queries on a data dir.

Usage: python tools/diff_query.py <sf_dir> <name> [<name> ...]

Debugging companion to run_local_gate.py, whose FAIL lines truncate. Shows
column-by-column cells of the first rows where Spark and the DuckDB oracle
disagree (after the same canonicalization the gate uses).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from tests.conftest import canonical, duck_con

    from importer_spark.queries import ORACLES, QUERIES
    from importer_spark.session import get_spark

    spark = get_spark(app_name="diff-query", master="local[8]", shuffle_partitions=8)
    con = duck_con(sf_dir)
    for name in names:
        print(f"===== {name} =====")
        sdf = QUERIES[name](spark, sf_dir).toPandas()
        odf = con.execute(ORACLES[name]).df()
        print(f"rows spark={len(sdf)} oracle={len(odf)}")
        a, b = canonical(sdf), canonical(odf)
        if len(a) != len(b):
            # row-count mismatch: show rows present in one side only
            at = set(map(tuple, a.itertuples(index=False)))
            bt = set(map(tuple, b.itertuples(index=False)))
            print("cols:", list(a.columns))
            print("spark-only (5):")
            for r in list(at - bt)[:5]:
                print(" ", r)
            print("oracle-only (5):")
            for r in list(bt - at)[:5]:
                print(" ", r)
            continue
        if a.equals(b):
            print("MATCH")
            continue
        diff_mask = (a != b).any(axis=1)
        sa, sb = a[diff_mask].head(4), b[diff_mask].head(4)
        for (_, ra), (_, rb) in zip(sa.iterrows(), sb.iterrows()):
            print("--- row ---")
            for c in a.columns:
                marker = "  " if ra[c] == rb[c] else "->"
                print(f" {marker} {c}: spark={ra[c]!r} oracle={rb[c]!r}")
    spark.stop()


if __name__ == "__main__":
    main()
