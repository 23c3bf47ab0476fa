"""Derive an adversarially SKEWED copy of a testdata dir — the fourth
poison axis after NULLs, float specials, and adversarial Unicode (r7
verdict #2).

The shipped testdata's keys are near-uniform, so no gate ever exercises
the known 100-TB risk SURVEY §2 J11 flags: one hot key holding a large
fraction of the fact rows (the celebrity-user / default-account /
unknown-part pathology every production warehouse grows). This tool
re-targets ~HALF of every fact-side foreign key onto ONE existing hot
dimension key, deterministically per row via the shared xxhash64 gate —
bit-reproducible, both engines read the identical parquet — and makes
~half of each dimension's NAME column one shared value (name-keyed joins
and groupBys get a hot group, while DISTINCT-first operators like the
fuzzy join collapse it).

Skewed:
  - orders.o_custkey      → hot c_custkey   (≈50% of orders, one customer)
  - lineitem.l_partkey    → hot p_partkey   (≈50% of lineitems, one part)
  - lineitem.l_suppkey    → hot s_suppkey   (≈50% of lineitems)
  - events.user_id        → hot user_id     (≈50% of events, one user)
  - customer.c_name, part.p_name, supplier.s_name → one shared hot name
    on ≈50% of rows (names are NOT join keys of record, so referential
    integrity is untouched; groupBy/window/consolidation paths get the
    hot group)
  - documents.lang        → 'en' on ≈80% of labeled docs (one dominant
    class for the NB family — class skew, not text duplication)

NOT skewed, deliberately:
  - primary keys / row identities (o_orderkey, (l_orderkey, l_linenumber),
    doc_id, vec_id, ...): uniqueness contracts and window tie-breaks;
  - documents.text / embeddings.embedding: duplicating text or vectors
    multiplies the TRUE near-dup pair set ~quadratically — that is
    output-size growth (covered by the emit-cap family + Zipf recall
    tooling), not key skew; this axis poisons the JOIN/AGG layer.

The hot key per table is the MINIMUM existing dimension key (deterministic,
always referentially valid). Then certify with the ordinary gate — every
catalog query must still VALUE-match DuckDB on the skewed data, and the
engine side must actually finish (a partition-strategy that dies on a hot
key shows up as a timeout/fail here):

    python tools/make_scaled_data.py 10 /tmp/sf1
    python tools/make_skewed_data.py /tmp/sf1 /tmp/skew1
    python tools/run_local_gate.py /tmp/skew1 SKEW_GATE.json

Usage: python tools/make_skewed_data.py [src_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # fuzz_common

from fuzz_common import ID_COLS, fuzz_session, hash_gate  # noqa: E402

SKEW_DENOM = 2  # 1-in-2 fact rows re-targeted to the hot key
HOT_NAME = "GLOBAL DEFAULT ACCOUNT"
LANG_DENOM = 5  # 4-in-5 labeled docs become 'en'

# (table, column, kind): kind 'fk' re-targets to the hot dimension key,
# 'name' overwrites with HOT_NAME, 'lang' overwrites with 'en'.
SKEW_COLS: list[tuple[str, str, str]] = [
    ("orders", "o_custkey", "fk:customer:c_custkey"),
    ("lineitem", "l_partkey", "fk:part:p_partkey"),
    ("lineitem", "l_suppkey", "fk:supplier:s_suppkey"),
    ("events", "user_id", "fk:events:user_id"),
    ("customer", "c_name", "name"),
    ("part", "p_name", "name"),
    ("supplier", "s_name", "name"),
    ("documents", "lang", "lang"),
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew"

    from pyspark.sql import functions as F

    spark = fuzz_session("make_skewed_data")

    # Hot key per referenced dimension: the MIN existing key (deterministic,
    # referentially valid by construction).
    hot: dict[str, int] = {}
    for spec in {k.split(":", 1)[1] for _, _, k in SKEW_COLS if k.startswith("fk:")}:
        dim_table, dim_key = spec.split(":")
        df = spark.read.parquet(f"{src}/{dim_table}.parquet")
        hot[spec] = df.agg(F.min(dim_key)).collect()[0][0]
        print(f"hot {spec} = {hot[spec]}")

    per_table: dict[str, list[tuple[str, str]]] = {}
    for table, col, kind in SKEW_COLS:
        per_table.setdefault(table, []).append((col, kind))

    for table in ID_COLS:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        out_cols = []
        for c in df.columns:
            spec = next((k for col, k in per_table.get(table, []) if col == c), None)
            if spec is None:
                out_cols.append(F.col(c))
                continue
            if spec.startswith("fk:"):
                gate = hash_gate(table, c, SKEW_DENOM, salt="skew") == 0
                hot_val = F.lit(hot[spec.split(":", 1)[1]]).cast(
                    dict(df.dtypes)[c]
                )
                expr = F.when(gate & F.col(c).isNotNull(), hot_val).otherwise(
                    F.col(c)
                )
            elif spec == "name":
                gate = hash_gate(table, c, SKEW_DENOM, salt="skew") == 0
                expr = F.when(gate & F.col(c).isNotNull(), F.lit(HOT_NAME)).otherwise(
                    F.col(c)
                )
            else:  # lang
                gate = hash_gate(table, c, LANG_DENOM, salt="skew") > 0
                expr = F.when(gate & F.col(c).isNotNull(), F.lit("en")).otherwise(
                    F.col(c)
                )
            out_cols.append(expr.alias(c))
        mutated = df.select(*out_cols)
        # Keep the source file layout (multi-file at sf1) so scan
        # parallelism matches the unskewed twin — the gate then isolates
        # KEY skew, not a layout change.
        n_files = len(
            [
                f
                for f in os.listdir(f"{src}/{table}.parquet")
                if f.endswith(".parquet")
            ]
        ) if os.path.isdir(f"{src}/{table}.parquet") else 1
        mutated.repartition(n_files).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
        changed = per_table.get(table, [])
        if changed:
            for col, kind in changed:
                top = (
                    spark.read.parquet(f"{out}/{table}.parquet")
                    .groupBy(col)
                    .count()
                    .orderBy(F.desc("count"))
                    .first()
                )
                print(f"{table}.{col} [{kind}]: top value {top[0]!r} x{top[1]}")
        else:
            print(f"{table}: copied unskewed")

    spark.stop()


if __name__ == "__main__":
    main()
