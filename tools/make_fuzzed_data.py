"""Derive a NULL-injected copy of a testdata dir for 3VL-semantics fuzzing.

The shipped testdata has no NULLs outside what queries synthesize, so the
oracle gate never exercises three-valued logic: null-skipping aggregates,
null group keys, CASE/comparison propagation, null sort position, join-key
drops. Real warehouse data has all of those. This tool writes a mutated
copy in which ~5% of the values in every fuzzable column are NULL — chosen
deterministically per (row key, column name) via xxhash64, so the mutated
tables are bit-reproducible and both engines read the identical parquet.

Then certify with the ordinary all-catalog gate:

    python tools/make_fuzzed_data.py /root/testdata/sf0.001 /tmp/fuzz
    python tools/run_local_gate.py /tmp/fuzz FUZZ_GATE.json

A pass means Spark and DuckDB agree on every catalog query UNDER NULLS —
a far stronger semantics certification than the clean-data gate.

What is fuzzed (FUZZ_COLS): measures, attributes, dates, and text — the
columns real data goes missing in. What is NOT fuzzed, by contract:
  - keys / ids (*_key, *_id): the pipeline layer guarantees them (the
    reference synthesizes surrogate keys before any mart runs —
    sources/files.py header remap + ID synthesis), and every
    deterministic window tie-break in the catalog leans on them;
  - events.ts: the time axis of the streaming/window family — a null
    timestamp is a malformed event the ingest layer rejects (io.read_jsonl
    null forcing), not a value the analytics layer must order;
  - embeddings.embedding: vector payloads are validated at ingest
    (operators/similarity.py asserts dimensionality); label IS fuzzed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # fuzz_common

# Row identities and the hash gate come from the shared fuzzer scaffolding
# (tools/fuzz_common.py — one map for all three poison axes).
from fuzz_common import ID_COLS, KEY_SUFFIXES, fuzz_session, hash_gate  # noqa: E402

NULL_RATE_DENOM = 20  # 1-in-20 → 5% per fuzzed column

# table -> fuzzable columns (None → all non-key cols, resolved at run)
FUZZ_COLS: dict[str, list[str] | None] = {
    "region": ["r_name"],
    "nation": ["n_name"],
    "supplier": ["s_name"],
    "customer": None,
    "part": ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    "lineitem": [
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
    "events": ["event_type", "value", "props"],
    "documents": ["text", "lang", "source", "n_chars"],
    "embeddings": ["label"],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fuzz"

    from pyspark.sql import functions as F

    spark = fuzz_session("make_fuzzed_data")

    for table, cols in FUZZ_COLS.items():
        id_cols = ID_COLS[table]
        df = spark.read.parquet(f"{src}/{table}.parquet")
        if cols is None:
            cols = [
                c
                for c in df.columns
                if not c.endswith(KEY_SUFFIXES) and c not in id_cols
            ]
        out_cols = []
        for c in df.columns:
            if c in cols:
                gate = hash_gate(table, c, NULL_RATE_DENOM) == 0
                out_cols.append(
                    F.when(gate, F.lit(None).cast(df.schema[c].dataType))
                    .otherwise(F.col(c))
                    .alias(c)
                )
            else:
                out_cols.append(F.col(c))
        mutated = df.select(*out_cols)
        mutated.coalesce(1).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        n_nulled = sum(
            mutated.select(
                *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
            )
            .collect()[0]
            .asDict()
            .values()
        )
        print(f"{table}: fuzzed {cols} -> {out}/{table}.parquet ({n_nulled} nulls)")

    spark.stop()


if __name__ == "__main__":
    main()
