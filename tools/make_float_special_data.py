"""Derive a NaN/±Inf-injected copy of a testdata dir for float-special
robustness smoking.

The NULL fuzz gate (make_fuzzed_data.py) certifies three-valued logic;
this tool covers the OTHER dirty-float axis: IEEE specials. ~1% each of
NaN / +Inf / -Inf are injected into every DOUBLE/FLOAT column and into
embedding vector COMPONENTS — chosen deterministically per (row key,
column) via xxhash64 so the mutated tables are bit-reproducible.

Value parity under specials is NOT a meaningful contract (Spark and
DuckDB disagree by design on NaN ordering/equality edge cases, and the
catalog's documented precondition for the ANN stack is finite
embeddings — non-finite vectors self-exclude, see
operators/similarity.row_normalize). What MUST hold is that no query
CRASHES or hangs on special-bearing data:

    python tools/make_float_special_data.py /root/testdata/sf0.01 /tmp/fspec
    python tools/run_smoke_gate.py /tmp/fspec FLOATSPECIAL_SMOKE.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # fuzz_common

# Row identities and the hash gate come from the shared fuzzer scaffolding
# (tools/fuzz_common.py — one map for all three poison axes).
from fuzz_common import fuzz_session, hash_gate  # noqa: E402

RATE_DENOM = 100  # 3 specials × 1% each

# table -> float columns to poison
SPECIAL_COLS: dict[str, list[str]] = {
    "part": ["p_retailprice"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "events": ["value"],
    "embeddings": ["embedding"],  # array: poisons components
}

PASSTHROUGH = ["region", "nation", "supplier", "customer", "documents"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fspec"

    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType

    spark = fuzz_session("make_float_special_data")

    for table in PASSTHROUGH:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: copied")

    for table, cols in SPECIAL_COLS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        out_cols = []
        for c in df.columns:
            if c not in cols:
                out_cols.append(F.col(c))
                continue
            dt = df.schema[c].dataType
            gate = hash_gate(table, c, RATE_DENOM)
            if isinstance(dt, ArrayType):
                # poison ONE component (the first) of ~3% of vectors
                elem = dt.elementType.simpleString()
                special = (
                    F.when(gate == 0, F.lit(float("nan")))
                    .when(gate == 1, F.lit(float("inf")))
                    .when(gate == 2, F.lit(float("-inf")))
                ).cast(elem)
                mutated_col = F.when(
                    gate <= 2,
                    F.concat(
                        F.array(special), F.slice(F.col(c), 2, F.size(F.col(c)))
                    ),
                ).otherwise(F.col(c))
                out_cols.append(mutated_col.alias(c))
            else:
                special = (
                    F.when(gate == 0, F.lit(float("nan")))
                    .when(gate == 1, F.lit(float("inf")))
                    .when(gate == 2, F.lit(float("-inf")))
                ).cast(dt.simpleString())
                out_cols.append(
                    F.when(gate <= 2, special).otherwise(F.col(c)).alias(c)
                )
        mutated = df.select(*out_cols)
        mutated.coalesce(1).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: poisoned {cols} -> {out}/{table}.parquet")

    spark.stop()


if __name__ == "__main__":
    main()
