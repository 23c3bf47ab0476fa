"""Shared scaffolding for the three poison-axis fuzzers
(make_fuzzed_data.py NULLs, make_float_special_data.py IEEE specials,
make_unicode_fuzzed_data.py adversarial text).

ONE source of truth for the per-table row-identity columns and the
deterministic hash gate: a table or key added here reaches every axis,
so no poison gate can silently drift out of coverage (r7 review — the
map was previously hand-copied per tool)."""

from __future__ import annotations

# table -> row-identity columns for the deterministic per-(row, column)
# mutation hash. Keys/ids themselves are never mutated by any axis: the
# pipeline layer synthesizes them (sources/files.py header remap + ID
# synthesis) and every deterministic window tie-break leans on them.
ID_COLS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "supplier": ["s_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber", "l_partkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

KEY_SUFFIXES = ("key", "_id")


def fuzz_session(app_name: str):
    """The common local session every fuzzer uses."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName(app_name)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def hash_gate(table: str, col_name: str, denom: int, salt: str = ""):
    """pmod(xxhash64(row-identity, col [, salt]), denom) — the
    bit-reproducible mutation selector shared by every axis."""
    from pyspark.sql import functions as F

    ids = [F.col(k) for k in ID_COLS[table]]
    lits = [F.lit(col_name)] + ([F.lit(salt)] if salt else [])
    return F.pmod(F.xxhash64(*ids, *lits), denom)
