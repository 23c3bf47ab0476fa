"""Derive a ~10× dataset from the driver's sf0.1 tables for SCALING
measurements (PERF.md): union K key-offset copies of each table, keeping
every foreign key consistent (copy i offsets all *key/id columns by
i × stride). Output is multi-file parquet, so scans parallelize like real
warehouse data (the shipped sf0.1 files are single-row-group → single-task
scans; see PERF.md round 3).

Document text and embedding vectors are PERTURBED per copy (copy 0 stays
byte-identical to the source). Verbatim copies would make every doc a
near-dup of its 9 twins, blowing the near-dup pair count up ~K² — a
data-generation artifact that turns every similarity operator (and its
DuckDB oracle) quadratic in K instead of linear in rows. Perturbation
keeps the dup structure per-copy: 10× rows → 10× similarity work, which
is the scaling a real 10× corpus exhibits.
  - documents: every token in copy i>0 gets an `_i` suffix (one
    regexp_replace), so cross-copy shingle sets are disjoint (Jaccard 0)
    while within-copy near-dup pairs replicate the source corpus exactly.
  - embeddings: copy i>0 multiplies every vector by ONE deterministic
    ±1 sign vector s_i (from xxhash64(dim_index, i)). dot(s⊙x, s⊙y) =
    dot(x, y), so each copy is an exact isometry of the source corpus —
    within-copy similarity structure (near-dup pairs, top-k, clusters)
    replicates sf0.1 exactly. Cross-copy cosines decorrelate only in
    EXPECTATION: the twin cosine x·(s⊙x)/|x|² has σ ≈ 1/√d_eff (≈0.21
    for this corpus's effective dimension ~23), so a low pair threshold
    (0.45 here) still admits a tail of real cross-copy pairs. Those are
    genuine properties of the scaled dataset — the similarity gate
    certifies the embedding family per-copy plus against the exact
    oracle run at scale, rather than expecting zero cross-copy pairs
    (tools/verify_scaled_similarity.py).

This data is for performance experiments only — correctness gates always
run on the driver's own testdata.

Usage: python tools/make_scaled_data.py [K] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 10_000_000  # far above any sf0.1 key

# Columns to offset per table (join keys stay consistent across tables).
KEY_COLS = {
    "region": [],
    "nation": [],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    from pyspark.sql import functions as F

    from importer_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled"
    src = "/root/testdata/sf0.1"
    spark = get_spark(app_name="make-scaled", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    for table, keys in KEY_COLS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        if keys and k > 1:
            copies = []
            for i in range(k):
                c = df
                for col in keys:
                    c = c.withColumn(col, F.col(col) + F.lit(i * STRIDE))
                if i > 0 and table == "documents":
                    # Disjoint shingle space per copy (see module docstring).
                    c = c.withColumn(
                        "text", F.regexp_replace("text", r"(\S+)", rf"$1_{i}")
                    ).withColumn("n_chars", F.length("text").cast("long"))
                if i > 0 and table == "embeddings":
                    # ONE ±1 sign vector per copy (per-dim, NOT per-vector):
                    # an isometry on dot products within the copy.
                    def _sign_flip(copy_idx):
                        def flip(x, j):
                            sign = F.when(
                                F.pmod(F.xxhash64(j, F.lit(copy_idx)), 2) == 0,
                                F.lit(1.0),
                            ).otherwise(F.lit(-1.0))
                            return x * sign

                        return flip

                    c = c.withColumn(
                        "embedding",
                        F.transform("embedding", _sign_flip(i)).cast("array<float>"),
                    )
                copies.append(c)
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
            n_files = 16
        else:
            scaled = df  # dims without keys stay as-is (joins still match)
            n_files = 1
        scaled.repartition(n_files).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
        print(f"{table}: x{k if keys else 1} -> {out}/{table}.parquet")


if __name__ == "__main__":
    main()
