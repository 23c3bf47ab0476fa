"""r10 de-risk prototype: can the interpreted-HOF cosine (zip_with +
aggregate — the hot expression of the margin/ANN verify paths) be
replaced by an Arrow-batched Pandas UDF WITHOUT changing a single output
bit?

The trick: per-DIMENSION accumulation (acc += x[:,d]*y[:,d], d
ascending) performs exactly the same sequence of correctly-rounded
float64 operations per pair as the JVM's sequential fold — vectorized
ACROSS pairs, not within one — so the results are bitwise-identical
while numpy does the arithmetic. This script measures both and asserts
exact equality; it changes no product code.

Usage: python tools/prototype_vectorized_cosine.py [n_pairs] [dims]
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    from importer_spark.operators.similarity import cosine
    from importer_spark.session import get_spark

    spark = get_spark(
        app_name="proto-vec-cosine", master="local[16]", shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")

    @pandas_udf("double")
    def cos_vec(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        A = np.asarray(a.tolist(), dtype="float64")
        B = np.asarray(b.tolist(), dtype="float64")
        d_ab = np.zeros(len(A))
        d_aa = np.zeros(len(A))
        d_bb = np.zeros(len(A))
        # per-DIM ascending accumulation == the JVM fold's op order per pair
        for d in range(A.shape[1]):
            d_ab += A[:, d] * B[:, d]
            d_aa += A[:, d] * A[:, d]
            d_bb += B[:, d] * B[:, d]
        return pd.Series(d_ab / (np.sqrt(d_aa) * np.sqrt(d_bb)))

    # deterministic synthetic pairs: two derived 64-dim vectors per id
    mk = lambda seed: F.array(  # noqa: E731
        *[
            (F.xxhash64(F.col("id") + F.lit(seed * 1000 + d)) % 997).cast("double")
            / 997.0
            for d in range(dims)
        ]
    )
    # materialize the pair table so the bench measures the COSINE, not the
    # 128 xxhash64 calls per row that synthesize the vectors
    path = f"/tmp/proto_vec_cosine_{n}_{dims}.parquet"
    if not os.path.exists(path):
        spark.range(n).select("id", mk(1).alias("a"), mk(2).alias("b")).write.mode(
            "overwrite"
        ).parquet(path)
    base = spark.read.parquet(path)
    base.count()  # warm footers/page cache

    def bench(col, label):
        df = base.select(col.alias("c"))
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{label:14s} {n} pairs x {dims} dims: {dt:6.2f} s "
              f"({n/dt/1e6:.2f} M pairs/s)")
        return dt

    def cos_codegen(a, b):
        """Static expanded expression: same left-to-right fold order, but
        whole-stage-codegen'd — no interpreted lambda, no Arrow hop."""
        def dot_cg(x, y):
            acc = F.lit(0.0)
            for d in range(1, dims + 1):
                acc = acc + F.element_at(x, d) * F.element_at(y, d)
            return acc
        return dot_cg(a, b) / (F.sqrt(dot_cg(a, a)) * F.sqrt(dot_cg(b, b)))

    t_hof = bench(cosine(F.col("a"), F.col("b")), "HOF fold")
    t_vec = bench(cos_vec(F.col("a"), F.col("b")), "pandas perdim")
    t_cg = bench(cos_codegen(F.col("a"), F.col("b")), "codegen expand")
    print(f"speedup pandas: {t_hof / t_vec:.2f}x   codegen: {t_hof / t_cg:.2f}x")

    # bitwise equality on a 200k sample
    sample = base.limit(200_000).select(
        cosine(F.col("a"), F.col("b")).alias("h"),
        cos_vec(F.col("a"), F.col("b")).alias("v"),
        cos_codegen(F.col("a"), F.col("b")).alias("c"),
    )
    bad = sample.filter(
        ~(F.col("h").eqNullSafe(F.col("v")) & F.col("h").eqNullSafe(F.col("c")))
    ).count()
    print(f"bitwise mismatches in 200k: {bad}")
    assert bad == 0, "a variant is NOT bit-identical to the fold"
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
