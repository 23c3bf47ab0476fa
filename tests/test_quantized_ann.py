"""int8 quantization kernels: value bounds, zero-vector guard, and the
recall of quantized candidate generation against exact brute force."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from importer_spark.operators.similarity import int_dot, max_abs, quantize_int8
from importer_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_quantize_int8_bounds_and_zero_vector(spark):
    df = spark.createDataFrame(
        [
            Row(id=0, v=[3.0, -1.5, 0.25, -3.0]),
            Row(id=1, v=[0.0, 0.0, 0.0, 0.0]),  # zero vector -> zeros, no NaN
            Row(id=2, v=[1e-8, -1e-8, 0.0, 1e-8]),
        ]
    ).select("id", F.col("v").cast("array<double>").alias("v"))
    q = df.select(
        "id", quantize_int8(F.col("v"), max_abs(F.col("v"))).alias("q")
    ).collect()
    out = {r.id: r.q for r in q}
    # floor semantics: max magnitude maps to ±127; -3.0 -> floor(-127.0) = -127
    assert out[0] == [127, -64, 10, -127]
    assert out[1] == [0, 0, 0, 0]
    assert all(-128 <= x <= 127 for r in q for x in r.q)


def test_int_dot_exact(spark):
    df = spark.createDataFrame([Row(a=[127, -127, 64], b=[127, 127, -64])])
    a = F.col("a").cast("array<long>")
    b = F.col("b").cast("array<long>")
    assert df.select(int_dot(a, b).alias("d")).first().d == 127 * 127 - 127 * 127 - 64 * 64


def test_quantized_topk_recall_vs_exact(spark):
    """Final quantized+rescored top-k must substantially agree with exact
    brute-force top-k; disagreements are bounded recall loss from stage-1
    candidate truncation, never wrong scores (everything emitted is exactly
    rescored)."""
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in QUERIES["embedding_cosine_topk"](spark, SF_DIR).collect()
    }
    quant = {
        (r.probe_id, r.neighbor_id)
        for r in QUERIES["embedding_quantized_topk"](spark, SF_DIR).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, f"quantized ANN recall {recall:.2f} < 0.8"
