"""int8 quantization kernels: value bounds, zero-vector guard, and the
recall of quantized candidate generation against exact brute force."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from importer_spark.operators.similarity import int_dot, max_abs, quantize_int8
from importer_spark.queries import DIAGNOSTICS, QUERIES
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


def test_pq_topk_recall_vs_exact(spark):
    """PQ ADC candidates + exact rescore: recall vs brute force. The 4-code
    ADC ranking is coarse (that is its bandwidth point); recall is restored
    by the 4k-candidate rescore, and emitted scores are exact."""
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in QUERIES["embedding_cosine_topk"](spark, SF_DIR).collect()
    }
    pq = {
        (r.probe_id, r.neighbor_id)
        for r in DIAGNOSTICS["embedding_pq_topk"](spark, SF_DIR).collect()
    }
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.5, f"PQ ANN recall {recall:.2f} < 0.5"


def test_pq_encode_shapes_and_determinism(spark):
    from importer_spark.operators.quantization import pq_encode, pq_train
    from importer_spark.io import Tables
    from importer_spark.operators.similarity import as_double_array

    t = Tables(spark, SF_DIR)
    e = t.embeddings.select("vec_id", as_double_array(F.col("embedding")).alias("emb"))
    books = pq_train(e, "vec_id", "emb", dim=64, m=4, ksub=16, iters=1, sample_mod=2)
    assert len(books) == 4 and all(len(b) == 16 for b in books)
    c1 = {r.vec_id: list(r.codes) for r in pq_encode(e, "vec_id", "emb", books).collect()}
    c2 = {r.vec_id: list(r.codes) for r in pq_encode(e, "vec_id", "emb", books).collect()}
    assert c1 == c2
    assert all(0 <= x < 16 for v in c1.values() for x in v)
