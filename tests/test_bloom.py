"""Bloom join pruning: zero false negatives (exact equality with the plain
join), the pre-filter really prunes, the probe stays JVM-side (no Python
eval in the plan), and the oracle-parity gate holds."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from importer_spark.operators.bloom import (
    bloom_semi_join,
    build_bloom_words,
    might_contain,
)
from tests.conftest import SF_DIR, assert_query_matches


def test_no_false_negatives_and_some_pruning(spark):
    build = spark.createDataFrame([Row(k=i * 7) for i in range(50)])
    probe = spark.createDataFrame([Row(k=i) for i in range(1000)])
    words = build_bloom_words(build, "k", n_bits=1 << 10)
    kept = probe.filter(might_contain(F.col("k"), words, 1 << 10)).collect()
    kept_keys = {r.k for r in kept}
    member = {i * 7 for i in range(50)} & set(range(1000))
    assert member <= kept_keys  # every true member survives
    # with 1024 bits / 50 keys the filter must reject most non-members
    assert len(kept_keys) < 400


def test_bloom_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [Row(fk=i % 37, v=i) for i in range(500)]
    )
    dim = spark.createDataFrame([Row(dk=k, tag=f"t{k}") for k in (0, 5, 11, 36, 99)])
    got = sorted(
        (r.fk, r.v, r.tag)
        for r in bloom_semi_join(fact, dim, "fk", "dk", n_bits=256).collect()
    )
    want = sorted(
        (r.fk, r.v, r.tag)
        for r in fact.join(dim, fact["fk"] == dim["dk"]).collect()
    )
    assert got == want and len(want) > 0


def test_probe_is_codegen_not_python(spark):
    build = spark.createDataFrame([Row(k=i) for i in range(10)])
    probe = spark.createDataFrame([Row(k=i) for i in range(100)])
    words = build_bloom_words(build, "k", n_bits=256)
    plan = (
        probe.filter(might_contain(F.col("k"), words, 256))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_build_rejects_bad_bits(spark):
    build = spark.createDataFrame([Row(k=1)])
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom_words(build, "k", n_bits=100)


def test_bloom_oracle_parity(spark):
    assert_query_matches(spark, "bloom_pruned_revenue", SF_DIR)
