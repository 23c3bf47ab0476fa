"""Bucketed tables: joins on the bucket key co-locate without a shuffle —
the pre-partitioning strategy for repeated 100 TB joins (SURVEY §4 /
pyspark guide: bucketBy)."""

from __future__ import annotations

import shutil

import pytest

from importer_spark.io import Tables
from tests.conftest import SF_DIR


@pytest.fixture
def bucketed_tables(spark):
    t = Tables(spark, SF_DIR)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        t.orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_skips_shuffle(spark, bucketed_tables):
    # Force the sort-merge path (a broadcast would bypass bucketing and hide
    # the co-location property this test asserts).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Co-located bucketed scans feed the join directly — no shuffle.
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == Tables(spark, SF_DIR).lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
