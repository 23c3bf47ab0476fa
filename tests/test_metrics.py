"""Semantic metric layer: single-scan compilation, gates, ratios, errors."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from importer_spark.metrics import Metric, compile_metrics


@pytest.fixture()
def fact(spark):
    return spark.createDataFrame(
        [
            Row(seg="A", cust=1, amount=10.0, pri="hi"),
            Row(seg="A", cust=1, amount=20.0, pri="lo"),
            Row(seg="A", cust=2, amount=5.0, pri="hi"),
            Row(seg="B", cust=3, amount=7.0, pri="lo"),
        ]
    )


def test_metrics_values(fact):
    out = {
        r["seg"]: r
        for r in compile_metrics(
            fact,
            [
                Metric("n", "count"),
                Metric("custs", "count_distinct", "cust"),
                Metric("total", "sum", "amount"),
                Metric("hi_n", "count", where="pri = 'hi'"),
                Metric("hi_share", "ratio", num="hi_n", den="n"),
            ],
            dimensions=["seg"],
        ).collect()
    }
    a = out["A"]
    assert (a["n"], a["custs"], a["total"], a["hi_n"]) == (3, 2, 35.0, 2)
    assert a["hi_share"] == 2 / 3
    assert out["B"]["hi_n"] == 0


def test_query_level_where_pushes_down(fact, spark):
    out = compile_metrics(
        fact, [Metric("n", "count")], dimensions=["seg"], where="amount > 6"
    ).collect()
    assert {r["seg"]: r["n"] for r in out} == {"A": 2, "B": 1}


def test_single_scan_plan(fact):
    df = compile_metrics(
        fact,
        [Metric("n", "count"), Metric("total", "sum", "amount"),
         Metric("hi_n", "count", where="pri = 'hi'")],
        dimensions=["seg"],
    )
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    import re

    # One pass over the fact: a single scan node in the numbered detail
    # section (the tree repeats it, so count "(n) Scan" headers).
    assert len(re.findall(r"\(\d+\) Scan", plan)) == 1


def test_ratio_needs_base_metrics(fact):
    with pytest.raises(ValueError, match="base metrics"):
        compile_metrics(fact, [Metric("r", "ratio", num="x", den="y")], ["seg"])


def test_zero_denominator_is_null(spark):
    fact = spark.createDataFrame([Row(seg="A", ok=0)])
    out = compile_metrics(
        fact,
        [Metric("k", "count", where="ok = 1"),
         Metric("n", "count"),
         Metric("bad", "ratio", num="n", den="k")],
        ["seg"],
    ).collect()
    assert out[0]["bad"] is None
