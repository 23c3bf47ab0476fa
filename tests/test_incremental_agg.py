"""Incremental aggregate maintenance ≡ full recompute, batch by batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from importer_spark.operators.incremental_agg import (
    aggregate_batch,
    merge_aggregate_state,
)

MEASURES = {
    "n": ("count", "*"),
    "revenue": ("sum", "CAST(o_totalprice AS DECIMAL(18,2))"),
    "first_day": ("min", "o_orderdate"),
    "last_day": ("max", "o_orderdate"),
}
KEYS = ["o_orderpriority"]


def _canon(df):
    return sorted(
        (r["o_orderpriority"], r["n"], float(r["revenue"]), str(r["first_day"]), str(r["last_day"]))
        for r in df.collect()
    )


def test_three_batches_equal_full_recompute(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    # Split the fact into 3 disjoint "arrival" batches.
    batches = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    state = None
    for b in batches:
        state = merge_aggregate_state(state, aggregate_batch(b, KEYS, MEASURES), KEYS, MEASURES)
    full = aggregate_batch(orders, KEYS, MEASURES)
    assert _canon(state) == _canon(full)


def test_new_key_appears_only_in_delta(spark):
    s = aggregate_batch(
        spark.createDataFrame([("a", 1.0)], "k string, v double"),
        ["k"], {"n": ("count", "*"), "t": ("sum", "v")},
    )
    d = aggregate_batch(
        spark.createDataFrame([("b", 2.0)], "k string, v double"),
        ["k"], {"n": ("count", "*"), "t": ("sum", "v")},
    )
    out = {
        r["k"]: (r["n"], r["t"])
        for r in merge_aggregate_state(s, d, ["k"], {"n": ("count", "*"), "t": ("sum", "v")}).collect()
    }
    assert out == {"a": (1, 1.0), "b": (1, 2.0)}


def test_unsupported_agg_raises(spark):
    with pytest.raises(ValueError, match="unsupported agg"):
        aggregate_batch(
            spark.createDataFrame([("a", 1.0)], "k string, v double"),
            ["k"], {"m": ("median", "v")},
        )
