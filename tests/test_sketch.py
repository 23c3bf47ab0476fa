"""frequent_items: exactness vs a full GROUP BY on adversarial layouts —
heavy items spread thin across partitions, vocabulary >> counter budget."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from importer_spark.operators.sketch import _space_saving_update, frequent_items


def _exact(df, col, den):
    src = df.select(F.col(col).alias("item")).filter(F.col("item").isNotNull())
    n = src.count()
    return {
        (r.item, r.cnt)
        for r in src.groupBy("item").agg(F.count("*").alias("cnt")).collect()
        if r.cnt * den >= n
    }


def test_frequent_items_matches_exact_groupby(spark):
    # 10k rows: item "hh" at 5%, "edge" exactly at the 2% threshold, and a
    # long tail of ~7.4k distinct items that overflow the 51-counter budget.
    rows = (
        [Row(v="hh")] * 500
        + [Row(v="edge")] * 200
        + [Row(v=f"tail{i}") for i in range(9300)]
    )
    df = spark.createDataFrame(rows).repartition(16)  # heavy items spread thin
    got = {(r.item, r.cnt) for r in frequent_items(df, "v", 50).collect()}
    assert got == _exact(df, "v", 50)
    assert ("hh", 500) in got and ("edge", 200) in got


def test_frequent_items_ignores_nulls_and_validates_den(spark):
    df = spark.createDataFrame([Row(v="a"), Row(v=None), Row(v="a"), Row(v="b")])
    got = {(r.item, r.cnt) for r in frequent_items(df, "v", 2).collect()}
    # N=3 non-null; a:2 qualifies (2*2>=3), b:1 does not (1*2<3).
    assert got == {("a", 2)}
    with pytest.raises(ValueError, match="den"):
        frequent_items(df, "v", 0)


def test_space_saving_superset_guarantee_property():
    """Any item with count > n/k survives a k-counter summary — the textbook
    Space-Saving bound, checked on a worst-case interleaving."""
    k = 11
    stream = []
    for i in range(1000):
        stream.append(("hot", 1) if i % 5 == 0 else (f"cold{i}", 1))
    counters: dict = {}
    for item, w in stream:
        _space_saving_update(counters, item, w, k)
    assert "hot" in counters  # 200 of 1000 > 1000/11
    assert len(counters) <= k


def test_hll_rollup_equals_direct_sketch(spark):
    """Sketch union is lossless at fixed lg_k: merging per-day partials must
    give EXACTLY the estimate of sketching the whole table directly."""
    from pyspark.sql import functions as F

    from importer_spark.io import Tables
    from importer_spark.operators.sketch import hll_partial_sketches, hll_rollup_estimate

    t = Tables(spark, "/root/testdata/sf0.001")
    ev = t.events.withColumn("day", F.to_date("ts"))
    daily = hll_partial_sketches(ev, ["event_type", "day"], "user_id")
    merged = {
        r["event_type"]: r["approx_users"]
        for r in hll_rollup_estimate(daily, ["event_type"], "approx_users").collect()
    }
    direct = {
        r["event_type"]: r["approx_users"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("approx_users"))
        .collect()
    }
    assert merged == direct


def test_hll_estimate_error_bound(spark):
    """lg_k=12 → relative error ~1.6%; assert a generous 5% bound vs exact."""
    from pyspark.sql import functions as F

    from importer_spark.io import Tables
    from importer_spark.operators.sketch import hll_partial_sketches, hll_rollup_estimate

    t = Tables(spark, "/root/testdata/sf0.001")
    ev = t.events.withColumn("day", F.to_date("ts"))
    approx = {
        r["event_type"]: r["approx_users"]
        for r in hll_rollup_estimate(
            hll_partial_sketches(ev, ["event_type", "day"], "user_id"),
            ["event_type"],
            "approx_users",
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)
