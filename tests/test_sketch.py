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
