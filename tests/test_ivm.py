"""Incremental join-view maintenance: any insert-only batch schedule must
converge to exactly the one-shot join (multiset semantics, duplicates and
all)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from importer_spark.operators.ivm import join_view_delta, refresh_join_view


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_random_schedules_converge_to_full_join(spark):
    """Randomized splits of both sides into arrival batches; every
    interleaving must reproduce the full join — including duplicate join
    keys on BOTH sides (the multiset case where a missed provenance class
    would under- or double-count)."""
    rng = random.Random(42)
    a_rows = [Row(k=rng.randrange(8), av=i) for i in range(60)]
    b_rows = [Row(k=rng.randrange(8), bv=100 + i) for i in range(40)]
    a_schema, b_schema = "k int, av int", "k int, bv int"
    spark_a = _mk(spark, a_rows, a_schema)
    spark_b = _mk(spark, b_rows, b_schema)
    expected = _rows(spark_a.join(spark_b, ["k"]))

    for trial in range(3):
        rng2 = random.Random(trial)
        cut_a = sorted(rng2.sample(range(1, 60), 2))
        cut_b = sorted(rng2.sample(range(1, 40), 2))
        a_parts = [
            a_rows[: cut_a[0]], a_rows[cut_a[0] : cut_a[1]], a_rows[cut_a[1] :]
        ]
        b_parts = [
            b_rows[: cut_b[0]], b_rows[cut_b[0] : cut_b[1]], b_rows[cut_b[1] :]
        ]
        a_old = _mk(spark, a_parts[0], a_schema)
        b_old = _mk(spark, b_parts[0], b_schema)
        view = refresh_join_view(None, a_old, None, b_old, None, ["k"])
        for step in (1, 2):
            da = _mk(spark, a_parts[step], a_schema)
            db = _mk(spark, b_parts[step], b_schema)
            view = refresh_join_view(view, a_old, da, b_old, db, ["k"])
            a_old = a_old.unionByName(da)
            b_old = b_old.unionByName(db)
        assert _rows(view) == expected, f"trial {trial}"


def test_one_sided_delta(spark):
    a = _mk(spark, [Row(k=1, av=1), Row(k=2, av=2)], "k int, av int")
    b = _mk(spark, [Row(k=1, bv=10), Row(k=2, bv=20)], "k int, bv int")
    da = _mk(spark, [Row(k=2, av=3)], "k int, av int")
    view = refresh_join_view(None, a, None, b, None, ["k"])
    view = refresh_join_view(view, a, da, b, None, ["k"])
    full = a.unionByName(da).join(b, ["k"])
    assert _rows(view) == _rows(full)
    assert join_view_delta(a, None, b, None, ["k"]) is None


def test_bootstrap_with_deltas_raises(spark):
    a = _mk(spark, [Row(k=1, av=1)], "k int, av int")
    b = _mk(spark, [Row(k=1, bv=1)], "k int, bv int")
    with pytest.raises(ValueError):
        refresh_join_view(None, a, a, b, None, ["k"])
