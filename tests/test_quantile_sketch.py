"""KLL quantile sketch: exact mass conservation, deterministic compaction,
rank-error bounds (single sketch AND arbitrary merge orders), and the
Spark partials-then-merge path against exact percentiles."""

from __future__ import annotations

import random

import numpy as np
import pytest

from importer_spark.operators.quantiles import (
    KLLSketch,
    quantile_estimates,
    quantile_sketch_partials,
)

K = 200
# Deterministic-compactor empirical rank error at k=200 is well under 1%;
# pinned with margin. (The randomized-KLL analytic bound at this k is
# ~2.3/k ≈ 1.15% with constant ~2.3.)
EPS = 0.02


def _rank_errors(sk: KLLSketch, data: list[float]) -> float:
    """max |estimated rank - true rank| / n over a probe grid."""
    s = sorted(data)
    n = len(s)
    worst = 0.0
    for q in np.linspace(0.01, 0.99, 33):
        v = s[int(q * (n - 1))]
        true_rank = np.searchsorted(s, v, side="right")
        worst = max(worst, abs(sk.rank(v) - true_rank) / n)
    return worst


def test_mass_exactly_conserved():
    rng = random.Random(1)
    sk = KLLSketch(K)
    total = 0
    for chunk in range(40):
        vals = [rng.gauss(0, 1) for _ in range(997)]  # odd size on purpose
        sk.extend(vals)
        total += len(vals)
        assert sk.n == total  # leftover rule keeps mass exact at every step


def test_single_sketch_rank_error_bound():
    rng = random.Random(2)
    data = [rng.lognormvariate(0, 1) for _ in range(50_000)]
    sk = KLLSketch(K)
    sk.extend(data)
    assert _rank_errors(sk, data) <= EPS


def test_sorted_and_reversed_input_order():
    """Adversarial orders for a deterministic compactor."""
    data = [float(i) for i in range(30_000)]
    for stream in (data, data[::-1]):
        sk = KLLSketch(K)
        sk.extend(stream)
        assert _rank_errors(sk, data) <= EPS


def test_merge_any_order_within_bound():
    rng = random.Random(3)
    data = [rng.gauss(10, 3) for _ in range(40_000)]
    chunks = [data[i::8] for i in range(8)]
    sketches = []
    for c in chunks:
        s = KLLSketch(K)
        s.extend(c)
        sketches.append(s)
    # linear merge and pairwise-tree merge must BOTH honor the bound
    linear = sketches[0]
    for s in sketches[1:]:
        linear = linear.merge(s)
    level1 = [sketches[i].merge(sketches[i + 1]) for i in range(0, 8, 2)]
    level2 = [level1[i].merge(level1[i + 1]) for i in range(0, 4, 2)]
    tree = level2[0].merge(level2[1])
    for merged in (linear, tree):
        assert merged.n == len(data)
        assert _rank_errors(merged, data) <= EPS


def test_deterministic():
    data = [((i * 2654435761) % 100_000) / 7.0 for i in range(25_000)]
    a, b = KLLSketch(K), KLLSketch(K)
    a.extend(data)
    b.extend(data)
    assert a.levels == b.levels and a.parities == b.parities and a.n == b.n


def test_roundtrip_serialization():
    sk = KLLSketch(K)
    sk.extend([float(i) for i in range(10_000)])
    back = KLLSketch.from_rows(K, sk.to_rows())
    assert back.levels == sk.levels and back.n == sk.n


def test_quantile_validates():
    sk = KLLSketch(K)
    with pytest.raises(ValueError):
        sk.quantile(0.5)  # empty
    sk.update(1.0)
    with pytest.raises(ValueError):
        sk.quantile(1.5)
    with pytest.raises(ValueError):
        KLLSketch(4)


def test_spark_partials_match_exact_percentiles(spark):
    from importer_spark.io import Tables
    from tests.conftest import SF_DIR

    li = Tables(spark, SF_DIR).lineitem
    est = quantile_estimates(li, "l_extendedprice", [0.5, 0.9, 0.99], k=K)
    exact = np.array(sorted(r[0] for r in li.select("l_extendedprice").collect()))
    n = len(exact)
    for q, v in est.items():
        true_rank = np.searchsorted(exact, v, side="right") / n
        assert abs(true_rank - q) <= EPS, (q, v, true_rank)


def test_spark_partials_exclude_nulls(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(x=float(i)) for i in range(100)] + [Row(x=None)] * 20
    ).repartition(4)
    rows = quantile_sketch_partials(df, "x", k=64).collect()
    mass = sum(len(r["values"]) << r["level"] for r in rows)
    assert mass == 100


def test_grouped_partials_rollup_matches_exact(spark):
    """Per-(type, day) partials rolled up to per-type quantiles must agree
    with exact percentiles within the rank-error bound — certifying both
    the group-wise build and the applyInPandas merge path."""
    from importer_spark.io import Tables
    from importer_spark.operators.quantiles import (
        grouped_quantile_partials,
        rollup_quantiles,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    ev = Tables(spark, SF_DIR).events.withColumn("day", F.to_date("ts"))
    daily = grouped_quantile_partials(ev, ["event_type", "day"], "value", k=K)
    est = rollup_quantiles(daily, ["event_type"], [0.5, 0.95], k=K).collect()
    by_type = {}
    for r in ev.select("event_type", "value").collect():
        if r["value"] is not None:
            by_type.setdefault(r["event_type"], []).append(r["value"])
    assert {r["event_type"] for r in est} == set(by_type)
    for r in est:
        vals = np.array(sorted(by_type[r["event_type"]]))
        true_rank = np.searchsorted(vals, r["estimate"], side="right") / len(vals)
        assert abs(true_rank - r["quantile"]) <= EPS, r


def test_rollup_skips_all_null_groups(spark):
    """A rollup group whose every partial condensed zero values (all-NULL
    metric) must vanish from the output, not raise 'empty sketch' and kill
    the job (ADVICE r4 low)."""
    from pyspark.sql import Row

    from importer_spark.operators.quantiles import (
        grouped_quantile_partials,
        rollup_quantiles,
    )

    df = spark.createDataFrame(
        [Row(g="live", d=1, x=float(i)) for i in range(20)]
        + [Row(g="dead", d=1, x=None), Row(g="dead", d=2, x=None)],
        "g string, d int, x double",
    )
    partials = grouped_quantile_partials(df, ["g", "d"], "x", k=16)
    out = rollup_quantiles(partials, ["g"], [0.5], k=16).collect()
    assert {r["g"] for r in out} == {"live"}
    assert len(out) == 1 and out[0]["estimate"] is not None


def test_grouped_partials_mass_per_group(spark):
    from pyspark.sql import Row
    from importer_spark.operators.quantiles import grouped_quantile_partials

    df = spark.createDataFrame(
        [Row(g="a", x=float(i)) for i in range(500)]
        + [Row(g="b", x=float(i)) for i in range(37)]
    ).repartition(4)
    rows = grouped_quantile_partials(df, ["g"], "x", k=64).collect()
    mass = {}
    for r in rows:
        mass[r["g"]] = mass.get(r["g"], 0) + (len(r["values"]) << r["level"])
    assert mass == {"a": 500, "b": 37}
