"""connected_components: both regimes (local union-find / distributed
propagation) must agree, converge, and release caches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from importer_spark.operators.graph import connected_components

# Two components: {1,2,3,4} (chain → diameter 3) and {10,11}; 5 is absent
# (no edges) so it must not appear.
EDGES = [(1, 2), (2, 3), (3, 4), (10, 11)]


def _rows(df):
    return sorted((r[0], r[1], r[2]) for r in df.collect())


EXPECT = [(1, 1, 4), (2, 1, 4), (3, 1, 4), (4, 1, 4), (10, 10, 2), (11, 10, 2)]


@pytest.fixture()
def pairs(spark):
    return spark.createDataFrame(EDGES, "id_a long, id_b long")


def test_local_path(spark, pairs):
    out = connected_components(pairs)  # 4 edges << default threshold
    assert _rows(out) == EXPECT


@pytest.mark.parametrize("algorithm", ["star", "propagation"])
def test_distributed_path(spark, pairs, algorithm):
    out = connected_components(pairs, max_local_edges=0, algorithm=algorithm)
    assert _rows(out) == EXPECT


@pytest.mark.parametrize("algorithm", ["star", "propagation"])
def test_paths_agree_on_random_graph(spark, algorithm):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    local = _rows(connected_components(pairs))
    dist = _rows(connected_components(pairs, max_local_edges=0, algorithm=algorithm))
    assert local == dist


def test_distributed_nonconvergence_raises(spark):
    # A 6-node chain has diameter 5 > max_rounds=2 budget (per-hop variant;
    # the star variant converges well inside 2 rounds on this graph).
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            chain, max_rounds=2, max_local_edges=0, algorithm="propagation"
        )


def test_star_completes_on_diameter_1000_chain(spark):
    """The scale-robustness property the star algorithm buys: a
    chain-shaped (diameter-1000) dup graph finishes within the default
    15-round budget — O(log d) rounds — where per-hop min-label
    propagation needs ~1000 rounds and must raise. Node ids are permuted
    so convergence can't ride on a sorted-id shortcut."""
    import random

    n = 1001
    perm = list(range(n))
    random.Random(13).shuffle(perm)
    chain = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = connected_components(chain, max_local_edges=0)  # default star
    rows = out.collect()
    assert len(rows) == n
    assert {r.cluster_id for r in rows} == {0}  # min id labels the component
    assert all(r.cluster_size == n for r in rows)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_local_edges=0, algorithm="propagation")


def test_star_handles_self_pairs_and_singletons(spark):
    """A node whose only pair is (a, a) is a singleton component in every
    path (node-universe parity with the local union-find)."""
    pairs = spark.createDataFrame(
        [(1, 2), (7, 7)], "id_a long, id_b long"
    )
    expect = [(1, 1, 2), (2, 1, 2), (7, 7, 1)]
    assert _rows(connected_components(pairs)) == expect
    assert _rows(connected_components(pairs, max_local_edges=0)) == expect
    assert (
        _rows(connected_components(pairs, max_local_edges=0, algorithm="propagation"))
        == expect
    )


def test_caches_released(spark, pairs):
    """The operator's INTERNAL cache (the edge list) must release on every
    exit path. Only the local path is count-stable: the distributed path's
    per-round eager localCheckpoints persist until the ContextCleaner GCs
    them (caller-lifetime, not a leak), so asserting raw persistent-RDD
    counts across it is racy — run the local path repeatedly instead; a
    leaked edges cache would grow the count by one per call."""
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    for _ in range(3):
        connected_components(pairs).collect()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after <= before


def test_star_completes_on_diameter_10k_random_tree(spark):
    """Depth stress an order of magnitude past the 1000-chain case: a
    permuted diameter-10^4 path with 500 random leaf attachments (a random
    tree — leaves exercise the asymmetric star moves, not just the chain
    pattern). O(log d) contraction must finish inside a 20-round budget
    (log2(10^4) ≈ 13) and label every node with the component min."""
    import random

    n = 10_001
    rng = random.Random(17)
    perm = list(range(n))
    rng.shuffle(perm)
    edges = [(perm[i], perm[i + 1]) for i in range(n - 1)]
    # leaves n..n+499 hang off random path nodes: diameter stays >= 10^4
    edges += [(n + j, perm[rng.randrange(n)]) for j in range(500)]
    rng.shuffle(edges)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(pairs, max_rounds=20, max_local_edges=0)
    agg = out.groupBy("cluster_id").count().collect()
    assert len(agg) == 1
    assert agg[0]["cluster_id"] == 0 and agg[0]["count"] == n + 500
