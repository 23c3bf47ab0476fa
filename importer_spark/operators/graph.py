"""Iterative graph operators: connected components by min-label propagation.

The dedup-clusters shape: edges come from any pair generator (MinHash-LSH
text pairs, embedding-cosine pairs, SimHash bands), components become dedup
groups with a canonical representative (the minimum id).

Two regimes, chosen by measured edge count (the same decision shape as
broadcast-vs-shuffle join selection):

- **Small graphs** (≤ ``max_local_edges``, default 2^20 ≈ a few tens of MB
  on the driver): collect the deduplicated edge list once and run
  union-find with path compression locally. Near-dup graphs are sparse by
  construction (a pair generator that emits millions of edges is finding
  duplicates of almost everything), so this path removes 3-5 scheduling
  round-trips of distributed label propagation — the dominant cost when the
  graph is tiny relative to the cluster.

- **Large graphs** (default ``algorithm="star"``): alternating
  large-star/small-star contraction (Kiveris et al., "Connected Components
  in MapReduce and Beyond", the published two-phase algorithm). Each round
  re-points nodes at their neighborhood minimum, HALVING-or-better the
  effective diameter, so convergence is O(log d) rounds — a chain-shaped
  (diameter-1000) dup graph finishes in ~10 rounds where per-hop min-label
  propagation would need 1000. Each round is a constant number of shuffles
  (two windowed mins + two distincts) over the shrinking edge set.

- ``algorithm="propagation"``: the per-hop min-label variant kept for
  cross-checking — converges in O(component diameter) rounds with the
  changed-flag fused into the update job. Fine for the shallow, bushy
  graphs near-dup pairs actually produce; raises past ``max_rounds`` on
  deep graphs.

  Both distributed variants eagerly localCheckpoint each round so the
  logical plan stays constant-size (a cache() is NOT enough: a round
  references its input twice, so the analyzed plan doubles per round and a
  deep graph OOMs the driver on plan objects — found by test_graph.py's
  random-graph case), and both raise rather than return silently-wrong
  labels if the round budget is exhausted (the final backstop).

Every path evaluates the upstream pair pipeline exactly once and returns
identical results (pinned by tests/test_graph.py, which forces all three).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _local_components(edges: DataFrame, out_id: str) -> DataFrame:
    """Driver union-find over a bounded, already-cached edge list."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edges.collect():
        a, b = r["src"], r["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # Union by min so the root IS the canonical (minimum) label.
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    labels = {n: find(n) for n in parent}
    sizes: dict = {}
    for root in labels.values():
        sizes[root] = sizes.get(root, 0) + 1
    id_type = edges.schema["src"].dataType
    schema = StructType(
        [
            StructField(out_id, id_type),
            StructField("cluster_id", id_type),
            StructField("cluster_size", LongType()),
        ]
    )
    rows = [(n, c, sizes[c]) for n, c in labels.items()]
    return edges.sparkSession.createDataFrame(rows, schema)


def _star_components(edges: DataFrame, out_id: str, max_rounds: int) -> DataFrame:
    """Distributed components by alternating large-star/small-star
    (Kiveris et al., two-phase): O(log d) rounds, each a fixed number of
    shuffles over a shrinking edge set.

    Invariant: the undirected edge set is kept canonical as (u > v) pairs.
    Large-star re-points every BIGGER neighbor of each node at the node's
    neighborhood minimum; small-star re-points every SMALLER neighbor (and
    the node itself) at the minimum of the smaller neighborhood. The
    fixpoint is a forest of stars, each centered at its component's
    minimum id — which IS the canonical cluster label.

    Convergence detection: a cheap (count, hash-sum) fingerprint gates an
    EXACT set comparison (subtract + isEmpty) — the fingerprint alone is
    probabilistic, so equality is always confirmed deterministically before
    declaring convergence (never silently-wrong labels).
    """
    spark = edges.sparkSession
    # Node universe BEFORE dropping self-loops: a node whose only pair is
    # (a, a) is a singleton component and must still appear in the output
    # (parity with the local union-find path).
    nodes = edges.select(F.col("src").alias("_nid")).distinct().localCheckpoint(
        eager=True
    )
    # Canonical undirected edges (u > v); input is bidirectional so one
    # filtered pass captures every pair exactly once.
    E = (
        edges.filter(F.col("src") > F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_fp = None
    for _ in range(max_rounds):
        if E.isEmpty():
            break  # only singletons/self-loops — already a (trivial) star set
        bi = E.select(F.col("u").alias("a"), F.col("v").alias("b")).union(
            E.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        wa = Window.partitionBy("a")
        # Large-star: for each node a, point every neighbor b > a at
        # m = min(Γ(a) ∪ {a}). Connectivity is preserved (paper, Lemma 1);
        # emitted pairs are already canonical (b > a >= m).
        ls = (
            bi.withColumn("m", F.least(F.min("b").over(wa), F.col("a")))
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # Small-star: for each node u, point its smaller neighbors AND
        # itself at m = min(Γ⁻(u)); emitted pairs stay canonical (v > m,
        # u > m; v == m self-loops drop).
        wu = Window.partitionBy("u")
        ss = ls.withColumn("m", F.min("v").over(wu))
        E_new = (
            ss.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(ss.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # Hash-sum in decimal(38,0): a long sum of 2^63-scale hashes
        # overflows under ANSI mode.
        fp = tuple(
            E_new.agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
            ).first()
        )
        if fp == prev_fp and E_new.subtract(E).isEmpty():
            E = E_new
            break
        prev_fp = fp
        E = E_new
    else:
        raise RuntimeError(
            f"connected_components: star contraction did not converge "
            f"within {max_rounds} rounds — with O(log d) convergence this "
            "indicates a component of astronomically large diameter (or a "
            "too-small budget); raise max_rounds"
        )
    # Fixpoint edge set is (member, center) stars; centers label themselves,
    # and true singletons (self-loop-only nodes) fall through the left join.
    star = E.select(F.col("u").alias("_nid"), F.col("v").alias("cluster_id"))
    labels = nodes.join(star, "_nid", "left").select(
        "_nid", F.coalesce("cluster_id", F.col("_nid")).alias("cluster_id")
    )
    out = labels.select(
        F.col("_nid").alias(out_id),
        "cluster_id",
        F.count("*").over(Window.partitionBy("cluster_id")).alias("cluster_size"),
    )
    return out.localCheckpoint(eager=True)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "node_id",
    max_rounds: int = 15,
    max_local_edges: int = 1 << 20,
    algorithm: str = "star",
) -> DataFrame:
    """(out_id, cluster_id, cluster_size) for every node appearing in
    ``pairs``; cluster_id = the component's minimum node id.

    ``algorithm`` selects the distributed regime (the local union-find
    path below ``max_local_edges`` is always preferred): ``"star"``
    (default) = large-star/small-star contraction, O(log d) rounds, safe
    for arbitrarily deep graphs; ``"propagation"`` = per-hop min-label,
    O(diameter) rounds, kept for cross-checking. Both raise instead of
    returning silently-wrong labels if ``max_rounds`` is exhausted.
    Internal caches are released on EVERY exit path (a non-convergence
    raise must not pin InMemoryRelations for the session)."""
    if algorithm not in ("star", "propagation"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    # Bidirectional edges via explode over ONE scan of `pairs`: a self-union
    # of two selects would execute the whole upstream pair pipeline twice
    # before any cache materializes (measured 2× the pairs cost at sf0.1).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .cache()
    )
    cached = [edges]
    try:
        # One job materializes the pair pipeline into the edge cache AND
        # sizes the graph for the regime decision.
        n_edges = edges.count()
        if n_edges <= max_local_edges:
            return _local_components(edges, out_id)
        if algorithm == "star":
            return _star_components(edges, out_id, max_rounds)

        # Round 0 fused into one aggregation: label = min(id, direct
        # neighbors). Saves a full propagation round (pair-shaped dup
        # clusters converge here).
        labels = (
            edges.groupBy("src")
            .agg(F.min("dst").alias("m"))
            .select(F.col("src").alias("_nid"), F.least("src", "m").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        for _ in range(max_rounds - 1):
            # Every node appears as an edge src, so inner joins lose no rows;
            # the changed-flag rides along in the same job (no second join +
            # action). Each round references `labels` TWICE, so a cache()
            # here is not enough: it truncates execution but the analyzed
            # plan still doubles every round (2^rounds plan nodes — a deep
            # graph OOMs the driver on plan objects before any task runs).
            # localCheckpoint(eager) collapses the lineage to a LogicalRDD,
            # keeping every round's plan constant-size; superseded rounds'
            # blocks release via the ContextCleaner when references drop.
            updated = (
                edges.join(labels, edges.dst == labels._nid)
                .groupBy(F.col("src").alias("_nid"))
                .agg(F.min("cluster_id").alias("neighbor_min"))
                .join(labels, "_nid")
                .select(
                    "_nid",
                    F.least("cluster_id", "neighbor_min").alias("cluster_id"),
                    (F.col("neighbor_min") < F.col("cluster_id")).alias("chg"),
                )
                .localCheckpoint(eager=True)
            )
            changed = updated.filter("chg").count()
            labels = updated.drop("chg")
            if changed == 0:
                break
        else:
            # Never return silently-wrong partial labels: a component deeper
            # than the round budget means the caller must raise it (or switch
            # to the recursive-SQL form for pathological graphs).
            raise RuntimeError(
                f"connected_components: label propagation did not converge "
                f"within {max_rounds} rounds — component diameter exceeds "
                "the budget"
            )
        out = labels.select(
            F.col("_nid").alias(out_id),
            "cluster_id",
            F.count("*").over(Window.partitionBy("cluster_id")).alias("cluster_size"),
        )
        # Materialize eagerly so the internal caches can release NOW instead
        # of leaking an edges + labels InMemoryRelation per invocation.
        return out.localCheckpoint(eager=True)
    finally:
        for df in cached:
            df.unpersist()
