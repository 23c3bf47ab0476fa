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

- **Large graphs**: distributed min-label propagation. Per round: join
  labels to edges, take the neighborhood min — converges in O(component
  diameter) rounds, with the changed-flag fused into the update job so each
  round is exactly one action. Each round eagerly localCheckpoints so the
  logical plan stays constant-size (a cache() is NOT enough: the round
  references labels twice, so the analyzed plan doubles per round and a
  deep graph OOMs the driver on plan objects — found by test_graph.py's
  random-graph case).

Either path evaluates the upstream pair pipeline exactly once and returns
identical results (pinned by tests/test_graph.py, which forces both).
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


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "node_id",
    max_rounds: int = 15,
    max_local_edges: int = 1 << 20,
) -> DataFrame:
    """(out_id, cluster_id, cluster_size) for every node appearing in
    ``pairs``; cluster_id = the component's minimum node id. Raises instead
    of returning silently-wrong labels if a component's diameter exceeds
    ``max_rounds`` (distributed path). Internal caches are released on EVERY
    exit path (a non-convergence raise must not pin InMemoryRelations for
    the session)."""
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
