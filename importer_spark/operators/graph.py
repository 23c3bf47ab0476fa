"""Iterative graph operators: connected components by min-label propagation.

The dedup-clusters shape: edges come from any pair generator (MinHash-LSH
text pairs, embedding-cosine pairs, SimHash bands), components become dedup
groups with a canonical representative (the minimum id). Per round: join
labels to edges, take the neighborhood min — converges in O(component
diameter) rounds, with the changed-flag fused into the update job so each
round is exactly one action. Per-round cache + eager localCheckpoint at the
end keep the lineage flat and release executor memory (the round-1-measured
pattern; see queries/llm_tfidf.py history for the negative results that
shaped it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "node_id",
    max_rounds: int = 15,
) -> DataFrame:
    """(out_id, cluster_id, cluster_size) for every node appearing in
    ``pairs``; cluster_id = the component's minimum node id. Raises instead
    of returning silently-wrong labels if a component's diameter exceeds
    ``max_rounds``. Internal caches are released on EVERY exit path (a
    non-convergence raise must not pin InMemoryRelations for the session)."""
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
    # Round 0 fused into one aggregation: label = min(id, direct neighbors).
    # Saves a full propagation round (pair-shaped dup clusters converge here).
    cached = [
        edges,
        (
            edges.groupBy("src")
            .agg(F.min("dst").alias("m"))
            .select(F.col("src").alias("_nid"), F.least("src", "m").alias("cluster_id"))
            .cache()
        ),
    ]
    try:
        labels = cached[-1]
        labels.count()  # one job materializes edges + round-0 labels
        for _ in range(max_rounds - 1):
            # Every node appears as an edge src, so inner joins lose no rows;
            # the changed-flag rides along in the same job (no second join +
            # action).
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
                .cache()
            )
            cached.append(updated)
            # cache() per round truncates the lineage (without it each round
            # re-evaluates the whole chain — exponential plan growth); the
            # count materializes `updated`, so the previous round can release.
            changed = updated.filter("chg").count()
            cached.pop(1).unpersist()  # previous round's labels
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
