"""Distributed k-means (Lloyd iterations) over embedding columns
(BASELINE.json similarity/IVF family; SURVEY §7.4).

The iterative-ML companion to the label-propagation loop in
queries/llm_tfidf.py: per round, ASSIGNMENT is a map-only numpy block
matmul against broadcast centroids (the operators/similarity.py
cosine_pairs_blockwise pattern — no shuffle, Arrow-batched, vectorized),
and the UPDATE is one posexplode + (cluster, dim) average whose result —
k×dim numbers — is the only thing that ever reaches the driver. That
driver-side centroid state is the standard Spark shape for iterative
refinement: tiny model on the driver, data never moves.

Array-HOF distance expressions were measured 5× slower here (interpreted
per element — see PERF.md); the matmul path also IS the production shape
once k reaches IVF-training sizes. Convergence is a fixed iteration
budget — k-means SSE is monotone non-increasing, so the budget only
truncates, never diverges (tests assert the monotonicity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_clusters(
    embs: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """(id, vec, cluster, _dist): nearest centroid per vector by squared L2
    (ties to the lowest index — numpy argmin keeps the first minimum).
    Map-only: centroids ride the closure, each Arrow batch is one
    n×d @ d×k matmul."""
    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c_sq[None, :]
            idx = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cluster": idx.astype("int32"),
                    "_dist": d2[np.arange(len(idx)), idx],
                }
            )

    return embs.mapInPandas(
        fn, schema=f"{id_col} bigint, {vec_col} array<double>, cluster int, _dist double"
    )


def nearest_cells_cosine(
    embs: DataFrame,
    id_col: str,
    vec_col: str,
    cell_ids: list[int],
    centroids: list[list[float]],
    n_best: int = 1,
) -> DataFrame:
    """Top-``n_best`` nearest cells per vector by COSINE via normalized
    block matmul — the IVF coarse-quantizer assignment at production nlist:
    O(n×d×k) vectorized work per Arrow batch instead of interpreted
    per-element cosine × nlist per vector. Map-only (the nlist×dim model
    rides the closure, like k-means centroid state). Emits
    (id, vec, cell_id, cell_rank); ties rank the lower cell_id first (cells
    are sorted by id and the argsort is stable)."""
    order = np.argsort(np.asarray(cell_ids))
    ids_sorted = np.asarray(cell_ids, dtype=np.int64)[order]
    C = np.asarray(centroids, dtype=np.float64)[order]
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    cn[cn == 0.0] = 1.0
    C = C / cn
    n_best = min(n_best, len(ids_sorted))

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            vn = np.linalg.norm(V, axis=1, keepdims=True)
            vn[vn == 0.0] = 1.0
            sims = (V / vn) @ C.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n_best]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(n_best),
                    vec_col: pdf[vec_col].to_numpy().repeat(n_best),
                    "cell_id": ids_sorted[top].ravel(),
                    "cell_rank": np.tile(np.arange(1, n_best + 1, dtype="int32"), n),
                }
            )

    return embs.select(id_col, vec_col).mapInPandas(
        fn,
        schema=f"{id_col} bigint, {vec_col} array<double>, cell_id bigint, cell_rank int",
    )


def kmeans_fit(
    embs: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
) -> tuple[list[list[float]], list[float]]:
    """Lloyd's algorithm with deterministic seeds (the k lowest-id vectors).
    Returns (centroids, per-iteration SSE) — the SSE trace is the
    convergence audit. Non-finite vectors self-exclude from training
    (the `similarity.finite_vectors` contract — a single NaN component
    otherwise poisons its cluster's centroid mean and the SSE trace)."""
    from importer_spark.operators.similarity import finite_vectors

    embs = finite_vectors(embs, vec_col).select(id_col, vec_col).cache()
    seeds = [list(r[vec_col]) for r in embs.orderBy(id_col).limit(k).collect()]
    if len(seeds) < k:
        embs.unpersist()
        raise ValueError(
            f"kmeans_fit: k={k} exceeds corpus size {len(seeds)} — "
            "reduce k or supply more vectors"
        )
    dim = len(seeds[0])
    cents = seeds
    sse_trace: list[float] = []
    for _ in range(iters):
        assigned = assign_clusters(embs, id_col, vec_col, cents)
        stats = (
            assigned.select(
                "cluster", "_dist", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            # Each exploded row carries its vector's _dist, repeated exactly
            # `dim` times — so Σ sd / dim below recovers the round's SSE in
            # the SAME job as the centroid means (one action per iteration).
            .agg(F.avg("x").alias("m"), F.sum("_dist").alias("sd"))
        )
        # k×dim averages — the only driver-side materialization per round.
        rows = stats.collect()
        sse_trace.append(sum(r["sd"] for r in rows) / dim)
        new = {c: [0.0] * dim for c in range(k)}
        seen = set()
        for r in rows:
            new[r["cluster"]][r["pos"]] = r["m"]
            seen.add(r["cluster"])
        # An emptied cluster keeps its previous centroid (deterministic).
        cents = [new[c] if c in seen else cents[c] for c in range(k)]
    embs.unpersist()
    return cents, sse_trace


def kmeans_assignments(
    embs: DataFrame, id_col: str, vec_col: str, k: int = 8, iters: int = 3
) -> DataFrame:
    """Final (id, cluster, cluster_size) after `iters` Lloyd rounds.
    Non-finite vectors self-exclude (train AND output — assigning a NaN
    vector is argmin over NaNs, a meaningless bucket)."""
    from importer_spark.operators.similarity import finite_vectors

    cents, _ = kmeans_fit(embs, id_col, vec_col, k=k, iters=iters)
    assigned = assign_clusters(
        finite_vectors(embs, vec_col), id_col, vec_col, cents
    ).select(id_col, "cluster")
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return assigned.join(F.broadcast(sizes), "cluster").select(
        id_col, "cluster", "cluster_size"
    )
