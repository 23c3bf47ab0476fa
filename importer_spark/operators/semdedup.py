"""SemDeDup — semantic deduplication via coarse cells + within-cell cosine
pruning (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"), as a reusable operator (promoted from
queries/analytics4.py after the r4 sf1 certification).

Deterministic variant: the K lowest-id vectors seed the cells; every vector
joins the cell of its max-cosine seed (argmax with ties to the LOWER seed
id); a vector is a duplicate iff a LOWER-id vector in the SAME cell has
cosine >= tau — the parallel, order-free form of the paper's
keep-one-per-group rule.

Scale contract (the whole point of semantic pre-partitioning): the quadratic
stage is confined to cells, so in-cell work is O((N/K)^2 · K) = O(N^2/K) —
**K is the scale dial and must grow with the corpus** (the paper's own knob:
they use 50k clusters at web scale). Fixed K=8 measured 8.6s→75.5s for a 10×
corpus (r4 LOCAL_GATE_sf1, ~quadratic); K∝N holds per-cell population
constant and the total ~linear. See DEPLOY.md "SemDeDup sizing".

Assignment cost is K sequential-fold cosines per row. The fold form
(operators/similarity.cosine) is the cross-engine bit-identical one — it is
what lets a SQL oracle certify the assignment — and stays cheap to K in the
hundreds. At production K (10^4+), swap assignment to the numpy block-matmul
kernel (operators/clustering.nearest_cells_cosine, n_best=1) and k-means
seeds (operators/clustering.kmeans_fit); the cell-bucketed scorer below is
unchanged. Cosines are quantized to 1e-9 BEFORE the argmax on both engines,
so near-tie FP noise below the grid cannot flip a cell assignment (r4
ADVICE).

Reference parity: the reference pipeline has no semantic dedup; this extends
its dedup family (fuzzy match: models/staging/stg_customers.sql shape) to
embedding space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from importer_spark.operators.similarity import cosine

# Quantization grid for the argmax: coarse enough to absorb cross-engine FP
# noise in the last bits, fine enough that real assignment margins (>> 1e-9
# for any non-degenerate corpus) are untouched.
ROUND_SCALE = 9


def lowest_id_seeds(
    embs: DataFrame, id_col: str, vec_col: str, n_seeds: int
) -> list[tuple[int, list[float]]]:
    """The K lowest-id vectors as (id, vec) seed pairs, ascending — the
    deterministic, engine-portable seed rule (k-means seeds share it:
    operators/clustering.kmeans_fit). Driver state is K·dim doubles."""
    rows = embs.select(id_col, vec_col).orderBy(id_col).limit(n_seeds).collect()
    if len(rows) < n_seeds:
        raise ValueError(
            f"semdedup: n_seeds={n_seeds} exceeds corpus size {len(rows)}"
        )
    return [(int(r[id_col]), [float(x) for x in r[vec_col]]) for r in rows]


def assign_seed_cells(
    embs: DataFrame,
    id_col: str,
    vec_col: str,
    seeds: list[tuple[int, list[float]]],
    cell_col: str = "cell",
) -> DataFrame:
    """(id, vec, cell): each vector's max-cosine seed, ties to the lower
    seed id. Pure projection — K fold-cosines per row, quantized to the
    1e-9 grid, argmax via array_max + array_position (FIRST index of the
    max = lowest seed id, because seeds scan in ascending id order). No
    join, no shuffle: the K·dim seed matrix rides the plan as literals."""
    ordered = sorted(seeds)
    scores = F.array(
        *[
            F.round(cosine(F.col(vec_col), F.array(*[F.lit(x) for x in vec])), ROUND_SCALE)
            for _sid, vec in ordered
        ]
    )
    ids = F.array(*[F.lit(sid) for sid, _vec in ordered])
    cell = F.element_at(ids, F.array_position(scores, F.array_max(scores)).cast("int"))
    return embs.select(id_col, vec_col, cell.cast("long").alias(cell_col))


def semdedup_flags(
    cells: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    cell_col: str = "cell",
) -> DataFrame:
    """(id, cell, is_semantic_dup): a row is a dup iff any LOWER-id row of
    the SAME cell has cosine >= tau. ONE applyInPandas per cell, chunked
    numpy block matmul (measured ~25× over the interpreted fold pair join);
    the triangular mask keeps the rule order-free. Chunk size adapts so the
    sims block stays ~120 MB regardless of cell population. Only the cell
    key shuffles — within-cell quadratic, cross-cell zero."""

    def find_dups(pdf):
        import numpy as np
        import pandas as pd

        order = np.argsort(pdf[id_col].to_numpy())
        ids = pdf[id_col].to_numpy()[order]
        m = np.vstack(pdf[vec_col].to_numpy()[order]).astype("float64")
        from importer_spark.operators.similarity import row_normalize

        row_normalize(m)
        n = len(ids)
        dup = np.zeros(n, dtype=bool)
        chunk = max(256, int(1.5e7 / max(n, 1)))
        for s in range(1, n, chunk):
            end = min(s + chunk, n)
            sims = m[s:end] @ m[:end].T
            mask = np.arange(end)[None, :] < np.arange(s, end)[:, None]
            dup[s:end] = ((sims >= tau) & mask).any(axis=1)
        return pd.DataFrame(
            {
                id_col: ids,
                cell_col: pdf[cell_col].iat[0],
                "is_semantic_dup": dup,
            }
        )

    return cells.groupBy(cell_col).applyInPandas(
        find_dups,
        schema=f"{id_col} bigint, {cell_col} bigint, is_semantic_dup boolean",
    )


def semantic_dedup(
    embs: DataFrame,
    id_col: str,
    vec_col: str,
    n_seeds: int = 8,
    tau: float = 0.45,
) -> DataFrame:
    """End-to-end SemDeDup: lowest-id seeds → argmax-cosine cells →
    within-cell lower-id cosine-≥-τ dup flags. Returns
    (id_col, cell, is_semantic_dup)."""
    seeds = lowest_id_seeds(embs, id_col, vec_col, n_seeds)
    cells = assign_seed_cells(embs, id_col, vec_col, seeds)
    return semdedup_flags(cells, id_col, vec_col, tau)
