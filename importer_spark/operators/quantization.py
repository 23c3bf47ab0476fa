"""Product quantization (PQ) for embedding similarity search — the
memory-bound ANN shape beyond scalar int8: vectors compress to M subspace
codes (here M·log2(ksub) bits ≈ M bytes), and approximate distances come
from per-probe lookup tables (ADC — asymmetric distance computation),
never from the float vectors.

Pipeline: TRAIN all M per-subspace codebooks with subspace-batched
distributed Lloyd iterations (one job advances every codebook; the model
state that reaches the driver is M·ksub·dsub floats); ENCODE the
corpus in one map-only Arrow pass (argmin over each subspace's codebook);
SEARCH by building each probe's M×ksub squared-distance table and summing
M gathered entries per corpus row (numpy fancy-indexing, no per-element
interpretation), then rescore the top candidates at full precision so
everything emitted is exact.

100 TB rationale: the candidate scan touches ~M bytes/vector instead of
8·dim (64-dim float64 → 512 bytes vs 4 — a ~128× bandwidth cut), and the
corpus never shuffles: codes are scanned in place, probes broadcast.
Training cost is amortized (train on a sample, encode everything).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def pq_train(
    embs: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    sample_mod: int | None = None,
) -> list[list[list[float]]]:
    """Train M per-subspace codebooks (ksub centroids each) with
    SUBSPACE-BATCHED Lloyd iterations: the sample explodes once into
    (id, subspace, subvector) rows, and every iteration advances ALL M
    codebooks in ONE job — a map-only batched argmin (numpy, codebooks in
    the closure) feeding one (subspace, cluster, dim) average. Driver state
    per round is m·ksub·dsub floats. Running `kmeans_fit` per subspace
    would be semantically identical but cost m× the driver round-trips —
    job latency, not compute, dominates iterative training.

    ``sample_mod`` trains on the deterministic id-hash sample
    ``id % sample_mod == 0`` — the standard PQ practice (codebooks need
    distribution coverage, not every row). Seeds are the ksub lowest-id
    sample vectors' slices (deterministic, like `kmeans_fit`)."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    dsub = dim // m
    src = embs.select(id_col, vec_col)
    if sample_mod:
        src = src.filter(F.col(id_col) % sample_mod == 0)
    src = src.cache()

    seed_rows = src.orderBy(id_col).limit(ksub).collect()
    if len(seed_rows) < ksub:
        src.unpersist()
        raise ValueError(
            f"pq_train: ksub={ksub} exceeds training-sample size {len(seed_rows)}"
        )
    books = [
        [list(r[vec_col])[j * dsub : (j + 1) * dsub] for r in seed_rows]
        for j in range(m)
    ]

    sub = src.select(
        id_col,
        F.posexplode(
            F.array(*[F.slice(F.col(vec_col), j * dsub + 1, dsub) for j in range(m)])
        ).alias("j", "subvec"),
    )
    for _ in range(iters):
        C = np.stack([np.asarray(b, dtype=np.float64) for b in books])  # m×ksub×dsub

        def assign(batches, C=C):
            for pdf in batches:
                if not len(pdf):
                    continue
                S = np.asarray(pdf["subvec"].tolist(), dtype=np.float64)
                js = pdf["j"].to_numpy()
                out = np.empty(len(S), dtype=np.int32)
                for j in np.unique(js):
                    mask = js == j
                    Cj = C[j]
                    d2 = (
                        (S[mask] * S[mask]).sum(axis=1)[:, None]
                        - 2.0 * (S[mask] @ Cj.T)
                        + (Cj * Cj).sum(axis=1)[None, :]
                    )
                    out[mask] = d2.argmin(axis=1)
                yield pd.DataFrame(
                    {"j": js, "cluster": out, "subvec": pdf["subvec"]}
                )

        stats = (
            sub.mapInPandas(assign, schema="j int, cluster int, subvec array<double>")
            .select("j", "cluster", F.posexplode("subvec").alias("pos", "x"))
            .groupBy("j", "cluster", "pos")
            .agg(F.avg("x").alias("mval"))
        )
        rows = stats.collect()  # m·ksub·dsub scalars — the only driver state
        new = [[list(c) for c in b] for b in books]  # emptied cluster keeps old
        for r in rows:
            new[r["j"]][r["cluster"]][r["pos"]] = r["mval"]
        books = new
    src.unpersist()
    return books


def pq_encode(
    embs: DataFrame, id_col: str, vec_col: str, codebooks: list[list[list[float]]]
) -> DataFrame:
    """(id, codes array<int>): per-subspace nearest-codeword indices.
    Map-only — codebooks ride the closure; each Arrow batch is M small
    matmuls."""
    C = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dsub = C[0].shape[1]

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(V), len(C)), dtype=np.int32)
            for j, Cj in enumerate(C):
                S = V[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (S * S).sum(axis=1)[:, None]
                    - 2.0 * (S @ Cj.T)
                    + (Cj * Cj).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return embs.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} bigint, codes array<int>"
    )


def pq_adc_topk(
    corpus_codes: DataFrame,
    probes: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    id_col: str,
    k: int,
) -> DataFrame:
    """(probe_id, id, adist, arank): per probe, the k corpus rows with the
    smallest ADC (approximate squared-L2) distance. Probes are a bounded
    driver-side list (the standard query-serving shape); per batch the cost
    is an M-way table gather, not a float-vector scan. Distributed top-k:
    each Arrow batch keeps only its k best per probe (np.argpartition), so
    the final rank window sees batches·k rows, never the corpus — the same
    partial-then-final shape as TakeOrderedAndProject. Ties break on id so
    candidate sets are deterministic."""
    C = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dsub = C[0].shape[1]
    luts = []  # (probe_id, M×ksub table)
    for pid, vec in probes:
        v = np.asarray(vec, dtype=np.float64)
        lut = np.stack(
            [
                ((v[j * dsub : (j + 1) * dsub][None, :] - Cj) ** 2).sum(axis=1)
                for j, Cj in enumerate(C)
            ]
        )
        luts.append((pid, lut))

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray(pdf["codes"].tolist(), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            ms = np.arange(codes.shape[1])
            for pid, lut in luts:
                adist = lut[ms, codes].sum(axis=1)
                if len(adist) > k:
                    # batch-local cut by the SAME (adist, id) order the final
                    # rank uses, so the global top-k is always a subset of
                    # the union of batch top-ks regardless of batching
                    keep = np.lexsort((ids, adist))[:k]
                else:
                    keep = np.arange(len(adist))
                yield pd.DataFrame(
                    {"probe_id": pid, id_col: ids[keep], "adist": adist[keep]}
                )

    scored = corpus_codes.mapInPandas(
        fn, schema=f"probe_id bigint, {id_col} bigint, adist double"
    ).filter(F.col(id_col) != F.col("probe_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("adist").asc(), F.col(id_col).asc())
    return scored.withColumn("arank", F.row_number().over(w)).filter(F.col("arank") <= k)
