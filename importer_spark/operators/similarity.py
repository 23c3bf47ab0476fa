"""Similarity-search operators over embedding columns (BASELINE.json north
star): brute-force cosine top-k as the exactness baseline, and a
random-hyperplane LSH bucketed variant as the scale path.

Float determinism: dot products use sequential left-to-right double
accumulation (F.aggregate over zip_with), which is bitwise-identical to
DuckDB's list kernels — verified empirically. Scores are rounded to 6dp at
the output; ranking uses full precision with id tie-breaks.

Scale notes: brute force is O(P·N) per P probes — correct baseline, used with
a small probe set or as the in-bucket scorer. The LSH variant buckets vectors
by sign patterns against fixed hyperplanes: candidate generation becomes an
equi-join on bucket id (one shuffle), and recall/cost is tuned by n_planes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def row_normalize(m):
    """Row-normalize a float64 numpy matrix IN PLACE, leaving zero-norm
    rows as zero rows instead of dividing 0/0 into NaN (r5 advice): a NaN
    row propagates NaN cosines that silently never clear any >= threshold,
    plus a RuntimeWarning per batch. The resulting contract — shared by
    every numpy block-matmul operator here and in semdedup.py — is that a
    zero-norm vector has cosine 0 with everything: it never flags as a
    duplicate and never causes one. A NaN/Inf COMPONENT degrades only its
    own row: the row normalizes to NaNs, every cosine against it is NaN,
    and NaN >= threshold is False — so non-finite vectors self-exclude
    from pair output instead of failing the job or polluting finite rows
    (pinned by test_nonfinite_embeddings_self_exclude)."""
    import numpy as np

    norms = np.linalg.norm(m, axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        np.divide(m, norms, out=m, where=norms != 0)
    return m


# Per-task scratch budget for block matmuls: the sims matrix a tile
# produces is block_rows × tile float64s. Without tiling, a 10k-row Arrow
# block against a 40k-row broadcast allocates 3.2 GB PER TASK (measured at
# the 100× sweep: run-to-run wall 18→117 s from memory thrash across 32
# tasks); capped at 16M doubles (128 MB) the same work streams in column
# tiles with identical outputs — values and rounding are untouched, only
# the evaluation order of independent (row, col) cells changes.
_TILE_BUDGET_DOUBLES = 16_000_000


def _col_tile(n_block_rows: int) -> int:
    return max(512, _TILE_BUDGET_DOUBLES // max(1, n_block_rows))


def finite_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Rows whose vector has ONLY finite components. The ANN/clustering
    contract for dirty data (row_normalize's self-exclusion, applied at
    ingestion): a NaN/±Inf/NULL component disqualifies its OWN vector
    from model training and candidate generation instead of crashing the
    job (k-means SSE went None, int8 scaling divided by zero — both found
    by the FLOATSPECIAL smoke gate) or poisoning centroids/codebooks.
    Pure JVM predicate (forall), no Python."""
    x = F.col(vec_col)
    return df.filter(
        F.forall(
            x,
            lambda v: v.isNotNull()
            & ~F.isnan(v)
            & (F.abs(v) < F.lit(float("inf"))),
        )
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential-accumulation dot product (bitwise-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def hyperplanes(n_planes: int, dims: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: coefficient (j,i) decodes the
    first hex char of md5(f"{j}_{i}") to a value in [-7.5, 7.5]. Fixed
    constants → reproducible bucketing in any engine."""
    return [
        [
            HEX.index(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0]) - 7.5
            for i in range(dims)
        ]
        for j in range(n_planes)
    ]


def lsh_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Bucket id = bits of sign(emb · plane_j), j ascending."""
    acc = F.lit(0)
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(c) for c in plane])
        acc = acc + F.when(dot(emb, p) > 0, F.lit(1 << j)).otherwise(0)
    return acc


def cosine_pairs_blockwise(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    round_scale: int = 6,
    max_broadcast_rows: int = 100_000,
) -> DataFrame:
    """All-pairs cosine above ``threshold`` via block matrix multiply for a
    BOUNDED probe/dedup-block set: the input (must fit driver/executor
    memory) broadcasts as a normalized float64 matrix; each input partition
    multiplies its block against it with numpy (Arrow-batched, ~30× the
    interpreted per-element path). Emits id_a < id_b pairs.

    ``max_broadcast_rows`` is a hard guard against the driver-OOM misuse of
    this helper on an unbounded corpus — use :func:`cosine_pairs_exact`
    (triangle block decomposition, no driver materialization) for that."""
    import numpy as np

    pdf = df.select(id_col, vec_col).limit(max_broadcast_rows + 1).toPandas()
    if len(pdf) > max_broadcast_rows:
        raise ValueError(
            f"cosine_pairs_blockwise input exceeds max_broadcast_rows="
            f"{max_broadcast_rows}; use cosine_pairs_exact for unbounded corpora"
        )
    ids_all = pdf[id_col].to_numpy()
    m = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
    row_normalize(m)
    bc = df.sparkSession.sparkContext.broadcast((ids_all, m))

    def blocks(it):
        import pandas as pd

        ids_b, mb = bc.value
        for block in it:
            ids_a = block[id_col].to_numpy()
            a = np.vstack(block[vec_col].to_numpy()).astype("float64")
            row_normalize(a)
            tile = _col_tile(len(ids_a))
            for t0 in range(0, len(ids_b), tile):
                idc = ids_b[t0 : t0 + tile]
                sims = a @ mb[t0 : t0 + tile].T
                ii, jj = np.nonzero(
                    (sims >= threshold) & (ids_a[:, None] < idc[None, :])
                )
                yield pd.DataFrame(
                    {
                        "id_a": ids_a[ii],
                        "id_b": idc[jj],
                        "cosine": np.round(sims[ii, jj], round_scale),
                    }
                )

    return df.select(id_col, vec_col).mapInPandas(
        blocks, schema="id_a bigint, id_b bigint, cosine double"
    )


def cosine_pairs_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_blocks: int = 8,
    round_scale: int = 6,
) -> DataFrame:
    """Exact all-pairs cosine ≥ ``threshold`` with NO driver-side corpus
    materialization: triangle block decomposition.

    Rows hash into ``n_blocks`` blocks; each unordered block pair (i ≤ j)
    becomes one group, and every row replicates to the ``n_blocks`` groups
    its block participates in (one broadcast join + one shuffle of
    ``N·n_blocks`` (id, vec) rows — no content columns move). Each group
    computes its pairs with a numpy block matmul inside ``applyInPandas``;
    a pair (x, y) lives in exactly one group — (min(blk_x, blk_y),
    max(blk_x, blk_y)) — so no dedup pass is needed.

    Scale knob: executor memory per task is two blocks ≈ ``2·N/n_blocks``
    float64 vectors; pick ``n_blocks ≈ N·dims·8 / 256 MB``. Shuffle volume
    grows as N·n_blocks ≈ N·√work — the unavoidable cost of an EXACT
    quadratic operator; for approximate near-dup at corpus scale use the
    LSH / IVF bucketed paths instead."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    pairs = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    pairs_df = spark.createDataFrame(pairs, "blk_a int, blk_b int")
    e = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    rep = e.join(
        F.broadcast(pairs_df),
        (F.col("_blk") == F.col("blk_a")) | (F.col("_blk") == F.col("blk_b")),
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        ba, bb = int(pdf["blk_a"].iat[0]), int(pdf["blk_b"].iat[0])
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )

        def side(blk):
            part = pdf[pdf["_blk"] == blk]
            ids = part["_id"].to_numpy()
            if len(ids) == 0:
                return ids, None
            m = np.vstack(part["_vec"].to_numpy()).astype("float64")
            row_normalize(m)
            return ids, m

        ids_a, ma = side(ba)
        if ma is None:
            return empty
        if ba == bb:
            ids_b, mb = ids_a, ma
            same = True
        else:
            ids_b, mb = side(bb)
            if mb is None:
                return empty
            same = False
        # Column-tiled matmul (same _TILE_BUDGET_DOUBLES cap as the
        # broadcast operators): a 200k-corpus / 8-block group would
        # otherwise allocate a 25k x 25k = 5 GB sims temp per task.
        parts = []
        tile = _col_tile(len(ids_a))
        for t0 in range(0, len(ids_b), tile):
            idc = ids_b[t0 : t0 + tile]
            sims = ma @ mb[t0 : t0 + tile].T
            if same:
                ii, jj = np.nonzero(
                    (sims >= threshold) & (ids_a[:, None] < idc[None, :])
                )
            else:
                ii, jj = np.nonzero(sims >= threshold)
            left, right = ids_a[ii], idc[jj]
            parts.append(
                pd.DataFrame(
                    {
                        "id_a": np.minimum(left, right),
                        "id_b": np.maximum(left, right),
                        "cosine": np.round(sims[ii, jj], round_scale),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True) if parts else empty

    return rep.groupBy("blk_a", "blk_b").applyInPandas(
        compute, schema="id_a bigint, id_b bigint, cosine double"
    )


def cosine_topk(
    probes: DataFrame,
    corpus: DataFrame,
    probe_id: str,
    corpus_id: str,
    probe_vec: str,
    corpus_vec: str,
    k: int,
    extra_corpus_cols: list[str] | None = None,
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the probe set against the corpus,
    rank per probe by (cosine desc, id asc). The corpus is never shuffled —
    only the per-probe top-k heap (TakeOrdered within window) reduces."""
    extra = extra_corpus_cols or []
    pairs = F.broadcast(probes.select(probe_id, probe_vec)).crossJoin(
        corpus.select(corpus_id, corpus_vec, *extra)
    )
    scored = pairs.filter(F.col(probe_id) != F.col(corpus_id)).withColumn(
        "_cos", cosine(F.col(probe_vec), F.col(corpus_vec))
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("_cos").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(probe_id),
            F.col(corpus_id).alias("neighbor_id"),
            "rank",
            F.round("_cos", 6).alias("cosine"),
            *extra,
        )
    )


def max_abs(emb: Column) -> Column:
    """Per-vector max |x| — the symmetric int8 quantization scale factor."""
    return F.array_max(F.transform(emb, lambda x: F.abs(x)))


def quantize_int8(emb: Column, maxabs: Column) -> Column:
    """Symmetric per-vector int8 quantization: q_i = floor(x_i·127/max|x|),
    values in [-127, 127] (stored long for exact integer dot products).
    floor on identical double arithmetic is engine-portable — no round().
    Zero vectors quantize to zeros. At 100 TB this is the memory-bandwidth
    play: 8× smaller than float64 scan for candidate generation; ranking
    error is bounded by the quantization step, and a full-precision rescore
    of the top candidates restores exactness (see embedding_quantized_topk)."""
    q = F.transform(emb, lambda x: F.floor(x * F.lit(127) / maxabs).cast("long"))
    zeros = F.transform(emb, lambda x: F.lit(0).cast("long"))
    return F.when(maxabs > 0, q).otherwise(zeros)


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product (long accumulation, order-independent)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_pairs_probe(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    round_scale: int = 6,
    max_broadcast_rows: int = 100_000,
    max_pairs_per_probe: int | None = None,
    return_overflow: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Incremental threshold pairs: the BATCH side (bounded by definition
    for daily-ingest dedup) broadcasts as a normalized float64 matrix; each
    CORPUS partition matmuls its block against it. Returns every pair with
    cosine >= threshold touching a batch vector, as normalized id_a < id_b
    rows (batch-batch pairs arrive in both orientations — identical matmul
    reductions, so a distinct() collapses them exactly).

    The probe-side twin of :func:`cosine_pairs_blockwise`: same numeric
    path (row-normalized ``a @ b.T``), same broadcast bound, but the big
    side streams — corpus scale costs one scan, never a corpus broadcast.

    ``max_pairs_per_probe`` is the production emit-cap dial (r6 verdict:
    the 100× exponent ~2.3 is output-driven — emitted pairs grow 4.01× per
    corpus doubling on clone-heavy data, so an adversarially duplicate-
    heavy shard materializes an unbounded pair set). With a cap K, each
    batch vector keeps only its K highest-cosine matches (ties broken by
    the other id ascending — deterministic): the kernel pre-caps per Arrow
    block (exact, since any global top-K match is top-K within its block),
    a single shuffle on the probe id finishes the global top-K, and output
    is bounded by K·|batch| regardless of corpus duplication. Degradation
    is OBSERVABLE, not silent: with ``return_overflow=True`` the function
    returns ``(pairs, overflow)`` where overflow holds one row per
    saturated probe — (probe_id, n_matches, emit_cap) with the exact
    pre-cap match degree. Default (None) is byte-identical to the uncapped
    contract — the certified catalog path."""
    import numpy as np

    pdf = batch.select(id_col, vec_col).limit(max_broadcast_rows + 1).toPandas()
    if len(pdf) > max_broadcast_rows:
        raise ValueError(
            f"cosine_pairs_probe batch exceeds max_broadcast_rows="
            f"{max_broadcast_rows}; split the ingest batch"
        )
    ids_b = pdf[id_col].to_numpy()
    mb = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
    row_normalize(mb)
    bc = batch.sparkSession.sparkContext.broadcast((ids_b, mb))

    if max_pairs_per_probe is None:
        if return_overflow:
            raise ValueError("return_overflow requires max_pairs_per_probe")

        def blocks(it):
            import pandas as pd

            bids, bm = bc.value
            for block in it:
                ids_a = block[id_col].to_numpy()
                a = np.vstack(block[vec_col].to_numpy()).astype("float64")
                row_normalize(a)
                tile = _col_tile(len(ids_a))
                for t0 in range(0, len(bids), tile):
                    idc = bids[t0 : t0 + tile]
                    sims = a @ bm[t0 : t0 + tile].T
                    ii, jj = np.nonzero(
                        (sims >= threshold) & (ids_a[:, None] != idc[None, :])
                    )
                    lo = np.minimum(ids_a[ii], idc[jj])
                    hi = np.maximum(ids_a[ii], idc[jj])
                    yield pd.DataFrame(
                        {
                            "id_a": lo,
                            "id_b": hi,
                            "cosine": np.round(sims[ii, jj], round_scale),
                        }
                    )

        return (
            corpus.select(id_col, vec_col)
            .mapInPandas(blocks, schema="id_a bigint, id_b bigint, cosine double")
            .distinct()
        )

    cap = int(max_pairs_per_probe)
    if cap < 1:
        raise ValueError(f"max_pairs_per_probe must be >= 1, got {cap}")

    def blocks_capped(it):
        import pandas as pd

        bids, bm = bc.value
        for block in it:
            ids_a = block[id_col].to_numpy()
            a = np.vstack(block[vec_col].to_numpy()).astype("float64")
            row_normalize(a)
            tile = _col_tile(len(ids_a))
            for t0 in range(0, len(bids), tile):
                idc = bids[t0 : t0 + tile]
                sims = a @ bm[t0 : t0 + tile].T
                ii, jj = np.nonzero(
                    (sims >= threshold) & (ids_a[:, None] != idc[None, :])
                )
                if len(ii) == 0:
                    continue
                s = sims[ii, jj]
                others = ids_a[ii]
                if return_overflow:
                    # Exact pre-cap degree per probe in this tile (count
                    # rows) — only when the caller asked for the overflow
                    # relation; otherwise they'd double the shuffled rows
                    # for nothing.
                    deg = np.bincount(jj, minlength=len(idc))
                    hit = np.nonzero(deg)[0]
                    yield pd.DataFrame(
                        {
                            "probe_id": idc[hit],
                            "other_id": np.full(len(hit), -1, dtype="int64"),
                            "cosine": np.zeros(len(hit)),
                            "n_matched": deg[hit].astype("int64"),
                        }
                    )
                # Local top-cap per probe, sorted by the SAME key the
                # global window uses — the ROUNDED cosine desc, other id
                # asc — so the cap is deterministic under any
                # partitioning (ranking by unrounded sims here would keep
                # a different member of a round-equal tie than the window
                # does).
                order = np.lexsort((others, -np.round(s, round_scale), jj))
                jj_o = jj[order]
                starts = np.r_[0, np.flatnonzero(np.diff(jj_o)) + 1]
                counts = np.diff(np.r_[starts, len(jj_o)])
                rank = np.arange(len(jj_o)) - np.repeat(starts, counts)
                keep = order[rank < cap]
                yield pd.DataFrame(
                    {
                        "probe_id": idc[jj[keep]],
                        "other_id": others[keep],
                        "cosine": np.round(s[keep], round_scale),
                        "n_matched": np.zeros(len(keep), dtype="int64"),
                    }
                )

    raw = corpus.select(id_col, vec_col).mapInPandas(
        blocks_capped,
        schema="probe_id bigint, other_id bigint, cosine double, n_matched bigint",
    )
    if return_overflow:
        # Both returned DataFrames consume `raw`; without materialization
        # each would re-run the corpus scan + matmul (the dominant cost).
        # The checkpointed relation is BOUNDED — ≤ cap·|batch| pair rows
        # per partition plus ≤ |batch| count rows per block — never
        # corpus-sized, so pinning it is safe at any duplication level.
        raw = raw.localCheckpoint(eager=True)
    # Discriminate on n_matched (count rows carry the pre-cap degree >= 1,
    # pair rows carry 0) — no assumption about the id domain.
    pair_rows = raw.filter(F.col("n_matched") == 0)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("other_id").asc()
    )
    pairs = (
        pair_rows.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select(
            F.least("probe_id", "other_id").alias("id_a"),
            F.greatest("probe_id", "other_id").alias("id_b"),
            "cosine",
        )
        .distinct()
    )
    if not return_overflow:
        return pairs
    overflow = (
        raw.filter(F.col("n_matched") > 0)
        .groupBy("probe_id")
        .agg(F.sum("n_matched").alias("n_matches"))
        .filter(F.col("n_matches") > cap)
        .select("probe_id", "n_matches", F.lit(cap).alias("emit_cap"))
    )
    return pairs, overflow
