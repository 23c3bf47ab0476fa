"""Similarity-search queries over the embeddings table (BASELINE.json
LLM-pipeline operators; SURVEY §7.4 similarity-search family).

The ANN oracle shares the Python-generated hyperplane constants with the
Spark side (emitted as SQL literals), so both engines compute identical
buckets; within-bucket scoring then mirrors the brute-force formula.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.operators.similarity import (
    as_double_array,
    cosine,
    cosine_topk,
    hyperplanes,
    lsh_bucket,
)
from importer_spark.queries.registry import query

N_PROBES = 8
TOP_K = 5
DIMS = 64
N_PLANES = 4
PLANES = hyperplanes(N_PLANES, DIMS)
# IVF: nlist ≈ √corpus (the standard IVF sizing — cell population and cell
# count grow together), via stride = ceil(√N) over dense ids. Both engines
# derive the stride from COUNT(*) with the same correctly-rounded
# double-sqrt/ceil, so the seeded quantizer stays oracle-reproducible while
# driver state is O(√N·dim), not O(N) (r4 VERDICT: the fixed /100 stride
# collected a linearly-growing centroid set).
IVF_NPROBE = 3


def _ivf_stride(n: int) -> int:
    import math

    return max(1, math.ceil(math.sqrt(n)))

_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
pairs AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
    list_cosine_similarity(p.emb, c.emb) AS cos
  FROM e p JOIN e c ON p.vec_id < {N_PROBES} AND c.vec_id != p.vec_id
)
SELECT probe_id, neighbor_id, neighbor_label,
  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rank,
  ROUND(cos, 6) AS cosine
FROM pairs
QUALIFY rank <= {TOP_K}
"""


@query("embedding_cosine_topk", oracle=_TOPK_SQL)
def embedding_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k for a probe set — the ANN exactness baseline.
    Sequential double accumulation is bitwise-identical across engines
    (verified), so full-precision ranking agrees."""
    t = Tables(spark, sf_dir)
    e = t.wide("embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb"), "label"
    )
    probes = e.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("probe_emb")
    )
    corpus = e.select(
        F.col("vec_id"),
        F.col("emb").alias("corpus_emb"),
        F.col("label").alias("neighbor_label"),
    )
    out = cosine_topk(
        probes,
        corpus,
        probe_id="probe_id",
        corpus_id="vec_id",
        probe_vec="probe_emb",
        corpus_vec="corpus_emb",
        k=TOP_K,
        extra_corpus_cols=["neighbor_label"],
    )
    return out.select("probe_id", "neighbor_id", "neighbor_label", "rank", "cosine")


def _plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(str(c) for c in plane) + "]::DOUBLE[]"


def _ann_sql() -> str:
    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(emb, {_plane_literal(p)}) > 0 THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(PLANES)
    )
    probe_buckets = ", ".join(["bucket"] + [f"xor(bucket, {1 << j})" for j in range(N_PLANES)])
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
b AS (SELECT vec_id, emb, label, {bucket_expr} AS bucket FROM e),
probes AS (
  SELECT vec_id, emb, bucket, UNNEST([{probe_buckets}]) AS search_bucket
  FROM b WHERE vec_id < {N_PROBES}
),
pairs AS (
  SELECT p.vec_id AS probe_id, p.bucket, c.vec_id AS neighbor_id,
    list_cosine_similarity(p.emb, c.emb) AS cos
  FROM probes p JOIN b c ON p.search_bucket = c.bucket AND c.vec_id != p.vec_id
)
SELECT probe_id, bucket, neighbor_id,
  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rank,
  ROUND(cos, 6) AS cosine
FROM pairs
QUALIFY rank <= {TOP_K}
"""


@query("embedding_ann_lsh", oracle=_ann_sql())
def embedding_ann_lsh(spark, sf_dir):
    """Approximate top-k via multi-probe random-hyperplane LSH: vectors
    bucket by the sign pattern of the fixed hyperplane dots; each probe
    searches its own bucket plus all Hamming-distance-1 buckets (candidate
    set ≈ (1+n_planes)/2^n_planes of the corpus). Candidate generation is an
    equi-join on bucket id — the 100 TB path: one shuffle, no cross join.
    Recall vs brute force is measured in tests (these embeddings are
    near-uniform, so recall ≈ the searched corpus fraction — the structural
    bound, not an implementation defect)."""
    t = Tables(spark, sf_dir)
    e = t.wide("embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb"), "label"
    ).withColumn("bucket", lsh_bucket(F.col("emb"), PLANES))
    search_buckets = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(N_PLANES)]
    )
    probes = (
        e.filter(F.col("vec_id") < N_PROBES)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("emb").alias("probe_emb"),
            F.col("bucket"),
            F.explode(search_buckets).alias("search_bucket"),
        )
    )
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("corpus_emb"),
        F.col("bucket").alias("search_bucket"),
    )
    pairs = probes.join(corpus, on="search_bucket").filter(
        F.col("probe_id") != F.col("neighbor_id")
    )
    scored = pairs.withColumn("_cos", cosine(F.col("probe_emb"), F.col("corpus_emb")))
    w = Window.partitionBy("probe_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("probe_id", "bucket", "neighbor_id", "rank", F.round("_cos", 6).alias("cosine"))
    )


def _ivf_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
stride AS (SELECT GREATEST(CAST(ceil(sqrt(COUNT(*))) AS BIGINT), 1) AS s FROM e),
cent AS (SELECT vec_id AS cell_id, emb AS cemb FROM e WHERE vec_id % (SELECT s FROM stride) = 0),
nearest AS (
  SELECT e.vec_id, e.emb, cent.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      ORDER BY list_cosine_similarity(e.emb, cent.cemb) DESC, cent.cell_id) AS rn
  FROM e CROSS JOIN cent
),
assign AS (SELECT vec_id, emb, cell_id FROM nearest WHERE rn = 1),
probe_cells AS (
  SELECT vec_id AS probe_id, emb AS pemb, cell_id
  FROM nearest WHERE vec_id < {N_PROBES} AND rn <= {IVF_NPROBE}
),
pairs AS (
  SELECT p.probe_id, a.vec_id AS neighbor_id,
    list_cosine_similarity(p.pemb, a.emb) AS cos
  FROM probe_cells p JOIN assign a
    ON p.cell_id = a.cell_id AND a.vec_id != p.probe_id
)
SELECT probe_id, neighbor_id,
  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank,
  ROUND(cos, 6) AS cosine
FROM pairs
QUALIFY rank <= {TOP_K}
"""


def ivf_search(e, cell_ids: list[int], centroids: list[list[float]]):
    """IVF search over ``e`` (vec_id, emb) given a trained/seeded coarse
    quantizer: matmul-assign every vector to its nearest cell, matmul-rank
    each probe's IVF_NPROBE nearest cells, candidates via the cell_id
    equi-join, then EXACT sequential-accumulation cosine for the output
    scores (bitwise-portable where parity matters — candidate sets are
    small). One shuffle for candidates; the nlist×dim quantizer model rides
    the task closures, never the shuffle."""
    from importer_spark.operators.clustering import nearest_cells_cosine

    # Corpus assignment is ONE full matmul pass (n_best=1); probe cell
    # ranking runs on the FILTERED probe set only (the vec_id predicate
    # pushes to the scan), so the corpus never goes through the kernel
    # twice. (A "fused" single ranked DataFrame reads nicely but its two
    # differently-filtered consumers each re-execute the full-corpus
    # mapInPandas — the self-union-recompute trap.)
    assign = nearest_cells_cosine(e, "vec_id", "emb", cell_ids, centroids, n_best=1)
    probe_cells = nearest_cells_cosine(
        e.filter(F.col("vec_id") < N_PROBES),
        "vec_id",
        "emb",
        cell_ids,
        centroids,
        n_best=IVF_NPROBE,
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("emb").alias("pemb"),
        "cell_id",
    )
    pairs = probe_cells.join(assign.select("vec_id", "emb", "cell_id"), "cell_id").filter(
        F.col("probe_id") != F.col("vec_id")
    )
    scored = pairs.withColumn("_cos", cosine(F.col("pemb"), F.col("emb")))
    w = Window.partitionBy("probe_id").orderBy(F.col("_cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("_cos", 6).alias("cosine"),
        )
    )


@query("embedding_ivf_topk", oracle=_ivf_sql())
def embedding_ivf_topk(spark, sf_dir):
    """IVF-style ANN: a coarse quantizer partitions the corpus into
    nlist ≈ √N cells (deterministic ceil(√N)-strided seed centroids, so the
    SQL oracle reproduces them from its own COUNT(*); driver-side quantizer
    state is O(√N·dim) — the standard IVF sizing, never linear in the
    corpus). Every vector is assigned to its nearest cell by a numpy block
    matmul (operators/clustering.py::nearest_cells_cosine — O(matmul), not
    interpreted cosine × nlist), probes search their IVF_NPROBE nearest
    cells only, and candidate generation is an equi-join on cell_id — the
    same one-shuffle 100 TB shape as the LSH variant, but with
    data-adaptive cells. The kmeans-TRAINED twin is
    embedding_ivf_trained_topk (diagnostics — an iterative fixpoint has no
    SQL oracle); the trained-vs-seeded recall comparison lives in tests."""
    t = Tables(spark, sf_dir)
    e = t.wide("embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    stride = _ivf_stride(e.count())
    cent_rows = (
        e.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .collect()
    )  # the quantizer model: √N×dim, the canonical driver-side ML state
    cell_ids = [r["vec_id"] for r in cent_rows]
    centroids = [list(r["emb"]) for r in cent_rows]
    return ivf_search(e, cell_ids, centroids)


@query("embedding_ivf_trained_topk", catalog=False)
def embedding_ivf_trained_topk(spark, sf_dir):
    """The production IVF path: coarse quantizer TRAINED with kmeans_fit at
    nlist ≈ √N (3 Lloyd rounds, deterministic lowest-id seeds), then the
    identical ivf_search candidate join. Diagnostics-registered — k-means
    is an iterative fixpoint with no reasonable one-statement SQL oracle —
    and certified instead by tests/test_operators.py's recall floor vs
    brute force (trained ≥ seeded − tie noise) plus kmeans determinism/SSE
    monotonicity pins."""
    from importer_spark.operators.clustering import kmeans_fit

    t = Tables(spark, sf_dir)
    # NOT wide(): kmeans_fit's Lloyd rounds re-read the scan per round, so
    # a widen repartition is re-paid per iteration (the kmeans lesson).
    e = t.embeddings.select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    nlist = _ivf_stride(e.count())
    from importer_spark.operators.similarity import finite_vectors

    cents, _sse = kmeans_fit(e, "vec_id", "emb", k=nlist, iters=3)
    # non-finite vectors self-exclude from the search side too (the
    # finite_vectors contract; cell assignment of a NaN vector is argmin
    # over NaNs)
    return ivf_search(finite_vectors(e, "emb"), list(range(nlist)), cents)


@query("kmeans_embeddings", catalog=False)
def kmeans_embeddings(spark, sf_dir):
    """Distributed k-means (3 Lloyd rounds, deterministic lowest-id seeds)
    over the embedding corpus — the trained version of embedding_ivf_topk's
    coarse quantizer. Rows-only (no SQL oracle: an iterative fixpoint isn't
    reasonably expressible in one DuckDB statement); determinism and SSE
    monotonicity are pinned in tests/test_operators.py instead."""
    from importer_spark.operators.clustering import kmeans_assignments

    t = Tables(spark, sf_dir)
    # NOT wide(): each Lloyd round is its own action re-reading the scan —
    # a widen repartition would be re-paid per round (measured 1.33×).
    e = t.embeddings.select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    return kmeans_assignments(e, "vec_id", "emb", k=8, iters=3)


# --- int8-quantized ANN: quantized candidate generation + exact rescore ----
RESCORE_MULT = 4  # stage-1 candidates per probe = RESCORE_MULT * TOP_K

_QUANT_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (
  SELECT vec_id, emb, list_max(list_transform(emb, x -> abs(x))) AS maxabs
  FROM e
),
qq AS (
  SELECT vec_id, emb,
    CASE WHEN maxabs > 0
      THEN list_transform(emb, x -> CAST(floor(x * 127 / maxabs) AS BIGINT))
      ELSE list_transform(emb, x -> CAST(0 AS BIGINT)) END AS qv
  FROM q
),
qn AS (
  SELECT vec_id, emb, qv,
    sqrt(list_sum(list_transform(qv, x -> CAST(x * x AS DOUBLE)))) AS qnorm
  FROM qq
),
cand AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    p.emb AS pemb, c.emb AS cemb,
    list_dot_product(p.qv::DOUBLE[], c.qv::DOUBLE[]) / (p.qnorm * c.qnorm) AS qcos,
    ROW_NUMBER() OVER (
      PARTITION BY p.vec_id
      ORDER BY list_dot_product(p.qv::DOUBLE[], c.qv::DOUBLE[]) / (p.qnorm * c.qnorm) DESC,
               c.vec_id ASC
    ) AS qrank
  FROM qn p JOIN qn c ON p.vec_id < {N_PROBES} AND c.vec_id != p.vec_id
)
SELECT probe_id, neighbor_id,
  ROW_NUMBER() OVER (
    PARTITION BY probe_id
    ORDER BY list_cosine_similarity(pemb, cemb) DESC, neighbor_id ASC
  ) AS rank,
  ROUND(list_cosine_similarity(pemb, cemb), 6) AS cosine,
  ROUND(qcos, 6) AS qcosine
FROM cand
WHERE qrank <= {RESCORE_MULT * TOP_K}
QUALIFY rank <= {TOP_K}
"""


@query("embedding_quantized_topk", oracle=_QUANT_SQL)
def embedding_quantized_topk(spark, sf_dir):
    """Two-stage quantized ANN — the production memory-bandwidth shape:
    stage 1 ranks candidates by int8-quantized dot products (8× smaller
    vectors; exact integer sums, so the quantized ranking is deterministic),
    stage 2 rescores only the top RESCORE_MULT·k candidates at full
    precision. At 100 TB the corpus scan for candidate generation reads the
    int8 sidecar, not the float vectors — full-precision data is touched
    for ~k·RESCORE_MULT rows per probe. Quantization error only costs
    recall (measured in tests), never wrong scores: everything emitted is
    exactly rescored."""
    from importer_spark.operators.similarity import (
        finite_vectors,
        int_dot,
        max_abs,
        quantize_int8,
    )

    t = Tables(spark, sf_dir)
    # NOT wide(): this plan's pinned property is that the corpus never
    # shuffles (probe-broadcast ANN, test_shuffle_budget ceiling 2).
    e = finite_vectors(
        t.embeddings.select(
            "vec_id", as_double_array(F.col("embedding")).alias("emb")
        ),
        "emb",
    )  # a NaN/Inf component breaks int8 scaling (0/0) — self-exclude
    q = e.withColumn("maxabs", max_abs(F.col("emb")))
    q = q.withColumn("qv", quantize_int8(F.col("emb"), F.col("maxabs")))
    q = q.select(
        "vec_id",
        "emb",
        "qv",
        F.sqrt(int_dot(F.col("qv"), F.col("qv")).cast("double")).alias("qnorm"),
    )
    probes = q.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("emb").alias("pemb"),
        F.col("qv").alias("pqv"),
        F.col("qnorm").alias("pqnorm"),
    )
    pairs = (
        F.broadcast(probes)
        .crossJoin(q)
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn(
            "qcos",
            int_dot(F.col("pqv"), F.col("qv")).cast("double")
            / (F.col("pqnorm") * F.col("qnorm")),
        )
    )
    wq = Window.partitionBy("probe_id").orderBy(
        F.col("qcos").desc(), F.col("vec_id").asc()
    )
    cand = pairs.withColumn("qrank", F.row_number().over(wq)).filter(
        F.col("qrank") <= RESCORE_MULT * TOP_K
    )
    rescored = cand.withColumn("cos", cosine(F.col("pemb"), F.col("emb")))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("cosine"),
            F.round("qcos", 6).alias("qcosine"),
        )
    )


# --- product quantization: ADC candidates + exact rescore (rows-only) ------
PQ_M = 8
PQ_KSUB = 16
PQ_ITERS = 1
PQ_SAMPLE_MOD = 2
# ADC on near-uniform synthetic vectors is coarse; recall comes from the
# wide rescore budget. sample_mod=2 trains codebooks on the id%2==0 half
# (standard PQ practice — codebooks need coverage, not every row).
PQ_CAND_MULT = 8


@query("embedding_pq_topk", catalog=False)
def embedding_pq_topk(spark, sf_dir):
    """Product-quantization ANN: per-subspace codebooks trained with the
    distributed k-means operator (iterative — not SQL-expressible, hence
    rows-only like kmeans_embeddings), corpus encoded to 8 codes/vector,
    candidates ranked by ADC lookup-table distance, top candidates rescored
    at full precision. Recall vs the exact brute force is asserted in
    tests/test_quantized_ann.py; emitted cosines are always exact."""
    from importer_spark.operators.quantization import pq_adc_topk, pq_encode, pq_train

    t = Tables(spark, sf_dir)
    # NOT wide(): pq_train's per-subspace Lloyd rounds re-read the scan
    # per iteration (the kmeans lesson).
    e = t.embeddings.select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    books = pq_train(
        e, "vec_id", "emb", dim=DIMS, m=PQ_M, ksub=PQ_KSUB,
        iters=PQ_ITERS, sample_mod=PQ_SAMPLE_MOD,
    )
    codes = pq_encode(e, "vec_id", "emb", books)
    probes = [
        (r.vec_id, list(r.emb))
        for r in e.filter(F.col("vec_id") < N_PROBES).collect()
    ]
    cand = pq_adc_topk(codes, probes, books, "vec_id", k=PQ_CAND_MULT * TOP_K)
    probes_df = F.broadcast(
        e.filter(F.col("vec_id") < N_PROBES).select(
            F.col("vec_id").alias("probe_id"), F.col("emb").alias("pemb")
        )
    )
    rescored = (
        cand.join(e, "vec_id")
        .join(probes_df, "probe_id")
        .withColumn("cos", cosine(F.col("pemb"), F.col("emb")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("cosine"),
            F.round("adist", 6).alias("adist"),
        )
    )


# --- cluster-balanced (semantic-diversity) sampling ------------------------
CB_CAP = 40  # max vectors kept per cell


def _cluster_balanced_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
stride AS (SELECT GREATEST(CAST(ceil(sqrt(COUNT(*))) AS BIGINT), 1) AS s FROM e),
cent AS (SELECT vec_id AS cell_id, emb AS cemb FROM e WHERE vec_id % (SELECT s FROM stride) = 0),
nearest AS (
  SELECT e.vec_id, cent.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      ORDER BY list_cosine_similarity(e.emb, cent.cemb) DESC, cent.cell_id) AS rn
  FROM e CROSS JOIN cent
),
assign AS (SELECT vec_id, cell_id FROM nearest WHERE rn = 1),
sized AS (
  SELECT vec_id, cell_id, COUNT(*) OVER (PARTITION BY cell_id) AS cell_n
  FROM assign
),
ranked AS (
  SELECT vec_id, cell_id, cell_n,
    ROW_NUMBER() OVER (PARTITION BY cell_id
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS hr
  FROM sized
)
SELECT vec_id, cell_id, cell_n FROM ranked WHERE hr <= {CB_CAP}
"""


@query("cluster_balanced_sample", oracle=_cluster_balanced_sql())
def cluster_balanced_sample(spark, sf_dir):
    """Semantic-diversity sampling (the embedding-space twin of
    language_capped_sample): assign every vector to its nearest coarse
    cell, then cap each cell at CB_CAP via the reproducible md5 hash gate —
    over-represented semantic regions are down-sampled, sparse regions keep
    everything. Deterministic ceil(√N)-strided seed cells keep the oracle
    exact AND driver state O(√N·dim) (the kmeans-trained quantizer drops in
    via kmeans_fit for production, same plan). Scale shape: one matmul
    assignment pass (no shuffle), one per-cell window — the capped cells
    are exactly the skewed ones, same two-phase top-K escape hatch as the
    language cap if a cell dominates."""
    from importer_spark.operators.clustering import nearest_cells_cosine

    t = Tables(spark, sf_dir)
    # NOT wide(): count + centroid collect + assignment are three separate
    # actions, each re-paying a widen repartition.
    e = t.embeddings.select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    stride = _ivf_stride(e.count())
    cent_rows = (
        e.filter(F.col("vec_id") % stride == 0).orderBy("vec_id").collect()
    )
    assign = nearest_cells_cosine(
        e, "vec_id", "emb",
        [r["vec_id"] for r in cent_rows],
        [list(r["emb"]) for r in cent_rows],
        n_best=1,
    ).select("vec_id", "cell_id")
    sized = assign.withColumn(
        "cell_n", F.count("*").over(Window.partitionBy("cell_id"))
    )
    hr = F.row_number().over(
        Window.partitionBy("cell_id").orderBy(
            F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
        )
    )
    return (
        sized.withColumn("hr", hr)
        .filter(F.col("hr") <= CB_CAP)
        .select("vec_id", "cell_id", "cell_n")
    )


# --- margin-based pair mining (Artetxe & Schwenk 2019; CCMatrix) ------------
MB_K = 4  # kNN-mean size per side of the ratio margin
MB_THRESHOLD = 1.05  # ratio-margin cut: cos must beat the neighborhood mean
# Bucket-count dial: per-bucket cross-pool work is (pool/2^planes)^2, so
# planes must GROW with the corpus to keep bucket populations ~10^3
# (measured at 50x: 4 planes = 633 s, 8 planes = the linear regime; the r8
# sf1 gate paid 37.8 s at the fixed default). The plane count is therefore
# CORPUS-ADAPTIVE by default (r8 verdict #2): the smallest p in
# [MB_MIN_PLANES, MB_MAX_PLANES] with COUNT(*) <= MB_TARGET_BUCKET << p —
# a pure-INTEGER ladder both engines evaluate from the same count (no
# log2/ceil float edge cases), emitted into the oracle SQL as a CASE
# ladder over the same plane literals (prefix-stable: plane j depends only
# on j, so a p-plane bucket is the low-p-bits prefix of the max-plane
# bucket). SPARK_GRAFT_MARGIN_PLANES pins a fixed p on BOTH engines
# (import-read, as before) for reproducing old certifications.
MB_MIN_PLANES = 4
MB_MAX_PLANES = 14  # 16384 buckets — linear-regime pops up to ~4M vectors
# 250/bucket, not 10^3: the 100x sweep measured p=9 (~195/bucket) beating
# p=8 (~390/bucket) 85.1 s vs 159.4 s at 200k vectors — the per-bucket
# quadratic still dominates at 10^3. 250 keeps every driver/bench scale
# (<= 4000 vectors) at the certified p=4 while the sf1 gate gets p=7.
MB_TARGET_BUCKET = 250
_MB_ENV_PLANES = os.environ.get("SPARK_GRAFT_MARGIN_PLANES")
if _MB_ENV_PLANES is not None:
    # Validated at import (r9 ADVICE): an out-of-range pin would silently
    # produce probe buckets no row can occupy (p below the probe count) or
    # plane indices past the pool (p above MB_MAX_PLANES).
    _MB_ENV_PLANES = int(_MB_ENV_PLANES)
    if not (1 <= _MB_ENV_PLANES <= MB_MAX_PLANES):
        raise ValueError(
            f"SPARK_GRAFT_MARGIN_PLANES must be in [1, {MB_MAX_PLANES}], "
            f"got {_MB_ENV_PLANES}"
        )
MB_PLANES_POOL = hyperplanes(MB_MAX_PLANES, DIMS)


def _mb_adaptive_planes(n: int) -> int:
    """Smallest p in [MB_MIN_PLANES, MB_MAX_PLANES] with n <= target<<p —
    integer comparisons only, the exact ladder `_margin_sql` bakes."""
    if _MB_ENV_PLANES is not None:
        return int(_MB_ENV_PLANES)
    p = MB_MIN_PLANES
    while p < MB_MAX_PLANES and n > (MB_TARGET_BUCKET << p):
        p += 1
    return p


def _mb_planes_case_sql() -> str:
    """The same ladder as a DuckDB CASE over COUNT(*) — or the pinned
    constant when the env override is set (both engines honor it)."""
    if _MB_ENV_PLANES is not None:
        return str(int(_MB_ENV_PLANES))
    rungs = " ".join(
        f"WHEN cnt <= {MB_TARGET_BUCKET << p} THEN {p}"
        for p in range(MB_MIN_PLANES, MB_MAX_PLANES)
    )
    return f"(CASE {rungs} ELSE {MB_MAX_PLANES} END)"


# Recall dial: the source side additionally probes the 1-bit-flip buckets
# of its first MB_PROBE_BITS planes (embedding_ann_lsh's multi-probe),
# multiplying candidates by (1 + probes) and recall with them — the knob
# that buys back what a larger plane count costs. 0 = exact-bucket only
# (the published certifications); measured at sf0.001: probes 0 -> recall
# 0.122 of the exhaustive mutual-best truth, probes 4 -> 0.46. Clamped to
# the EFFECTIVE plane floor (r9 ADVICE: clamping to the constant
# MB_MIN_PLANES let a pinned p < 4 produce probe buckets no row can
# occupy): the adaptive ladder guarantees p >= MB_MIN_PLANES, and an env
# pin fixes p exactly, so the floor is whichever applies.
_MB_FLOOR_PLANES = _MB_ENV_PLANES if _MB_ENV_PLANES is not None else MB_MIN_PLANES
MB_PROBE_BITS = min(
    max(0, int(os.environ.get("SPARK_GRAFT_MARGIN_PROBES", "0"))), _MB_FLOOR_PLANES
)


def _margin_sql() -> str:
    # Every plane term is gated by `j < np` where np comes from the COUNT(*)
    # ladder — identical integer arithmetic to the Spark side's
    # _mb_adaptive_planes, so the two engines bucket identically at any
    # corpus size without a float log2 in sight.
    bucket_expr = " + ".join(
        f"(CASE WHEN {j} < np AND list_dot_product(emb, {_plane_literal(p)}) > 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(MB_PLANES_POOL)
    )
    probe_buckets = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << j})" for j in range(MB_PROBE_BITS)]
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
),
params AS (SELECT {_mb_planes_case_sql()} AS np FROM (SELECT COUNT(*) AS cnt FROM e)),
b AS (SELECT vec_id, emb, {bucket_expr} AS bucket FROM e, params),
sp AS (
  SELECT vec_id, emb,
    UNNEST([{probe_buckets}]) AS search_bucket
  FROM b WHERE vec_id % 2 = 0
),
cand AS (
  SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
    CAST(ROUND(list_cosine_similarity(s.emb, t.emb), 9) AS DECIMAL(18,9)) AS cos9
  FROM sp s JOIN b t ON s.search_bucket = t.bucket
  WHERE t.vec_id % 2 = 1
),
sr AS (
  SELECT src_id, tgt_id, cos9,
    ROW_NUMBER() OVER (PARTITION BY src_id
      ORDER BY cos9 DESC NULLS LAST, tgt_id ASC) AS rn
  FROM cand
),
sk AS (
  SELECT src_id, CAST(SUM(cos9) AS DOUBLE) / COUNT(cos9) AS m_src
  FROM sr WHERE rn <= {MB_K} GROUP BY 1
),
tr AS (
  SELECT src_id, tgt_id, cos9,
    ROW_NUMBER() OVER (PARTITION BY tgt_id
      ORDER BY cos9 DESC NULLS LAST, src_id ASC) AS rn
  FROM cand
),
tk AS (
  SELECT tgt_id, CAST(SUM(cos9) AS DOUBLE) / COUNT(cos9) AS m_tgt
  FROM tr WHERE rn <= {MB_K} GROUP BY 1
),
m AS (
  SELECT c.src_id, c.tgt_id, c.cos9,
    CAST(c.cos9 AS DOUBLE) / ((sk.m_src + tk.m_tgt) / 2) AS margin_raw
  FROM cand c
  JOIN sk ON sk.src_id = c.src_id
  JOIN tk ON tk.tgt_id = c.tgt_id
  WHERE c.cos9 IS NOT NULL AND (sk.m_src + tk.m_tgt) > 0
),
best AS (
  SELECT src_id, tgt_id, cos9, margin_raw,
    ROW_NUMBER() OVER (PARTITION BY src_id
      ORDER BY margin_raw DESC NULLS LAST, tgt_id ASC) AS r_s,
    ROW_NUMBER() OVER (PARTITION BY tgt_id
      ORDER BY margin_raw DESC NULLS LAST, src_id ASC) AS r_t
  FROM m
)
SELECT src_id, tgt_id,
  ROUND(CAST(cos9 AS DOUBLE), 6) AS cosine,
  ROUND(margin_raw, 6) AS margin
FROM best
WHERE r_s = 1 AND r_t = 1 AND ROUND(margin_raw, 6) >= {MB_THRESHOLD}
"""


@query("margin_bitext_mine", oracle=_margin_sql())
def margin_bitext_mine(spark, sf_dir):
    """Margin-based pair mining (Artetxe & Schwenk 2019 ratio margin; the
    CCMatrix/LASER bitext-mining criterion): treat even vec_ids as the
    source pool and odd vec_ids as the target pool, generate cross-pool
    candidates inside shared LSH buckets, and keep mutual-best pairs whose
    cosine beats the mean of each side's top-{MB_K} neighborhood by the
    ratio margin ≥ {MB_THRESHOLD} — absolute cosine thresholds are
    miscalibrated across embedding-space density, the margin normalizes by
    local density (the reason CCMatrix mines with margins, not cosines).

    Scale shape (the faiss-free 100 TB formulation): candidates come from
    the SAME LSH bucket equi-join the ANN path uses — one shuffle on bucket,
    never a cross-pool cartesian; the per-side kNN means are bounded-K
    window top-Ks followed by map-partial aggs; mutual-best is two windows
    over the candidate relation. The plane count is corpus-adaptive
    (_mb_adaptive_planes: smallest p with COUNT(*) <= MB_TARGET_BUCKET·2^p,
    target 250/bucket — r8 verdict #2: the fixed
    4-plane default went per-bucket-quadratic at only 10× driver scale),
    so per-bucket population stays ~10^3 as the corpus grows;
    SPARK_GRAFT_MARGIN_PLANES pins a fixed p on both engines.

    Float determinism: cosines are rounded to 9dp and summed as
    DECIMAL(18,9) (the BM25 convention — order can never flip a rank);
    the margin is then one double expression over identical exact inputs,
    so ranking and the threshold comparison agree bitwise across engines.
    """
    t = Tables(spark, sf_dir)
    # wide(): the per-row plane dot-products (lsh_bucket) run in the scan
    # stage; a one-row-group bench input would serialize them on one task.
    e = t.wide("embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    ).select("vec_id", as_double_array(F.col("embedding")).alias("emb"))
    # One COUNT over the pruned (vec_id, embedding-null) scan — the same
    # count the oracle's params CTE computes, so both ladders agree.
    n_planes = _mb_adaptive_planes(e.count())
    b = e.withColumn("bucket", lsh_bucket(F.col("emb"), MB_PLANES_POOL[:n_planes]))
    search_buckets = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(MB_PROBE_BITS)],
    )
    src = b.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"),
        F.col("emb").alias("s_emb"),
        F.explode(search_buckets).alias("bucket"),
    )
    tgt = b.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("emb").alias("t_emb"), "bucket"
    )
    cand = src.join(tgt, "bucket").select(
        "src_id",
        "tgt_id",
        F.round(cosine(F.col("s_emb"), F.col("t_emb")), 9)
        .cast("decimal(18,9)")
        .alias("cos9"),
    )
    # The candidate relation feeds THREE consumers (sk, tk, m). Without a
    # cut, each re-executes the bucket join AND the dim-length cosine fold —
    # the query's dominant per-row cost — from the reused shuffle (runtime
    # final plan: the cosine project appeared 3×). localCheckpoint pays the
    # cosine once into candidate-sized blocks ((src, tgt, cos9) rows, bounded
    # by the ~MB_TARGET_BUCKET/bucket ladder, never embedding-sized); AQE
    # still sizes the sk/tk broadcast joins from runtime stats above it.
    cand = cand.localCheckpoint(eager=True)
    w_src = Window.partitionBy("src_id").orderBy(
        F.col("cos9").desc_nulls_last(), F.col("tgt_id").asc()
    )
    w_tgt = Window.partitionBy("tgt_id").orderBy(
        F.col("cos9").desc_nulls_last(), F.col("src_id").asc()
    )
    sk = (
        cand.withColumn("rn", F.row_number().over(w_src))
        .filter(F.col("rn") <= MB_K)
        .groupBy("src_id")
        .agg((F.sum("cos9").cast("double") / F.count("cos9")).alias("m_src"))
    )
    tk = (
        cand.withColumn("rn", F.row_number().over(w_tgt))
        .filter(F.col("rn") <= MB_K)
        .groupBy("tgt_id")
        .agg((F.sum("cos9").cast("double") / F.count("cos9")).alias("m_tgt"))
    )
    m = (
        cand.join(sk, "src_id")
        .join(tk, "tgt_id")
        .filter(F.col("cos9").isNotNull() & ((F.col("m_src") + F.col("m_tgt")) > 0))
        .withColumn(
            "margin_raw",
            F.col("cos9").cast("double")
            / ((F.col("m_src") + F.col("m_tgt")) / 2),
        )
    )
    wb_s = Window.partitionBy("src_id").orderBy(
        F.col("margin_raw").desc_nulls_last(), F.col("tgt_id").asc()
    )
    wb_t = Window.partitionBy("tgt_id").orderBy(
        F.col("margin_raw").desc_nulls_last(), F.col("src_id").asc()
    )
    return (
        m.withColumn("r_s", F.row_number().over(wb_s))
        .withColumn("r_t", F.row_number().over(wb_t))
        .filter(
            (F.col("r_s") == 1)
            & (F.col("r_t") == 1)
            & (F.round("margin_raw", 6) >= MB_THRESHOLD)
        )
        .select(
            "src_id",
            "tgt_id",
            F.round(F.col("cos9").cast("double"), 6).alias("cosine"),
            F.round("margin_raw", 6).alias("margin"),
        )
    )
