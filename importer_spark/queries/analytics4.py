"""Round-4 analytics extensions, batch 3: per-group OLS trend fitting and
SemDeDup-style semantic deduplication.

- ``order_volume_trend_ols``: least-squares slope/intercept of daily order
  volume per priority class — the trend-line primitive behind forecasting
  marts (reference mart layer: models/mart/mart_order_trends.sql shape).
  All five OLS sufficient statistics (n, Σx, Σy, Σxx, Σxy) accumulate in
  exact BIGINT — x is a small day offset, y a daily count — so the closed
  forms  slope = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²)  and
  intercept = (ΣyΣxx − ΣxΣxy)/(nΣxx − (Σx)²)  are each ONE double division
  of two exactly-computed integers: bit-identical on any engine, at any
  parallelism, in any accumulation order.

- ``semantic_dedup_cells``: SemDeDup (Abbas et al. 2023, "SemDeDup: Data-
  efficient learning at web-scale through semantic deduplication"): coarse
  semantic cells + within-cell cosine pruning. Deterministic variant: the
  K lowest-id vectors seed the cells (argmax-cosine assignment, ties to
  the lower seed), and a vector is a duplicate iff a LOWER-id vector in
  the SAME cell has cosine ≥ τ — the parallel, order-free form of the
  paper's keep-one-per-group rule. The quadratic stage is confined to a
  cell-bucketed self-join (the SemDeDup scale contract: cells bound the
  pair fan-out; at 100 TB cells come from k-means — operators/clustering
  — and this query's plumbing is unchanged).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.operators.similarity import as_double_array, cosine
from importer_spark.queries.registry import query

# Anchor inside the data range keeps |x| ~ 1e3: every OLS sum then fits
# bigint with ~6 orders of magnitude to spare even at sf100.
_ANCHOR = "1995-06-01"

_OLS_SQL = f"""
WITH daily AS (
  SELECT o_orderpriority,
         DATEDIFF('day', DATE '{_ANCHOR}', CAST(o_orderdate AS DATE)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders
  GROUP BY 1, 2
),
sums AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM daily
  GROUP BY 1
)
SELECT o_orderpriority, n,
  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
    AS slope_per_day,
  CAST(sy * sxx - sx * sxy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
    AS intercept
FROM sums
"""


@query("order_volume_trend_ols", oracle=_OLS_SQL)
def order_volume_trend_ols(spark, sf_dir):
    """OLS trend of daily order counts per priority. Two map-side-combined
    aggregations (daily counts, then the 5 sufficient statistics — the
    classic mergeable-moments reduction, so the fit is one O(groups)
    reduce regardless of table size), then closed-form slope/intercept.
    No window, no collect, no iteration."""
    t = Tables(spark, sf_dir)
    daily = (
        t.orders.select(
            "o_orderpriority",
            F.datediff(F.col("o_orderdate").cast("date"), F.lit(_ANCHOR).cast("date")).alias("x"),
        )
        .groupBy("o_orderpriority", "x")
        .agg(F.count("*").alias("y"))
    )
    sums = daily.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    den = (n * sxx - sx * sx).cast("double")
    return sums.select(
        "o_orderpriority",
        "n",
        ((n * sxy - sx * sy).cast("double") / den).alias("slope_per_day"),
        ((sy * sxx - sx * sxy).cast("double") / den).alias("intercept"),
    )


_N_SEEDS = 8
_SEM_TAU = 0.45  # below this corpus's max pairwise cosine — dups exist

_SEMDEDUP_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
seeds AS (SELECT vec_id AS seed_id, emb AS semb FROM e WHERE vec_id < {_N_SEEDS}),
assign AS (
  SELECT vec_id, emb, seed_id,
    ROW_NUMBER() OVER (
      PARTITION BY vec_id
      ORDER BY list_cosine_similarity(emb, semb) DESC, seed_id ASC
    ) AS rk
  FROM e CROSS JOIN seeds
),
cells AS (SELECT vec_id, emb, seed_id AS cell FROM assign WHERE rk = 1)
SELECT a.vec_id, a.cell,
  CAST(EXISTS (
    SELECT 1 FROM cells b
    WHERE b.cell = a.cell AND b.vec_id < a.vec_id
      AND list_cosine_similarity(a.emb, b.emb) >= {_SEM_TAU}
  ) AS BOOLEAN) AS is_semantic_dup
FROM cells a
"""


@query("semantic_dedup_cells", oracle=_SEMDEDUP_SQL)
def semantic_dedup_cells(spark, sf_dir):
    """SemDeDup: assign each vector to its max-cosine seed cell (K seeds
    broadcast as array literals — K dot products per row, all inside
    whole-stage codegen), then flag vectors with a lower-id cosine-≥-τ
    neighbor IN THE SAME CELL. The pair join shuffles on the cell key
    only — within-cell quadratic, cross-cell zero — which is the entire
    point of semantic pre-partitioning; the oracle keeps the naive
    correlated-EXISTS form, so parity certifies the bucketed rewrite."""
    t = Tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    seeds = [
        (int(r["vec_id"]), [float(x) for x in r["emb"]])
        for r in e.filter(F.col("vec_id") < _N_SEEDS).collect()
    ]
    # argmax over K seed cosines, ties to the lower seed id: strictly-greater
    # comparison while scanning seeds in ascending id order.
    best_cos, best_id = None, None
    for sid, vec in sorted(seeds):
        c = cosine(F.col("emb"), F.array(*[F.lit(x) for x in vec]))
        if best_cos is None:
            best_cos, best_id = c, F.lit(sid)
        else:
            gt = c > best_cos
            best_id = F.when(gt, F.lit(sid)).otherwise(best_id)
            best_cos = F.when(gt, c).otherwise(best_cos)
    cells = e.select("vec_id", "emb", best_id.alias("cell"))
    left = cells.select(
        F.col("vec_id"), F.col("emb").alias("emb_a"), F.col("cell")
    )
    right = cells.select(
        F.col("vec_id").alias("vid_b"), F.col("emb").alias("emb_b"), F.col("cell")
    )
    dup_ids = (
        left.join(right, "cell")
        .filter(
            (F.col("vid_b") < F.col("vec_id"))
            & (cosine(F.col("emb_a"), F.col("emb_b")) >= F.lit(_SEM_TAU))
        )
        .select("vec_id")
        .distinct()
        .withColumn("is_semantic_dup", F.lit(True))
    )
    return (
        cells.join(dup_ids, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce("is_semantic_dup", F.lit(False)).alias("is_semantic_dup"),
        )
    )
