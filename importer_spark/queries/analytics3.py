"""Round-4 analytics extensions, batch 2: skyline (Pareto-front) selection,
exact-cents largest-remainder proration, sweep-line peak concurrency,
explicit n-gram Jaccard near-dup pairs, and linear time-series
interpolation onto a daily grid.

These close classic warehouse/data-pipeline shapes the reference's users
reach for next (reference mart layer: models/mart/fct_orders.sql,
models/mart/mart_order_issues.sql): dominance filtering for assortment
analysis, penny-exact allocation of an order-level amount to its lines
(the invoice/GL proration rule), "how many X were open at once" capacity
questions, the textbook n-gram-Jaccard dedup measure as a first-class
query (the LSH family approximates exactly this), and gap-filling with
interpolation rather than LOCF (timeseries.events_locf is the step-wise
twin).

Determinism conventions as repo-wide: integer/decimal arithmetic
everywhere an exact cross-engine hash is required, doubles only in IEEE
expressions evaluated in the same literal order on both engines, every
window carries a total-order tie-break.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.operators.dedup import shingle_rows
from importer_spark.queries.registry import query

_SKYLINE_SQL = """
SELECT a.p_partkey, a.p_type, a.p_size, a.p_retailprice
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_type = a.p_type
    AND b.p_retailprice < a.p_retailprice
    AND b.p_size > a.p_size
)
"""


@query("pareto_skyline_parts", oracle=_SKYLINE_SQL)
def pareto_skyline_parts(spark, sf_dir):
    """2-D skyline per part type: parts not strictly dominated on (lower
    retail price, larger size) — the Pareto front a buyer actually chooses
    from. The naive formulation is the oracle's quadratic NOT EXISTS
    self-join; the engine side is the O(n log n) sweep, distributed: max
    size per (type, price) group, then a running max over STRICTLY cheaper
    price groups (rowsBetween on the grouped relation, so equal-price rows
    never dominate each other), join back and keep rows the running max
    does not exceed. One shuffle for the group-agg, one window partitioned
    by type, one co-partitioned join — no quadratic stage anywhere, and
    the two independent formulations certify each other.

    3VL: a row with a NULL type, price, or size neither dominates nor can
    be dominated (every dominance comparison against it is UNKNOWN), so
    such rows bypass the sweep straight into the skyline — exactly what
    the oracle's NOT EXISTS yields."""
    t = Tables(spark, sf_dir)
    has_null = (
        F.col("p_type").isNull()
        | F.col("p_retailprice").isNull()
        | F.col("p_size").isNull()
    )
    passthrough = t.part.filter(has_null).select(
        "p_partkey", "p_type", "p_size", "p_retailprice"
    )
    clean = t.part.filter(~has_null)
    g = clean.groupBy("p_type", "p_retailprice").agg(
        F.max("p_size").alias("_gmax")
    )
    w = (
        Window.partitionBy("p_type")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.select(
        "p_type",
        "p_retailprice",
        F.max("_gmax").over(w).alias("_prev_max_size"),
    )
    swept = (
        clean.join(g, ["p_type", "p_retailprice"])
        .filter(
            F.col("_prev_max_size").isNull()
            | (F.col("_prev_max_size") <= F.col("p_size"))
        )
        .select("p_partkey", "p_type", "p_size", "p_retailprice")
    )
    return swept.unionByName(passthrough)


_ALLOC_SQL = """
WITH li AS (
  SELECT l_orderkey, l_linenumber,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS ext_cents,
    CAST(CAST(l_discount AS DECIMAL(8,2)) * 100 AS BIGINT) AS disc_bp
  FROM lineitem
),
pool AS (
  -- CASTs back to BIGINT: DuckDB SUM(BIGINT) widens to HUGEINT, which
  -- pandas renders as float — the value hash must see integers.
  SELECT *,
    CAST(SUM(ext_cents * disc_bp) OVER (PARTITION BY l_orderkey) // 100
         AS BIGINT) AS pool_cents,
    CAST(SUM(ext_cents) OVER (PARTITION BY l_orderkey) AS BIGINT)
      AS total_ext_cents
  FROM li
),
ideal AS (
  SELECT *,
    (pool_cents * ext_cents) // total_ext_cents AS base_cents,
    (pool_cents * ext_cents) % total_ext_cents AS rem
  FROM pool
),
ranked AS (
  SELECT *,
    pool_cents - SUM(base_cents) OVER (PARTITION BY l_orderkey) AS leftover,
    ROW_NUMBER() OVER (
      PARTITION BY l_orderkey ORDER BY rem DESC, l_linenumber ASC) AS rk
  FROM ideal
)
SELECT l_orderkey, l_linenumber, ext_cents, pool_cents,
  CAST(base_cents + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
    AS alloc_cents
FROM ranked
"""


@query("discount_allocation", oracle=_ALLOC_SQL)
def discount_allocation(spark, sf_dir):
    """Largest-remainder proration: each order's total discount pool (in
    cents, derived all-integer from decimal-exact extendedprice x discount
    basis points) is allocated to its lineitems proportionally to
    extendedprice, with the rounding leftover distributed one cent at a
    time to the largest fractional remainders (tie-break linenumber) — so
    SUM(alloc_cents) == pool_cents per order, exactly, the invariant GL
    journal postings require. Everything is bigint division/modulo, so the
    result is bit-identical on any engine. One shuffle on l_orderkey
    serves all three windows (Catalyst reuses the partitioning); no join."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("ext_cents"),
        (F.col("l_discount").cast("decimal(8,2)") * 100)
        .cast("bigint")
        .alias("disc_bp"),
    )
    w = Window.partitionBy("l_orderkey")
    pool = li.select(
        "*",
        F.expr("SUM(ext_cents * disc_bp) OVER (PARTITION BY l_orderkey) DIV 100")
        .alias("pool_cents"),
        F.sum("ext_cents").over(w).alias("total_ext_cents"),
    )
    ideal = pool.select(
        "*",
        F.expr("(pool_cents * ext_cents) DIV total_ext_cents").alias("base_cents"),
        F.expr("(pool_cents * ext_cents) % total_ext_cents").alias("rem"),
    )
    ranked = ideal.select(
        "*",
        (F.col("pool_cents") - F.sum("base_cents").over(w)).alias("leftover"),
        F.row_number()
        .over(w.orderBy(F.col("rem").desc(), F.col("l_linenumber").asc()))
        .alias("rk"),
    )
    return ranked.select(
        "l_orderkey",
        "l_linenumber",
        "ext_cents",
        "pool_cents",
        (
            F.col("base_cents")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_cents"),
    )


_INFLIGHT_SQL = """
WITH iv AS (
  SELECT l_suppkey,
    CAST(o_orderdate AS DATE) AS d0,
    CAST(l_shipdate AS DATE) AS d1
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  -- an interval needs both endpoints; a NULL date has no sweep position
  WHERE o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL
),
b AS (
  SELECT l_suppkey, d, SUM(delta) AS delta FROM (
    SELECT l_suppkey, d0 AS d, 1 AS delta FROM iv
    UNION ALL
    SELECT l_suppkey, d1 AS d, -1 AS delta FROM iv
  ) GROUP BY l_suppkey, d
),
r AS (
  SELECT l_suppkey, d,
    SUM(delta) OVER (PARTITION BY l_suppkey ORDER BY d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS inflight
  FROM b
),
p AS (
  SELECT *, MAX(inflight) OVER (PARTITION BY l_suppkey) AS peak FROM r
)
SELECT l_suppkey, CAST(peak AS BIGINT) AS peak_inflight,
  strftime(MIN(d), '%Y-%m-%d') AS peak_date
FROM p WHERE inflight = peak
GROUP BY l_suppkey, peak
"""


@query("supplier_inflight_peak", oracle=_INFLIGHT_SQL)
def supplier_inflight_peak(spark, sf_dir):
    """Sweep-line peak concurrency: per supplier, the maximum number of
    lineitems simultaneously in flight (half-open [order date, ship date)
    intervals) and the first date the peak is reached. Interval overlap
    counting without a range self-join: intervals become +1/-1 boundary
    deltas, pre-aggregated per (supplier, date) so the window runs over at
    most one row per day, then a running sum ordered by date gives the
    concurrency profile. Partitioned by supplier, so the prefix sums
    parallelize across the supplier dimension — no global single-task
    window, no interval self-join (which is quadratic per supplier)."""
    t = Tables(spark, sf_dir)
    # wide(): the probe side of the broadcast join + the boundary explode +
    # the map-side partial agg all run in the scan stage now that the
    # two-branch union is gone; a one-row-group bench input serializes them.
    iv = (
        t.wide("lineitem").join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .filter(F.col("o_orderdate").isNotNull() & F.col("l_shipdate").isNotNull())
        .select(
            "l_suppkey",
            F.to_date("o_orderdate").alias("d0"),
            F.to_date("l_shipdate").alias("d1"),
        )
    )
    # ±1 boundary deltas via explode over ONE pass of iv: a self-union of
    # two selects executes the lineitem⋈orders join twice (the graph.py
    # bidirectional-edge lesson — measured 2× the upstream cost); the
    # array-of-structs explode emits both endpoints from a single scan+join.
    b = (
        iv.select(
            "l_suppkey",
            F.explode(
                F.array(
                    F.struct(F.col("d0").alias("d"), F.lit(1).alias("delta")),
                    F.struct(F.col("d1").alias("d"), F.lit(-1).alias("delta")),
                )
            ).alias("_e"),
        )
        .select("l_suppkey", "_e.d", "_e.delta")
        .groupBy("l_suppkey", "d")
        .agg(F.sum("delta").alias("delta"))
    )
    w_run = (
        Window.partitionBy("l_suppkey")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = b.select("l_suppkey", "d", F.sum("delta").over(w_run).alias("inflight"))
    p = r.select(
        "*", F.max("inflight").over(Window.partitionBy("l_suppkey")).alias("peak")
    )
    return (
        p.filter(F.col("inflight") == F.col("peak"))
        .groupBy("l_suppkey", "peak")
        .agg(F.date_format(F.min("d"), "yyyy-MM-dd").alias("peak_date"))
        .select(
            "l_suppkey",
            F.col("peak").cast("bigint").alias("peak_inflight"),
            "peak_date",
        )
    )


# Shingling must mirror operators/dedup.shingle_rows exactly (the
# llm_dedup._SHINGLE_CTE convention): 3-word shingles with multiplicity
# collapsed per document, whole text for <3-token docs.
_NGRAM_JACCARD_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
s AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 3
      THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                          for i in range(1, len(t) - 1)])
      ELSE [array_to_string(t, ' ')]
    END AS sh
  FROM d
),
grams AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
rare AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
    FROM grams
  ) WHERE df <= 50
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM rare GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM rare a JOIN rare b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, CAST(i.n_common AS BIGINT) AS n_common,
  ROUND(i.n_common::DOUBLE / (sa.sz + sb.sz - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.n_common::DOUBLE / (sa.sz + sb.sz - i.n_common) >= 0.4
"""


@query("ngram_jaccard_pairs", oracle=_NGRAM_JACCARD_SQL)
def ngram_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (the measure MinHash+LSH
    approximates, as its own first-class query): 3-word shingle sets with a
    document-frequency cap of 50 (the standard stop-gram drop — a shingle
    appearing in >50 docs carries no dedup signal and is what makes naive
    inverted-index joins quadratic), pair candidates and intersection
    counts from ONE inverted-index self-join, Jaccard = |A∩B|/(|A|+|B|-|A∩B|)
    over the capped gram space, threshold 0.4. The df cap bounds the join
    fan-out per shingle at 50·49/2 pairs regardless of corpus size, so the
    candidate stage scales with shingle rows, not documents². Integer
    counts + one rounded division keep the emitted values engine-portable.
    Scale path beyond this: near_dup_pairs (LSH banding) generates
    candidates without touching df>cap grams at all."""
    t = Tables(spark, sf_dir)
    grams = shingle_rows(t.wide("documents"), "doc_id", "text").distinct()
    rare = grams.select(
        "doc_id",
        "shingle",
        F.count("*").over(Window.partitionBy("shingle")).alias("df"),
    ).filter(F.col("df") <= 50)
    sizes = rare.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = rare.select(F.col("doc_id").alias("id_a"), "shingle")
    b = rare.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("_sa"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("_sb"))
    jac = (
        F.col("n_common").cast("double")
        / (F.col("_sa") + F.col("_sb") - F.col("n_common"))
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.4)
        .select(
            "id_a",
            "id_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


_INTERP_SQL = """
WITH s AS (
  SELECT user_id, ts, value,
    LEAD(ts) OVER w AS nts, LEAD(value) OVER w AS nv,
    epoch_us(ts) AS t_us, epoch_us(LEAD(ts) OVER w) AS nt_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
p AS (
  SELECT * FROM s
  WHERE nts IS NOT NULL AND CAST(nts AS DATE) >= CAST(ts AS DATE) + 1
),
g AS MATERIALIZED (
  -- MATERIALIZED is load-bearing for oracle RUNTIME only (values are
  -- identical): DuckDB re-inlines the CTE into the wide outer projection
  -- and re-executes the select-list unnest per referenced column --
  -- measured 520 s vs 0.5 s at sf1 (431k grid rows).
  SELECT user_id, value, nv, t_us, nt_us,
    unnest(generate_series(
      CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP),
      CAST(CAST(nts AS DATE) AS TIMESTAMP),
      INTERVAL 1 DAY)) AS gts
  FROM p
)
SELECT user_id, strftime(gts, '%Y-%m-%d') AS grid_date,
  ROUND(value + (nv - value) * (epoch_us(gts) - t_us) / (nt_us - t_us), 6)
    AS interp_value
FROM g
"""


@query("events_interpolate", oracle=_INTERP_SQL)
def events_interpolate(spark, sf_dir):
    """Linear interpolation onto a daily grid: for every midnight strictly
    after one observation and at-or-before the next (per user), the value
    linearly interpolated between the bracketing observations — the
    continuous-variable gap-fill (events_locf is the step-function twin).
    One window pass pairs consecutive observations (LEAD), then
    F.sequence() generates only the midnights each interval actually
    covers — grid rows are emitted by the pair that owns them, so there is
    no grid x events join and no per-user grid materialization. Intervals
    that do not cross a midnight are filtered BEFORE sequence() (Spark's
    sequence(start > stop) would generate a descending range, and
    same-timestamp pairs would divide by zero). The interpolation
    expression is written in the identical literal order on both engines:
    v + (nv - v) * (g_us - t_us) / (nt_us - t_us) over microsecond epochs,
    so the doubles agree bitwise before the single ROUND."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = t.events.select(
        "user_id",
        "ts",
        "value",
        F.lead("ts").over(w).alias("nts"),
        F.lead("value").over(w).alias("nv"),
    ).select(
        "*",
        F.unix_micros("ts").alias("t_us"),
        F.unix_micros("nts").alias("nt_us"),
    )
    p = s.filter(
        F.col("nts").isNotNull()
        & (F.to_date("nts") >= F.date_add(F.to_date("ts"), 1))
    )
    g = p.select(
        "user_id",
        "value",
        "nv",
        "t_us",
        "nt_us",
        F.explode(
            F.sequence(
                F.date_add(F.to_date("ts"), 1).cast("timestamp"),
                F.to_date("nts").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("gts"),
    )
    return g.select(
        "user_id",
        F.date_format("gts", "yyyy-MM-dd").alias("grid_date"),
        F.round(
            F.col("value")
            + (F.col("nv") - F.col("value"))
            * (F.unix_micros("gts") - F.col("t_us"))
            / (F.col("nt_us") - F.col("t_us")),
            6,
        ).alias("interp_value"),
    )
