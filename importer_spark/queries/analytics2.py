"""Round-4 analytics extensions: market-basket co-occurrence, Markov
transition matrices, time-weighted (LOCF) averages, and RFM segmentation.

These extend the reference's mart layer (customer health scoring in
dim_company_health.sql, order analytics in fct_orders.sql) with four
classic warehouse shapes the reference's users would reach for next:
association mining over order baskets, event-sequence transition
probabilities, duration-weighted metrics over irregular event streams
(the TimescaleDB ``time_weight`` shape), and recency/frequency/monetary
customer segmentation (generalizing the reference's health-score ntile at
dim_company_health.sql:59).

Scale notes are per query; the repo-wide conventions apply (exact decimal
accumulation with ONE final double conversion, deterministic tie-breaks on
every window, no single-task global windows — `operators/ranks.py`).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.functions import dec, out_double
from importer_spark.io import Tables
from importer_spark.queries.registry import query

_BASKET_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
part_cnt AS (SELECT l_partkey, COUNT(*) AS cnt FROM items GROUP BY 1),
pair_cnt AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders_both
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT p.part_a, p.part_b,
  CAST(p.n_orders_both AS BIGINT) AS n_orders_both,
  ROUND(p.n_orders_both::DOUBLE / n.n, 6) AS support,
  ROUND(p.n_orders_both::DOUBLE / ca.cnt, 6) AS confidence_a_to_b,
  ROUND(p.n_orders_both::DOUBLE * n.n / (ca.cnt * cb.cnt), 6) AS lift
FROM pair_cnt p
JOIN part_cnt ca ON ca.l_partkey = p.part_a
JOIN part_cnt cb ON cb.l_partkey = p.part_b
CROSS JOIN n_orders n
WHERE p.n_orders_both >= 2
"""


@query("basket_pair_lift", oracle=_BASKET_SQL)
def basket_pair_lift(spark, sf_dir):
    """Market-basket association mining: for every pair of parts bought in
    the same order, support / confidence / lift, gated at min-support 2
    orders. Pair blowup is bounded by basket size squared (TPC-H baskets
    are ≤7 lines), NOT corpus size, so this is the a-priori first pass that
    scales linearly in orders. Part frequencies join back on the part key
    (AQE broadcasts the count side while it fits); the one-row order total
    broadcasts. All ratios are int/int divisions rounded once — bit-stable
    across engines.

    Shuffle budget: ONE shuffle builds the per-order sorted basket array
    (groupBy orderkey + collect_set); pairs are then generated LOCALLY by a
    nested array transform — no lineitem self-join — and part frequencies
    and the order total derive from the same basket arrays. The oracle
    keeps the self-join formulation, so parity also certifies the rewrite."""
    t = Tables(spark, sf_dir)
    baskets = t.lineitem.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    n_orders = baskets.agg(F.count("*").alias("n"))
    part_cnt = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
    )
    ps = F.col("ps")
    pair_structs = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + 2, F.size(ps)),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .groupBy(
            F.col("pr.part_a").alias("part_a"),
            F.col("pr.part_b").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders_both"))
        .filter(F.col("n_orders_both") >= 2)
    )
    ca = part_cnt.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a"))
    cb = part_cnt.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("n_orders_both").cast("bigint").alias("n_orders_both"),
            F.round(F.col("n_orders_both").cast("double") / F.col("n"), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_orders_both").cast("double") / F.col("cnt_a"), 6
            ).alias("confidence_a_to_b"),
            F.round(
                F.col("n_orders_both").cast("double")
                * F.col("n")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )


_TRANSITION_SQL = """
WITH seq AS (
  SELECT event_type,
    LEAD(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
    ) AS next_type
  FROM events
),
cnt AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n_transitions
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type,
  CAST(n_transitions AS BIGINT) AS n_transitions,
  ROUND(n_transitions::DOUBLE
        / SUM(n_transitions) OVER (PARTITION BY from_type), 6) AS p_transition
FROM cnt
"""


@query("event_transition_matrix", oracle=_TRANSITION_SQL)
def event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current event type). The sequencing window shuffles
    once on user_id (deterministic (ts, event_id) order); the transition
    count is a map-side-combining groupBy on a k² key space, and the row
    normalization runs on the k²-row aggregate — trivially small at any
    corpus scale. The user-journey building block for churn-path and
    next-action models."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    seq = t.events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    w_norm = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_norm),
            6,
        ).alias("p_transition"),
    )


_TIME_WEIGHTED_SQL = """
WITH seg AS (
  SELECT user_id, value,
    LEAD(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
    ) - epoch_us(ts) AS dur_us
  FROM events
)
SELECT user_id,
  CAST(COUNT(dur_us) AS BIGINT) AS n_segments,
  CAST(SUM(dur_us) AS BIGINT) AS span_us,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)) * dur_us) AS DOUBLE)
        / SUM(dur_us), 6) AS tw_avg_value
FROM seg
WHERE dur_us IS NOT NULL
GROUP BY user_id
"""


@query("time_weighted_value", oracle=_TIME_WEIGHTED_SQL)
def time_weighted_value(spark, sf_dir):
    """Duration-weighted (LOCF) average of an irregular event stream — the
    TimescaleDB ``time_weight('LOCF', ...)`` shape: each observed value is
    held until the next observation and weighted by how long it was held.
    One shuffle on user_id serves both the LEAD window and the final
    aggregate (same key — no second exchange). Weighted sums accumulate as
    exact decimal·µs products, ONE double divide at the end, so partial-
    aggregation order can never change the result."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    us = F.unix_micros(F.col("ts"))
    seg = t.events.select(
        "user_id",
        "value",
        (F.lead(us).over(w) - us).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("dur_us").cast("bigint").alias("n_segments"),
            F.sum("dur_us").cast("bigint").alias("span_us"),
            F.round(
                F.sum(dec(F.col("value"), 6) * F.col("dur_us")).cast("double")
                / F.sum("dur_us"),
                6,
            ).alias("tw_avg_value"),
        )
    )


_RFM_SQL = """
WITH cust AS (
  SELECT o_custkey,
    MAX(o_orderdate) AS last_order,
    COUNT(*) AS frequency,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY 1
),
anchor AS (SELECT MAX(o_orderdate) AS max_date FROM orders),
scored AS (
  SELECT o_custkey,
    date_diff('day', last_order, max_date) AS recency_days,
    frequency,
    CAST(monetary AS DOUBLE) AS monetary,
    CAST(NTILE(5) OVER (ORDER BY date_diff('day', last_order, max_date), o_custkey)
         AS INTEGER) AS r_score,
    CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS INTEGER) AS f_score,
    CAST(NTILE(5) OVER (ORDER BY CAST(monetary AS DOUBLE) DESC, o_custkey)
         AS INTEGER) AS m_score
  FROM cust CROSS JOIN anchor
)
SELECT o_custkey AS cust_key,
  CAST(recency_days AS BIGINT) AS recency_days,
  CAST(frequency AS BIGINT) AS frequency,
  monetary, r_score, f_score, m_score,
  CASE
    WHEN r_score <= 2 AND f_score <= 2 AND m_score <= 2 THEN 'champion'
    WHEN r_score <= 2 AND f_score >= 4 THEN 'new'
    WHEN r_score >= 4 AND f_score <= 2 THEN 'at_risk'
    WHEN r_score >= 4 AND f_score >= 4 THEN 'lost'
    ELSE 'regular'
  END AS segment
FROM scored
"""


@query("rfm_segments", oracle=_RFM_SQL)
def rfm_segments(spark, sf_dir):
    """RFM customer segmentation (scores 1 = best): recency vs the data-max
    anchor date (frozen-now convention, F14), order frequency, exact-decimal
    monetary total; each scored into quintiles and mapped to lifecycle
    segments.

    r10 shape: ONE melted pass through the distributed rank operator
    instead of three. The r9 form called `with_global_rank_stats` once per
    metric on a differently-pruned projection of `cust`, so the orders
    aggregation was re-evaluated ~13× (static plan: 53 Exchanges / 64
    scans; runtime exchange reuse could not collapse the branches because
    column pruning made every partial aggregate distinct). Now `cust`
    melts to (cust_key, metric, sort_val, display values) — 3 skinny rows
    per customer — and ONE `with_grouped_rank_stats(part=metric)` call
    ranks all three metrics in parallel; scores pivot back with a single
    groupBy(cust_key). `sort_val` encodes each metric's direction and
    NULL placement into a plain ascending double: recency ASC NULLS FIRST
    → (value, NULL→-inf); frequency/monetary DESC NULLS LAST → (-value,
    NULL→+inf). The metrics themselves can never be ±inf (datediff /
    count / decimal-sum-cast-to-double), so the encodings cannot collide,
    and equal metric values stay equal under negation, so NTILE
    tie-breaking by cust_key is unchanged. No single-task window at any
    scale, exactly as before."""
    from importer_spark.operators.ranks import ntile_col, with_grouped_rank_stats

    t = Tables(spark, sf_dir)
    anchor = t.orders.agg(F.max("o_orderdate").alias("max_date"))
    cust = (
        t.orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(dec(F.col("o_totalprice"))).alias("monetary_dec"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            F.col("o_custkey").alias("cust_key"),
            F.datediff(F.col("max_date"), F.col("last_order"))
            .cast("bigint")
            .alias("recency_days"),
            F.col("frequency").cast("bigint").alias("frequency"),
            out_double(F.col("monetary_dec")).alias("monetary"),
        )
    )
    neg_inf = F.lit(float("-inf"))
    pos_inf = F.lit(float("inf"))
    null_long = F.lit(None).cast("bigint")
    null_double = F.lit(None).cast("double")

    def m_row(metric: str, sort_val, disp_long, disp_double):
        return F.struct(
            F.lit(metric).alias("metric"),
            sort_val.alias("sort_val"),
            disp_long.alias("disp_long"),
            disp_double.alias("disp_double"),
        )

    melted = cust.select(
        "cust_key",
        F.explode(
            F.array(
                m_row(
                    "r",
                    F.coalesce(F.col("recency_days").cast("double"), neg_inf),
                    F.col("recency_days"),
                    null_double,
                ),
                m_row(
                    "f",
                    F.coalesce(-F.col("frequency").cast("double"), pos_inf),
                    F.col("frequency"),
                    null_double,
                ),
                m_row(
                    "m",
                    F.coalesce(-F.col("monetary"), pos_inf),
                    null_long,
                    F.col("monetary"),
                ),
            )
        ).alias("_m"),
    ).select(
        "cust_key", "_m.metric", "_m.sort_val", "_m.disp_long", "_m.disp_double"
    )
    ranked = with_grouped_rank_stats(
        melted,
        ["metric"],
        "sort_val",
        [F.col("sort_val").asc(), F.col("cust_key").asc()],
        materialize=True,  # melted rides the orders agg consumed by 3 metric
        # branches: compute once (r11 A/B kept True: 1.26 s vs 1.43 s plain)
    )
    score = ntile_col(5)
    pivoted = ranked.groupBy("cust_key").agg(
        F.max(F.when(F.col("metric") == "r", F.col("disp_long"))).alias(
            "recency_days"
        ),
        F.max(F.when(F.col("metric") == "f", F.col("disp_long"))).alias("frequency"),
        F.max(F.when(F.col("metric") == "m", F.col("disp_double"))).alias("monetary"),
        F.max(F.when(F.col("metric") == "r", score)).alias("r_score"),
        F.max(F.when(F.col("metric") == "f", score)).alias("f_score"),
        F.max(F.when(F.col("metric") == "m", score)).alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2) & (F.col("m_score") <= 2),
            F.lit("champion"),
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), F.lit("new"))
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), F.lit("at_risk"))
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), F.lit("lost"))
        .otherwise(F.lit("regular"))
    )
    return pivoted.select(
        "cust_key",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        seg.alias("segment"),
    )


_PR_ITERS = 6
_PR_SCALE = 10**12  # ranks as scaled integers: r_scaled = r * 1e12


def _pagerank_sql() -> str:
    """Chained-CTE PageRank oracle: each iteration is one more CTE stage —
    the SQL text is generated by the same loop count as the Spark side, so
    the two engines run the identical fixed-point prefix. All rank math is
    scaled-INTEGER (× 1e12, integer division) — there is no floating-point
    op anywhere in the iteration, so cross-engine drift is impossible by
    construction, not by rounding-convention luck. Every CTE is
    MATERIALIZED: without it DuckDB re-inlines the edge relation into each
    iteration stage (measured >600 s at sf1; 4 s materialized)."""
    head = """
WITH items AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pair_cnt AS MATERIALIZED (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
edges AS MATERIALIZED (
  SELECT part_a AS src, part_b AS dst FROM pair_cnt
  UNION ALL
  SELECT part_b AS src, part_a AS dst FROM pair_cnt
),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
n AS (SELECT COUNT(*) AS n_nodes FROM deg),
r0 AS (
  SELECT src AS node,
         CAST(1000000000000 // n_nodes AS BIGINT) AS r
  FROM deg CROSS JOIN n
)"""
    steps = []
    for i in range(_PR_ITERS):
        steps.append(f""",
r{i + 1} AS MATERIALIZED (
  SELECT e.dst AS node,
    CAST(150000000000000 // (100 * MAX(n.n_nodes))
         + (85 * SUM(r.r // d.outdeg)) // 100 AS BIGINT) AS r
  FROM edges e
  JOIN r{i} r ON r.node = e.src
  JOIN deg d ON d.src = e.src
  CROSS JOIN n
  GROUP BY e.dst
)"""
        )
    tail = f"""
SELECT node AS part_key, CAST(r AS DOUBLE) / 1000000000000.0 AS pagerank
FROM r{_PR_ITERS}
"""
    return head + "".join(steps) + tail


@query("copurchase_pagerank", oracle=_pagerank_sql())
def copurchase_pagerank(spark, sf_dir):
    """PageRank over the part co-purchase graph (edges = part pairs bought
    together in ≥2 orders, symmetrized): product centrality by basket
    structure — the iterative-algorithm showpiece with an EXACT oracle (the
    DuckDB SQL is generated by the same loop, so both engines run the
    identical {iters}-iteration prefix of the fixed point).

    Cross-engine determinism: rank is a scaled INTEGER (× 1e12); damping
    and out-degree division are integer ops (a first draft that rounded
    doubles to 12 places diverged by one unit in the last place on a
    rounding tie — integer arithmetic removes the class of bug, not the
    instance). The deliberate cost is ≤1e-12 truncation per edge per
    iteration, identical in both engines.

    Scale shape: the co-purchase candidate generator is the same
    local-pair-generation pass as `basket_pair_lift` (one shuffle to build
    per-order basket arrays, pairs via nested array transform — no
    self-join; blowup bounded by basket size); each iteration is ONE
    shuffle — contributions join rank on the node key, aggregate on dst —
    the standard distributed PageRank schedule, O(iters × edges) total.
    Every relation stays distributed; no driver state beyond the loop
    counter.""".format(iters=_PR_ITERS)
    t = Tables(spark, sf_dir)
    baskets = t.lineitem.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    ps = F.col("ps")
    pair_structs = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + 2, F.size(ps)),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .groupBy(
            F.col("pr.part_a").alias("part_a"),
            F.col("pr.part_b").alias("part_b"),
        )
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("part_a", "part_b")
    )
    edges = pairs.select(
        F.col("part_a").alias("src"), F.col("part_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("part_b").alias("src"), F.col("part_a").alias("dst"))
    )
    # Materialize the edge relation ONCE (graph.py convention): every
    # iteration references edges/deg, and without truncation the lineage
    # repeats the basket pair-generation six times and the optimizer pays
    # for a 100+-exchange plan. The edge list is the iteration's working
    # set — small relative to lineitem (pairs bought together >= 2 times).
    # Repartition (NOT coalesce) before the checkpoint: the edge list is
    # tiny relative to lineitem, and every one of the 6 iteration rounds
    # schedules stages over its partitioning — fewer, fuller partitions cut
    # the per-round scheduling overhead. coalesce would collapse the
    # upstream pair aggregation to the same tasks (measured OOM at sf1);
    # repartition keeps it parallel behind its own exchange. The width is
    # the session's shuffle-partition setting, NOT a constant (r10: the
    # hard-coded 8 was a local-mode dial — bench derives shuffle
    # partitions from input bytes, so this is byte-for-byte identical at
    # bench scale and scale-adaptive on a cluster).
    edge_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = edges.repartition(edge_parts).localCheckpoint(eager=True)
    # deg is referenced by every iteration round too — checkpoint the tiny
    # nodes-sized relation once instead of re-running the groupBy per
    # round's plan branch (r10; same rationale as edges above).
    deg = (
        edges.groupBy("src")
        .agg(F.count("*").alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    n = deg.agg(F.count("*").alias("n_nodes"))
    rank = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"),
        F.expr(f"CAST({_PR_SCALE} div n_nodes AS BIGINT)").alias("r"),
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(rank, edges.src == rank.node)
            .join(deg, "src")
            .select(F.col("dst"), F.expr("r div outdeg").alias("c"))
        )
        rank = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(n))
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST({15 * _PR_SCALE * 10} div (100 * n_nodes)"
                    " + (85 * s) div 100 AS BIGINT)"
                ).alias("r"),
            )
        )
    return rank.select(
        F.col("node").alias("part_key"),
        (F.col("r").cast("double") / F.lit(float(_PR_SCALE))).alias("pagerank"),
    )
