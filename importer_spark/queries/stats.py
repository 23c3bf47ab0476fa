"""Statistical aggregates (corr / stddev / covar / regr_slope family)
(SURVEY §2.5 aggregation surface; dashboard-mart statistics shapes).

Built-in streaming moment aggregates (Welford/pairwise) are
partitioning-order-dependent in their low bits, so `F.corr` vs DuckDB `corr`
won't hash-match. Instead: accumulate EXACT decimal power sums (order-free,
merge-safe — the same property that makes them the right shape for a 1000-
executor partial agg) and evaluate the closed-form moments in double with an
identical expression tree in both engines — bitwise-equal at 6dp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.functions import dec
from importer_spark.io import Tables
from importer_spark.queries.registry import query

# Shared closed forms (x = quantity, y = extended price), evaluated in double
# from exact sums. Spark and DuckDB both compute left-to-right IEEE doubles,
# so writing the SAME formula text yields the same bits. Every denominator is
# NULLIF-guarded: a single-row or constant-valued group must yield NULL in
# BOTH engines (unguarded, Spark's non-ANSI x/0 gives NULL but DuckDB gives
# inf/nan — a parity break on small strata).
_FORMULAS = {
    "mean_qty": "sx / n",
    "stddev_qty": "sqrt((n * sxx - sx * sx) / NULLIF(n * (n - 1), 0))",
    "covar_qty_price": "(n * sxy - sx * sy) / NULLIF(n * (n - 1), 0)",
    "corr_qty_price": (
        "(n * sxy - sx * sy) / NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0)"
    ),
    "regr_slope": "(n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)",
    "regr_intercept": (
        "(sy - ((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)) * sx) / n"
    ),
}

_STATS_SQL = """
WITH sums AS (
  SELECT l_returnflag,
    COUNT(*) AS cnt,
    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS dsx,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS dsy,
    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS dsxx,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS dsyy,
    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS dsxy
  FROM lineitem GROUP BY l_returnflag
), d AS (
  SELECT l_returnflag, cnt,
    CAST(cnt AS DOUBLE) AS n, CAST(dsx AS DOUBLE) AS sx, CAST(dsy AS DOUBLE) AS sy,
    CAST(dsxx AS DOUBLE) AS sxx, CAST(dsyy AS DOUBLE) AS syy, CAST(dsxy AS DOUBLE) AS sxy
  FROM sums
)
SELECT l_returnflag, CAST(cnt AS BIGINT) AS n_rows,
  {formulas}
FROM d
""".format(
    formulas=",\n  ".join(
        f"ROUND({expr}, 6) AS {name}" for name, expr in _FORMULAS.items()
    )
)


@query("lineitem_stats_by_flag", oracle=_STATS_SQL)
def lineitem_stats_by_flag(spark, sf_dir):
    """Mean / stddev / covariance / correlation / OLS line per return flag.
    One shuffle (the groupBy); the six power sums combine map-side, so the
    reduce moves one small row per (flag, partition) regardless of data
    volume — the textbook scalable-moments plan."""
    t = Tables(spark, sf_dir)
    x = dec(F.col("l_quantity"))
    y = dec(F.col("l_extendedprice"))
    sums = t.lineitem.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.sum(x).alias("dsx"),
        F.sum(y).alias("dsy"),
        F.sum(x * x).alias("dsxx"),
        F.sum(y * y).alias("dsyy"),
        F.sum(x * y).alias("dsxy"),
    )
    d = sums.select(
        "l_returnflag",
        "cnt",
        F.col("cnt").cast("double").alias("n"),
        F.col("dsx").cast("double").alias("sx"),
        F.col("dsy").cast("double").alias("sy"),
        F.col("dsxx").cast("double").alias("sxx"),
        F.col("dsyy").cast("double").alias("syy"),
        F.col("dsxy").cast("double").alias("sxy"),
    )
    return d.select(
        "l_returnflag",
        F.col("cnt").cast("bigint").alias("n_rows"),
        *[
            F.round(F.expr(expr), 6).alias(name)
            for name, expr in _FORMULAS.items()
        ],
    )


_COHORT_SQL = """
WITH firsts AS (
  SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort_month
  FROM orders GROUP BY 1
),
activity AS (
  SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS act_month
  FROM orders
)
SELECT strftime(f.cohort_month, '%Y-%m') AS cohort_month,
  CAST(date_diff('month', f.cohort_month, a.act_month) AS INTEGER) AS months_since,
  COUNT(*) AS active_customers
FROM firsts f JOIN activity a USING (o_custkey)
GROUP BY 1, 2
"""


@query("cohort_retention_matrix", oracle=_COHORT_SQL)
def cohort_retention_matrix(spark, sf_dir):
    """Cohort retention: customers bucketed by first-order month, counted in
    every month they were active, keyed (cohort, months-since) — the classic
    retention triangle. Two aggs + one equi-join on custkey; both sides are
    per-customer reductions, so the join input is |customers|, never raw
    orders. months_between on month-truncated dates is integral by
    construction (cast int, no float fuzz)."""
    t = Tables(spark, sf_dir)
    firsts = t.orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_month")
    )
    activity = t.orders.select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("act_month")
    ).distinct()
    return (
        firsts.join(activity, "o_custkey")
        .groupBy(
            F.date_format("cohort_month", "yyyy-MM").alias("cohort_month"),
            F.months_between(F.col("act_month"), F.col("cohort_month"))
            .cast("int")
            .alias("months_since"),
        )
        .agg(F.count("*").alias("active_customers"))
    )


@query("order_value_quantile_sketch", catalog=False)
def order_value_quantile_sketch(spark, sf_dir):
    """Mergeable KLL quantile sketch over o_totalprice: per-partition
    partials (NO raw-row shuffle) merged to p50/p90/p99 estimates —
    the rollup-layer alternative to an exact full sort. Diagnostics:
    sketch contents are engine-specific; tests/test_quantile_sketch.py
    pins mass conservation, determinism, and the rank-error bound vs
    exact percentiles (single sketch and any merge order)."""
    from importer_spark.operators.quantiles import quantile_estimates

    t = Tables(spark, sf_dir)
    est = quantile_estimates(t.orders, "o_totalprice", [0.5, 0.9, 0.99], k=200)
    return spark.createDataFrame(
        [(float(q), float(v)) for q, v in sorted(est.items())],
        "quantile double, estimate double",
    )


@query("event_value_quantile_rollup", catalog=False)
def event_value_quantile_rollup(spark, sf_dir):
    """Sketch-store rollup: per-(event_type, day) KLL partials — the state
    an incremental daily load would persist — merged UP to per-event_type
    p50/p95 WITHOUT rescanning events (the quantile twin of
    incremental_distinct_sketch's HLL rollup). Merging happens inside
    applyInPandas per rollup group; no sketch ever reaches the driver.
    Error bounds vs exact per-type percentiles pinned in
    tests/test_quantile_sketch.py."""
    from importer_spark.operators.quantiles import (
        grouped_quantile_partials,
        rollup_quantiles,
    )

    t = Tables(spark, sf_dir)
    daily = grouped_quantile_partials(
        t.events.withColumn("day", F.to_date("ts")),
        ["event_type", "day"],
        "value",
        k=200,
    )
    return rollup_quantiles(daily, ["event_type"], [0.5, 0.95], k=200)


# --- exact distributed AUC (Mann-Whitney rank-sum, tie-corrected) -----------
_AUC_SQL = """
WITH d AS (
  -- length(), not strlen(): DuckDB strlen counts BYTES, Spark length counts
  -- codepoints — identical on ASCII, divergent on multibyte text (caught by
  -- the Unicode fuzz gate; the llm_text oracles already use length()).
  SELECT source, lang,
    ROUND(
      LEAST(100.0, len(string_split(text, ' ')) / 5.0) * 0.4
      + (len(list_distinct(string_split(text, ' ')))::DOUBLE
         / len(string_split(text, ' '))) * 100.0 * 0.4
      + LEAST(100.0, (length(text)::DOUBLE / len(string_split(text, ' '))) * 10.0) * 0.2,
    6) AS score
  FROM documents
  WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL
),
s AS (
  SELECT source, score, COUNT(*) AS cnt,
    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos_cnt
  FROM d GROUP BY 1, 2
),
c AS (
  SELECT source, score, cnt, pos_cnt,
    COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY score ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lower_cnt
  FROM s
),
agg AS (
  SELECT source,
    SUM(CAST(pos_cnt * (2 * (1 + lower_cnt) + cnt - 1) AS DECIMAL(38,0)))
      AS two_rpos,
    SUM(pos_cnt) AS n_pos, SUM(cnt) AS n
  FROM c GROUP BY 1
)
SELECT source, CAST(n_pos AS BIGINT) AS n_pos,
  CAST(n - n_pos AS BIGINT) AS n_neg,
  CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN
    ROUND(CAST(two_rpos - n_pos * (n_pos + 1) AS DOUBLE)
          / (2.0 * n_pos * (n - n_pos)), 6)
  END AS auc
FROM agg
"""


@query("quality_auc_by_source", oracle=_AUC_SQL)
def quality_auc_by_source(spark, sf_dir):
    """Exact AUC (Mann-Whitney U / tie-corrected rank-sum) of the certified
    quality composite as a screening classifier for the `lang='en'` label,
    per source — the eval primitive behind every quality-filter decision
    ("does this cheap score actually separate the stratum I care about?").

    Distributed shape: scores aggregate to the DISTINCT-VALUE relation
    (one shuffle on (source, score)); the rank prefix-sum runs over that
    score-cardinality relation partitioned BY SOURCE (never a corpus-sized
    or single-task window); the rank-sum itself is one map-partial agg.
    2*avg_rank = 2*rank_min + ties - 1 keeps every term integral — sums
    are exact DECIMAL(38,0) (BIGINT overflows past ~10^9 rows/source), and
    AUC is ONE double division rounded at 6, so parity is exact. Sources
    with a degenerate class (n_pos or n_neg = 0) yield NULL by explicit
    CASE (Spark x/0 -> NULL but DuckDB -> inf — the stats.py convention).
    """
    from importer_spark.operators.text import quality_score

    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    d = (
        t.documents.filter(
            F.col("text").isNotNull()
            & F.col("lang").isNotNull()
            & F.col("source").isNotNull()
        )
        .select(
            "source",
            quality_score(F.col("text")).alias("score"),
            (F.col("lang") == "en").cast("int").alias("pos"),
        )
    )
    s = d.groupBy("source", "score").agg(
        F.count("*").alias("cnt"), F.sum("pos").alias("pos_cnt")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = s.withColumn("lower_cnt", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    agg = c.groupBy("source").agg(
        F.sum(
            (
                F.col("pos_cnt")
                * (2 * (1 + F.col("lower_cnt")) + F.col("cnt") - 1)
            ).cast("decimal(38,0)")
        ).alias("two_rpos"),
        F.sum("pos_cnt").alias("n_pos"),
        F.sum("cnt").alias("n"),
    )
    n_neg = F.col("n") - F.col("n_pos")
    auc = F.when(
        (F.col("n_pos") > 0) & (n_neg > 0),
        F.round(
            (F.col("two_rpos") - F.col("n_pos") * (F.col("n_pos") + 1)).cast(
                "double"
            )
            / (2.0 * F.col("n_pos") * n_neg),
            6,
        ),
    )
    return agg.select(
        "source",
        F.col("n_pos").cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
        auc.alias("auc"),
    )
