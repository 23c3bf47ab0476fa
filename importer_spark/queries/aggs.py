"""Aggregation pack (SURVEY §2.5): deterministic string_agg/mode, one-pass
trailing-period stacks, multi-grain unions, rollup/grouping sets, HAVING
dup-detection, AR aging buckets, volume-weighted ratios.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.functions import dec, mode_det, out_double, ratio, string_agg_sorted
from importer_spark.io import Tables
from importer_spark.queries.core import D2, D4
from importer_spark.queries.registry import query

_STRING_AGG_SQL = """
SELECT
  n.n_name AS nation_name,
  string_agg(DISTINCT c.c_mktsegment, ' | ' ORDER BY c.c_mktsegment) AS segments,
  COUNT(DISTINCT c.c_mktsegment) AS n_segments
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@query("string_agg_sorted", oracle=_STRING_AGG_SQL)
def string_agg_sorted_q(spark, sf_dir):
    """A5 STRING_AGG(DISTINCT …) with canonical ascending order (reference:
    int_quickbooks__company_consolidation.sql:104-111 — Postgres leaves agg
    order unspecified; we define sorted semantics for reproducibility)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            string_agg_sorted("c_mktsegment", " | ").alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


_MODE_SQL = """
SELECT cust_key, priority_mode
FROM (
  SELECT o_custkey AS cust_key, o_orderpriority AS priority_mode,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY COUNT(*) DESC, o_orderpriority ASC
         ) AS rn
  FROM orders
  WHERE o_orderpriority IS NOT NULL
  GROUP BY o_custkey, o_orderpriority
)
WHERE rn = 1
"""


@query("mode_deterministic", oracle=_MODE_SQL)
def mode_deterministic(spark, sf_dir):
    """A6 MODE() WITHIN GROUP with deterministic tie-break (reference:
    int_quickbooks__company_consolidation.sql:125-133 most-common
    country/rep). Spark 3.4's mode() ties arbitrarily — the count+row_number
    idiom fixes ties on the smallest value."""
    t = Tables(spark, sf_dir)
    return mode_det(
        t.orders.withColumnRenamed("o_custkey", "cust_key"),
        ["cust_key"],
        "o_orderpriority",
        "priority_mode",
    )


_TRAILING_SQL = f"""
WITH anchor AS (SELECT MAX(o_orderdate) AS as_of FROM orders)
SELECT
  o_custkey AS cust_key,
  COUNT(CASE WHEN o_orderdate >= as_of - INTERVAL 30 DAY THEN 1 END) AS n_orders_30d,
  CAST(COALESCE(SUM(CASE WHEN o_orderdate >= as_of - INTERVAL 30 DAY
    THEN CAST(o_totalprice AS {D2}) END), 0) AS DOUBLE) AS revenue_30d,
  COUNT(CASE WHEN o_orderdate >= as_of - INTERVAL 90 DAY THEN 1 END) AS n_orders_90d,
  CAST(COALESCE(SUM(CASE WHEN o_orderdate >= as_of - INTERVAL 90 DAY
    THEN CAST(o_totalprice AS {D2}) END), 0) AS DOUBLE) AS revenue_90d,
  COUNT(CASE WHEN o_orderdate >= as_of - INTERVAL 365 DAY THEN 1 END) AS n_orders_365d,
  CAST(COALESCE(SUM(CASE WHEN o_orderdate >= as_of - INTERVAL 365 DAY
    THEN CAST(o_totalprice AS {D2}) END), 0) AS DOUBLE) AS revenue_365d,
  COUNT(*) AS n_orders_all,
  CAST(SUM(CAST(o_totalprice AS {D2})) AS DOUBLE) AS revenue_all
FROM orders CROSS JOIN anchor
GROUP BY o_custkey
"""


@query("trailing_period_metrics", oracle=_TRAILING_SQL)
def trailing_period_metrics(spark, sf_dir):
    """A8 trailing-period metric stack in ONE pass (reference:
    mart_company_period_metrics.sql:34-132 aggregates the same fact 5 times
    under different date filters and unions — at 100 TB that's 5 scans; the
    conditional-aggregation form is a single scan). The anchor ("now") is the
    data's max order date, broadcast via cross join (deterministic clock,
    SURVEY §4 custom-work item 1)."""
    t = Tables(spark, sf_dir)
    anchor = t.orders.agg(F.max("o_orderdate").alias("as_of"))
    o = t.orders.crossJoin(F.broadcast(anchor))

    def in_window(days):
        return F.col("o_orderdate") >= F.col("as_of") - F.expr(f"INTERVAL {days} DAYS")

    def n_orders(cond):
        return F.count(F.when(cond, F.lit(1)))

    def revenue(cond):
        return out_double(
            F.coalesce(
                F.sum(F.when(cond, dec(F.col("o_totalprice")))),
                F.lit(0).cast("decimal(18,2)"),
            )
        )

    return o.groupBy(F.col("o_custkey").alias("cust_key")).agg(
        n_orders(in_window(30)).alias("n_orders_30d"),
        revenue(in_window(30)).alias("revenue_30d"),
        n_orders(in_window(90)).alias("n_orders_90d"),
        revenue(in_window(90)).alias("revenue_90d"),
        n_orders(in_window(365)).alias("n_orders_365d"),
        revenue(in_window(365)).alias("revenue_365d"),
        F.count("*").alias("n_orders_all"),
        out_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue_all"),
    )


_MULTI_GRAIN_SQL = f"""
SELECT 'day' AS time_grain, strftime(o_orderdate, '%Y-%m-%d') AS period,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {D2})) AS DOUBLE) AS revenue
FROM orders GROUP BY 2
UNION ALL
SELECT 'month' AS time_grain, strftime(o_orderdate, '%Y-%m') AS period,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {D2})) AS DOUBLE) AS revenue
FROM orders GROUP BY 2
"""


@query("multi_grain_union", oracle=_MULTI_GRAIN_SQL)
def multi_grain_union(spark, sf_dir):
    """A9 multi-grain aggregation unioned with a grain tag (reference:
    mart_product_margin_analytics.sql:66-239 daily+monthly with time_period
    tag)."""
    t = Tables(spark, sf_dir)

    def grain(tag, fmt):
        return t.orders.groupBy(
            F.date_format("o_orderdate", fmt).alias("period")
        ).agg(
            F.count("*").alias("n_orders"),
            out_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
        ).select(F.lit(tag).alias("time_grain"), "period", "n_orders", "revenue")

    return grain("day", "yyyy-MM-dd").unionByName(grain("month", "yyyy-MM"))


_ROLLUP_SQL = f"""
SELECT
  CAST(year(o_orderdate) AS VARCHAR) AS order_year,
  CAST(quarter(o_orderdate) AS VARCHAR) AS order_quarter,
  GROUPING(CAST(year(o_orderdate) AS VARCHAR), CAST(quarter(o_orderdate) AS VARCHAR))
    AS grouping_level,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS {D2})) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP (1, 2)
"""


@query("rollup_revenue", oracle=_ROLLUP_SQL)
def rollup_revenue(spark, sf_dir):
    """A9-adjacent: ROLLUP grouping sets (year, quarter) with grouping_id —
    the Spark-native form of the reference's hand-unioned grain stacks
    (SURVEY §2.5 note). String-typed keys so NULL subtotal rows stay
    type-stable across engines."""
    t = Tables(spark, sf_dir)
    o = t.orders.select(
        F.year("o_orderdate").cast("string").alias("order_year"),
        F.quarter("o_orderdate").cast("string").alias("order_quarter"),
        F.col("o_totalprice"),
    )
    return o.rollup("order_year", "order_quarter").agg(
        F.grouping_id().alias("grouping_level"),
        F.count("*").alias("n_orders"),
        out_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
    ).select("order_year", "order_quarter", "grouping_level", "n_orders", "revenue")


_HAVING_SQL = """
SELECT o_custkey AS cust_key,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       COUNT(*) AS n_same_day_orders
FROM orders
GROUP BY 1, 2
HAVING COUNT(*) > 1
"""


@query("having_duplicates", oracle=_HAVING_SQL)
def having_duplicates(spark, sf_dir):
    """A11 HAVING-based duplicate detection (reference:
    pipelines/shared/data_quality.py:187-196 duplicate-PK check,
    tests/test_contact_email_deduplication.sql:8-14)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy(
            F.col("o_custkey").alias("cust_key"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .agg(F.count("*").alias("n_same_day_orders"))
        .filter(F.col("n_same_day_orders") > 1)
    )


_AR_AGING_SQL = f"""
WITH anchor AS (SELECT MAX(o_orderdate) AS as_of FROM orders),
open_orders AS (
  SELECT o.*, date_diff('day', o.o_orderdate, a.as_of) AS age_days
  FROM orders o CROSS JOIN anchor a
  WHERE o.o_orderstatus = 'O'
),
bucketed AS (
  SELECT *,
    CASE
      WHEN age_days <= 180 THEN 'current'
      WHEN age_days <= 365 THEN '181-365'
      WHEN age_days <= 730 THEN '366-730'
      ELSE '730+'
    END AS age_bucket
  FROM open_orders
)
SELECT 'bucket' AS level, age_bucket, NULL AS mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {D2})) AS DOUBLE) AS outstanding
FROM bucketed GROUP BY age_bucket
UNION ALL
SELECT 'bucket_segment' AS level, b.age_bucket, c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(b.o_totalprice AS {D2})) AS DOUBLE) AS outstanding
FROM bucketed b JOIN customer c ON b.o_custkey = c.c_custkey
GROUP BY b.age_bucket, c.c_mktsegment
"""


@query("ar_aging", oracle=_AR_AGING_SQL)
def ar_aging(spark, sf_dir):
    """A13 AR aging: CASE bucketing + per-bucket aggregation + multi-grain
    union with null padding (reference: dim_accounts_receivable_aging.sql:29-151
    — invoice/customer/bucket 3-level union)."""
    t = Tables(spark, sf_dir)
    anchor = t.orders.agg(F.max("o_orderdate").alias("as_of"))
    open_orders = (
        t.orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(anchor))
        .withColumn("age_days", F.datediff(F.col("as_of"), F.col("o_orderdate")))
    )
    bucketed = open_orders.withColumn(
        "age_bucket",
        F.when(F.col("age_days") <= 180, "current")
        .when(F.col("age_days") <= 365, "181-365")
        .when(F.col("age_days") <= 730, "366-730")
        .otherwise("730+"),
    )
    by_bucket = bucketed.groupBy("age_bucket").agg(
        F.count("*").alias("n_orders"),
        out_double(F.sum(dec(F.col("o_totalprice")))).alias("outstanding"),
    ).select(
        F.lit("bucket").alias("level"),
        "age_bucket",
        F.lit(None).cast("string").alias("mktsegment"),
        "n_orders",
        "outstanding",
    )
    by_segment = (
        bucketed.join(F.broadcast(Tables(spark, sf_dir).customer),
                      F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("age_bucket", F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("n_orders"),
            out_double(F.sum(dec(F.col("o_totalprice")))).alias("outstanding"),
        )
        .select(
            F.lit("bucket_segment").alias("level"),
            "age_bucket",
            "mktsegment",
            "n_orders",
            "outstanding",
        )
    )
    return by_bucket.unionByName(by_segment)


_WEIGHTED_RATIO_SQL = f"""
SELECT
  p.p_brand AS brand,
  COUNT(*) AS n_lines,
  CAST(SUM(CAST(l.l_extendedprice AS {D2})) AS DOUBLE) AS gross_revenue,
  ROUND(CAST(SUM(CAST(l.l_extendedprice * l.l_discount AS {D4})) AS DOUBLE)
        / NULLIF(CAST(SUM(CAST(l.l_extendedprice AS {D2})) AS DOUBLE), 0) * 100, 6)
    AS discount_rate_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


@query("weighted_discount_ratio", oracle=_WEIGHTED_RATIO_SQL)
def weighted_discount_ratio(spark, sf_dir):
    """A12 volume-weighted ratio of sums (reference:
    mart_product_margin_analytics.sql:96-116 SUM(margin)/SUM(revenue)*100 —
    a ratio of aggregates, never an average of ratios)."""
    t = Tables(spark, sf_dir)
    gross = F.sum(dec(F.col("l_extendedprice")))
    disc_amt = F.sum(dec(F.col("l_extendedprice") * F.col("l_discount"), 4))
    return (
        t.lineitem.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_lines"),
            out_double(gross).alias("gross_revenue"),
            F.round(
                disc_amt.cast("double") / F.nullif(gross.cast("double"), F.lit(0)) * 100, 6
            ).alias("discount_rate_pct"),
        )
    )
