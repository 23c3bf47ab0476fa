"""Remaining SURVEY §2 coverage: UNION-distinct (U2), price-grid bucketing
(F20), average order cadence (F17)."""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.io import Tables
from importer_spark.queries.registry import query

_UNION_DISTINCT_SQL = """
SELECT value, COUNT(*) AS n_sources FROM (
  SELECT DISTINCT c_mktsegment AS value FROM customer
  UNION
  SELECT DISTINCT o_orderpriority AS value FROM orders
) GROUP BY value
"""


@query("union_distinct_values", oracle=_UNION_DISTINCT_SQL)
def union_distinct_values(spark, sf_dir):
    """U2 UNION (distinct) of two extracts (reference:
    domain_consolidation.py:306-328 main ∪ cc domain lists)."""
    t = Tables(spark, sf_dir)
    segs = t.customer.select(F.col("c_mktsegment").alias("value")).distinct()
    prios = t.orders.select(F.col("o_orderpriority").alias("value")).distinct()
    return segs.union(prios).distinct().groupBy("value").agg(
        F.count("*").alias("n_sources")
    )


_PRICE_GRID_SQL = """
SELECT p_brand AS brand,
       ROUND(p_retailprice / 5.0) * 5 AS price_grid,
       COUNT(*) AS n_parts,
       COUNT(DISTINCT p_type) AS n_types
FROM part
GROUP BY 1, 2
"""


@query("price_grid_clustering", oracle=_PRICE_GRID_SQL)
def price_grid_clustering(spark, sf_dir):
    """F20 $5-grid price clustering (reference:
    fct_product_pricing_history.sql:114-133 ROUND(price/5)*5)."""
    t = Tables(spark, sf_dir)
    return t.part.groupBy(
        F.col("p_brand").alias("brand"),
        (F.round(F.col("p_retailprice") / 5.0, 0) * 5).alias("price_grid"),
    ).agg(
        F.count("*").alias("n_parts"),
        F.countDistinct("p_type").alias("n_types"),
    )


_CADENCE_SQL = """
SELECT o_custkey AS cust_key,
  COUNT(*) AS n_orders,
  strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order,
  strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order,
  ROUND(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))::DOUBLE
        / NULLIF(COUNT(*) - 1, 0), 6) AS avg_interval_days
FROM orders
GROUP BY 1
"""


@query("order_cadence", oracle=_CADENCE_SQL)
def order_cadence(spark, sf_dir):
    """F17 average order interval (last-first)/NULLIF(n-1,0) (reference:
    dim_company_health.sql:62-66)."""
    t = Tables(spark, sf_dir)
    return t.orders.groupBy(F.col("o_custkey").alias("cust_key")).agg(
        F.count("*").alias("n_orders"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
        F.round(
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).cast("double")
            / F.nullif(F.count("*") - 1, F.lit(0)),
            6,
        ).alias("avg_interval_days"),
    )


_SETOPS_SQL = """
WITH a AS (SELECT o_custkey AS cust_key FROM orders
           WHERE EXTRACT(year FROM o_orderdate) = 1995),
b AS (SELECT o_custkey AS cust_key FROM orders
      WHERE EXTRACT(year FROM o_orderdate) = 1996)
SELECT 'retained' AS cohort, cust_key
FROM (SELECT cust_key FROM a INTERSECT SELECT cust_key FROM b)
UNION ALL
SELECT 'churned' AS cohort, cust_key
FROM (SELECT cust_key FROM a EXCEPT SELECT cust_key FROM b)
UNION ALL
SELECT 'new' AS cohort, cust_key
FROM (SELECT cust_key FROM b EXCEPT SELECT cust_key FROM a)
"""


@query("customer_retention_setops", oracle=_SETOPS_SQL)
def customer_retention_setops(spark, sf_dir):
    """Relational set operations (U-family completion): year-over-year
    customer cohorts via INTERSECT (retained), EXCEPT (churned), and the
    reversed EXCEPT (new). Spark's intersect/subtract compile to left-semi /
    left-anti hash joins over distinct inputs — same one-shuffle shape as
    any equi-join, so the cohort split scales like the joins it's made of."""
    t = Tables(spark, sf_dir)

    def year_keys(y):
        return (
            t.orders.filter(F.year("o_orderdate") == y)
            .select(F.col("o_custkey").alias("cust_key"))
        )

    a, b = year_keys(1995), year_keys(1996)
    lab = lambda df, name: df.select(F.lit(name).alias("cohort"), "cust_key")  # noqa: E731
    return (
        lab(a.intersect(b), "retained")
        .unionByName(lab(a.subtract(b), "churned"))
        .unionByName(lab(b.subtract(a), "new"))
    )


_METRIC_SQL = """
SELECT c_mktsegment AS segment,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent_orders,
  CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS DOUBLE)
    / NULLIF(CAST(COUNT(*) AS DOUBLE), 0) AS urgent_share
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@query("metric_layer_summary", oracle=_METRIC_SQL)
def metric_layer_summary(spark, sf_dir):
    """Semantic metric layer (importer_spark/metrics.py): five metrics —
    plain, distinct, exact-decimal sum, condition-gated count, and a ratio —
    declared once and compiled into ONE single-scan aggregation (the
    conditional-agg shape, never one scan per metric). The reference's
    marts restate these measures per model; here any (metrics × dims)
    request shares the definitions and the plan."""
    from importer_spark.metrics import Metric, compile_metrics

    t = Tables(spark, sf_dir)
    fact = t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
    out = compile_metrics(
        fact,
        metrics=[
            Metric("n_orders", "count"),
            Metric("n_customers", "count_distinct", "o_custkey"),
            Metric("revenue", "sum", "CAST(o_totalprice AS DECIMAL(18,2))"),
            Metric("urgent_orders", "count", where="o_orderpriority = '1-URGENT'"),
            Metric("urgent_share", "ratio", num="urgent_orders", den="n_orders"),
        ],
        dimensions=["c_mktsegment"],
    )
    return out.select(
        F.col("c_mktsegment").alias("segment"),
        "n_orders",
        "n_customers",
        F.col("revenue").cast("double").alias("revenue"),
        "urgent_orders",
        "urgent_share",
    )
