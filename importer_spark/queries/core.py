"""Core scan/filter/project/agg/join queries (SURVEY §2.1-2.5 backbone).

Each query mirrors a reference pattern, re-expressed on the driver's TPC-H-ish
testdata. Citations point at the reference shape being reproduced.

Oracle-parity conventions (see importer_spark.functions.core docstring):
exact-decimal per-row casts (scale = 2·#factors), double outputs, string dates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.functions import bucket, dec, out_double, ratio
from importer_spark.io import Tables
from importer_spark.queries.registry import query

# Deterministic cutoff inside the data's date range (orders span 1995..2001-08).
CUTOFF = "2000-12-01"

# SQL fragments for the exact-decimal convention (DuckDB side).
D2 = "DECIMAL(18,2)"
D4 = "DECIMAL(18,4)"
D6 = "DECIMAL(18,6)"

_PRICING_SUMMARY_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS {D2})) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS {D2})) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {D4})) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS {D6})) AS DOUBLE)
    AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS {D2})) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS {D2})) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS {D2})) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("pricing_summary", oracle=_PRICING_SUMMARY_SQL)
def pricing_summary(spark, sf_dir):
    """Grouped aggregation with conditional per-row math (reference A1/A12:
    int_quickbooks__customer_revenue.sql:10-23). Single scan, map-side partial
    agg, 2-key hash agg — Catalyst pushes the shipdate filter to parquet."""
    t = Tables(spark, sf_dir)
    # wide: the exact-decimal partial agg is the whole query and runs in the
    # scan stage (single split at bench scale) — see tpch_q1's twin note.
    li = t.wide("lineitem").filter(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        out_double(F.sum(dec(F.col("l_quantity")))).alias("sum_qty"),
        out_double(F.sum(dec(F.col("l_extendedprice")))).alias("sum_base_price"),
        out_double(F.sum(dec(disc_price, 4))).alias("sum_disc_price"),
        out_double(F.sum(dec(charge, 6))).alias("sum_charge"),
        ratio(F.sum(dec(F.col("l_quantity"))), F.count("*")).alias("avg_qty"),
        ratio(F.sum(dec(F.col("l_extendedprice"))), F.count("*")).alias("avg_price"),
        ratio(F.sum(dec(F.col("l_discount"))), F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


_ORDERS_FACT_SQL = f"""
WITH line_agg AS (
  SELECT
    l_orderkey,
    COUNT(*) AS n_lines,
    CAST(SUM(CAST(l_quantity AS {D2})) AS DOUBLE) AS total_qty,
    CAST(SUM(CAST(l_extendedprice AS {D2})) AS DOUBLE) AS gross_amount,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {D4})) AS DOUBLE) AS net_amount,
    BOOL_OR(l_returnflag = 'R') AS any_return
  FROM lineitem
  GROUP BY l_orderkey
)
SELECT
  o.o_orderkey AS order_key,
  o.o_custkey AS cust_key,
  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
  o.o_orderstatus AS order_status,
  CASE
    WHEN o.o_orderpriority LIKE '1-%' THEN 'Express'
    WHEN o.o_orderpriority LIKE '2-%' THEN 'Priority'
    WHEN o.o_orderstatus = 'F' THEN 'Fulfilled-Std'
    ELSE 'Standard'
  END AS sales_channel,
  CASE
    -- NULL qty → NULL size (bucket() contract: missing data must not
    -- fall through the comparisons into the top label)
    WHEN la.total_qty IS NULL THEN NULL
    WHEN la.total_qty < 50 THEN 'small'
    WHEN la.total_qty < 150 THEN 'medium'
    ELSE 'large'
  END AS order_size,
  la.n_lines,
  la.total_qty,
  la.gross_amount,
  la.net_amount,
  la.any_return
FROM orders o
JOIN line_agg la ON la.l_orderkey = o.o_orderkey
"""


@query("orders_fact", oracle=_ORDERS_FACT_SQL)
def orders_fact(spark, sf_dir):
    """Flagship: order-level collapse + header enrichment + rule-engine CASEs
    (reference A3+F24: int_quickbooks__orders.sql:14-172 — line items grouped
    to orders, channel/segment rules with strict precedence, BOOL_OR flags
    :67-70). Both sides shuffle on orderkey once; the join inherits the agg's
    partitioning under AQE."""
    t = Tables(spark, sf_dir)
    line_agg = t.lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        out_double(F.sum(dec(F.col("l_quantity")))).alias("total_qty"),
        out_double(F.sum(dec(F.col("l_extendedprice")))).alias("gross_amount"),
        out_double(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
        ).alias("net_amount"),
        F.bool_or(F.col("l_returnflag") == "R").alias("any_return"),
    )
    o = t.orders
    channel = (
        F.when(F.col("o_orderpriority").like("1-%"), "Express")
        .when(F.col("o_orderpriority").like("2-%"), "Priority")
        .when(F.col("o_orderstatus") == "F", "Fulfilled-Std")
        .otherwise("Standard")
    )
    size = bucket(F.col("total_qty"), [50.0, 150.0], ["small", "medium", "large"])
    return (
        o.join(line_agg, o.o_orderkey == line_agg.l_orderkey, "inner")
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_custkey").alias("cust_key"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_orderstatus").alias("order_status"),
            channel.alias("sales_channel"),
            size.alias("order_size"),
            "n_lines",
            "total_qty",
            "gross_amount",
            "net_amount",
            "any_return",
        )
    )


_TOP_CUSTOMERS_SQL = f"""
SELECT
  c.c_custkey AS cust_key,
  c.c_name AS cust_name,
  c.c_mktsegment AS mktsegment,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS {D2})) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
ORDER BY revenue DESC, cust_key ASC
LIMIT 20
"""


@query("top_customers", oracle=_TOP_CUSTOMERS_SQL)
def top_customers(spark, sf_dir):
    """Top-N reporting (reference O2: domain_consolidation.py:252-271).
    Customer dim broadcasts; the limit is a TakeOrderedAndProject (no global
    sort materialization). Tie-break on cust_key for determinism."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            out_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
        )
        .select(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("c_mktsegment").alias("mktsegment"),
            "n_orders",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("cust_key").asc())
        .limit(20)
    )


_REGION_REVENUE_SQL = f"""
SELECT
  r.r_name AS region_name,
  n.n_name AS nation_name,
  COUNT(DISTINCT o.o_orderkey) AS n_orders,
  COUNT(DISTINCT c.c_custkey) AS n_customers,
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {D4})) AS DOUBLE) AS net_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


@query("region_revenue", oracle=_REGION_REVENUE_SQL)
def region_revenue(spark, sf_dir):
    """Star-schema multi-join rollup with multiple COUNT(DISTINCT) (reference
    J1/J2/A2: fct_company_orders.sql:43-44, mart_product_unit_sales.sql:58).
    nation/region/customer broadcast — only the fact table shuffles (once,
    for the final agg)."""
    t = Tables(spark, sf_dir)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # wide: orders and the dims broadcast, so the join probes + the
    # countDistinct partial agg all run in the lineitem scan stage.
    return (
        t.wide("lineitem").join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
            out_double(F.sum(dec(net, 4))).alias("net_revenue"),
        )
    )
