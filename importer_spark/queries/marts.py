"""Mart queries built by running the model DAG (plans/) — staging →
intermediate → mart composition, oracle-checked end-to-end through all
layers (the dbt ref-chain of SURVEY §3.2 as one lazy Spark plan).
"""

from __future__ import annotations

import importer_spark.plans.models  # noqa: F401  (registers the models)
from importer_spark.plans.dag import GRAPH
from importer_spark.queries.core import D2, D4
from importer_spark.queries.registry import query

_COMMON_CTES = f"""
WITH stg_customers AS (
  SELECT c_custkey AS cust_key,
         coalesce(nullif(trim(c_name), ''), 'UNKNOWN') AS cust_name,
         c_mktsegment AS mktsegment,
         CASE WHEN c_acctbal IS NULL THEN NULL
              WHEN c_acctbal < 0 THEN 'delinquent'
              WHEN c_acctbal < 1000 THEN 'bronze'
              WHEN c_acctbal < 5000 THEN 'silver'
              ELSE 'gold' END AS balance_tier
  FROM customer
),
stg_orders AS (
  SELECT o_orderkey AS order_key, o_custkey AS cust_key,
         strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         CAST(o_totalprice AS {D2}) AS total_price,
         CASE WHEN o_orderpriority LIKE '1-%' THEN 'Express'
              WHEN o_orderpriority LIKE '2-%' THEN 'Priority'
              ELSE 'Standard' END AS sales_channel
  FROM orders
),
int_order_lines AS (
  SELECT l_orderkey AS order_key, COUNT(*) AS n_lines,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS {D4})) AS net_amount,
         BOOL_OR(l_returnflag = 'R') AS any_return
  FROM lineitem GROUP BY 1
),
int_customer_orders AS (
  SELECT o.cust_key,
         COUNT(*) AS n_orders,
         CAST(SUM(o.total_price) AS DOUBLE) AS revenue,
         CAST(COALESCE(SUM(l.net_amount), 0) AS DOUBLE) AS net_line_revenue,
         MAX(o.order_date) AS last_order_date,
         COUNT(CASE WHEN o.sales_channel = 'Express' THEN 1 END) AS n_express,
         BOOL_OR(l.any_return) AS ever_returned
  FROM stg_orders o LEFT JOIN int_order_lines l USING (order_key)
  GROUP BY o.cust_key
)
"""

_HEALTH_SQL = (
    _COMMON_CTES
    + """
SELECT c.cust_key, c.cust_name, c.mktsegment, c.balance_tier,
  COALESCE(m.n_orders, 0) AS n_orders,
  COALESCE(m.revenue, 0.0) AS revenue,
  m.last_order_date,
  COALESCE(m.ever_returned, FALSE) AS ever_returned,
  ROUND(PERCENT_RANK() OVER (
    ORDER BY COALESCE(m.revenue, 0.0) ASC, c.cust_key ASC), 6) AS revenue_percentile,
  ROUND(
    LEAST(100.0, COALESCE(m.n_orders, 0) * 5.0) * 0.4
    + ROUND(PERCENT_RANK() OVER (
        ORDER BY COALESCE(m.revenue, 0.0) ASC, c.cust_key ASC), 6) * 100.0 * 0.6,
  6) AS health_score
FROM stg_customers c LEFT JOIN int_customer_orders m USING (cust_key)
"""
)


@query("mart_customer_health", oracle=_HEALTH_SQL)
def mart_customer_health(spark, sf_dir):
    """Composed DAG mart: staging → shared intermediate → percentile +
    weighted health score (dim_company_health analog). The oracle re-derives
    every layer in SQL — end-to-end chain parity, not per-model parity."""
    return GRAPH.run(spark, sf_dir, targets=["mart_customer_health"])[
        "mart_customer_health"
    ]


_SEGMENT_SQL = (
    _COMMON_CTES
    + f"""
SELECT c.mktsegment,
  COUNT(*) AS n_customers,
  CAST(SUM(m.n_orders) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(m.revenue AS {D2})) AS DOUBLE) AS revenue,
  ROUND(CAST(SUM(m.n_express) AS DOUBLE)
        / NULLIF(CAST(SUM(m.n_orders) AS DOUBLE), 0), 6) AS express_share,
  COUNT(CASE WHEN m.ever_returned THEN 1 END) AS n_with_returns
FROM stg_customers c JOIN int_customer_orders m USING (cust_key)
GROUP BY c.mktsegment
"""
)


@query("mart_segment_summary", oracle=_SEGMENT_SQL)
def mart_segment_summary(spark, sf_dir):
    """Second mart over the same cached intermediate (fan-out node) —
    exercises the DAG's shared-materialization path."""
    return GRAPH.run(spark, sf_dir, targets=["mart_segment_summary"])[
        "mart_segment_summary"
    ]
