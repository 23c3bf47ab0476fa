"""The SQL entry path: temp views + `spark.sql` with join hints, and a
Python UDTF consumed via LATERAL — the §2.10 table-function surface.

Every other catalog query uses the DataFrame API; these prove the same
engine serves ANSI SQL texts unchanged (the reference is 68 dbt SQL models —
a user porting them verbatim lands on this path).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from importer_spark.io import Tables
from importer_spark.queries.registry import query

_NATION_REVENUE_SQL = """
SELECT n.n_name AS nation,
  CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


@query("sql_nation_revenue", oracle=_NATION_REVENUE_SQL)
def sql_nation_revenue(spark, sf_dir):
    """Pure-SQL execution path: register views, run the oracle's own ANSI
    text (plus a BROADCAST hint on the dims — the SQL-surface form of the
    broadcast() the DataFrame queries use). One fact shuffle; both dims
    broadcast."""
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("v_orders")
    t.customer.createOrReplaceTempView("v_customer")
    t.nation.createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n), BROADCAST(c) */
          n.n_name AS nation,
          CAST(year(o.o_orderdate) AS INT) AS order_year,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM v_orders o
        JOIN v_customer c ON o.o_custkey = c.c_custkey
        JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
        """
    )


@udtf(returnType="opt_key string, opt_value string")
class ParseOptions:
    """Table function: 'k=v;k=v' option string → one row per pair.
    UDTFs are the Spark shape for one-to-many parsers that genuinely need
    Python (here the parse is trivial — the point is the surface: eval()
    yields rows, LATERAL correlates them to the driving row)."""

    def eval(self, s: str):
        for part in (s or "").split(";"):
            if "=" in part:
                k, v = part.split("=", 1)
                yield (k, v)


_KV_SQL = """
WITH blob AS (
  SELECT o_orderkey,
    'status=' || o_orderstatus || ';priority=' || o_orderpriority AS opts
  FROM orders
),
pairs AS (
  SELECT o_orderkey, unnest(string_split(opts, ';')) AS kv FROM blob
)
SELECT o_orderkey,
  split_part(kv, '=', 1) AS opt_key,
  split_part(kv, '=', 2) AS opt_value
FROM pairs
"""


@query("order_options_kv", oracle=_KV_SQL)
def order_options_kv(spark, sf_dir):
    """Python UDTF via LATERAL: each order's option blob explodes into
    typed key/value rows. UDTFs run Arrow-batched in the Python worker —
    fine for parse-heavy edges, but the oracle shows the same result is
    expressible with split/unnest when the grammar is this regular (and
    the column-expression form is the 100 TB default)."""
    t = Tables(spark, sf_dir)
    spark.udtf.register("parse_options", ParseOptions)
    t.orders.selectExpr(
        "o_orderkey",
        "concat('status=', o_orderstatus, ';priority=', o_orderpriority) AS opts",
    ).createOrReplaceTempView("v_order_opts")
    return spark.sql(
        """
        SELECT b.o_orderkey, p.opt_key, p.opt_value
        FROM v_order_opts b, LATERAL parse_options(b.opts) p
        """
    )


# --- classic TPC-H-shaped analytics, ONE SQL text for both engines ---------
# The strongest portability statement the catalog makes: these strings run
# UNCHANGED on Spark (temp views over the parquet tables) and on the DuckDB
# oracle (driver-registered views of the same names). Decimal/date
# conventions follow functions/core.py (exact-decimal sums cast to DOUBLE,
# dates emitted as yyyy-MM-dd string slices).

_TPCH_VIEWS = ("customer", "orders", "lineitem", "nation")


def _register_tpch_views(t):
    for name in _TPCH_VIEWS:
        getattr(t, name).createOrReplaceTempView(name)


_Q3_TEXT = """
SELECT l_orderkey AS order_key,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
    AS revenue,
  SUBSTR(CAST(o_orderdate AS STRING), 1, 10) AS order_date,
  o_orderpriority AS order_priority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, SUBSTR(CAST(o_orderdate AS STRING), 1, 10), o_orderpriority
"""


@query("tpch_q3_shipping_priority", oracle=_Q3_TEXT)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (unshipped-order revenue by order): the oracle string
    itself executes on Spark — zero translation. Catalyst broadcasts
    customer/nation-sized dims and pushes both date predicates into the
    scans (plan-audited family: test_plans.py)."""
    t = Tables(spark, sf_dir)
    _register_tpch_views(t)
    return spark.sql(_Q3_TEXT)


_Q10_TEXT = """
SELECT c_custkey AS cust_key,
  c_name AS cust_name,
  n_name AS nation,
  COUNT(*) AS n_return_lines,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
    AS lost_revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1993-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
"""


@query("tpch_q10_returned_items", oracle=_Q10_TEXT)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (revenue lost to returns per customer), same
    one-text-two-engines contract as Q3."""
    t = Tables(spark, sf_dir)
    _register_tpch_views(t)
    return spark.sql(_Q10_TEXT)
