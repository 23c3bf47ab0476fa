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
