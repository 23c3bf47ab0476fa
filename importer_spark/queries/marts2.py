"""The reference's largest published mart, re-expressed one-pass:
product × customer × trailing-period spending with rank-within-product
(reference: models/mart/mart_product_company_period_spending.sql:38-145 —
its 15,384-row flagship; DBT_CANDIDATES.md:122).

The reference aggregates the same join under several date filters and unions
(A8) and ranks companies within product (W3); here both collapse into one
fact scan: conditional aggs per trailing window, then one window function
over the (much smaller) aggregated relation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.functions import dec, out_double
from importer_spark.io import Tables
from importer_spark.queries.registry import query

_SPEND_SQL = """
WITH anchor AS (SELECT MAX(o_orderdate) AS as_of FROM orders),
fact AS (
  SELECT l.l_partkey, o.o_custkey, o.o_orderdate,
    CAST(l.l_extendedprice AS DECIMAL(18,2))
      * (100 - CAST(l.l_discount AS DECIMAL(18,2)) * 100) AS net100
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
agg AS (
  SELECT f.l_partkey AS part_key, f.o_custkey AS cust_key,
    COUNT(*) AS n_lines_all,
    CAST(SUM(CASE WHEN f.o_orderdate >= a.as_of - INTERVAL 90 DAY
             THEN f.net100 END) AS DOUBLE) / 100 AS spend_90d,
    CAST(SUM(CASE WHEN f.o_orderdate >= a.as_of - INTERVAL 365 DAY
             THEN f.net100 END) AS DOUBLE) / 100 AS spend_365d,
    CAST(SUM(f.net100) AS DOUBLE) / 100 AS spend_all
  FROM fact f CROSS JOIN anchor a
  GROUP BY 1, 2
)
SELECT part_key, cust_key, CAST(n_lines_all AS BIGINT) AS n_lines_all,
  COALESCE(spend_90d, 0) AS spend_90d,
  COALESCE(spend_365d, 0) AS spend_365d,
  spend_all,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY part_key ORDER BY spend_all DESC, cust_key) AS INTEGER)
    AS customer_rank_in_product
FROM agg
"""


@query("mart_product_period_spending", oracle=_SPEND_SQL)
def mart_product_period_spending(spark, sf_dir):
    """One fact scan → conditional trailing-window aggs per (part, customer)
    → rank within product over the aggregated relation. net = extendedprice
    × (1−discount), carried ×100 as an exact decimal until after the sum
    (see inline note). The window runs on ~|parts×customers| rows, not
    lineitems — rank cost is decoupled from fact volume."""
    t = Tables(spark, sf_dir)
    anchor = t.orders.agg(F.max("o_orderdate").alias("as_of"))
    # 100×net stays an exact decimal (discount is 2dp → 100·disc is an
    # integer); the /100 happens only AFTER the exact sum is cast to double,
    # so both engines perform the identical single IEEE division.
    net100 = dec(F.col("l_extendedprice")) * (100 - dec(F.col("l_discount")) * 100)
    # wide: orders broadcasts, so the join probe + trailing-window partial
    # aggs run in the lineitem scan stage (single split at bench scale).
    li = t.wide("lineitem")
    fact = (
        li.join(
            t.orders, li.l_orderkey == t.orders.o_orderkey
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            F.col("l_partkey").alias("part_key"),
            F.col("o_custkey").alias("cust_key"),
            "o_orderdate",
            "as_of",
            net100.alias("net100"),
        )
    )

    def spend(days: int | None):
        cond = (
            F.col("o_orderdate")
            >= F.col("as_of") - F.expr(f"INTERVAL {days} DAYS")
            if days
            else F.lit(True)
        )
        return F.sum(F.when(cond, F.col("net100"))).cast("double") / 100

    agg = fact.groupBy("part_key", "cust_key").agg(
        F.count("*").alias("n_lines_all"),
        spend(90).alias("spend_90d"),
        spend(365).alias("spend_365d"),
        spend(None).alias("spend_all"),
    )
    w = Window.partitionBy("part_key").orderBy(
        F.desc("spend_all"), F.asc("cust_key")
    )
    return agg.select(
        "part_key",
        "cust_key",
        "n_lines_all",
        F.coalesce("spend_90d", F.lit(0.0)).alias("spend_90d"),
        F.coalesce("spend_365d", F.lit(0.0)).alias("spend_365d"),
        "spend_all",
        F.row_number().over(w).cast("int").alias("customer_rank_in_product"),
    )
