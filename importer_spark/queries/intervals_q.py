"""Interval (range) join queries — points joined into arbitrary
overlapping [start, end) windows via the bin-bucketed rewrite in
operators/intervals.py (reference J9 generalized: fct_trade_show_leads
.sql:106-169 joins signups into per-show date windows; here the windows
are a promo calendar that the point side can match many-to-many).

The promo calendar is generated deterministically in BOTH engines from the
same arithmetic (id -> start/end in epoch days), so the oracle needs no
side-channel fixture.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from importer_spark.functions import dec, out_double
from importer_spark.io import Tables
from importer_spark.operators.intervals import interval_join
from importer_spark.queries.registry import query

# Promo i runs [BASE + 20*i, BASE + 20*i + 15*(i%3+1)) epoch days: every 20
# days a promo of length 15/30/45 days opens, so the longer ones overlap the
# next ones — a point can belong to up to 3 promos.
N_PROMOS = 120
PROMO_STRIDE = 20
BASE_DAY = (dt.date(1992, 1, 1) - dt.date(1970, 1, 1)).days
BIN_DAYS = 32  # near the max interval length → ≤ 2-3 bins per interval

_PROMO_SQL = f"""
WITH promos AS (
  SELECT i AS promo_id,
         {BASE_DAY} + {PROMO_STRIDE} * i AS start_day,
         {BASE_DAY} + {PROMO_STRIDE} * i + 15 * ((i % 3) + 1) AS end_day
  FROM generate_series(0, {N_PROMOS - 1}) AS t(i)
),
pts AS (
  SELECT date_diff('day', DATE '1970-01-01', l_shipdate) AS ship_day,
         l_extendedprice, l_discount
  FROM lineitem
)
SELECT p.promo_id,
  p.end_day - p.start_day AS promo_len_days,
  COUNT(*) AS n_lines,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
    AS promo_revenue
FROM promos p
JOIN pts ON ship_day >= p.start_day AND ship_day < p.end_day
GROUP BY p.promo_id, promo_len_days
"""


@query("promo_period_revenue", oracle=_PROMO_SQL)
def promo_period_revenue(spark, sf_dir):
    """Revenue attributed to overlapping promo windows. The naive plan is a
    theta join (nested loop: every lineitem × every promo); the bucketed
    rewrite shuffles lineitems ONCE on a 32-day bin id and explodes each
    promo into its 2-3 covering bins, so at 100 TB the cost is one
    equi-shuffle of the fact side — the promo calendar never multiplies it.
    (Here Spark broadcasts the tiny exploded promo side; same plan shape.)"""
    t = Tables(spark, sf_dir)
    promos = spark.range(N_PROMOS).select(
        F.col("id").alias("promo_id"),
        (F.lit(BASE_DAY) + F.lit(PROMO_STRIDE) * F.col("id")).alias("start_day"),
        (
            F.lit(BASE_DAY)
            + F.lit(PROMO_STRIDE) * F.col("id")
            + F.lit(15) * (F.col("id") % 3 + 1)
        ).alias("end_day"),
    )
    pts = t.lineitem.select(
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("ship_day"),
        "l_extendedprice",
        "l_discount",
    )
    matched = interval_join(
        pts, promos, point_col="ship_day", start_col="start_day", end_col="end_day",
        bin_width=BIN_DAYS,
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return matched.groupBy(
        "promo_id", (F.col("end_day") - F.col("start_day")).alias("promo_len_days")
    ).agg(
        F.count("*").alias("n_lines"),
        out_double(F.sum(dec(disc_price, 4))).alias("promo_revenue"),
    )


_BLOOM_PROMO_SQL = f"""
WITH promos AS (
  SELECT i AS promo_id,
         {BASE_DAY} + {PROMO_STRIDE} * i AS start_day,
         {BASE_DAY} + {PROMO_STRIDE} * i + 15 * ((i % 3) + 1) AS end_day
  FROM generate_series(0, {N_PROMOS - 1}) AS t(i)
),
pts AS (
  SELECT date_diff('day', DATE '1970-01-01', o.o_orderdate) AS order_day,
         o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
)
SELECT p.promo_id,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS promo_revenue
FROM promos p
JOIN pts ON order_day >= p.start_day AND order_day < p.end_day
GROUP BY p.promo_id
"""


@query("bloom_promo_attribution", oracle=_BLOOM_PROMO_SQL)
def bloom_promo_attribution(spark, sf_dir):
    """Composed mart: Bloom-pruned selective join feeding an interval join —
    the two scale operators proving they stack. High-balance BUILDING
    customers build a distributed Bloom filter (operators/bloom.py) that
    drops non-matching orders inside the fact scan's WholeStageCodegen
    BEFORE any exchange; the surviving ~2% of orders then attribute into
    the overlapping promo calendar through the bin-bucketed interval join
    (operators/intervals.py) — one equi-shuffle of the already-pruned fact
    side, promos broadcast after their bin explode. At 100 TB the scan→
    bloom→bin pipeline is the whole fact-side cost; nothing full-size ever
    shuffles. Oracle is the plain join + range join."""
    from importer_spark.operators.bloom import bloom_semi_join

    t = Tables(spark, sf_dir)
    dim = t.customer.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    ).select("c_custkey")
    facts = bloom_semi_join(
        t.orders.select("o_custkey", "o_orderdate", "o_totalprice"),
        dim,
        fact_key="o_custkey",
        build_key="c_custkey",
        n_bits=1 << 14,
    )
    pts = facts.select(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("order_day"),
        "o_totalprice",
    )
    promos = spark.range(N_PROMOS).select(
        F.col("id").alias("promo_id"),
        (F.lit(BASE_DAY) + F.lit(PROMO_STRIDE) * F.col("id")).alias("start_day"),
        (
            F.lit(BASE_DAY)
            + F.lit(PROMO_STRIDE) * F.col("id")
            + F.lit(15) * (F.col("id") % 3 + 1)
        ).alias("end_day"),
    )
    matched = interval_join(
        pts, promos, point_col="order_day", start_col="start_day",
        end_col="end_day", bin_width=BIN_DAYS,
    )
    return matched.groupBy("promo_id").agg(
        F.count("*").alias("n_orders"),
        out_double(F.sum(dec(F.col("o_totalprice")))).alias("promo_revenue"),
    )
