"""Join pack (SURVEY §2.4): full-outer reconciliation, multi-alias dims,
cross-join scalars, explode-with-ordinality, as-of and range-attribution
rewrites of the reference's correlated subqueries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.functions import dec, out_double, ratio
from importer_spark.io import Tables
from importer_spark.operators import asof_join, range_attribution
from importer_spark.queries.core import CUTOFF, D2, D4
from importer_spark.queries.registry import query

_RECONCILE_SQL = f"""
WITH li AS (
  SELECT l_orderkey,
         COUNT(*) AS n_lines,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {D4})) AS DOUBLE) AS lineitem_net
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{CUTOFF} 00:00:00'
  GROUP BY 1
), o AS (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_orderdate <= TIMESTAMP '{CUTOFF} 00:00:00'
)
SELECT
  COALESCE(o.o_orderkey, li.l_orderkey) AS order_key,
  CASE
    WHEN o.o_orderkey IS NOT NULL AND li.l_orderkey IS NOT NULL THEN 'MATCHED'
    WHEN o.o_orderkey IS NULL THEN 'LINEITEM_ONLY'
    ELSE 'ORDER_ONLY'
  END AS match_status,
  o.o_totalprice AS header_total,
  li.lineitem_net,
  li.n_lines,
  CASE
    WHEN o.o_orderkey IS NOT NULL AND li.l_orderkey IS NOT NULL
    THEN ABS(o.o_totalprice - li.lineitem_net) < 1.0
  END AS amounts_match
FROM o
FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey
"""


@query("order_reconciliation", oracle=_RECONCILE_SQL)
def order_reconciliation(spark, sf_dir):
    """J3 full-outer reconciliation with coalesced spine + match status
    (reference: int_unified__order_matching.sql:24-56 Shopify↔QB matching,
    MATCHED/SHOPIFY_ONLY/QB_ONLY + amounts_match tolerance)."""
    t = Tables(spark, sf_dir)
    li = (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            out_double(
                F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
            ).alias("lineitem_net"),
        )
    )
    o = t.orders.filter(F.col("o_orderdate") <= F.lit(CUTOFF).cast("timestamp")).select(
        "o_orderkey", "o_totalprice"
    )
    both = F.col("o_orderkey").isNotNull() & F.col("l_orderkey").isNotNull()
    return o.join(li, o.o_orderkey == li.l_orderkey, "full_outer").select(
        F.coalesce("o_orderkey", "l_orderkey").alias("order_key"),
        F.when(both, "MATCHED")
        .when(F.col("o_orderkey").isNull(), "LINEITEM_ONLY")
        .otherwise("ORDER_ONLY")
        .alias("match_status"),
        F.col("o_totalprice").alias("header_total"),
        "lineitem_net",
        "n_lines",
        F.when(both, F.abs(F.col("o_totalprice") - F.col("lineitem_net")) < 1.0).alias(
            "amounts_match"
        ),
    )


_MULTI_ALIAS_SQL = f"""
SELECT
  cn.n_name AS cust_nation,
  sn.n_name AS supp_nation,
  COUNT(*) AS n_lines,
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {D4})) AS DOUBLE) AS net_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
GROUP BY cn.n_name, sn.n_name
"""


@query("multi_alias_join", oracle=_MULTI_ALIAS_SQL)
def multi_alias_join(spark, sf_dir):
    """J4 same dimension joined twice under different aliases (reference:
    int_quickbooks__customer_company_mapping.sql:74-78 domain_mapping as
    dm_main/dm_cc). Both nation copies broadcast."""
    t = Tables(spark, sf_dir)
    cn = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count("*").alias("n_lines"),
            out_double(F.sum(dec(net, 4))).alias("net_revenue"),
        )
    )


_CROSS_JOIN_SQL = f"""
WITH seg AS (
  SELECT c.c_mktsegment AS mktsegment,
         CAST(SUM(CAST(o.o_totalprice AS {D2})) AS DOUBLE) AS segment_revenue
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
), total AS (
  SELECT CAST(SUM(CAST(o_totalprice AS {D2})) AS DOUBLE) AS total_revenue FROM orders
)
SELECT seg.mktsegment, seg.segment_revenue, total.total_revenue,
       ROUND(seg.segment_revenue / NULLIF(total.total_revenue, 0), 6) AS revenue_share
FROM seg CROSS JOIN total
"""


@query("cross_join_scalar", oracle=_CROSS_JOIN_SQL)
def cross_join_scalar(spark, sf_dir):
    """J6/A14 scalar broadcast via CROSS JOIN (reference: fct_dso_metrics.sql:70
    AR total × period rows). The 1-row aggregate broadcasts."""
    t = Tables(spark, sf_dir)
    seg = (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(out_double(F.sum(dec(F.col("o_totalprice")))).alias("segment_revenue"))
    )
    total = t.orders.agg(
        out_double(F.sum(dec(F.col("o_totalprice")))).alias("total_revenue")
    )
    return seg.crossJoin(F.broadcast(total)).select(
        "mktsegment",
        "segment_revenue",
        "total_revenue",
        ratio(F.col("segment_revenue"), F.col("total_revenue")).alias("revenue_share"),
    )


_EXPLODE_SQL = """
SELECT doc_id, pos, token
FROM (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS token,
         UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
)
WHERE pos <= 20
"""


@query("explode_ordinality", oracle=_EXPLODE_SQL)
def explode_ordinality(spark, sf_dir):
    """F3/J7 UNNEST WITH ORDINALITY → posexplode (reference:
    stg_quickbooks__customer_contacts.sql:20-36 semicolon email split with
    position). Narrow generator — no shuffle at all."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.select(
            "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "token")
        )
        .withColumn("pos", F.col("pos0") + 1)
        .filter(F.col("pos") <= 20)
        .select("doc_id", "pos", "token")
    )


_ASOF_SQL = """
SELECT p.event_id AS purchase_event_id,
       p.user_id,
       p.ts AS purchase_ts,
       p.value AS purchase_value,
       v.ts AS ts_asof
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


_ASOF_FWD_SQL = """
WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
nxt AS (
  SELECT v.event_id, v.user_id, v.ts,
         (SELECT MIN(p.ts) FROM p
          WHERE p.user_id = v.user_id AND p.ts >= v.ts) AS m_ts
  FROM v
),
tol AS (
  SELECT event_id, user_id, ts,
         CASE WHEN m_ts <= ts + INTERVAL 1 HOUR THEN m_ts END AS m_ts
  FROM nxt
)
SELECT t.event_id AS view_event_id, t.user_id, t.ts AS view_ts,
       (SELECT MAX(p.value) FROM p
        WHERE p.user_id = t.user_id AND p.ts = t.m_ts) AS next_purchase_value,
       date_diff('second', t.ts, t.m_ts) AS seconds_to_purchase
FROM tol t
"""


@query("asof_next_purchase", oracle=_ASOF_FWD_SQL)
def asof_next_purchase(spark, sf_dir):
    """Forward as-of with tolerance (pandas merge_asof parity, the other
    half of J8): each view gets the user's NEXT purchase, but only if it
    lands within 1 hour — later matches null out. Same single-shuffle
    union-and-fill plan as the backward form, traversed descending; the
    tolerance mask is a post-fill column expression, so bounding the match
    window costs nothing at 100 TB. Ties (several purchases at the matched
    instant) resolve to the max value on both engines."""
    t = Tables(spark, sf_dir)
    views = t.events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), "value"
    )
    res = asof_join(
        views,
        purchases,
        on=["user_id"],
        left_ts="view_ts",
        right_ts="p_ts",
        right_value_cols=["value", "p_ts"],
        direction="forward",
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    return res.select(
        "view_event_id",
        "user_id",
        "view_ts",
        F.col("value_asof").alias("next_purchase_value"),
        (
            F.unix_timestamp("p_ts_asof") - F.unix_timestamp("view_ts")
        ).alias("seconds_to_purchase"),
    )


@query("asof_last_view", oracle=_ASOF_SQL)
def asof_last_view(spark, sf_dir):
    """J8 as-of join: each purchase gets the user's most recent prior view
    (reference: fct_product_pricing_history.sql:305-314 latest authoritative
    price at order date, a correlated MAX subquery there). Implemented with
    the single-shuffle union-and-fill operator."""
    t = Tables(spark, sf_dir)
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    views = t.events.filter(F.col("event_type") == "view").select("user_id", "ts")
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="ts",
        right_value_cols=["ts"],
    )


_RANGE_ATTR_SQL = f"""
SELECT
  s.user_id,
  s.event_id AS signup_event_id,
  s.ts,
  COUNT(CASE WHEN p.ts <= s.ts + INTERVAL 1 DAY THEN 1 END) AS n_purchases_1d,
  CAST(COALESCE(SUM(CASE WHEN p.ts <= s.ts + INTERVAL 1 DAY
    THEN CAST(p.value AS {D2}) END), 0) AS DOUBLE) AS revenue_1d,
  COUNT(CASE WHEN p.ts <= s.ts + INTERVAL 7 DAY THEN 1 END) AS n_purchases_7d,
  CAST(COALESCE(SUM(CASE WHEN p.ts <= s.ts + INTERVAL 7 DAY
    THEN CAST(p.value AS {D2}) END), 0) AS DOUBLE) AS revenue_7d,
  COUNT(p.ts) AS n_purchases_all,
  CAST(COALESCE(SUM(CAST(p.value AS {D2})), 0) AS DOUBLE) AS revenue_all,
  COUNT(DISTINCT CASE WHEN p.ts <= s.ts + INTERVAL 1 DAY
    THEN strftime(p.ts, '%Y-%m-%d') END) AS active_days_1d,
  COUNT(DISTINCT CASE WHEN p.ts <= s.ts + INTERVAL 7 DAY
    THEN strftime(p.ts, '%Y-%m-%d') END) AS active_days_7d,
  COUNT(DISTINCT strftime(p.ts, '%Y-%m-%d')) AS active_days_all
FROM (SELECT * FROM events WHERE event_type = 'signup') s
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = s.user_id AND p.ts >= s.ts
GROUP BY s.user_id, s.event_id, s.ts
"""


@query("signup_attribution", oracle=_RANGE_ATTR_SQL)
def signup_attribution(spark, sf_dir):
    """J9/J10 range-window attribution in one LINEAR pass (reference:
    fct_trade_show_leads.sql:106-169 runs 8 correlated scalar subqueries for
    30/90/180/365-day revenue; :218-224 correlated COUNT DISTINCT). The
    oracle keeps the definitional join + conditional-agg formulation;
    `operators/joins.range_attribution` computes it as prefix-sum
    differences over a probe-injected timeline — O(sort + one pass) per
    user even when one hot user holds half the events (r8 skew gate: the
    former join formulation was O(signups × purchases) per key and ground
    ~10¹⁰ rows on the skew axis's default-account key). Parity certifies
    the rewrite."""
    t = Tables(spark, sf_dir)
    signups = t.events.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_event_id"), "ts"
    )
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    return range_attribution(
        signups,
        purchases,
        on=["user_id"],
        lead_ts="ts",
        fact_ts="p_ts",
        windows_days=[1, 7],
        metrics={
            "n_purchases": ("count",),
            "revenue": ("sum_dec2_double", "p_value"),
            "active_days": ("distinct_dates",),
        },
        lead_cols=["signup_event_id"],
    )
