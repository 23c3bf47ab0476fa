"""Window-function pack (SURVEY §2.6 W1-W10).

Scale notes: all partitioned windows key on high-cardinality columns
(user_id, custkey) so the sort happens within partitions after one shuffle.
The two global windows (lag_growth, percent_rank) operate on post-aggregation
outputs that are tiny by construction (months, customers) — the single
partition is over reduced data, never over the raw fact table.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.functions import dec, growth_pct, out_double, ratio
from importer_spark.io import Tables
from importer_spark.queries.registry import query

_DEDUP_LATEST_SQL = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@query("dedup_latest", oracle=_DEDUP_LATEST_SQL)
def dedup_latest(spark, sf_dir):
    """W1 latest-record dedup (reference: int_quickbooks__items_enriched.sql:12-27
    row_number()=1 by snapshot recency). One shuffle on the partition key."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


_PRIORITY_DEDUP_SQL = """
SELECT c_nationkey AS nation_key, c_mktsegment AS mktsegment,
       c_custkey AS cust_key, c_name AS cust_name, c_acctbal AS acctbal
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY c_nationkey, c_mktsegment
    ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC
  ) AS rn
  FROM customer
)
WHERE rn = 1
"""


@query("priority_dedup", oracle=_PRIORITY_DEDUP_SQL)
def priority_dedup(spark, sf_dir):
    """W2 multi-key priority dedup with NULLS LAST (reference:
    stg_quickbooks__customer_contacts.sql:103-113 — source priority,
    completeness, balance DESC NULLS LAST, id tiebreak)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey").asc()
    )
    return (
        t.customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("c_nationkey").alias("nation_key"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )


_LAG_GROWTH_SQL = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT order_month, revenue,
  LAG(revenue, 1) OVER (ORDER BY order_month NULLS FIRST) AS prev_month_revenue,
  LAG(revenue, 4) OVER (ORDER BY order_month NULLS FIRST) AS rev_4mo_back,
  ROUND((revenue - LAG(revenue, 1) OVER (ORDER BY order_month NULLS FIRST))
        / NULLIF(LAG(revenue, 1) OVER (ORDER BY order_month NULLS FIRST), 0) * 100.0, 6) AS mom_growth_pct
FROM monthly
"""


@query("lag_growth", oracle=_LAG_GROWTH_SQL)
def lag_growth(spark, sf_dir):
    """W5/W10 LAG(1)/LAG(4) + null-safe growth%% (reference:
    fct_company_orders_time_series.sql:59-94, macros/calculate_growth_percentage.sql).
    The global window runs over ~80 pre-aggregated month rows, not raw data."""
    t = Tables(spark, sf_dir)
    monthly = t.orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(out_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue"))
    w = Window.orderBy("order_month")
    prev = F.lag("revenue", 1).over(w)
    return monthly.select(
        "order_month",
        "revenue",
        prev.alias("prev_month_revenue"),
        F.lag("revenue", 4).over(w).alias("rev_4mo_back"),
        growth_pct(F.col("revenue"), prev).alias("mom_growth_pct"),
    )


_PERCENT_RANK_SQL = """
WITH cust_rev AS (
  SELECT o_custkey AS cust_key,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT cust_key, revenue,
       ROUND(PERCENT_RANK() OVER (ORDER BY revenue ASC, cust_key ASC), 6) AS revenue_percentile
FROM cust_rev
"""


@query("percent_rank_customers", oracle=_PERCENT_RANK_SQL)
def percent_rank_customers(spark, sf_dir):
    """W6 global percentile (reference: dim_company_health.sql:59), computed
    WITHOUT a single-task global window: value-bucketed distributed rank
    (operators/ranks.py) + the (rn−1)/(n−1) closed form — the per-customer
    relation stays partitioned at any scale."""
    from importer_spark.operators.ranks import percent_rank_col, with_global_rank_stats

    t = Tables(spark, sf_dir)
    rev = t.orders.groupBy(F.col("o_custkey").alias("cust_key")).agg(
        out_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue")
    )
    ranked = with_global_rank_stats(
        rev,
        "revenue",
        [F.col("revenue").asc(), F.col("cust_key").asc()],
        materialize=False,  # r11 A/B: flat without the checkpoint (0.97 s
        # both ways) — the orders agg exchange is already shared
    )
    return ranked.select(
        "cust_key", "revenue", F.round(percent_rank_col(), 6).alias("revenue_percentile")
    )


_FIRST_VALUE_SQL = """
SELECT DISTINCT
  c_mktsegment AS mktsegment,
  FIRST_VALUE(c_name) OVER (
    PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
  ) AS top_balance_customer,
  FIRST_VALUE(c_name) OVER (
    PARTITION BY c_mktsegment ORDER BY LENGTH(c_name) DESC, c_name ASC
  ) AS longest_name_customer
FROM customer
"""


@query("first_value_repr", oracle=_FIRST_VALUE_SQL)
def first_value_repr(spark, sf_dir):
    """W4 representative selection via FIRST_VALUE (reference:
    int_quickbooks__company_consolidation.sql:30-84 — longest name / highest
    balance as the canonical company record)."""
    t = Tables(spark, sf_dir)
    w_bal = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_len = Window.partitionBy("c_mktsegment").orderBy(
        F.length("c_name").desc(), F.col("c_name").asc()
    )
    return (
        t.customer.select(
            F.col("c_mktsegment").alias("mktsegment"),
            F.first_value(F.col("c_name")).over(w_bal).alias("top_balance_customer"),
            F.first_value(F.col("c_name")).over(w_len).alias("longest_name_customer"),
        )
        .distinct()
    )


_GROUP_SIZE_SQL = """
SELECT
  c_custkey AS cust_key,
  c_nationkey AS nation_key,
  COUNT(*) OVER (PARTITION BY c_nationkey) AS nation_peer_count,
  ROUND(c_acctbal / NULLIF(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
    OVER (PARTITION BY c_nationkey) AS DOUBLE), 0), 6) AS balance_share
FROM customer
"""


@query("group_size_window", oracle=_GROUP_SIZE_SQL)
def group_size_window(spark, sf_dir):
    """W7 group metrics without collapsing (reference:
    int_customer_person_mapping_fixed.sql:106 COUNT(*) OVER)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey")
    return t.customer.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_nationkey").alias("nation_key"),
        F.count("*").over(w).alias("nation_peer_count"),
        ratio(F.col("c_acctbal"), F.sum(dec(F.col("c_acctbal"))).over(w)).alias(
            "balance_share"
        ),
    )


_ROLLING_RANGE_SQL = """
SELECT
  event_id, user_id, ts,
  COUNT(*) OVER w AS rolling_1h_count,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling_1h_value
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
"""


@query("rolling_range_window", oracle=_ROLLING_RANGE_SQL)
def rolling_range_window(spark, sf_dir):
    """W8 time-RANGE frame (reference: fct_product_pricing_history.sql:118-136
    30-day rolling cluster frequency/volume). Ordered on epoch microseconds so
    the frame boundary is exact in both engines; at scale this is one shuffle
    on user_id + an in-partition range scan."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return t.events.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("rolling_1h_count"),
        out_double(F.sum(dec(F.col("value"))).over(w)).alias("rolling_1h_value"),
    )


_RUNNING_MAX_SQL = """
SELECT
  o_orderkey AS order_key,
  o_custkey AS cust_key,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  o_totalprice AS total_price,
  MAX(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS running_max_price
FROM orders
"""


@query("running_max", oracle=_RUNNING_MAX_SQL)
def running_max(spark, sf_dir):
    """W9 ROWS UNBOUNDED PRECEDING running MAX (reference:
    fct_product_pricing_history.sql:197-201 fallback retail price)."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.orders.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.col("o_totalprice").alias("total_price"),
        F.max("o_totalprice").over(w).alias("running_max_price"),
    )


_NTILE_SQL = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
  FROM orders GROUP BY 1
)
SELECT o_custkey AS cust_key,
  CAST(total AS DOUBLE) AS total_spend,
  CAST(NTILE(4) OVER (ORDER BY total DESC, o_custkey) AS INTEGER) AS spend_quartile
FROM spend
"""


@query("customer_spend_quartiles", oracle=_NTILE_SQL)
def customer_spend_quartiles(spark, sf_dir):
    """NTILE(4) spend quartiles with a total deterministic order (exact
    decimal totals, customer-key tie-break), via the distributed global
    rank + NTILE's closed form (floor(k·(rn−1)/n)+1 reproduces SQL's
    uneven-bucket rule exactly) — no single-partition window at any
    scale."""
    from importer_spark.operators.ranks import ntile_col, with_global_rank_stats

    t = Tables(spark, sf_dir)
    spend = t.orders.groupBy("o_custkey").agg(
        F.sum(dec(F.col("o_totalprice"))).alias("total")
    ).select(
        F.col("o_custkey").alias("cust_key"),
        out_double(F.col("total")).alias("total_spend"),
    )
    ranked = with_global_rank_stats(
        spend,
        "total_spend",
        [F.desc("total_spend"), F.asc("cust_key")],
        first_col_ascending=False,
        materialize=False,  # r11 A/B: 0.85 s vs 0.90 s materialized
    )
    return ranked.select(
        "cust_key", "total_spend", ntile_col(4).alias("spend_quartile")
    )


_ROLL_MED_SQL = """
SELECT event_id, user_id,
  quantile_cont(value, 0.5) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
  ) AS rolling_median_10
FROM events
"""


@query("rolling_median_value", oracle=_ROLL_MED_SQL)
def rolling_median_value(spark, sf_dir):
    """Exact rolling median (robust smoother — the W8 rolling family with a
    rank-based aggregate, which plain sum/avg frames can't express): median
    of each user's last 10 event values. Spark's exact `percentile` as a
    frame aggregate is bit-identical to DuckDB's quantile_cont (same linear
    interpolation). One shuffle on user_id; frame is rows-bounded so state
    per row is O(10)."""
    t = Tables(spark, sf_dir)
    return t.events.selectExpr(
        "event_id",
        "user_id",
        "percentile(value, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS rolling_median_10",
    )


_CUMDIST_SQL = """
SELECT event_id, user_id,
  COUNT(DISTINCT event_type) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS distinct_types_so_far
FROM events
"""


@query("cumulative_distinct_types", oracle=_CUMDIST_SQL)
def cumulative_distinct_types(spark, sf_dir):
    """Running COUNT(DISTINCT) per user — a window Spark does NOT support
    natively (DISTINCT aggregates are rejected in window frames). Rewrite:
    flag each (user, type)'s FIRST occurrence with a row_number window,
    then a cumulative sum of flags. Left alone, Catalyst shuffles twice
    (hash(user, type) then hash(user)); the explicit user_id repartition
    satisfies BOTH windows' clustering requirements (same-key rows stay
    co-located under the coarser hash), so the plan is ONE shuffle + two
    in-partition sorts — plan-pinned. The oracle runs DuckDB's native
    distinct window, proving the rewrite equivalent."""
    t = Tables(spark, sf_dir)
    first_w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    cum_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # COUNT(DISTINCT) never counts NULL — the first NULL-type row must not
    # raise the running count (fuzz-gate 3VL contract)
    flagged = t.events.repartition("user_id").withColumn(
        "_first",
        ((F.row_number().over(first_w) == 1) & F.col("event_type").isNotNull())
        .cast("bigint"),
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("_first").over(cum_w).alias("distinct_types_so_far"),
    )


_STREAK_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
  FROM events
),
islands AS (
  SELECT user_id, day_num,
    day_num - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_num)
      AS island
  FROM days
),
runs AS (
  SELECT user_id, island, COUNT(*) AS streak_days
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
  CAST(MAX(streak_days) AS BIGINT) AS longest_streak_days,
  CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY user_id
"""


@query("user_activity_streaks", oracle=_STREAK_SQL)
def user_activity_streaks(spark, sf_dir):
    """Gaps-and-islands (the dual of user_event_gaps): longest run of
    CONSECUTIVE active days per user. day_num − row_number(day_num) is
    constant exactly within a consecutive run — the classic islands key —
    then two cheap aggs. One user_id shuffle serves the distinct, the
    window, and both aggregations (all key-compatible)."""
    t = Tables(spark, sf_dir)
    days = (
        t.events.select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day_num"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_num")
    islands = days.withColumn("island", F.col("day_num") - F.row_number().over(w))
    runs = islands.groupBy("user_id", "island").agg(F.count("*").alias("streak_days"))
    return runs.groupBy("user_id").agg(
        F.max("streak_days").cast("bigint").alias("longest_streak_days"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )


_REGION_SPEND_RANK_SQL = """
WITH spend AS (
  SELECT c.c_custkey, r.r_name AS region,
    SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS sp
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_custkey, region,
  CAST(sp AS DOUBLE) AS spend,
  ROW_NUMBER() OVER (PARTITION BY region ORDER BY sp DESC, c_custkey)
    AS spend_rank,
  NTILE(4) OVER (PARTITION BY region ORDER BY sp DESC, c_custkey)
    AS quartile
FROM spend
"""


@query("region_spend_rank", oracle=_REGION_SPEND_RANK_SQL)
def region_spend_rank(spark, sf_dir):
    """Per-region customer spend ranking + quartiles via the PARTITIONED
    distributed rank (`operators/ranks.py::grouped_row_number`) — the
    dominant-group regime `Window.partitionBy` cannot survive at 100 TB
    (one region holding most customers funnels through one task; here
    every (region, value-bucket) cell ranks in parallel and per-region
    offsets come from a region×buckets-sized side relation). The oracle is
    the plain partitioned-window formulation, so value parity certifies
    the bucket-and-offset decomposition against SQL ROW_NUMBER/NTILE
    semantics, uneven buckets included. Spend sums as exact DECIMAL before
    ranking (ties broken by custkey), output cast to double once."""
    from importer_spark.operators.ranks import ntile_col, with_grouped_rank_stats

    t = Tables(spark, sf_dir)
    spend = (
        t.orders.groupBy("o_custkey")
        .agg(F.sum(dec(F.col("o_totalprice"))).alias("sp"))
        .join(t.customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", F.col("r_name").alias("region"), "sp")
    )
    ranked = with_grouped_rank_stats(
        spend.withColumn("_spd", F.col("sp").cast("double")),
        ["region"],
        "_spd",
        [F.col("sp").desc(), F.col("c_custkey").asc()],
        first_col_ascending=False,
        materialize=False,  # r11 A/B: 1.19 s vs 1.31 s materialized
    )
    return ranked.select(
        "c_custkey",
        "region",
        out_double(F.col("sp")).alias("spend"),
        F.col("_rn").alias("spend_rank"),
        ntile_col(4).alias("quartile"),
    )
