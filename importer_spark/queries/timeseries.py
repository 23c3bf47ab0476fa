"""Time-series / OLAP-grid queries: CUBE, forward-fill (LOCF), calendar
spine densification, percent-of-total — the gap-filling and share-of-total
shapes every mart layer needs (reference: period-grain marts in
models/mart/mart_company_period_metrics.sql hand-build these with unions
and self-joins; these are the engine-native forms).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.functions import dec, out_double
from importer_spark.io import Tables
from importer_spark.queries.registry import query

_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
  GROUPING(o_orderstatus, o_orderpriority) AS grouping_level,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("cube_status_priority", oracle=_CUBE_SQL)
def cube_status_priority(spark, sf_dir):
    """CUBE over (status, priority): all four grouping sets in one pass with
    grouping_id disambiguating subtotal rows. Catalyst plans cube as a
    single Expand + one shuffle — versus four scans for the hand-unioned
    equivalent."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("grouping_level"),
            F.count("*").alias("n_orders"),
            out_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
        )
        .select("o_orderstatus", "o_orderpriority", "grouping_level", "n_orders", "revenue")
    )


_LOCF_SQL = """
WITH base AS (
  SELECT user_id, event_id, ts,
    CASE WHEN value >= 10 THEN value END AS reading
  FROM events
)
SELECT user_id, event_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
  reading,
  LAST_VALUE(reading IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS reading_filled
FROM base
"""


@query("events_locf", oracle=_LOCF_SQL)
def events_locf(spark, sf_dir):
    """Forward-fill (last observation carried forward): readings below a
    validity threshold are nulled, then `last(..., ignorenulls)` over a
    running frame carries the prior good value — the sensor/price
    gap-repair idiom. One window pass; at scale partitions by entity so
    fills never cross users."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = t.events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("value") >= 10, F.col("value")).alias("reading"),
    )
    return base.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "reading",
        F.last("reading", ignorenulls=True).over(w).alias("reading_filled"),
    )


_SPINE_SQL = """
WITH bounds AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS lo, CAST(MAX(o_orderdate) AS DATE) AS hi
  FROM orders
),
spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM bounds
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT strftime(spine.d, '%Y-%m-%d') AS order_date,
  CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_orders,
  CAST(COALESCE(daily.rev, 0) AS DOUBLE) AS revenue
FROM spine LEFT JOIN daily ON spine.d = daily.d
"""


@query("daily_revenue_spine", oracle=_SPINE_SQL)
def daily_revenue_spine(spark, sf_dir):
    """Calendar-spine densification: generate every day between min and max
    order date (`sequence` + explode — no calendar seed table needed), left
    join daily aggregates, zero-fill gaps. The spine side is tiny and
    derived from a 1-row agg, so it broadcasts; the daily agg side carries
    the shuffle."""
    t = Tables(spark, sf_dir)
    bounds = t.orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    daily = t.orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count("*").alias("n"), F.sum(dec(F.col("o_totalprice"))).alias("rev")
    )
    return (
        spine.join(daily, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("order_date"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_orders"),
            out_double(F.coalesce("rev", F.lit(0))).alias("revenue"),
        )
    )


_SHARE_SQL = """
WITH per AS (
  SELECT o_orderpriority,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT o_orderpriority,
  CAST(rev AS DOUBLE) AS revenue,
  ROUND(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 6) AS revenue_share
FROM per
"""


@query("revenue_share", oracle=_SHARE_SQL)
def revenue_share(spark, sf_dir):
    """Percent-of-total via an unpartitioned window sum over the aggregated
    relation (5 rows), not the fact table — the ratio_to_report shape.
    Decimal sums keep numerator and denominator exact, so the ratio is
    bitwise-portable."""
    t = Tables(spark, sf_dir)
    per = t.orders.groupBy("o_orderpriority").agg(
        F.sum(dec(F.col("o_totalprice"))).alias("rev")
    )
    w = Window.partitionBy()
    return per.select(
        "o_orderpriority",
        out_double(F.col("rev")).alias("revenue"),
        F.round(
            out_double(F.col("rev")) / F.sum("rev").over(w).cast("double"), 6
        ).alias("revenue_share"),
    )


_ANOM_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev_d
  FROM orders GROUP BY 1
),
win AS (
  SELECT day, rev_d,
    COUNT(*) OVER w AS n,
    CAST(SUM(rev_d) OVER w AS DOUBLE) AS s1,
    CAST(SUM(CAST(rev_d AS DECIMAL(19,2)) * CAST(rev_d AS DECIMAL(19,2)))
      OVER w AS DOUBLE) AS s2
  FROM daily
  WINDOW w AS (ORDER BY day NULLS FIRST ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT SUBSTR(CAST(day AS STRING), 1, 10) AS day,
  CAST(rev_d AS DOUBLE) AS revenue,
  ROUND((CAST(rev_d AS DOUBLE) - s1 / n)
    / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS zscore
FROM win
WHERE n = 30 AND (s2 - s1 * s1 / n) > 0
"""


@query("daily_revenue_anomalies", oracle=_ANOM_SQL)
def daily_revenue_anomalies(spark, sf_dir):
    """Rolling z-score anomaly screen over daily revenue (trailing 30 full
    days). The determinism trick: the window carries EXACT DECIMAL power
    sums (Σx, Σx² — decimal addition is associative, so DuckDB's
    segment-tree window accumulation and Spark's sequential frame
    accumulation cannot round differently), and the float mean/variance
    derive from those two scalars; the only engine divergence left is the
    final decimal→double cast (1 ulp), absorbed by the house 6-digit
    rounding convention. The global window runs over the tiny
    post-aggregation day series, never raw orders."""
    t = Tables(spark, sf_dir)
    daily = t.orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(dec(F.col("o_totalprice"))).cast("decimal(18,2)").alias("rev_d"))
    w = Window.orderBy("day").rowsBetween(-29, Window.currentRow)
    win = daily.select(
        "day",
        "rev_d",
        F.count("*").over(w).alias("n"),
        F.sum("rev_d").over(w).cast("double").alias("s1"),
        # Operands widened BEFORE the multiply: both engines then produce an
        # exact DECIMAL(38,4) product (a bare DECIMAL(18,2)² overflows
        # DuckDB's 18-digit multiply once daily revenue crosses ~1e9 — found
        # by the sf1 gate; headroom now extends past rev_d ~1e15).
        F.sum(
            F.col("rev_d").cast("decimal(19,2)") * F.col("rev_d").cast("decimal(19,2)")
        )
        .over(w)
        .cast("double")
        .alias("s2"),
    )
    var_num = F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
    return win.filter((F.col("n") == 30) & (var_num > 0)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("rev_d").cast("double").alias("revenue"),
        F.round(
            (F.col("rev_d").cast("double") - F.col("s1") / F.col("n"))
            / F.sqrt(var_num / (F.col("n") - 1)),
            6,
        ).alias("zscore"),
    )
