"""ETL-shaped queries: domain/name/country normalization, percent parsing,
union-projection alignment, sessionization, pivot, approximate sketches
(SURVEY §2.10 X1-X4, §2.3 F19/F26, §2.2 P2/P8, guide patterns).

Email/state inputs are synthesized deterministically from customer keys with
identical expressions on both engines — the testdata has no email columns,
but the normalization logic is exactly the reference's.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

from importer_spark.functions import dec, out_double
from importer_spark.functions.domains import (
    CA_PROVINCE_CODES,
    INDIVIDUAL_EMAIL_DOMAINS,
    US_STATE_CODES,
    country_region,
    extract_primary_domain,
    normalize_country,
    normalize_domain,
)
from importer_spark.io import Tables
from importer_spark.queries.core import D2
from importer_spark.queries.registry import query

_EMAIL_DOMAINS = ["gmail.com", "example.com", "acme-corp.com", "marketplace.amazon.com", "agency.gov"]


def _email_expr_sql() -> str:
    lst = ", ".join(f"'{d}'" for d in _EMAIL_DOMAINS)
    return (
        "lower(replace(c_name, '#', '.')) || '@' || ([{}])[(c_custkey % 5) + 1] "
        "|| CASE WHEN c_custkey % 3 = 0 THEN ';second@other.com' ELSE '' END"
    ).format(lst)


def _domain_stats_sql() -> str:
    ind = ", ".join(f"'{d}'" for d in INDIVIDUAL_EMAIL_DOMAINS)
    return f"""
WITH e AS (
  SELECT c_custkey AS cust_key, {_email_expr_sql()} AS email FROM customer
), d AS (
  SELECT cust_key, email,
    lower(split_part(split_part(email, ';', 1), '@', 2)) AS primary_domain
  FROM e
), n AS (
  SELECT *,
    CASE
      WHEN primary_domain IS NULL OR primary_domain = '' THEN NULL
      WHEN primary_domain IN ('marketplace.amazon.com') THEN 'SKIP_AMAZON_MARKETPLACE'
      WHEN primary_domain IN ({ind}) THEN 'INDIVIDUAL_' || upper(primary_domain)
      ELSE primary_domain
    END AS normalized_domain
  FROM d
)
SELECT normalized_domain,
       COUNT(*) AS n_customers,
       CASE
         WHEN normalized_domain = 'SKIP_AMAZON_MARKETPLACE' THEN 'skip'
         WHEN normalized_domain LIKE 'INDIVIDUAL_%' THEN 'individual'
         ELSE 'corporate'
       END AS domain_type
FROM n
GROUP BY normalized_domain
"""


@query("email_domain_stats", oracle=_domain_stats_sql())
def email_domain_stats(spark, sf_dir):
    """X1/X2 + A15: primary-domain extraction from ';'-lists, marketplace
    skip, individual-provider prefixing, then the Python-side group-stats
    rebuild (domain_consolidation.py:208-294) as a distributed agg."""
    t = Tables(spark, sf_dir)
    domain_pick = F.element_at(
        F.array(*[F.lit(d) for d in _EMAIL_DOMAINS]), (F.col("c_custkey") % 5 + 1).cast("int")
    )
    email = F.concat(
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@"),
        domain_pick,
        F.when(F.col("c_custkey") % 3 == 0, ";second@other.com").otherwise(""),
    )
    e = t.customer.select(F.col("c_custkey").alias("cust_key"), email.alias("email"))
    n = e.select(
        "cust_key",
        normalize_domain(extract_primary_domain(F.col("email"))).alias("normalized_domain"),
    )
    dtype = (
        F.when(F.col("normalized_domain") == "SKIP_AMAZON_MARKETPLACE", "skip")
        .when(F.col("normalized_domain").like("INDIVIDUAL_%"), "individual")
        .otherwise("corporate")
    )
    return n.groupBy("normalized_domain").agg(
        F.count("*").alias("n_customers")
    ).select("normalized_domain", "n_customers", dtype.alias("domain_type"))


def _country_sql() -> str:
    us = ", ".join(f"'{s}'" for s in US_STATE_CODES)
    ca = ", ".join(f"'{s}'" for s in CA_PROVINCE_CODES)
    all_codes = ", ".join(f"'{s}'" for s in US_STATE_CODES + CA_PROVINCE_CODES)
    return f"""
WITH raw AS (
  SELECT c_custkey AS cust_key,
    ([{all_codes}])[(c_custkey % 69) + 1] AS state_code,
    (['USA', 'US', 'Canada', '', NULL, 'France'])[(c_custkey % 6) + 1] AS country_raw
  FROM customer
), norm AS (
  SELECT *,
    CASE
      WHEN country_raw IS NULL OR country_raw = '' THEN
        CASE WHEN upper(trim(state_code)) IN ({us}) THEN 'United States'
             WHEN upper(trim(state_code)) IN ({ca}) THEN 'Canada'
             ELSE 'United States' END
      WHEN upper(trim(country_raw)) IN ('USA', 'US', 'U.S.', 'U.S.A.', 'UNITED STATES')
        THEN 'United States'
      WHEN upper(trim(country_raw)) IN ('CA', 'CAN', 'CANADA') THEN 'Canada'
      WHEN upper(trim(country_raw)) IN ('UK', 'U.K.', 'GB', 'UNITED KINGDOM')
        THEN 'United Kingdom'
      ELSE trim(country_raw)
    END AS country_normalized
  FROM raw
)
SELECT cust_key, state_code, country_raw, country_normalized,
  CASE WHEN country_normalized = 'United States' THEN 'North America'
       WHEN country_normalized = 'Canada' THEN 'North America'
       WHEN country_normalized = 'United Kingdom' THEN 'Europe'
       ELSE 'International' END AS region
FROM norm
"""


@query("country_normalization", oracle=_country_sql())
def country_normalization(spark, sf_dir):
    """F26 country-normalization macro family: explicit alias mapping,
    inference from 56 US + 13 CA codes, fallback, and region roll-up
    (macros/country_normalization.sql:6-75)."""
    t = Tables(spark, sf_dir)
    all_codes = US_STATE_CODES + CA_PROVINCE_CODES
    raw = t.customer.select(
        F.col("c_custkey").alias("cust_key"),
        F.element_at(
            F.array(*[F.lit(s) for s in all_codes]), (F.col("c_custkey") % 69 + 1).cast("int")
        ).alias("state_code"),
        F.element_at(
            F.array(
                F.lit("USA"), F.lit("US"), F.lit("Canada"), F.lit(""),
                F.lit(None).cast("string"), F.lit("France"),
            ),
            (F.col("c_custkey") % 6 + 1).cast("int"),
        ).alias("country_raw"),
    )
    norm = raw.withColumn(
        "country_normalized", normalize_country(F.col("country_raw"), F.col("state_code"))
    )
    return norm.select(
        "cust_key",
        "state_code",
        "country_raw",
        "country_normalized",
        country_region(F.col("country_normalized")).alias("region"),
    )


_PERCENT_SQL = """
WITH raw AS (
  SELECT c_custkey AS cust_key,
    CASE WHEN c_custkey % 2 = 0
      THEN CAST(c_custkey % 500 AS VARCHAR) || '%'
      ELSE CAST(c_custkey % 500 AS VARCHAR)
    END AS rate_text
  FROM customer
)
SELECT cust_key, rate_text,
  ROUND(CASE WHEN rate_text LIKE '%\\%' ESCAPE '\\'
    THEN CAST(replace(rate_text, '%', '') AS DOUBLE) / 100.0
    ELSE CAST(rate_text AS DOUBLE)
  END, 6) AS parsed_rate
FROM raw
"""


@query("percent_parse", oracle=_PERCENT_SQL)
def percent_parse(spark, sf_dir):
    """F19 percent-string parsing ('12%' → 0.12, plain numerics pass
    through; int_quickbooks__order_items_typed.sql:114-131)."""
    t = Tables(spark, sf_dir)
    raw = t.customer.select(
        F.col("c_custkey").alias("cust_key"),
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.concat((F.col("c_custkey") % 500).cast("string"), F.lit("%")),
        )
        .otherwise((F.col("c_custkey") % 500).cast("string"))
        .alias("rate_text"),
    )
    return raw.select(
        "cust_key",
        "rate_text",
        F.round(
            F.when(
                F.col("rate_text").like("%\\%"),
                F.regexp_replace("rate_text", "%", "").cast("double") / 100.0,
            ).otherwise(F.col("rate_text").cast("double")),
            6,
        ).alias("parsed_rate"),
    )


_UNION_ALIGN_SQL = f"""
SELECT o_orderkey AS order_key,
       CAST(CAST(o_totalprice AS {D2}) AS DOUBLE) AS total_amount,
       'NET30' AS terms,
       CAST(NULL AS VARCHAR) AS payment_method,
       'invoice' AS source_type
FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS {D2}) AS DOUBLE),
       CAST(NULL AS VARCHAR),
       'card',
       'sales_receipt'
FROM orders WHERE o_orderstatus <> 'F'
"""


@query("union_projection_alignment", oracle=_UNION_ALIGN_SQL)
def union_projection_alignment(spark, sf_dir):
    """P8/U1: invoice vs sales-receipt branches with different column sets,
    aligned by unionByName(allowMissingColumns) — the Spark form of the
    reference's Jinja-templated NULL::type padding
    (base_quickbooks__order_items.sql:1-173)."""
    t = Tables(spark, sf_dir)
    common = [
        F.col("o_orderkey").alias("order_key"),
        out_double(dec(F.col("o_totalprice"))).alias("total_amount"),
    ]
    invoice = t.orders.filter(F.col("o_orderstatus") == "F").select(
        *common, F.lit("NET30").alias("terms"), F.lit("invoice").alias("source_type")
    )
    receipt = t.orders.filter(F.col("o_orderstatus") != "F").select(
        *common,
        F.lit("card").alias("payment_method"),
        F.lit("sales_receipt").alias("source_type"),
    )
    return invoice.unionByName(receipt, allowMissingColumns=True).select(
        "order_key", "total_amount", "terms", "payment_method", "source_type"
    )


_SESSION_SQL = """
WITH seq AS (
  SELECT user_id, event_id, ts,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
         OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, CAST(SUM(is_new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_num
  FROM seq
)
SELECT user_id, session_num,
  COUNT(*) AS n_events,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sess
GROUP BY user_id, session_num
"""


@query("sessionization", oracle=_SESSION_SQL)
def sessionization(spark, sf_dir):
    """Sessionization via lag-gap + running sum (30-minute inactivity
    boundary) — the batch analog of streaming session windows. One shuffle
    on user_id; both windows and the final agg share that partitioning."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    seq = t.events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            prev_us.isNull() | (F.unix_micros("ts") - prev_us > 1_800_000_000), 1
        )
        .otherwise(0)
        .alias("is_new_session"),
    )
    sess = seq.withColumn("session_num", F.sum("is_new_session").over(run))
    return sess.groupBy("user_id", "session_num").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

_PIVOT_SQL = f"""
SELECT n.n_name AS nation_name,
  {", ".join(
    f'''CAST(COALESCE(SUM(CAST(o.o_totalprice AS {D2}))
      FILTER (c.c_mktsegment = '{s}'), 0) AS DOUBLE) AS {s}'''
    for s in _SEGMENTS
  )}
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@query("pivot_revenue", oracle=_PIVOT_SQL)
def pivot_revenue(spark, sf_dir):
    """Pivot (wide conditional aggregation): revenue by nation × market
    segment. Explicit value list keeps the schema static (a dynamic pivot
    would need an extra pass to discover values)."""
    t = Tables(spark, sf_dir)
    joined = (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    pivoted = (
        joined.groupBy(F.col("n_name").alias("nation_name"))
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(out_double(F.sum(dec(F.col("o_totalprice")))))
    )
    # Pivot leaves combinations with no rows as NULL (the agg never runs) —
    # zero-fill to match the conditional-aggregation form.
    return pivoted.na.fill(0.0, subset=_SEGMENTS)


@query("incremental_distinct_sketch", catalog=False)
def incremental_distinct_sketch(spark, sf_dir):
    """Incremental distinct counting via mergeable HLL sketches
    (operators/sketch.py::hll_partial_sketches): per-(event_type, day)
    partial sketches — the state a daily load would persist — rolled up to
    per-event_type distinct-user estimates by sketch union, never
    rescanning events. Diagnostics (sketch values are engine-specific);
    merge losslessness and error bounds are pinned in tests/test_sketch.py."""
    from importer_spark.operators.sketch import hll_partial_sketches, hll_rollup_estimate

    t = Tables(spark, sf_dir)
    daily = hll_partial_sketches(
        t.events.withColumn("day", F.to_date("ts")),
        ["event_type", "day"],
        "user_id",
    )
    return hll_rollup_estimate(daily, ["event_type"], out_col="approx_users")


@query("approx_distinct_sketch", catalog=False)
def approx_distinct_sketch(spark, sf_dir):
    """HLL approximate distinct + approximate quantiles per segment — the
    sketch path for 100 TB profiling. No SQL oracle: sketch values are
    engine-specific (DuckDB's approx_count_distinct uses a different HLL);
    tests bound the relative error against exact counts instead.
    percentile_approx accuracy 500 ≙ ≤0.2% rank error — plenty for
    profiling, and half the sketch-merge cost of the 1000 default.

    Sketches ONLY — an exact countDistinct here would defeat the operator's
    reason to exist at 100 TB (the error bound vs exact is asserted in
    tests, where exactness belongs). Output columns are all scalars
    (p50/p95 doubles, not an array) so any order-insensitive canonicalizer
    can sort the raw cells."""
    t = Tables(spark, sf_dir)
    agged = (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.approx_count_distinct("o_custkey").alias("approx_customers"),
            F.percentile_approx("o_totalprice", [0.5, 0.95], 500).alias("_q"),
        )
    )
    return agged.select(
        "mktsegment",
        "approx_customers",
        F.element_at("_q", 1).alias("price_p50"),
        F.element_at("_q", 2).alias("price_p95"),
    )


# --- txn-table data skipping, driven end-to-end ----------------------------

_TXN_SKIP_SQL = """
SELECT o_orderpriority AS priority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY 1
"""

TXN_SKIP_CONDS = [
    ("o_orderdate", ">=", datetime.datetime(1997, 1, 1)),
    ("o_orderdate", "<", datetime.datetime(1997, 7, 1)),
]


def build_orders_txn(spark, sf_dir):
    """A date-range-clustered TxnTable copy of orders in a fresh scratch
    dir: ONE commit of 8 range-partitioned files, so the commit manifest
    carries tight per-file o_orderdate min/max — the layout
    `read_where` file pruning rewards (shared by the catalog query below
    and the prune-count pin in tests/test_txn_skipping.py)."""
    import os
    import tempfile

    from importer_spark.txn import TxnTable

    t = Tables(spark, sf_dir)
    table = TxnTable(spark, os.path.join(tempfile.mkdtemp(prefix="txn_skip_"), "orders_txn"))
    table.commit_append(
        t.orders.select(
            "o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority"
        ).repartitionByRange(8, "o_orderdate")
    )
    return table


@query("txn_skipped_revenue", oracle=_TXN_SKIP_SQL)
def txn_skipped_revenue(spark, sf_dir):
    """S12 data skipping exercised END-TO-END (r4 VERDICT ask): orders land
    in a txn table as one commit of date-range-clustered files, and the
    half-year revenue rollup reads through `TxnTable.read_where`, so the
    manifest min/max stats prune the out-of-range files BEFORE they enter
    the Spark plan — at 100 TB the difference between scanning the table
    and scanning the window a Z-ordered predicate touches. The full
    predicate is re-applied as a filter (pruning is never a correctness
    dependency), and the oracle is the plain filtered aggregate over the
    original parquet — value parity certifies the whole
    write→stats→prune→scan loop. The pruned-file count for this exact
    layout is pinned in tests/test_txn_skipping.py."""
    table = build_orders_txn(spark, sf_dir)
    got = table.read_where(TXN_SKIP_CONDS)
    return got.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_orders"),
        out_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
    )
