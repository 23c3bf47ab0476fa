"""Scalar-function pack (SURVEY §2.3 F1-F26, §2.2 P3): string, regex, JSON,
date/time, surrogate keys, CASE scoring, null/blank cleaning. All pure Column
expressions — whole-stage-codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from importer_spark.functions import surrogate_key
from importer_spark.io import Tables
from importer_spark.queries.registry import query

_STRING_FN_SQL = """
SELECT
  c_custkey AS cust_key,
  -- DuckDB's split_part maps NULL input to '' — a quirk; the engine
  -- contract is ANSI NULL-in/NULL-out, so the oracle states it explicitly
  CASE WHEN c_name IS NULL THEN NULL ELSE split_part(c_name, '#', 2) END AS cust_num,
  lower(c_mktsegment) AS seg_lower,
  upper(c_mktsegment) AS seg_upper,
  length(c_name) AS name_len,
  left(c_mktsegment, 3) AS seg3,
  replace(c_name, 'Customer', 'Cust') AS short_name,
  concat_ws(', ', c_mktsegment, nullif(c_name, ''), NULL) AS joined,
  'C-' || CAST(c_custkey AS VARCHAR) AS formatted_key,
  -- word-wise, matching Spark initcap (space-delimited words, first letter
  -- up, rest down); first-char-only capitalization masqueraded as equal on
  -- the single-word clean segments until the Unicode fuzz gate added spaces.
  -- Known engine-semantics boundary (exercised by the Unicode gate's
  -- titlecase_digraph / one_to_many_case mutation classes; routed through
  -- run_local_gate --boundary with a values~seg_initcap signature):
  --   * digraph codepoints (U+01C4..U+01CC, U+01F1..U+01F3): Spark initcap
  --     TITLE-cases the word's first letter (Character.toTitleCase: dž→Dž)
  --     while this oracle's upper() UPPER-cases it (dž→DŽ);
  --   * locale-special one-to-many case maps: Spark lowercases the WHOLE
  --     word first (String.toLowerCase expands U+0130 'İ' to 'i'+U+0307)
  --     then title-cases, while upper(left(w,1))||lower(substr(w,2)) never
  --     lowercases the first char (İ stays İ); ß upper-cases to SS in
  --     DuckDB upper() but Character.toTitleCase(ß) is ß itself.
  -- Both are properties of the two engines' case-mapping tables, not of
  -- the query plan — ASCII and ordinary non-digraph letters agree exactly.
  CASE WHEN c_mktsegment IS NULL THEN NULL ELSE
    array_to_string(
      list_transform(string_split(c_mktsegment, ' '),
                     w -> upper(left(w, 1)) || lower(substr(w, 2))),
      ' ')
  END AS seg_initcap
FROM customer
"""


@query("string_functions", oracle=_STRING_FN_SQL)
def string_functions(spark, sf_dir):
    """F1/F2/F4/F9: TRIM/LOWER/UPPER/LENGTH/LEFT/REPLACE, SPLIT_PART,
    null-skipping CONCAT_WS, 'S-'||key formatting (reference:
    int_quickbooks__company_consolidation.sql:39,190;
    int_quickbooks__customer_company_mapping.sql:31-39;
    stg_shopify__orders.sql:15; fct_orders.sql:124-139)."""
    t = Tables(spark, sf_dir)
    seg = F.col("c_mktsegment")
    return t.customer.select(
        F.col("c_custkey").alias("cust_key"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.lower(seg).alias("seg_lower"),
        F.upper(seg).alias("seg_upper"),
        F.length("c_name").alias("name_len"),
        F.substring(seg, 1, 3).alias("seg3"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.concat_ws(
            ", ", seg, F.nullif(F.col("c_name"), F.lit("")), F.lit(None).cast("string")
        ).alias("joined"),
        F.concat(F.lit("C-"), F.col("c_custkey").cast("string")).alias("formatted_key"),
        F.initcap(seg).alias("seg_initcap"),
    )


_REGEX_SQL = """
SELECT
  p_partkey AS part_key,
  regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
  regexp_extract(p_name, '(\\w+)$', 1) AS last_word,
  p_name SIMILAR TO '.*(ring|bolt)' AS is_ring_or_bolt,
  regexp_replace(p_name, ' ', '_', 'g') AS slug,
  regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num
FROM part
"""


@query("regex_functions", oracle=_REGEX_SQL)
def regex_functions(spark, sf_dir):
    """F5/F6/P6: regex capture groups, rlike predicates, global
    regexp_replace (reference: stg_shopify__order_attribution.sql:25-47 UTM
    extraction; int_quickbooks__items_enriched.sql:112-141 packaging regex)."""
    t = Tables(spark, sf_dir)
    return t.part.select(
        F.col("p_partkey").alias("part_key"),
        F.regexp_extract(F.col("p_name"), r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract(F.col("p_name"), r"(\w+)$", 1).alias("last_word"),
        F.col("p_name").rlike(r"(ring|bolt)$").alias("is_ring_or_bolt"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("slug"),
        F.regexp_extract(F.col("p_brand"), r"Brand#(\d+)", 1).alias("brand_num"),
    )


_SURROGATE_SQL = """
SELECT
  l_orderkey AS order_key,
  l_linenumber AS line_number,
  md5(concat_ws('-',
      coalesce(CAST(l_orderkey AS VARCHAR), ''),
      coalesce(CAST(l_linenumber AS VARCHAR), ''),
      coalesce(CAST(l_partkey AS VARCHAR), ''))) AS line_item_sk
FROM lineitem
"""


@query("surrogate_keys", oracle=_SURROGATE_SQL)
def surrogate_keys(spark, sf_dir):
    """F8 dbt_utils.generate_surrogate_key byte-parity (reference:
    dim_customer_contacts.sql:145-147 — md5 of coalesce(cast(c as string),'')
    joined by '-'; key stability is load-bearing for merge semantics)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        surrogate_key("l_orderkey", "l_linenumber", "l_partkey").alias("line_item_sk"),
    )


_JSON_SQL = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
  json_extract_string(props, '$.missing') AS prop_missing
FROM events
"""


@query("json_extraction", oracle=_JSON_SQL)
def json_extraction(spark, sf_dir):
    """F23/§1.1 semi-structured JSON column access (reference:
    stg_quickbooks__company_enrichment.sql:21-43 flattened JSONB fields).
    get_json_object stays JVM-side; at scale prefer from_json with a schema
    so Catalyst prunes unused fields."""
    t = Tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.get_json_object("props", "$.missing").alias("prop_missing"),
    )


_DATE_FN_SQL = """
WITH anchor AS (SELECT MAX(o_orderdate) AS as_of FROM orders)
SELECT
  o_orderkey AS order_key,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month_start,
  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS order_quarter_start,
  strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS order_week_start,
  year(o_orderdate) AS order_year,
  month(o_orderdate) AS order_month,
  quarter(o_orderdate) AS order_quarter,
  date_diff('day', o_orderdate, as_of) AS age_days,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
  strftime(o_orderdate + INTERVAL 6 MONTH, '%Y-%m-%d') AS followup_date,
  o_orderdate >= as_of - INTERVAL 2 YEAR AS is_recent
FROM orders CROSS JOIN anchor
"""


@query("date_functions", oracle=_DATE_FN_SQL)
def date_functions(spark, sf_dir):
    """F10-F17: date_trunc day/week/month/quarter, extract parts, datediff,
    interval arithmetic, trailing-window predicates (reference:
    mart_product_unit_sales.sql:45-49, fct_company_orders.sql:69-71,178,
    mart_company_period_metrics.sql:40-131). Anchor = max order date
    (deterministic now)."""
    t = Tables(spark, sf_dir)
    anchor = t.orders.agg(F.max("o_orderdate").alias("as_of"))
    o = t.orders.crossJoin(F.broadcast(anchor))
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").alias("order_key"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("order_month_start"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias("order_quarter_start"),
        F.date_format(F.date_trunc("week", d), "yyyy-MM-dd").alias("order_week_start"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.quarter(d).alias("order_quarter"),
        F.datediff(F.col("as_of"), d).alias("age_days"),
        F.date_format(d + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
        F.date_format(d + F.expr("INTERVAL 6 MONTHS"), "yyyy-MM-dd").alias("followup_date"),
        (d >= F.col("as_of") - F.expr("INTERVAL 2 YEARS")).alias("is_recent"),
    )


_CASE_SCORING_SQL = """
WITH cust_orders AS (
  SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment, COUNT(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
)
SELECT
  c_custkey AS cust_key,
  CASE
    WHEN c_acctbal IS NULL THEN NULL
    WHEN c_acctbal < 0 THEN 'delinquent'
    WHEN c_acctbal < 1000 THEN 'bronze'
    WHEN c_acctbal < 5000 THEN 'silver'
    ELSE 'gold'
  END AS balance_tier,
  CASE
    WHEN n_orders = 0 THEN 'inactive'
    WHEN n_orders < 5 THEN 'occasional'
    WHEN n_orders < 15 THEN 'regular'
    ELSE 'frequent'
  END AS activity_tier,
  ROUND(
    LEAST(100.0, GREATEST(0.0, c_acctbal / 100.0)) * 0.6
    + LEAST(100.0, n_orders * 5.0) * 0.4, 6) AS health_score,
  ABS(c_acctbal) AS abs_balance
FROM cust_orders
"""


@query("case_scoring", oracle=_CASE_SCORING_SQL)
def case_scoring(spark, sf_dir):
    """F21/F22/F18: multi-branch CASE tiers + weighted 0-100 health score +
    GREATEST/LEAST/ABS guards (reference: dim_company_health.sql:117-225
    weighted growth r*0.6+o*0.4; fct_company_orders.sql:162-175 tiers)."""
    t = Tables(spark, sf_dir)
    co = (
        t.customer.join(
            t.orders, F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .groupBy("c_custkey", "c_acctbal", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    bal = F.col("c_acctbal")
    n = F.col("n_orders")
    return co.select(
        F.col("c_custkey").alias("cust_key"),
        # NULL balance → NULL tier: the final else must not promote missing
        # data to 'gold' (NULL < x is NULL, which skips every WHEN)
        F.when(bal.isNull(), F.lit(None).cast("string"))
        .when(bal < 0, "delinquent")
        .when(bal < 1000, "bronze")
        .when(bal < 5000, "silver")
        .otherwise("gold")
        .alias("balance_tier"),
        F.when(n == 0, "inactive")
        .when(n < 5, "occasional")
        .when(n < 15, "regular")
        .otherwise("frequent")
        .alias("activity_tier"),
        F.round(
            F.least(F.lit(100.0), F.greatest(F.lit(0.0), bal / 100.0)) * 0.6
            + F.least(F.lit(100.0), n * 5.0) * 0.4,
            6,
        ).alias("health_score"),
        F.abs(bal).alias("abs_balance"),
    )


_NULL_CLEAN_SQL = """
SELECT
  c_custkey AS cust_key,
  coalesce(nullif(trim(c_name), ''), 'UNKNOWN') AS clean_name,
  nullif(c_mktsegment, 'BUILDING') AS non_building_segment,
  coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT_SEGMENT') AS segment_with_default,
  trim(c_name) = '' AS is_blank_name
FROM customer
"""


@query("null_blank_cleaning", oracle=_NULL_CLEAN_SQL)
def null_blank_cleaning(spark, sf_dir):
    """P3 NULLIF(TRIM(x),'') + COALESCE fallback chains (reference:
    stg_quickbooks__customers.sql:21-25,
    stg_quickbooks__customer_contacts_clean.sql:15-47)."""
    t = Tables(spark, sf_dir)
    return t.customer.select(
        F.col("c_custkey").alias("cust_key"),
        F.coalesce(F.nullif(F.trim(F.col("c_name")), F.lit("")), F.lit("UNKNOWN")).alias(
            "clean_name"
        ),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("non_building_segment"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT_SEGMENT")
        ).alias("segment_with_default"),
        (F.trim(F.col("c_name")) == "").alias("is_blank_name"),
    )
