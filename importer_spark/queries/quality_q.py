"""Declarative data-quality suite as a catalog query (SURVEY §5).

The reference's ~340 dbt schema tests each compile to their own SELECT; the
engine-level equivalent folds a whole suite into one scan (quality.py::
run_suite) and emits the dbt-test-run output shape. Running it as an
oracle-checked query proves the violation arithmetic itself.
"""

from __future__ import annotations

from importer_spark.io import Tables
from importer_spark.quality import run_suite
from importer_spark.queries.registry import query

_SUITE = [
    {"name": "orders_pk_not_null", "kind": "not_null", "col": "o_orderkey"},
    {"name": "orders_pk_unique", "kind": "unique", "col": "o_orderkey"},
    {
        "name": "orders_status_accepted",
        "kind": "accepted_values",
        "col": "o_orderstatus",
        "values": ["O", "F", "P"],
    },
    {
        "name": "orders_price_range",
        "kind": "accepted_range",
        "col": "o_totalprice",
        "lo": 0,
        "hi": 1_000_000,
    },
    {
        "name": "orders_priority_accepted",
        "kind": "accepted_values",
        "col": "o_orderpriority",
        "values": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    },
    {
        "name": "orders_date_not_future_of_max",
        "kind": "expression",
        "expr": "o_orderdate IS NOT NULL",
    },
]

_SUITE_SQL = """
WITH agg AS (
  SELECT
    COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS c1,
    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS c2,
    COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P')
               OR o_orderstatus IS NULL THEN 1 END) AS c3,
    COUNT(CASE WHEN NOT (o_totalprice >= 0 AND o_totalprice <= 1000000)
               OR o_totalprice IS NULL THEN 1 END) AS c4,
    COUNT(CASE WHEN o_orderpriority NOT IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
               OR o_orderpriority IS NULL THEN 1 END) AS c5,
    COUNT(CASE WHEN NOT (o_orderdate IS NOT NULL) THEN 1 END) AS c6
  FROM orders
)
SELECT check_name, CAST(n AS BIGINT) AS n_violations, n = 0 AS passed
FROM agg, LATERAL (VALUES
  ('orders_pk_not_null', c1),
  ('orders_pk_unique', c2),
  ('orders_status_accepted', c3),
  ('orders_price_range', c4),
  ('orders_priority_accepted', c5),
  ('orders_date_not_future_of_max', c6)
) t(check_name, n)
"""


@query("dq_orders_suite", oracle=_SUITE_SQL)
def dq_orders_suite(spark, sf_dir):
    """Six dbt-style schema tests over orders evaluated in ONE aggregation
    (the oracle mirrors with a one-row agg + LATERAL VALUES unpivot). The
    physical plan is a single scan → partial/final agg → 6-row stack; the
    per-test-SELECT alternative is 6 scans — the gap the reference's 340
    tests would hit at 100 TB."""
    return run_suite(Tables(spark, sf_dir).orders, _SUITE)


_CURATED_SUITE = [
    {"name": "curated_doc_unique", "kind": "unique", "col": "doc_id"},
    {"name": "curated_doc_not_null", "kind": "not_null", "col": "doc_id"},
    {
        "name": "curated_tokens_range",
        "kind": "accepted_range",
        "col": "n_tokens",
        "lo": 20,
        "hi": 2000,
    },
    {"name": "curated_pack_nonneg", "kind": "accepted_range", "col": "pack_id", "lo": 0},
    {"name": "curated_lang_not_null", "kind": "not_null", "col": "lang"},
]


def _curated_suite_sql() -> str:
    from importer_spark.queries.llm_sampling import _CURATION_SQL

    return f"""
WITH curated AS ({_CURATION_SQL}),
agg AS (
  SELECT
    COUNT(doc_id) - COUNT(DISTINCT doc_id) AS c1,
    COUNT(CASE WHEN doc_id IS NULL THEN 1 END) AS c2,
    COUNT(CASE WHEN NOT (n_tokens >= 20 AND n_tokens <= 2000)
               OR n_tokens IS NULL THEN 1 END) AS c3,
    COUNT(CASE WHEN NOT (pack_id >= 0) OR pack_id IS NULL THEN 1 END) AS c4,
    COUNT(CASE WHEN lang IS NULL THEN 1 END) AS c5
  FROM curated
)
SELECT check_name, CAST(n AS BIGINT) AS n_violations, n = 0 AS passed
FROM agg, LATERAL (VALUES
  ('curated_doc_unique', c1),
  ('curated_doc_not_null', c2),
  ('curated_tokens_range', c3),
  ('curated_pack_nonneg', c4),
  ('curated_lang_not_null', c5)
) t(check_name, n)
"""


@query("dq_curation_suite", oracle=_curated_suite_sql())
def dq_curation_suite(spark, sf_dir):
    """Validate-after-transform (reference orchestrator.py:466-504 runs the
    data-quality layer after every pipeline stage): the declarative suite
    runner applied to the curation capstone's OUTPUT — pk uniqueness, the
    quality gate's token-range invariant, pack-id sanity. Catalyst fuses
    suite agg onto the capstone plan, so the whole
    transform-then-validate ships as one job, and the result is the dbt
    test-run shape consumers already parse."""
    from importer_spark.queries.llm_sampling import curation_pipeline

    return run_suite(curation_pipeline(spark, sf_dir), _CURATED_SUITE)


_PROFILE_SQL = """
WITH src AS (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal, c_mktsegment
  FROM customer
),
agg AS (
  SELECT
    COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS nn1,
    COUNT(DISTINCT c_custkey) AS nd1,
    CAST(MIN(c_custkey) AS VARCHAR) AS mn1, CAST(MAX(c_custkey) AS VARCHAR) AS mx1,
    COUNT(CASE WHEN c_name IS NULL THEN 1 END) AS nn2,
    COUNT(DISTINCT c_name) AS nd2,
    CAST(MIN(c_name) AS VARCHAR) AS mn2, CAST(MAX(c_name) AS VARCHAR) AS mx2,
    COUNT(CASE WHEN c_nationkey IS NULL THEN 1 END) AS nn3,
    COUNT(DISTINCT c_nationkey) AS nd3,
    CAST(MIN(c_nationkey) AS VARCHAR) AS mn3, CAST(MAX(c_nationkey) AS VARCHAR) AS mx3,
    COUNT(CASE WHEN c_acctbal IS NULL THEN 1 END) AS nn4,
    COUNT(DISTINCT c_acctbal) AS nd4,
    CAST(MIN(c_acctbal) AS VARCHAR) AS mn4, CAST(MAX(c_acctbal) AS VARCHAR) AS mx4,
    COUNT(CASE WHEN c_mktsegment IS NULL THEN 1 END) AS nn5,
    COUNT(DISTINCT c_mktsegment) AS nd5,
    CAST(MIN(c_mktsegment) AS VARCHAR) AS mn5, CAST(MAX(c_mktsegment) AS VARCHAR) AS mx5
  FROM src
)
SELECT column_name, CAST(n_nulls AS BIGINT) AS n_nulls,
       CAST(n_distinct AS BIGINT) AS n_distinct, min_value, max_value
FROM agg, LATERAL (VALUES
  ('c_custkey', nn1, nd1, mn1, mx1),
  ('c_name', nn2, nd2, mn2, mx2),
  ('c_nationkey', nn3, nd3, mn3, mx3),
  ('c_acctbal', nn4, nd4, mn4, mx4),
  ('c_mktsegment', nn5, nd5, mn5, mx5)
) t(column_name, n_nulls, n_distinct, min_value, max_value)
"""


@query("customer_profile", oracle=_PROFILE_SQL)
def customer_profile(spark, sf_dir):
    """One-scan column profiling (nulls / distinct / min / max per column,
    long-form) — the reference's runtime completeness checks generalized.
    The acctbal column goes through DECIMAL(18,2) so its min/max strings
    are engine-portable."""
    from importer_spark.functions import dec
    from importer_spark.quality import profile_columns
    from pyspark.sql import functions as F

    t = Tables(spark, sf_dir)
    src = t.customer.select(
        "c_custkey", "c_name", "c_nationkey",
        dec(F.col("c_acctbal")).alias("c_acctbal"), "c_mktsegment",
    )
    return profile_columns(
        src, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    )


_SKEW_SQL = """
WITH per AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1)
SELECT o_custkey, CAST(n AS BIGINT) AS n_orders,
  ROUND(n::DOUBLE / SUM(n) OVER (), 6) AS share,
  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, o_custkey) AS INTEGER) AS heavy_rank
FROM per
QUALIFY heavy_rank <= 10
"""


@query("key_skew_profile", oracle=_SKEW_SQL)
def key_skew_profile(spark, sf_dir):
    """Top-10 heaviest join keys with their share of all rows — the
    diagnostic you run BEFORE choosing salted_join / AQE skew handling
    (§2.4 J11). Shuffles once on the key; the top-10 compiles to
    TakeOrderedAndProject (never a global window over every key), the
    share denominator is a broadcast one-row aggregate, and the rank
    window runs over the 10 surviving rows only."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t = Tables(spark, sf_dir)
    per = t.orders.groupBy("o_custkey").agg(F.count("*").alias("n"))
    total = per.agg(F.sum("n").alias("_tot"))
    top = per.orderBy(F.desc("n"), F.asc("o_custkey")).limit(10)
    w = Window.orderBy(F.desc("n"), F.asc("o_custkey"))  # 10 rows only
    return top.crossJoin(F.broadcast(total)).select(
        "o_custkey",
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(F.col("n").cast("double") / F.col("_tot"), 6).alias("share"),
        F.row_number().over(w).cast("int").alias("heavy_rank"),
    )


_OUTLIER_SQL = """
WITH q AS (
  SELECT o_orderpriority,
    quantile_cont(o_totalprice, 0.25) AS q1,
    quantile_cont(o_totalprice, 0.75) AS q3
  FROM orders GROUP BY 1
)
SELECT o.o_orderkey AS order_key,
  o.o_orderpriority AS priority,
  o.o_totalprice AS total_price,
  q.q3 + 1.5 * (q.q3 - q.q1) AS upper_fence
FROM orders o JOIN q ON o.o_orderpriority = q.o_orderpriority
WHERE o.o_totalprice > q.q3 + 1.5 * (q.q3 - q.q1)
"""


@query("order_value_outliers", oracle=_OUTLIER_SQL)
def order_value_outliers(spark, sf_dir):
    """Per-group IQR outlier detection (the Tukey-fence data-quality screen):
    orders above Q3 + 1.5·IQR within their priority class. Spark's exact
    `percentile` is bit-identical to DuckDB's quantile_cont (same linear
    interpolation), so the fence — and therefore the boundary rows — agree
    exactly. Scale shape: the per-group quantile table is tiny and
    broadcasts; the fact side is one scan + filter. (Exact percentile sorts
    within groups at scale; swap percentile_approx in when a ±0.2% fence is
    acceptable — same plan otherwise.)"""
    from pyspark.sql import functions as F

    t = Tables(spark, sf_dir)
    q = t.orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    fence = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        t.orders.join(F.broadcast(q), "o_orderpriority")
        .filter(F.col("o_totalprice") > fence)
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("total_price"),
            fence.alias("upper_fence"),
        )
    )
