"""Declarative per-mart quality manifests (SURVEY §5).

The reference blankets all of its models with ~340 dbt YAML schema tests
(models/mart/mart.yml — 1065 lines of not_null / unique / accepted_values /
accepted_range / expression_is_true blocks; plus staging and intermediate
ymls). This module is the Spark analog of that yml layer: one declarative
manifest binding every mart-shaped catalog query to its invariants, compiled
through quality.run_suite so each query's whole suite evaluates in ONE
aggregation pass over one scan of the query result — at 100 TB a
test-per-scan layer is the difference between 1 scan per mart and ~10.

Checks are STRUCTURAL invariants of each mart's contract (key non-null and
unique, closed categorical domains, arithmetic relations between columns),
not snapshots of current data — they must hold at every scale factor.

Usage:

    results = run_manifest(spark, sf_dir)           # long-form DataFrame
    assert_manifest(spark, sf_dir)                  # raises QualityError

Wired into pytest by tests/test_quality_manifest.py; the dq_* catalog
queries remain the oracle-checked samples of the same machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from importer_spark.quality import QualityError, run_suite

# One entry per mart-shaped catalog query. Kinds are quality.run_suite's:
# not_null(col) / unique(col|cols) / accepted_values(col, values) /
# accepted_range(col, lo, hi) / expression(expr).


def _nn(*cols):
    return [{"kind": "not_null", "col": c, "name": f"not_null_{c}"} for c in cols]


def _uq(*cols):
    if len(cols) == 1:
        return [{"kind": "unique", "col": cols[0], "name": f"unique_{cols[0]}"}]
    return [{"kind": "unique", "cols": list(cols), "name": "unique_" + "_".join(cols)}]


def _vals(col, values):
    return [
        {"kind": "accepted_values", "col": col, "values": values,
         "name": f"accepted_values_{col}"}
    ]


def _rng(col, lo=None, hi=None):
    return [
        {"kind": "accepted_range", "col": col, "lo": lo, "hi": hi,
         "name": f"accepted_range_{col}"}
    ]


def _ex(name, expr):
    return [{"kind": "expression", "expr": expr, "name": name}]


MANIFEST: dict[str, list[dict]] = {
    "orders_fact": (
        _nn("order_key", "cust_key", "order_date", "order_status", "sales_channel")
        + _uq("order_key")
        + _vals("order_status", ["O", "F", "P"])
        + _vals("sales_channel", ["Express", "Fulfilled-Std", "Priority", "Standard"])
        + _vals("order_size", ["small", "medium", "large"])
        + _rng("n_lines", lo=1)
        + _ex("net_le_gross", "net_amount <= gross_amount + 1e-9")
        + _ex("qty_positive", "total_qty > 0")
    ),
    "ar_aging": (
        _nn("level", "age_bucket", "n_orders")
        + _vals("level", ["bucket", "bucket_segment"])
        + _vals("age_bucket", ["current", "181-365", "366-730", "730+"])
        + _rng("n_orders", lo=0)
    ),
    "mart_customer_health": (
        _nn("cust_key", "cust_name", "mktsegment", "balance_tier")
        + _uq("cust_key")
        + _vals("balance_tier", ["delinquent", "bronze", "silver", "gold"])
        + _rng("revenue_percentile", lo=0.0, hi=1.0)
        + _rng("n_orders", lo=0)
    ),
    "mart_product_period_spending": (
        _nn("part_key", "cust_key", "spend_all")
        + _uq("part_key", "cust_key")
        + _rng("customer_rank_in_product", lo=1)
        + _ex("periods_nested", "spend_90d <= spend_365d + 1e-9 AND spend_365d <= spend_all + 1e-9")
        + _ex("lines_positive", "n_lines_all >= 1")
    ),
    "mart_segment_summary": (
        _nn("mktsegment", "n_customers", "n_orders", "revenue")
        + _uq("mktsegment")
        + _rng("express_share", lo=0.0, hi=1.0)
        + _ex("returns_bounded", "n_with_returns <= n_customers")
        + _ex("customers_le_orders", "n_customers <= n_orders")
    ),
    "product_pricing_history": (
        _nn("part_key", "ship_date", "order_key", "obs_price")
        + _uq("part_key", "ship_date", "order_key", "line_number")
        + _ex("obs_price_positive", "obs_price > 0")
        + _ex("running_max_ge_obs", "running_max_price >= obs_price - 1e-9")
        + _ex("obs_window_positive", "obs_30d >= 1")
    ),
    "pricing_summary": (
        _nn("l_returnflag", "l_linestatus")
        + _uq("l_returnflag", "l_linestatus")
        + _ex("disc_price_le_base", "sum_disc_price <= sum_base_price + 1e-6")
        + _ex("charge_ge_disc", "sum_charge >= sum_disc_price - 1e-6")
        + _rng("avg_disc", lo=0.0, hi=1.0)
        + _ex("count_positive", "count_order >= 1")
    ),
    "region_revenue": (
        _nn("region_name", "nation_name")
        + _uq("region_name", "nation_name")
        + _ex("customers_le_orders", "n_customers <= n_orders")
        + _ex("orders_positive", "n_orders >= 1")
    ),
    "top_customers": (
        _nn("cust_key", "cust_name", "revenue")
        + _uq("cust_key")
        + _ex("orders_positive", "n_orders >= 1")
    ),
    "email_domain_stats": (
        _nn("normalized_domain", "n_customers", "domain_type")
        + _uq("normalized_domain")
        + _vals("domain_type", ["corporate", "individual", "skip"])
        + _ex("customers_positive", "n_customers >= 1")
    ),
    "company_consolidation": (
        _nn("company_key", "canonical_variant", "n_members")
        + _uq("company_key")
        + _ex("members_positive", "n_members >= 1")
        + _ex("canonical_len_bounded", "length(canonical_variant) <= longest_variant_len")
    ),
    "company_representatives": (
        _nn("company_key", "representative_name", "top_balance_member")
        + _uq("company_key")
    ),
    "customer_spend_quartiles": (
        _nn("cust_key", "total_spend", "spend_quartile")
        + _uq("cust_key")
        + _vals("spend_quartile", [1, 2, 3, 4])
    ),
    "daily_revenue_spine": (
        _nn("order_date", "n_orders", "revenue")
        + _uq("order_date")
        + _rng("n_orders", lo=0)
        + _ex("zero_days_zero_revenue", "n_orders > 0 OR revenue = 0.0")
    ),
    "trailing_period_metrics": (
        _nn("cust_key")
        + _uq("cust_key")
        + _ex("orders_nested", "n_orders_30d <= n_orders_90d AND n_orders_90d <= n_orders_365d AND n_orders_365d <= n_orders_all")
        + _ex("revenue_nested", "revenue_30d <= revenue_90d + 1e-9 AND revenue_90d <= revenue_365d + 1e-9 AND revenue_365d <= revenue_all + 1e-9")
    ),
    "order_reconciliation": (
        _nn("order_key", "match_status")
        + _uq("order_key")
        + _vals("match_status", ["MATCHED", "ORDER_ONLY", "LINEITEM_ONLY"])
        + _ex("matched_has_both", "match_status != 'MATCHED' OR (header_total IS NOT NULL AND lineitem_net IS NOT NULL)")
    ),
    "sessionization": (
        _nn("user_id", "session_num", "n_events", "session_start", "session_end")
        + _uq("user_id", "session_num")
        + _ex("events_positive", "n_events >= 1")
        + _ex("start_le_end", "session_start <= session_end")
    ),
    "user_funnel_stages": (
        _nn("user_id", "funnel_stage")
        + _uq("user_id")
        + _vals("funnel_stage", [0, 1, 2, 3])
        + _ex("stage_implies_ts", "funnel_stage < 1 OR view_ts IS NOT NULL")
        + _ex("stage3_has_purchase", "funnel_stage != 3 OR purchase_ts IS NOT NULL")
    ),
    "cohort_retention_matrix": (
        _nn("cohort_month", "months_since", "active_customers")
        + _uq("cohort_month", "months_since")
        + _rng("months_since", lo=0)
        + _ex("active_positive", "active_customers >= 1")
    ),
    "revenue_share": (
        _nn("o_orderpriority", "revenue", "revenue_share")
        + _uq("o_orderpriority")
        + _rng("revenue_share", lo=0.0, hi=1.0)
    ),
    "weighted_discount_ratio": (
        _nn("brand", "n_lines", "gross_revenue")
        + _uq("brand")
        + _rng("discount_rate_pct", lo=0.0, hi=100.0)
        + _ex("lines_positive", "n_lines >= 1")
    ),
    "country_normalization": (
        _nn("cust_key", "country_normalized", "region")
        + _uq("cust_key")
        + _vals("region", ["North America", "International"])
    ),
    "doc_quality_scores": (
        _nn("doc_id", "n_tokens", "quality_score", "passes_filter")
        + _uq("doc_id")
        + _rng("stopword_ratio", lo=0.0, hi=1.0)
        + _rng("diversity", lo=0.0, hi=1.0)
        + _ex("tokens_nonneg", "n_tokens >= 0")
    ),
    "lang_id": (
        _nn("doc_id", "predicted_lang")
        + _uq("doc_id")
        + _vals("predicted_lang", ["en", "de", "es", "fr", "zh", "unknown"])
    ),
    "metric_layer_summary": (
        _nn("segment", "n_orders", "n_customers", "revenue")
        + _uq("segment")
        + _rng("urgent_share", lo=0.0, hi=1.0)
        + _ex("urgent_bounded", "urgent_orders <= n_orders")
        + _ex("customers_le_orders", "n_customers <= n_orders")
    ),
    "order_cadence": (
        _nn("cust_key", "n_orders", "first_order", "last_order")
        + _uq("cust_key")
        + _ex("first_le_last", "first_order <= last_order")
        + _ex("interval_consistency", "n_orders > 1 OR avg_interval_days IS NULL")
    ),
    "signup_attribution": (
        _nn("user_id", "ts", "signup_event_id")
        + _ex("windows_nested_counts", "n_purchases_1d <= n_purchases_7d AND n_purchases_7d <= n_purchases_all")
        + _ex("windows_nested_revenue", "revenue_1d <= revenue_7d + 1e-9 AND revenue_7d <= revenue_all + 1e-9")
        + _ex("active_days_nested", "active_days_1d <= active_days_7d AND active_days_7d <= active_days_all")
    ),
    "customer_profile": (
        _nn("column_name", "n_nulls", "n_distinct")
        + _uq("column_name")
        + _rng("n_nulls", lo=0)
        + _ex("distinct_positive", "n_distinct >= 0")
    ),
}


def run_manifest(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> DataFrame:
    """Run every manifested query's suite; returns long-form
    (query_name, check_name, n_violations, passed) — one run_suite
    aggregation (one scan of the query result) per mart."""
    from importer_spark.queries import QUERIES

    targets = sorted(MANIFEST) if names is None else names
    out: DataFrame | None = None
    for name in targets:
        df = QUERIES[name](spark, sf_dir)
        res = run_suite(df, MANIFEST[name]).withColumn("query_name", F.lit(name))
        out = res if out is None else out.unionByName(res)
    assert out is not None, "empty manifest selection"
    return out.select("query_name", "check_name", "n_violations", "passed")


def assert_manifest(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict:
    """Raise QualityError listing every failing (query, check); returns
    summary counts when green."""
    res = run_manifest(spark, sf_dir, names).collect()
    failing = [
        (r["query_name"], r["check_name"], r["n_violations"])
        for r in res
        if not r["passed"]
    ]
    if failing:
        raise QualityError(
            f"{len(failing)} manifest checks failing: {failing[:20]}"
        )
    return {"queries": len({r['query_name'] for r in res}), "checks": len(res)}
